"""Executor-side stage metrics via Spark's REST API (v1).

Shared by ``bench.py`` (per-query executor CPU seconds — the
load-immune cross-round comparison basis, round-10 verdict item 2) and
``scripts/scale_smoke.py`` (spill/GC/peak-memory saturation evidence).

Why REST and not the StatusTracker: the public PySpark StatusTracker
exposes job/stage/task COUNTS but not task metrics (spill bytes, GC time,
executor run time); the UI store's REST endpoint is the one public,
version-stable surface that has them.  Requires ``spark.ui.enabled=true``
on the session.

Field drift guard (round-10 advisor): a renamed metric field or endpoint
change across Spark versions must not silently report 0 spill/GC — zeroed
evidence would read as "plan problem, not saturation".  Every snapshot
validates the expected fields against the first stage fetched and carries
the missing-field list to the caller, which embeds it in its report so a
zero is distinguishable from "not measured".
"""

from __future__ import annotations

import json
import urllib.request

#: Per-stage task-metric fields summed over the stages a timed span ran.
#: executorRunTime (ms) is per-task ELAPSED time — it still inflates when
#: task threads contend for cores on a loaded box; executorCpuTime (ns)
#: is the OS CPU counter, the genuinely load-immune cost basis.
SUM_FIELDS = (
    "memoryBytesSpilled",
    "diskBytesSpilled",
    "jvmGcTime",
    "executorRunTime",
    "executorCpuTime",
    "shuffleWriteBytes",
    "inputBytes",
)
#: max-aggregated (the unified-memory high-water mark deciding spills)
PEAK_FIELD = "peakExecutionMemory"


def stages_snapshot(spark) -> tuple[dict | None, list[str]]:
    """(stageId, attemptId) -> metric dict for every COMPLETE stage the UI
    store retains, plus the list of expected fields ABSENT from the first
    stage fetched (empty = all fields present = zeros are measured-zero).

    Returns ``(None, ["<reason>"])`` when the UI is off or the fetch
    fails, so callers can record WHY evidence is missing instead of
    silently attributing zeros."""
    ui = spark.sparkContext.uiWebUrl
    if not ui:
        return None, ["ui-disabled"]
    app = spark.sparkContext.applicationId
    url = f"{ui}/api/v1/applications/{app}/stages?status=complete"
    try:
        with urllib.request.urlopen(url, timeout=30) as r:
            stages = json.load(r)
    except Exception as e:  # noqa: BLE001 — evidence harvest must not kill
        # the measurement run; the reason string marks it unmeasured
        return None, [f"fetch-failed: {type(e).__name__}"]
    missing: list[str] = []
    if stages:
        first = stages[0]
        missing = [
            f for f in (*SUM_FIELDS, PEAK_FIELD) if f not in first
        ]
    out: dict = {}
    for st in stages:
        key = (st.get("stageId"), st.get("attemptId"))
        out[key] = {f: int(st.get(f) or 0) for f in SUM_FIELDS}
        out[key][PEAK_FIELD] = int(st.get(PEAK_FIELD) or 0)
    return out, missing


def metrics_delta(before: dict | None, after: dict | None) -> dict | None:
    """Executor-side evidence for the stages that completed between two
    snapshots: summed spill/GC/runtime/IO plus the max single-stage peak
    execution memory."""
    if before is None or after is None:
        return None
    new = [v for k, v in after.items() if k not in before]
    mb = 1024 * 1024
    return {
        "stages": len(new),
        "spill_mem_mb": round(sum(v["memoryBytesSpilled"] for v in new) / mb, 1),
        "spill_disk_mb": round(sum(v["diskBytesSpilled"] for v in new) / mb, 1),
        "gc_s": round(sum(v["jvmGcTime"] for v in new) / 1000.0, 2),
        "exec_run_s": round(sum(v["executorRunTime"] for v in new) / 1000.0, 2),
        "exec_cpu_s": round(sum(v["executorCpuTime"] for v in new) / 1e9, 2),
        "shuffle_write_mb": round(
            sum(v["shuffleWriteBytes"] for v in new) / mb, 1
        ),
        "input_mb": round(sum(v["inputBytes"] for v in new) / mb, 1),
        "peak_exec_mem_mb": round(
            max((v[PEAK_FIELD] for v in new), default=0) / mb, 1
        ),
    }


def exec_cpu_delta_s(before: dict | None, after: dict | None) -> dict | None:
    """Executor cost for the stages that completed between two snapshots:
    ``cpu_s`` (summed executorCpuTime — the load-immune basis: box load
    inflates wall and even per-task elapsed time, not the OS CPU counter)
    and ``run_s`` (summed per-task elapsed executorRunTime, comparable to
    the scale-smoke campaigns' exec_run_s)."""
    if before is None or after is None:
        return None
    new = [v for k, v in after.items() if k not in before]
    return {
        "cpu_s": round(sum(v["executorCpuTime"] for v in new) / 1e9, 3),
        "run_s": round(sum(v["executorRunTime"] for v in new) / 1000.0, 3),
    }
