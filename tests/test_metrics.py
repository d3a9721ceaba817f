"""Pins for the shared REST stage-metrics helper (findb_spark.metrics),
used by bench.py (per-query executor CPU) and scripts/scale_smoke.py
(spill/GC saturation evidence).

The load-bearing behavior is the FIELD-DRIFT GUARD (round-10 advisor): a
renamed REST metric field across Spark versions must surface as
"unmeasured" in the caller's report, never as silently-zeroed evidence —
zero spill that means "endpoint changed" would be misread as "plan
problem, not saturation"."""

from __future__ import annotations

import io
import json

import findb_spark.metrics as M


class _FakeSC:
    uiWebUrl = "http://fake:4040"
    applicationId = "app-test"


class _FakeSpark:
    sparkContext = _FakeSC()


def _stage(sid, attempt=0, **over):
    st = {f: 1000 for f in M.SUM_FIELDS}
    st[M.PEAK_FIELD] = 2 * 1024 * 1024
    st.update(over)
    st["stageId"] = sid
    st["attemptId"] = attempt
    return st


def _serve(monkeypatch, payload):
    monkeypatch.setattr(
        M.urllib.request,
        "urlopen",
        lambda url, timeout=0: io.BytesIO(json.dumps(payload).encode()),
    )


def test_snapshot_all_fields_present(monkeypatch):
    _serve(monkeypatch, [_stage(1), _stage(2)])
    snap, missing = M.stages_snapshot(_FakeSpark())
    assert missing == []
    assert set(snap) == {(1, 0), (2, 0)}


def test_snapshot_reports_missing_fields(monkeypatch):
    dropped = dict(_stage(1))
    del dropped["memoryBytesSpilled"], dropped["executorCpuTime"]
    _serve(monkeypatch, [dropped])
    snap, missing = M.stages_snapshot(_FakeSpark())
    assert sorted(missing) == ["executorCpuTime", "memoryBytesSpilled"]
    # the snapshot still returns (zero-filled) so the run keeps going,
    # but the caller now KNOWS those zeros are unmeasured
    assert snap[(1, 0)]["memoryBytesSpilled"] == 0


def test_snapshot_fetch_failure_is_a_reason_not_a_zero(monkeypatch):
    def boom(url, timeout=0):
        raise OSError("connection refused")

    monkeypatch.setattr(M.urllib.request, "urlopen", boom)
    snap, missing = M.stages_snapshot(_FakeSpark())
    assert snap is None and missing == ["fetch-failed: OSError"]


def test_snapshot_ui_disabled():
    class NoUI:
        class sparkContext:
            uiWebUrl = None
            applicationId = "x"

    snap, missing = M.stages_snapshot(NoUI())
    assert snap is None and missing == ["ui-disabled"]


def test_deltas_count_only_new_stages():
    before = {(1, 0): _stage(1)}
    after = {
        (1, 0): _stage(1),
        (2, 0): _stage(
            2,
            executorCpuTime=3_000_000_000,  # 3 s in ns
            executorRunTime=4_000,          # 4 s in ms
            memoryBytesSpilled=10 * 1024 * 1024,
        ),
    }
    cpu = M.exec_cpu_delta_s(before, after)
    assert cpu == {"cpu_s": 3.0, "run_s": 4.0}
    m = M.metrics_delta(before, after)
    assert m["stages"] == 1
    assert m["spill_mem_mb"] == 10.0
    assert m["exec_cpu_s"] == 3.0
    # None propagates (unmeasured, not zero)
    assert M.exec_cpu_delta_s(None, after) is None
    assert M.metrics_delta(before, None) is None
