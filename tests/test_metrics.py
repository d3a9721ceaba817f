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
    assert cpu == {"cpu_s": 3.0, "run_s": 4.0, "gc_s": 1.0, "retried_stages": 0}
    m = M.metrics_delta(before, after)
    assert m["stages"] == 1
    assert m["spill_mem_mb"] == 10.0
    assert m["exec_cpu_s"] == 3.0
    # None propagates (unmeasured, not zero)
    assert M.exec_cpu_delta_s(None, after) is None
    assert M.metrics_delta(before, None) is None


def test_delta_counts_stage_retries():
    """A re-attempted stage (attemptId > 0) in the span is a retry — the
    attribution signal that a CPU delta is failure-recovery, not plan."""
    before = {}
    after = {(1, 0): _stage(1), (1, 1): _stage(1, attempt=1), (2, 0): _stage(2)}
    assert M.exec_cpu_delta_s(before, after)["retried_stages"] == 1


def test_empty_store_returns_marker_not_validated(monkeypatch):
    """Zero complete stages = the field validation could not run; an empty
    missing-list would read as 'all fields measured' (round-11 advisor)."""
    _serve(monkeypatch, [])
    snap, missing = M.stages_snapshot(_FakeSpark())
    assert snap == {} and missing == [M.NO_STAGES_MARKER]


def test_field_drift_latch_real_verdict_sticks():
    latch = M.FieldDriftLatch()
    latch.observe([M.NO_STAGES_MARKER])   # pre-work empty store
    latch.observe([])                      # validated snapshot
    latch.observe(["fetch-failed: OSError"])  # mid-run failure
    latch.observe([])                      # later success does NOT erase it
    assert latch.result() == ["fetch-failed: OSError"]


def test_field_drift_latch_marker_defers_to_validation():
    """The empty-store marker stands only if NO snapshot ever validated a
    non-empty store."""
    deferred = M.FieldDriftLatch()
    deferred.observe([M.NO_STAGES_MARKER])
    deferred.observe([])
    assert deferred.result() == []
    never = M.FieldDriftLatch()
    never.observe([M.NO_STAGES_MARKER])
    never.observe([M.NO_STAGES_MARKER])
    assert never.result() == [M.NO_STAGES_MARKER]


def test_settled_snapshot_waits_for_listener_bus(monkeypatch):
    """The settled variant must poll past a still-draining store: the
    first fetches disagree (a stage lands between them), the next pair
    agrees and is returned — a raw snapshot would have returned the
    incomplete first fetch (round-11 advisor: lagging stage-completed
    events mis-attribute cost to the next timed span)."""
    payloads = iter(
        [[_stage(1)], [_stage(1), _stage(2)], [_stage(1), _stage(2)]]
    )
    monkeypatch.setattr(
        M.urllib.request,
        "urlopen",
        lambda url, timeout=0: io.BytesIO(json.dumps(next(payloads)).encode()),
    )
    snap, missing = M.settled_stages_snapshot(_FakeSpark(), poll_s=0.0)
    assert set(snap) == {(1, 0), (2, 0)}
    assert missing == []
