"""Pin the rolling certification-window policy (scripts/rotate_window.py).

The driver window (``registry._CHECK_FIRST``) is generated, not
hand-maintained; these tests pin (a) the pure policy function and (b) that
the COMMITTED window equals the policy applied to the committed manifest's
CORRECTNESS inputs.  The manifest freezes the correctness-file set; the
registry side (registration order, live ROWS_ONLY, WINDOW_SIZE) is read
LIVE by design — registering, removing, or re-flagging any query mid-round
intentionally breaks this pin until ``--write`` is rerun, forcing the
committed window to be regenerated whenever its policy inputs move
(round-8 advisor note: this is a deliberate ratchet, not frozen state)."""

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from rotate_window import compute_window, latest_rows  # noqa: E402


class TestPolicy:
    def test_never_rowed_lead_sorted_by_name(self):
        w = compute_window(
            registered=["b", "a", "c", "d"],
            rows_only=frozenset(),
            changed=(),
            latest={"c": 1, "d": 2},
            size=50,
        )
        assert w == ["a", "b", "c", "d"]

    def test_changed_preempt_after_never_rowed_in_declared_order(self):
        w = compute_window(
            registered=["a", "b", "c", "d", "e"],
            rows_only=frozenset(),
            changed=("d", "b"),
            latest={"b": 1, "c": 1, "d": 3, "e": 2},
            size=50,
        )
        # a never-rowed; then changed in declared order; then stalest
        assert w == ["a", "d", "b", "c", "e"]

    def test_stalest_order_is_round_then_name(self):
        w = compute_window(
            registered=["x", "y", "z"],
            rows_only=frozenset(),
            changed=(),
            latest={"x": 2, "y": 1, "z": 1},
            size=50,
        )
        assert w == ["y", "z", "x"]

    def test_rows_only_excluded_even_when_changed(self):
        w = compute_window(
            registered=["a", "hll"],
            rows_only=frozenset({"hll"}),
            changed=("hll",),
            latest={"a": 1},
            size=50,
        )
        assert w == ["a"]

    def test_cap_and_no_duplicates(self):
        names = [f"q{i:02d}" for i in range(60)]
        w = compute_window(
            registered=names,
            rows_only=frozenset(),
            changed=("q59", "q59"),
            latest={n: 1 for n in names},
            size=50,
        )
        assert len(w) == 50
        assert len(set(w)) == 50
        assert w[0] == "q59"  # changed preempts, listed once

    def test_changed_query_that_is_never_rowed_not_double_counted(self):
        w = compute_window(
            registered=["a", "b"],
            rows_only=frozenset(),
            changed=("a",),
            latest={"b": 1},
            size=50,
        )
        assert w == ["a", "b"]

    def test_latest_rows_takes_newest_round(self, tmp_path):
        (tmp_path / "CORRECTNESS_r01.json").write_text('{"a": {}, "b": {}}')
        (tmp_path / "CORRECTNESS_r03.json").write_text('{"a": {}}')
        latest, max_round = latest_rows(sorted(glob.glob(str(tmp_path / "*.json"))))
        assert latest == {"a": 3, "b": 1}
        assert max_round == 3

    def test_max_round_comes_from_filenames_not_contents(self, tmp_path):
        # an EMPTY newest artifact must still advance the round counter
        # (round-8 advisor finding: content-derived rounds would renumber
        # the next manifest and overwrite a committed window)
        (tmp_path / "CORRECTNESS_r01.json").write_text('{"a": {}}')
        (tmp_path / "CORRECTNESS_r04.json").write_text("{}")
        latest, max_round = latest_rows(sorted(glob.glob(str(tmp_path / "*.json"))))
        assert latest == {"a": 1}
        assert max_round == 4


class TestCommittedWindowMatchesPolicy:
    def test_manifest_recomputes_and_matches_check_first(self):
        manifests = sorted(glob.glob(os.path.join(REPO, "WINDOW_r*.json")))
        assert manifests, "rotate_window.py --write must commit a manifest"
        with open(manifests[-1]) as fh:
            m = json.load(fh)

        from findb_spark import registry

        registry.all_specs()
        latest, _ = latest_rows(
            [os.path.join(REPO, f) for f in m["inputs"]]
        )
        recomputed = compute_window(
            registered=list(registry.registration_order_specs()),
            rows_only=frozenset(m["rows_only"]),
            changed=tuple(m["changed_this_round"]),
            latest=latest,
        )
        assert recomputed == m["window"]
        assert list(registry._CHECK_FIRST) == m["window"]

    def test_manifest_changed_matches_registry_declaration(self):
        manifests = sorted(glob.glob(os.path.join(REPO, "WINDOW_r*.json")))
        with open(manifests[-1]) as fh:
            m = json.load(fh)
        from findb_spark import registry

        assert tuple(m["changed_this_round"]) == registry.CHANGED_THIS_ROUND
        assert frozenset(m["rows_only"]) == registry.ROWS_ONLY
