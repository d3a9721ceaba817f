#!/usr/bin/env python
"""Mechanical certification-window rotation.

Since round 8 the driver window (``registry._CHECK_FIRST``) is a ROLLING
RE-CERTIFICATION computed from repo state, not hand-maintained prose.
Policy (declared round 7, VERDICT item 4):

1. **Never-rowed** hash-verifiable queries lead (certification debt:
   a registered query without any driver row), sorted by name.
2. **Changed-this-round** queries next (``registry.CHANGED_THIS_ROUND``,
   declared order): their implementation was materially rewritten, so
   their newest row no longer certifies the shipping code.
3. The remainder is filled **stalest-first**: every other
   hash-verifiable query sorted by ``(latest driver-row round, name)``,
   so every row's age stays bounded at ~(registry size / 50) rounds.

``registry.ROWS_ONLY`` queries are excluded — their value hash can never
match by design, and a window slot on them would be red forever.

Usage::

    python scripts/rotate_window.py            # print the window
    python scripts/rotate_window.py --write    # rewrite registry._CHECK_FIRST
                                               # + write WINDOW_r{N}.json

``--write`` rewrites the tuple between the AUTO-GENERATED markers in
``findb_spark/registry.py`` and records a ``WINDOW_r{N}.json`` manifest
(window + the exact CORRECTNESS inputs used), which
``tests/test_rotate_window.py`` uses to pin the committed window to this
policy — the manifest freezes the inputs, so the pin stays valid after
the next round's CORRECTNESS file lands.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WINDOW_SIZE = 50

BEGIN_MARK = "# --- BEGIN AUTO-GENERATED WINDOW (scripts/rotate_window.py) ---"
END_MARK = "# --- END AUTO-GENERATED WINDOW ---"


def latest_rows(correctness_files: list[str]) -> tuple[dict[str, int], int]:
    """(name -> round of its NEWEST driver row, max round seen) over the
    given files.  The max round comes from the FILENAMES, not the file
    contents: an empty or partially-written CORRECTNESS_rNN.json must
    still advance the round counter, or the next manifest/window would be
    misnumbered and overwrite a committed one (round-8 advisor finding)."""
    latest: dict[str, int] = {}
    max_round = 0
    for f in correctness_files:
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", os.path.basename(f))
        if not m:
            raise ValueError(f"not a correctness artifact: {f}")
        rnd = int(m.group(1))
        max_round = max(max_round, rnd)
        with open(f) as fh:
            for name in json.load(fh):
                latest[name] = max(latest.get(name, 0), rnd)
    return latest, max_round


def compute_window(
    registered: list[str],
    rows_only: frozenset[str],
    changed: tuple[str, ...],
    latest: dict[str, int],
    size: int = WINDOW_SIZE,
) -> list[str]:
    """Apply the policy. Pure function — pinned by tests/test_rotate_window.py."""
    eligible = [n for n in registered if n not in rows_only]
    elig_set = set(eligible)
    never_rowed = sorted(n for n in eligible if n not in latest)
    changed_known = list(
        dict.fromkeys(
            n for n in changed if n in elig_set and n not in never_rowed
        )
    )
    taken = set(never_rowed) | set(changed_known)
    rest = sorted(
        (n for n in eligible if n not in taken),
        key=lambda n: (latest[n], n),
    )
    return (never_rowed + changed_known + rest)[:size]


def _load_registry():
    from findb_spark import registry

    registry.all_specs()  # import query modules -> fill _SPECS
    return registry


def _render_tuple(window: list[str], rnd: int) -> str:
    lines = [
        BEGIN_MARK,
        f"#: Round-{rnd} window, computed by `python scripts/rotate_window.py"
        " --write`",
        f"#: from CORRECTNESS_r01..r{rnd - 1:02d} + CHANGED_THIS_ROUND"
        " (policy above).",
        "_CHECK_FIRST: tuple[str, ...] = (",
    ]
    lines += [f'    "{n}",' for n in window]
    lines += [")", END_MARK]
    return "\n".join(lines)


def main() -> None:
    write = "--write" in sys.argv
    registry = _load_registry()
    correctness = sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")))
    latest, max_round = latest_rows(correctness)
    registered = list(registry.registration_order_specs())
    window = compute_window(
        registered, registry.ROWS_ONLY, registry.CHANGED_THIS_ROUND, latest
    )
    rnd = max_round + 1

    unknown = [n for n in registry.CHANGED_THIS_ROUND if n not in registered]
    if unknown:
        raise SystemExit(f"CHANGED_THIS_ROUND names not registered: {unknown}")
    # Stale-ritual guard (round-8 verdict item 3): a CHANGED name whose
    # newest driver row already comes from the round this window is being
    # built FOR was certified in the previous round and not reset — burning
    # a slot on it re-certifies a fresh row.  Refuse rather than waste.
    stale = [n for n in registry.CHANGED_THIS_ROUND if latest.get(n) == rnd]
    if stale:
        raise SystemExit(
            f"CHANGED_THIS_ROUND holds round-{rnd}-certified names {stale}: "
            "reset the tuple to THIS round's rewrites before rotating "
            "(registry.py NEXT-ROUND RITUAL)"
        )
    # Forgotten-reset detector: an identical non-empty tuple to the one the
    # PREVIOUS round's manifest froze means the ritual was skipped — those
    # queries were already re-certified last round under this tuple.
    prev_manifest = os.path.join(REPO, f"WINDOW_r{max_round:02d}.json")
    if registry.CHANGED_THIS_ROUND and os.path.exists(prev_manifest):
        with open(prev_manifest) as fh:
            prev_changed = json.load(fh).get("changed_this_round", [])
        if list(registry.CHANGED_THIS_ROUND) == prev_changed:
            raise SystemExit(
                f"CHANGED_THIS_ROUND is byte-identical to {prev_manifest}'s: "
                "reset it to THIS round's rewrites (empty tuple if none) "
                "before rotating (registry.py NEXT-ROUND RITUAL)"
            )

    for n in window:
        print(n)
    print(f"-- {len(window)} slots, round {rnd}", file=sys.stderr)

    if not write:
        return

    reg_path = os.path.join(REPO, "findb_spark", "registry.py")
    with open(reg_path) as fh:
        src = fh.read()
    if BEGIN_MARK not in src or END_MARK not in src:
        raise SystemExit(f"markers not found in {reg_path}")
    pre, rest = src.split(BEGIN_MARK, 1)
    _, post = rest.split(END_MARK, 1)
    with open(reg_path, "w") as fh:
        fh.write(pre + _render_tuple(window, rnd) + post)

    manifest = {
        "round": rnd,
        "inputs": [os.path.basename(f) for f in correctness],
        "changed_this_round": list(registry.CHANGED_THIS_ROUND),
        "rows_only": sorted(registry.ROWS_ONLY),
        "window": window,
    }
    man_path = os.path.join(REPO, f"WINDOW_r{rnd:02d}.json")
    with open(man_path, "w") as fh:
        json.dump(manifest, fh, indent=2)
        fh.write("\n")
    print(f"-- wrote {reg_path} + {man_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
