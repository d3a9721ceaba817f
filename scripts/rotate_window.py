#!/usr/bin/env python
"""Compute the next round's correctness-check window.

The external harness checks the FIRST 50 names of ``all_specs()`` per
round (see findb_spark.registry._CHECK_FIRST).  This tool reads every
CORRECTNESS_r*.json in the repo root, computes which registered queries
have never carried a driver row (and which carried a red row last
round), and prints a ready-to-paste ``_CHECK_FIRST`` tuple:

    red-last-round confirmations first, then never-checked names in
    registration order, padded with the longest-unchecked green names.

Usage: python scripts/rotate_window.py [window_size]
"""

from __future__ import annotations

import glob
import json
import sys

sys.path.insert(0, "/root/repo")


def main() -> int:
    window = int(sys.argv[1]) if len(sys.argv) > 1 else 50

    from findb_spark.registry import all_specs

    names = list(all_specs())
    rounds = sorted(glob.glob("CORRECTNESS_r*.json"))
    if not rounds:
        print("# no CORRECTNESS files found; first round: registration order")
        checked: dict[str, dict] = {}
        last: dict[str, dict] = {}
    else:
        checked = {}
        for path in rounds:
            checked.update(json.load(open(path)))
        last = json.load(open(rounds[-1]))

    def is_red(row: dict) -> bool:
        return row.get("err") is None and (
            row.get("hash_match") is False
            or row.get("rows_match") is False
            or row.get("schema_match") is False
        ) or row.get("err") not in (None, "no_oracle")

    red_last = [n for n in names if n in last and is_red(last[n])]
    never = [n for n in names if n not in checked]
    # pad with green names, least-recently-checked first (earliest round)
    first_seen: dict[str, int] = {}
    for i, path in enumerate(rounds):
        for n in json.load(open(path)):
            first_seen.setdefault(n, i)
    green = [
        n
        for n in names
        if n in checked and n not in red_last
    ]
    green.sort(key=lambda n: first_seen.get(n, -1))

    pick: list[str] = []
    for group in (red_last, never, green):
        for n in group:
            if n not in pick and len(pick) < window:
                pick.append(n)

    print(f"# window={window}: {len(red_last)} red-confirm + "
          f"{len(never)} never-checked (+ padding)")
    print("_CHECK_FIRST: tuple[str, ...] = (")
    for n in pick:
        tag = "red last round" if n in red_last else (
            "never checked" if n in never else "recheck (oldest green)")
        print(f'    "{n}",  # {tag}')
    print(")")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
