#!/usr/bin/env python
"""Local replica of the driver's correctness gate.

Runs every ``queries()[name]`` through Spark and its ``oracle_sql()[name]``
through DuckDB on the same parquet tables, then compares row count, column
names, and an order-insensitive multiset of row values (floats rounded to
6 decimals — tighter than any plausible driver hash). Exits non-zero on any
mismatch.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
from collections import Counter

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon_value(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(canon_value(x) for x in v)
    if isinstance(v, bytes):
        return v.hex()
    return v


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(canon_value(r[i]) for i in order) for r in rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from findb_spark.session import get_spark

    spark = get_spark(app_name="check_oracle", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    failures, no_oracle = [], []
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            s_rows = sdf.collect()
            s_cols = sdf.columns
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL  {name}: spark error: {str(e).splitlines()[0][:200]}")
            continue
        if name not in sqls:
            no_oracle.append(name)
            print(f"NOORA {name}: {len(s_rows)} rows (rows-only check)")
            continue
        try:
            o = con.execute(sqls[name])
            o_cols = [d[0] for d in o.description]
            o_rows = o.fetchall()
        except Exception as e:
            failures.append((name, f"ORACLE ERROR: {e}"))
            print(f"FAIL  {name}: oracle error: {str(e).splitlines()[0][:200]}")
            continue

        problems = []
        if sorted(s_cols) != sorted(o_cols):
            problems.append(f"columns spark={sorted(s_cols)} oracle={sorted(o_cols)}")
        if len(s_rows) != len(o_rows):
            problems.append(f"rowcount spark={len(s_rows)} oracle={len(o_rows)}")
        if not problems:
            sc = canon_rows(s_cols, [[r[c] for c in s_cols] for r in s_rows])
            oc = canon_rows(o_cols, o_rows)
            if sc != oc:
                diff_s = list((sc - oc).items())[:3]
                diff_o = list((oc - sc).items())[:3]
                problems.append(f"values spark-only={diff_s} oracle-only={diff_o}")
        if problems:
            failures.append((name, "; ".join(problems)))
            print(f"FAIL  {name}: {'; '.join(problems)[:400]}")
        else:
            print(f"OK    {name}: {len(s_rows)} rows")

    print(
        f"\n{len(qs) - len(failures)}/{len(qs)} ok; {len(no_oracle)} rows-only; "
        f"{len(failures)} failures"
    )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
