"""DuckDB oracle comparison — local replica of the driver's correctness
gate (row count + column names + order-insensitive multiset of canonical
row values; floats rounded to 6 decimals, tighter than any plausible
driver hash).
"""

from __future__ import annotations

import math
from collections import Counter

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


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


def canon_rows(cols: list[str], rows) -> Counter:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(canon_value(r[i]) for i in order) for r in rows)


def compare_query(spark, con, fn, sql: str, sf_dir: str) -> list[str]:
    """Run one spec both ways; return a list of problems (empty = parity)."""
    sdf = fn(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [[r[c] for c in s_cols] for r in sdf.collect()]
    o = con.execute(sql)
    o_cols = [d[0] for d in o.description]
    o_rows = o.fetchall()

    problems: list[str] = []
    if sorted(s_cols) != sorted(o_cols):
        problems.append(f"columns spark={sorted(s_cols)} oracle={sorted(o_cols)}")
    if len(s_rows) != len(o_rows):
        problems.append(f"rowcount spark={len(s_rows)} oracle={len(o_rows)}")
    if not problems:
        sc = canon_rows(s_cols, s_rows)
        oc = canon_rows(o_cols, o_rows)
        if sc != oc:
            problems.append(
                f"values spark-only={list((sc - oc).items())[:3]} "
                f"oracle-only={list((oc - sc).items())[:3]}"
            )
    return problems
