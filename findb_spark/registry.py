"""Query registry — single source of truth for the driver contract.

Every engine capability is declared once as a :class:`QuerySpec`:
a PySpark callable ``(spark, sf_dir) -> DataFrame`` plus (where the
semantics are SQL-expressible) a DuckDB oracle SQL string computing the
same result over the same parquet tables. ``__spark_entry__.queries()`` /
``oracle_sql()`` are thin views over this registry, so the two dicts can
never drift apart.

Parity rules (driver compares row count + schema + order-insensitive value
hash, CORRECTNESS_r{N}.json):

- alias every computed column identically on both sides;
- money-style aggregates go through DECIMAL(18,2) sums cast back to DOUBLE
  — exact and order-independent, so Spark and DuckDB agree bit-for-bit
  regardless of partitioning/accumulation order (a raw double sum over 600k
  rows carries ~1e-5 absolute error that WOULD flip a hash);
- ratio-style outputs are rounded to a fixed small scale on both sides;
- every top-k has a total deterministic ORDER BY (unique tiebreaker column).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    sql: str | None
    category: str
    description: str = ""
    #: queries worth timing in bench.py
    bench: bool = field(default=False)


_SPECS: dict[str, QuerySpec] = {}


def register(
    name: str,
    sql: str | None,
    category: str,
    description: str = "",
    bench: bool = False,
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _SPECS:
            raise ValueError(f"duplicate query spec: {name}")
        _SPECS[name] = QuerySpec(name, fn, sql, category, description, bench)
        return fn

    return deco


def all_specs() -> dict[str, QuerySpec]:
    """All registered specs (importing the query modules as a side effect)."""
    import findb_spark.queries  # noqa: F401  (registers everything)

    return dict(_SPECS)
