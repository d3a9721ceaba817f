"""Driver contract for the spark-graft builder (PySpark target).

Thin views over :mod:`findb_spark.registry` — every engine capability is a
registered QuerySpec holding the PySpark callable and (where expressible)
its DuckDB oracle SQL, so ``queries()`` and ``oracle_sql()`` never drift.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The bitemporal as-of range query — the reference engine's entire shipped
    query surface (reference src/btree/file.rs:425-570) — over the
    lineitem-derived prices table.
    """
    from findb_spark.registry import all_specs

    return all_specs()["asof_range"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from findb_spark.registry import all_specs

    return {name: spec.fn for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    from findb_spark.registry import all_specs

    return {
        name: spec.sql for name, spec in all_specs().items() if spec.sql is not None
    }
