"""Bitemporal ``prices`` table constructors.

Two sources (FIXTURES.md §A1):

- the 18-row golden fixture verbatim from the reference's end-to-end test
  (``file.rs:621-640``) — pins as-of semantics exactly;
- a deterministic derivation from the driver's ``lineitem`` table, used for
  oracle-checked queries at every scale factor. The same derivation is
  expressed in DuckDB SQL (`PRICES_ORACLE_CTE`) so Spark results and oracle
  results are computed over identical rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from findb_spark.session import load_table

#: rows verbatim from reference file.rs:621-640 (asset_id, date, ts, value)
GOLDEN_ROWS = [
    (0, 20200131, 0, 1.0),
    (0, 20200131, 10, 2.0),
    (0, 20200131, 20, 3.0),
    (0, 20200229, 5, 11.0),
    (0, 20200229, 15, 12.0),
    (0, 20200229, 25, 13.0),
    (0, 20200331, 10, 110.0),
    (0, 20200331, 20, 120.0),
    (0, 20200331, 25, 130.0),
    (1, 20200229, 5, 21.0),
    (1, 20200229, 15, 22.0),
    (1, 20200229, 25, 23.0),
    (1, 20200331, 10, 220.0),
    (1, 20200331, 20, 220.0),
    (1, 20200331, 25, 230.0),
    (1, 20200430, 10, 2100.0),
    (1, 20200430, 20, 2200.0),
    (1, 20200430, 25, 2300.0),
]

PRICE_SCHEMA = "asset_id BIGINT, date INT, ts BIGINT, value DOUBLE"


def golden_prices(spark: SparkSession) -> DataFrame:
    """The reference's inline test fixture as a DataFrame."""
    from findb_spark.session import local_relation_df

    return local_relation_df(spark, GOLDEN_ROWS, PRICE_SCHEMA)


def _yyyymmdd_to_iso(d: int) -> str:
    return f"{d // 10000:04d}-{d // 100 % 100:02d}-{d % 100:02d}"


def prices_from_lineitem(
    spark: SparkSession,
    sf_dir: str,
    start_date: int | None = None,
    end_date: int | None = None,
) -> DataFrame:
    """Derive a bitemporal prices table from ``lineitem`` (FIXTURES.md §B):
    asset_id := l_partkey, date := l_shipdate as yyyymmdd int,
    ts := epoch(l_shipdate) + l_linenumber (spreads same-day rows into
    distinct revision timestamps), value := l_extendedprice.

    Requires session timezone UTC (findb_spark.session sets it) so
    ``unix_timestamp`` matches DuckDB's ``epoch()``.

    ``start_date``/``end_date`` (yyyymmdd ints) bound the derivation on the
    *source* column: Catalyst cannot push a predicate on the derived
    ``date`` (a date_format projection) down to the parquet scan, but a
    bound on ``l_shipdate`` lands in PushedFilters — at 100 TB this is the
    difference between scanning the range and scanning the table.
    Semantically identical to post-filtering on ``date``.
    """
    li = load_table(spark, sf_dir, "lineitem")
    if start_date is not None:
        li = li.where(
            F.col("l_shipdate") >= F.lit(_yyyymmdd_to_iso(start_date)).cast("timestamp")
        )
    if end_date is not None:
        li = li.where(
            F.col("l_shipdate") < F.date_add(
                F.lit(_yyyymmdd_to_iso(end_date)).cast("timestamp").cast("date"), 1
            ).cast("timestamp")
        )
    # arithmetic yyyymmdd (round 14, guide §1.2): the date_format form
    # allocated a string per evaluation, and Catalyst re-evaluates the
    # expression in every derived filter it pushes below this Project —
    # see findb_spark.functions.dates (bit-identical, sweep-verified)
    from findb_spark.functions.dates import yyyymmdd_int

    return li.select(
        F.col("l_partkey").alias("asset_id"),
        yyyymmdd_int("l_shipdate").alias("date"),
        (F.unix_timestamp("l_shipdate") + F.col("l_linenumber")).cast("bigint").alias("ts"),
        F.col("l_extendedprice").alias("value"),
    )


#: DuckDB CTE computing exactly the same rows as `prices_from_lineitem`
PRICES_ORACLE_CTE = """
prices_v AS (
  SELECT l_partkey AS asset_id,
         CAST(strftime(l_shipdate, '%Y%m%d') AS INT) AS date,
         CAST(epoch(l_shipdate) AS BIGINT) + l_linenumber AS ts,
         l_extendedprice AS value
  FROM lineitem
)
""".strip()
