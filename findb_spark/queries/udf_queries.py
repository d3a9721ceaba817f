"""Python UDF extension-point specs: scalar pandas UDF, grouped-aggregate
pandas UDF (UDAF), and grouped-map applyInPandas — each Arrow-batched
(never row-at-a-time Python) and each with a DuckDB oracle twin via the
fixed-point trick, proving the Python paths preserve engine-exact
numerics. Together with text_udtf_sentences (UDTF), mapInPandas
(multimodal) and applyInPandasWithState (streaming), this completes the
reference's missing UDF/UDAF/UDTF surface (SURVEY §2.2).

These exist to pin the extension mechanisms; equivalent logic that a
built-in can express should always use the built-in (the oracle SQL of
each query is exactly that built-in form).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import pandas_udf

from findb_spark.registry import register
from findb_spark.session import load_table


@register(
    "udaf_rms_quantity",
    """
SELECT l_returnflag,
       sqrt(CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT)
                     * CAST(FLOOR(l_quantity) AS BIGINT)) AS DOUBLE)
            / COUNT(*)) AS rms_qty,
       COUNT(*) AS n_rows
FROM lineitem GROUP BY l_returnflag
""",
    category="udf",
    description="Grouped-aggregate pandas UDF (vectorized UDAF): RMS of quantity via exact int64 numpy sums",
)
def udaf_rms_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    @pandas_udf("double")
    def rms(v: pd.Series) -> float:
        import math

        x = v.astype("int64")  # quantities are integral doubles
        return math.sqrt(float((x * x).sum()) / len(x))

    # group-aggregate pandas UDFs cannot mix with JVM aggregates in one
    # agg() — the row count is a pandas aggregate too
    @pandas_udf("bigint")
    def pcount(v: pd.Series) -> int:
        return len(v)

    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        rms("l_quantity").alias("rms_qty"), pcount("l_quantity").alias("n_rows")
    )


@register(
    "grouped_map_demean",
    """
SELECT o_custkey, o_orderkey, o_totalprice,
       o_totalprice
         - CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                OVER (PARTITION BY o_custkey) AS DOUBLE) / 100
           / COUNT(*) OVER (PARTITION BY o_custkey) AS demeaned
FROM orders
""",
    category="udf",
    description="Grouped-map applyInPandas: per-customer demeaned order value (exact fixed-point group mean inside the pandas kernel)",
)
def grouped_map_demean(spark: SparkSession, sf_dir: str) -> DataFrame:
    def demean(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        cents = np.floor(pdf["o_totalprice"].to_numpy() * 100 + 0.5).astype("int64")
        mean = (float(cents.sum()) / 100) / len(cents)
        out = pdf[["o_custkey", "o_orderkey", "o_totalprice"]].copy()
        out["demeaned"] = pdf["o_totalprice"] - mean
        return out

    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_custkey").applyInPandas(
        demean,
        schema="o_custkey BIGINT, o_orderkey BIGINT, o_totalprice DOUBLE, demeaned DOUBLE",
    )


@register(
    "udf_scalar_acct_band",
    """
SELECT c_custkey,
       CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS acct_band,
       CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS acct_cents
FROM customer
""",
    category="udf",
    description="Scalar Arrow pandas UDF: vectorized per-row banding/fixed-point encode (numpy kernel, exact int outputs)",
)
def udf_scalar_acct_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    @pandas_udf("bigint")
    def band(v: pd.Series) -> pd.Series:
        import numpy as np

        return pd.Series(np.floor(v.to_numpy() / 1000).astype("int64"))

    @pandas_udf("bigint")
    def cents(v: pd.Series) -> pd.Series:
        import numpy as np

        return pd.Series(np.floor(v.to_numpy() * 100 + 0.5).astype("int64"))

    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        band("c_acctbal").alias("acct_band"),
        cents("c_acctbal").alias("acct_cents"),
    )


@register(
    "sql_udf_acct_band",
    """
SELECT c_custkey,
       CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS acct_band,
       CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS acct_cents
FROM customer
""",
    category="udf",
    description=(
        "SQL scalar UDFs (Spark 4 CREATE FUNCTION ... RETURN expr): the "
        "same banding/fixed-point kernels as the pandas-UDF twin, defined "
        "declaratively — the body INLINES into the caller's plan, so "
        "unlike any Python UDF the function costs nothing at 100 TB "
        "(full codegen, filter pushdown through the call)"
    ),
)
def sql_udf_acct_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's SQL-function extension point (reference front-end
    parity: a user extends the engine without leaving SQL).  Twin of
    udf_scalar_acct_band: identical results, opposite execution model —
    the SQL body is substituted during analysis and fuses into
    whole-stage codegen, where the pandas UDF pays an Arrow round-trip."""
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION acct_band(v DOUBLE) "
        "RETURNS BIGINT RETURN CAST(FLOOR(v / 1000) AS BIGINT)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION acct_cents(v DOUBLE) "
        "RETURNS BIGINT RETURN CAST(FLOOR(v * 100 + 0.5) AS BIGINT)"
    )
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer_sqludf_v")
    return spark.sql(
        "SELECT c_custkey, acct_band(c_acctbal) AS acct_band, "
        "acct_cents(c_acctbal) AS acct_cents FROM customer_sqludf_v"
    )
