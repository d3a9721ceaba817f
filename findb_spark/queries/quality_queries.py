"""Data-quality + PII query specs — the audit/scrub pass of a training-data
pipeline (extends the BASELINE.json mandate's text-analysis category with
the validation shapes every ingest runs).

The reference engine has no validation surface (its loader simply panics
on malformed rows, file.rs:591-604); these specs are the engine-level
replacement: declarative rule sets evaluated in O(one scan) + the two
join-shaped rules (uniqueness, referential integrity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from findb_spark.ops.quality import dq_audit, scrub_patterns
from findb_spark.registry import register
from findb_spark.session import load_table


@register(
    "dq_orders_audit",
    """
WITH one_pass AS (
  SELECT COUNT(*) AS n,
         SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS v_null_custkey,
         SUM(CASE WHEN o_totalprice IS NULL OR o_totalprice <= 0 THEN 1 ELSE 0 END) AS v_nonpositive_price,
         SUM(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END) AS v_bad_status,
         SUM(CASE WHEN o_orderdate < TIMESTAMP '1990-01-01' OR o_orderdate >= TIMESTAMP '2005-01-01'
                  THEN 1 ELSE 0 END) AS v_date_range
  FROM orders
),
dup AS (
  SELECT CAST(COALESCE(SUM(c - 1), 0) AS BIGINT) AS n_violations,
         CAST(COALESCE(SUM(c), 0) AS BIGINT) AS n_checked
  FROM (SELECT COUNT(*) AS c FROM orders GROUP BY o_orderkey)
),
fk AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_violations,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM orders) AS n_checked
  FROM orders o
  WHERE o.o_custkey IS NOT NULL
    AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
)
SELECT 'null_custkey' AS check_name, CAST(v_null_custkey AS BIGINT) AS n_violations,
       CAST(n AS BIGINT) AS n_checked FROM one_pass
UNION ALL
SELECT 'nonpositive_price', CAST(v_nonpositive_price AS BIGINT), CAST(n AS BIGINT) FROM one_pass
UNION ALL
SELECT 'bad_status', CAST(v_bad_status AS BIGINT), CAST(n AS BIGINT) FROM one_pass
UNION ALL
SELECT 'date_range', CAST(v_date_range AS BIGINT), CAST(n AS BIGINT) FROM one_pass
UNION ALL
SELECT 'unique:o_orderkey', n_violations, n_checked FROM dup
UNION ALL
SELECT 'fk:o_custkey', n_violations, n_checked FROM fk
""",
    category="quality",
    description=(
        "Declarative data-quality audit over orders: null/range/domain rules "
        "folded into ONE scan-aggregate, plus key-uniqueness (one groupBy) "
        "and referential integrity vs customer (broadcast left join, one "
        "aggregate for orphans + total)"
    ),
)
def dq_orders_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    report = dq_audit(
        orders,
        row_rules={
            "null_custkey": F.col("o_custkey").isNull(),
            "nonpositive_price": F.col("o_totalprice").isNull()
            | (F.col("o_totalprice") <= 0),
            "bad_status": ~F.col("o_orderstatus").isin("O", "F", "P"),
            "date_range": (F.col("o_orderdate") < F.lit("1990-01-01").cast("timestamp"))
            | (F.col("o_orderdate") >= F.lit("2005-01-01").cast("timestamp")),
        },
        unique_key=["o_orderkey"],
        fk=(customer, "o_custkey", "c_custkey"),
    )
    return report.withColumnRenamed("check", "check_name")


#: ordered PII patterns: long digit runs (account/ssn-ish ids), then any
#: remaining shorter digit runs. Ordering matters — regexes apply in
#: sequence, earlier (more specific) patterns win overlaps.
_PII_PATTERNS = {
    "longid": "[0-9]{6,}",
    "digits": "[0-9]+",
}


@register(
    "pii_scrub_names",
    """
SELECT c_custkey,
       len(regexp_extract_all(c_name, '[0-9]{6,}')) AS n_longid,
       len(regexp_extract_all(c_name, '[0-9]+')) AS n_digits,
       regexp_replace(regexp_replace(c_name, '[0-9]{6,}', '[REDACTED]', 'g'),
                      '[0-9]+', '[REDACTED]', 'g') AS c_name_scrubbed
FROM customer
""",
    category="quality",
    description=(
        "PII scrub: named regex patterns counted and redacted in one "
        "codegen projection (no Python in the scan) — id-like digit runs "
        "masked from customer names"
    ),
)
def pii_scrub_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    out = scrub_patterns(customer, "c_name", _PII_PATTERNS)
    return out.select(
        "c_custkey",
        F.col("n_longid").cast("bigint").alias("n_longid"),
        F.col("n_digits").cast("bigint").alias("n_digits"),
        "c_name_scrubbed",
    )
