"""MERGE INTO surface — snapshot upsert/delete demonstrated on `orders`.

The reference's only mutation path is in-place mem-tree insert/delete
(mem.rs:406-454); here the equivalent capability is `ops.merge.merge_into`
snapshot algebra, checked end-to-end against a DuckDB oracle that builds
the same post-merge snapshot relationally (matched-update ∪ target-only ∪
inserts, minus deletes).

The change feed is derived deterministically from `orders` itself so the
query is a pure function of the driver tables:

- updates: every o_orderkey % 7 == 0 gets price+10 and status 'P';
- deletes: the subset of those with o_orderkey % 21 == 0 (tombstones);
- inserts: every o_orderkey % 97 == 0 cloned to key+1000000000, status 'N'.

Output is the post-merge snapshot aggregated per status (count + exact
fixed-point price sum) — compact, order-insensitive, hash-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from findb_spark.ops.diff import snapshot_diff
from findb_spark.ops.merge import merge_into
from findb_spark.queries.parity import fxp_sum, fxp_sum_sql
from findb_spark.registry import register
from findb_spark.session import load_table

#: change-feed + post-merge snapshot CTEs, composed into BOTH the
#: merge oracle and the snapshot-diff oracle (one definition — no
#: string surgery to drift)
_FEED_AND_MERGED_CTES = """
tgt AS (SELECT * FROM orders),
upd AS (
  SELECT o_orderkey, o_custkey, 'P' AS o_orderstatus,
         o_totalprice + 10.0 AS o_totalprice, o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey % 7 = 0
),
ins AS (
  SELECT o_orderkey + 1000000000 AS o_orderkey, o_custkey,
         'N' AS o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey % 97 = 0
),
src AS (SELECT * FROM upd UNION ALL SELECT * FROM ins),
merged AS (
  -- matched & not deleted: source values win
  SELECT s.* FROM src s JOIN tgt t USING (o_orderkey)
  WHERE s.o_orderkey % 21 <> 0
  UNION ALL
  -- target rows without a source match: carried through
  SELECT t.* FROM tgt t WHERE NOT EXISTS
    (SELECT 1 FROM src s WHERE s.o_orderkey = t.o_orderkey)
  UNION ALL
  -- source rows without a target match: inserted
  SELECT s.* FROM src s WHERE NOT EXISTS
    (SELECT 1 FROM tgt t WHERE t.o_orderkey = s.o_orderkey)
)
""".strip()

_MERGE_ORACLE = f"""
WITH {_FEED_AND_MERGED_CTES}
SELECT o_orderstatus, COUNT(*) AS n_orders,
       {fxp_sum_sql('o_totalprice')} AS sum_total
FROM merged GROUP BY o_orderstatus
"""


def _merged_orders(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """(orders, post-merge snapshot) under the module's deterministic feed."""
    orders = load_table(spark, sf_dir, "orders")
    upd = (
        orders.where(F.col("o_orderkey") % 7 == 0)
        .withColumn("o_orderstatus", F.lit("P"))
        .withColumn("o_totalprice", F.col("o_totalprice") + F.lit(10.0))
    )
    ins = (
        orders.where(F.col("o_orderkey") % 97 == 0)
        .withColumn("o_orderkey", F.col("o_orderkey") + F.lit(1000000000))
        .withColumn("o_orderstatus", F.lit("N"))
    )
    src = upd.unionByName(ins)
    merged = merge_into(
        orders,
        src,
        on=["o_orderkey"],
        # source row wins wholesale on match (the update set is every column)
        update={c: F.col(f"s.{c}") for c in orders.columns},
        delete=F.col("s.o_orderkey") % 21 == 0,
        insert=True,
    )
    return orders, merged


@register(
    "merge_upsert_orders",
    _MERGE_ORACLE,
    category="merge",
    description="MERGE INTO snapshot algebra: update/delete/insert in one full-outer pass, post-merge per-status aggregate",
)
def merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, merged = _merged_orders(spark, sf_dir)
    return merged.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        fxp_sum(F.col("o_totalprice"), "sum_total"),
    )


@register(
    "snapshot_diff_orders",
    f"""
WITH {_FEED_AND_MERGED_CTES},
d AS (
  SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
         CASE WHEN o.o_orderkey IS NULL THEN 'insert'
              WHEN n.o_orderkey IS NULL THEN 'delete'
              WHEN o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
                OR o.o_totalprice IS DISTINCT FROM n.o_totalprice THEN 'update'
         END AS change,
         o.o_orderstatus AS old_o_orderstatus, o.o_totalprice AS old_o_totalprice,
         n.o_orderstatus AS new_o_orderstatus, n.o_totalprice AS new_o_totalprice
  FROM tgt o FULL OUTER JOIN merged n ON o.o_orderkey = n.o_orderkey
)
SELECT o_orderkey, change, old_o_orderstatus, old_o_totalprice,
       new_o_orderstatus, new_o_totalprice
FROM d WHERE change IS NOT NULL
""",
    category="merge",
    description=(
        "CDC changelog derivation: diff a snapshot against its post-MERGE "
        "version (one full-outer sort-merge join on the key), exactly "
        "inverting merge_into — insert/delete/update rows only"
    ),
)
def snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    old, new = _merged_orders(spark, sf_dir)
    return snapshot_diff(
        old, new, keys=["o_orderkey"], compare=["o_orderstatus", "o_totalprice"]
    )
