"""TPC-H completion suite — the 15 query shapes not yet covered elsewhere.

The reference has no relational surface at all (SURVEY §2.2: "No joins at
all", no aggregation, no subqueries — `file.rs` implements only the
bitemporal as-of scan). This module completes the classic TPC-H 22-query
shape inventory on the driver's TPC-H-ish tables so the engine demonstrably
covers every standard operator composition: correlated scalar subqueries
(Q2/Q17), EXISTS/NOT EXISTS semi/anti correlation with non-equi predicates
(Q4/Q21/Q22), multi-nation theta joins (Q7), ratio-of-conditional-aggregates
(Q8/Q12/Q14), double aggregation (Q13/Q16), and view-over-aggregate scalar
maxima (Q11/Q15/Q20).

Schema adaptations (driver tables lack partsupp, l_commitdate/l_receiptdate/
l_shipmode, c_phone, p_container — see TESTDATA.md): supplier cost ->
p_retailprice, late-delivery flags -> l_returnflag = 'R', shipmode buckets ->
l_linestatus, phone country code -> c_nationkey % 5. Each query keeps the
original's *operator shape*; only the filter columns differ.

Scale notes (100 TB posture): every subquery here decorrelates to a
broadcast scalar or an aggregated semi-join — no per-row recomputation, no
nested-loop correlation. Hard ``F.broadcast`` hints are reserved for sides
bounded by CONSTRUCTION (nation/region at 25/5 rows, 1-row decorrelated
aggregates); part/supplier/customer grow with SF, so their join strategy is
left to the autoBroadcastJoinThreshold + AQE — they still broadcast when
actually small, and degrade to shuffle joins instead of OOMing the build
side at cluster scale. The lineitem fact scans once per query except Q21's
three self-correlated aliases (l1/l2/l3 — inherent to its EXISTS/NOT EXISTS
shape; a shared scan would need a pre-aggregated per-order supplier
profile). The double-aggregation queries (Q13/Q16) shuffle on the first
grouping key only, with the second aggregation over the (much smaller)
grouped output.

Parity: money aggregates via fixed-point sums (queries/parity.py); ratios
are divisions of two exact fixed-point doubles, bit-identical on both
engines; every top-k carries a unique tiebreaker.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from findb_spark.queries.parity import fxp_avg, fxp_avg_sql, fxp_sum, fxp_sum_sql
from findb_spark.registry import register
from findb_spark.session import load_table


def _ts(s: str) -> F.Column:
    return F.lit(s).cast("timestamp")


# --- Q2: correlated max over a join (min-cost supplier shape) -------------


@register(
    "q2_best_supplier",
    """
SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name
FROM (
  SELECT DISTINCT p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name
  FROM part
  JOIN lineitem ON l_partkey = p_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation   ON n_nationkey = s_nationkey
  JOIN region   ON r_regionkey = n_regionkey
  WHERE p_size = 15 AND r_name = 'EUROPE'
)
QUALIFY s_acctbal = MAX(s_acctbal) OVER (PARTITION BY p_partkey)
ORDER BY s_acctbal DESC, p_partkey, s_suppkey
LIMIT 100
""",
    category="relational",
    description=(
        "TPC-H Q2-style: per-part best supplier via correlated MAX, decorrelated "
        "to a window over the joined set (no partsupp table: supplier set = "
        "suppliers that shipped the part)"
    ),
)
def q2_best_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").where(F.col("p_size") == 15)
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    joined = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal", "n_name")
        .distinct()
    )
    w = Window.partitionBy("p_partkey")
    return (
        joined.withColumn("max_bal", F.max("s_acctbal").over(w))
        .where(F.col("s_acctbal") == F.col("max_bal"))
        .drop("max_bal")
        .orderBy(F.desc("s_acctbal"), "p_partkey", "s_suppkey")
        .limit(100)
    )


# --- Q4: EXISTS semi-join + priority histogram ----------------------------


@register(
    "q4_order_priority",
    """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-07-01' AND o_orderdate < TIMESTAMP '1997-10-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
""",
    category="relational",
    description=(
        "TPC-H Q4-style: correlated EXISTS as a left-semi join, then priority "
        "histogram (late-commit predicate -> returnflag, no commitdate column)"
    ),
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= _ts("1997-07-01")) & (F.col("o_orderdate") < _ts("1997-10-01"))
    )
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


# --- Q7: bi-directional nation-pair volume --------------------------------


@register(
    "q7_volume_shipping",
    f"""
SELECT supp_nation, cust_nation, l_year,
       {fxp_sum_sql('volume')} AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(YEAR(l_shipdate) AS INT) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
      OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
    AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
)
GROUP BY supp_nation, cust_nation, l_year
""",
    category="relational",
    description=(
        "TPC-H Q7-style: two-nation trade volume; the nation table joins twice "
        "(supplier side + customer side) with a disjunctive cross-pair predicate"
    ),
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate").between(_ts("1996-01-01"), _ts("1997-12-31"))
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7")) | (
        (F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("n2_key"))
        .where(pair)
        .withColumn("l_year", F.year("l_shipdate").cast("int"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(fxp_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )


# --- Q8: market-share ratio of conditional aggregates ---------------------


@register(
    "q8_market_share",
    f"""
SELECT o_year,
       ({fxp_sum_sql("CASE WHEN supp_nation = 'NATION_5' THEN volume ELSE 0.0 END")})
       / ({fxp_sum_sql('volume')}) AS mkt_share
FROM (
  SELECT CAST(YEAR(o_orderdate) AS INT) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         n1.n_name AS supp_nation
  FROM part
  JOIN lineitem ON l_partkey = p_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON n1.n_nationkey = s_nationkey
  JOIN nation n2 ON n2.n_nationkey = c_nationkey
  JOIN region   ON r_regionkey = n2.n_regionkey
  WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
)
GROUP BY o_year
""",
    category="relational",
    description=(
        "TPC-H Q8-style: national market share — ratio of two fixed-point "
        "conditional sums (exact doubles, so the division is bit-identical "
        "across engines)"
    ),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_region")
    )
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    national = F.when(F.col("supp_nation") == "NATION_5", volume).otherwise(F.lit(0.0))
    num = F.sum(F.floor(national * 100 + F.lit(0.5))).cast("double") / 100
    den = F.sum(F.floor(volume * 100 + F.lit(0.5))).cast("double") / 100
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("n2_key"))
        .join(F.broadcast(region), F.col("n2_region") == region.r_regionkey)
        .withColumn("o_year", F.year("o_orderdate").cast("int"))
        .groupBy("o_year")
        .agg((num / den).alias("mkt_share"))
    )


# --- Q9: product-type profit by nation and year ---------------------------


@register(
    "q9_product_profit",
    f"""
SELECT nation, o_year, {fxp_sum_sql('amount')} AS sum_profit
FROM (
  SELECT n_name AS nation,
         CAST(YEAR(o_orderdate) AS INT) AS o_year,
         l_extendedprice * (1 - l_discount) - p_retailprice * l_quantity * 0.1 AS amount
  FROM part
  JOIN lineitem ON l_partkey = p_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN nation   ON n_nationkey = s_nationkey
  WHERE p_name LIKE '%widget%'
)
GROUP BY nation, o_year
""",
    category="relational",
    description=(
        "TPC-H Q9-style: profit by supplier nation and order year over a "
        "name-pattern part slice (supply cost -> 10% of p_retailprice, no "
        "partsupp table)"
    ),
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").where(F.col("p_name").like("%widget%"))
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * F.col("l_quantity") * F.lit(0.1)
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(fxp_sum(F.col("amount"), "sum_profit"))
    )


# --- Q10: returned-item customer ranking ----------------------------------


@register(
    "q10_returned_items",
    f"""
SELECT c_custkey, c_name,
       {fxp_sum_sql('l_extendedprice * (1 - l_discount)')} AS revenue,
       c_acctbal, n_name
FROM customer
JOIN orders   ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON n_nationkey = c_nationkey
WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-04-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
    category="relational",
    description="TPC-H Q10-style: top-20 customers by returned-revenue, 4-way join + ranked limit",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= _ts("1997-01-01")) & (F.col("o_orderdate") < _ts("1997-04-01"))
    )
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(fxp_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# --- Q11: important parts vs a global-total threshold ---------------------


@register(
    "q11_important_parts",
    f"""
WITH partval AS (
  SELECT l_partkey,
         CAST(SUM(CAST(FLOOR((l_extendedprice * l_quantity) * 100 + 0.5)
                       AS BIGINT)) AS BIGINT) AS pc
  FROM lineitem GROUP BY l_partkey
),
g AS (
  SELECT CAST(SUM(pc) AS BIGINT) AS total_c,
         CAST(COUNT(*) AS BIGINT) AS n_parts
  FROM partval
)
SELECT l_partkey, CAST(pc AS DOUBLE) / 100 AS part_value
FROM partval, g
WHERE 2 * pc * n_parts > 3 * total_c
""",
    category="relational",
    description=(
        "TPC-H Q11-style: per-part inventory value filtered against a "
        "scalar threshold from an uncorrelated aggregate subquery "
        "(broadcast single-row join).  Threshold = 1.5x the AVERAGE part "
        "value as the exact-integer predicate 2*part_value*n_parts > "
        "3*total — TPC-H's fraction-of-TOTAL threshold shrinks per part "
        "as the table grows (at sf0.1 the largest part is 0.1x total/1000, "
        "so the query certified empty-vs-empty for 8 rounds: the round-8 "
        "vacuous-certification finding), while the avg-relative form is "
        "scale-invariant (4 / 49 / 514 rows at sf0.001/0.01/0.1)"
    ),
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The predicate runs entirely on exact int64 cents (pc) — the fxp
    double form would make SUM(part_value) order-dependent.  Overflow
    bound: pc is cents of ~30 lineitems/part (<= ~1.5e10), n_parts <=
    2e8 even at SF 1000, so 2*pc*n_parts <= ~6e18 < 2^63; both sides
    exact int64, no float compare to drift cross-engine."""
    li = load_table(spark, sf_dir, "lineitem")
    value = F.col("l_extendedprice") * F.col("l_quantity")
    partval = li.groupBy("l_partkey").agg(
        F.sum(F.floor(value * 100 + F.lit(0.5))).cast("bigint").alias("pc")
    )
    # partval feeds BOTH the 1-row total aggregate and the threshold
    # join; truncate so the lineitem scan + per-part shuffle run once
    # (partval is |parts|-bounded — orders of magnitude under lineitem)
    partval = partval.localCheckpoint(eager=False)
    g = partval.agg(
        F.sum("pc").cast("bigint").alias("total_c"),
        F.count("*").cast("bigint").alias("n_parts"),
    )
    return (
        partval.join(F.broadcast(g))
        .where("2 * pc * n_parts > 3 * total_c")
        .select(
            "l_partkey", (F.col("pc").cast("double") / 100).alias("part_value")
        )
    )


# --- Q12: priority class counts per line status ---------------------------


@register(
    "q12_priority_classes",
    """
SELECT l_linestatus,
       COUNT(*) FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')) AS high_line_count,
       COUNT(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')) AS low_line_count
FROM orders
JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_returnflag = 'N'
GROUP BY l_linestatus
""",
    category="relational",
    description=(
        "TPC-H Q12-style: conditional priority counts per line status "
        "(shipmode bucket -> l_linestatus; late-commit filter -> returnflag)"
    ),
)
def q12_priority_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
        & (F.col("l_returnflag") == "N")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
    )


# --- Q13: customer order-count distribution (double aggregation) ----------


@register(
    "q13_customer_distribution",
    """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT OUTER JOIN orders ON c_custkey = o_custkey
                         AND o_orderpriority <> '4-NOT SPECIFIED'
  GROUP BY c_custkey
)
GROUP BY c_count
""",
    category="relational",
    description=(
        "TPC-H Q13-style: order-count histogram — outer join with a join-side "
        "predicate, then aggregation over an aggregation"
    ),
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey)
            & (orders.o_orderpriority != "4-NOT SPECIFIED"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


# --- Q15: top supplier via view-over-aggregate scalar max -----------------


@register(
    "q15_top_supplier",
    f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         {fxp_sum_sql('l_extendedprice * (1 - l_discount)')} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
""",
    category="relational",
    description=(
        "TPC-H Q15-style: quarterly revenue view, supplier(s) at the scalar "
        "maximum (exact fixed-point doubles make the equality safe)"
    ),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1997-01-01")) & (F.col("l_shipdate") < _ts("1997-04-01"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        fxp_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "total_revenue")
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_rev"))
    return (
        revenue.join(F.broadcast(max_rev))
        .where(F.col("total_revenue") == F.col("max_rev"))
        .join(supp, F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# --- Q16: distinct-supplier counts with NOT IN exclusion ------------------


@register(
    "q16_part_supplier_counts",
    """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#13'
  AND p_type <> 'PROMO'
  AND p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_name LIKE '%7')
GROUP BY p_brand, p_type, p_size
""",
    category="relational",
    description=(
        "TPC-H Q16-style: distinct supplier counts per brand/type/size with a "
        "NOT IN blacklist (anti-join; supplier keys are non-null so NOT IN is "
        "a plain anti-join, no null-check plan blowup)"
    ),
)
def q16_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#13")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 9, 14, 19, 23, 36, 45)
    )
    li = load_table(spark, sf_dir, "lineitem")
    excluded = load_table(spark, sf_dir, "supplier").where(F.col("s_name").like("%7"))
    return (
        li.join(excluded, li.l_suppkey == excluded.s_suppkey, "left_anti")
        .join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# --- Q17: small-quantity revenue vs per-part average ----------------------


@register(
    "q17_small_qty_revenue",
    f"""
SELECT {fxp_sum_sql('l_extendedprice')} / 7.0 AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#23' AND p_size < 10
  AND l_quantity < (SELECT 0.5 * ({fxp_avg_sql('l2.l_quantity')})
                    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
""",
    category="relational",
    description=(
        "TPC-H Q17-style: revenue from below-half-average-quantity orders; the "
        "correlated AVG decorrelates to a per-part aggregate joined back "
        "(fixed-point avg so both engines compare against the identical double)"
    ),
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") == "Brand#23") & (F.col("p_size") < 10)
    )
    per_part = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        fxp_avg(F.col("l_quantity"), "avg_qty")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(per_part, li.l_partkey == F.col("pk"))
        .where(F.col("l_quantity") < F.lit(0.5) * F.col("avg_qty"))
        .agg((fxp_sum(F.col("l_extendedprice"), "s")))
        .select((F.col("s") / F.lit(7.0)).alias("avg_yearly"))
    )


# --- Q20: nested semi-joins over an aggregated subquery -------------------


@register(
    "q20_excess_shippers",
    f"""
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_name LIKE '%bolt%'
    AND l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  GROUP BY l_suppkey, l_partkey
  HAVING {fxp_sum_sql('l_quantity')} > 30.0
)
AND s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_name IN ('NATION_3', 'NATION_7'))
ORDER BY s_suppkey
""",
    category="relational",
    description=(
        "TPC-H Q20-style: suppliers who shipped excess volume of pattern-matched "
        "parts — IN over an aggregated-HAVING subquery plus a dim IN, both "
        "planned as semi-joins (availqty threshold -> shipped-quantity "
        "threshold).  Threshold 30 units: at >60 only ~7 supplier-part "
        "groups qualified at sf0.01 and none landed in the 2 filtered "
        "nations, so the result certified empty-vs-empty (round-8 vacuous-"
        "certification finding); at >30 the result is 1 / 9 / 80 rows at "
        "sf0.001/0.01/0.1"
    ),
)
def q20_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part").where(F.col("p_name").like("%bolt%"))
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1997-01-01")) & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    nations = load_table(spark, sf_dir, "nation").where(
        F.col("n_name").isin("NATION_3", "NATION_7")
    )
    heavy = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(fxp_sum(F.col("l_quantity"), "qty"))
        .where(F.col("qty") > 30.0)
        .select("l_suppkey")
    )
    return (
        supp.join(heavy, supp.s_suppkey == heavy.l_suppkey, "left_semi")
        .join(F.broadcast(nations), supp.s_nationkey == nations.n_nationkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


# --- Q21: sole-supplier wait analysis (EXISTS + NOT EXISTS) ---------------


@register(
    "q21_sole_return_supplier",
    """
SELECT s_name, COUNT(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 25
""",
    category="relational",
    description=(
        "TPC-H Q21-style: the only supplier whose lines were returned on "
        "multi-supplier finalized orders — correlated EXISTS and NOT EXISTS "
        "with non-equi correlation, planned as semi + anti joins on l_orderkey"
    ),
)
def q21_sole_return_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    li = load_table(spark, sf_dir, "lineitem")
    l1 = li.where(F.col("l_returnflag") == "R").select("l_orderkey", "l_suppkey")
    l2 = li.select(F.col("l_orderkey").alias("l2_orderkey"), F.col("l_suppkey").alias("l2_suppkey"))
    l3 = (
        li.where(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("l3_orderkey"), F.col("l_suppkey").alias("l3_suppkey"))
    )
    base = (
        l1.join(orders, l1.l_orderkey == orders.o_orderkey, "left_semi")
        .join(
            l2,
            (l1.l_orderkey == l2.l2_orderkey) & (l1.l_suppkey != l2.l2_suppkey),
            "left_semi",
        )
        .join(
            l3,
            (l1.l_orderkey == l3.l3_orderkey) & (l1.l_suppkey != l3.l3_suppkey),
            "left_anti",
        )
    )
    return (
        base.join(supp, base.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(25)
    )


# --- Q22: idle customers above the positive-balance average ---------------


@register(
    "q22_idle_customers",
    f"""
SELECT cntrycode, COUNT(*) AS numcust, {fxp_sum_sql('c_acctbal')} AS totacctbal
FROM (
  SELECT CAST(c_nationkey % 5 AS INT) AS cntrycode, c_acctbal
  FROM customer
  WHERE c_acctbal > (SELECT {fxp_avg_sql('c_acctbal')} FROM customer
                     WHERE c_acctbal > 0.0)
    AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '1998-01-01')
)
GROUP BY cntrycode
""",
    category="relational",
    description=(
        "TPC-H Q22-style: customers with above-average balances gone IDLE "
        "— no orders since 1998 — scalar aggregate subquery + anti-join "
        "(phone country code -> c_nationkey % 5).  Idle-since, not never-"
        "ordered: every customer in the driver data has at least one order "
        "at every SF, so the bare NOT EXISTS certified empty-vs-empty for "
        "8 rounds (round-8 vacuous-certification finding); the recency "
        "form emits 3 / 30 rows' worth of groups at sf0.01/0.1 (still "
        "empty at sf0.001 — flagged EMPTY_OK below sf0.01 in the gate)"
    ),
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    recent = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= _ts("1998-01-01")
    )
    avg_bal = cust.where(F.col("c_acctbal") > 0.0).agg(
        fxp_avg(F.col("c_acctbal"), "avg_bal")
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .select((F.col("c_nationkey") % 5).cast("int").alias("cntrycode"), "c_acctbal")
        .groupBy("cntrycode")
        .agg(F.count("*").alias("numcust"), fxp_sum(F.col("c_acctbal"), "totacctbal"))
    )
