"""Statistical profiling / hypothesis-test query specs (SURVEY §2.2
'Aggregations — robust stats' row, extending stats_profile_lineitem et al):
Welch's t, chi-squared independence, Benford first-digit screening, a
distributed-rank Gini coefficient, Simpson diversity, windowed distinct
counting, bitmap aggregation, and an explicit Bloom-filter semi-join.

Parity strategy: all moments from exact int64 sums (queries/parity.py);
sqrt is correctly rounded under IEEE-754 so test statistics are
deterministic cross-engine; the only transcendental inputs (Benford's
expected shares) are Python-float literals embedded identically in both
plans.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from findb_spark.functions.dates import yyyymm_int, yyyymmdd_int
from findb_spark.functions.hashing import hash48, hash48_duck
from findb_spark.queries.parity import fxp_sum, fxp_sum_sql
from findb_spark.registry import register
from findb_spark.session import load_table, local_relation_df


@register(
    "stats_welch_ttest",
    """
WITH d AS (
  SELECT o_orderpriority AS grp,
         CAST(FLOOR(o_totalprice + 0.5) AS BIGINT) AS v
  FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
),
m AS (
  SELECT grp, COUNT(*) AS n, SUM(v) AS s, SUM(v * v) AS sq
  FROM d GROUP BY grp
),
w AS (
  SELECT
    MAX(CASE WHEN grp = '1-URGENT' THEN n END) AS n1,
    MAX(CASE WHEN grp = '5-LOW' THEN n END) AS n2,
    MAX(CASE WHEN grp = '1-URGENT' THEN s END) AS s1,
    MAX(CASE WHEN grp = '5-LOW' THEN s END) AS s2,
    MAX(CASE WHEN grp = '1-URGENT' THEN sq END) AS sq1,
    MAX(CASE WHEN grp = '5-LOW' THEN sq END) AS sq2
  FROM m
)
SELECT n1, n2,
       CAST(s1 AS DOUBLE) / n1 AS mean1,
       CAST(s2 AS DOUBLE) / n2 AS mean2,
       (CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2)
         / SQRT((CAST(sq1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n1)
                  / (n1 - 1) / n1
                + (CAST(sq2 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 / n2)
                  / (n2 - 1) / n2)
         AS t_stat
FROM w
""",
    category="relational",
    description=(
        "Welch's unequal-variance t statistic between two order-priority "
        "cohorts on total price (dollar-quantized exact moments; sqrt is "
        "IEEE-correctly-rounded so the statistic is deterministic).  "
        "Round-11 overflow fix: the variance combination is the "
        "algebraically equal (sq - s*s/n)/(n-1)/n with s squared in "
        "DOUBLE — n*sq and s*s overflow int64 once a ~30k-row cohort of "
        "~1e5-dollar totals appears (hit at sf0.1 on regenerated data); "
        "every input int64 converts exactly (< 2^53 far past sf1) and "
        "the identical op tree keeps the float deterministic cross-engine"
    ),
)
def stats_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    d = o.where(F.col("o_orderpriority").isin("1-URGENT", "5-LOW")).select(
        F.col("o_orderpriority").alias("grp"),
        F.floor(F.col("o_totalprice") + F.lit(0.5)).cast("bigint").alias("v"),
    )
    m = d.groupBy("grp").agg(
        F.count("*").alias("n"),
        F.sum("v").alias("s"),
        F.sum(F.col("v") * F.col("v")).alias("sq"),
    )
    w = m.agg(
        *[
            F.max(F.when(F.col("grp") == g, F.col(c))).alias(f"{c}{i}")
            for i, g in ((1, "1-URGENT"), (2, "5-LOW"))
            for c in ("n", "s", "sq")
        ]
    )
    return w.select(
        "n1",
        "n2",
        F.expr("CAST(s1 AS DOUBLE) / n1").alias("mean1"),
        F.expr("CAST(s2 AS DOUBLE) / n2").alias("mean2"),
        # overflow-safe variance combination: see the registered SQL's
        # description — identical op tree on both engines
        F.expr(
            "(CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2)"
            " / SQRT((CAST(sq1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n1)"
            " / (n1 - 1) / n1"
            " + (CAST(sq2 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 / n2)"
            " / (n2 - 1) / n2)"
        ).alias("t_stat"),
    )


def _chi2_term_expr() -> str:
    """Per-cell chi-squared term, fixed-pointed at 1e6 — the production
    expression shared by stats_chi2_independence and stats_cramers_v,
    separated as the overflow-pin seam.  Expected counts use the double-
    tree form ``CAST(row_tot AS DOUBLE) * col_tot / grand`` (round 12):
    the old exact int64 product row_tot*col_tot is marginal x marginal —
    volume-quadratic with linear compute — and trips ANSI overflow once
    both marginals pass ~3e9 (tests/test_scale_defect_pins.py recreates
    that regime; test-SF contingency tables cannot)."""
    e = "CAST(row_tot AS DOUBLE) * col_tot / grand"
    return (
        f"CAST(FLOOR((o - {e}) * (o - {e}) / ({e}) * 1000000 + 0.5)"
        " AS BIGINT)"
    )


@register(
    "stats_chi2_independence",
    """
WITH d AS (
  SELECT event_type, dayofweek(ts) AS dow FROM events
),
cells AS (SELECT event_type, dow, COUNT(*) AS o FROM d GROUP BY 1, 2),
rt AS (SELECT event_type, SUM(o) AS row_tot FROM cells GROUP BY 1),
ct AS (SELECT dow, SUM(o) AS col_tot FROM cells GROUP BY 1),
g AS (SELECT SUM(o) AS grand FROM cells),
terms AS (
  SELECT CAST(FLOOR(
           (o - CAST(row_tot AS DOUBLE) * col_tot / grand)
           * (o - CAST(row_tot AS DOUBLE) * col_tot / grand)
           / (CAST(row_tot AS DOUBLE) * col_tot / grand) * 1000000 + 0.5)
         AS BIGINT) AS t
  FROM cells
  JOIN rt USING (event_type) JOIN ct USING (dow) CROSS JOIN g
),
nr AS (SELECT COUNT(DISTINCT event_type) AS r FROM cells),
nc AS (SELECT COUNT(DISTINCT dow) AS c FROM cells)
SELECT CAST(SUM(CAST(t AS DECIMAL(18,0))) AS DOUBLE) / 1000000 AS chi2,
       CAST((MAX(r) - 1) * (MAX(c) - 1) AS BIGINT) AS dof
FROM terms CROSS JOIN nr CROSS JOIN nc
""",
    category="events",
    description=(
        "Chi-squared independence test of event type vs day-of-week: "
        "expected counts are exact rationals of integer marginals; per-cell "
        "terms fixed-pointed before the (order-independent) sum"
    ),
)
def stats_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected counts in the overflow-safe double-tree form (round 12,
    same class as events_burstiness): the old exact product ``row_tot *
    col_tot`` is marginal-count x marginal-count — volume-quadratic with
    one linear groupBy of compute, tripping ANSI int64 overflow once both
    marginals pass ~3e9 (a 1e12-event corpus has ~1.4e11 per day-of-week).
    ``CAST(row_tot AS DOUBLE) * col_tot / grand`` converts each count
    exactly (< 2^53 far past that) and is written identically on both
    engines; the term sum accumulates in exact DECIMAL (the chi2 output
    is DOUBLE, so no fixed-point output bound).  Synthetic pin:
    tests/test_scale_defect_pins.py."""
    ev = load_table(spark, sf_dir, "events")
    # Spark dayofweek is Sunday=1..7; DuckDB's Sunday=0..6
    d = ev.select(
        "event_type", (F.dayofweek("ts") - 1).alias("dow")
    )
    cells = d.groupBy("event_type", "dow").agg(F.count("*").alias("o"))
    # cells (the r x c contingency table, <= |event_types| x 7 rows)
    # feeds the row/column/grand totals AND the term join; without
    # truncation each consumer re-scans events (plan audit: 8 scans)
    cells = cells.localCheckpoint(eager=False)
    rt = cells.groupBy("event_type").agg(F.sum("o").alias("row_tot"))
    ct = cells.groupBy("dow").agg(F.sum("o").alias("col_tot"))
    g = cells.agg(F.sum("o").alias("grand"))
    terms = (
        cells.join(F.broadcast(rt), "event_type")
        .join(F.broadcast(ct), "dow")
        .crossJoin(F.broadcast(g))
        .select(
            F.expr(_chi2_term_expr()).alias("t"),
            "event_type",
            "dow",
        )
    )
    terms = terms.localCheckpoint(eager=False)  # feeds dims + final agg
    dims = terms.agg(
        F.countDistinct("event_type").alias("r"), F.countDistinct("dow").alias("c")
    )
    return terms.crossJoin(F.broadcast(dims)).agg(
        F.expr("CAST(SUM(CAST(t AS DECIMAL(18,0))) AS DOUBLE) / 1000000").alias("chi2"),
        F.expr("CAST((MAX(r) - 1) * (MAX(c) - 1) AS BIGINT)").alias("dof"),
    )


#: Benford expected first-digit shares log10(1 + 1/d) — transcendental, so
#: computed ONCE in Python and embedded as exact integer parts-per-million
#: literals (half-up).  All downstream arithmetic is pure int64: the driver
#: hashes raw column values, and ROUND(double, 6) computed by two engines can
#: differ in the final ulp while agreeing at 6dp (round-5 red driver row).
_BENFORD_PPM = {
    d: int(math.floor(math.log10(1.0 + 1.0 / d) * 1_000_000 + 0.5))
    for d in range(1, 10)
}
_BENFORD_CASE_PPM = " ".join(
    f"WHEN {d} THEN CAST({p} AS BIGINT)" for d, p in _BENFORD_PPM.items()
)


@register(
    "stats_benford",
    f"""
WITH c AS (
  SELECT CAST(SUBSTRING(CAST(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)
                             AS VARCHAR), 1, 1) AS INT) AS digit
  FROM orders WHERE o_totalprice > 0
),
n AS (SELECT COUNT(*) AS tot FROM c)
SELECT digit,
       COUNT(*) AS n,
       CAST((COUNT(*) * 1000000 + tot // 2) // tot AS BIGINT) AS share_ppm,
       CASE digit {_BENFORD_CASE_PPM} END AS benford_ppm,
       CAST((COUNT(*) * 1000000 + tot // 2) // tot AS BIGINT)
         - CASE digit {_BENFORD_CASE_PPM} END AS deviation_ppm
FROM c CROSS JOIN n
GROUP BY digit, tot
ORDER BY digit
""",
    category="relational",
    description=(
        "Benford's-law first-digit screen on order totals (fraud/DQ "
        "heuristic): digit extracted from the exact integer cents string, "
        "never from double formatting"
    ),
)
def stats_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = o.where(F.col("o_totalprice") > 0).select(
        F.expr(
            "CAST(SUBSTRING(CAST(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)"
            " AS STRING), 1, 1) AS INT)"
        ).alias("digit")
    )
    n = c.agg(F.count("*").alias("tot"))
    return (
        c.crossJoin(F.broadcast(n))
        .groupBy("digit", "tot")
        .agg(F.count("*").alias("n"))
        .select(
            "digit",
            "n",
            F.expr("CAST((n * 1000000 + tot DIV 2) DIV tot AS BIGINT)").alias(
                "share_ppm"
            ),
            F.expr(f"CASE digit {_BENFORD_CASE_PPM} END").alias("benford_ppm"),
            F.expr(
                "CAST((n * 1000000 + tot DIV 2) DIV tot AS BIGINT)"
                f" - CASE digit {_BENFORD_CASE_PPM} END"
            ).alias("deviation_ppm"),
        )
        .orderBy("digit")
    )


@register(
    "stats_gini_revenue",
    """
WITH rev AS (
  SELECT o_custkey,
         SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS r
  FROM orders GROUP BY o_custkey
),
ranked AS (
  SELECT r, ROW_NUMBER() OVER (ORDER BY r, o_custkey) AS i FROM rev
),
agg AS (
  -- exact DECIMAL moments (round 12, same class as events_burstiness):
  -- sir = sum(rank * revenue) is ~n^2*r/2 — super-quadratic in customer
  -- count with one linear pass, far past int64 at 100 TB; sr crosses
  -- 2^63 cents at ~40x the 100 TB corpus — both order-independent in
  -- DECIMAL(38,0), then one identical double tree on both engines
  SELECT COUNT(*) AS n,
         SUM(CAST(r AS DECIMAL(18,0))) AS sr,
         SUM(CAST(i AS DECIMAL(18,0)) * CAST(r AS DECIMAL(18,0))) AS sir
  FROM ranked
)
SELECT n AS n_customers,
       (2 * CAST(sir AS DOUBLE) - (n + 1) * CAST(sr AS DOUBLE))
         / (n * CAST(sr AS DOUBLE)) AS gini
FROM agg
""",
    category="relational",
    description=(
        "Gini coefficient of customer revenue concentration via "
        "DISTRIBUTED global ranking: range-bucket the revenue axis, rank "
        "within buckets, add broadcast prefix offsets — no single-partition "
        "window at any scale"
    ),
)
def stats_gini_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global rank without a global window: bucket revenues onto a coarse
    grid (bounded bucket count), row_number within each bucket (shuffle
    partitioned by bucket), then add each bucket's exclusive prefix count
    (a tiny broadcast). Identical ranks to the oracle's single
    ROW_NUMBER, but the plan has no 1-partition exchange."""
    o = load_table(spark, sf_dir, "orders")
    rev = o.groupBy("o_custkey").agg(
        F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")).alias(
            "r"
        )
    )
    b = rev.withColumn("bucket", F.expr("CAST(r / 10000000 AS BIGINT)"))
    counts = b.groupBy("bucket").agg(F.count("*").alias("cnt"))
    wpre = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )  # tiny relation (bounded bucket count) — the only ordered window
    offsets = counts.select(
        "bucket", F.coalesce(F.sum("cnt").over(wpre), F.lit(0)).alias("offset")
    )
    wb = Window.partitionBy("bucket").orderBy("r", "o_custkey")
    ranked = (
        b.join(F.broadcast(offsets), "bucket")
        .select("r", (F.row_number().over(wb) + F.col("offset")).alias("i"))
    )
    # exact DECIMAL moments + identical double tree (round 12): see the
    # oracle SQL comment — sum(i*r) is super-quadratic in customer count
    # with linear compute, the int64 form's exact overflow class
    agg = ranked.agg(
        F.count("*").alias("n"),
        F.sum(F.col("r").cast("decimal(18,0)")).alias("sr"),
        F.sum(
            F.col("i").cast("decimal(18,0)") * F.col("r").cast("decimal(18,0)")
        ).alias("sir"),
    )
    return agg.select(
        F.col("n").alias("n_customers"),
        F.expr(
            "(2 * CAST(sir AS DOUBLE) - (n + 1) * CAST(sr AS DOUBLE))"
            " / (n * CAST(sr AS DOUBLE))"
        ).alias("gini"),
    )


@register(
    "stats_simpson_diversity",
    """
WITH d AS (
  SELECT source, lang, COUNT(*) AS cnt FROM documents GROUP BY 1, 2
),
s AS (
  -- ssq in exact DECIMAL (round 12, same class as events_burstiness):
  -- source/lang are FIXED-cardinality keys, so per-cell counts grow
  -- linearly with corpus volume and cnt*cnt / tot*tot cross 2^63 at
  -- ~3e9 docs per source — ordinary at 100 TB
  SELECT source,
         CAST(SUM(cnt) AS BIGINT) AS tot,
         SUM(CAST(cnt AS DECIMAL(18,0)) * CAST(cnt AS DECIMAL(18,0))) AS ssq,
         COUNT(*) AS n_langs
  FROM d GROUP BY source
)
SELECT source, n_langs, tot AS n_docs,
       1 - CAST(ssq AS DOUBLE) / (CAST(tot AS DOUBLE) * tot)
         AS simpson_diversity,
       CAST(tot AS DOUBLE) * tot / CAST(ssq AS DOUBLE) AS effective_langs
FROM s
""",
    category="text",
    description=(
        "Simpson diversity + effective language count per source — a "
        "log-free diversity index that stays an exact rational of integer "
        "counts (corpus-mix observability)"
    ),
)
def stats_simpson_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ssq in exact DECIMAL + double-tree divides (round 12, same class
    as events_burstiness): source/lang are fixed-cardinality keys, so
    cnt*cnt / tot*tot are volume-quadratic with linear compute and trip
    ANSI int64 overflow at ~3e9 docs per source.  Synthetic pin:
    tests/test_scale_defect_pins.py."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.groupBy("source", "lang").agg(F.count("*").alias("cnt"))
    s = d.groupBy("source").agg(
        F.sum("cnt").cast("bigint").alias("tot"),
        F.sum(
            F.col("cnt").cast("decimal(18,0)") * F.col("cnt").cast("decimal(18,0)")
        ).alias("ssq"),
        F.count("*").alias("n_langs"),
    )
    return s.select(
        "source",
        "n_langs",
        F.col("tot").alias("n_docs"),
        F.expr(
            "1 - CAST(ssq AS DOUBLE) / (CAST(tot AS DOUBLE) * tot)"
        ).alias("simpson_diversity"),
        F.expr(
            "CAST(tot AS DOUBLE) * tot / CAST(ssq AS DOUBLE)"
        ).alias("effective_langs"),
    )


@register(
    "window_rolling_distinct",
    """
SELECT user_id, event_id,
       CAST(COUNT(DISTINCT event_type)
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS BIGINT)
         AS n_types_last10
FROM events
""",
    category="events",
    description=(
        "Distinct event types over each user's trailing 10 events: Spark "
        "has no windowed COUNT(DISTINCT), so the engine expresses it as "
        "size(collect_set) over the frame — bounded by the type-domain "
        "cardinality, safe at any scale"
    ),
)
def window_rolling_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-9, 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.size(F.collect_set("event_type").over(w)).cast("bigint").alias(
            "n_types_last10"
        ),
    )


@register(
    "bitmap_active_months",
    """
SELECT o_custkey,
       CAST(bit_or(CAST(1 AS BIGINT) << (month(o_orderdate) - 1)) AS BIGINT)
         AS months_bitmap,
       CAST(bit_count(bit_or(CAST(1 AS BIGINT) << (month(o_orderdate) - 1)))
            AS BIGINT) AS n_active_months
FROM orders GROUP BY o_custkey
""",
    category="relational",
    description=(
        "Bitmap-index-style aggregation: calendar-month activity per "
        "customer as one bigint bitmap (bit_or) + popcount — the roaring-"
        "bitmap pattern for cheap distinct-bucket counting at scale"
    ),
)
def bitmap_active_months(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    bit = F.expr("shiftleft(CAST(1 AS BIGINT), month(o_orderdate) - 1)")
    return o.groupBy("o_custkey").agg(
        F.bit_or(bit).cast("bigint").alias("months_bitmap"),
        F.bit_count(F.bit_or(bit)).cast("bigint").alias("n_active_months"),
    )


# ---------------------------------------------------------------------------
# explicit Bloom-filter semi-join
# ---------------------------------------------------------------------------

_BLOOM_BITS = 1 << 16  # m = 65536 bits -> 2048 x 32-bit words
_BLOOM_WORDS = _BLOOM_BITS // 32

_BLOOM_KEYS_SQL = """
keys AS (
  SELECT o_orderkey FROM orders WHERE o_totalprice > 400000
)
"""

_BLOOM_HASH_SQL = f"""
kh AS (
  SELECT o_orderkey,
         {hash48_duck("CAST(o_orderkey AS VARCHAR)")} AS hv
  FROM keys
),
pos AS (
  SELECT hv % {_BLOOM_BITS} AS p FROM kh
  UNION ALL
  SELECT (hv // 65536) % {_BLOOM_BITS} AS p FROM kh
),
words AS (
  SELECT p // 32 AS word_idx,
         bit_or(CAST(1 AS BIGINT) << CAST(p % 32 AS INT)) AS bits
  FROM pos GROUP BY 1
)
"""


@register(
    "bloom_prefilter_join",
    f"""
WITH {_BLOOM_KEYS_SQL},
{_BLOOM_HASH_SQL},
lh AS (
  SELECT l_orderkey, l_returnflag, l_extendedprice,
         {hash48_duck("CAST(l_orderkey AS VARCHAR)")} AS hv
  FROM lineitem
),
cand AS (
  SELECT lh.l_orderkey, lh.l_returnflag, lh.l_extendedprice
  FROM lh
  JOIN words w1 ON w1.word_idx = (lh.hv % {_BLOOM_BITS}) // 32
               AND ((w1.bits >> CAST((lh.hv % {_BLOOM_BITS}) % 32 AS INT)) & 1) = 1
  JOIN words w2 ON w2.word_idx = ((lh.hv // 65536) % {_BLOOM_BITS}) // 32
               AND ((w2.bits >> CAST(((lh.hv // 65536) % {_BLOOM_BITS}) % 32 AS INT)) & 1) = 1
),
verified AS (
  SELECT c.* FROM cand c SEMI JOIN keys k ON c.l_orderkey = k.o_orderkey
),
nc AS (SELECT COUNT(*) AS n_candidates FROM cand)
SELECT l_returnflag,
       COUNT(*) AS n_lines,
       {fxp_sum_sql('l_extendedprice')} AS revenue,
       MAX(n_candidates) AS n_candidates
FROM verified CROSS JOIN nc
GROUP BY l_returnflag
""",
    category="relational",
    description=(
        "Explicit Bloom-filter semi-join: high-value order keys build a "
        "65536-bit / 2-hash Bloom bitmap (2048-row bit_or relation, "
        "broadcast); lineitem probes it before the exact verify join. "
        "n_candidates certifies the bloom's false-positive behavior itself, "
        "not just losslessness — the pattern that replaces shuffling a "
        "100 TB fact against a non-broadcastable key set"
    ),
)
def bloom_prefilter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    # keys feeds the hash projection AND the final verification semi-join;
    # kh feeds both bloom hash positions (the union below).  Both are the
    # SMALL side by construction (the selective key set the bloom exists
    # for) — truncate so orders is scanned once, not once per reference
    # (plan audit: 9 scans untruncated).
    keys = (
        o.where(F.col("o_totalprice") > 400000)
        .select("o_orderkey")
        .localCheckpoint(eager=False)
    )
    kh = keys.select(
        "o_orderkey", hash48(F.col("o_orderkey").cast("string")).alias("hv")
    ).localCheckpoint(eager=False)
    pos = kh.select((F.col("hv") % _BLOOM_BITS).alias("p")).unionAll(
        kh.select(
            (F.expr("hv div 65536") % _BLOOM_BITS).alias("p")
        )
    )
    words = pos.groupBy(F.expr("p div 32").alias("word_idx")).agg(
        F.bit_or(
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 32 AS INT))")
        ).alias("bits")
    )
    lh = li.select(
        "l_orderkey",
        "l_returnflag",
        "l_extendedprice",
        hash48(F.col("l_orderkey").cast("string")).alias("hv"),
    )
    h1 = F.col("hv") % _BLOOM_BITS
    h2 = F.expr("hv div 65536") % _BLOOM_BITS
    cand = (
        lh.join(
            F.broadcast(words.alias("w1")),
            (F.col("w1.word_idx") == F.expr(f"(hv % {_BLOOM_BITS}) div 32"))
            & (
                F.expr(
                    f"(shiftright(w1.bits, CAST((hv % {_BLOOM_BITS}) % 32 AS INT)) & 1) = 1"
                )
            ),
        )
        .drop("word_idx", "bits")
        .join(
            F.broadcast(words.alias("w2")),
            (F.col("w2.word_idx") == F.expr(f"((hv div 65536) % {_BLOOM_BITS}) div 32"))
            & (
                F.expr(
                    f"(shiftright(w2.bits, CAST(((hv div 65536) % {_BLOOM_BITS}) % 32 AS INT)) & 1) = 1"
                )
            ),
        )
        .select("l_orderkey", "l_returnflag", "l_extendedprice")
    )
    # cand (bloom survivors — small by the bloom's purpose) feeds the
    # candidate count AND the verification join
    # ONE pass over cand serves both the candidate count and the
    # verification: the semi join becomes a broadcast LEFT join + match
    # flag, so n_candidates (pre-verify) and the verified aggregates
    # come out of the same scan — no second probe pipeline and no
    # checkpoint that would hide the probe joins from .explain (a
    # whitebox test pins the bitmap broadcasts).
    flagged = cand.join(
        F.broadcast(keys.select(F.col("o_orderkey").alias("_vk"))),
        cand.l_orderkey == F.col("_vk"),
        "left",
    )
    ver = F.col("_vk").isNotNull()
    agg = flagged.agg(
        F.count("*").alias("n_candidates"),
        *[
            F.count(F.when(ver & (F.col("l_returnflag") == flag), 1)).alias(
                f"n_{flag}"
            )
            for flag in ("A", "N", "R")
        ],
        *[
            F.sum(
                F.when(
                    ver & (F.col("l_returnflag") == flag),
                    F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)),
                )
            )
            .cast("double")
            .alias(f"rev_{flag}")
            for flag in ("A", "N", "R")
        ],
    )
    flags = spark.range(1).select(
        F.explode(F.array(F.lit("A"), F.lit("N"), F.lit("R"))).alias("l_returnflag")
    )
    return (
        flags.crossJoin(F.broadcast(agg))
        .select(
            "l_returnflag",
            F.expr(
                "CASE l_returnflag WHEN 'A' THEN n_A WHEN 'N' THEN n_N ELSE n_R END"
            ).alias("n_lines"),
            F.expr(
                "CASE l_returnflag WHEN 'A' THEN rev_A WHEN 'N' THEN rev_N"
                " ELSE rev_R END / 100"
            ).alias("revenue"),
            "n_candidates",
        )
        .where(F.col("n_lines") > 0)
    )


#: cumulative Poisson(1) probabilities (k=0..3) — transcendental constants
#: computed once in Python, embedded as identical literals in both plans
_POIS = (
    "0.36787944117144233",
    "0.7357588823428847",
    "0.9196986029286058",
    "0.9810118431238463",
)
_B_REPLICAS = 32

_W_CASE = (
    f"CASE WHEN u < CAST({_POIS[0]} AS DOUBLE) THEN 0"
    f" WHEN u < CAST({_POIS[1]} AS DOUBLE) THEN 1"
    f" WHEN u < CAST({_POIS[2]} AS DOUBLE) THEN 2"
    f" WHEN u < CAST({_POIS[3]} AS DOUBLE) THEN 3"
    " ELSE 4 END"
)


@register(
    "stats_poisson_bootstrap",
    f"""
WITH v AS (
  SELECT o_orderkey, CAST(FLOOR(o_totalprice + 0.5) AS BIGINT) AS val
  FROM orders
),
r AS (
  SELECT o_orderkey, val, b.b AS b,
         ({hash48_duck("CAST(o_orderkey AS VARCHAR) || '_' || CAST(b.b AS VARCHAR)")}
          % 1000000) / 1000000.0 AS u
  FROM v, range(0, {_B_REPLICAS}) b(b)
),
w AS (SELECT b, val, {_W_CASE} AS wt FROM r),
rm AS (
  SELECT b,
         -- replica means quantized at 1e-2: mq ~ 1e7, so mq*mq and the
         -- moment sums stay far inside int64 on BOTH engines (at 1e6 the
         -- square overflows Spark's bigint under ANSI)
         CAST(FLOOR(CAST(SUM(wt * val) AS DOUBLE) / SUM(wt) * 100 + 0.5)
              AS BIGINT) AS mq
  FROM w GROUP BY b HAVING SUM(wt) > 0
),
pt AS (
  SELECT CAST(SUM(val) AS DOUBLE) / COUNT(*) AS point_mean FROM v
),
agg AS (
  SELECT COUNT(*) AS nb, SUM(mq) AS s, SUM(mq * mq) AS sq FROM rm
)
SELECT CAST(nb AS BIGINT) AS n_replicas,
       point_mean,
       SQRT(CAST(nb * sq - s * s AS DOUBLE) / (nb * nb)) / 100 AS boot_se,
       point_mean
         - 2 * (SQRT(CAST(nb * sq - s * s AS DOUBLE) / (nb * nb)) / 100)
         AS ci_lo,
       point_mean
         + 2 * (SQRT(CAST(nb * sq - s * s AS DOUBLE) / (nb * nb)) / 100)
         AS ci_hi
FROM agg CROSS JOIN pt
""",
    category="relational",
    description=(
        f"Poisson bootstrap (Chamandy/Google 2012) standard error + 95% CI "
        f"for the mean order value: {_B_REPLICAS} replicas materialize as "
        "deterministic hash-drawn Poisson(1) weights per (row, replica) — "
        "resampling-with-replacement as ONE map-side-combinable groupBy, "
        "the only bootstrap that works when the data can't fit one machine"
    ),
)
def stats_poisson_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    v = o.select(
        "o_orderkey",
        F.floor(F.col("o_totalprice") + F.lit(0.5)).cast("bigint").alias("val"),
    )
    bs = spark.range(_B_REPLICAS).select(F.col("id").cast("int").alias("b"))
    r = v.crossJoin(F.broadcast(bs)).select(
        "val",
        "b",
        (
            (
                hash48(
                    F.concat(
                        F.col("o_orderkey").cast("string"),
                        F.lit("_"),
                        F.col("b").cast("string"),
                    )
                )
                % 1000000
            )
            / F.lit(1000000.0)
        ).alias("u"),
    )
    w = r.select("b", "val", F.expr(_W_CASE).alias("wt"))
    rm = (
        w.groupBy("b")
        .agg(
            F.expr(
                "CAST(FLOOR(CAST(SUM(wt * val) AS DOUBLE) / SUM(wt)"
                " * 100 + 0.5) AS BIGINT)"
            ).alias("mq"),
            F.sum("wt").alias("_sw"),
        )
        .where("_sw > 0")
        .drop("_sw")
    )
    pt = v.agg(F.expr("CAST(SUM(val) AS DOUBLE) / COUNT(*)").alias("point_mean"))
    agg = rm.agg(
        F.count("*").alias("nb"),
        F.sum("mq").alias("s"),
        F.sum(F.col("mq") * F.col("mq")).alias("sq"),
    )
    se = "SQRT(CAST(nb * sq - s * s AS DOUBLE) / (nb * nb)) / 100"
    return agg.crossJoin(F.broadcast(pt)).select(
        F.col("nb").cast("bigint").alias("n_replicas"),
        "point_mean",
        F.expr(se).alias("boot_se"),
        F.expr(f"point_mean - 2 * ({se})").alias("ci_lo"),
        F.expr(f"point_mean + 2 * ({se})").alias("ci_hi"),
    )


@register(
    "stats_ks_test",
    """
WITH d AS (
  SELECT CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS v,
         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS g
  FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
),
pv AS (
  SELECT v,
         SUM(g) AS c1,
         SUM(1 - g) AS c2
  FROM d GROUP BY v
),
tot AS (
  SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2 FROM pv
),
run AS (
  SELECT SUM(c1) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS r1,
         SUM(c2) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS r2
  FROM pv
),
dmax AS (
  SELECT MAX(ABS(CAST(r1 AS DOUBLE) / n1 - CAST(r2 AS DOUBLE) / n2)) AS d_stat
  FROM run CROSS JOIN tot
)
SELECT n1, n2, d_stat,
       d_stat * SQRT(CAST(n1 AS DOUBLE) * n2 / (n1 + n2)) AS ks_scaled
FROM dmax CROSS JOIN tot
""",
    category="relational",
    description=(
        "Two-sample Kolmogorov-Smirnov statistic, EXACT and distributed: "
        "ECDFs as running integer counts over value-grouped rows (ties "
        "collapse before the scan, so D is evaluated after each distinct "
        "value — the textbook definition), D = max |F1-F2| a deterministic "
        "max of rationals; the scaled statistic adds one IEEE sqrt"
    ),
)
def stats_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    d = o.where(F.col("o_orderpriority").isin("1-URGENT", "5-LOW")).select(
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint").alias("v"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("g"),
    )
    pv = d.groupBy("v").agg(
        F.sum("g").alias("c1"), F.sum(F.lit(1) - F.col("g")).alias("c2")
    )
    # pv (|distinct prices| rows) feeds the totals AND the ECDF window
    pv = pv.localCheckpoint(eager=False)
    tot = pv.agg(
        F.sum("c1").cast("bigint").alias("n1"),
        F.sum("c2").cast("bigint").alias("n2"),
    )
    # Both running ECDF counts in ONE pass of ops.rank.global_running_sum
    # (round 13, closing the round-12 audit's last unpartitioned window
    # over an input that can reach ~5e7 rows at its price-domain bound —
    # RANK_r12 measured exactly that size at 49.6 s single-task with a
    # 3.4 GB single-task spill): per-bucket prefix sums + broadcast
    # bucket offsets reproduce the global ordered window bit-exactly
    # (running sums of exact integers are partition-independent), with
    # the heavy window hash-partitioned by bucket.  `v` is unique after
    # the groupBy, so no tiebreaks are needed.
    from findb_spark.ops.rank import global_running_sum

    run = global_running_sum(
        pv, "v", value="c1", out="r1", extra_values={"c2": "r2"}
    ).select("r1", "r2")
    dmax = run.crossJoin(F.broadcast(tot)).agg(
        F.max(
            F.abs(
                F.expr("CAST(r1 AS DOUBLE) / n1 - CAST(r2 AS DOUBLE) / n2")
            )
        ).alias("d_stat")
    )
    return dmax.crossJoin(F.broadcast(tot)).select(
        "n1",
        "n2",
        "d_stat",
        F.expr("d_stat * SQRT(CAST(n1 AS DOUBLE) * n2 / (n1 + n2))").alias(
            "ks_scaled"
        ),
    )


@register(
    "stats_mannwhitney",
    """
WITH d AS (
  SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 2 END AS grp,
         CAST(FLOOR(l_quantity + 0.5) AS BIGINT) AS v
  FROM lineitem WHERE l_returnflag IN ('R', 'A')
),
vc AS (
  SELECT v, CAST(COUNT(*) AS BIGINT) AS t,
         CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS t1
  FROM d GROUP BY v
),
rk AS (
  SELECT v, t, t1,
         CAST(2 * COALESCE(SUM(t) OVER (ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              + t + 1 AS BIGINT) AS rank2
  FROM vc
),
agg AS (
  SELECT CAST(SUM(t1) AS BIGINT) AS n1,
         CAST(SUM(t - t1) AS BIGINT) AS n2,
         CAST(SUM(t1 * rank2) AS BIGINT) AS r1x2,
         CAST(SUM(t * t * t - t) AS BIGINT) AS tie_sum
  FROM rk
)
SELECT n1, n2,
       CAST(r1x2 - n1 * (n1 + 1) AS DOUBLE) / 2 AS u1,
       (CAST(r1x2 - n1 * (n1 + 1) AS DOUBLE) / 2 - CAST(n1 * n2 AS DOUBLE) / 2)
         / SQRT(CAST(n1 * n2 AS DOUBLE) / 12
                * (CAST(n1 + n2 + 1 AS DOUBLE)
                   - CAST(tie_sum AS DOUBLE)
                     / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2 - 1)))) AS z
FROM agg
""",
    category="relational",
    description=(
        "Mann-Whitney U rank-sum test (returned vs accepted lineitem "
        "quantities) with tie-averaged ranks and the tie-corrected normal "
        "approximation: ranks are computed on the VALUE-GROUPED relation "
        "(avg rank of a tie group = 2*prefix + t + 1 in half-units), so "
        "the exact integer rank sum needs no global row sort"
    ),
)
def stats_mannwhitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed rank test without ranking rows: group by value (the
    quantity domain is bounded), take one ordered prefix-sum window over
    that tiny value-level relation, and assemble the U statistic from
    exact int64 sums — the row-level global sort a naive RANK() needs
    never happens.  At 100 TB the wide work is one map-side-combinable
    groupBy; the window touches |distinct values| rows.  All moments are
    exact integers; the final divides + IEEE sqrt are bit-deterministic
    cross-engine.  (int64 pre-flight: rank2 <= 2N+1, t1*rank2 summed is
    < 2N^2 ~ 7e11 at sf0.1; tie_sum < N^3/|domain|^2 — fine at driver
    scales, switch the two products to DECIMAL(38,0) beyond ~1e9 rows.)"""
    li = load_table(spark, sf_dir, "lineitem")
    d = li.where(F.col("l_returnflag").isin("R", "A")).select(
        F.when(F.col("l_returnflag") == "R", 1).otherwise(2).alias("grp"),
        F.floor(F.col("l_quantity") + F.lit(0.5)).cast("bigint").alias("v"),
    )
    vc = d.groupBy("v").agg(
        F.count("*").cast("bigint").alias("t"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).cast("bigint").alias("t1"),
    )
    wpre = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    rk = vc.select(
        "t",
        "t1",
        (
            2 * F.coalesce(F.sum("t").over(wpre), F.lit(0)) + F.col("t") + 1
        ).cast("bigint").alias("rank2"),
    )
    agg = rk.agg(
        F.sum("t1").cast("bigint").alias("n1"),
        F.sum(F.col("t") - F.col("t1")).cast("bigint").alias("n2"),
        F.sum(F.col("t1") * F.col("rank2")).cast("bigint").alias("r1x2"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .cast("bigint")
        .alias("tie_sum"),
    )
    return agg.select(
        "n1",
        "n2",
        F.expr("CAST(r1x2 - n1 * (n1 + 1) AS DOUBLE) / 2").alias("u1"),
        F.expr(
            "(CAST(r1x2 - n1 * (n1 + 1) AS DOUBLE) / 2"
            " - CAST(n1 * n2 AS DOUBLE) / 2)"
            " / SQRT(CAST(n1 * n2 AS DOUBLE) / 12"
            " * (CAST(n1 + n2 + 1 AS DOUBLE)"
            " - CAST(tie_sum AS DOUBLE)"
            " / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2 - 1))))"
        ).alias("z"),
    )


@register(
    "stats_histogram_quantiles",
    """
WITH b AS (
  SELECT CAST(FLOOR(o_totalprice / 1000) AS BIGINT) AS bk,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM orders GROUP BY bk
),
cum AS (
  SELECT bk, c,
         CAST(COALESCE(SUM(c) OVER (ORDER BY bk
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS cb
  FROM b
),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM b),
qs AS (SELECT CAST(unnest([0.25, 0.5, 0.75, 0.9, 0.99]) AS DOUBLE) AS q),
tgt AS (
  SELECT q, n, CAST(FLOOR(q * n) AS BIGINT) + 1 AS target
  FROM qs CROSS JOIN tot
)
SELECT t.q, t.n, t.target,
       (cum.bk + CAST(t.target - cum.cb AS DOUBLE) / cum.c) * 1000 AS est_q
FROM tgt t JOIN cum ON cum.cb < t.target AND cum.cb + cum.c >= t.target
""",
    category="relational",
    description=(
        "Mergeable equi-width histogram quantile sketch over order totals "
        "($1000 buckets): per-bucket counts combine map-side, one tiny "
        "prefix-sum window over |buckets| rows, then rank interpolation "
        "inside the covering bucket for q in {.25,.5,.75,.9,.99} — the "
        "fixed-memory deterministic alternative to a global sort, and the "
        "estimates themselves are oracle-certified"
    ),
)
def stats_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate quantiles the 100 TB way: the only pass over the fact
    table is a map-side-combinable groupBy into a bounded bucket grid
    (equi-width histograms merge by cell addition — the same sketch
    serves streaming accumulation and partial aggregation); the
    prefix-sum window and the rank-interpolation join run on |buckets|
    rows.  Deterministic by construction (no sampling, no GK/KLL
    compaction nondeterminism), so the ESTIMATES are hash-comparable
    cross-engine — unlike approx_percentile, whose merge order leaks into
    the result."""
    o = load_table(spark, sf_dir, "orders")
    b = o.groupBy(
        F.floor(F.col("o_totalprice") / 1000).cast("bigint").alias("bk")
    ).agg(F.count("*").cast("bigint").alias("c"))
    wpre = Window.orderBy("bk").rowsBetween(Window.unboundedPreceding, -1)
    cum = b.select(
        "bk",
        "c",
        F.coalesce(F.sum("c").over(wpre), F.lit(0)).cast("bigint").alias("cb"),
    )
    tot = b.agg(F.sum("c").cast("bigint").alias("n"))
    qs = local_relation_df(
        spark, [(q,) for q in (0.25, 0.5, 0.75, 0.9, 0.99)], "q double"
    )
    tgt = qs.crossJoin(F.broadcast(tot)).select(
        "q", "n", (F.floor(F.col("q") * F.col("n")).cast("bigint") + 1).alias("target")
    )
    return F.broadcast(tgt).join(
        cum,
        (F.col("cb") < F.col("target")) & (F.col("cb") + F.col("c") >= F.col("target")),
    ).select(
        "q",
        "n",
        "target",
        (
            (F.col("bk") + F.expr("CAST(target - cb AS DOUBLE) / c")) * 1000
        ).alias("est_q"),
    )


@register(
    "lineitem_transit_peak",
    """
WITH iv AS (
  SELECT l_returnflag AS flag,
         CAST(l_shipdate AS DATE) AS s,
         CAST(l_shipdate AS DATE) + CAST(1 + l_suppkey % 20 AS INTEGER) AS e
  FROM lineitem
),
ev AS (
  SELECT flag, s AS d, 1 AS delta FROM iv
  UNION ALL
  SELECT flag, e AS d, -1 AS delta FROM iv
),
agg AS (
  SELECT flag, d, CAST(SUM(delta) AS BIGINT) AS net FROM ev GROUP BY flag, d
),
sweep AS (
  SELECT flag, d,
         CAST(SUM(net) OVER (PARTITION BY flag ORDER BY d
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS conc
  FROM agg
),
r AS (SELECT *, MAX(conc) OVER (PARTITION BY flag) AS mx FROM sweep)
SELECT flag, CAST(mx AS BIGINT) AS peak_concurrency,
       CAST(MIN(d) AS VARCHAR) AS peak_day
FROM r WHERE conc = mx GROUP BY flag, mx
""",
    category="relational",
    description=(
        "Sweep-line peak concurrency: each lineitem is in transit over "
        "[shipdate, shipdate + 1 + suppkey%20 days); +1/-1 boundary "
        "events, per-day net deltas, a running sum per return flag, and "
        "the max + first day it is reached — interval overlap counting "
        "in O(2 rows) per interval instead of O(days) explode"
    ),
)
def lineitem_transit_peak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sweep-line alternative to interval decomposition
    (orders_open_backlog explodes one row per covered day — right when
    you need EVERY day's value; this shape answers extremal/threshold
    questions in two rows per interval regardless of duration).  The
    boundary union pre-aggregates to per-(group, day) net deltas before
    the window, so the running sum touches |groups x distinct days| rows
    — at 100 TB the cumulative window is range-partitioned per group on
    a relation the size of the calendar, not the fact table."""
    li = load_table(spark, sf_dir, "lineitem")
    iv = li.select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_shipdate").cast("date").alias("s"),
        F.date_add(
            F.col("l_shipdate").cast("date"),
            (1 + F.col("l_suppkey") % 20).cast("int"),
        ).alias("e"),
    )
    ev = iv.select("flag", F.col("s").alias("d"), F.lit(1).alias("delta")).unionAll(
        iv.select("flag", F.col("e").alias("d"), F.lit(-1).alias("delta"))
    )
    agg = ev.groupBy("flag", "d").agg(F.sum("delta").cast("bigint").alias("net"))
    wrun = (
        Window.partitionBy("flag")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sweep = agg.select(
        "flag", "d", F.sum("net").over(wrun).cast("bigint").alias("conc")
    )
    r = sweep.withColumn("mx", F.max("conc").over(Window.partitionBy("flag")))
    return (
        r.where(F.col("conc") == F.col("mx"))
        .groupBy("flag", "mx")
        .agg(F.min("d").cast("string").alias("peak_day"))
        .select(
            "flag",
            F.col("mx").cast("bigint").alias("peak_concurrency"),
            "peak_day",
        )
    )


@register(
    "skew_salted_join",
    """
WITH big AS (
  SELECT CASE WHEN l_partkey % 4 != 0 THEN 0
              ELSE CAST(l_partkey % 50 AS BIGINT) END AS sk,
         l_returnflag AS flag,
         CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
  FROM lineitem
),
dim AS (
  SELECT CAST(unnest(range(50)) AS BIGINT) AS sk
),
dimw AS (SELECT sk, (sk * 7 + 3) % 11 + 1 AS weight FROM dim)
SELECT flag,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(cents * weight) AS BIGINT) AS sum_weighted
FROM big JOIN dimw USING (sk)
GROUP BY flag
""",
    category="relational",
    description=(
        "Salted skew join hard signal: ~75 percent of lineitem rows are "
        "forced onto one hot key, the 50-row dim is replicated 8-fold, "
        "and the big side scatters across replicas by a row-unique hash "
        "— the salted shuffle join must be row-identical to the oracle's "
        "plain join (salting is an equi-join refinement, not an "
        "approximation)"
    ),
)
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB skew story made concrete: a single hot key would pin one
    reducer at ~75 percent of the table; 8-way salting bounds any task at
    ~1/8 of the hot key (scale the salt count with the observed skew
    ratio — stats_key_skew is the profiling query that measures it).
    AQE's sort-merge skew split is the zero-code alternative; salting
    remains the portable fix for shuffle-hash joins, grouping keys, and
    static plans.  This query puts plans/skew.py's operator (previously
    pytest-only) under the driver's oracle gate — salting must be
    row-identical to the plain join."""
    from findb_spark.plans.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem")
    big = li.select(
        F.when(F.col("l_partkey") % 4 != 0, F.lit(0).cast("bigint"))
        .otherwise((F.col("l_partkey") % 50).cast("bigint"))
        .alias("sk"),
        F.col("l_returnflag").alias("flag"),
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("cents"),
        "l_orderkey",
        "l_linenumber",
    )
    dim = spark.range(50).select(
        F.col("id").alias("sk"),
        ((F.col("id") * 7 + 3) % 11 + 1).alias("weight"),
    )
    j = salted_join(big, dim, "sk", salt=8)
    return j.groupBy("flag").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.col("cents") * F.col("weight")).cast("bigint").alias("sum_weighted"),
    )


@register(
    "part_supplier_hhi",
    """
WITH q AS (
  SELECT l_partkey, l_suppkey,
         CAST(SUM(CAST(FLOOR(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS qty
  FROM lineitem GROUP BY l_partkey, l_suppkey
),
t AS (
  SELECT l_partkey,
         CAST(SUM(qty) AS BIGINT) AS q_tot,
         CAST(SUM(qty * qty) AS BIGINT) AS q_sq,
         CAST(COUNT(*) AS BIGINT) AS n_suppliers
  FROM q GROUP BY l_partkey
),
h AS (
  SELECT l_partkey, n_suppliers, q_tot,
         CAST(q_sq AS DOUBLE) / (q_tot * q_tot) * 10000 AS hhi
  FROM t WHERE q_tot > 0
)
SELECT l_partkey, n_suppliers, q_tot, hhi
FROM h ORDER BY hhi DESC, l_partkey LIMIT 20
""",
    category="relational",
    description=(
        "Supplier-concentration Herfindahl index per part (procurement "
        "risk screen): HHI = 10000 * sum(share^2) from exact integer "
        "quantity moments (sum of squares over total squared — no "
        "per-share divides), top-20 most concentrated parts with "
        "deterministic ties"
    ),
)
def part_supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two map-side-combinable aggregates (supplier-level then "
    "part-level) and a bounded top-k — the concentration metric never "
    "materializes per-share ratios, so everything before the final "
    "divide is exact int64."""
    li = load_table(spark, sf_dir, "lineitem")
    q = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.floor(F.col("l_quantity") + F.lit(0.5)).cast("bigint"))
        .cast("bigint")
        .alias("qty")
    )
    t = q.groupBy("l_partkey").agg(
        F.sum("qty").cast("bigint").alias("q_tot"),
        F.sum(F.col("qty") * F.col("qty")).cast("bigint").alias("q_sq"),
        F.count("*").cast("bigint").alias("n_suppliers"),
    )
    h = t.where("q_tot > 0").select(
        "l_partkey",
        "n_suppliers",
        "q_tot",
        F.expr("CAST(q_sq AS DOUBLE) / (q_tot * q_tot) * 10000").alias("hhi"),
    )
    return h.orderBy(F.desc("hhi"), "l_partkey").limit(20)


@register(
    "dq_duplicate_orders",
    """
WITH k AS (
  SELECT o_custkey,
         CAST(strftime(o_orderdate, '%Y%m%d') AS BIGINT) AS order_date,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(MIN(o_orderkey) AS BIGINT) AS first_key
  FROM orders GROUP BY o_custkey, order_date
)
SELECT o_custkey, order_date, n, first_key
FROM k WHERE n >= 2
""",
    category="quality",
    description=(
        "Duplicate-invoice detection (the classic billing DQ rule): "
        "orders sharing (customer, order date) grouped and flagged — a "
        "plain hash groupBy that scales to any order volume, emitting "
        "each suspect group with its size and earliest order key.  Keyed "
        "on order DATE, not exact cent amount: o_totalprice is unique "
        "per customer in the driver data at every SF, so the cent-amount "
        "rule certified empty-vs-empty for 8 rounds (the round-8 vacuous-"
        "certification finding); same-customer-same-day groups exist at "
        "every SF (1 / 32 / 355 at sf0.001/0.01/0.1)"
    ),
)
def dq_duplicate_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    k = o.groupBy(
        "o_custkey",
        yyyymmdd_int("o_orderdate").cast("bigint").alias("order_date"),
    ).agg(
        F.count("*").cast("bigint").alias("n"),
        F.min("o_orderkey").cast("bigint").alias("first_key"),
    )
    return k.where("n >= 2")


@register(
    "stats_anova_f",
    """
WITH d AS (
  SELECT o_orderpriority AS grp,
         CAST(FLOOR(o_totalprice + 0.5) AS BIGINT) AS v
  FROM orders
),
m AS (
  SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(v) AS BIGINT) AS s,
         CAST(SUM(v * v) AS BIGINT) AS sq
  FROM d GROUP BY grp
),
g AS (
  SELECT CAST(SUM(n) AS BIGINT) AS n_tot,
         CAST(SUM(s) AS BIGINT) AS s_tot,
         CAST(COUNT(*) AS BIGINT) AS k
  FROM m
),
parts AS (
  -- SSB = sum(s_g^2/n_g) - s_tot^2/n_tot ; SSW = sum(sq_g) - sum(s_g^2/n_g).
  -- Each group's s^2/n term is a deterministic double (one exact int->
  -- double conversion, one multiply, one divide — s squared in DOUBLE
  -- since round 11: s*s in int64 overflows once a group's dollar sum
  -- passes ~3e9, hit at sf0.1) but a plain SUM over groups would be
  -- order-dependent: fxp-quantize per group at 1e2, sum exactly
  SELECT CAST(SUM(CAST(FLOOR(CAST(s AS DOUBLE) * s / n * 100 + 0.5)
                       AS BIGINT)) AS DOUBLE) / 100 AS sum_sg2_ng,
         CAST(SUM(sq) AS BIGINT) AS sq_tot
  FROM m
)
SELECT g.k, g.n_tot,
       ((p.sum_sg2_ng - CAST(g.s_tot AS DOUBLE) * g.s_tot / g.n_tot)
          / (g.k - 1))
         / ((CAST(p.sq_tot AS DOUBLE) - p.sum_sg2_ng) / (g.n_tot - g.k))
         AS f_stat
FROM g CROSS JOIN parts p
""",
    category="relational",
    description=(
        "One-way ANOVA F statistic across the five order-priority groups "
        "on dollar-quantized totals: between/within sums of squares "
        "assembled from exact integer group moments (the only floats are "
        "the s^2/n divides, identical op order both engines)"
    ),
)
def stats_anova_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Completes the hypothesis-test family (Welch t = 2 groups,
    Mann-Whitney = rank-based, chi-squared = categorical, KS =
    distributional, ANOVA = k-group means): one map-side-combinable
    group-moment aggregate, then arithmetic on a k-row relation.

    Float-determinism: each group's s^2/n is a deterministic double
    (exact int->double conversion -> one multiply -> one divide; the
    square moved from int64 to DOUBLE in round 11 because s*s overflows
    int64 once a group's dollar sum passes ~3e9 — hit at sf0.1 on
    regenerated data), but summing k doubles is order-dependent, so the
    terms are fxp-quantized at 1e2 and summed as exact integers — the
    same order-independence idiom every money sum here uses."""
    o = load_table(spark, sf_dir, "orders")
    d = o.select(
        F.col("o_orderpriority").alias("grp"),
        F.floor(F.col("o_totalprice") + F.lit(0.5)).cast("bigint").alias("v"),
    )
    m = d.groupBy("grp").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("v").cast("bigint").alias("s"),
        F.sum(F.col("v") * F.col("v")).cast("bigint").alias("sq"),
    )
    g = m.agg(
        F.sum("n").cast("bigint").alias("n_tot"),
        F.sum("s").cast("bigint").alias("s_tot"),
        F.count("*").cast("bigint").alias("k"),
    )
    parts = m.agg(
        (
            F.sum(
                F.floor(
                    F.expr("CAST(s AS DOUBLE) * s / n") * 100 + F.lit(0.5)
                ).cast("bigint")
            ).cast("double")
            / 100
        ).alias("sum_sg2_ng"),
        F.sum("sq").cast("bigint").alias("sq_tot"),
    )
    return g.crossJoin(F.broadcast(parts)).select(
        "k",
        "n_tot",
        F.expr(
            "((sum_sg2_ng - CAST(s_tot AS DOUBLE) * s_tot / n_tot) / (k - 1))"
            " / ((CAST(sq_tot AS DOUBLE) - sum_sg2_ng) / (n_tot - k))"
        ).alias("f_stat"),
    )


# ---- rank statistics over monthly asset series ---------------------------
# Shared relation: month-end (last trading day) price per asset, value
# fxp-quantized at cents so every comparison/rank below is on exact ints.

_MONTHLY_CTE = """
m AS (
  SELECT asset_id, month, ARG_MAX(v, date) AS v FROM (
    SELECT asset_id, date, date // 100 AS month,
           CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v
    FROM daily WHERE asset_id <= 6)
  GROUP BY asset_id, month
)
"""


def _monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from findb_spark.queries.timeseries import _daily

    d = _daily(spark, sf_dir).where(F.col("asset_id") <= 6)
    return (
        d.select(
            "asset_id",
            "date",
            F.expr("date div 100").alias("month"),
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("v"),
        )
        .groupBy("asset_id", "month")
        .agg(F.expr("max_by(v, date)").alias("v"))
    )


def _aligned_pairs(monthly: DataFrame) -> DataFrame:
    a, b = monthly.alias("a"), monthly.alias("b")
    return a.join(
        b,
        (F.col("a.month") == F.col("b.month"))
        & (F.col("a.asset_id") < F.col("b.asset_id")),
    ).select(
        F.col("a.asset_id").alias("a1"),
        F.col("b.asset_id").alias("a2"),
        F.col("a.month").alias("month"),
        F.col("a.v").alias("x"),
        F.col("b.v").alias("y"),
    )


_ALIGNED_SQL = """
al AS (
  SELECT a.asset_id AS a1, b.asset_id AS a2, a.month, a.v AS x, b.v AS y
  FROM m a JOIN m b ON a.month = b.month AND a.asset_id < b.asset_id
)
"""

from findb_spark.queries.timeseries import _DAILY_CTE  # noqa: E402


@register(
    "stats_kendall_tau",
    f"""
WITH {_DAILY_CTE},
{_MONTHLY_CTE},
{_ALIGNED_SQL},
pp AS (
  SELECT p.a1, p.a2,
         CAST(SUM(CASE WHEN (q.x - p.x) * (q.y - p.y) > 0 THEN 1 ELSE 0 END) AS BIGINT) AS conc,
         CAST(SUM(CASE WHEN (q.x - p.x) * (q.y - p.y) < 0 THEN 1 ELSE 0 END) AS BIGINT) AS disc,
         CAST(SUM(CASE WHEN q.x = p.x THEN 1 ELSE 0 END) AS BIGINT) AS tx,
         CAST(SUM(CASE WHEN q.y = p.y THEN 1 ELSE 0 END) AS BIGINT) AS ty,
         COUNT(*) AS np
  FROM al p JOIN al q
    ON p.a1 = q.a1 AND p.a2 = q.a2 AND p.month < q.month
  GROUP BY p.a1, p.a2
)
SELECT a1, a2, conc, disc,
       CASE WHEN np = tx OR np = ty THEN NULL
            ELSE CAST(FLOOR((CAST(conc AS DOUBLE) - CAST(disc AS DOUBLE))
                  / (SQRT(CAST(np - tx AS DOUBLE)) * SQRT(CAST(np - ty AS DOUBLE)))
                  * 100000000 + 0.5) AS BIGINT) END AS tau_b_p8
FROM pp
""",
    category="relational",
    description=(
        "Kendall tau-b rank correlation between month-end asset price "
        "series (all-pairs concordance over exact integer cents; ties "
        "handled by the tau-b denominator). The time-pair join is "
        "O(months^2) per asset pair — bounded by the calendar, not the "
        "data, so it scales with history length only"
    ),
)
def stats_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    al = _aligned_pairs(_monthly(spark, sf_dir))
    p, q = al.alias("p"), al.alias("q")
    sgn = (F.col("q.x") - F.col("p.x")) * (F.col("q.y") - F.col("p.y"))
    pp = (
        p.join(
            q,
            (F.col("p.a1") == F.col("q.a1"))
            & (F.col("p.a2") == F.col("q.a2"))
            & (F.col("p.month") < F.col("q.month")),
        )
        .groupBy(F.col("p.a1").alias("a1"), F.col("p.a2").alias("a2"))
        .agg(
            F.sum(F.when(sgn > 0, 1).otherwise(0)).cast("bigint").alias("conc"),
            F.sum(F.when(sgn < 0, 1).otherwise(0)).cast("bigint").alias("disc"),
            F.sum(F.when(F.col("q.x") == F.col("p.x"), 1).otherwise(0))
            .cast("bigint")
            .alias("tx"),
            F.sum(F.when(F.col("q.y") == F.col("p.y"), 1).otherwise(0))
            .cast("bigint")
            .alias("ty"),
            F.count("*").alias("np"),
        )
    )
    return pp.select(
        "a1",
        "a2",
        "conc",
        "disc",
        # fixed-point 1e8 (half-up): subtract/sqrt/divide over exact ints
        # are correctly-rounded IEEE ops, bit-equal cross-engine, unlike
        # ROUND(double, 8).  All-tied series (tx=np or ty=np) make the
        # denominator 0 -> NULL (DuckDB raises on CAST(FLOOR(NaN)), Spark
        # silently wraps — the guard keeps the query total on both).
        F.when(
            (F.col("np") == F.col("tx")) | (F.col("np") == F.col("ty")),
            F.lit(None).cast("bigint"),
        )
        .otherwise(
            F.floor(
                (F.col("conc").cast("double") - F.col("disc").cast("double"))
                / (
                    F.sqrt((F.col("np") - F.col("tx")).cast("double"))
                    * F.sqrt((F.col("np") - F.col("ty")).cast("double"))
                )
                * 100000000
                + F.lit(0.5)
            ).cast("bigint")
        )
        .alias("tau_b_p8"),
    )


@register(
    "stats_spearman",
    f"""
WITH {_DAILY_CTE},
{_MONTHLY_CTE},
{_ALIGNED_SQL},
rk AS (
  SELECT a1, a2,
         2 * RANK() OVER (PARTITION BY a1, a2 ORDER BY x)
           + COUNT(*) OVER (PARTITION BY a1, a2, x) - 1 AS rx,
         2 * RANK() OVER (PARTITION BY a1, a2 ORDER BY y)
           + COUNT(*) OVER (PARTITION BY a1, a2, y) - 1 AS ry
  FROM al
),
mo AS (
  SELECT a1, a2, COUNT(*) AS n,
         CAST(SUM(rx) AS BIGINT) AS sx, CAST(SUM(ry) AS BIGINT) AS sy,
         CAST(SUM(rx * ry) AS BIGINT) AS sxy,
         CAST(SUM(rx * rx) AS BIGINT) AS sxx,
         CAST(SUM(ry * ry) AS BIGINT) AS syy
  FROM rk GROUP BY a1, a2
)
SELECT a1, a2, n,
       CASE WHEN n * sxx = sx * sx OR n * syy = sy * sy THEN NULL
            ELSE CAST(FLOOR((CAST(n * sxy - sx * sy AS DOUBLE))
                  / (SQRT(CAST(n * sxx - sx * sx AS DOUBLE))
                     * SQRT(CAST(n * syy - sy * sy AS DOUBLE)))
                  * 100000000 + 0.5) AS BIGINT) END AS rho_p8
FROM mo WHERE n >= 3
""",
    category="relational",
    description=(
        "Spearman rank correlation between month-end asset series: average "
        "ranks doubled to stay integer (2r = 2*RANK + ties - 1), then "
        "Pearson's closed form on exact integer rank moments — "
        "correlation is affine-invariant so rho is unchanged"
    ),
)
def stats_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    al = _aligned_pairs(_monthly(spark, sf_dir))
    wx = Window.partitionBy("a1", "a2").orderBy("x")
    wy = Window.partitionBy("a1", "a2").orderBy("y")
    cx = Window.partitionBy("a1", "a2", "x")
    cy = Window.partitionBy("a1", "a2", "y")
    rk = al.select(
        "a1",
        "a2",
        (2 * F.rank().over(wx) + F.count("*").over(cx) - 1).alias("rx"),
        (2 * F.rank().over(wy) + F.count("*").over(cy) - 1).alias("ry"),
    )
    mo = rk.groupBy("a1", "a2").agg(
        F.count("*").alias("n"),
        F.sum("rx").cast("bigint").alias("sx"),
        F.sum("ry").cast("bigint").alias("sy"),
        F.sum(F.col("rx") * F.col("ry")).cast("bigint").alias("sxy"),
        F.sum(F.col("rx") * F.col("rx")).cast("bigint").alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).cast("bigint").alias("syy"),
    )
    # moments combined in EXACT int64 (ranks are O(n), fourth-order terms
    # ~4n^4 stay far inside int64 for calendar-bounded month counts), then
    # ONE cast to double per factor: divide/sqrt are correctly-rounded so
    # the fixed-point 1e8 output is bit-equal cross-engine
    num = F.expr("CAST(n * sxy - sx * sy AS DOUBLE)")
    den = F.sqrt(F.expr("CAST(n * sxx - sx * sx AS DOUBLE)")) * F.sqrt(
        F.expr("CAST(n * syy - sy * sy AS DOUBLE)")
    )
    return mo.where(F.col("n") >= 3).select(
        "a1",
        "a2",
        "n",
        # constant-rank series (zero variance) -> NULL, keeping the
        # query total on both engines instead of NaN/Inf in the floor
        F.when(
            F.expr("n * sxx = sx * sx OR n * syy = sy * sy"),
            F.lit(None).cast("bigint"),
        )
        .otherwise(
            F.floor(num / den * 100000000 + F.lit(0.5)).cast("bigint")
        )
        .alias("rho_p8"),
    )


@register(
    "stats_theil_sen",
    f"""
WITH {_DAILY_CTE},
{_MONTHLY_CTE},
ma AS (
  SELECT asset_id, v,
         ROW_NUMBER() OVER (PARTITION BY asset_id ORDER BY month) AS t
  FROM m WHERE asset_id <= 5
),
sl AS (
  SELECT p.asset_id,
         CAST(q.v - p.v AS DOUBLE) / CAST(q.t - p.t AS DOUBLE) AS slope
  FROM ma p JOIN ma q ON p.asset_id = q.asset_id AND p.t < q.t
),
rk AS (
  SELECT asset_id, slope,
         ROW_NUMBER() OVER (PARTITION BY asset_id ORDER BY slope) AS r,
         COUNT(*) OVER (PARTITION BY asset_id) AS n
  FROM sl
)
SELECT asset_id, CAST(MAX(n) AS BIGINT) AS n_pairs,
       CAST(FLOOR(AVG(slope) * 1000000 + 0.5) AS BIGINT)
         AS ts_slope_cents_ppm
FROM rk
WHERE r = (n + 1) // 2 OR r = (n + 2) // 2
GROUP BY asset_id
""",
    category="relational",
    description=(
        "Theil-Sen robust trend: median of all pairwise month-end slopes "
        "per asset (slopes are exact int/int divides in cents/month; "
        "explicit order-statistic median so both engines pick identical "
        "middle elements). Pairwise set is O(months^2) — calendar-bounded"
    ),
)
def stats_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = _monthly(spark, sf_dir).where(F.col("asset_id") <= 5)
    ma = m.select(
        "asset_id",
        "v",
        F.row_number()
        .over(Window.partitionBy("asset_id").orderBy("month"))
        .alias("t"),
    )
    p, q = ma.alias("p"), ma.alias("q")
    sl = p.join(
        q,
        (F.col("p.asset_id") == F.col("q.asset_id")) & (F.col("p.t") < F.col("q.t")),
    ).select(
        F.col("p.asset_id").alias("asset_id"),
        (
            (F.col("q.v") - F.col("p.v")).cast("double")
            / (F.col("q.t") - F.col("p.t")).cast("double")
        ).alias("slope"),
    )
    rk = sl.select(
        "asset_id",
        "slope",
        F.row_number()
        .over(Window.partitionBy("asset_id").orderBy("slope"))
        .alias("r"),
        F.count("*").over(Window.partitionBy("asset_id")).alias("n"),
    )
    return (
        rk.where(
            (F.col("r") == F.expr("(n + 1) div 2"))
            | (F.col("r") == F.expr("(n + 2) div 2"))
        )
        .groupBy("asset_id")
        .agg(
            F.max("n").cast("bigint").alias("n_pairs"),
            # AVG over the 1-2 middle order statistics is deterministic
            # (commutative two-term sum); fixed-point 1e6 half-up replaces
            # the engine-unstable ROUND(double, 6)
            F.floor(F.avg("slope") * 1000000 + F.lit(0.5))
            .cast("bigint")
            .alias("ts_slope_cents_ppm"),
        )
    )


@register(
    "stats_cramers_v",
    """
WITH d AS (
  SELECT o_orderpriority AS pri, o_orderstatus AS st FROM orders
),
cells AS (SELECT pri, st, COUNT(*) AS o FROM d GROUP BY 1, 2),
rt AS (SELECT pri, SUM(o) AS row_tot FROM cells GROUP BY 1),
ct AS (SELECT st, SUM(o) AS col_tot FROM cells GROUP BY 1),
g AS (SELECT SUM(o) AS grand FROM cells),
terms AS (
  SELECT CAST(FLOOR(
           (o - CAST(row_tot AS DOUBLE) * col_tot / grand)
           * (o - CAST(row_tot AS DOUBLE) * col_tot / grand)
           / (CAST(row_tot AS DOUBLE) * col_tot / grand) * 1000000 + 0.5)
         AS BIGINT) AS t
  FROM cells JOIN rt USING (pri) JOIN ct USING (st) CROSS JOIN g
),
dims AS (SELECT COUNT(DISTINCT pri) AS r, COUNT(DISTINCT st) AS c FROM cells)
SELECT CAST(SUM(t) AS BIGINT) AS chi2_x1e6,
       CAST(MAX(g.grand) AS BIGINT) AS n,
       CAST((MAX(d2.r) - 1) * (MAX(d2.c) - 1) AS BIGINT) AS dof,
       CASE WHEN LEAST(MAX(d2.r) - 1, MAX(d2.c) - 1) = 0 THEN NULL
            ELSE CAST(FLOOR(SQRT(CAST(SUM(t) AS DOUBLE) / 1000000
                  / (CAST(MAX(g.grand) AS DOUBLE)
                     * LEAST(MAX(d2.r) - 1, MAX(d2.c) - 1)))
                  * 100000000 + 0.5) AS BIGINT) END AS cramers_v_p8
FROM terms CROSS JOIN g CROSS JOIN dims d2
""",
    category="relational",
    description=(
        "Cramer's V effect size for order priority x order status: the "
        "chi-squared machinery (exact rational expected counts, "
        "fixed-point term sum) normalized to [0,1] by n*min(r-1,c-1) — "
        "association strength, not just significance"
    ),
)
def stats_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected counts in the overflow-safe double-tree form (round 12 —
    see stats_chi2_independence; same marginal-product class).  The
    ``chi2_x1e6`` OUTPUT column stays exact int64 fixed point by
    contract: chi2 <= n*min(r-1,c-1), so the column represents corpora
    to n ~ 9e12 orders (chi2*1e6 < 2^63) — an output-representation
    bound that fails loudly via the ANSI sum, not a silent internal
    overflow like the fixed product."""
    o = load_table(spark, sf_dir, "orders")
    d = o.select(F.col("o_orderpriority").alias("pri"), F.col("o_orderstatus").alias("st"))
    cells = d.groupBy("pri", "st").agg(F.count("*").alias("o"))
    # the r x c contingency table feeds row/column/grand totals and the
    # term join — same truncation as stats_chi2_independence
    cells = cells.localCheckpoint(eager=False)
    rt = cells.groupBy("pri").agg(F.sum("o").alias("row_tot"))
    ct = cells.groupBy("st").agg(F.sum("o").alias("col_tot"))
    g = cells.agg(F.sum("o").alias("grand"))
    terms = (
        cells.join(F.broadcast(rt), "pri")
        .join(F.broadcast(ct), "st")
        .crossJoin(F.broadcast(g))
        .select(
            F.expr(_chi2_term_expr()).alias("t"),
            "grand",
            "pri",
            "st",
        )
    )
    agg = terms.agg(
        F.sum("t").alias("st_sum"),
        F.max("grand").alias("grand"),
        F.countDistinct("pri").alias("r"),
        F.countDistinct("st").alias("c"),
    )
    # chi2 emitted as its exact 1e6-fixed-point integer; V as 1e8 fixed
    # point (divide/sqrt are correctly-rounded, bit-equal cross-engine)
    chi2 = F.col("st_sum").cast("double") / 1000000
    return agg.select(
        F.col("st_sum").cast("bigint").alias("chi2_x1e6"),
        F.col("grand").cast("bigint").alias("n"),
        ((F.col("r") - 1) * (F.col("c") - 1)).cast("bigint").alias("dof"),
        # a 1xC or Rx1 table has min(r-1, c-1) = 0 -> NULL (V undefined),
        # keeping the query total on both engines
        F.when(
            F.least(F.col("r") - 1, F.col("c") - 1) == 0,
            F.lit(None).cast("bigint"),
        )
        .otherwise(
            F.floor(
                F.sqrt(
                    chi2
                    / (
                        F.col("grand").cast("double")
                        * F.least(F.col("r") - 1, F.col("c") - 1)
                    )
                )
                * 100000000
                + F.lit(0.5)
            ).cast("bigint")
        )
        .alias("cramers_v_p8"),
    )


@register(
    "orders_abc_xyz",
    """
WITH rev AS (
  SELECT l_partkey AS part,
         CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS cents
  FROM lineitem GROUP BY 1
),
abc AS (
  SELECT part, cents,
         CAST(SUM(cents) OVER (ORDER BY cents DESC, part) AS BIGINT) AS cum,
         CAST(SUM(cents) OVER () AS BIGINT) AS tot
  FROM rev
),
abc_cls AS (
  -- 70/90 cuts as exact DECIMAL cross-products (round 12): tot*10 in
  -- int64 sits ~1.6x under 2^63 at the 100 TB corpus's total revenue
  -- cents — DECIMAL removes the ceiling while staying an exact integer
  -- comparison on both engines
  SELECT part, cents,
         CASE WHEN CAST(cum AS DECIMAL(28,0)) * 10
                   <= CAST(tot AS DECIMAL(28,0)) * 7 THEN 'A'
              WHEN CAST(cum AS DECIMAL(28,0)) * 10
                   <= CAST(tot AS DECIMAL(28,0)) * 9 THEN 'B'
              ELSE 'C' END AS abc_class
  FROM abc
),
mq AS (
  SELECT l_partkey AS part,
         CAST(strftime(l_shipdate, '%Y%m') AS INT) AS month,
         CAST(SUM(CAST(FLOOR(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS q
  FROM lineitem GROUP BY 1, 2
),
xyz AS (
  SELECT part, COUNT(*) AS n, CAST(SUM(q) AS BIGINT) AS s,
         CAST(SUM(q * q) AS BIGINT) AS sq
  FROM mq GROUP BY part
),
xyz_cls AS (
  SELECT part,
         CASE WHEN (n * sq - s * s) * 4 < s * s THEN 'X'
              WHEN n * sq - s * s < s * s THEN 'Y'
              ELSE 'Z' END AS xyz_class
  FROM xyz
)
SELECT abc_class, xyz_class,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(SUM(cents) AS BIGINT) AS rev_cents
FROM abc_cls JOIN xyz_cls USING (part)
GROUP BY abc_class, xyz_class
""",
    category="relational",
    description=(
        "ABC/XYZ inventory classification grid: ABC by cumulative revenue "
        "share (70/90 cuts as exact integer cross-products, no double "
        "thresholds), XYZ by demand variability (CV cuts 0.5/1.0 compared "
        "as exact integer moment inequalities: CV^2 = (n*sq - s^2)/s^2)"
    ),
)
def orders_abc_xyz(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("bigint")
    rev = li.groupBy(F.col("l_partkey").alias("part")).agg(
        F.sum(cents).cast("bigint").alias("cents")
    )
    # cumulative revenue via ops.rank.global_running_sum (round 12): the
    # builtin unpartitioned window coalesces the whole per-part relation
    # into one task; the bucket+offset form is bit-identical and scales.
    # The 70/90 cuts compare in exact DECIMAL (see the oracle comment).
    from findb_spark.ops.rank import global_running_sum

    rev = rev.localCheckpoint(eager=False)  # feeds ranking + 1-row total
    tot1 = rev.agg(F.sum("cents").cast("bigint").alias("tot"))
    abc = (
        global_running_sum(
            rev, "cents", ["part"], value="cents", descending=True, out="cum"
        )
        .crossJoin(F.broadcast(tot1))
        .select(
            "part",
            "cents",
            F.expr(
                "CASE WHEN CAST(cum AS DECIMAL(28,0)) * 10"
                " <= CAST(tot AS DECIMAL(28,0)) * 7 THEN 'A'"
                " WHEN CAST(cum AS DECIMAL(28,0)) * 10"
                " <= CAST(tot AS DECIMAL(28,0)) * 9 THEN 'B'"
                " ELSE 'C' END"
            ).alias("abc_class"),
        )
    )
    mq = li.groupBy(
        F.col("l_partkey").alias("part"),
        yyyymm_int("l_shipdate").alias("month"),
    ).agg(
        F.sum(F.floor(F.col("l_quantity") + F.lit(0.5)).cast("bigint"))
        .cast("bigint")
        .alias("q")
    )
    xyz = mq.groupBy("part").agg(
        F.count("*").alias("n"),
        F.sum("q").cast("bigint").alias("s"),
        F.sum(F.col("q") * F.col("q")).cast("bigint").alias("sq"),
    )
    var_num = F.col("n") * F.col("sq") - F.col("s") * F.col("s")
    xyz_cls = xyz.select(
        "part",
        F.when(var_num * 4 < F.col("s") * F.col("s"), "X")
        .when(var_num < F.col("s") * F.col("s"), "Y")
        .otherwise("Z")
        .alias("xyz_class"),
    )
    return (
        abc.join(xyz_cls, "part")
        .groupBy("abc_class", "xyz_class")
        .agg(
            F.count("*").cast("bigint").alias("n_parts"),
            F.sum("cents").cast("bigint").alias("rev_cents"),
        )
    )
