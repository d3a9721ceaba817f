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

from findb_spark.functions.hashing import hash48_duck
from findb_spark.ops.quality import dq_audit, scrub_patterns
from findb_spark.ops.text import shingles_duck
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


@register(
    "source_quality_profile",
    f"""
WITH toks AS (
  SELECT doc_id, source, len(string_split(text, ' ')) AS n_tokens
  FROM documents
),
h AS (SELECT doc_id, source, md5(text) AS th FROM documents),
dupc AS (SELECT th, COUNT(*) AS c FROM h GROUP BY th),
dupflag AS (
  SELECT h.doc_id, CASE WHEN dupc.c > 1 THEN 1 ELSE 0 END AS is_dup
  FROM h JOIN dupc USING (th)
),
bg AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform({shingles_duck('text', 2)},
                                             s -> {hash48_duck('s')}))) AS bh
  FROM documents
),
dfreq AS (SELECT bh, COUNT(*) AS df FROM bg GROUP BY bh),
nov AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
           AS unique_share
  FROM bg JOIN dfreq USING (bh) GROUP BY doc_id
)
SELECT t.source,
       COUNT(*) AS n_docs,
       CAST(SUM(t.n_tokens) AS BIGINT) AS total_tokens,
       CAST(SUM(d.is_dup) AS BIGINT) AS n_exact_dups,
       CAST(SUM(CAST(FLOOR(COALESCE(nov.unique_share, 0.0) * 1000000000.0 + 0.5)
                     AS BIGINT)) AS DOUBLE) / 1000000000.0 / COUNT(*)
         AS mean_unique_share
FROM toks t
JOIN dupflag d USING (doc_id)
LEFT JOIN nov USING (doc_id)
GROUP BY t.source
""",
    category="quality",
    description=(
        "Per-source quality scorecard — the keep/drop governance table of "
        "a crawl pipeline: doc/token budget, exact-dup rate, mean bigram "
        "novelty (fixed-point mean; sub-2-token docs count as 0), all "
        "composed in one plan from already-verified signal operators"
    ),
)
def source_quality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from findb_spark.functions.hashing import hash48
    from findb_spark.ops.text import bigram_novelty

    docs = load_table(spark, sf_dir, "documents")
    # ONE projection carries token count + text hash (they were two
    # separate scans joined back on doc_id); truncate it because it
    # feeds both the dup-count aggregate and the flag join — the corpus
    # text is scanned once here plus once in the bigram pass below
    base = docs.select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).alias("n_tokens"),
        F.md5(F.col("text")).alias("th"),
    ).localCheckpoint(eager=False)
    dupc = base.groupBy("th").agg(F.count("*").alias("c"))
    dupflag = base.join(dupc, "th").select(
        "doc_id",
        "source",
        "n_tokens",
        F.when(F.col("c") > 1, 1).otherwise(0).alias("is_dup"),
    )
    nov = bigram_novelty(docs).select("doc_id", "unique_share")
    per_doc = dupflag.join(nov, "doc_id", "left")
    return per_doc.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.sum("is_dup").cast("bigint").alias("n_exact_dups"),
        (
            F.sum(
                F.floor(
                    F.coalesce(F.col("unique_share"), F.lit(0.0)) * 1_000_000_000.0
                    + F.lit(0.5)
                )
            ).cast("double")
            / 1_000_000_000.0
            / F.count("*")
        ).alias("mean_unique_share"),
    )


@register(
    "dq_documents_audit",
    """
WITH one_pass AS (
  SELECT COUNT(*) AS n,
         SUM(CASE WHEN text IS NULL OR length(text) = 0 THEN 1 ELSE 0 END) AS v_empty_text,
         SUM(CASE WHEN lang NOT IN ('en','fr','de') THEN 1 ELSE 0 END) AS v_bad_lang,
         SUM(CASE WHEN n_chars != length(text) THEN 1 ELSE 0 END) AS v_nchars_drift,
         SUM(CASE WHEN len(string_split(text, ' ')) < 5 THEN 1 ELSE 0 END) AS v_too_short
  FROM documents
),
dup AS (
  SELECT CAST(COALESCE(SUM(c - 1), 0) AS BIGINT) AS n_violations,
         CAST(COALESCE(SUM(c), 0) AS BIGINT) AS n_checked
  FROM (SELECT COUNT(*) AS c FROM documents GROUP BY doc_id)
)
SELECT 'empty_text' AS check_name, CAST(v_empty_text AS BIGINT) AS n_violations,
       CAST(n AS BIGINT) AS n_checked FROM one_pass
UNION ALL
SELECT 'bad_lang', CAST(v_bad_lang AS BIGINT), CAST(n AS BIGINT) FROM one_pass
UNION ALL
SELECT 'nchars_drift', CAST(v_nchars_drift AS BIGINT), CAST(n AS BIGINT) FROM one_pass
UNION ALL
SELECT 'too_short', CAST(v_too_short AS BIGINT), CAST(n AS BIGINT) FROM one_pass
UNION ALL
SELECT 'unique:doc_id', n_violations, n_checked FROM dup
""",
    category="quality",
    description=(
        "Corpus-intake data-quality audit over documents (the same "
        "single-scan declarative auditor as the orders audit): empty "
        "text, unknown language domain, n_chars metadata drift vs the "
        "actual text, too-short docs, doc_id uniqueness — the checks a "
        "pretraining ingest gate runs before anything touches the corpus"
    ),
)
def dq_documents_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    rules = {
        "empty_text": F.col("text").isNull() | (F.length("text") == 0),
        "bad_lang": ~F.col("lang").isin("en", "fr", "de"),
        "nchars_drift": F.col("n_chars") != F.length("text"),
        "too_short": F.size(F.split(F.col("text"), " ")) < 5,
    }
    return dq_audit(docs, row_rules=rules, unique_key=["doc_id"]).withColumnRenamed(
        "check", "check_name"
    )


@register(
    "pii_kanonymity",
    """
WITH qi AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(FLOOR(CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) / 100000.0)
              AS BIGINT) AS bal_band
  FROM customer
),
cls AS (
  SELECT c_nationkey, c_mktsegment, bal_band, COUNT(*) AS sz
  FROM qi GROUP BY 1, 2, 3
)
SELECT CAST(SUM(sz) AS BIGINT) AS n_rows,
       CAST(COUNT(*) AS BIGINT) AS n_classes,
       CAST(MIN(sz) AS BIGINT) AS k_anonymity,
       CAST(SUM(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS BIGINT)
         AS rows_below_k5,
       CAST(SUM(CASE WHEN sz < 10 THEN sz ELSE 0 END) AS BIGINT)
         AS rows_below_k10
FROM cls
""",
    category="quality",
    description=(
        "k-anonymity audit (Sweeney 2002): equivalence classes over the "
        "quasi-identifier tuple (nation, market segment, $1000 balance "
        "band — band edges via the exact fixed-point cents idiom), "
        "reporting the dataset's k plus re-identification exposure (rows "
        "in classes below k=5/k=10) — one map-side-combinable groupBy + "
        "one 1-row aggregate; the release gate a privacy review runs "
        "before training data leaves the pipeline"
    ),
)
def pii_kanonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    cents = F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("bigint")
    band = F.floor(cents / F.lit(100000.0)).cast("bigint")
    cls = (
        customer.select(
            "c_nationkey", "c_mktsegment", band.alias("bal_band")
        )
        .groupBy("c_nationkey", "c_mktsegment", "bal_band")
        .agg(F.count("*").alias("sz"))
    )
    return cls.agg(
        F.sum("sz").alias("n_rows"),
        F.count("*").alias("n_classes"),
        F.min("sz").alias("k_anonymity"),
        F.sum(F.when(F.col("sz") < 5, F.col("sz")).otherwise(0)).alias(
            "rows_below_k5"
        ),
        F.sum(F.when(F.col("sz") < 10, F.col("sz")).otherwise(0)).alias(
            "rows_below_k10"
        ),
    )


@register(
    "pii_tcloseness",
    """
WITH qi AS (
  SELECT c_nationkey AS nat, c_mktsegment AS seg,
         CAST(FLOOR(CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) / 100000.0)
              AS BIGINT) AS band
  FROM customer
),
cells AS (
  SELECT nat, seg, band, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM qi GROUP BY nat, seg, band
),
classes AS (SELECT nat, seg, CAST(SUM(cnt) AS BIGINT) AS nc
            FROM cells GROUP BY nat, seg),
bands AS (SELECT DISTINCT band FROM cells),
gl AS (SELECT band, CAST(SUM(cnt) AS BIGINT) AS gq FROM cells GROUP BY band),
tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS ng,
               CAST(COUNT(DISTINCT band) AS BIGINT) AS m
        FROM cells),
grid AS (
  SELECT c.nat, c.seg, c.nc, b.band, COALESCE(x.cnt, 0) AS cnt
  FROM classes c CROSS JOIN bands b
  LEFT JOIN cells x ON x.nat = c.nat AND x.seg = c.seg AND x.band = b.band
),
cums AS (
  SELECT g.nat, g.seg, g.nc, g.band,
         CAST(SUM(g.cnt) OVER (PARTITION BY g.nat, g.seg ORDER BY g.band
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS ccum,
         CAST(SUM(gl.gq) OVER (PARTITION BY g.nat, g.seg ORDER BY g.band
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS gcum
  FROM grid g JOIN gl ON g.band = gl.band
),
terms AS (
  SELECT c.nat, c.seg, c.nc,
         CAST(FLOOR(ABS(CAST(c.ccum AS DOUBLE) / c.nc
                        - CAST(c.gcum AS DOUBLE) / t.ng)
                    * 1000000000 + 0.5) AS BIGINT) AS tq
  FROM cums c CROSS JOIN tot t
  WHERE c.band < (SELECT MAX(band) FROM bands)
),
tc AS (
  SELECT terms.nat, terms.seg, terms.nc,
         CAST(SUM(tq) AS DOUBLE) / 1000000000 / (t.m - 1) AS t_closeness
  FROM terms CROSS JOIN tot t
  GROUP BY terms.nat, terms.seg, terms.nc, t.m
)
SELECT nat, seg, nc, t_closeness FROM tc
ORDER BY t_closeness DESC, nat, seg LIMIT 10
""",
    category="quality",
    description=(
        "t-closeness audit (Li ICDE'07), completing the k-anonymity / "
        "l-diversity privacy triad: per (nation, segment) equivalence "
        "class, the ordered-attribute Earth Mover's Distance between the "
        "class's balance-band distribution and the global one — "
        "EMD = mean |cumulative difference| over the band axis, every "
        "term an exact rational fxp'd before the sum; top-10 most "
        "skewed classes (the ones leaking attribute information)"
    ),
)
def pii_tcloseness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The grid is |classes| x |bands| (bounded by the attribute domains,
    never by row count), the cumulative windows run per class over the
    ordered band axis, and the fact table is touched exactly once by the
    cell aggregate — the same single-scan discipline as pii_kanonymity."""
    customer = load_table(spark, sf_dir, "customer")
    cents = F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("bigint")
    band = F.floor(cents / F.lit(100000.0)).cast("bigint")
    qi = customer.select(
        F.col("c_nationkey").alias("nat"),
        F.col("c_mktsegment").alias("seg"),
        band.alias("band"),
    )
    cells = qi.groupBy("nat", "seg", "band").agg(
        F.count("*").cast("bigint").alias("cnt")
    )
    # cells (the bounded grid) feeds classes/bands/gl/tot/grid — the
    # truncation is what MAKES the single-scan claim above true (without
    # it each consumer re-scans the fact table; plan audit: 6 scans)
    cells = cells.localCheckpoint(eager=False)
    classes = cells.groupBy("nat", "seg").agg(
        F.sum("cnt").cast("bigint").alias("nc")
    )
    bands = cells.select("band").distinct()
    gl = cells.groupBy("band").agg(F.sum("cnt").cast("bigint").alias("gq"))
    tot = cells.agg(
        F.sum("cnt").cast("bigint").alias("ng"),
        F.countDistinct("band").cast("bigint").alias("m"),
    )
    bmax = bands.agg(F.max("band").alias("bmax"))
    grid = (
        classes.crossJoin(F.broadcast(bands))
        .join(cells, ["nat", "seg", "band"], "left")
        .select(
            "nat", "seg", "nc", "band", F.coalesce("cnt", F.lit(0)).alias("cnt")
        )
    )
    from pyspark.sql import Window

    wcum = (
        Window.partitionBy("nat", "seg")
        .orderBy("band")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cums = grid.join(F.broadcast(gl), "band").select(
        "nat",
        "seg",
        "nc",
        "band",
        F.sum("cnt").over(wcum).cast("bigint").alias("ccum"),
        F.sum("gq").over(wcum).cast("bigint").alias("gcum"),
    )
    terms = (
        cums.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(bmax))
        .where(F.col("band") < F.col("bmax"))
        .select(
            "nat",
            "seg",
            "nc",
            "m",
            F.floor(
                F.abs(
                    F.expr("CAST(ccum AS DOUBLE) / nc - CAST(gcum AS DOUBLE) / ng")
                )
                * 1000000000
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("tq"),
        )
    )
    tc = terms.groupBy("nat", "seg", "nc", "m").agg(
        (F.sum("tq").cast("double") / 1000000000 / (F.col("m").cast("double") - 1))
        .alias("t_closeness")
    )
    return (
        tc.orderBy(F.desc("t_closeness"), "nat", "seg")
        .limit(10)
        .select("nat", "seg", "nc", "t_closeness")
    )


@register(
    "dq_referential_integrity",
    """
WITH li_orphans AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM lineitem l
  WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
),
ord_orphans AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM orders o
  WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
),
ps_orphans AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM lineitem l
  WHERE NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)
),
tot AS (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem) AS n_lineitem,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM orders) AS n_orders
)
SELECT 'lineitem->orders' AS fk, li_orphans.n AS n_orphans,
       tot.n_lineitem AS n_child FROM li_orphans CROSS JOIN tot
UNION ALL
SELECT 'orders->customer', ord_orphans.n, tot.n_orders
FROM ord_orphans CROSS JOIN tot
UNION ALL
SELECT 'lineitem->part', ps_orphans.n, tot.n_lineitem
FROM ps_orphans CROSS JOIN tot
""",
    category="quality",
    description=(
        "Referential-integrity DQ rule (the constraint a lakehouse "
        "cannot enforce at write time and must therefore audit): orphan "
        "counts for the three foreign keys of the star schema via "
        "anti-join aggregates — completes the declarative audit family "
        "(nulls/ranges/domains/uniqueness in dq_orders_audit) with "
        "cross-table consistency"
    ),
)
def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each orphan check is one broadcast/shuffled ANTI join + a 1-row
    count — at 100 TB the dimension sides broadcast and the fact scans
    combine map-side; the three checks share no state and parallelize."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    p = load_table(spark, sf_dir, "part")

    def orphans(child, parent, ck, pk):
        return child.join(
            parent.select(F.col(pk).alias(ck)), ck, "left_anti"
        ).agg(F.count("*").cast("bigint").alias("n"))

    n_li = li.agg(F.count("*").cast("bigint").alias("t"))
    n_o = o.agg(F.count("*").cast("bigint").alias("t"))
    rows = [
        ("lineitem->orders", orphans(li, o, "l_orderkey", "o_orderkey"), n_li),
        ("orders->customer", orphans(o, c, "o_custkey", "c_custkey"), n_o),
        ("lineitem->part", orphans(li, p, "l_partkey", "p_partkey"), n_li),
    ]
    out = None
    for fk, orph, tot in rows:
        r = orph.crossJoin(tot).select(
            F.lit(fk).alias("fk"),
            F.col("n").alias("n_orphans"),
            F.col("t").alias("n_child"),
        )
        out = r if out is None else out.unionAll(r)
    return out
