"""Duplicate-graph structure + privacy/DQ audit query specs (SURVEY §2.2
dedup/graph + quality rows, extending ops/graph.py and quality_queries.py):
k-core decomposition, neighbor-set Jaccard, cluster-size histograms,
l-diversity, and freshness SLA monitoring.

The graph queries run over the MinHash-LSH verified pair graph (the same
pairs relation every dedup_clusters* query uses), so their oracles reuse
dedup_queries' CTE constants verbatim — one source of truth for the
pair-generation semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from findb_spark.ops.dedup import minhash_lsh_pairs
from findb_spark.queries.dedup_queries import _CLUSTERS_CTES
from findb_spark.registry import register
from findb_spark.session import load_table

#: everything in _CLUSTERS_CTES up to (and including) `pairs`/`edges` is
#: reusable without the recursive closure; DuckDB only evaluates referenced
#: CTEs, so queries below that skip `reach`/`comp` pay nothing for them.

_N_PEEL = 5


def _kcore_sql(k: int = 2, rounds: int = _N_PEEL) -> str:
    # every e{i} is referenced three times by round i+1 (once directly, twice
    # through k{i}); MATERIALIZED stops DuckDB's CTE inlining from expanding
    # the whole minhash pipeline 3^rounds times (the Spark twin checkpoints
    # per round for the same reason)
    ctes = [
        "pmat AS MATERIALIZED (SELECT doc1, doc2 FROM pairs)",
        "e0 AS MATERIALIZED (SELECT doc1 AS a, doc2 AS b FROM pmat"
        " UNION ALL SELECT doc2, doc1 FROM pmat)",
    ]
    for i in range(rounds):
        ctes.append(
            f"d{i} AS (SELECT a, COUNT(*) AS deg FROM e{i} GROUP BY a)"
        )
        ctes.append(f"k{i} AS MATERIALIZED (SELECT a FROM d{i} WHERE deg >= {k})")
        ctes.append(
            f"e{i + 1} AS MATERIALIZED (SELECT e.a, e.b FROM e{i} e"
            f" JOIN k{i} x ON e.a = x.a JOIN k{i} y ON e.b = y.a)"
        )
    peel = ",\n".join(ctes)
    return f"""
WITH RECURSIVE {_CLUSTERS_CTES},
{peel},
dfin AS (SELECT a, COUNT(*) AS deg FROM e{rounds} GROUP BY a)
SELECT a AS doc_id, CAST(deg AS BIGINT) AS core_degree
FROM dfin WHERE deg >= {k}
"""


@register(
    "graph_kcore",
    _kcore_sql(),
    category="dedup",
    description=(
        f"2-core of the near-dup pair graph via {_N_PEEL} degree-peel "
        "rounds (each: one groupBy + two semi-joins): isolates genuinely "
        "clustered duplication from pendant one-off matches; dup-graph "
        "diameters are 1-2 (see ops/graph.py), so the fixed round count "
        "reaches the fixpoint with slack"
    ),
)
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, threshold=0.4).select("doc1", "doc2")
    e = pairs.select(
        F.col("doc1").alias("a"), F.col("doc2").alias("b")
    ).unionAll(pairs.select(F.col("doc2").alias("a"), F.col("doc1").alias("b")))
    # truncate lineage each round: e{i} feeds round i+1 three times (direct
    # + twice via keep), and without the checkpoint Catalyst re-evaluates
    # the whole minhash pipeline 3^rounds times (same reason the oracle's
    # CTEs are MATERIALIZED; same discipline as ops/graph.py propagation)
    e = e.localCheckpoint(eager=True)
    for _ in range(_N_PEEL):
        deg = e.groupBy("a").agg(F.count("*").alias("deg"))
        keep = deg.where(F.col("deg") >= 2).select("a")
        e = (
            e.join(keep, "a", "semi")
            .join(keep.select(F.col("a").alias("b")), "b", "semi")
        ).localCheckpoint(eager=True)
    dfin = e.groupBy("a").agg(F.count("*").alias("deg"))
    return dfin.where(F.col("deg") >= 2).select(
        F.col("a").alias("doc_id"), F.col("deg").cast("bigint").alias("core_degree")
    )


@register(
    "graph_neighbor_jaccard",
    f"""
WITH RECURSIVE {_CLUSTERS_CTES},
pmat AS MATERIALIZED (SELECT doc1, doc2 FROM pairs),
e AS MATERIALIZED (SELECT doc1 AS a, doc2 AS b FROM pmat
      UNION ALL SELECT doc2, doc1 FROM pmat),
deg AS (SELECT a, CAST(COUNT(*) AS BIGINT) AS deg FROM e GROUP BY a),
common AS (
  SELECT p.doc1, p.doc2, CAST(COUNT(*) AS BIGINT) AS n_common
  FROM pmat p
  JOIN e e1 ON e1.a = p.doc1
  JOIN e e2 ON e2.a = p.doc2 AND e2.b = e1.b
  GROUP BY 1, 2
)
SELECT p.doc1, p.doc2, da.deg AS deg1, db.deg AS deg2,
       COALESCE(c.n_common, 0) AS n_common,
       CAST((COALESCE(c.n_common, 0) * 1000000
             + (da.deg + db.deg - COALESCE(c.n_common, 0)) // 2)
            // (da.deg + db.deg - COALESCE(c.n_common, 0)) AS BIGINT)
         AS neighbor_jaccard_ppm
FROM pmat p
JOIN deg da ON da.a = p.doc1
JOIN deg db ON db.a = p.doc2
LEFT JOIN common c ON c.doc1 = p.doc1 AND c.doc2 = p.doc2
""",
    category="dedup",
    description=(
        "Structural (neighbor-set) Jaccard for each adjacent dup pair: "
        "common-neighbor count over degree union — separates clique-core "
        "duplicates from bridge edges before transitive clustering merges "
        "unrelated groups"
    ),
)
def graph_neighbor_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # pairs feeds three consumers (edge list twice, final projection once):
    # checkpoint so the LSH pipeline runs once, not per consumer
    pairs = (
        minhash_lsh_pairs(docs, threshold=0.4)
        .select("doc1", "doc2")
        .localCheckpoint(eager=True)
    )
    e = pairs.select(
        F.col("doc1").alias("a"), F.col("doc2").alias("b")
    ).unionAll(pairs.select(F.col("doc2").alias("a"), F.col("doc1").alias("b")))
    deg = e.groupBy("a").agg(F.count("*").cast("bigint").alias("deg"))
    common = (
        pairs.join(
            e.select(F.col("a").alias("doc1"), F.col("b").alias("x")), "doc1"
        )
        .join(
            e.select(F.col("a").alias("doc2"), F.col("b").alias("x")),
            ["doc2", "x"],
        )
        .groupBy("doc1", "doc2")
        .agg(F.count("*").cast("bigint").alias("n_common"))
    )
    return (
        pairs.join(deg.select(F.col("a").alias("doc1"), F.col("deg").alias("deg1")), "doc1")
        .join(deg.select(F.col("a").alias("doc2"), F.col("deg").alias("deg2")), "doc2")
        .join(common, ["doc1", "doc2"], "left")
        .select(
            "doc1",
            "doc2",
            "deg1",
            "deg2",
            F.coalesce(F.col("n_common"), F.lit(0)).cast("bigint").alias("n_common"),
            F.expr(
                "CAST((COALESCE(n_common, 0) * 1000000"
                " + (deg1 + deg2 - COALESCE(n_common, 0)) DIV 2)"
                " DIV (deg1 + deg2 - COALESCE(n_common, 0)) AS BIGINT)"
            ).alias("neighbor_jaccard_ppm"),
        )
    )


@register(
    "dedup_cluster_stats",
    f"""
WITH RECURSIVE {_CLUSTERS_CTES},
asg AS (
  SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_id
  FROM documents d LEFT JOIN comp c USING (doc_id)
),
s AS (SELECT cluster_id, COUNT(*) AS csize FROM asg GROUP BY cluster_id)
SELECT CAST(csize AS BIGINT) AS cluster_size,
       CAST(COUNT(*) AS BIGINT) AS n_clusters,
       CAST(SUM(csize) AS BIGINT) AS n_docs
FROM s GROUP BY csize
""",
    category="dedup",
    description=(
        "Duplicate-cluster size histogram (the dedup run's summary "
        "artifact: how much of the corpus is singleton vs clustered, and "
        "how large the biggest families are)"
    ),
)
def dedup_cluster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from findb_spark.ops.graph import dedup_cluster_assignment

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, threshold=0.4).select("doc1", "doc2")
    asg = dedup_cluster_assignment(docs, pairs)
    s = asg.groupBy("cluster_id").agg(F.count("*").alias("csize"))
    return s.groupBy(F.col("csize").cast("bigint").alias("cluster_size")).agg(
        F.count("*").cast("bigint").alias("n_clusters"),
        F.sum("csize").cast("bigint").alias("n_docs"),
    )


@register(
    "pii_ldiversity",
    """
WITH j AS (
  SELECT c.c_nationkey, c.c_mktsegment, o.o_orderpriority
  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
),
cls AS (
  SELECT c_nationkey, c_mktsegment,
         COUNT(*) AS n_rows,
         COUNT(DISTINCT o_orderpriority) AS l_div
  FROM j GROUP BY 1, 2
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_classes,
       CAST(SUM(n_rows) AS BIGINT) AS n_rows,
       CAST(MIN(l_div) AS BIGINT) AS l_diversity,
       CAST(SUM(CASE WHEN l_div < 3 THEN 1 ELSE 0 END) AS BIGINT)
         AS classes_below_l3,
       CAST(SUM(CASE WHEN l_div < 5 THEN 1 ELSE 0 END) AS BIGINT)
         AS classes_below_l5
FROM cls
""",
    category="quality",
    description=(
        "l-diversity audit (Machanavajjhala 2007, the k-anonymity "
        "companion pii_kanonymity lacks): per quasi-identifier class "
        "(nation, segment), distinct sensitive values (order priority) — "
        "a class can be k-anonymous yet reveal its attribute when l=1"
    ),
)
def pii_ldiversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    j = c.join(o, c.c_custkey == o.o_custkey).select(
        "c_nationkey", "c_mktsegment", "o_orderpriority"
    )
    cls = j.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("o_orderpriority").alias("l_div"),
    )
    below = lambda l: F.sum(F.when(F.col("l_div") < l, 1).otherwise(0))  # noqa: E731,E741
    return cls.agg(
        F.count("*").cast("bigint").alias("n_classes"),
        F.sum("n_rows").cast("bigint").alias("n_rows"),
        F.min("l_div").cast("bigint").alias("l_diversity"),
        below(3).cast("bigint").alias("classes_below_l3"),
        below(5).cast("bigint").alias("classes_below_l5"),
    )


@register(
    "dq_freshness_lag",
    """
WITH horizon AS (SELECT MAX(ts) AS max_ts FROM events),
per AS (
  SELECT event_type, COUNT(*) AS n_events, MAX(ts) AS last_ts
  FROM events GROUP BY event_type
)
SELECT event_type,
       CAST(n_events AS BIGINT) AS n_events,
       last_ts,
       CAST((epoch_us(max_ts) - epoch_us(last_ts)) // 60000000 AS BIGINT)
         AS lag_minutes,
       CASE WHEN (epoch_us(max_ts) - epoch_us(last_ts)) // 60000000 > 360
            THEN 'breach' ELSE 'ok' END AS sla_status
FROM per CROSS JOIN horizon
""",
    category="quality",
    description=(
        "Per-stream freshness SLA monitor: minutes since each event type "
        "last arrived, relative to the table's high-water mark (exact "
        "microsecond arithmetic; the staleness alarm of a feed-ingestion DQ "
        "suite)"
    ),
)
def dq_freshness_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    horizon = ev.agg(F.max("ts").alias("max_ts"))
    per = ev.groupBy("event_type").agg(
        F.count("*").alias("n_events"), F.max("ts").alias("last_ts")
    )
    lag = "(unix_micros(max_ts) - unix_micros(last_ts)) div 60000000"
    return per.crossJoin(F.broadcast(horizon)).select(
        "event_type",
        F.col("n_events").cast("bigint").alias("n_events"),
        "last_ts",
        F.expr(f"CAST({lag} AS BIGINT)").alias("lag_minutes"),
        F.expr(
            f"CASE WHEN {lag} > 360 THEN 'breach' ELSE 'ok' END"
        ).alias("sla_status"),
    )


@register(
    "dedup_threshold_sweep",
    f"""
WITH RECURSIVE {_CLUSTERS_CTES},
js AS (
  SELECT doc1, doc2, inter / (sa.sz + sb.sz - inter) AS j
  FROM inter JOIN sizes sa ON doc1 = sa.doc_id
             JOIN sizes sb ON doc2 = sb.doc_id
),
ts AS (SELECT CAST(unnest([0.3, 0.4, 0.5, 0.6]) AS DOUBLE) AS threshold)
SELECT t.threshold,
       CAST(SUM(CASE WHEN js.j >= t.threshold THEN 1 ELSE 0 END) AS BIGINT)
         AS n_pairs
FROM js CROSS JOIN ts t
GROUP BY t.threshold
""",
    category="dedup",
    description=(
        "Jaccard threshold sweep over the LSH candidate set: pair counts "
        "at 0.3/0.4/0.5/0.6 from ONE inverted-index verification pass — "
        "the dial for choosing the dedup aggressiveness before committing "
        "a corpus-wide run (candidates below the banding's design point "
        "undercount, which is exactly the recall the sweep exposes)"
    ),
)
def dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, threshold=0.0)
    ts = None
    for t in (0.3, 0.4, 0.5, 0.6):
        row = F.lit(t).alias("threshold")
        ts = (
            pairs.sparkSession.range(1).select(row)
            if ts is None
            else ts.unionAll(pairs.sparkSession.range(1).select(row))
        )
    return (
        pairs.crossJoin(F.broadcast(ts))
        .groupBy("threshold")
        .agg(
            F.sum(F.when(F.col("jaccard") >= F.col("threshold"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_pairs")
        )
    )


@register(
    "dq_distribution_drift",
    """
WITH h AS (
  SELECT CASE WHEN o_orderkey % 2 = 0 THEN 'a' ELSE 'b' END AS half,
         o_orderstatus AS status
  FROM orders
),
c AS (SELECT half, status, COUNT(*) AS n FROM h GROUP BY 1, 2),
t AS (SELECT half, CAST(SUM(n) AS BIGINT) AS tot FROM c GROUP BY half),
s AS (
  SELECT status,
         MAX(CASE WHEN c.half = 'a'
             THEN CAST((n * 1000000 + tot // 2) // tot AS BIGINT) END)
           AS share_a_ppm,
         MAX(CASE WHEN c.half = 'b'
             THEN CAST((n * 1000000 + tot // 2) // tot AS BIGINT) END)
           AS share_b_ppm
  FROM c JOIN t ON c.half = t.half
  GROUP BY status
)
SELECT status, share_a_ppm, share_b_ppm,
       ABS(share_a_ppm - share_b_ppm) AS abs_drift_ppm
FROM s
""",
    category="quality",
    description=(
        "Categorical distribution drift between two dataset halves "
        "(train/serve skew detector): per-status share in each half + "
        "absolute drift — the schema/distribution monitor a feature "
        "pipeline runs between refreshes"
    ),
)
def dq_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    h = o.select(
        F.when(F.col("o_orderkey") % 2 == 0, "a").otherwise("b").alias("half"),
        F.col("o_orderstatus").alias("status"),
    )
    c = h.groupBy("half", "status").agg(F.count("*").alias("n"))
    t = c.groupBy("half").agg(F.sum("n").cast("bigint").alias("tot"))
    # exact integer ppm per half (half-up) — ROUND(double, 6) outputs can
    # differ between engines in the final ulp while agreeing at 6dp
    ppm = "CAST((n * 1000000 + tot DIV 2) DIV tot AS BIGINT)"
    s = (
        c.join(t, "half")
        .groupBy("status")
        .agg(
            F.max(F.expr(f"CASE WHEN half = 'a' THEN {ppm} END")).alias(
                "share_a_ppm"
            ),
            F.max(F.expr(f"CASE WHEN half = 'b' THEN {ppm} END")).alias(
                "share_b_ppm"
            ),
        )
    )
    return s.select(
        "status",
        "share_a_ppm",
        "share_b_ppm",
        F.abs(F.col("share_a_ppm") - F.col("share_b_ppm")).alias("abs_drift_ppm"),
    )


def _pr_sql() -> str:
    from findb_spark.functions.hashing import hash48_duck
    from findb_spark.ops.text import shingles_duck

    from findb_spark.queries.dedup_queries import _BANDS_SQL, _SIGS_CTE

    return f"""
WITH subdocs AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0),
sh AS (
  SELECT doc_id, unnest(list_distinct({shingles_duck('text')})) AS shingle
  FROM subdocs
),
{_SIGS_CTE},
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
interE AS (
  SELECT a.doc_id AS doc1, b.doc_id AS doc2, COUNT(*) AS inter
  FROM hh a JOIN hh b ON a.h = b.h AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
exactp AS (
  SELECT doc1, doc2 FROM interE
  JOIN sizes sa ON doc1 = sa.doc_id JOIN sizes sb ON doc2 = sb.doc_id
  WHERE inter / (sa.sz + sb.sz - inter) >= 0.4
),
bands AS ({_BANDS_SQL}),
cand AS (
  SELECT DISTINCT x.doc_id AS doc1, y.doc_id AS doc2
  FROM bands x JOIN bands y
    ON x.band_id = y.band_id AND x.bk = y.bk AND x.doc_id < y.doc_id
),
interL AS (
  SELECT doc1, doc2, COUNT(*) AS inter
  FROM cand JOIN hh a ON doc1 = a.doc_id
            JOIN hh b ON doc2 = b.doc_id AND a.h = b.h
  GROUP BY 1, 2
),
lshp AS (
  SELECT doc1, doc2 FROM interL
  JOIN sizes sa ON doc1 = sa.doc_id JOIN sizes sb ON doc2 = sb.doc_id
  WHERE inter / (sa.sz + sb.sz - inter) >= 0.4
),
m AS (
  SELECT
    (SELECT COUNT(*) FROM exactp) AS n_exact,
    (SELECT COUNT(*) FROM lshp) AS n_lsh,
    (SELECT COUNT(*) FROM lshp l JOIN exactp e
       ON l.doc1 = e.doc1 AND l.doc2 = e.doc2) AS tp
)
SELECT CAST(n_exact AS BIGINT) AS n_exact,
       CAST(n_lsh AS BIGINT) AS n_lsh,
       CAST(tp AS BIGINT) AS tp,
       CASE WHEN n_lsh = 0 THEN NULL
            ELSE CAST((tp * 1000000 + n_lsh // 2) // n_lsh AS BIGINT) END
         AS precision_lsh_ppm,
       CASE WHEN n_exact = 0 THEN NULL
            ELSE CAST((tp * 1000000 + n_exact // 2) // n_exact AS BIGINT) END
         AS recall_lsh_ppm
FROM m
"""


@register(
    "dedup_lsh_precision_recall",
    _pr_sql(),
    category="dedup",
    description=(
        "LSH quality evaluation on a deterministic 1/3 document subset: "
        "precision/recall of MinHash-LSH verified pairs against the exact "
        "inverted-index Jaccard ground truth at the same 0.4 threshold — "
        "the eval loop that justifies banding parameters before a "
        "corpus-scale run (verified pairs make precision 1.0 by "
        "construction; recall isolates banding misses)"
    ),
)
def dedup_lsh_precision_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from findb_spark.ops.dedup import jaccard_pairs

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") % 3 == 0
    )
    exactp = jaccard_pairs(docs, threshold=0.4).select("doc1", "doc2")
    lshp = minhash_lsh_pairs(docs, threshold=0.4).select("doc1", "doc2")
    tp = lshp.join(exactp, ["doc1", "doc2"]).agg(F.count("*").alias("tp"))
    ne = exactp.agg(F.count("*").alias("n_exact"))
    nl = lshp.agg(F.count("*").alias("n_lsh"))
    return (
        ne.crossJoin(nl)
        .crossJoin(tp)
        .select(
            F.col("n_exact").cast("bigint").alias("n_exact"),
            F.col("n_lsh").cast("bigint").alias("n_lsh"),
            F.col("tp").cast("bigint").alias("tp"),
            # exact integer ppm (half-up) — ROUND(double, 6) is
            # engine-unstable under the driver's raw-value hash
            F.expr(
                "CASE WHEN n_lsh = 0 THEN NULL"
                " ELSE CAST((tp * 1000000 + n_lsh DIV 2) DIV n_lsh AS BIGINT)"
                " END"
            ).alias("precision_lsh_ppm"),
            F.expr(
                "CASE WHEN n_exact = 0 THEN NULL"
                " ELSE CAST((tp * 1000000 + n_exact DIV 2) DIV n_exact"
                " AS BIGINT) END"
            ).alias("recall_lsh_ppm"),
        )
    )


@register(
    "graph_degree_assortativity",
    f"""
WITH RECURSIVE {_CLUSTERS_CTES},
pmat2 AS MATERIALIZED (SELECT doc1, doc2 FROM pairs),
e2 AS (SELECT doc1 AS a, doc2 AS b FROM pmat2
       UNION ALL SELECT doc2, doc1 FROM pmat2),
dg AS (SELECT a, CAST(COUNT(*) AS BIGINT) AS deg FROM e2 GROUP BY a),
ed AS (
  SELECT da.deg AS x, db.deg AS y
  FROM pmat2 p JOIN dg da ON da.a = p.doc1 JOIN dg db ON db.a = p.doc2
),
m AS (
  -- both edge orientations contribute (the standard symmetrized form);
  -- moments accumulate in exact DECIMAL: sx = sum(deg^2) over vertices
  -- and sxx ~ sum(deg^3) are degree-polynomial with only LINEAR row
  -- compute, so int64 sums overflow at feasible hub sizes (round 12,
  -- same class as events_burstiness / graph_source_modularity)
  SELECT COUNT(*) AS n,
         SUM(CAST(x AS DECIMAL(18,0))) AS sx,
         SUM(CAST(y AS DECIMAL(18,0))) AS sy,
         SUM(CAST(x AS DECIMAL(18,0)) * CAST(y AS DECIMAL(18,0))) AS sxy,
         SUM(CAST(x AS DECIMAL(18,0)) * CAST(x AS DECIMAL(18,0))) AS sxx,
         SUM(CAST(y AS DECIMAL(18,0)) * CAST(y AS DECIMAL(18,0))) AS syy
  FROM (SELECT x, y FROM ed UNION ALL SELECT y, x FROM ed)
)
SELECT CAST(n AS BIGINT) AS n_edge_ends,
       CASE WHEN CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n = 0
            THEN NULL
            ELSE (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n)
                 / SQRT((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n)
                        * (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n))
            END
         AS assortativity
FROM m
""",
    category="dedup",
    description=(
        "Degree assortativity of the near-dup pair graph (Newman 2002): "
        "Pearson correlation of endpoint degrees over symmetrized edges — "
        "positive means clique-like duplicate families, negative means "
        "hub-and-spoke (one template matching many one-offs); exact "
        "integer moments"
    ),
)
def graph_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pairs = (
        minhash_lsh_pairs(docs, threshold=0.4)
        .select("doc1", "doc2")
        .localCheckpoint(eager=True)
    )
    e = pairs.select(
        F.col("doc1").alias("a"), F.col("doc2").alias("b")
    ).unionAll(pairs.select(F.col("doc2").alias("a"), F.col("doc1").alias("b")))
    dg = e.groupBy("a").agg(F.count("*").cast("bigint").alias("deg"))
    ed = (
        pairs.join(dg.select(F.col("a").alias("doc1"), F.col("deg").alias("x")), "doc1")
        .join(dg.select(F.col("a").alias("doc2"), F.col("deg").alias("y")), "doc2")
        .select("x", "y")
    )
    sym = ed.unionAll(ed.select(F.col("y").alias("x"), F.col("x").alias("y")))

    # Exact DECIMAL moments + a double-tree combine (round 12, same class
    # as events_burstiness): sx = sum(deg^2) over vertices and sxx ~
    # sum(deg^3) are degree-polynomial with LINEAR row compute — a 1e8-
    # edge hub star (1e8 rows, feasible at 100 TB) puts sum(x*x) at
    # ~2e24, far past int64; DECIMAL(18,0) inputs -> (37,0) products ->
    # exact order-independent sums safe past 1e18-degree hubs, then one
    # identical scalar tree on both engines.  Pin:
    # tests/test_scale_defect_pins.py.
    def dec(c: str):
        return F.col(c).cast("decimal(18,0)")

    m = sym.agg(
        F.count("*").alias("n"),
        F.sum(dec("x")).alias("sx"),
        F.sum(dec("y")).alias("sy"),
        F.sum(dec("x") * dec("y")).alias("sxy"),
        F.sum(dec("x") * dec("x")).alias("sxx"),
        F.sum(dec("y") * dec("y")).alias("syy"),
    )
    return _assortativity_combine(m)


def _assortativity_combine(m: DataFrame) -> DataFrame:
    """The Pearson combine over the exact decimal moment aggregate — the
    production expression path, separated as the overflow-pin seam (the
    synthetic trigger feeds it hub-star moments at the old int64 form's
    overflow scale, unreachable by test-SF corpora)."""
    return m.select(
        F.col("n").cast("bigint").alias("n_edge_ends"),
        F.expr(
            "CASE WHEN CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n = 0"
            " THEN NULL"
            " ELSE (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n)"
            " / SQRT((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n)"
            " * (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n))"
            " END"
        ).alias("assortativity"),
    )


@register(
    "dp_noisy_histogram",
    """
WITH c AS (
  SELECT o_orderpriority AS bucket, COUNT(*) AS n FROM orders GROUP BY 1
),
u AS (
  -- deterministic uniform in (-0.5, 0.5) from the bucket hash: the
  -- seeded-noise form of the Laplace mechanism (reproducible audits;
  -- production would use an RNG and destroy the seed)
  SELECT bucket, n,
         (CAST(list_sum([ (strpos('0123456789abcdef', md5(bucket)[i:i]) - 1)
                          * (16.0 ** (12 - i)) for i in range(1, 13) ])
               AS BIGINT) % 1000000) / 1000000.0 - 0.5 AS uu
  FROM c
),
z AS (
  SELECT bucket, n, uu,
         CAST(FLOOR(
           -10.0 * (CASE WHEN uu < 0 THEN -1.0 ELSE 1.0 END)
                 * ln(1.0 - 2.0 * ABS(uu)) * 1000000 + 0.5) AS BIGINT) AS noise_q
  FROM u
)
SELECT bucket,
       CAST(n AS BIGINT) AS true_count,
       CAST(n AS DOUBLE) + CAST(noise_q AS DOUBLE) / 1000000 AS noisy_count
FROM z
""",
    category="quality",
    description=(
        "Laplace-mechanism noisy histogram (epsilon=0.1, b=1/eps=10) with "
        "hash-seeded inverse-CDF noise: the differential-privacy release "
        "shape with reproducible noise for cross-engine audit — per-row "
        "ln fixed-pointed at 1e6 before the add, so the gate holds"
    ),
)
def dp_noisy_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    from findb_spark.functions.hashing import hash48

    c = o.groupBy(F.col("o_orderpriority").alias("bucket")).agg(
        F.count("*").alias("n")
    )
    u = c.select(
        "bucket",
        "n",
        ((hash48(F.col("bucket")) % 1000000) / F.lit(1000000.0) - 0.5).alias("uu"),
    )
    z = u.select(
        "bucket",
        "n",
        F.expr(
            "CAST(FLOOR("
            "-10.0 * (CASE WHEN uu < 0 THEN -1.0 ELSE 1.0 END)"
            " * ln(1.0 - 2.0 * ABS(uu)) * 1000000 + 0.5) AS BIGINT)"
        ).alias("noise_q"),
    )
    return z.select(
        "bucket",
        F.col("n").cast("bigint").alias("true_count"),
        F.expr("CAST(n AS DOUBLE) + CAST(noise_q AS DOUBLE) / 1000000").alias(
            "noisy_count"
        ),
    )


@register(
    "pipeline_quality_sweep",
    """
WITH toks AS (
  SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tokens
  FROM documents
),
ths AS (SELECT CAST(unnest([10, 20, 40, 80]) AS BIGINT) AS min_tokens)
SELECT min_tokens,
       CAST(SUM(CASE WHEN n_tokens >= min_tokens THEN 1 ELSE 0 END) AS BIGINT)
         AS kept_docs,
       CAST(SUM(CASE WHEN n_tokens >= min_tokens THEN n_tokens ELSE 0 END)
            AS BIGINT) AS kept_tokens,
       CAST(COUNT(*) AS BIGINT) AS total_docs
FROM toks CROSS JOIN ths
GROUP BY min_tokens
ORDER BY min_tokens
""",
    category="quality",
    description=(
        "Quality-gate sweep: surviving doc/token budgets at four "
        "min-length thresholds from ONE corpus scan (conditional sums over "
        "a broadcast threshold list) — the what-if that sizes the "
        "pretraining corpus before committing a curation run"
    ),
)
def pipeline_quality_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
    )
    ths = spark.range(1).select(
        F.explode(
            F.array(*[F.lit(t) for t in (10, 20, 40, 80)])
        ).alias("mt0")
    ).select(F.col("mt0").cast("bigint").alias("min_tokens")
    )
    return (
        toks.crossJoin(F.broadcast(ths))
        .groupBy("min_tokens")
        .agg(
            F.sum(F.when(F.col("n_tokens") >= F.col("min_tokens"), 1).otherwise(0))
            .cast("bigint")
            .alias("kept_docs"),
            F.sum(
                F.when(
                    F.col("n_tokens") >= F.col("min_tokens"), F.col("n_tokens")
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("kept_tokens"),
            F.count("*").cast("bigint").alias("total_docs"),
        )
        .orderBy("min_tokens")
    )


_LPA_ROUNDS = 4


def _lpa_sql(rounds: int = _LPA_ROUNDS) -> str:
    # edges are FIXED across rounds (only labels iterate, each l{i}
    # referenced once) so there is no 3^rounds CTE explosion; emat/l{i} are
    # still MATERIALIZED to stop DuckDB inlining the minhash pipeline into
    # every round
    ctes = [
        "emat AS MATERIALIZED (SELECT DISTINCT a, b FROM edges)",
        "l0 AS MATERIALIZED (SELECT DISTINCT a AS node, a AS lbl FROM emat)",
    ]
    for i in range(rounds):
        ctes.append(
            f"c{i} AS (SELECT e.a, l.lbl, COUNT(*) AS cnt"
            f" FROM emat e JOIN l{i} l ON e.b = l.node GROUP BY e.a, l.lbl)"
        )
        ctes.append(
            f"l{i + 1} AS MATERIALIZED (SELECT a AS node, lbl FROM"
            f" (SELECT a, lbl, ROW_NUMBER() OVER"
            f" (PARTITION BY a ORDER BY cnt DESC, lbl ASC) AS rn FROM c{i})"
            f" WHERE rn = 1)"
        )
    body = ",\n".join(ctes)
    return f"""
WITH RECURSIVE {_CLUSTERS_CTES},
{body}
SELECT node AS doc_id, lbl AS community FROM l{rounds}
"""


@register(
    "graph_label_propagation",
    _lpa_sql(),
    category="dedup",
    description=(
        f"Deterministic synchronous label propagation ({_LPA_ROUNDS} rounds, "
        "most-frequent neighbor label, min-label tie rule) over the "
        "verified near-dup pair graph: splits a connected component into "
        "densely-knit template families, unlike plain connected components"
    ),
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from findb_spark.ops.graph import label_propagation

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, threshold=0.4).select("doc1", "doc2")
    return label_propagation(pairs, rounds=_LPA_ROUNDS).select(
        F.col("node").alias("doc_id"), F.col("lbl").alias("community")
    )


_BFS_ROUNDS = 4
_BFS_SEED_SOURCE = "src0"


def _bfs_sql(rounds: int = _BFS_ROUNDS) -> str:
    ctes = [
        "emat AS MATERIALIZED (SELECT DISTINCT a, b FROM edges)",
        "d0 AS MATERIALIZED (SELECT doc_id AS node, CAST(0 AS BIGINT) AS dist"
        f" FROM documents WHERE source = '{_BFS_SEED_SOURCE}')",
    ]
    for i in range(rounds):
        ctes.append(
            f"d{i + 1} AS MATERIALIZED (SELECT node, MIN(dist) AS dist FROM"
            f" (SELECT node, dist FROM d{i}"
            f"  UNION ALL"
            f"  SELECT e.b AS node, d.dist + 1 AS dist"
            f"  FROM emat e JOIN d{i} d ON e.a = d.node) GROUP BY node)"
        )
    body = ",\n".join(ctes)
    return f"""
WITH RECURSIVE {_CLUSTERS_CTES},
{body}
SELECT node AS doc_id, dist AS hops FROM d{rounds}
"""


@register(
    "graph_bfs_contamination",
    _bfs_sql(),
    category="dedup",
    description=(
        f"Multi-source BFS hop distances ({_BFS_ROUNDS} rounds) through the "
        f"near-dup pair graph from every '{_BFS_SEED_SOURCE}' document: the "
        "blast radius a known-bad source reaches through duplicate links "
        "(unit-weight distributed Bellman-Ford as DataFrame algebra)"
    ),
)
def graph_bfs_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from findb_spark.ops.graph import bfs_distances

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, threshold=0.4).select("doc1", "doc2")
    seeds = docs.where(F.col("source") == _BFS_SEED_SOURCE).select(
        F.col("doc_id").alias("node")
    )
    return bfs_distances(pairs, seeds, rounds=_BFS_ROUNDS).select(
        F.col("node").alias("doc_id"), F.col("dist").alias("hops")
    )


_REC_HOPS = 3


def _recursive_bfs_sql(max_hops: int = _REC_HOPS) -> str:
    # the SAME hop-bounded BFS as graph_bfs_contamination, but through the
    # engines' NATIVE recursive-CTE machinery on both sides: UNION ALL
    # frontier expansion bounded by dist < max_hops (cycles terminate via
    # the bound, path multiplicity collapsed by the final MIN)
    return f"""
WITH RECURSIVE {_CLUSTERS_CTES},
emat AS MATERIALIZED (SELECT DISTINCT a, b FROM edges),
r(node, dist) AS (
  SELECT doc_id AS node, CAST(0 AS BIGINT) AS dist
  FROM documents WHERE source = '{_BFS_SEED_SOURCE}'
  UNION ALL
  SELECT e.b AS node, r.dist + 1 AS dist
  FROM r JOIN emat e ON e.a = r.node
  WHERE r.dist < {max_hops}
)
SELECT node AS doc_id, CAST(MIN(dist) AS BIGINT) AS hops
FROM r GROUP BY node
"""


@register(
    "sql_recursive_bfs",
    _recursive_bfs_sql(),
    category="sql",
    description=(
        f"WITH RECURSIVE grammar certification (Spark 4 recursive CTE "
        f"execution vs DuckDB's native recursion): {_REC_HOPS}-hop-bounded "
        f"multi-source BFS through the near-dup pair graph from every "
        f"'{_BFS_SEED_SOURCE}' document — the same answer "
        "graph_bfs_contamination computes with driver-loop DataFrame "
        "algebra, here produced by the engine's own fixpoint machinery "
        "(UNION ALL frontier, cycle-safe via the hop bound, path "
        "multiplicity collapsed by MIN).  Complements sql_recursive_rollup "
        "(acyclic hierarchy recursion): this is the CYCLIC-graph fixpoint "
        "mode — termination comes from the explicit hop bound, not the "
        "data shape — which is the recursion pattern that can diverge or "
        "blow up; its cross-check against the driver-loop BFS is the "
        "freeze-exemption rationale"
    ),
)
def sql_recursive_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, threshold=0.4).select("doc1", "doc2")
    # materialize the edge list before recursion: each recursive step
    # re-reads the anchor relation, and the unmaterialized minhash
    # pipeline would re-run per iteration (the same reason every
    # iterative op here checkpoints); the edge list is the graph ops'
    # bounded working set
    edges = (
        pairs.select(F.col("doc1").alias("a"), F.col("doc2").alias("b"))
        .unionByName(
            pairs.select(F.col("doc2").alias("a"), F.col("doc1").alias("b"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    seeds = docs.where(F.col("source") == _BFS_SEED_SOURCE).select("doc_id")
    # DataFrame-parameterized spark.sql (Spark 3.4+ {df} template refs):
    # no session-global temp views, so two builders sharing one session
    # cannot overwrite each other's relations mid-plan
    return spark.sql(
        f"""
        WITH RECURSIVE r(node, dist) AS (
          SELECT doc_id AS node, CAST(0 AS BIGINT) AS dist
          FROM {{seeds}}
          UNION ALL
          SELECT e.b AS node, r.dist + 1 AS dist
          FROM r JOIN {{edges}} e ON e.a = r.node
          WHERE r.dist < {_REC_HOPS}
        )
        SELECT node AS doc_id, CAST(MIN(dist) AS BIGINT) AS hops
        FROM r GROUP BY node
        """,
        seeds=seeds,
        edges=edges,
    )
