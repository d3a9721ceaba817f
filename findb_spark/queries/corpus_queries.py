"""Corpus-level language-model analytics (SURVEY §2.2 LLM-pipeline mandate,
extending ops/text.py): unigram-LM surprisal scoring, Zipf's-law slope fit,
hapax ratio, character-trigram diversity, cross-source duplicate detection,
and bigram vocabulary coverage.

Parity strategy: transcendental-free where possible — surprisal is the
integer log2 (bit length) of the inverse unigram probability, diversity and
coverage are exact rationals of integer counts.  The one genuinely
log-scaled fit (Zipf) fixed-points ln per row at 1e4 before exact integer
moment sums, keeping the regression deterministic to ~1e-4 while the
cross-engine ulp flip probability stays ~1e-9 per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from findb_spark.functions.hashing import hash48_duck
from findb_spark.ops.text import shingles_duck
from findb_spark.plans.broadcast import never_broadcast
from findb_spark.registry import register
from findb_spark.session import load_table

_TOKS_CTE = """
toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
)
"""


@register(
    "text_unigram_surprisal",
    f"""
WITH {_TOKS_CTE},
tf AS (SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM toks),
surp AS (
  -- integer log2 of the inverse unigram probability: bit length of
  -- floor(total/count).  Exact on both engines — no transcendentals.
  SELECT tok,
         CAST(length(bin(CAST(FLOOR(CAST(n AS DOUBLE) / cnt) AS BIGINT)))
              AS BIGINT) AS sbits
  FROM tf CROSS JOIN tot
)
SELECT t.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(sbits) AS DOUBLE) / COUNT(*) AS mean_surprisal_bits
FROM toks t JOIN surp USING (tok)
GROUP BY t.doc_id
""",
    category="text",
    description=(
        "Unigram-LM surprisal per document (perplexity proxy for quality "
        "filtering): surprisal = bit length of inverse token probability — "
        "an integer, so per-doc means are exact rationals"
    ),
)
def text_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    tf = toks.groupBy("tok").agg(F.count("*").alias("cnt"))
    tot = toks.agg(F.count("*").cast("bigint").alias("n"))
    surp = tf.crossJoin(F.broadcast(tot)).select(
        "tok",
        F.expr(
            "CAST(length(bin(CAST(FLOOR(CAST(n AS DOUBLE) / cnt) AS BIGINT)))"
            " AS BIGINT)"
        ).alias("sbits"),
    )
    return (
        toks.join(never_broadcast(surp), "tok")  # vocab-proportional side
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.expr("CAST(SUM(sbits) AS DOUBLE) / COUNT(*)").alias(
                "mean_surprisal_bits"
            ),
        )
    )


@register(
    "text_zipf_slope",
    f"""
WITH {_TOKS_CTE},
tf AS (SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok),
ranked AS (
  SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, tok) AS rnk
  FROM tf ORDER BY cnt DESC, tok LIMIT 1000
),
ll AS (
  SELECT CAST(FLOOR(ln(CAST(rnk AS DOUBLE)) * 10000 + 0.5) AS BIGINT) AS x,
         CAST(FLOOR(ln(CAST(cnt AS DOUBLE)) * 10000 + 0.5) AS BIGINT) AS y
  FROM ranked
),
m AS (
  SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * y) AS sxy, SUM(x * x) AS sxx
  FROM ll
)
SELECT n AS n_terms,
       CAST(n * sxy - sx * sy AS DOUBLE) / (n * sxx - sx * sx) AS zipf_slope,
       (CAST(sy AS DOUBLE) / n
        - CAST(n * sxy - sx * sy AS DOUBLE) / (n * sxx - sx * sx)
          * (CAST(sx AS DOUBLE) / n)) / 10000 AS zipf_intercept
FROM m
""",
    category="text",
    description=(
        "Zipf's-law fit: OLS slope of log-frequency on log-rank over the "
        "top-1000 vocabulary (a healthy natural-language corpus sits near "
        "-1; gibberish and boilerplate deviate) — ln fixed-pointed per row, "
        "moments exact"
    ),
)
def text_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(F.split("text", " ")).alias("tok"))
    tf = toks.groupBy("tok").agg(F.count("*").alias("cnt"))
    # top-k under a deterministic total order: TakeOrderedAndProject, no
    # global window over the full vocabulary
    ranked = (
        tf.orderBy(F.desc("cnt"), "tok")
        .limit(1000)
        .select(
            "cnt",
            # 1000-row relation by construction — the ordered window is tiny
            F.row_number()
            .over(Window.orderBy(F.desc("cnt"), "tok"))
            .alias("rnk"),
        )
    )
    ll = ranked.select(
        F.expr("CAST(FLOOR(ln(CAST(rnk AS DOUBLE)) * 10000 + 0.5) AS BIGINT)").alias(
            "x"
        ),
        F.expr("CAST(FLOOR(ln(CAST(cnt AS DOUBLE)) * 10000 + 0.5) AS BIGINT)").alias(
            "y"
        ),
    )
    m = ll.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    return m.select(
        F.col("n").alias("n_terms"),
        F.expr("CAST(n * sxy - sx * sy AS DOUBLE) / (n * sxx - sx * sx)").alias(
            "zipf_slope"
        ),
        F.expr(
            "(CAST(sy AS DOUBLE) / n"
            " - CAST(n * sxy - sx * sy AS DOUBLE) / (n * sxx - sx * sx)"
            " * (CAST(sx AS DOUBLE) / n)) / 10000"
        ).alias("zipf_intercept"),
    )


@register(
    "text_hapax_ratio",
    """
WITH toks AS (
  SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents
),
tf AS (SELECT source, tok, COUNT(*) AS cnt FROM toks GROUP BY 1, 2)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS vocab_size,
       CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
       CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
         AS hapax_ratio
FROM tf GROUP BY source
""",
    category="text",
    description=(
        "Hapax legomena ratio per source (lexical-richness / OCR-noise "
        "screen): share of the vocabulary occurring exactly once"
    ),
)
def text_hapax_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("source", F.explode(F.split("text", " ")).alias("tok"))
    tf = toks.groupBy("source", "tok").agg(F.count("*").alias("cnt"))
    hap = F.sum(F.when(F.col("cnt") == 1, 1).otherwise(0))
    return tf.groupBy("source").agg(
        F.count("*").cast("bigint").alias("vocab_size"),
        hap.cast("bigint").alias("n_hapax"),
        (hap.cast("double") / F.count("*")).alias("hapax_ratio"),
    )


@register(
    "text_trigram_diversity",
    """
WITH d AS (SELECT doc_id, text FROM documents WHERE length(text) >= 3),
tg AS (
  SELECT doc_id, substring(text, CAST(i AS INT), 3) AS tri
  FROM d, unnest(generate_series(1, length(text) - 2)) AS t(i)
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_trigrams,
       CAST(COUNT(DISTINCT tri) AS BIGINT) AS n_distinct,
       CAST(COUNT(DISTINCT tri) AS DOUBLE) / COUNT(*) AS trigram_diversity
FROM tg GROUP BY doc_id
""",
    category="text",
    description=(
        "Character-trigram diversity per document (repetition / gibberish "
        "detector used by pretraining quality filters): distinct over total "
        "sliding 3-grams — an exact rational"
    ),
)
def text_trigram_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").where(F.length("text") >= 3)
    tg = docs.select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.length("text") - 2)).alias("i"),
        "text",
    ).select("doc_id", F.expr("substring(text, CAST(i AS INT), 3)").alias("tri"))
    return tg.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_trigrams"),
        F.countDistinct("tri").cast("bigint").alias("n_distinct"),
        (F.countDistinct("tri").cast("double") / F.count("*")).alias(
            "trigram_diversity"
        ),
    )


@register(
    "dedup_cross_source",
    """
WITH h AS (
  SELECT doc_id, source,
         md5(array_to_string(string_split(text, ' ')[1:30], ' ')) AS th
  FROM documents),
g AS (
  SELECT th,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
         MIN(doc_id) AS min_doc_id
  FROM h GROUP BY th
)
SELECT th, n_docs, n_sources, min_doc_id
FROM g WHERE n_sources > 1
""",
    category="dedup",
    description=(
        "Cross-source contamination: documents whose 30-token PREFIX "
        "fingerprint appears under more than one source — the "
        "contamination shape (benchmark text inside crawl data) exact "
        "dedup alone won't surface.  Prefix fingerprint, not whole-text "
        "md5: full-text exact twins never span sources below sf0.1 in "
        "the driver data, so the md5(text) form certified empty-vs-empty "
        "at the gate SF (round-8 vacuous-certification finding); shared "
        "30-token prefixes across sources exist at every SF (15 / 17 / "
        "173 groups)"
    ),
)
def dedup_cross_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    h = docs.select(
        "doc_id",
        "source",
        F.md5(F.concat_ws(" ", F.slice(F.split("text", " "), 1, 30))).alias("th"),
    )
    g = h.groupBy("th").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.countDistinct("source").cast("bigint").alias("n_sources"),
        F.min("doc_id").alias("min_doc_id"),
    )
    return g.where(F.col("n_sources") > 1)


@register(
    "text_bigram_coverage",
    f"""
WITH {_TOKS_CTE},
bg AS (
  SELECT doc_id, tok,
         LEAD(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
  FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
           unnest(generate_series(1, length(string_split(text, ' ')))) AS pos
    FROM documents
  )
),
bf AS (
  SELECT tok || ' ' || nxt AS bigram, COUNT(*) AS cnt
  FROM bg WHERE nxt IS NOT NULL GROUP BY 1
),
topk AS (
  SELECT cnt FROM bf ORDER BY cnt DESC, bigram LIMIT 1000
),
t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total, COUNT(*) AS n_distinct FROM bf),
tk AS (SELECT CAST(SUM(cnt) AS BIGINT) AS top_cnt FROM topk)
SELECT total AS total_bigrams,
       n_distinct AS distinct_bigrams,
       top_cnt AS top1000_occurrences,
       CAST(top_cnt AS DOUBLE) / total AS top1000_coverage
FROM t CROSS JOIN tk
""",
    category="text",
    description=(
        "Bigram vocabulary coverage: what share of all bigram occurrences "
        "the top-1000 bigrams explain (tokenizer/vocab sizing signal)"
    ),
)
def text_bigram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    bg = toks.select("doc_id", "tok", F.lead("tok").over(w).alias("nxt")).where(
        F.col("nxt").isNotNull()
    )
    bf = bg.groupBy(
        F.concat_ws(" ", "tok", "nxt").alias("bigram")
    ).agg(F.count("*").alias("cnt"))
    topk = bf.orderBy(F.desc("cnt"), "bigram").limit(1000).select("cnt")
    t = bf.agg(
        F.sum("cnt").cast("bigint").alias("total"),
        F.count("*").alias("n_distinct"),
    )
    tk = topk.agg(F.sum("cnt").cast("bigint").alias("top_cnt"))
    return (
        t.crossJoin(tk)
        .select(
            F.col("total").alias("total_bigrams"),
            F.col("n_distinct").alias("distinct_bigrams"),
            F.col("top_cnt").alias("top1000_occurrences"),
            F.expr("CAST(top_cnt AS DOUBLE) / total").alias("top1000_coverage"),
        )
    )


@register(
    "text_langid_confusion",
    """
WITH scored AS (
  SELECT lang AS true_lang,
         len(list_filter(string_split(text, ' '),
             t -> t IN ('the', 'a', 'and'))) AS se,
         len(list_filter(string_split(text, ' '),
             t -> t IN ('le', 'la', 'et'))) AS sf,
         len(list_filter(string_split(text, ' '),
             t -> t IN ('der', 'die', 'und'))) AS sd
  FROM documents
),
p AS (
  SELECT true_lang,
         CASE WHEN se >= sf AND se >= sd THEN 'en'
              WHEN sf >= sd THEN 'fr' ELSE 'de' END AS pred_lang
  FROM scored
),
m AS (SELECT true_lang, pred_lang, COUNT(*) AS n FROM p GROUP BY 1, 2),
tot AS (SELECT true_lang, CAST(SUM(n) AS BIGINT) AS t FROM m GROUP BY 1)
SELECT m.true_lang, pred_lang, CAST(n AS BIGINT) AS n_docs,
       CAST((n * 1000000 + t // 2) // t AS BIGINT) AS row_share_ppm
FROM m JOIN tot ON m.true_lang = tot.true_lang
""",
    category="text",
    description=(
        "Language-ID confusion matrix: the marker-word classifier "
        "(ops/text.py language_id) evaluated against the labeled lang "
        "column — per (true, predicted) cell counts + row-normalized "
        "shares; the quality-eval loop a corpus pipeline runs before "
        "trusting its own language gate"
    ),
)
def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from findb_spark.ops.text import language_id

    docs = load_table(spark, sf_dir, "documents")
    p = language_id(docs).select(
        F.col("lang").alias("true_lang"), "pred_lang"
    )
    m = p.groupBy("true_lang", "pred_lang").agg(F.count("*").alias("n"))
    tot = m.groupBy("true_lang").agg(F.sum("n").cast("bigint").alias("t"))
    return m.join(tot, "true_lang").select(
        "true_lang",
        "pred_lang",
        F.col("n").cast("bigint").alias("n_docs"),
        # exact integer ppm (half-up) — ROUND(double, 6) outputs can differ
        # between engines in the final ulp while agreeing at 6dp
        F.expr("CAST((n * 1000000 + t DIV 2) DIV t AS BIGINT)").alias(
            "row_share_ppm"
        ),
    )


@register(
    "sql_lateral_topk",
    """
WITH rev AS (
  SELECT c.c_custkey, c.c_name, n.n_regionkey,
         SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS cents
  FROM customer c
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2, 3
)
SELECT r.r_name, t.c_name,
       CAST(t.cents AS DOUBLE) / 100 AS revenue
FROM region r, LATERAL (
  SELECT c_name, cents FROM rev
  WHERE rev.n_regionkey = r.r_regionkey
  ORDER BY cents DESC, c_custkey LIMIT 2
) t
""",
    category="sql",
    description=(
        "Correlated LATERAL subquery (SQL:1999 lateral derived table, "
        "Spark 3.2+/DuckDB native): top-2 customers by revenue PER region "
        "via a per-row correlated limit — the front-end shape that "
        "decorrelates into a ranked window join under Catalyst"
    ),
)
def sql_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("customer", "nation", "orders", "region"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"{t}_lat_v")
    return spark.sql(
        """
        WITH rev AS (
          SELECT c.c_custkey, c.c_name, n.n_regionkey,
                 SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS cents
          FROM customer_lat_v c
          JOIN nation_lat_v n ON n.n_nationkey = c.c_nationkey
          JOIN orders_lat_v o ON o.o_custkey = c.c_custkey
          GROUP BY 1, 2, 3
        )
        SELECT r.r_name, t.c_name,
               CAST(t.cents AS DOUBLE) / 100 AS revenue
        FROM region_lat_v r, LATERAL (
          SELECT c_name, cents FROM rev
          WHERE rev.n_regionkey = r.r_regionkey
          ORDER BY cents DESC, c_custkey LIMIT 2
        ) t
        """
    )


@register(
    "text_vocab_growth",
    f"""
WITH n AS (SELECT CAST(MAX(doc_id) AS BIGINT) AS max_id FROM documents),
cps AS (SELECT CAST(unnest([10, 25, 50, 100]) AS BIGINT) AS pct),
tk AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
growth AS (
  SELECT cps.pct,
         CAST(COUNT(DISTINCT CASE WHEN tk.doc_id * 100 <= n.max_id * cps.pct
                                  THEN tk.tok END) AS BIGINT) AS vocab,
         CAST(SUM(CASE WHEN tk.doc_id * 100 <= n.max_id * cps.pct
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_tokens
  FROM tk CROSS JOIN n CROSS JOIN cps
  GROUP BY cps.pct
)
SELECT pct, n_tokens, vocab,
       CAST((vocab * 1000000 + n_tokens // 2) // n_tokens AS BIGINT)
         AS vocab_token_ratio_ppm
FROM growth ORDER BY pct
""",
    category="text",
    description=(
        "Heaps'-law vocabulary growth curve: distinct-token count at "
        "10/25/50/100% corpus prefixes (by doc_id) in ONE scan via "
        "conditional distinct aggregation — the sublinear-vocab check that "
        "sizes tokenizers and spots corpus-boundary duplication"
    ),
)
def text_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n = docs.agg(F.max("doc_id").cast("bigint").alias("max_id"))
    cps = spark.range(1).select(
        F.explode(
            F.array(*[F.lit(p) for p in (10, 25, 50, 100)])
        ).alias("pct0")
    ).select(F.col("pct0").cast("bigint").alias("pct")
    )
    tk = docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    growth = (
        tk.crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(cps))
        .groupBy("pct")
        .agg(
            F.countDistinct(
                F.when(
                    F.col("doc_id") * 100 <= F.col("max_id") * F.col("pct"),
                    F.col("tok"),
                )
            )
            .cast("bigint")
            .alias("vocab"),
            F.sum(
                F.when(
                    F.col("doc_id") * 100 <= F.col("max_id") * F.col("pct"), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_tokens"),
        )
    )
    return growth.select(
        "pct",
        "n_tokens",
        "vocab",
        # exact integer ppm (half-up) — driver-hash-stable across engines
        F.expr(
            "CAST((vocab * 1000000 + n_tokens DIV 2) DIV n_tokens AS BIGINT)"
        ).alias("vocab_token_ratio_ppm"),
    ).orderBy("pct")


@register(
    "dedup_shingle_df_profile",
    f"""
WITH sh0 AS (
  SELECT doc_id, unnest(list_distinct({shingles_duck('text')})) AS shingle
  FROM documents
),
sh AS (SELECT doc_id, {hash48_duck('shingle')} AS h FROM sh0),
df AS (SELECT h, COUNT(*) AS df FROM sh GROUP BY h),
b AS (SELECT CAST(length(bin(df)) AS INT) AS df_log2_bucket, df FROM df)
SELECT df_log2_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(SUM(df) AS BIGINT) AS total_postings,
       CAST(MAX(df) AS BIGINT) AS max_df
FROM b GROUP BY df_log2_bucket ORDER BY df_log2_bucket
""",
    category="dedup",
    description=(
        "Inverted-index skew profile over the index's OWN 48-bit hashed "
        "shingle keys: document-frequency histogram in log2 buckets "
        "(bit-length bucketing — integer-exact) + posting mass per bucket "
        "— the diagnostic that says whether the plain inverted-index join "
        "will blow up on common shingles and the PPJoin prefix filter "
        "should take over"
    ),
)
def dedup_shingle_df_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the profile keys on hash48(shingle) — the inverted index's own join
    # key — and hashes INSIDE the array before the explode.  Exploding
    # the raw string-shingle array straight out of its computing
    # projection is pathological (measured 7.7s vs 0.9s over the sf0.1
    # corpus: the generator's unmaterialized wide string-array input is
    # re-touched per emitted element); mapping to int64 hashes first
    # keeps the Generate input narrow.  Same fast pattern as
    # ops/dedup.py's minhash/ngram index builders.
    from findb_spark.functions.hashing import hash48
    from findb_spark.ops.dedup import shingle_arrays

    docs = load_table(spark, sf_dir, "documents")
    sh = shingle_arrays(docs).select(
        "doc_id",
        F.explode(F.transform(F.col("sharr"), lambda s: hash48(s))).alias("h"),
    )
    df = sh.groupBy("h").agg(F.count("*").alias("df"))
    b = df.select(
        F.expr("CAST(length(bin(df)) AS INT)").alias("df_log2_bucket"), "df"
    )
    return (
        b.groupBy("df_log2_bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_shingles"),
            F.sum("df").cast("bigint").alias("total_postings"),
            F.max("df").cast("bigint").alias("max_df"),
        )
        .orderBy("df_log2_bucket")
    )


_KN_D = 0.75
_KN_TOPN = 30

_BIGRAMS_CTE = """
ptoks AS (
  SELECT doc_id, tok,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS pos
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
               unnest(generate_series(1, len(string_split(text, ' ')))) AS pos
        FROM documents)
),
bg AS (
  SELECT w1, w2, COUNT(*) AS c12 FROM (
    SELECT tok AS w1,
           LEAD(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
    FROM ptoks)
  WHERE w2 IS NOT NULL GROUP BY w1, w2
)
"""


@register(
    "text_kneser_ney_bigram",
    f"""
WITH {_BIGRAMS_CTE},
lft AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1,
               COUNT(*) AS n1f FROM bg GROUP BY w1),
rgt AS (SELECT w2, COUNT(*) AS nrev FROM bg GROUP BY w2),
tot AS (SELECT COUNT(*) AS ntot FROM bg)
SELECT w1, w2, c12,
       CAST(FLOOR((GREATEST(CAST(c12 AS DOUBLE) - {_KN_D}, CAST(0 AS DOUBLE))
               / CAST(c1 AS DOUBLE)
             + {_KN_D} * CAST(n1f AS DOUBLE) / CAST(c1 AS DOUBLE)
               * CAST(nrev AS DOUBLE) / CAST(ntot AS DOUBLE))
             * 100000000 + 0.5) AS BIGINT) AS p_kn_p8,
       CAST((c12 * 100000000 + c1 // 2) // c1 AS BIGINT) AS p_mle_p8
FROM bg JOIN lft USING (w1) JOIN rgt USING (w2), tot
ORDER BY c12 DESC, w1, w2 LIMIT {_KN_TOPN}
""",
    category="text",
    description=(
        f"Interpolated Kneser-Ney bigram language model (discount D={_KN_D}, "
        "Kneser-Ney continuation probabilities from distinct-context "
        f"counts) over the corpus, top {_KN_TOPN} bigrams — the classic "
        "n-gram LM smoother as pure relational algebra (all inputs exact "
        "integer counts; one identical double expression both engines)"
    ),
)
def text_kneser_ney_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    bg = (
        toks.select("doc_id", F.col("tok").alias("w1"), F.lead("tok").over(w).alias("w2"))
        .where(F.col("w2").isNotNull())
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c12"))
    )
    lft = bg.groupBy("w1").agg(
        F.sum("c12").cast("bigint").alias("c1"), F.count("*").alias("n1f")
    )
    rgt = bg.groupBy("w2").agg(F.count("*").alias("nrev"))
    tot = bg.agg(F.count("*").alias("ntot"))
    d = F.lit(_KN_D)
    return (
        bg.join(never_broadcast(lft), "w1")  # vocab-proportional sides
        .join(never_broadcast(rgt), "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            "c12",
            # fixed-point 1e8 (half-up): identical correctly-rounded IEEE
            # op sequence on both engines, unlike ROUND(double, 8)
            F.floor(
                (
                    F.greatest(F.col("c12").cast("double") - d, F.lit(0.0))
                    / F.col("c1").cast("double")
                    + d
                    * F.col("n1f").cast("double")
                    / F.col("c1").cast("double")
                    * F.col("nrev").cast("double")
                    / F.col("ntot").cast("double")
                )
                * 100000000
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("p_kn_p8"),
            F.expr(
                "CAST((c12 * 100000000 + c1 DIV 2) DIV c1 AS BIGINT)"
            ).alias("p_mle_p8"),
        )
        .orderBy(F.col("c12").desc(), "w1", "w2")
        .limit(_KN_TOPN)
    )


_RAKE_STOP = ("the", "a")
_RAKE_TOPN = 20


@register(
    "text_rake_keywords",
    f"""
WITH ptoks AS (
  SELECT doc_id, tok, pos,
         SUM(CASE WHEN tok IN {_RAKE_STOP} THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY pos) AS pid
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
               unnest(generate_series(1, len(string_split(text, ' ')))) AS pos
        FROM documents)
),
members AS (
  SELECT doc_id, pid, pos, tok FROM ptoks WHERE tok NOT IN {_RAKE_STOP}
),
plen AS (
  SELECT doc_id, pid, COUNT(*) AS plen FROM members GROUP BY doc_id, pid
),
wstat AS (
  SELECT tok, COUNT(*) AS freq,
         CAST(SUM(plen - 1) AS BIGINT) AS deg
  FROM members JOIN plen USING (doc_id, pid) GROUP BY tok
),
wscore AS (
  SELECT tok,
         CAST(FLOOR((CAST(deg AS DOUBLE) / CAST(freq AS DOUBLE) + 1.0)
                    * 1000000 + 0.5) AS BIGINT) AS ws_q
  FROM wstat
),
phrases AS (
  SELECT m.doc_id, m.pid,
         STRING_AGG(m.tok, ' ' ORDER BY m.pos) AS phrase,
         CAST(SUM(w.ws_q) AS BIGINT) AS score_q
  FROM members m JOIN wscore w USING (tok)
  GROUP BY m.doc_id, m.pid
)
SELECT phrase,
       CAST(score_q AS DOUBLE) / 1000000 AS score,
       COUNT(*) AS occurrences
FROM phrases
GROUP BY phrase, score_q
ORDER BY score DESC, phrase LIMIT {_RAKE_TOPN}
""",
    category="text",
    description=(
        "RAKE keyword extraction (Rose et al. 2010): candidate phrases are "
        "maximal stopword-free runs; word score = degree/frequency + 1 over "
        "the co-occurrence graph, phrase score = fxp-exact sum of member "
        f"scores; top {_RAKE_TOPN} phrases corpus-wide"
    ),
)
def text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "tok")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok")
    w = Window.partitionBy("doc_id").orderBy("pos")
    stop = F.col("tok").isin(*_RAKE_STOP)
    ptoks = toks.select(
        "doc_id",
        "tok",
        "pos",
        F.sum(F.when(stop, 1).otherwise(0)).over(w).alias("pid"),
    )
    members = ptoks.where(~F.col("tok").isin(*_RAKE_STOP))
    plen = members.groupBy("doc_id", "pid").agg(F.count("*").alias("plen"))
    wstat = (
        members.join(never_broadcast(plen), ["doc_id", "pid"])  # doc-proportional
        .groupBy("tok")
        .agg(
            F.count("*").alias("freq"),
            F.sum(F.col("plen") - 1).cast("bigint").alias("deg"),
        )
    )
    wscore = wstat.select(
        "tok",
        F.floor(
            (F.col("deg").cast("double") / F.col("freq").cast("double") + F.lit(1.0))
            * 1000000
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("ws_q"),
    )
    phrases = (
        members.join(never_broadcast(wscore), "tok")  # vocab-proportional
        .groupBy("doc_id", "pid")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                    lambda x: x["tok"],
                ),
                " ",
            ).alias("phrase"),
            F.sum("ws_q").cast("bigint").alias("score_q"),
        )
    )
    return (
        phrases.groupBy("phrase", "score_q")
        .agg(F.count("*").alias("occurrences"))
        .select(
            "phrase",
            (F.col("score_q").cast("double") / 1000000).alias("score"),
            "occurrences",
        )
        .orderBy(F.col("score").desc(), "phrase")
        .limit(_RAKE_TOPN)
    )
