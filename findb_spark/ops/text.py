"""Text-analysis operators over the ``documents`` table — the
training-data-pipeline layer (BASELINE.json mandate): token statistics,
quality scoring, language ID, fingerprinting, shingling.

All hot-path expressions are JVM-side array/string built-ins (split,
filter, transform, aggregate) — no Python UDFs — so they run inside
whole-stage codegen and scale linearly with executors. The shared hashing
primitive (functions.hashing.hash48) keeps every derived signature
reproducible in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from findb_spark.plans.broadcast import never_broadcast

from findb_spark.functions.hashing import hash48

#: tokens treated as stopwords for quality metrics (domain-tuned; the
#: driver's synthetic docs draw from a small query-engine vocabulary)
STOPWORDS = ("the", "a", "of", "and", "to", "in")

#: marker words per language for the n-gram/stopword language-ID heuristic
LANG_MARKERS = {
    "en": ("the", "a", "and"),
    "fr": ("le", "la", "et"),
    "de": ("der", "die", "und"),
}


def tokens(col: Column | str = "text") -> Column:
    return F.split(col if isinstance(col, Column) else F.col(col), " ")


def token_stats(docs: DataFrame) -> DataFrame:
    """Per-document token statistics (counts, uniqueness, lengths)."""
    t = tokens()
    n = F.size(t)
    return docs.select(
        "doc_id",
        n.alias("n_tokens"),
        F.size(F.array_distinct(t)).alias("n_unique_tokens"),
        # total non-space chars / tokens — deterministic double division
        ((F.length("text") - (n - 1)) / n).alias("avg_token_len"),
        (F.size(F.array_distinct(t)) / n).alias("type_token_ratio"),
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Heuristic quality features: length band, stopword ratio, repetition."""
    t = tokens()
    n = F.size(t)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(t, lambda x: F.array_contains(stop_arr, x)))
    uniq_ratio = F.size(F.array_distinct(t)) / n
    return docs.select(
        "doc_id",
        "lang",
        n.alias("n_tokens"),
        (n_stop / n).alias("stopword_ratio"),
        uniq_ratio.alias("uniq_ratio"),
        F.when(n < 20, "short").when(n <= 80, "medium").otherwise("long").alias("len_band"),
    )


def language_id(docs: DataFrame) -> DataFrame:
    """Marker-word language ID: per language, count marker hits; predict the
    argmax with a deterministic preference order (en > fr > de on ties)."""
    t = tokens()
    scores = {}
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        scores[lang] = F.size(F.filter(t, lambda x: F.array_contains(arr, x)))
    pred = (
        F.when(
            (scores["en"] >= scores["fr"]) & (scores["en"] >= scores["de"]), "en"
        )
        .when(scores["fr"] >= scores["de"], "fr")
        .otherwise("de")
    )
    return docs.select(
        "doc_id",
        "lang",
        scores["en"].alias("score_en"),
        scores["fr"].alias("score_fr"),
        scores["de"].alias("score_de"),
        pred.alias("pred_lang"),
    )


def regex_token_count(docs: DataFrame) -> DataFrame:
    """BPE-ish sub-token counting: alpha runs, digit runs, other symbols."""
    pat = "[a-z]+|[0-9]+|[^a-z0-9 ]"
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("text"), F.lit(pat), F.lit(0))).alias(
            "n_subtokens"
        ),
        F.length("text").alias("n_chars"),
    )


def shingles_of(t: Column, n: int = 3) -> Column:
    """Word n-gram shingles from a *pre-materialized* token-array column.

    IMPORTANT: pass an attribute reference (a projected column), not an
    inline ``F.split(...)`` — an inline split is re-evaluated inside every
    ``element_at`` of the lambda (3n splits of the full text per shingle,
    O(tokens^2) per document; observed 5.5 s -> 0.4 s on 5k docs)."""
    count = F.size(t) - (n - 1)
    parts = lambda i: [F.element_at(t, i + j) for j in range(n)]  # noqa: E731
    # guard BEFORE sequence: F.sequence(1, c) with c < 1 counts DOWNWARD
    # ([1, 0], [1, 0, -1], ...), so a doc shorter than n tokens would
    # evaluate element_at(t, 0) — an ANSI-mode runtime error — instead of
    # yielding no shingles. (DuckDB's range(1, c+1) is end-exclusive and
    # already empty there; this keeps both engines at "empty array".)
    return F.when(
        count >= 1,
        F.transform(
            F.sequence(F.lit(1), count),
            lambda i: F.concat_ws(" ", *parts(i)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def shingles(col: Column, n: int = 3) -> Column:
    """Shingles directly from a text column (convenience; prefer projecting
    tokens first via `shingles_of` in anything performance-sensitive —
    1-based element_at mirrors the DuckDB oracle's list_transform(range...))."""
    return shingles_of(F.split(col, " "), n)


def shingles_duck(expr: str = "text", n: int = 3) -> str:
    """DuckDB twin of `shingles`."""
    toks = f"string_split({expr}, ' ')"
    joined = " || ' ' || ".join(f"{toks}[i+{j}]" for j in range(n))
    return (
        f"list_transform(range(1, greatest(len({toks}) - {n - 1}, 0) + 1), "
        f"i -> {joined})"
    )


def fingerprint(docs: DataFrame) -> DataFrame:
    """Document fingerprints: whole-text hash + minimum shingle hash (a
    1-permutation MinHash — robust to small appends)."""
    base = docs.select(
        "doc_id", "text", F.split(F.col("text"), " ").alias("_t")
    ).select("doc_id", "text", shingles_of(F.col("_t")).alias("_sh"))
    min_shingle = F.array_min(F.transform(F.col("_sh"), lambda s: hash48(s)))
    return base.select(
        "doc_id",
        hash48(F.col("text")).alias("text_hash"),
        min_shingle.alias("min_shingle_hash"),
    )


def repetition_stats(docs: DataFrame) -> DataFrame:
    """Per-document repetition signals — the standard 'gibberish / boilerplate'
    quality gate of a training-data pipeline: share of the most frequent
    token, and the fraction of duplicated word bigrams.

    Array-native per row (no explode, no shuffle): the per-doc token count
    is small, so the O(distinct * n) most-frequent scan stays cheap and
    entirely inside whole-stage codegen. All outputs are single-division
    rationals of exact integers — bit-identical cross-engine."""
    t = tokens()
    n = F.size(t)
    top_tf = F.array_max(
        F.transform(F.array_distinct(t), lambda x: F.size(F.filter(t, lambda y: y == x)))
    )
    bigrams = F.transform(
        F.sequence(F.lit(1), n - 1),
        lambda i: F.concat(F.element_at(t, i), F.lit(" "), F.element_at(t, i + 1)),
    )
    nb = F.size(bigrams)
    dup_bigram_ratio = F.when(n < F.lit(2), F.lit(0.0)).otherwise(
        (nb - F.size(F.array_distinct(bigrams))) / nb
    )
    return docs.select(
        "doc_id",
        n.alias("n_tokens"),
        (top_tf / n).alias("top_token_share"),
        dup_bigram_ratio.alias("dup_bigram_ratio"),
    )


def bigram_novelty(docs: DataFrame) -> DataFrame:
    """Corpus-grounded novelty/fluency proxy per document: document-
    frequency statistics of its distinct word bigrams.

    A fluent document re-uses word transitions the corpus has seen
    (high mean df); boilerplate scores extreme (every bigram shared),
    gibberish scores df~1 everywhere. This is the log-free skeleton of a
    bigram-LM perplexity score — exact integer df sums instead of
    ln(p) (libm logs are not bit-reproducible across engines, so the
    deterministic form stays in counts).

    Plan: one explode -> df hash-aggregate (map-side combined) -> one
    re-join of bigrams to their df -> per-doc aggregate. Joins/aggregates
    run on 48-bit bigram hashes, never the strings.

    Output contract: documents with fewer than two tokens have no bigrams
    and therefore NO output row (the DuckDB oracle's unnest drops them
    identically). A quality gate joining these features back onto the
    corpus should left-join and treat the absent row as its own signal
    (degenerate-length document), not inner-join them away silently."""
    from findb_spark.functions.hashing import hash48

    arrs = docs.select(
        "doc_id", F.split(F.col("text"), " ").alias("_t")
    ).select(
        "doc_id",
        F.array_distinct(
            F.transform(shingles_of(F.col("_t"), 2), lambda s: hash48(s))
        ).alias("_bh"),
    )
    bg = arrs.select("doc_id", F.explode("_bh").alias("bh"))
    dfreq = bg.groupBy("bh").agg(F.count("*").alias("_df"))
    # sort-merge (never_broadcast) pin: both sides are corpus-bigram-proportional (bg is
    # explode-derived — fan-out invisible to Catalyst's size estimate —
    # and dfreq is its distinct aggregate); a mis-estimated broadcast here
    # is the scale-smoke-caught OOM class (see ops/dedup.py jaccard_pairs)
    return (
        bg.join(dfreq.transform(never_broadcast), "bh")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            (F.sum("_df").cast("double") / F.count("*")).alias("mean_df"),
            (
                F.sum(F.when(F.col("_df") == 1, 1).otherwise(0)).cast("double")
                / F.count("*")
            ).alias("unique_share"),
        )
    )
