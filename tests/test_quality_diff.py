"""Unit tests for the round-2 quality/CDC operators: snapshot_diff,
dq_audit, scrub_patterns, semantic_dedup_pairs."""

from __future__ import annotations

from pyspark.sql import functions as F

from findb_spark.ops.diff import snapshot_diff
from findb_spark.ops.quality import dq_audit, scrub_patterns
from findb_spark.session import load_table


def test_snapshot_diff_classifies_and_drops_unchanged(spark):
    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, None, 40.0)],
        "k INT, s STRING, v DOUBLE",
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0), (2, "B", 20.0), (4, None, 40.0), (5, "e", 50.0)],
        "k INT, s STRING, v DOUBLE",
    )
    got = {
        r.k: (r.change, r.old_s, r.new_s)
        for r in snapshot_diff(old, new, ["k"], ["s", "v"]).collect()
    }
    # 1 unchanged (dropped), 4 unchanged with null value (null-safe compare)
    assert got == {
        2: ("update", "b", "B"),
        3: ("delete", "c", None),
        5: ("insert", None, "e"),
    }


def test_snapshot_diff_inverts_merge(spark, sf_dir):
    """diff(orders, merge(orders, feed)) recovers exactly the feed's
    insert/delete/update key sets."""
    from findb_spark.queries.merge_queries import _merged_orders

    old, new = _merged_orders(spark, sf_dir)
    d = snapshot_diff(
        old, new, keys=["o_orderkey"], compare=["o_orderstatus", "o_totalprice"]
    )
    by_change = {
        r.change: r.n for r in d.groupBy("change").agg(F.count("*").alias("n")).collect()
    }
    keys = [r.o_orderkey for r in old.select("o_orderkey").collect()]
    want_delete = sum(1 for k in keys if k % 21 == 0)
    want_insert = sum(1 for k in keys if k % 97 == 0)
    want_update = sum(1 for k in keys if k % 7 == 0 and k % 21 != 0)
    assert by_change.get("delete", 0) == want_delete
    assert by_change.get("insert", 0) == want_insert
    assert by_change.get("update", 0) == want_update


def test_dq_audit_counts(spark):
    df = spark.createDataFrame(
        [
            (1, 10, 5.0),
            (1, 20, -1.0),  # dup key + nonpositive value
            (2, None, 3.0),  # null fk
            (3, 99, 4.0),  # orphan fk
        ],
        "k INT, fk INT, v DOUBLE",
    )
    dim = spark.createDataFrame([(10,), (20,)], "id INT")
    rep = {
        r.check: (r.n_violations, r.n_checked)
        for r in dq_audit(
            df,
            row_rules={
                "null_fk": F.col("fk").isNull(),
                "nonpositive_v": F.col("v") <= 0,
            },
            unique_key=["k"],
            fk=(dim, "fk", "id"),
        ).collect()
    }
    assert rep["null_fk"] == (1, 4)
    assert rep["nonpositive_v"] == (1, 4)
    assert rep["unique:k"] == (1, 4)
    assert rep["fk:fk"] == (1, 4)  # null fk not an orphan; 99 is


def test_scrub_patterns_counts_and_masks(spark):
    df = spark.createDataFrame(
        [("call 555123456 or 42",), ("clean",)], "t STRING"
    )
    out = scrub_patterns(
        df, "t", {"longid": "[0-9]{6,}", "digits": "[0-9]+"}
    ).collect()
    rows = {r.t: r for r in out}
    r = rows["call 555123456 or 42"]
    assert (r.n_longid, r.n_digits) == (1, 2)
    assert r.t_scrubbed == "call [REDACTED] or [REDACTED]"
    assert rows["clean"].t_scrubbed == "clean"


def test_semantic_dedup_is_cluster_restricted_exact(spark, sf_dir):
    """Semantic pairs == exact near-dup pairs whose endpoints the codebook
    co-assigns (no false positives; misses are exactly the cross-cluster
    pairs — the SemDeDup tradeoff)."""
    from findb_spark.ops.vector import ivf_assign, near_dup_pairs, semantic_dedup_pairs

    emb = load_table(spark, sf_dir, "embeddings")
    sem = {(r.v1, r.v2) for r in semantic_dedup_pairs(emb, threshold=0.4).collect()}
    exact = {(r.v1, r.v2) for r in near_dup_pairs(emb, threshold=0.4).collect()}
    cluster = {r.vec_id: r.cluster for r in ivf_assign(emb).collect()}
    want = {(a, b) for (a, b) in exact if cluster[a] == cluster[b]}
    assert sem == want
    assert sem <= exact
    # the codebook should co-assign a nontrivial share of true near-dups
    if exact:
        assert len(sem) / len(exact) > 0.2


def test_containment_dominates_jaccard(spark, sf_dir):
    """cont_max = inter/min(szA,szB) >= inter/union = J, so every Jaccard
    pair at >= 0.5 must surface as a containment pair at >= 0.5."""
    from findb_spark.ops.dedup import containment_pairs, jaccard_pairs

    docs = load_table(spark, sf_dir, "documents")
    jp = {(r.doc1, r.doc2) for r in jaccard_pairs(docs, threshold=0.5).collect()}
    cp = {(r.doc1, r.doc2) for r in containment_pairs(docs, threshold=0.5).collect()}
    assert jp <= cp


def test_bigram_novelty_separates_shared_from_unique(spark):
    from findb_spark.ops.text import bigram_novelty

    docs = spark.createDataFrame(
        [
            (1, "a b c d"),
            (2, "a b c d"),       # exact copy: every bigram df=2
            (3, "x y z w"),       # disjoint: every bigram df=1
        ],
        "doc_id BIGINT, text STRING",
    )
    got = {r.doc_id: (r.n_bigrams, r.mean_df, r.unique_share) for r in bigram_novelty(docs).collect()}
    assert got[1] == (3, 2.0, 0.0)
    assert got[2] == (3, 2.0, 0.0)
    assert got[3] == (3, 1.0, 1.0)


def test_shingles_short_docs_yield_empty_not_error(spark):
    """Docs shorter than the shingle width must produce an empty shingle
    array (matching DuckDB's end-exclusive range), not an ANSI
    element_at(0) error from F.sequence counting downward."""
    from findb_spark.ops.dedup import jaccard_pairs, minhash_signatures
    from findb_spark.ops.text import shingles_of

    docs = spark.createDataFrame(
        [(1, "solo"), (2, "two words"), (3, "a b c d")],
        "doc_id BIGINT, text STRING",
    )
    sh = {
        r.doc_id: r.s
        for r in docs.select(
            "doc_id", shingles_of(F.split("text", " "), 3).alias("s")
        ).collect()
    }
    assert sh == {1: [], 2: [], 3: ["a b c", "b c d"]}
    # the whole dedup stack survives short docs; shingle-less docs carry
    # no signature row (matching the oracle's GROUP BY)
    assert jaccard_pairs(docs).count() == 0
    assert minhash_signatures(docs).count() == 1


def test_short_docs_do_not_collide_in_lsh_bands(spark):
    """Docs with no shingles carry no signature row and must not reach
    banding — a shared all-NULL signature would collapse onto one empty
    band key and make every short-doc pair a candidate (quadratic)."""
    from findb_spark.ops.dedup import _band_keys, minhash_lsh_pairs, minhash_signatures

    docs = spark.createDataFrame(
        [(1, "solo"), (2, "two words"), (3, "other pair"), (4, "a b c d e")],
        "doc_id BIGINT, text STRING",
    )
    bands = _band_keys(minhash_signatures(docs))
    assert {r.doc_id for r in bands.collect()} == {4}
    assert minhash_lsh_pairs(docs).count() == 0


def test_dq_audit_empty_input_reports_zeroes(spark):
    """An empty batch (streaming monitor's empty microbatch) must report
    0 violations / 0 checked — never NULL."""
    e = spark.createDataFrame([], "k INT, s STRING")
    dim = spark.createDataFrame([(1,)], "id INT")
    rep = {
        r.check: (r.n_violations, r.n_checked)
        for r in dq_audit(
            e,
            row_rules={"null_s": F.col("s").isNull()},
            unique_key=["k"],
            fk=(dim, "k", "id"),
        ).collect()
    }
    assert rep == {"null_s": (0, 0), "unique:k": (0, 0), "fk:k": (0, 0)}


def test_prefix_jaccard_lossless_across_thresholds(spark, sf_dir):
    """The PPJoin prefix/length/position filters must be lossless for ANY
    threshold: jaccard_pairs_prefix == jaccard_pairs exactly (the
    float-ceil over-estimation regression dropped pairs at thresholds
    whose t*size product is an exact integer)."""
    from findb_spark.ops.dedup import jaccard_pairs, jaccard_pairs_prefix

    docs = load_table(spark, sf_dir, "documents").limit(120)
    for t in (0.07, 0.25, 0.4, 0.5):
        naive = {(r.doc1, r.doc2) for r in jaccard_pairs(docs, threshold=t).collect()}
        pref = {
            (r.doc1, r.doc2)
            for r in jaccard_pairs_prefix(docs, threshold=t).collect()
        }
        assert pref == naive, f"threshold {t}: {naive - pref} lost, {pref - naive} extra"
