"""Vector-similarity operators over ``embeddings`` (64-d float arrays):
brute-force cosine top-k (the exactness baseline) and LSH-bucketed ANN
(the scale path). BASELINE.json LLM-pipeline mandate.

Numeric determinism: dot products and norms are fixed-point integer sums
(per-element ``floor(x*y*1e12 + 0.5)`` — identical IEEE-754 ops on any
engine, then exact integer accumulation), so cosine values are
bit-identical between Spark and the DuckDB oracle regardless of
partitioning. All array math is JVM-side (``zip_with``/``aggregate``
inside codegen) — no Python boundary.

Scale:
- brute-force top-k against a bounded query set is a broadcast
  nested-loop: the embedding table streams once, queries live in memory —
  the right plan up to ~10^3 queries x any corpus size.
- `lsh_buckets` (random-hyperplane signs) turns ANN into an equi-join on
  bucket id: corpus bucketed once (one shuffle), each query probes one
  bucket. Plane matrix is hash-derived (deterministic, no RNG), so bucket
  assignment is reproducible everywhere. An IVF variant (k-means
  centroids) would slot into the same probe-join shape.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window, functions as F

from findb_spark.functions.hashing import hash48

DIM = 64
FXP_SCALE = 10**12
PROJ_SCALE = 10**9
N_PLANES = 6


def fxp_dot(a: Column, b: Column, dim: int = DIM) -> Column:
    """Deterministic fixed-point dot product of two float arrays (scaled by
    FXP_SCALE, exact integer sum).

    Unrolled over the fixed dimension instead of zip_with/aggregate:
    higher-order array functions are evaluated *interpreted* (off the
    whole-stage-codegen path) and cost ~50x on all-pairs joins; a 64-term
    element_at expression stays inside codegen. Integer addition is
    associative, so the unrolled sum is bit-identical to the fold."""
    terms = [
        F.floor(
            F.element_at(a, i).cast("double")
            * F.element_at(b, i).cast("double")
            * FXP_SCALE
            + F.lit(0.5)
        )
        for i in range(1, dim + 1)
    ]
    # balanced addition tree (depth log2(dim), not dim): integer addition
    # is associative so the value is bit-identical to the left-linear fold,
    # but Catalyst analysis of the expression is ~2x faster at depth 7 vs
    # depth 64 (driver-side cost that showed up as bench 'build' time)
    while len(terms) > 1:
        terms = [
            terms[i] + terms[i + 1] if i + 1 < len(terms) else terms[i]
            for i in range(0, len(terms), 2)
        ]
    return terms[0].cast("bigint")


def fxp_dot_sql(a: str, b: str, dim: int = DIM) -> str:
    """DuckDB twin of `fxp_dot`."""
    return (
        f"CAST(list_sum(list_transform(range(1, {dim + 1}), i -> "
        f"CAST(FLOOR(CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE) * {FXP_SCALE}.0 + 0.5)"
        f" AS BIGINT))) AS BIGINT)"
    )


def cosine(a: Column, b: Column) -> Column:
    dot = fxp_dot(a, b).cast("double") / FXP_SCALE
    na = fxp_dot(a, a).cast("double") / FXP_SCALE
    nb = fxp_dot(b, b).cast("double") / FXP_SCALE
    return dot / (F.sqrt(na) * F.sqrt(nb))


def cosine_sql(a: str, b: str, dim: int = DIM) -> str:
    return (
        f"({fxp_dot_sql(a, b, dim)} / {FXP_SCALE}.0) / "
        f"(sqrt({fxp_dot_sql(a, a, dim)} / {FXP_SCALE}.0) * "
        f"sqrt({fxp_dot_sql(b, b, dim)} / {FXP_SCALE}.0))"
    )


def norm(v: Column) -> Column:
    """Fixed-point L2 norm — same float ops as the norm terms inside
    :func:`cosine`, so precomputing it per row (not per pair) is
    bit-identical and saves 128 of the 192 floor-terms per pair."""
    return F.sqrt(fxp_dot(v, v).cast("double") / FXP_SCALE)


def cosine_topk(
    emb: DataFrame, query: DataFrame, k: int = 10, exclude_self: bool = True
) -> DataFrame:
    """Exact top-k neighbors of each query vector (broadcast NL join +
    per-query ranking window). ``query``: (query_id, qv array<float>).

    Norms are computed once per corpus row / query row before the join;
    only the cross-pair dot product is evaluated per pair."""
    corpus = emb.withColumn("_nrm", norm(F.col("embedding")))
    q = query.withColumn("_qnrm", norm(F.col("qv")))
    j = corpus.crossJoin(F.broadcast(q))
    if exclude_self:
        j = j.where(F.col("vec_id") != F.col("query_id"))
    sim = (fxp_dot(F.col("embedding"), F.col("qv")).cast("double") / FXP_SCALE) / (
        F.col("_nrm") * F.col("_qnrm")
    )
    scored = j.select("query_id", "vec_id", sim.alias("cos_sim"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "vec_id")
    return scored.select(
        "query_id", "vec_id", "cos_sim", F.row_number().over(w).alias("rank")
    ).where(F.col("rank") <= k)


def near_dup_pairs(
    emb: DataFrame, threshold: float = 0.4, block_size: int = 256
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs — exact all-pairs semantics via
    distributed block-nested-loop:

    1. vectors are grouped into blocks of `block_size` (one shuffle);
    2. block pairs (blk1 <= blk2) join — m^2/2 *block* rows instead of
       n^2/2 vector rows, so no per-pair array shipping;
    3. each block pair computes its dot-product tile as one Arrow-batched
       numpy operation (exact fixed-point: floor(x*y*1e12+0.5) int64 sums,
       bit-identical to the SQL oracle's per-element formula).

    All-pairs stays O(n^2) by definition — at corpus scale use
    `lsh_buckets` blocking (or MinHash over shingles for text) to bound the
    candidate set; this operator is the exactness baseline and the
    per-tile kernel both."""
    b = emb.select(
        F.floor(F.col("vec_id") / block_size).cast("int").alias("blk"),
        "vec_id",
        "embedding",
    )
    blocks = b.groupBy("blk").agg(
        F.sort_array(F.collect_list(F.struct("vec_id", "embedding"))).alias("rows")
    )
    tile = (
        blocks.alias("x")
        .join(blocks.alias("y"), F.col("x.blk") <= F.col("y.blk"))
        .select(
            F.col("x.blk").alias("blk1"),
            F.col("x.rows").alias("rows1"),
            F.col("y.blk").alias("blk2"),
            F.col("y.rows").alias("rows2"),
        )
    )

    def compute(pdfs):
        import numpy as np
        import pandas as pd

        scale = float(FXP_SCALE)

        def unpack(rows):
            ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
            mat = np.vstack([r["embedding"] for r in rows]).astype(np.float64)
            return ids, mat

        for pdf in pdfs:
            out_v1, out_v2, out_cos = [], [], []
            for rows1, rows2, same in zip(
                pdf["rows1"], pdf["rows2"], (pdf["blk1"] == pdf["blk2"])
            ):
                ids1, m1 = unpack(rows1)
                ids2, m2 = unpack(rows2)
                n1 = np.sqrt(
                    np.floor(m1 * m1 * scale + 0.5).astype(np.int64).sum(1) / scale
                )
                n2 = np.sqrt(
                    np.floor(m2 * m2 * scale + 0.5).astype(np.int64).sum(1) / scale
                )
                # whole tile in one 3-D broadcast (b x b x dim ~ 33 MB at 256):
                # identical per-element fixed-point ops as the row loop / SQL
                dots = (
                    np.floor(m1[:, None, :] * m2[None, :, :] * scale + 0.5)
                    .astype(np.int64)
                    .sum(2)
                    / scale
                )
                cos = dots / np.outer(n1, n2)
                mask = cos >= threshold
                if same:
                    mask &= ids2[None, :] > ids1[:, None]
                ii, jj = np.nonzero(mask)
                if len(ii):
                    out_v1.extend(ids1[ii].tolist())
                    out_v2.extend(ids2[jj].tolist())
                    out_cos.extend(cos[ii, jj].tolist())
            yield pd.DataFrame({"v1": out_v1, "v2": out_v2, "cos_sim": out_cos})

    return tile.mapInPandas(compute, schema="v1 BIGINT, v2 BIGINT, cos_sim DOUBLE")


def plane_matrix(n_planes: int = N_PLANES, dim: int = DIM) -> list[list[int]]:
    """Deterministic ±1 hyperplane matrix derived from md5 — reproducible in
    SQL-free form by embedding the literals into both engines' plans."""
    return [
        [
            1 if int(hashlib.md5(f"plane{j}_{d}".encode()).hexdigest()[:12], 16) % 2 == 0 else -1
            for d in range(dim)
        ]
        for j in range(n_planes)
    ]


def lsh_buckets(emb: DataFrame, planes: list[list[int]] | None = None) -> DataFrame:
    """Random-hyperplane LSH bucket id per vector: bit j = sign of the
    fixed-point projection onto plane j."""
    planes = planes or plane_matrix()
    bucket = None
    for j, m in enumerate(planes):
        marr = F.array(*[F.lit(w) for w in m])
        proj = F.aggregate(
            F.zip_with(
                F.col("embedding"),
                marr,
                lambda x, w: F.floor(x.cast("double") * w.cast("double") * PROJ_SCALE + F.lit(0.5)),
            ),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        )
        bit = F.when(proj > 0, F.lit(1 << j)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return emb.withColumn("bucket", bucket.cast("bigint"))


IVF_K = 64


def ivf_centroids(emb: DataFrame, k: int = IVF_K) -> DataFrame:
    """Fixed-size IVF codebook: the ``k`` corpus vectors minimal under a
    deterministic hash order (hash48 of vec_id, vec_id tiebreak) — an
    RNG-free uniform sample standing in for trained k-means centroids.

    ``k`` is independent of corpus size, so the codebook broadcast stays
    tiny and assignment is O(n*k) at any scale (a stride-based pick would
    grow the codebook O(n) and assignment O(n^2/stride)). Selection
    compiles to TakeOrderedAndProject — per-partition top-k then a driver
    merge of k rows, not a global sort shuffle."""
    hk = hash48(F.col("vec_id").cast("string"))
    return (
        emb.select(
            hk.alias("_hk"),
            F.col("vec_id").alias("cent_id"),
            F.col("embedding").alias("cvec"),
        )
        .orderBy("_hk", "cent_id")
        .limit(k)
        .select("cent_id", "cvec")
    )


def ivf_assign(emb: DataFrame, n_cent: int = IVF_K) -> DataFrame:
    """IVF coarse quantization with the fixed-``n_cent`` deterministic
    codebook: :func:`ivf_centroids` + :func:`assign_to_centroids` (the
    assignment plan — broadcast codebook, one corpus scan, smallest-id
    tiebreak — lives in ONE place). Returns (vec_id, embedding, cluster)."""
    return assign_to_centroids(emb, ivf_centroids(emb, n_cent))


MEAN_SCALE = 10**9


def assign_to_centroids(emb: DataFrame, cents: DataFrame) -> DataFrame:
    """Assign every vector to its max-cosine centroid (broadcast codebook,
    one corpus scan, no shuffle). ``cents``: (cent_id, cvec). Ties break
    to the smallest centroid id. Returns (vec_id, embedding, cluster)."""
    j = emb.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "embedding",
        "cent_id",
        cosine(F.col("embedding"), F.col("cvec")).alias("_cos"),
    )
    return (
        j.groupBy("vec_id")
        .agg(
            F.max_by(
                F.col("cent_id"),
                F.struct(F.col("_cos"), (-F.col("cent_id")).alias("_nc")),
            ).alias("cluster"),
            F.first("embedding").alias("embedding"),
        )
        .select("vec_id", "embedding", "cluster")
    )


def kmeans_refine_centroids(assigned: DataFrame) -> DataFrame:
    """One Lloyd update: per-cluster element-wise mean of the member
    vectors, computed as an **exact fixed-point sum** (per element
    ``floor(x*1e9+0.5)`` int64, summed exactly, divided once) so the
    refined centroids are bit-identical doubles on any engine and any
    partitioning — a raw float mean would vary with accumulation order
    and break oracle parity.

    Plan shape: posexplode (pure map) -> ONE hash aggregation on
    (cluster, pos) with map-side combine -> tiny (K x dim rows) regroup
    into arrays. Nothing grows with corpus size except the first
    aggregation's input, which combines map-side. Returns
    (cent_id, cvec: array<double>). Empty clusters drop out (standard
    Lloyd behavior)."""
    elems = assigned.select(
        "cluster", F.posexplode("embedding").alias("pos", "v")
    )
    means = elems.groupBy("cluster", "pos").agg(
        (
            F.sum(
                F.floor(F.col("v").cast("double") * MEAN_SCALE + F.lit(0.5))
            ).cast("double")
            / MEAN_SCALE
            / F.count("*")
        ).alias("cv")
    )
    return (
        means.groupBy("cluster")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "cv"))),
                lambda s: s.getField("cv"),
            ).alias("cvec")
        )
        .select(F.col("cluster").alias("cent_id"), "cvec")
    )


def kmeans_cluster_profile(emb: DataFrame, n_cent: int = IVF_K) -> DataFrame:
    """One full Lloyd iteration over the IVF codebook (deterministic
    hash-sample init -> assign -> fixed-point mean update -> re-assign),
    profiled per refined cluster: member count + mean cosine to the
    refined centroid (fixed-point mean, oracle-exact).

    This is the training loop of a real IVF/k-means index expressed as
    pure DataFrame algebra — each iteration is one broadcast assignment
    pass + one map-side-combined aggregation, so iterations cost O(n*K)
    with no shuffle proportional to pair counts. More iterations = loop
    this function's internals (see tests for the quality ladder)."""
    cents0 = ivf_centroids(emb, n_cent)
    asg1 = assign_to_centroids(emb, cents0)
    cents1 = kmeans_refine_centroids(asg1)
    asg2 = emb.crossJoin(F.broadcast(cents1)).select(
        "vec_id",
        "cent_id",
        cosine(F.col("embedding"), F.col("cvec")).alias("_cos"),
    )
    best = asg2.groupBy("vec_id").agg(
        F.max_by(
            F.struct(F.col("cent_id"), F.col("_cos")),
            F.struct(F.col("_cos"), (-F.col("cent_id")).alias("_nc")),
        ).alias("b")
    )
    per_vec = best.select(
        F.col("b.cent_id").alias("cluster"), F.col("b._cos").alias("cos")
    )
    return per_vec.groupBy("cluster").agg(
        F.count("*").alias("n_vecs"),
        (
            F.sum(F.floor(F.col("cos") * MEAN_SCALE + F.lit(0.5))).cast("double")
            / MEAN_SCALE
            / F.count("*")
        ).alias("avg_cos"),
    )


def ivf_topk(
    emb: DataFrame, k: int = 5, n_cent: int = IVF_K, nprobe: int = 1
) -> DataFrame:
    """IVF-style ANN top-k: probe the query's ``nprobe`` best coarse
    clusters, exact cosine rerank inside them. Queries are the vectors with
    vec_id < 3 (same convention as the other search specs). Complements
    `ann_lsh_topk`: same probe-join shape, codebook partitioning instead of
    hyperplane bucketing.

    ``nprobe`` is the standard recall/cost dial: candidates grow linearly
    with probes while the probe list itself stays a broadcast (queries x
    nprobe rows). nprobe=1 degenerates to the assigned-cluster-only probe
    (the oracle-checked form); nprobe=n_cent probes every cluster and is
    exactly brute force (recall 1.0 — tests pin the monotone ladder and
    the full-probe anchor). On unclustered data recall tracks the probed
    fraction ~nprobe/K; buying more recall per probe requires a trained
    (k-means) codebook, which drops into `ivf_centroids`' slot without
    changing this plan shape."""
    # build the codebook once and share it between assignment and the
    # probe list (two ivf_centroids calls would scan the corpus twice for
    # the same 64 rows)
    cents = ivf_centroids(emb, n_cent)
    assigned = assign_to_centroids(emb, cents).withColumn(
        "_nrm", norm(F.col("embedding"))
    )
    q = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    ).withColumn("_qnrm", norm(F.col("qv")))
    # per-query probe list: top-nprobe centroids by cosine (ties -> smaller
    # centroid id, matching ivf_assign's tiebreak so nprobe=1 == assignment)
    pw = Window.partitionBy("query_id").orderBy(F.desc("_ccos"), "cent_id")
    probes = (
        q.crossJoin(F.broadcast(cents))
        .select(
            "query_id",
            "qv",
            "_qnrm",
            "cent_id",
            cosine(F.col("qv"), F.col("cvec")).alias("_ccos"),
        )
        .withColumn("_pr", F.row_number().over(pw))
        .where(F.col("_pr") <= nprobe)
        .select("query_id", "qv", "_qnrm", F.col("cent_id").alias("qcluster"))
    )
    j = assigned.join(
        F.broadcast(probes),
        (F.col("cluster") == F.col("qcluster")) & (F.col("vec_id") != F.col("query_id")),
    )
    sim = (fxp_dot(F.col("embedding"), F.col("qv")).cast("double") / FXP_SCALE) / (
        F.col("_nrm") * F.col("_qnrm")
    )
    scored = j.select("query_id", "vec_id", sim.alias("cos_sim"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "vec_id")
    return scored.select(
        "query_id", "vec_id", "cos_sim", F.row_number().over(w).alias("rank")
    ).where(F.col("rank") <= k)


def semantic_dedup_pairs(
    emb: DataFrame, threshold: float = 0.4, n_cent: int = IVF_K
) -> DataFrame:
    """SemDeDup-style semantic near-duplicate pairs: coarse-quantize every
    vector to its IVF cluster (:func:`ivf_assign` — broadcast codebook, one
    corpus scan), then compare pairs **within a cluster only** (equi-join
    on the cluster id) and keep cosine >= ``threshold``.

    This is the pattern of Abbas et al., "SemDeDup" (arXiv:2303.09540):
    k-means the embedding space, then dedup inside each cluster — the
    cross-cluster pairs an exact all-pairs scan would also consider are
    exactly the distant pairs that cannot be semantic duplicates. Versus
    `near_dup_pairs` (exact O(n^2) baseline) the candidate set shrinks to
    O(sum c_i^2) ~ n^2/K for balanced clusters; at corpus scale K grows
    with n (K ~ n/target_cluster_size), holding per-cluster work constant
    while the join stays a plain hash shuffle on the cluster id.

    Output: (cluster, v1, v2, cos_sim), v1 < v2. Recall vs the exact scan
    = the fraction of true near-dup pairs co-assigned by the codebook
    (tests pin both containment and the recall floor)."""
    from pyspark.storagelevel import StorageLevel

    # both sides of the within-cluster self-join read `assigned`; without a
    # persist the whole O(n*K) codebook-assignment subtree runs twice
    assigned = (
        ivf_assign(emb, n_cent)
        .withColumn("_nrm", norm(F.col("embedding")))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    x = assigned.select(
        F.col("cluster"),
        F.col("vec_id").alias("v1"),
        F.col("embedding").alias("e1"),
        F.col("_nrm").alias("n1"),
    )
    y = assigned.select(
        F.col("cluster"),
        F.col("vec_id").alias("v2"),
        F.col("embedding").alias("e2"),
        F.col("_nrm").alias("n2"),
    )
    sim = (fxp_dot(F.col("e1"), F.col("e2")).cast("double") / FXP_SCALE) / (
        F.col("n1") * F.col("n2")
    )
    return (
        x.join(y, on="cluster")
        .where(F.col("v1") < F.col("v2"))
        .select("cluster", "v1", "v2", sim.alias("cos_sim"))
        .where(F.col("cos_sim") >= threshold)
    )


def ann_lsh_topk(
    emb: DataFrame, query: DataFrame, k: int = 5, multiprobe: bool = False
) -> DataFrame:
    """Approximate top-k: probe the query's LSH bucket, rank by exact
    cosine inside it. ``query``: (query_id, qv) — gets bucketed with the
    same plane matrix.

    ``multiprobe`` additionally probes every bucket at hamming distance 1
    (one flipped hyperplane bit) — the standard recall fix for vectors
    landing near a plane boundary; candidate cost grows ~(n_planes+1)x the
    single-bucket density while the probe list stays broadcast."""
    planes = plane_matrix()
    corpus = lsh_buckets(emb, planes).withColumn("_nrm", norm(F.col("embedding")))
    qb = (
        lsh_buckets(query.select(F.col("query_id"), F.col("qv").alias("embedding")), planes)
        .select("query_id", F.col("embedding").alias("qv"), F.col("bucket").alias("qbucket"))
        .withColumn("_qnrm", norm(F.col("qv")))
    )
    if multiprobe:
        flips = F.array(
            F.col("qbucket"),
            *[
                F.col("qbucket").bitwiseXOR(F.lit(1 << j)).cast("bigint")
                for j in range(len(planes))
            ],
        )
        qb = qb.select(
            "query_id", "qv", "_qnrm", F.explode(flips).alias("qbucket")
        )
    j = corpus.join(
        F.broadcast(qb),
        (F.col("bucket") == F.col("qbucket")) & (F.col("vec_id") != F.col("query_id")),
    )
    sim = (fxp_dot(F.col("embedding"), F.col("qv")).cast("double") / FXP_SCALE) / (
        F.col("_nrm") * F.col("_qnrm")
    )
    scored = j.select("query_id", "vec_id", sim.alias("cos_sim"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "vec_id")
    return scored.select(
        "query_id", "vec_id", "cos_sim", F.row_number().over(w).alias("rank")
    ).where(F.col("rank") <= k)


# ---------------------------------------------------------------------------
# Product quantization (Jegou, Douze, Schmid — "Product Quantization for
# Nearest Neighbor Search", TPAMI 2011).  64-d vectors split into PQ_M
# subspaces of PQ_SUBDIM dims; each subspace quantized against a PQ_K-entry
# codebook, so a vector compresses to PQ_M small codes (8 bytes here vs 256
# raw — the memory ratio that lets a 100 TB corpus's index fit executor RAM).
# Search uses ADC (asymmetric distance computation): the query stays full
# precision, per-subspace distances to every codeword are precomputed once
# into a tiny lookup table, and each candidate's distance is PQ_M table
# lookups + adds — no float math per candidate.
# ---------------------------------------------------------------------------

PQ_M = 8  # subspaces
PQ_SUBDIM = DIM // PQ_M
PQ_K = 64  # codewords per subspace (production PQ uses 256; 64 keeps the
#            oracle's cross join small while the plan shape is identical)


def unit_vector(v: Column) -> Column:
    """L2-normalize a float array to exact doubles: each element divided
    by the fixed-point norm (one IEEE divide per element — bit-identical
    cross-engine).  PQ quantizes NORMALIZED vectors so that squared L2
    distance is rank-equivalent to cosine (||a-b||² = 2 - 2·cos on unit
    vectors) — the metric every other search op here uses; quantizing raw
    vectors would make ADC rank by magnitude, not direction.

    NOTE: the norm subtree (a 64-term fixed-point dot) is embedded in the
    transform lambda and re-evaluated per ELEMENT; prefer the two-phase
    projection in :func:`_normalized` (norm into its own column first) on
    any hot path — 64x less work per row and a far smaller plan."""
    n = norm(v)
    return F.transform(v, lambda x: x.cast("double") / n)


def _normalized(emb: DataFrame) -> DataFrame:
    """(vec_id, nv): the corpus unit-normalized (exact doubles) — norm
    materialized into its own column first so each element's divide
    references an attribute, not a re-evaluated 64-term dot subtree."""
    return emb.select(
        "vec_id", norm(F.col("embedding")).alias("_n"), "embedding"
    ).select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double") / F.col("_n")).alias(
            "nv"
        ),
    )


def fxp_l2_sub(a: Column, sw: Column, sub: int) -> Column:
    """Deterministic fixed-point squared-L2 distance between subvector
    ``sub`` of the full array ``a`` and the PQ_SUBDIM-dim codeword ``sw``:
    per element ``floor((ai-bi)^2 * FXP_SCALE + 0.5)`` (exact IEEE double
    ops on both engines), exact integer sum.  Unrolled like
    :func:`fxp_dot` to stay inside whole-stage codegen."""
    base = sub * PQ_SUBDIM
    terms = []
    for i in range(1, PQ_SUBDIM + 1):
        d = (
            F.element_at(a, base + i).cast("double")
            - F.element_at(sw, i).cast("double")
        )
        terms.append(F.floor(d * d * FXP_SCALE + F.lit(0.5)))
    while len(terms) > 1:
        terms = [
            terms[i] + terms[i + 1] if i + 1 < len(terms) else terms[i]
            for i in range(0, len(terms), 2)
        ]
    return terms[0].cast("bigint")


def pq_codebook(emb: DataFrame, k: int = PQ_K) -> DataFrame:
    """Deterministic PQ init codebook in WIDE form: the ``k`` normalized
    corpus vectors minimal under hash order (same RNG-free sampling
    contract as :func:`ivf_centroids`), re-indexed to dense codes 1..k and
    split into per-subspace codewords ``sw0..sw{PQ_M-1}`` so ADC tables
    are array-indexable.  k is corpus-size-independent — the broadcast
    stays tiny at any scale."""
    hk = hash48(F.col("vec_id").cast("string"))
    # select the k winners FIRST (TakeOrderedAndProject on the cheap hash
    # key), normalize only those 64 rows afterwards (two-phase norm, see
    # _normalized)
    sample = (
        emb.select(hk.alias("_hk"), "vec_id", "embedding")
        .orderBy("_hk", "vec_id")
        .limit(k)
    )
    w = Window.orderBy("_hk", "vec_id")
    normed = sample.select(
        "_hk", "vec_id", norm(F.col("embedding")).alias("_n"), "embedding"
    ).select(
        "_hk",
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double") / F.col("_n")).alias(
            "cw"
        ),
    )
    return normed.select(
        F.row_number().over(w).alias("code"),
        *[
            F.slice("cw", m * PQ_SUBDIM + 1, PQ_SUBDIM).alias(f"sw{m}")
            for m in range(PQ_M)
        ],
    )


def pq_encode(nv: DataFrame, cbw: DataFrame) -> DataFrame:
    """Quantize every normalized vector: per subspace, the code of the
    L2-nearest codeword (ties to the smallest code).  One corpus scan
    against the broadcast codebook, one map-side-combined aggregation —
    O(n*k) work, no shuffle beyond the final groupBy on vec_id.  Returns
    (vec_id, c0..c{PQ_M-1})."""
    j = nv.crossJoin(F.broadcast(cbw))
    # (distance, code) folded into one exact int64 composite d*128 + code
    # (codes are 1..PQ_K <= 64 < 128, so lexicographic order is preserved
    # and min() + decode replaces 8 min_by(struct) aggregates — the
    # struct form generated ~3x the codegen and dominated training time)
    dists = j.select(
        "vec_id",
        *[
            (
                fxp_l2_sub(F.col("nv"), F.col(f"sw{m}"), m) * 128 + F.col("code")
            ).alias(f"d{m}")
            for m in range(PQ_M)
        ],
    )
    agg = dists.groupBy("vec_id").agg(
        *[F.min(f"d{m}").alias(f"d{m}") for m in range(PQ_M)]
    )
    return agg.select(
        "vec_id",
        *[(F.col(f"d{m}") % 128).cast("int").alias(f"c{m}") for m in range(PQ_M)],
    )


def pq_train(nv: DataFrame, cbw: DataFrame) -> DataFrame:
    """One per-subspace Lloyd refinement of the PQ codebook: assign every
    subvector to its nearest codeword, replace each codeword with the
    exact fixed-point mean of its members (empty codewords keep their
    init value, so codes stay DENSE 1..k and ADC tables stay indexable).

    Sampled codewords land where single vectors happen to fall;
    per-subspace means drop quantization error the way full k-means does
    for IVF — tests pin the recall improvement.  Cost: one extra encode
    pass + PQ_M tiny (k x PQ_SUBDIM) aggregations, all map-side
    combined; iterating = re-calling this function."""
    # Train on a deterministic 20% hash-gated sample, the standard PQ
    # practice (FAISS trains codebooks on a bounded sample): training cost
    # becomes corpus-size-INDEPENDENT in proportion terms, and the gate is
    # a pure pushdown-friendly filter — reproducible on any engine, no RNG
    tr = nv.where(hash48(F.col("vec_id").cast("string")) % 5 < 1)
    codes = pq_encode(tr, cbw)
    joined = tr.join(codes, "vec_id")
    # ONE posexplode pass computes every subspace's means together: each
    # element at 0-based position pos0 belongs to subspace m = pos0 /
    # PQ_SUBDIM and to that subspace's assigned code — a per-m loop of
    # joins would replicate the encode subtree PQ_M times in the plan
    # (measured: the lazy form re-scanned the corpus per subspace)
    msub = F.floor(F.col("pos0") / PQ_SUBDIM).cast("int")
    code_arr = F.array(*[F.col(f"c{m}") for m in range(PQ_M)])
    el = joined.select(
        *[f"c{m}" for m in range(PQ_M)],
        F.posexplode("nv").alias("pos0", "v"),
    ).select(
        msub.alias("m"),
        F.element_at(code_arr, msub + 1).alias("code"),
        (F.col("pos0") % PQ_SUBDIM).alias("subpos"),
        "v",
    )
    mean = el.groupBy("m", "code", "subpos").agg(
        (
            F.sum(F.floor(F.col("v") * MEAN_SCALE + F.lit(0.5))).cast("double")
            / MEAN_SCALE
            / F.count("*")
        ).alias("cv")
    )

    def _rw(m: int) -> Column:
        # per-code refined subvector for subspace m (sorted by subpos);
        # subspace assignments are INDEPENDENT, so a code may have members
        # in one subspace and none in another — the filtered array is then
        # empty and must fall back to the init codeword below
        return F.transform(
            F.filter(
                F.array_sort(F.collect_list(F.struct("m", "subpos", "cv"))),
                lambda s: s.getField("m") == F.lit(m),
            ),
            lambda s: s.getField("cv"),
        ).alias(f"rw{m}")

    rw = mean.groupBy("code").agg(*[_rw(m) for m in range(PQ_M)])
    refined = [
        F.when(F.size(F.col(f"rw{m}")) > 0, F.col(f"rw{m}"))
        .otherwise(F.col(f"sw{m}"))
        .alias(f"sw{m}")
        for m in range(PQ_M)
    ]
    return cbw.join(rw, "code", "left").select("code", *refined)


def pq_adc_topk(emb: DataFrame, k: int = 5, train: bool = True) -> DataFrame:
    """PQ-ADC approximate top-k for the standard query set (vec_id < 3).

    Plan: normalize once (unit-vector L2 ranks identically to cosine);
    train the codebook (one Lloyd round per subspace); encode the corpus
    (codes are WIDE-table small — PQ_M small ints per vector); per query,
    precompute the PQ_M x PQ_K distance lookup tables (a broadcast of
    queries x k rows); score every candidate with PQ_M ``element_at``
    lookups + integer adds — zero float math per candidate, fully inside
    codegen.  ``adc_dist`` is an exact int64 (deterministic
    cross-engine).  At 100 TB the scored relation reads only the 8-code
    table, not the embeddings — the I/O win PQ exists for; pair with IVF
    coarse clustering (ivf_assign) to also shrink the candidate set, and
    exact-rerank the ADC shortlist where final ordering matters."""
    spark = emb.sparkSession

    def _materialize(df: DataFrame) -> DataFrame:
        # codebooks are PQ_K rows by construction (bounded, corpus-size-
        # independent); as lazy plans their corpus-scan subtrees would be
        # RE-EXECUTED by every consumer (measured 108 parquet scans / 23k
        # plan nodes in the unmaterialized pq_search plan).  Collected
        # rows re-created as a literal DataFrame keep every double
        # bit-identical and run each corpus pass exactly once.
        return spark.createDataFrame(df.collect(), df.schema)

    nv = _normalized(emb)
    cbw = _materialize(pq_codebook(emb))
    if train:
        cbw = _materialize(pq_train(nv, cbw))
    codes = pq_encode(nv, cbw)
    q = nv.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("nv").alias("qv")
    )
    qd = q.crossJoin(F.broadcast(cbw)).select(
        "query_id",
        "code",
        *[
            fxp_l2_sub(F.col("qv"), F.col(f"sw{m}"), m).alias(f"d{m}")
            for m in range(PQ_M)
        ],
    )
    def _lut(m: int) -> Column:
        # transform's lambda must be unary (a binary lambda receives the
        # array index as its second arg); the f-string binds m eagerly
        # because transform builds the expression at call time
        return F.transform(
            F.array_sort(F.collect_list(F.struct("code", f"d{m}"))),
            lambda s: s.getField(f"d{m}"),
        ).alias(f"l{m}")

    luts = qd.groupBy("query_id").agg(*[_lut(m) for m in range(PQ_M)])
    scored = codes.crossJoin(F.broadcast(luts)).where(
        F.col("vec_id") != F.col("query_id")
    )
    dist = None
    for m in range(PQ_M):
        t = F.element_at(F.col(f"l{m}"), F.col(f"c{m}"))
        dist = t if dist is None else dist + t
    w = Window.partitionBy("query_id").orderBy(F.col("adc_dist"), "vec_id")
    return (
        scored.select("query_id", "vec_id", dist.alias("adc_dist"))
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
    )


def pq_search(
    emb: DataFrame, k: int = 5, shortlist: int = 50, train: bool = True
) -> DataFrame:
    """Production PQ search shape: ADC shortlist (integer lookups over the
    compressed code table) -> exact cosine rerank of only the shortlist
    against the original vectors -> top-k.  The expensive exact math runs
    on ``shortlist`` candidates per query instead of the corpus — at 100
    TB the corpus pass touches 8-byte codes only, and the rerank is a
    (queries x shortlist)-row join back to the embedding table.  Recall =
    P(true top-k inside the ADC shortlist); tests pin the trained-codebook
    recall floor and the improvement over the untrained sample."""
    sl = pq_adc_topk(emb, k=shortlist, train=train).select("query_id", "vec_id")
    base = emb.select("vec_id", "embedding").withColumn(
        "_nrm", norm(F.col("embedding"))
    )
    q = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    ).withColumn("_qnrm", norm(F.col("qv")))
    j = sl.join(base, "vec_id").join(F.broadcast(q), "query_id")
    sim = (fxp_dot(F.col("embedding"), F.col("qv")).cast("double") / FXP_SCALE) / (
        F.col("_nrm") * F.col("_qnrm")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "vec_id")
    return (
        j.select("query_id", "vec_id", sim.alias("cos_sim"))
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
    )


def ivf_pq_topk(emb: DataFrame, k: int = 5, train: bool = True) -> DataFrame:
    """IVF-PQ (the FAISS IVFPQ architecture, Jegou TPAMI'11 §V): coarse
    IVF clustering bounds WHICH candidates are scored (the query's
    assigned cluster only, nprobe=1), product quantization bounds WHAT is
    read per candidate (8 one-byte codes + an integer table lookup).  The
    two compressions multiply: at 100 TB the scan touches one cluster's
    code table — candidates O(n/K), bytes O(8) each, zero float ops.

    Plan: broadcast coarse codebook -> one corpus assignment pass;
    trained PQ codebook -> one corpus encode pass; the scored relation is
    an equi-join on the cluster id (hash shuffle of 8-code rows), never a
    cross join.  Exact-rerank the survivors where final ordering matters
    (compose with the pq_search rerank shape)."""
    spark = emb.sparkSession
    cents = spark.createDataFrame(
        ivf_centroids(emb).collect(), ivf_centroids(emb).schema
    )
    clusters = assign_to_centroids(emb, cents).select("vec_id", "cluster")

    def _materialize(df: DataFrame) -> DataFrame:
        return spark.createDataFrame(df.collect(), df.schema)

    nv = _normalized(emb)
    cbw = _materialize(pq_codebook(emb))
    if train:
        cbw = _materialize(pq_train(nv, cbw))
    codes = pq_encode(nv, cbw).join(clusters, "vec_id")

    q = nv.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("nv").alias("qv")
    )
    qd = q.crossJoin(F.broadcast(cbw)).select(
        "query_id",
        "code",
        *[
            fxp_l2_sub(F.col("qv"), F.col(f"sw{m}"), m).alias(f"d{m}")
            for m in range(PQ_M)
        ],
    )

    def _lut(m: int) -> Column:
        return F.transform(
            F.array_sort(F.collect_list(F.struct("code", f"d{m}"))),
            lambda s: s.getField(f"d{m}"),
        ).alias(f"l{m}")

    luts = qd.groupBy("query_id").agg(*[_lut(m) for m in range(PQ_M)])
    qprobe = luts.join(
        clusters.where(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("query_id"), F.col("cluster").alias("qcluster")
        ),
        "query_id",
    )
    j = codes.join(
        F.broadcast(qprobe),
        (F.col("cluster") == F.col("qcluster"))
        & (F.col("vec_id") != F.col("query_id")),
    )
    dist = None
    for m in range(PQ_M):
        t = F.element_at(F.col(f"l{m}"), F.col(f"c{m}"))
        dist = t if dist is None else dist + t
    w = Window.partitionBy("query_id").orderBy(F.col("adc_dist"), "vec_id")
    return (
        j.select("query_id", "vec_id", dist.alias("adc_dist"))
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
    )
