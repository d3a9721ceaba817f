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
from findb_spark.session import local_relation_df

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


def fxp_dot_expr(a: str, b: str, dim: int = DIM) -> Column:
    """:func:`fxp_dot` over plain column NAMES, built as one
    server-side-parsed SQL string: the parser produces the identical
    Floor/Multiply/Add expression tree (integer adds are associative, so
    the inline sum is bit-equal to the balanced tree), but construction
    is ONE py4j call instead of ~400 — the Column-DSL form costs ~0.7s
    of driver round-trip chatter per use, which dominated plan-build
    time for every vector query."""
    terms = [
        f"FLOOR((CAST(element_at({a}, {i}) AS DOUBLE) * "
        f"CAST(element_at({b}, {i}) AS DOUBLE)) * {FXP_SCALE} + 0.5D)"
        for i in range(1, dim + 1)
    ]
    return F.expr("CAST((" + " + ".join(terms) + ") AS BIGINT)")


def norm_expr(v: str, dim: int = DIM) -> Column:
    """:func:`norm` over a plain column NAME (see :func:`fxp_dot_expr`
    for why the string form exists).  Same ops: sqrt of the exact
    fixed-point self-dot over FXP_SCALE."""
    terms = [
        f"FLOOR((CAST(element_at({v}, {i}) AS DOUBLE) * "
        f"CAST(element_at({v}, {i}) AS DOUBLE)) * {FXP_SCALE} + 0.5D)"
        for i in range(1, dim + 1)
    ]
    return F.expr(
        "SQRT(CAST(CAST(("
        + " + ".join(terms)
        + f") AS BIGINT) AS DOUBLE) / {FXP_SCALE})"
    )


def cosine(a: Column, b: Column) -> Column:
    dot = fxp_dot(a, b).cast("double") / FXP_SCALE
    na = fxp_dot(a, a).cast("double") / FXP_SCALE
    nb = fxp_dot(b, b).cast("double") / FXP_SCALE
    return dot / (F.sqrt(na) * F.sqrt(nb))


def cosine_expr(a: str, b: str, dim: int = DIM) -> Column:
    """:func:`cosine` over plain column NAMES (see :func:`fxp_dot_expr`):
    the identical dot/(sqrt*sqrt) float-op tree, one py4j call."""
    return (fxp_dot_expr(a, b, dim).cast("double") / FXP_SCALE) / (
        F.sqrt(fxp_dot_expr(a, a, dim).cast("double") / FXP_SCALE)
        * F.sqrt(fxp_dot_expr(b, b, dim).cast("double") / FXP_SCALE)
    )


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
    only the cross-pair dot product is evaluated per pair.

    (Scan-parallelism widening of the corpus side was measured and
    REJECTED round 13: at bench scale it bought ~0.2 s of wall but cost
    ~0.6 CPU-s + GC churn in per-task fixed overhead — see
    OPTIMIZATION_r13.md "widening experiment".)"""
    corpus = emb.withColumn("_nrm", norm_expr("embedding"))
    q = query.withColumn("_qnrm", norm_expr("qv"))
    j = corpus.crossJoin(F.broadcast(q))
    if exclude_self:
        j = j.where(F.col("vec_id") != F.col("query_id"))
    sim = (fxp_dot_expr("embedding", "qv").cast("double") / FXP_SCALE) / (
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
    fixed-point projection onto plane j.

    KERNEL NOTE (measured round 6): unlike :func:`fxp_dot_expr`, the
    unrolled-inline-SQL form LOSES here — 6 planes x 64 terms = 384
    inline terms blow janino's method-size limit, so codegen fails
    (one-time compile attempt ~1.7s) and execution falls back to
    interpreted anyway: 0.5-0.7s warm vs 0.35s for this
    ``aggregate(zip_with(...))`` form, whose per-element work (one
    multiply by a +-1 literal) is too cheap for lambda-dispatch
    overhead to dominate.  The higher-order form stays."""
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
        cosine_expr("embedding", "cvec").alias("_cos"),
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
        cosine_expr("embedding", "cvec").alias("_cos"),
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
        "_nrm", norm_expr("embedding")
    )
    q = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    ).withColumn("_qnrm", norm_expr("qv"))
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
            cosine_expr("qv", "cvec").alias("_ccos"),
        )
        .withColumn("_pr", F.row_number().over(pw))
        .where(F.col("_pr") <= nprobe)
        .select("query_id", "qv", "_qnrm", F.col("cent_id").alias("qcluster"))
    )
    j = assigned.join(
        F.broadcast(probes),
        (F.col("cluster") == F.col("qcluster")) & (F.col("vec_id") != F.col("query_id")),
    )
    sim = (fxp_dot_expr("embedding", "qv").cast("double") / FXP_SCALE) / (
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
    # persist the whole O(n*K) codebook-assignment subtree runs twice.
    #
    # The explicit repartition on the cluster key (round 13, guide §2.5):
    # the self-join FANS OUT — n input rows become ~n^2/K candidate pairs,
    # each paying a 64-term fixed-point dot product — so the stage's cost
    # is CPU per candidate, invisible to AQE's byte-based coalescing,
    # which saw ~1 MB of cached input and collapsed the whole scoring
    # stage to ONE task (measured 896 ms single-task CPU, 31 cores idle).
    # An explicit partition count pins the exchange against coalescing
    # (user-specified numPartitions is never coalesced); the count is the
    # session's shuffle grain — the deployment-scaling dial, nothing
    # local.  Skew MEASURED at a factor-16 octave (SCALE_SEMSKEW_r14.json):
    # at the family's operating point (K grown with n) the scoring
    # stage's straggle is max/p50 = 2.5 (cluster-size variance, bounded);
    # a deliberately injected identical-content mega-cluster (4.6k rows,
    # the K-grows-with-n violation) is ONE join key that neither this
    # repartition nor AQE skew-join can split — straggle 5.8, stage wall
    # pinned to the hot task.  The fallback for that regime is recursive
    # re-clustering of oversized clusters (salting a self-join still
    # computes every hot pair), documented in the artifact.
    # 'auto' guard (round-14 advisor): deployments with AQE auto mode set
    # spark.sql.shuffle.partitions to a non-integer literal; fall back to
    # defaultParallelism rather than raising at plan-build time
    try:
        n_shuf = int(emb.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    except ValueError:
        n_shuf = emb.sparkSession.sparkContext.defaultParallelism
    assigned = (
        ivf_assign(emb, n_cent)
        .withColumn("_nrm", norm_expr("embedding"))
        .repartition(n_shuf, F.col("cluster"))
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
    sim = (fxp_dot_expr("e1", "e2").cast("double") / FXP_SCALE) / (
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
    corpus = lsh_buckets(emb, planes).withColumn("_nrm", norm_expr("embedding"))
    qb = (
        lsh_buckets(query.select(F.col("query_id"), F.col("qv").alias("embedding")), planes)
        .select("query_id", F.col("embedding").alias("qv"), F.col("bucket").alias("qbucket"))
        .withColumn("_qnrm", norm_expr("qv"))
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
    sim = (fxp_dot_expr("embedding", "qv").cast("double") / FXP_SCALE) / (
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
#: hard cap on the driver-collected PQ training sample: the 20% hash gate
#: alone scales with the corpus (measured: 51k collected vectors = 70 s of
#: py4j at a 256k-vector corpus — the whole 128x scale-smoke blowup), while
#: codebook quality saturates at FAISS-scale 10^4-10^5 training points.
#: The cap composes as a deterministic hash-order LIMIT (ORDER BY h,
#: vec_id), mirrored verbatim in the DuckDB oracle; it binds only above
#: ~82k corpus vectors, so certified outputs at every test SF are
#: unchanged.
PQ_TRAIN_CAP = 1 << 14


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
        "vec_id", norm_expr("embedding").alias("_n"), "embedding"
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
    :func:`fxp_dot` to stay inside whole-stage codegen.

    This Column form is the executable SPECIFICATION of the PQ distance
    arithmetic: the literal-codebook SQL kernels (:func:`_enc_code_sql`,
    :func:`_lut_sql`) and the Arrow kernel (:func:`pq_encode_arrow`)
    must produce bit-equal values — tests/test_llm_ops.py pins all three
    against this formulation."""
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
    stays tiny at any scale.

    The distributed half is ONE TakeOrderedAndProject job (the k winners
    under the cheap hash key); normalization and re-indexing of those k
    rows run driver-side in numpy with the identical fixed-point
    arithmetic (``sqrt(sum(floor(x*x*1e12+0.5))/1e12)`` then one IEEE
    divide per element — bit-equal to the Column form, which a
    window+transform plan previously spent 4 jobs / 7 stages on)."""
    import numpy as np

    from pyspark.sql import types as T

    hk = hash48(F.col("vec_id").cast("string"))
    rows = (
        emb.select(hk.alias("_hk"), "vec_id", "embedding")
        .orderBy("_hk", "vec_id")
        .limit(k)
        .collect()
    )
    rows.sort(key=lambda r: (r["_hk"], r["vec_id"]))
    out = []
    for code0, r in enumerate(rows):
        v = np.array(list(r["embedding"]), dtype=np.float64)
        n = float(
            np.sqrt(
                float(
                    np.floor(v * v * float(FXP_SCALE) + 0.5)
                    .astype(np.int64)
                    .sum()
                )
                / float(FXP_SCALE)
            )
        )
        cwv = v / n
        out.append(
            {
                "code": code0 + 1,
                **{
                    f"sw{m}": [
                        float(x)
                        for x in cwv[m * PQ_SUBDIM : (m + 1) * PQ_SUBDIM]
                    ]
                    for m in range(PQ_M)
                },
            }
        )
    schema = T.StructType(
        [T.StructField("code", T.IntegerType(), False)]
        + [
            T.StructField(f"sw{m}", T.ArrayType(T.DoubleType()), False)
            for m in range(PQ_M)
        ]
    )
    # LocalRelation, not a Python-RDD plan (round 13): every evaluation
    # of a createDataFrame(list) relation re-runs pickled slices through
    # Python workers — see session.local_relation_df
    return local_relation_df(emb.sparkSession, out, schema)


def _cb_lists(cbw: DataFrame | list) -> list[list[list[float]]]:
    """Collect a codebook relation (bounded at PQ_K rows by construction)
    into per-subspace codeword lists ordered by dense code 1..k —
    ``result[m][code-1]`` is subspace ``m``'s codeword."""
    rows = cbw.collect() if isinstance(cbw, DataFrame) else list(cbw)
    rows.sort(key=lambda r: r["code"])
    return [[list(r[f"sw{m}"]) for r in rows] for m in range(PQ_M)]


def _cb_onerow(spark, cw: list[list[list[float]]]) -> DataFrame:
    """The whole codebook as ONE broadcastable row holding a
    ``_cb[m][code][i]`` nested array (~PQ_M*PQ_K*PQ_SUBDIM doubles =
    32 KB).  Joining this single row in (BroadcastNestedLoopJoin of a
    1-row build side — no shuffle of the probe side) lets the encode /
    ADC-table expressions reference the codewords as a plain column.
    Doubles travel as binary values (py4j -> java.lang.Double), so
    codewords stay bit-identical to the collected training output.
    (Embedding them as SQL literal text instead costs ~4600 expression
    nodes per subspace that the analyzer re-walks on every Dataset
    construction — measured ~5s of pure driver latency per query.)"""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField(
                "_cb",
                T.ArrayType(T.ArrayType(T.ArrayType(T.DoubleType()))),
                False,
            )
        ]
    )
    return local_relation_df(spark, [(cw,)], schema)


def _fxp_l2_terms_sql(m: int, col: str) -> str:
    """The fixed-point squared-L2 sum of :func:`fxp_l2_sub` as inline SQL
    with compile-time element indices — no inner ``aggregate(sequence)``
    fold (its per-element array allocation + fold machinery is ~2-3x the
    arithmetic itself when interpreted).  Integer addition is
    associative, so the inline left-to-right sum is bit-equal to both the
    fold and the Column form's balanced tree.  ``cw`` is the lambda var
    bound to one codeword by the enclosing ``transform``."""
    base = m * PQ_SUBDIM
    terms = []
    for i in range(1, PQ_SUBDIM + 1):
        d = f"(element_at({col}, {base + i}) - element_at(cw, {i}))"
        terms.append(f"FLOOR(({d} * {d}) * {FXP_SCALE} + 0.5D)")
    return "(" + " + ".join(terms) + ")"


def _enc_code_sql(m: int, col: str = "nv") -> str:
    """SQL for subspace ``m``'s code against the joined ``_cb`` codebook
    column: min over the codeword array of the composite
    ``fxp_dist * 128 + code`` (identical arithmetic and tie-break —
    smallest code on equal distance — as the fixed-point crossJoin+min
    formulation this replaced; FLOOR(double) is BIGINT, the inline
    integer adds are associative, so values are bit-equal)."""
    comp = (
        f"array_min(transform(element_at(_cb, {m + 1}), "
        f"(cw, c0) -> {_fxp_l2_terms_sql(m, col)} * 128 + c0 + 1))"
    )
    return f"CAST({comp} % 128 AS INT)"


def _lut_sql(m: int, col: str = "qv") -> str:
    """SQL for a query's subspace-``m`` ADC table against the joined
    ``_cb`` codebook column: fixed-point distance to each of the k
    codewords, array-ordered by code 1..k (the order the scoring
    ``element_at(l{m}, c{m})`` lookups assume)."""
    return (
        f"transform(element_at(_cb, {m + 1}), "
        f"cw -> {_fxp_l2_terms_sql(m, col)})"
    )


def _luts_driver(
    q_rows: list, cw: list[list[list[float]]]
) -> list[tuple]:
    """Driver-side twin of the :func:`_lut_sql` projection: per RAW query
    row (vec_id, embedding), the PQ_M ADC tables — each an array of the
    fixed-point distances to the k codewords, ordered by code 1..k.

    Bit-equality contract (same as the pinned Arrow encode kernel, which
    runs this exact op sequence): the query vector is unit-normalized
    with the exact int64 self-dot (``floor(x*x*FXP_SCALE + 0.5)`` summed
    in int64 — order-free), one IEEE sqrt, one IEEE divide per element —
    identical to what ``norm_expr``/``_normalized`` computes JVM-side
    within the 2^53 bound documented at :func:`pq_train`; each table
    entry is ``sum_i floor((q_i - cw_i)^2 * FXP_SCALE + 0.5)`` with the
    floor terms accumulated in int64 (associative, so numpy's sum order
    is bit-equal to the JVM's left-to-right inline sum).  np.floor /
    multiply / subtract are the identical IEEE-754 double ops the JVM
    executes, and the resulting entries are pure int64 — nothing float
    re-crosses py4j, so the literal luts relation is bit-identical to
    the Column-form ``crossJoin(_cb) + _lut_sql`` projection it
    replaces (pinned in tests/test_llm_ops.py)."""
    import numpy as np

    cb = np.array(cw, dtype=np.float64)  # (PQ_M, PQ_K, PQ_SUBDIM)
    out = []
    for r in sorted(q_rows, key=lambda r: r["vec_id"]):
        v = np.asarray(r["embedding"], dtype=np.float64)
        sq = (
            np.floor(v * v * float(FXP_SCALE) + 0.5)
            .astype(np.int64)
            .sum()
        )
        v = v / np.sqrt(float(sq) / float(FXP_SCALE))
        luts = []
        for m in range(PQ_M):
            seg = v[m * PQ_SUBDIM : (m + 1) * PQ_SUBDIM]
            d = seg[None, :] - cb[m]  # (K, SUBDIM)
            terms = np.floor(d * d * float(FXP_SCALE) + 0.5).astype(np.int64)
            luts.append([int(x) for x in terms.sum(axis=1)])
        out.append((int(r["vec_id"]), *luts))
    return out


def pq_encode(nv: DataFrame, cbw: DataFrame | list) -> DataFrame:
    """Quantize every normalized vector: per subspace, the code of the
    L2-nearest codeword (ties to the smallest code).  Returns
    (vec_id, c0..c{PQ_M-1}).

    The codebook (bounded at PQ_K rows by construction) rides along as a
    broadcast ONE-ROW nested array (:func:`_cb_onerow`), so the corpus
    pass is one scan + a 1-row broadcast join + a projection — zero
    shuffles of the corpus, zero row fan-out.  The previous formulation
    (crossJoin against the 64-row broadcast codebook + 8-way min
    aggregate) shuffled a 64x fan-out and cost ~8 AQE jobs of pure
    scheduling overhead per encode; this form is the plan you want at
    100 TB: encode streams at scan speed and writes one row per vector.
    Distances fold in one fixed-point composite ``dist*128 + code``
    (codes 1..64 < 128 preserve lexicographic order), exactly as before
    — values are bit-identical.  For extreme per-row throughput the same
    narrow shape can swap this HOF kernel for the vectorized Arrow
    kernel (:func:`pq_encode_arrow`), pinned bit-equal by test."""
    cw = _cb_lists(cbw)
    cbdf = _cb_onerow(nv.sparkSession, cw)
    return nv.crossJoin(F.broadcast(cbdf)).select(
        "vec_id",
        *[F.expr(_enc_code_sql(m)).alias(f"c{m}") for m in range(PQ_M)],
    )


def pq_encode_arrow(
    nv: DataFrame, cbw: DataFrame | list, normalize: bool = False
) -> DataFrame:
    """Vectorized twin of :func:`pq_encode`: same narrow one-scan shape,
    kernel swapped for numpy over Arrow batches (``mapInPandas``), the
    SAME fixed-point composite (``floor(d*d*1e12 + 0.5)`` summed in
    int64, ``*128 + code`` min) — np.floor/multiply are the identical
    IEEE-754 double ops the JVM executes, so codes are bit-equal (pinned
    by tests/test_llm_ops.py).  Distances are computed per subspace
    ((n, K, SUBDIM) slices) rather than as one (n, M, K, SUBDIM) tensor:
    the elementwise fixed-point floor rules out a BLAS matmul, so memory
    locality is what decides throughput, and the 4-D form thrashed cache
    badly enough to lose to the JVM kernel by 10x at 128k vectors.

    NOTE ON KERNEL CHOICE (re-measured round 6, local[32], forced
    evaluation): this Arrow kernel beats the inline-SQL kernel at the
    benched 2k-vector scale (2.4s vs 4.9s on identical pre-normalized
    input; the SQL kernel's transform() lambdas are interpreted per
    row), while the SQL kernel wins at 128k vectors where memory
    bandwidth amortizes its constants (playbook numbers 11s vs 17s) —
    so "arrow" is the default and "sql" the documented large-corpus
    dial.

    ``normalize=True`` takes RAW ``embedding`` input and unit-normalizes
    inside the kernel with the identical fxp arithmetic as the Column
    form (``sqrt(sum(floor(x*x*1e12+0.5))/1e12)`` then one IEEE divide
    per element — the same numpy sequence :func:`pq_codebook` runs
    driver-side, so codes stay bit-equal; pinned by test).  This skips
    the JVM ``transform()`` normalization lambda entirely — interpreted
    per element, it costs more than the whole encode at bench scale
    (measured 1.6s for 2000x64 vs 0.9s for this full kernel with
    normalization fused) — and is the corpus path :func:`pq_adc_topk`
    uses."""
    import numpy as np
    import pandas as pd

    cw = _cb_lists(cbw)
    cb = np.array(cw, dtype=np.float64)  # (PQ_M, PQ_K, PQ_SUBDIM)
    out_schema = "vec_id bigint, " + ", ".join(f"c{m} int" for m in range(PQ_M))
    in_col = "embedding" if normalize else "nv"

    def encode(batches):
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            v = np.stack(
                [np.asarray(x, dtype=np.float64) for x in pdf[in_col]]
            )  # (n, DIM)
            if normalize:
                q = (
                    np.floor(v * v * float(FXP_SCALE) + 0.5)
                    .astype(np.int64)
                    .sum(axis=1)
                )
                nrm = np.sqrt(q.astype(np.float64) / float(FXP_SCALE))
                v = v / nrm[:, None]
            codes = np.empty((n, PQ_M), dtype=np.int32)
            kcode = np.arange(PQ_K, dtype=np.int64) + 1
            # 256-row blocks (round 13): the full (n, K, SUBDIM) distance
            # tensor spills L2 and its ~1 MB temporaries dominate the
            # kernel — blocking the row axis keeps every intermediate
            # cache-resident (measured 386 -> 70 ms at n=2000 driver-side,
            # 1.6x warm).  Bit-equality unchanged: the per-element
            # floor/multiply/subtract ops and the per-row int64 sums are
            # identical regardless of block boundaries (pinned by
            # test_pq_adc_kernels_agree_end_to_end and the oracle gate).
            for m in range(PQ_M):
                seg = v[:, m * PQ_SUBDIM : (m + 1) * PQ_SUBDIM]
                for s in range(0, n, 256):
                    d = (
                        seg[s : s + 256, None, :] - cb[m][None, :, :]
                    )  # (<=256, K, SUBDIM)
                    terms = np.floor(
                        d * d * float(FXP_SCALE) + 0.5
                    ).astype(np.int64)
                    comp = terms.sum(axis=2) * 128 + kcode
                    codes[s : s + 256, m] = (comp.min(axis=1) % 128).astype(
                        np.int32
                    )
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    **{f"c{m}": codes[:, m] for m in range(PQ_M)},
                }
            )

    return nv.mapInPandas(encode, schema=out_schema)


def pq_train(nv: DataFrame, cbw: DataFrame | list) -> DataFrame:
    """One per-subspace Lloyd refinement of the PQ codebook: assign every
    sampled subvector to its nearest codeword, replace each codeword with
    the exact fixed-point mean of its members (empty codewords keep their
    init value, so codes stay DENSE 1..k and ADC tables stay indexable).

    ARCHITECTURE (the FAISS split): codebook training runs DRIVER-SIDE in
    numpy over the collected training sample; only the corpus passes
    (encode, ADC scoring) are distributed.  The sample is a deterministic
    20% hash gate — a pushdown-friendly filter, no RNG — and is bounded
    by the same contract that bounds every other driver collect here
    (FAISS trains on ~10^4-10^5 vectors regardless of corpus size; at
    production scale compose the gate with a hash-order LIMIT, mirrored
    in the oracle, to cap it).  The previous all-DataFrame formulation
    spent ~5s of pure job-scheduling overhead per round on
    kilobyte-scale aggregations; numpy does the same exact integer
    arithmetic in microseconds and the result is BIT-EQUAL:
    ``floor(v*MEAN_SCALE+0.5)`` summed in int64, then
    ``(sum/MEAN_SCALE)/count`` in IEEE doubles — the identical op
    sequence the DuckDB oracle executes (queries/vector_queries.py
    ``mu{m}`` CTEs).  Assignment uses the same composite
    ``dist*128+code`` min as :func:`pq_encode`.

    Sampled codewords land where single vectors happen to fall;
    per-subspace means drop quantization error the way full k-means does
    for IVF — tests pin the recall improvement.  Iterating = re-calling
    this function."""
    import numpy as np

    from pyspark.sql import types as T

    spark = nv.sparkSession
    if isinstance(cbw, DataFrame):
        cb_schema, cb_rows = cbw.schema, cbw.collect()
    else:
        # explicit schema (same StructType as pq_codebook builds) — a None
        # schema would fall back to deprecated dict-based inference and
        # type `code` as bigint instead of int
        cb_schema = T.StructType(
            [T.StructField("code", T.IntegerType(), False)]
            + [
                T.StructField(f"sw{m}", T.ArrayType(T.DoubleType()), False)
                for m in range(PQ_M)
            ]
        )
        cb_rows = list(cbw)
    cb_rows.sort(key=lambda r: r["code"])
    cb = np.array(
        [[list(r[f"sw{m}"]) for r in cb_rows] for m in range(PQ_M)],
        dtype=np.float64,
    )  # (M, K, SUBDIM)
    # 20% hash gate CAPPED by deterministic hash-order LIMIT (the FAISS
    # contract: training saturates at ~10^4-10^5 points, so the collect is
    # bounded at any corpus size). toPandas() rides the Arrow channel —
    # list<double> columns arrive as numpy arrays with exact bits, where
    # the Row-based collect() built millions of Python float objects
    # (measured 70 s at a 51k-row sample).
    #
    # Input may be RAW (column ``embedding``) or pre-normalized (column
    # ``nv``). Prefer raw: sampling the raw column keeps the 64-term
    # fixed-point normalize expression out of the sample job entirely
    # (measured ~2 s of py4j plan construction + ~2 s of codegen for a
    # 435-row sample) and normalizes the BOUNDED sample driver-side with
    # the identical numpy sequence :func:`pq_codebook` runs — exact int
    # self-dot, one IEEE sqrt, one divide per element — so codewords are
    # bit-equal either way (same contract the encode kernel's
    # ``normalize=True`` path is pinned under).
    # Bit-equality bound for the raw branch below (round-8 advisor note):
    # the numpy path sums per-element FLOOR terms in int64, while
    # norm_expr sums them as float64 and casts the total to BIGINT once.
    # The two agree exactly while every partial sum stays below 2^53
    # (where float64 addition is exact and order-free): terms are
    # x_i^2 * FXP_SCALE, so the self-dot bound is |x|^2 * DIM * 1e12 <
    # 2^53, i.e. per-element |x| <= ~11.8 at DIM=64.  The embeddings
    # table stores O(1)-magnitude components (|x| < 2), three orders
    # inside the bound — and no summation-order fix could extend it:
    # beyond 2^53 numpy's pairwise float64 sum and the JVM's
    # left-associated chain diverge from EACH OTHER, so int64 (exact,
    # order-free) is the more defensible side to keep.
    raw = "nv" not in nv.columns
    col = "embedding" if raw else "nv"
    hk = hash48(F.col("vec_id").cast("string"))
    sample_pd = (
        nv.where(hk % 5 < 1)
        .orderBy(hk, "vec_id")
        .limit(PQ_TRAIN_CAP)
        .select(col)
        .toPandas()
    )
    new_cb = cb.copy()
    if len(sample_pd):
        v = np.array([np.asarray(x, dtype=np.float64) for x in sample_pd[col]])
        if raw:
            sq = (
                np.floor(v * v * float(FXP_SCALE) + 0.5)
                .astype(np.int64)
                .sum(axis=1)
            )
            norms = np.sqrt(sq.astype(np.float64) / float(FXP_SCALE))
            v = v / norms[:, None]
        n = len(v)
        sub = v.reshape(n, PQ_M, 1, PQ_SUBDIM)
        d = sub - cb[None, :, :, :]
        terms = np.floor(d * d * float(FXP_SCALE) + 0.5).astype(np.int64)
        comp = terms.sum(axis=3) * 128 + (np.arange(PQ_K, dtype=np.int64) + 1)
        assign = (comp.min(axis=2) % 128) - 1  # (n, M) 0-based code index
        vs = np.floor(v * float(MEAN_SCALE) + 0.5).astype(np.int64)  # (n, DIM)
        for m in range(PQ_M):
            seg = vs[:, m * PQ_SUBDIM : (m + 1) * PQ_SUBDIM]
            for c in range(PQ_K):
                mask = assign[:, m] == c
                cnt = int(mask.sum())
                if cnt:
                    s = seg[mask].sum(axis=0, dtype=np.int64)
                    new_cb[m, c] = s.astype(np.float64) / float(MEAN_SCALE) / cnt
    out = [
        {
            "code": r["code"],
            **{
                f"sw{m}": [float(x) for x in new_cb[m, i]]
                for m in range(PQ_M)
            },
        }
        for i, r in enumerate(cb_rows)
    ]
    return local_relation_df(spark, out, cb_schema)


def pq_adc_topk(
    emb: DataFrame,
    k: int = 5,
    train: bool = True,
    kernel: str = "arrow",
    codebook: list | None = None,
    q_rows: list | None = None,
) -> DataFrame:
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
    exact-rerank the ADC shortlist where final ordering matters.

    ``kernel`` picks the corpus-encode implementation — both pinned
    BIT-EQUAL by tests/test_llm_ops.py and re-measured this round with
    FORCED evaluation (a bare ``count()`` over the SQL kernel lets
    Catalyst prune the encode expressions away entirely — an earlier
    comparison fell into exactly that trap): "arrow" (default,
    :func:`pq_encode_arrow`) wins at the benched corpus scale (1.9s vs
    4.2s warm at 2k vectors — the SQL kernel's transform() lambdas are
    interpreted per row, ~8M floor ops here); "sql" (:func:`pq_encode`)
    wins once the corpus amortizes the ~2s Python-worker/Arrow constant
    AND memory bandwidth saturates the numpy side (11s vs 17s at 128k
    vectors, 32 concurrent tasks).  Neither is orders-of-magnitude:
    both execute the same ~4k fixed-point ops/vector, interpreted
    JVM-side or vectorized-but-memory-bound Python-side.  Pick per
    deployment; the narrow one-scan plan shape is identical."""
    # codebooks are PQ_K rows by construction (bounded, corpus-size-
    # independent): collected ONCE here (two tiny jobs — init sample +
    # one Lloyd round) and re-shipped as the 1-row broadcast _cb array.
    # As lazy plans their corpus-scan subtrees would be RE-EXECUTED by
    # every consumer (measured 108 parquet scans / 23k plan nodes in the
    # unmaterialized pq_search plan); binary py4j doubles keep every
    # codeword bit-identical.  ``codebook`` short-circuits training with
    # already-trained rows (the deployed shape: the index is built once
    # and amortizes across every query against the same corpus — see
    # queries/vector_queries.py's per-corpus memo), making this function
    # fully lazy: zero eager jobs, one action end-to-end.
    nv = _normalized(emb)
    if codebook is not None:
        cb_rows = list(codebook)
    else:
        cb_rows = pq_codebook(emb).collect()
        if train:
            # raw input: pq_train normalizes its bounded sample
            # driver-side (bit-equal), keeping the 64-term normalize
            # expression out of the training job
            cb_rows = pq_train(emb, cb_rows).collect()
    cw = _cb_lists(cb_rows)
    if kernel == "arrow":
        # raw-embedding input, normalization fused into the numpy kernel
        # (bit-equal, pinned) — skips the interpreted transform() lambda
        codes = pq_encode_arrow(
            emb.select("vec_id", "embedding"), cb_rows, normalize=True
        )
    else:
        codes = pq_encode(nv, cb_rows)
    # Round-13: the per-query ADC tables are computed DRIVER-SIDE (guide
    # §1.2 — the distributed form was two serial BroadcastNestedLoopJoin
    # stages whose only input is queries x codebook, both bounded by
    # construction: the query set is a handful of rows, the codebook
    # PQ_M x PQ_K codewords).  One tiny pushdown-filtered collect of the
    # raw query vectors + the SAME numpy op sequence the pinned Arrow
    # encode kernel uses (np.floor/multiply are the identical IEEE-754
    # double ops the JVM executes) yields LUTs whose entries are pure
    # int64 — nothing float ever re-crosses py4j, so the literal luts
    # relation is bit-identical to the old in-plan projection (pinned in
    # tests/test_llm_ops.py against the Column-form specification).
    # ``q_rows`` lets a composing caller (pq_search) collect the bounded
    # query set ONCE and reuse it for both the LUTs and its own rerank
    # side (round 14 — one fewer scan + broadcast-build job per run).
    if q_rows is None:
        q_rows = (
            emb.where(F.col("vec_id") < 3).select("vec_id", "embedding").collect()
        )
    luts = local_relation_df(
        emb.sparkSession,
        _luts_driver(q_rows, cw),
        "query_id bigint, "
        + ", ".join(f"l{m} array<bigint>" for m in range(PQ_M)),
    )
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
    emb: DataFrame,
    k: int = 5,
    shortlist: int = 50,
    train: bool = True,
    kernel: str = "arrow",
    codebook: list | None = None,
) -> DataFrame:
    """Production PQ search shape: ADC shortlist (integer lookups over the
    compressed code table) -> exact cosine rerank of only the shortlist
    against the original vectors -> top-k.  The expensive exact math runs
    on ``shortlist`` candidates per query instead of the corpus — at 100
    TB the corpus pass touches 8-byte codes only, and the rerank is a
    (queries x shortlist)-row join back to the embedding table.  Recall =
    P(true top-k inside the ADC shortlist); tests pin the trained-codebook
    recall floor and the improvement over the untrained sample."""
    # Collect the bounded query set ONCE (3 rows by construction) and
    # share it between the ADC LUTs and the rerank's query side (round
    # 14, guide §1.2/§4): the rerank used to re-scan the embedding table
    # for the same 3 rows inside a broadcast build — one whole extra
    # parquet scan + serial broadcast-build job per evaluation.  As a
    # LocalRelation the broadcast builds driver-side with zero tasks.
    # Bit-exactness: array<float> values round-trip exactly through
    # float64 (collect) and back to float32 (Arrow), and _qnrm is
    # computed in-plan over those identical values.
    q_rows = (
        emb.where(F.col("vec_id") < 3).select("vec_id", "embedding").collect()
    )
    sl = pq_adc_topk(
        emb, k=shortlist, train=train, kernel=kernel, codebook=codebook,
        q_rows=q_rows,
    ).select("query_id", "vec_id")
    base = emb.select("vec_id", "embedding").withColumn(
        "_nrm", norm_expr("embedding")
    )
    q = local_relation_df(
        emb.sparkSession,
        [(r["vec_id"], r["embedding"]) for r in q_rows],
        "query_id bigint, qv array<float>",
    ).withColumn("_qnrm", norm_expr("qv"))
    # broadcast the SHORTLIST, not the base table (round 13, guide §3.1):
    # sl is bounded at queries x shortlist rows by construction, while
    # base is the corpus — but sl's size estimate is garbage (it hangs
    # off a window over a broadcast-nested-loop join), so left to itself
    # Catalyst picks the base side whenever the corpus LOOKS small and
    # would shuffle-join (or worse, broadcast the corpus) at scale.  The
    # hint makes the rerank probe a broadcast-hash join against the
    # embedding scan at every corpus size.
    j = F.broadcast(sl).join(base, "vec_id").join(F.broadcast(q), "query_id")
    sim = (fxp_dot_expr("embedding", "qv").cast("double") / FXP_SCALE) / (
        F.col("_nrm") * F.col("_qnrm")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "vec_id")
    return (
        j.select("query_id", "vec_id", sim.alias("cos_sim"))
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
    )


def ivf_pq_topk(
    emb: DataFrame, k: int = 5, train: bool = True, kernel: str = "arrow"
) -> DataFrame:
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
    _c = ivf_centroids(emb)
    cents = local_relation_df(spark, _c.collect(), _c.schema)
    clusters = assign_to_centroids(emb, cents).select("vec_id", "cluster")

    nv = _normalized(emb)
    cb_rows = pq_codebook(emb).collect()
    if train:
        # raw input: sample normalized driver-side (bit-equal)
        cb_rows = pq_train(emb, cb_rows).collect()
    cw = _cb_lists(cb_rows)
    cbdf = _cb_onerow(emb.sparkSession, cw)
    if kernel == "arrow":
        codes = pq_encode_arrow(
            emb.select("vec_id", "embedding"), cb_rows, normalize=True
        ).join(clusters, "vec_id")
    else:
        codes = pq_encode(nv, cb_rows).join(clusters, "vec_id")

    q = nv.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("nv").alias("qv")
    )
    luts = q.crossJoin(F.broadcast(cbdf)).select(
        "query_id",
        *[F.expr(_lut_sql(m, "qv")).alias(f"l{m}") for m in range(PQ_M)],
    )
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


def cluster_silhouette(emb: DataFrame, k: int = IVF_K) -> DataFrame:
    """Per-vector centroid silhouette over the IVF coarse clustering — the
    cluster-quality dial for everything built on ``ivf_assign``
    (IVF/IVF-PQ ANN, SemDeDup semantic dedup): a(i) = cosine distance to
    the assigned centroid, b(i) = distance to the nearest OTHER centroid,
    s(i) = (b - a) / max(a, b)  (Rousseeuw 1987, centroid simplification
    — exact per row, no cross-row float accumulation, so every silhouette
    is a bit-deterministic double cross-engine).

    Scale shape: ONE corpus scan against the broadcast K-row codebook,
    one bounded groupBy per vector collecting the K (cos, centroid)
    pairs into a sorted array and reading its top two — no shuffle of
    pairwise data, no window over the n*K relation.  Low s flags vectors
    on cluster boundaries (ANN recall risk at nprobe=1) or a K that is
    too coarse/fine."""
    cents = ivf_centroids(emb, k)
    j = emb.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        F.struct(
            cosine_expr("embedding", "cvec").alias("_c"),
            (-F.col("cent_id")).alias("_nc"),
        ).alias("sc"),
    )
    top2 = j.groupBy("vec_id").agg(
        F.slice(F.sort_array(F.collect_list("sc"), asc=False), 1, 2).alias("t")
    )
    best = F.col("t")[0]["_c"]
    second = F.col("t")[1]["_c"]
    d_a = F.lit(1.0) - best
    d_b = F.lit(1.0) - second
    sil = F.when(F.greatest(d_a, d_b) == 0, F.lit(0.0)).otherwise(
        (best - second) / F.greatest(d_a, d_b)
    )
    return top2.select(
        "vec_id",
        (-F.col("t")[0]["_nc"]).cast("bigint").alias("cluster"),
        sil.alias("sil"),
    )


def power_iteration_top_dir(
    emb: DataFrame, rounds: int = 3, vq_scale: int = 10_000, w_scale: int = 1_000_000
) -> DataFrame:
    """Dominant principal direction of the (uncentered) embedding Gram
    matrix X'X via power iteration expressed as pure DataFrame algebra —
    matrix-free: each half-step is one keyed join + one groupBy sum over
    the exploded (vec_id, dim, value) relation, never materializing X'X.

    Determinism contract (the property float linear algebra cannot give):
    components are quantized to integers at ``vq_scale`` once; the iterate
    is renormalized to max-norm ``w_scale`` after every half-step using a
    MAX aggregate (exact int) and a single int/int double divide — every
    aggregate input is an int64, so sums are exact and order-independent
    and the result is bit-identical on any IEEE-754 engine regardless of
    partitioning. Start vector = all-ones (positive), which pins the sign.

    Overflow budget: |vq| <= vq_scale, |s_q|,|w| <= w_scale, so the dim
    aggregate sums n_rows * vq_scale * w_scale <= n * 1e10 — int64-safe to
    ~9e8 rows; beyond that switch the sums to DECIMAL(38,0) (same algebra,
    ANSI mode raises rather than wraps so the boundary is loud).

    Returns (dim BIGINT, loading_ppm BIGINT — the unit-L2 loading in 1e6
    fixed point, half-up): the eigenvector estimate,
    rounded to 6dp. rounds=3 resolves the top direction when the spectral
    gap is moderate — the use case is corpus drift / dominant-axis
    profiling, not full PCA.
    """
    spark = emb.sparkSession
    ex = emb.select(
        "vec_id",
        F.posexplode("embedding").alias("pos", "v"),
    ).select(
        "vec_id",
        F.col("pos").cast("bigint").alias("dim"),
        F.floor(F.col("v").cast("double") * vq_scale + F.lit(0.5))
        .cast("bigint")
        .alias("vq"),
    )
    ex = ex.persist()
    dims = ex.select("dim").distinct()
    w = dims.select("dim", F.lit(w_scale).cast("bigint").alias("w"))
    for _ in range(rounds):
        s = (
            ex.join(w, "dim")
            .groupBy("vec_id")
            .agg(F.sum(F.col("vq") * F.col("w")).alias("s_int"))
        )
        ms = s.agg(F.max(F.abs(F.col("s_int"))).alias("m"))
        sq = s.crossJoin(F.broadcast(ms)).select(
            "vec_id",
            F.floor(
                F.col("s_int").cast("double") / F.col("m").cast("double") * w_scale
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("s_q"),
        )
        u = (
            ex.join(sq, "vec_id")
            .groupBy("dim")
            .agg(F.sum(F.col("vq") * F.col("s_q")).alias("u_int"))
        )
        mu = u.agg(F.max(F.abs(F.col("u_int"))).alias("m"))
        w = (
            u.crossJoin(F.broadcast(mu))
            .select(
                "dim",
                F.floor(
                    F.col("u_int").cast("double") / F.col("m").cast("double") * w_scale
                    + F.lit(0.5)
                )
                .cast("bigint")
                .alias("w"),
            )
            .localCheckpoint()  # 64 rows; truncates the per-round lineage
        )
    nrm = w.agg(F.sum(F.col("w") * F.col("w")).alias("n2"))
    # fixed-point ppm loading: divide and sqrt are correctly-rounded IEEE
    # ops (bit-equal cross-engine), then floor(x*1e6+0.5) is exact —
    # unlike ROUND(double, 6), whose final-ulp behavior differs per engine
    out = w.crossJoin(F.broadcast(nrm)).select(
        "dim",
        F.floor(
            F.col("w").cast("double") / F.sqrt(F.col("n2").cast("double"))
            * 1000000
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("loading_ppm"),
    )
    ex.unpersist()
    return out
