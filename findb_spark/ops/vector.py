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

DIM = 64
FXP_SCALE = 10**12
PROJ_SCALE = 10**9
N_PLANES = 6


def fxp_dot(a: Column, b: Column) -> Column:
    """Deterministic fixed-point dot product of two float arrays (scaled by
    FXP_SCALE, exact integer sum)."""
    prod = F.zip_with(
        a,
        b,
        lambda x, y: F.floor(x.cast("double") * y.cast("double") * FXP_SCALE + F.lit(0.5)),
    )
    return F.aggregate(prod, F.lit(0).cast("bigint"), lambda acc, x: acc + x)


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


def cosine_topk(
    emb: DataFrame, query: DataFrame, k: int = 10, exclude_self: bool = True
) -> DataFrame:
    """Exact top-k neighbors of each query vector (broadcast NL join +
    per-query ranking window). ``query``: (query_id, qv array<float>)."""
    j = emb.crossJoin(F.broadcast(query))
    if exclude_self:
        j = j.where(F.col("vec_id") != F.col("query_id"))
    scored = j.select(
        "query_id", "vec_id", cosine(F.col("embedding"), F.col("qv")).alias("cos_sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "vec_id")
    return scored.select(
        "query_id", "vec_id", "cos_sim", F.row_number().over(w).alias("rank")
    ).where(F.col("rank") <= k)


def near_dup_pairs(emb: DataFrame, threshold: float = 0.4) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (exact all-pairs form; at scale
    run it through `lsh_buckets` blocking first)."""
    x = emb.select(F.col("vec_id").alias("v1"), F.col("embedding").alias("e1"))
    y = emb.select(F.col("vec_id").alias("v2"), F.col("embedding").alias("e2"))
    return (
        x.join(y, F.col("v1") < F.col("v2"))
        .select("v1", "v2", cosine(F.col("e1"), F.col("e2")).alias("cos_sim"))
        .where(F.col("cos_sim") >= threshold)
    )


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


def ann_lsh_topk(emb: DataFrame, query: DataFrame, k: int = 5) -> DataFrame:
    """Approximate top-k: probe only the query's LSH bucket, rank by exact
    cosine inside it. ``query``: (query_id, qv) — gets bucketed with the
    same plane matrix."""
    planes = plane_matrix()
    corpus = lsh_buckets(emb, planes)
    qb = lsh_buckets(
        query.select(F.col("query_id"), F.col("qv").alias("embedding")), planes
    ).select("query_id", F.col("embedding").alias("qv"), F.col("bucket").alias("qbucket"))
    j = corpus.join(
        F.broadcast(qb),
        (F.col("bucket") == F.col("qbucket")) & (F.col("vec_id") != F.col("query_id")),
    )
    scored = j.select(
        "query_id", "vec_id", cosine(F.col("embedding"), F.col("qv")).alias("cos_sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "vec_id")
    return scored.select(
        "query_id", "vec_id", "cos_sim", F.row_number().over(w).alias("rank")
    ).where(F.col("rank") <= k)
