"""Distributed global ranking — the bucket+offset pattern behind
``stats_gini_revenue``, generalized (round 12).

A Spark window without PARTITION BY coalesces every row into ONE task
(WindowExec needs the total order in a single partition), so a global
ROW_NUMBER / NTILE / running SUM over an SF-proportional relation (a
per-customer or per-part aggregate) stops scaling exactly when the
dimension does — the classic "works at test scale" bottleneck: correct
at every SF, one straggler task at 10^9 keys.

The fix is range-partitioned ranking: bucket the order key on a coarse
uniform grid (one 1-row min/max aggregate, broadcast), rank/sum WITHIN
each bucket (a parallel window partitioned by bucket), then add each
bucket's exclusive prefix count/sum (a window over the bucket-count
relation — bounded at ``n_buckets`` rows regardless of volume).  Ranks
are EXACTLY those of the global window: the bucket id is monotone in
the order key and rows with equal keys share a bucket, so within-bucket
ordering under the same tiebreakers reproduces the global total order.
(Uniform buckets can be unbalanced under key skew — that degrades
parallelism, never correctness; the worst case, all keys equal, is one
bucket = today's single-partition behavior.)

Preconditions: the order key is numeric and non-null (every call site
ranks a non-null aggregate).  Property-pinned against the real global
window in ``tests/test_rank_ops.py``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

#: default grid width: fine enough that a 1e9-key dimension lands ~1e6
#: rows per bucket, coarse enough that the offsets relation stays tiny
DEFAULT_BUCKETS = 1024

_B = "_gr_bucket"
_OFF = "_gr_off"


def _with_bucket(
    df: DataFrame, key: str, descending: bool, n_buckets: int
) -> DataFrame:
    """Add a bucket id that is monotone in the GLOBAL rank order (bucket
    1 holds the rows that rank first)."""
    bounds = df.agg(
        F.min(key).cast("double").alias("_gr_lo"),
        F.max(key).cast("double").alias("_gr_hi"),
    )
    # Runtime non-null guard (round 13, advisor): a NULL order key would
    # yield a NULL bucket, and the inner join with the offsets relation
    # would then silently DROP the row — a wrong (smaller) result where
    # the builtin window ranks NULLs.  Fail loudly instead; the guard is
    # one per-row branch, negligible next to the window sort.  (Schema
    # nullability is not checked: aggregate outputs are nullable-typed
    # even when every value is non-null, which is every call site here.)
    raw = F.when(
        F.col(key).isNull(),
        F.raise_error(
            F.lit(
                f"ops.rank: order key '{key}' is NULL — the bucket+offset "
                "rank requires a non-null key (the builtin window would "
                "rank NULLs; this op would silently drop them)"
            )
        ).cast("int"),
    ).when(
        F.col("_gr_lo") == F.col("_gr_hi"), F.lit(1)
    ).otherwise(
        # width_bucket yields 1..nb for [lo, hi) and nb+1 at the hi edge;
        # clamp the edge into the last bucket
        F.least(
            F.width_bucket(
                F.col(key).cast("double"),
                F.col("_gr_lo"),
                F.col("_gr_hi"),
                F.lit(n_buckets),
            ),
            F.lit(n_buckets),
        )
    )
    bucket = (F.lit(n_buckets + 1) - raw) if descending else raw
    return df.crossJoin(F.broadcast(bounds)).withColumn(_B, bucket).drop(
        "_gr_lo", "_gr_hi"
    )


def _order(key: str, tiebreaks: list[str], descending: bool) -> list[Column]:
    lead = F.col(key).desc() if descending else F.col(key).asc()
    return [lead, *[F.col(t).asc() for t in tiebreaks]]


def global_row_number(
    df: DataFrame,
    key: str,
    tiebreaks: list[str] | None = None,
    *,
    descending: bool = False,
    n_buckets: int = DEFAULT_BUCKETS,
    out: str = "rn",
) -> DataFrame:
    """``ROW_NUMBER() OVER (ORDER BY key [DESC], tiebreaks...)`` without
    a single-partition window: identical ranks, hash-partitioned work."""
    tiebreaks = tiebreaks or []
    kb = _with_bucket(df, key, descending, n_buckets)
    counts = kb.groupBy(_B).agg(F.count("*").alias("_gr_cnt"))
    wpre = Window.orderBy(_B).rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        _B, F.coalesce(F.sum("_gr_cnt").over(wpre), F.lit(0)).alias(_OFF)
    )
    win = Window.partitionBy(_B).orderBy(*_order(key, tiebreaks, descending))
    return (
        kb.join(F.broadcast(offsets), _B)
        .withColumn(out, (F.row_number().over(win) + F.col(_OFF)).cast("long"))
        .drop(_B, _OFF)
    )


def global_running_sum(
    df: DataFrame,
    key: str,
    tiebreaks: list[str] | None = None,
    *,
    value: str,
    descending: bool = False,
    n_buckets: int = DEFAULT_BUCKETS,
    out: str = "cum",
    rn_out: str | None = None,
    extra_values: dict[str, str] | None = None,
) -> DataFrame:
    """``SUM(value) OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING)`` (and
    optionally the matching ROW_NUMBER via ``rn_out``) without a
    single-partition window: per-bucket running sums plus each bucket's
    exclusive prefix total.

    ``extra_values`` maps further value columns to output names, summed
    over the SAME order in the same pass (one bucket assignment, one
    offsets relation, one per-bucket window) — a two-ECDF scan like
    ``stats_ks_test`` costs one distributed window, not two (round 13).
    """
    tiebreaks = tiebreaks or []
    vals = {value: out, **(extra_values or {})}
    kb = _with_bucket(df, key, descending, n_buckets)
    per = kb.groupBy(_B).agg(
        F.count("*").alias("_gr_cnt"),
        *[F.sum(v).alias(f"_gr_sum_{i}") for i, v in enumerate(vals)],
    )
    wpre = Window.orderBy(_B).rowsBetween(Window.unboundedPreceding, -1)
    offsets = per.select(
        _B,
        F.coalesce(F.sum("_gr_cnt").over(wpre), F.lit(0)).alias(_OFF),
        *[
            F.coalesce(F.sum(f"_gr_sum_{i}").over(wpre), F.lit(0)).alias(
                f"_gr_soff_{i}"
            )
            for i in range(len(vals))
        ],
    )
    order = _order(key, tiebreaks, descending)
    wrun = (
        Window.partitionBy(_B)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    win = Window.partitionBy(_B).orderBy(*order)
    res = kb.join(F.broadcast(offsets), _B)
    for i, (v, o) in enumerate(vals.items()):
        res = res.withColumn(
            o, F.sum(v).over(wrun) + F.col(f"_gr_soff_{i}")
        )
    if rn_out is not None:
        res = res.withColumn(
            rn_out, (F.row_number().over(win) + F.col(_OFF)).cast("long")
        )
    return res.drop(
        _B, _OFF, *[f"_gr_soff_{i}" for i in range(len(vals))]
    )


def global_ntile(
    df: DataFrame,
    k: int,
    key: str,
    tiebreaks: list[str] | None = None,
    *,
    descending: bool = False,
    n_buckets: int = DEFAULT_BUCKETS,
    out: str = "band",
) -> DataFrame:
    """``NTILE(k) OVER (ORDER BY key [DESC], tiebreaks...)`` without a
    single-partition window: distributed row number + the exact NTILE
    assignment (first ``n % k`` tiles get ``n div k + 1`` rows) computed
    from the broadcast total count — bit-identical to the builtin."""
    rn = "_gr_rn"
    ranked = global_row_number(
        df, key, tiebreaks, descending=descending, n_buckets=n_buckets, out=rn
    )
    n1 = df.agg(F.count("*").alias("_gr_n"))
    # exact NTILE spec: base = n div k, rem = n mod k; the first rem
    # tiles hold base+1 rows (GREATEST guards the n < k case, base = 0,
    # where every row is its own tile)
    tile = F.expr(
        f"CAST(CASE WHEN {rn} <= (_gr_n % {k}) * (_gr_n DIV {k} + 1)"
        f" THEN ({rn} - 1) DIV (_gr_n DIV {k} + 1) + 1"
        f" ELSE (_gr_n % {k})"
        f" + ({rn} - (_gr_n % {k}) * (_gr_n DIV {k} + 1) - 1)"
        f" DIV GREATEST(_gr_n DIV {k}, 1) + 1 END AS INT)"
    )
    return (
        ranked.crossJoin(F.broadcast(n1))
        .withColumn(out, tile)
        .drop(rn, "_gr_n")
    )
