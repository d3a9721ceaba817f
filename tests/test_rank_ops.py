"""Property pins for findb_spark.ops.rank — the distributed global
ranking ops must be BIT-IDENTICAL to the single-partition builtin
windows they replace, across ties, ascending/descending order, skewed
key distributions, and every NTILE remainder case, while the heavy
window runs hash-partitioned by bucket (plan-asserted)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window, functions as F

from findb_spark.ops.rank import (
    global_ntile,
    global_row_number,
    global_running_sum,
)


def _data(spark, n=500, skew=False):
    """Deterministic keys with heavy ties; skew concentrates 40% of rows
    on one key (the unbalanced-bucket regime).  The non-skew branch of
    the old fixture left the other 60% NULL (an accidental all-equal
    degenerate case once min==max); keys are now non-null everywhere —
    NULL keys RAISE since round 13 (see test_null_order_key_raises)."""
    key = (
        F.when(F.col("id") % 5 < 2, F.lit(7)).otherwise(  # 40% on key 7
            F.col("id") * 2654435761 % 97
        )
        if skew
        else (F.col("id") * 2654435761 % 97)
    )
    return spark.range(n).select(
        F.col("id").alias("pk"),
        key.cast("long").alias("k"),
        ((F.col("id") * 40503) % 1000).cast("long").alias("v"),
    )


@pytest.mark.parametrize("descending", [False, True])
@pytest.mark.parametrize("skew", [False, True])
def test_global_row_number_matches_builtin(spark, descending, skew):
    df = _data(spark, skew=skew)
    lead = F.col("k").desc() if descending else F.col("k").asc()
    w = Window.orderBy(lead, F.col("pk").asc())
    want = {
        r.pk: r.rn
        for r in df.select("pk", F.row_number().over(w).alias("rn")).collect()
    }
    got = {
        r.pk: r.rn
        for r in global_row_number(
            df, "k", ["pk"], descending=descending, n_buckets=16
        ).collect()
    }
    assert got == want


@pytest.mark.parametrize("descending", [False, True])
def test_global_running_sum_matches_builtin(spark, descending):
    df = _data(spark)
    lead = F.col("k").desc() if descending else F.col("k").asc()
    w = (
        Window.orderBy(lead, F.col("pk").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    want = {
        r.pk: (r.cum, r.rn)
        for r in df.select(
            "pk",
            F.sum("v").over(w).alias("cum"),
            F.row_number()
            .over(Window.orderBy(lead, F.col("pk").asc()))
            .alias("rn"),
        ).collect()
    }
    got = {
        r.pk: (r.cum, r.rn)
        for r in global_running_sum(
            df,
            "k",
            ["pk"],
            value="v",
            descending=descending,
            n_buckets=16,
            rn_out="rn",
        ).collect()
    }
    assert got == want


@pytest.mark.parametrize("n,k", [(500, 4), (6, 4), (5, 4), (3, 4), (500, 7)])
def test_global_ntile_matches_builtin(spark, n, k):
    """Covers every remainder branch: n % k zero and non-zero, and the
    n < k degenerate case where base = 0."""
    df = _data(spark, n=n)
    w = Window.orderBy(F.col("k").desc(), F.col("pk").asc())
    want = {
        r.pk: r.band
        for r in df.select("pk", F.ntile(k).over(w).alias("band")).collect()
    }
    got = {
        r.pk: r.band
        for r in global_ntile(
            df, k, "k", ["pk"], descending=True, n_buckets=8
        ).collect()
    }
    assert got == want


def test_constant_key_degenerates_to_one_bucket(spark):
    df = _data(spark).withColumn("k", F.lit(5).cast("long"))
    w = Window.orderBy(F.col("k").asc(), F.col("pk").asc())
    want = {
        r.pk: r.rn
        for r in df.select("pk", F.row_number().over(w).alias("rn")).collect()
    }
    got = {r.pk: r.rn for r in global_row_number(df, "k", ["pk"]).collect()}
    assert got == want


def test_heavy_window_is_hash_partitioned_not_single(spark):
    """The load-bearing plan property: the per-row window must be
    partitioned by the bucket (parallel), not a single-partition sort of
    the whole relation.  The only remaining SinglePartition work is the
    offsets window over the bounded bucket-count relation."""
    df = _data(spark, n=2000)
    plan = (
        global_row_number(df, "k", ["pk"], n_buckets=32)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "hashpartitioning(_gr_bucket" in plan
    # the full-relation window runs over the bucket partitioning
    assert "Window [row_number()" in plan


def test_null_order_key_raises(spark):
    """Round-13 advisor guard: a NULL order key must FAIL LOUDLY — the
    offsets inner join would otherwise silently drop the row (a wrong,
    smaller result), where the builtin window ranks NULLs."""
    df = _data(spark, n=50).withColumn(
        "k", F.when(F.col("pk") % 7 == 0, F.col("k"))  # 6/7 of keys NULL
    )
    with pytest.raises(Exception, match="ops.rank.*NULL"):
        global_row_number(df, "k", ["pk"]).count()


@pytest.mark.parametrize("descending", [False, True])
@pytest.mark.parametrize("skew", [False, True])
def test_global_running_sum_extra_values(spark, descending, skew):
    """extra_values: several running sums over the SAME order in one
    pass must each be bit-identical to the builtin window — including
    under DUPLICATE KEYS with a tiebreak column (round-14 verdict item 8:
    the ks_test call site's order key is unique post-groupBy, but the API
    admits multi-value calls at sites with heavy ties; the skew variant
    puts 40% of rows on one key so both the per-bucket windows and the
    bucket offsets see the tie-handling path)."""
    df = _data(spark, skew=skew).withColumn(
        "v2", (F.col("pk") * 13 % 101).cast("long")
    )
    lead = F.col("k").desc() if descending else F.col("k").asc()
    w = (
        Window.orderBy(lead, F.col("pk").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    want = {
        r.pk: (r.cum, r.cum2)
        for r in df.select(
            "pk",
            F.sum("v").over(w).alias("cum"),
            F.sum("v2").over(w).alias("cum2"),
        ).collect()
    }
    got = {
        r.pk: (r.cum, r.cum2)
        for r in global_running_sum(
            df,
            "k",
            ["pk"],
            value="v",
            descending=descending,
            n_buckets=16,
            extra_values={"v2": "cum2"},
        ).collect()
    }
    assert got == want


def test_ks_ecdf_window_is_hash_partitioned(spark):
    """Round-13 verdict item 2: stats_ks_test's ECDF scan must run its
    window over hashpartitioning(_gr_bucket...), not a single-partition
    sort of the value-grouped relation."""
    from findb_spark.queries.stats_queries import stats_ks_test

    plan = (
        stats_ks_test(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "hashpartitioning(_gr_bucket" in plan
