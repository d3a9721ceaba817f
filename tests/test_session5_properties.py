"""Property tests for the round-5-continuation operators: each compared
against an independent explicit model (plain join / per-day explode /
full recompute) on randomized adversarial inputs — skewed keys, touching
intervals, delete-everything deltas."""

from __future__ import annotations

from collections import Counter, defaultdict

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

SLOW = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
    derandomize=True,
)

# (key, payload) rows with heavy skew: key 0 dominates
BIG_ROWS = st.lists(
    st.tuples(
        st.sampled_from([0, 0, 0, 0, 0, 1, 2, 3, 7]),
        st.integers(min_value=0, max_value=10**6),
    ),
    min_size=0,
    max_size=60,
)


@pytest.mark.slow
@SLOW
@given(rows=BIG_ROWS)
def test_salted_join_matches_plain_join(spark, rows):
    from findb_spark.plans.skew import salted_join

    big = spark.createDataFrame(
        [(k, p) for k, p in rows] or [(None, None)], "k bigint, payload bigint"
    ).where(F.col("k").isNotNull())
    small = spark.createDataFrame(
        [(i, i * 10) for i in range(5)], "k bigint, dim bigint"
    )
    got = sorted(
        (r.k, r.payload, r.dim)
        for r in salted_join(big, small, "k", salt=4).collect()
    )
    want = sorted(
        (k, p, k * 10) for k, p in rows if k < 5
    )
    assert got == want


# intervals [s, s+len) over a small day axis; zero-length excluded
INTERVALS = st.lists(
    st.tuples(
        st.sampled_from(["A", "B"]),
        st.integers(min_value=0, max_value=20),
        st.integers(min_value=1, max_value=8),
    ),
    min_size=1,
    max_size=40,
)


@pytest.mark.slow
@SLOW
@given(iv=INTERVALS)
def test_sweep_line_peak_matches_per_day_model(spark, iv):
    """The sweep-line (+1 at s, -1 at e, running sum) must agree with the
    brute-force per-day occupancy count at every group's peak."""
    rows = [(g, s, s + ln) for g, s, ln in iv]
    df = spark.createDataFrame(rows, "g string, s int, e int")
    ev = df.select("g", F.col("s").alias("d"), F.lit(1).alias("x")).unionAll(
        df.select("g", F.col("e").alias("d"), F.lit(-1).alias("x"))
    )
    from pyspark.sql import Window

    agg = ev.groupBy("g", "d").agg(F.sum("x").alias("net"))
    w = Window.partitionBy("g").orderBy("d").rowsBetween(
        Window.unboundedPreceding, 0
    )
    sweep = agg.select("g", "d", F.sum("net").over(w).alias("conc"))
    got = {
        r.g: r.peak
        for r in sweep.groupBy("g").agg(F.max("conc").alias("peak")).collect()
    }

    occupancy: dict[str, Counter] = defaultdict(Counter)
    for g, s, e in rows:
        for d in range(s, e):
            occupancy[g][d] += 1
    want = {g: max(c.values()) for g, c in occupancy.items()}
    assert got == want


# delta ops per key: lists of (key, op) where op in insert/delete-ish ints
BASE = st.lists(
    st.tuples(st.integers(0, 6), st.integers(1, 100)), min_size=1, max_size=30
)
EXTRA = st.lists(
    st.tuples(st.integers(0, 6), st.integers(1, 100)), min_size=0, max_size=15
)
DROPS = st.sets(st.integers(0, 29), max_size=30)


@pytest.mark.slow
@SLOW
@given(base=BASE, extra=EXTRA, drops=DROPS)
def test_ivm_delta_matches_recompute(spark, tmp_path_factory, base, extra, drops):
    """apply_agg_delta over random inserts + deletes (including deltas
    that empty out whole groups) must equal aggregation of the final
    multiset."""
    from findb_spark.ops.ivm import apply_agg_delta

    path = str(tmp_path_factory.mktemp("ivm") / "agg")
    spark.createDataFrame(
        [(k, k % 2, 1, v) for k, v in base], "g int, p int, n bigint, s bigint"
    ).groupBy("g", "p").agg(
        F.sum("n").cast("bigint").alias("n"), F.sum("s").cast("bigint").alias("s")
    ).write.mode("overwrite").partitionBy("p").parquet(path)

    deleted = [base[i] for i in drops if i < len(base)]
    delta_rows = [(k, k % 2, 1, v) for k, v in extra] + [
        (k, k % 2, -1, -v) for k, v in deleted
    ]
    delta = spark.createDataFrame(
        delta_rows or [(None, None, None, None)],
        "g int, p int, n bigint, s bigint",
    ).where(F.col("g").isNotNull())
    apply_agg_delta(spark, path, delta, keys=["g", "p"], measures=["s"], part_col="p")

    got = {(r.g, r.p): (r.n, r.s) for r in spark.read.parquet(path).collect()}
    final = Counter()
    sums: Counter = Counter()
    remaining = [r for i, r in enumerate(base) if i not in drops] + extra
    for k, v in remaining:
        final[(k, k % 2)] += 1
        sums[(k, k % 2)] += v
    want = {kk: (final[kk], sums[kk]) for kk in final}
    assert got == want


KEYED_POINTS = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 400)), min_size=1, max_size=40
)
KEYED_IVS = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 400), st.integers(1, 60)),
    min_size=1,
    max_size=25,
)


@pytest.mark.slow
@SLOW
@given(pts=KEYED_POINTS, ivs=KEYED_IVS)
def test_keyed_interval_join_matches_model(spark, pts, ivs):
    """interval_join(by=[key]) must equal the brute-force containment +
    key-equality join regardless of bin boundaries (points/intervals
    straddling bin edges are the regression risk)."""
    import datetime

    from findb_spark.ops.interval import interval_join

    base = datetime.date(1995, 1, 1)
    pdf = spark.createDataFrame(
        [(k, base + datetime.timedelta(days=d)) for k, d in pts],
        "k int, d date",
    )
    idf = spark.createDataFrame(
        [
            (
                k,
                base + datetime.timedelta(days=s),
                base + datetime.timedelta(days=s + ln),
                k * 1000 + s,
            )
            for k, s, ln in ivs
        ],
        "k int, d0 date, d1 date, payload int",
    )
    got = sorted(
        (r.k, r.d, r.payload)
        for r in interval_join(pdf, idf, "d", "d0", "d1", by=["k"]).collect()
    )
    want = sorted(
        (k, base + datetime.timedelta(days=d), ik * 1000 + s)
        for k, d in pts
        for ik, s, ln in ivs
        if ik == k and s <= d < s + ln
    )
    assert got == want
