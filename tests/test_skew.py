"""Salted-join correctness: results must equal the plain join under skew
(one dominant key), while the big side's shuffle spreads across salt
buckets (findb_spark.plans.skew)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from findb_spark.plans import salted_join


@pytest.fixture()
def skewed(spark):
    # 10k rows, 90% on key 7 — the hot-asset shape
    big = spark.range(10_000).select(
        F.when(F.col("id") % 10 != 0, F.lit(7)).otherwise(F.col("id") % 100).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("dim_val")
    )
    return big, small


def test_salted_inner_matches_plain(spark, skewed):
    big, small = skewed
    got = salted_join(big, small, "k").groupBy("k").agg(
        F.count("*").alias("n"), F.sum("payload").alias("s"), F.first("dim_val").alias("d")
    )
    want = big.join(small, "k").groupBy("k").agg(
        F.count("*").alias("n"), F.sum("payload").alias("s"), F.first("dim_val").alias("d")
    )
    assert sorted(got.collect()) == sorted(want.collect())


def test_salted_left_keeps_unmatched(spark, skewed):
    big, small = skewed
    small_missing = small.where(F.col("k") != 7)  # hot key has no match
    got = salted_join(big, small_missing, "k", how="left")
    assert got.count() == big.count()
    assert got.where(F.col("k") == 7).where(F.col("dim_val").isNotNull()).count() == 0


def test_salt_spreads_hot_key(spark, skewed):
    big, _ = skewed
    b = big.withColumn(
        "_salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(8)).cast("int")
    )
    buckets = b.where(F.col("k") == 7).groupBy("_salt").count().collect()
    assert len(buckets) == 8  # hot key occupies every salt bucket
