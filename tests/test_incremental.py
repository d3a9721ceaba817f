"""Incremental bar maintenance: partial partition overwrite must converge
to the same table as a full rebuild, touching only affected partitions."""

from __future__ import annotations

from pyspark.sql import functions as F

from findb_spark.ops.finance import monthly_ohlc_bars
from findb_spark.ops.incremental import update_monthly_bars, write_monthly_bars
from findb_spark.prices import prices_from_lineitem


def _canon(df):
    return sorted(
        (r.asset_id, r.month, r.open, r.high, r.low, r.close, r.n_rev)
        for r in df.collect()
    )


def test_incremental_update_matches_full_rebuild(spark, sf_dir, tmp_path):
    prices = prices_from_lineitem(spark, sf_dir).cache()
    cutoff = 19970101
    old = prices.where(F.col("date") < cutoff)
    late = prices.where(F.col("date") >= cutoff)
    n_late_months = late.select(F.expr("date div 100")).distinct().count()

    path = str(tmp_path / "bars")
    write_monthly_bars(old, path)
    before = {r.month for r in spark.read.parquet(path).select("month").distinct().collect()}

    n = update_monthly_bars(spark, prices, late, path)
    assert n == n_late_months

    got = spark.read.parquet(path)
    want = monthly_ohlc_bars(prices)
    assert _canon(got) == _canon(want)
    # untouched months kept their original files (dynamic overwrite scope)
    after = {r.month for r in got.select("month").distinct().collect()}
    assert before <= after
    prices.unpersist()
