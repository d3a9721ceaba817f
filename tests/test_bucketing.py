"""Bucketed-layout tests: co-located joins and aggregations run with zero
exchanges once the table is bucketed on the key — the write-once/
never-shuffle-again contract that matters most at cluster scale (layout.py
write_bucketed)."""

from __future__ import annotations

import contextlib
import io

import pytest

from findb_spark.layout import write_bucketed
from findb_spark.prices import prices_from_lineitem


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("buckets")
    prices = prices_from_lineitem(spark, sf_dir)
    write_bucketed(prices, "prices_b", str(base / "prices_b"), n_buckets=4)
    stats = prices.groupBy("asset_id").count()
    write_bucketed(
        stats, "stats_b", str(base / "stats_b"), n_buckets=4, sort_cols=("asset_id",)
    )
    yield spark.table("prices_b"), spark.table("stats_b")
    spark.sql("DROP TABLE IF EXISTS prices_b")
    spark.sql("DROP TABLE IF EXISTS stats_b")


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_no_exchange(spark, bucketed):
    prices_b, stats_b = bucketed
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = prices_b.join(stats_b, "asset_id")
        p = _plan(j)
        assert "Exchange" not in p, p
        assert j.count() == prices_b.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_aggregation_no_exchange(spark, bucketed):
    prices_b, _ = bucketed
    agg = prices_b.groupBy("asset_id").count()
    assert "Exchange" not in _plan(agg)


def test_bucketed_results_match_unbucketed(spark, sf_dir, bucketed):
    prices_b, _ = bucketed
    want = prices_from_lineitem(spark, sf_dir).count()
    assert prices_b.count() == want
