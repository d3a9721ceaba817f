"""Runtime join-filter plan tests: dynamic partition pruning (DPP) and
runtime bloom-filter injection.

At 100 TB a star join's selectivity usually lives on the DIMENSION side;
without runtime filters the fact scan reads everything and discards rows
at the join. DPP turns the dim filter into a partition predicate on the
fact's hive partitions (the join-time analog of the reference's index
seek); the runtime bloom filter does the same at row granularity for
non-partition keys. Both are Catalyst features the engine's layouts are
designed to trigger — pinned here so a layout or join-shape regression
doesn't silently disable them.
"""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from findb_spark.layout import write_prices
from findb_spark.prices import prices_from_lineitem


def _explain(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def month_partitioned(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("dpp")
    fact_path = str(base / "prices")
    write_prices(
        prices_from_lineitem(spark, sf_dir),
        fact_path,
        num_partitions=4,
        date_bucket="month",
    )
    dim_path = str(base / "months")
    fact = spark.read.parquet(fact_path)
    (
        fact.select("date_month")
        .distinct()
        # DPP only fires for "likely selective" dim predicates (equality /
        # IN / comparison — a bare boolean attribute does NOT qualify), so
        # the dim carries an int tag filtered by equality below.
        .withColumn("month_in_quarter", (F.col("date_month") % 100) % 3)
        .write.mode("overwrite")
        .parquet(dim_path)
    )
    return fact_path, dim_path


def test_dynamic_partition_pruning_on_month_join(spark, month_partitioned):
    fact_path, dim_path = month_partitioned
    fact = spark.read.parquet(fact_path)
    dim = spark.read.parquet(dim_path).where(F.col("month_in_quarter") == 0)
    joined = fact.join(dim, "date_month").groupBy("date_month").agg(
        F.sum("value").alias("total")
    )
    plan = _explain(joined)
    assert "dynamicpruning" in plan.lower(), plan[:2000]


def test_runtime_bloom_filter_on_row_key_join(spark, month_partitioned):
    """With creation thresholds lowered, a selective dim join on a
    NON-partition key must inject a bloom filter into the fact scan."""
    fact_path, _ = month_partitioned
    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.enabled",
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        )
    }
    try:
        conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10GB"
        )
        conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        fact = spark.read.parquet(fact_path)
        dim = (
            fact.select("asset_id")
            .distinct()
            .where(F.col("asset_id") % 50 == 0)
            .hint("no_broadcast_hash")
        )
        joined = fact.join(dim, "asset_id").agg(F.sum("value").alias("total"))
        plan = _explain(joined)
        assert "bloomfilter" in plan.lower() or "might_contain" in plan.lower(), (
            plan[:2000]
        )
    finally:
        for k, v in saved.items():
            if v is not None:
                conf.set(k, v)
