"""Compaction: a fragmented prices table rewritten to target-size files
keeps every row and the clustered-layout query contract."""

from __future__ import annotations

from findb_spark.asof import asof_range
from findb_spark.layout import compact, write_prices
from findb_spark.prices import golden_prices


def test_compact_merges_small_files(spark, tmp_path):
    src = str(tmp_path / "fragmented")
    dst = str(tmp_path / "compacted")
    # simulate a streaming-append fragmented table: 12 tiny files
    write_prices(golden_prices(spark), src, num_partitions=12)
    stats = compact(spark, src, dst)
    assert stats["files_before"] >= 2  # non-empty range partitions each wrote a file
    assert stats["files_after"] == 1  # 18 rows << target_file_bytes
    assert stats["rows"] == golden_prices(spark).count()
    # the compacted table still answers the golden as-of query correctly
    got = [
        (r.date, r.value)
        for r in asof_range(spark.read.parquet(dst), 0, 20200115, 20200405, 20).collect()
    ]
    assert got == [(20200331, 120.0), (20200229, 12.0), (20200131, 3.0)]


def test_compact_preserves_month_partitions(spark, tmp_path):
    """Compacting a month-partitioned table must keep the date_month hive
    level (dropping it would silently disable partition pruning)."""
    from pyspark.sql import functions as F

    src = str(tmp_path / "frag_hive")
    dst = str(tmp_path / "comp_hive")
    write_prices(golden_prices(spark), src, num_partitions=6, date_bucket="month")
    stats = compact(spark, src, dst)
    out = spark.read.parquet(dst)
    assert "date_month" in out.columns
    assert stats["rows"] == golden_prices(spark).count()
    # partition directories survive: a month predicate prunes the listing
    months = {r.date_month for r in out.select("date_month").distinct().collect()}
    assert months == {202001, 202002, 202003, 202004}
    # the month predicate prunes the listing (scan_metrics is the
    # filter-aware view; inputFiles() lists the whole FileIndex)
    from findb_spark.layout import scan_metrics

    full_files = sum(m.get("numFiles", 0) for m in scan_metrics(out))
    pruned_files = sum(
        m.get("numFiles", 0)
        for m in scan_metrics(out.where(F.col("date_month") == 202003))
    )
    assert 0 < pruned_files < full_files


def test_dynamic_overwrite_preserves_siblings_static_wipes(spark, tmp_path):
    """The contract the roundtrip_dynamic_overwrite cert rests on: dynamic
    mode replaces only written partitions; static mode truncates the table
    (negative control, so a mode regression cannot pass silently)."""
    import glob

    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 20)], "id bigint, part int"
    )
    df.write.mode("overwrite").partitionBy("part").parquet(path)
    before = sorted(glob.glob(path + "/part=10/part-*"))
    patch = spark.createDataFrame([(9, 20)], "id bigint, part int")

    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        patch.write.mode("overwrite").partitionBy("part").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    assert sorted(glob.glob(path + "/part=10/part-*")) == before
    assert {(r.id, r.part) for r in spark.read.parquet(path).collect()} == {
        (1, 10), (2, 10), (9, 20)
    }

    # negative control: static overwrite of the same single-partition frame
    # wipes the sibling partition entirely
    patch.write.mode("overwrite").partitionBy("part").parquet(path)
    assert glob.glob(path + "/part=10/part-*") == []
