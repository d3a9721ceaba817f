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
