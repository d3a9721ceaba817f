"""Layout manager — the moral equivalent of the reference's bulk load.

The reference builds a clustered B+tree from key-sorted input in one pass
(``file.rs:296-379``; sortedness is a load-time contract, file.rs:294-296,
enforced by an external ``sort`` in scripts/convert-csv.sh:10). Here the same
property — "a range query touches only the pages covering the range" — comes
from a *layout decision*, not custom storage code:

- ``repartitionByRange(asset_id, date)``: one shuffle, producing files whose
  (asset_id, date) ranges are disjoint. This is the single shuffle of the
  load path, exactly like the reference's single external sort.
- ``sortWithinPartitions(asset_id, date, ts)``: rows inside each file are
  clustered on the full key, so Parquet row-group/page min-max stats are
  tight and the vectorized reader skips row groups the way the B+tree skips
  pages.
- Optional hive-style ``partitionBy`` on a coarse date bucket gives
  partition-level pruning before file stats are even consulted — at 100 TB
  that is the difference between listing 10^2 and 10^6 files.

At 100 TB: ``repartitionByRange`` samples key quantiles, so partition counts
scale with data volume (configure via ``num_partitions``); skewed assets
spread across several range partitions rather than hot-spotting one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from findb_spark.asof import PRICE_COLUMNS


def cluster_prices(prices: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """Return the prices DataFrame in clustered (query-optimized) order."""
    cols = [F.col("asset_id"), F.col("date")]
    if num_partitions:
        out = prices.repartitionByRange(num_partitions, *cols)
    else:
        out = prices.repartitionByRange(*cols)
    return out.sortWithinPartitions("asset_id", "date", "ts")


def write_prices(
    prices: DataFrame,
    path: str,
    num_partitions: int | None = None,
    date_bucket: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bulk load: cluster and persist a bitemporal prices table.

    ``date_bucket``: optional coarse hive partition — "month" adds a
    ``date_month`` directory level (yyyymm) for partition pruning on date
    predicates. Left off for small local tests (file-count overhead), on for
    cluster scale.
    """
    out = prices.select(*PRICE_COLUMNS)
    writer_cols = []
    if date_bucket == "month":
        out = out.withColumn("date_month", (F.col("date") / 100).cast("int"))
        writer_cols = ["date_month"]
    out = cluster_prices(out, num_partitions)
    w = out.write.mode(mode)
    if writer_cols:
        w = w.partitionBy(*writer_cols)
    w.parquet(path)


def read_prices(spark: SparkSession, path: str) -> DataFrame:
    """Open a clustered prices table."""
    return spark.read.parquet(path).select(*PRICE_COLUMNS)


def files_scanned(df: DataFrame) -> int:
    """Pruning observability — the analog of the reference's ``pages_read``
    counter (file.rs:477,504,534): number of files the plan will touch after
    partition pruning. Tests assert this shrinks when predicates bind."""
    return len(df.inputFiles())
