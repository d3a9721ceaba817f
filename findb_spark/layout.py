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


def write_bucketed(
    df: DataFrame,
    table_name: str,
    path: str,
    n_buckets: int = 8,
    key: str = "asset_id",
    sort_cols: tuple[str, ...] = ("asset_id", "date", "ts"),
    mode: str = "overwrite",
) -> None:
    """Bucketed layout: pre-shuffle ONCE at write time so every later join
    or aggregation on ``key`` runs with NO exchange (co-located joins).

    At 100 TB this is the difference between shuffling the fact table per
    query and never shuffling it at all: two tables bucketed by the same
    key and count sort-merge-join directly file-to-file. The bucket count
    is a layout contract — pick it for target-scale task sizing (buckets ~=
    cluster cores at the largest join), not per-query."""
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, key)
        .sortBy(*sort_cols)
        .option("path", path)
        .saveAsTable(table_name)
    )


def read_prices(spark: SparkSession, path: str) -> DataFrame:
    """Open a clustered prices table (keeps the ``date_month`` partition
    column when present — findb_spark.asof derives partition predicates
    from it)."""
    df = spark.read.parquet(path)
    cols = list(PRICE_COLUMNS) + (
        ["date_month"] if "date_month" in df.columns else []
    )
    return df.select(*cols)


def files_scanned(df: DataFrame) -> int:
    """Number of files backing the relation (NOT filter-aware —
    ``Dataset.inputFiles`` lists the whole FileIndex). Use `scan_metrics`
    for pruning evidence."""
    return len(df.inputFiles())


def scan_metrics(df: DataFrame) -> list[dict[str, int]]:
    """Pruning observability — the analog of the reference's ``pages_read``
    counter (file.rs:477,504,534). Executes the plan and returns the runtime
    metrics of every file-scan node (numFiles, numPartitions, numOutputRows,
    filesSize...). Tests assert these shrink when predicates bind — the
    cluster-scale equivalent of the reference's golden leaf-page counts
    (file.rs:709)."""
    # fresh Dataset -> fresh physical plan: listing-phase metrics (numFiles,
    # numPartitions) are only populated on a plan's first execution
    df = df.select(df.columns)
    df.collect()
    out: list[dict[str, int]] = []

    def walk(node) -> None:
        cn = node.getClass().getSimpleName()
        if "AdaptiveSparkPlan" in cn:
            walk(node.executedPlan())
            return
        if "QueryStage" in cn:
            walk(node.plan())
            return
        if "FileSourceScan" in cn or "BatchScan" in cn:
            m = node.metrics()
            it = m.iterator()
            vals: dict[str, int] = {}
            while it.hasNext():
                kv = it.next()
                vals[kv._1()] = kv._2().value()
            out.append(vals)
        for i in range(node.children().size()):
            walk(node.children().apply(i))

    walk(df._jdf.queryExecution().executedPlan())
    return out


def compact(
    spark: SparkSession,
    src_path: str,
    dest_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> dict[str, int]:
    """Small-file compaction: rewrite a clustered prices table into files
    sized for scan efficiency, preserving the clustering contract.

    Incremental/streaming appends fragment a table into many small files;
    at 100 TB the resulting listing + per-file open overhead dominates scan
    time (and row-group stats lose their pruning power because every file
    covers a sliver of the key space). Compaction = one
    ``repartitionByRange`` sized from the actual byte footprint, then the
    same sortWithinPartitions as the bulk load — the table comes out
    exactly as if it had been bulk-loaded in one pass (reference analog:
    re-running write_from_iterator, file.rs:296-379).

    Returns {files_before, files_after, rows}.
    """
    df = spark.read.parquet(src_path)
    files_before = len(df.inputFiles())
    # actual on-disk footprint -> partition count (>=1)
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path(src_path)
    fs = jvm_path.getFileSystem(spark._jsc.hadoopConfiguration())
    total_bytes = fs.getContentSummary(jvm_path).getLength()
    n_parts = max(1, -(-total_bytes // target_file_bytes))
    out = cluster_prices(df.select(*PRICE_COLUMNS), int(n_parts))
    out.write.mode("overwrite").parquet(dest_path)
    compacted = spark.read.parquet(dest_path)
    return {
        "files_before": files_before,
        "files_after": len(compacted.inputFiles()),
        "rows": compacted.count(),
    }
