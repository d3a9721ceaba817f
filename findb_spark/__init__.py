"""findb_spark — a PySpark-native bitemporal time-series analytics engine.

A ground-up reimplementation of the capabilities of the reference engine
(swidoff/findb: an on-disk B+tree over ``(asset_id, date, timestamp) -> value``
with bitemporal as-of range queries — see ``src/btree/file.rs:20-50`` in the
reference) re-expressed Spark-first:

- storage  = Parquet, clustered via ``repartitionByRange`` +
  ``sortWithinPartitions`` (replaces the bulk-loaded B+tree, file.rs:296-379)
- seek     = Catalyst predicate pushdown + Parquet row-group min/max skipping
  (replaces the B+tree descent, file.rs:425-452)
- as-of    = window/max_by dedup per (asset_id, date)
  (replaces the backward leaf scan, file.rs:471-570)
- cache    = Spark block manager / OS page cache (replaces cache.rs)

Plus the relational surface (joins, aggregations, windows, set ops) and the
large-scale LLM-data-pipeline operators (dedup, similarity search, text
analysis, multimodal plumbing) that the reference lacks, all designed for
100 TB scale: no driver-side collects in operators, broadcast only bounded
sides, AQE-friendly declarative plans.
"""

from findb_spark.session import get_spark, release_caches  # noqa: F401

__version__ = "0.1.0"
