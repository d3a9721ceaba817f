"""Minimal versioned-table layer (time travel) over parquet directories.

The reference's bitemporal model gives *row-level* knowledge-time history
(file.rs:508-570); this module adds the complementary *table-level* history
a lakehouse exposes as `VERSION AS OF`: every write lands in a fresh
immutable `v{N}/` subdirectory and a `_versions.json` manifest records the
commit order.  Readers resolve a version (or latest) through the manifest,
so concurrent readers never observe a half-written directory — the manifest
is REWRITTEN ATOMICALLY (tmp file + os.replace) only after the parquet
commit (`_SUCCESS`) exists, the same commit-gating discipline as
streaming/events_stream.py's snapshot reads.

Scale: the manifest holds one entry per version (tiny JSON); data files are
plain parquet, so all layout machinery (partitioning, Z-order, manifests,
pruning — layout.py) composes with versioned tables unchanged.  Vacuuming
old versions is directory removal.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

_MANIFEST = "_versions.json"


def _manifest_path(table_dir: str) -> str:
    return os.path.join(table_dir, _MANIFEST)


def list_versions(table_dir: str) -> dict[int, str]:
    """Committed versions as {version: data_dir}, empty if none."""
    path = _manifest_path(table_dir)
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        raw = json.load(f)
    return {int(k): v for k, v in raw["versions"].items()}


def write_version(df: DataFrame, table_dir: str) -> int:
    """Commit ``df`` as the next version of the table; returns the version
    number.  The data directory is immutable once committed."""
    os.makedirs(table_dir, exist_ok=True)
    versions = list_versions(table_dir)
    v = max(versions) + 1 if versions else 1
    data_dir = os.path.join(table_dir, f"v{v}")
    df.write.mode("overwrite").parquet(data_dir)
    if not os.path.exists(os.path.join(data_dir, "_SUCCESS")):
        raise RuntimeError(f"parquet commit missing _SUCCESS: {data_dir}")
    versions[v] = data_dir
    tmp = _manifest_path(table_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"versions": {str(k): p for k, p in versions.items()}}, f)
    os.replace(tmp, _manifest_path(table_dir))
    return v


def read_version(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """Read the table as of ``version`` (default: latest committed)."""
    versions = list_versions(table_dir)
    if not versions:
        raise FileNotFoundError(f"no committed versions under {table_dir}")
    v = max(versions) if version is None else version
    if v not in versions:
        raise KeyError(f"version {v} not in {sorted(versions)}")
    return spark.read.parquet(versions[v])
