"""findb .db file format interop: bulk writer + Spark DataSource reader.

Validates against the reference's golden fixture (file.rs:621-640) and the
descent algorithm (file.rs:425-452): files we write must answer queries
correctly for a reference-compatible reader (lower-bound search, equal ->
right child, child overflow in extra_page_num).
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from findb_spark.asof import asof_range
from findb_spark.prices import GOLDEN_ROWS, golden_prices
from findb_spark.sources.findb_file import (
    descend,
    export_prices_db,
    page_size_for_keys,
    read_prices_db,
    write_btree_file,
)


def _golden_sorted():
    return sorted((r[0], r[1], r[2], float(r[3])) for r in GOLDEN_ROWS)


def test_roundtrip_golden_fixture(spark, tmp_path):
    """18-row golden fixture, capacity-3 pages (multi-level tree, same
    config as the reference's test_small at file.rs:642)."""
    path = str(tmp_path / "golden.db")
    n_pages = write_btree_file(path, _golden_sorted(), page_size_for_keys(3))
    assert n_pages >= 7  # 6 leaves + at least one inner level
    df = read_prices_db(spark, path)
    got = sorted((r.asset_id, r.date, r.ts, r.value) for r in df.collect())
    assert got == _golden_sorted()


def test_asof_query_over_db_file(spark, tmp_path):
    """The engine's flagship query runs unchanged over the migrated file
    and reproduces the reference's golden expectations (file.rs:673-684)."""
    path = str(tmp_path / "golden.db")
    write_btree_file(path, _golden_sorted(), page_size_for_keys(3))
    got = [
        (r.date, r.value)
        for r in asof_range(read_prices_db(spark, path), 0, 20200115, 20200405, 20).collect()
    ]
    assert got == [(20200331, 120.0), (20200229, 12.0), (20200131, 3.0)]


def test_descent_finds_every_key_multilevel(tmp_path):
    """500 sorted rows at capacity 3 -> >= 3 levels; for every key, the
    reference descent must land on the leaf that contains it."""
    rng = random.Random(7)
    keys = sorted(
        {(rng.randrange(5), 20200100 + rng.randrange(90), rng.randrange(1000))
         for _ in range(500)}
    )
    rows = [(a, d, t, float(i)) for i, (a, d, t) in enumerate(keys)]
    path = str(tmp_path / "big.db")
    write_btree_file(path, rows, page_size_for_keys(3))

    # leaf membership ground truth: leaves are pages 0..n_leaves-1 in order
    cap = 3
    leaf_of = {}
    for i, row in enumerate(rows):
        leaf_of[(row[0], row[1], row[2])] = i // cap

    for key, leaf in leaf_of.items():
        assert descend(path, key) == leaf, key


def test_reader_filter_pushdown_prunes_and_matches(spark, tmp_path):
    path = str(tmp_path / "golden.db")
    write_btree_file(path, _golden_sorted(), page_size_for_keys(3))
    df = read_prices_db(spark, path).where(
        (F.col("asset_id") == 0) & (F.col("date") == 20200131)
    )
    got = sorted((r.ts, r.value) for r in df.collect())
    assert got == [(0, 1.0), (10, 2.0), (20, 3.0)]


def test_export_from_spark_dataframe(spark, tmp_path):
    path = str(tmp_path / "export.db")
    export_prices_db(golden_prices(spark), path, page_size=page_size_for_keys(3))
    back = read_prices_db(spark, path)
    assert sorted(
        (r.asset_id, r.date, r.ts, r.value) for r in back.collect()
    ) == _golden_sorted()


def test_descent_cap1_tail_steal_degenerate(tmp_path):
    """Capacity-1 pages: inner nodes group 2 children, and an odd leaf
    count triggers the writer's 1-child-tail regroup (the previous group
    donates a child, leaving it with a SINGLE child and zero separator
    keys). Descent through that degenerate inner node must still resolve
    child 0. Exercised for every odd/even count around the steal path."""
    for n in (2, 3, 4, 5, 7, 9, 16, 17):
        keys = [(0, 20200101 + i, 0) for i in range(n)]
        rows = [(a, d, t, float(i)) for i, (a, d, t) in enumerate(keys)]
        path = str(tmp_path / f"cap1_{n}.db")
        write_btree_file(path, rows, page_size_for_keys(1))
        # cap=1: one row per leaf, leaves are pages 0..n-1 in input order
        for i, (a, d, t) in enumerate(keys):
            assert descend(path, (a, d, t)) == i, (n, i)


def test_cap1_roundtrip_via_reader(spark, tmp_path):
    """Full read path (Spark DataSource) over a cap=1 file whose inner
    level contains a 0-separator node (5 leaves -> groups [2,1,2])."""
    rows = [(1, 20200101 + i, i, float(i) * 1.5) for i in range(5)]
    path = str(tmp_path / "cap1_rt.db")
    write_btree_file(path, rows, page_size_for_keys(1))
    back = sorted(
        (r.asset_id, r.date, r.ts, r.value)
        for r in read_prices_db(spark, path).collect()
    )
    assert back == rows
