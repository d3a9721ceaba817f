"""Golden-parity tests for the bitemporal as-of operator.

Fixture and expectations verbatim from the reference end-to-end test
(file.rs:613-697): 18 rows, 4 queries, exact values in exact descending-date
order.
"""

from __future__ import annotations

import pytest

from findb_spark.asof import asof_batch, asof_point, asof_range, add_revisions
from findb_spark.prices import golden_prices

# (asset_id, start_date, end_date, asof_ts, expected values desc-date)
GOLDEN_QUERIES = [
    (0, 20200131, 20200131, 20, [3.0]),
    (0, 20200131, 20200131, 15, [2.0]),
    (0, 20200115, 20200405, 20, [120.0, 12.0, 3.0]),
    (1, 20200315, 20200515, 21, [2200.0, 220.0]),
]


@pytest.fixture(scope="module")
def prices(spark):
    return golden_prices(spark).cache()


@pytest.mark.parametrize("asset,start,end,asof,expected", GOLDEN_QUERIES)
def test_asof_range_golden(prices, asset, start, end, asof, expected):
    rows = asof_range(prices, asset, start, end, asof).collect()
    assert [r.value for r in rows] == expected
    dates = [r.date for r in rows]
    assert dates == sorted(dates, reverse=True)
    assert all(r.asset_id == asset for r in rows)


def test_asof_point(prices):
    rows = asof_point(prices, 0, 20200229, 15).collect()
    assert [r.value for r in rows] == [12.0]
    # asof before any revision -> empty
    assert asof_point(prices, 0, 20200229, 4).count() == 0


def test_asof_unknown_asset_empty(prices):
    assert asof_range(prices, 99, 20200101, 20201231, 100).count() == 0


def test_asof_batch_golden(spark, prices):
    queries = spark.createDataFrame(
        [
            (i, a, s, e, t)
            for i, (a, s, e, t, _) in enumerate(GOLDEN_QUERIES)
        ],
        schema="query_id BIGINT, asset_id BIGINT, start_date INT, end_date INT, asof_ts BIGINT",
    )
    out = asof_batch(prices, queries).collect()
    by_id: dict[int, list[float]] = {}
    for r in out:
        by_id.setdefault(r.query_id, []).append(r.value)
    for i, (_, _, _, _, expected) in enumerate(GOLDEN_QUERIES):
        assert by_id.get(i, []) == expected, f"query {i}"


def test_add_revisions_bitemporal(spark, prices):
    """Appending a later-ts revision changes late as-of reads, not earlier ones
    (reference update semantics, mem.rs:433-437, re-expressed bitemporally)."""
    rev = spark.createDataFrame(
        [(0, 20200131, 30, 99.0)],
        schema="asset_id BIGINT, date INT, ts BIGINT, value DOUBLE",
    )
    revised = add_revisions(prices, rev)
    assert [r.value for r in asof_point(revised, 0, 20200131, 30).collect()] == [99.0]
    assert [r.value for r in asof_point(revised, 0, 20200131, 20).collect()] == [3.0]


def test_entry_flagship_bytes_pinned(spark):
    """Driver-style HASH smoke for __spark_entry__.entry() at sf0.001: the
    flagship as-of range query's exact canonical bytes are pinned in CI,
    not only in the per-round driver window (round-6 verdict item 8).
    The digest covers sorted column names, row count, and the
    order-insensitive multiset of canonical row values — the same
    canonicalization the local oracle gate uses (bit-exact floats)."""
    import hashlib
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "spark_entry_under_test", "/root/repo/__spark_entry__.py"
    )
    se = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(se)
    df = se.entry(spark)

    from findb_spark.oracle import canon_rows

    cols = df.columns
    rows = [[r[c] for c in cols] for r in df.collect()]
    assert sorted(cols) == ["asset_id", "date", "ts", "value"]
    assert len(rows) == 23
    digest = hashlib.sha256(
        repr(sorted(canon_rows(cols, rows).items())).encode()
    ).hexdigest()
    assert (
        digest
        == "bdc9b22f956e7d09b1c5b142c851edc769094fd2705a3d7b376ba0b38764addb"
    )
