"""Versioned-table (time travel) semantics + round-5 analytics pins:
version immutability, manifest resolution, Bloom-join plan shape, and the
k-core fixed-round-count fixpoint claim."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from findb_spark.versioning import list_versions, read_version, write_version


def _df(spark, rows):
    return spark.createDataFrame(rows, "k BIGINT, v STRING")


def test_version_commit_and_resolution(spark, tmp_path):
    t = str(tmp_path / "tbl")
    assert list_versions(t) == {}
    v1 = write_version(_df(spark, [(1, "a"), (2, "b")]), t)
    v2 = write_version(_df(spark, [(1, "a2")]), t)
    assert (v1, v2) == (1, 2)
    assert sorted(list_versions(t)) == [1, 2]
    # as-of read returns the committed snapshot, latest resolves to v2
    assert sorted(r.v for r in read_version(spark, t, 1).collect()) == ["a", "b"]
    assert [r.v for r in read_version(spark, t).collect()] == ["a2"]


def test_version_immutability_under_append(spark, tmp_path):
    t = str(tmp_path / "tbl")
    write_version(_df(spark, [(1, "x")]), t)
    before = read_version(spark, t, 1).collect()
    # three more commits; v1 must be byte-stable
    for i in range(2, 5):
        write_version(_df(spark, [(i, f"y{i}")]), t)
    assert read_version(spark, t, 1).collect() == before
    assert sorted(list_versions(t)) == [1, 2, 3, 4]


def test_version_errors(spark, tmp_path):
    t = str(tmp_path / "none")
    with pytest.raises(FileNotFoundError):
        read_version(spark, t)
    write_version(_df(spark, [(1, "a")]), t)
    with pytest.raises(KeyError):
        read_version(spark, t, 99)


def _explain(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bloom_join_broadcasts_bitmap(spark, sf_dir):
    """The 2048-word Bloom bitmap must reach lineitem as a broadcast on
    BOTH probes — a shuffle here would defeat the runtime-filter point."""
    from findb_spark.queries.stats_queries import bloom_prefilter_join

    plan = _explain(bloom_prefilter_join(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 3  # 2 word probes + verify semi


def test_kcore_fixed_rounds_reach_fixpoint(spark, sf_dir):
    """graph_kcore peels a FIXED 5 rounds (mirroring the oracle); this pins
    the convergence claim — one extra peel must not change the result."""
    from findb_spark.ops.dedup import minhash_lsh_pairs
    from findb_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents")
    pairs = (
        minhash_lsh_pairs(docs, threshold=0.4)
        .select("doc1", "doc2")
        .localCheckpoint(eager=True)
    )
    e = pairs.select(
        F.col("doc1").alias("a"), F.col("doc2").alias("b")
    ).unionAll(pairs.select(F.col("doc2").alias("a"), F.col("doc1").alias("b")))
    e = e.localCheckpoint(eager=True)

    def peel(e):
        deg = e.groupBy("a").agg(F.count("*").alias("deg"))
        keep = deg.where(F.col("deg") >= 2).select("a")
        return (
            e.join(keep, "a", "semi")
            .join(keep.select(F.col("a").alias("b")), "b", "semi")
        ).localCheckpoint(eager=True)

    for _ in range(5):
        e = peel(e)
    extra = peel(e)
    assert e.count() == extra.count()
    got = {(r.a, r.b) for r in e.collect()}
    assert got == {(r.a, r.b) for r in extra.collect()}


def test_vacuum_expires_old_versions(spark, tmp_path):
    from findb_spark.versioning import (
        list_versions,
        read_version,
        vacuum,
        write_version,
    )

    table = str(tmp_path / "t")
    for i in range(1, 5):
        write_version(
            spark.createDataFrame([(i, i * 10)], "k int, v int"), table
        )
    assert sorted(list_versions(table)) == [1, 2, 3, 4]

    expired = vacuum(table, keep_last=2)
    assert expired == [1, 2]
    assert sorted(list_versions(table)) == [3, 4]
    # retained versions stay readable (latest + explicit)
    assert read_version(spark, table).collect()[0].k == 4
    assert read_version(spark, table, version=3).collect()[0].k == 3
    # expired version resolution fails loudly
    import pytest as _pytest

    with _pytest.raises(KeyError):
        read_version(spark, table, version=1)
    # vacuum is idempotent
    assert vacuum(table, keep_last=2) == []
    # new writes continue the version sequence (no number reuse)
    v = write_version(spark.createDataFrame([(5, 50)], "k int, v int"), table)
    assert v == 5
