"""O15 introspection cross-engine pin: the footer-stats manifest
(findb_spark.manifest.build_manifest) must report, per file, exactly
what DuckDB's own footer reader (``parquet_metadata()``) reports for the
same files.  The registered driver query (roundtrip_footer_stats)
certifies manifest == data; this test certifies manifest == footer
bytes as decoded by an independent engine — together they pin the whole
introspection surface: data -> footer -> manifest relation.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def footer_table(spark, sf_dir, tmp_path_factory):
    from findb_spark.prices import prices_from_lineitem

    path = str(tmp_path_factory.mktemp("footer_introspect") / "prices")
    src = prices_from_lineitem(spark, sf_dir).where(F.col("asset_id") % 10 == 7)
    # multi-file layout so the per-FILE granularity is actually exercised
    src.repartitionByRange(4, "date").write.mode("overwrite").parquet(path)
    return path


def _duckdb_per_file_stats(files: list[str], cols: list[str]):
    """Aggregate DuckDB's per-row-group footer stats to per-file min/max
    (the same fold build_manifest performs over row groups)."""
    con = duckdb.connect()
    out: dict[str, dict] = {}
    for f in files:
        nrows = con.execute(
            "SELECT num_rows FROM parquet_file_metadata(?)", [f]
        ).fetchone()[0]
        stats = {"num_rows": nrows}
        for c in cols:
            lo, hi = con.execute(
                """
                SELECT MIN(CAST(stats_min_value AS DOUBLE)),
                       MAX(CAST(stats_max_value AS DOUBLE))
                FROM parquet_metadata(?) WHERE path_in_schema = ?
                """,
                [f, c],
            ).fetchone()
            stats[f"{c}_min"], stats[f"{c}_max"] = lo, hi
        out[f] = stats
    return out


def test_manifest_matches_duckdb_parquet_metadata(spark, footer_table):
    from findb_spark.manifest import build_manifest

    cols = ["asset_id", "date", "value"]
    man = {r.file: r.asDict() for r in build_manifest(spark, footer_table, cols).collect()}
    assert len(man) == 4  # one per range partition
    duck = _duckdb_per_file_stats(sorted(man), cols)
    for f, m in man.items():
        d = duck[f]
        assert m["num_rows"] == d["num_rows"], f
        for c in cols:
            for side in ("min", "max"):
                sv, dv = m[f"{c}_{side}"], d[f"{c}_{side}"]
                # footer stats of ints/doubles are exact stored values:
                # both engines must decode the identical bytes
                assert sv is not None and dv is not None, (f, c, side)
                assert math.isclose(sv, dv, rel_tol=0, abs_tol=0), (f, c, side, sv, dv)


def test_manifest_stats_equal_true_data_extremes(spark, footer_table):
    """Manifest == data (the registered query's contract, pinned in CI at
    sf0.001 too): per-file stats folded over all files equal the global
    extremes of the data itself."""
    from findb_spark.manifest import build_manifest

    man = build_manifest(spark, footer_table, ["date", "value"])
    got = man.agg(
        F.sum("num_rows").alias("n"),
        F.min("date_min").alias("dlo"),
        F.max("date_max").alias("dhi"),
        F.min("value_min").alias("vlo"),
        F.max("value_max").alias("vhi"),
    ).collect()[0]
    df = spark.read.parquet(footer_table)
    want = df.agg(
        F.count("*").alias("n"),
        F.min("date").cast("double").alias("dlo"),
        F.max("date").cast("double").alias("dhi"),
        F.min("value").alias("vlo"),
        F.max("value").alias("vhi"),
    ).collect()[0]
    assert tuple(got) == tuple(want)
