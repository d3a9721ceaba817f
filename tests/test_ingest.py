"""CSV ingestion tests (reference O1 CSV scan + O2 datetime normalization,
file.rs:591-604 + scripts/convert-datetimes.py:22-35)."""

from __future__ import annotations

from findb_spark.asof import asof_point
from findb_spark.ingest import ingest_csv, ingest_json


def test_ingest_normalizes_iso_and_passthrough(spark, tmp_path):
    p = tmp_path / "raw.csv"
    p.write_text(
        "7,2020-01-31,2020-01-31T09:30:00,100.5\n"  # ISO forms
        "7,20200131,40,101.5\n"  # already-normalized ints
    )
    rows = {r.ts: r for r in ingest_csv(spark, str(p)).collect()}
    assert set(rows) == {1580463000, 40}  # epoch('2020-01-31T09:30:00') UTC
    assert all(r.asset_id == 7 and r.date == 20200131 for r in rows.values())


def test_ingest_quarantines_malformed(spark, tmp_path):
    p = tmp_path / "raw.csv"
    p.write_text("1,20200101,10,1.0\nbadrow,notadate,xx,oops\n2,20200101,20,2.0\n")
    good = ingest_csv(spark, str(p))
    assert good.count() == 2
    kept = ingest_csv(spark, str(p), drop_malformed=False)
    assert kept.count() == 3  # malformed fields surface as NULLs, not crashes


def test_ingest_json_matches_csv(spark, tmp_path):
    """JSON source: same normalization contract as CSV, including
    quarantine of malformed records."""
    j = tmp_path / "raw.jsonl"
    j.write_text(
        '{"asset_id": "7", "date": "2020-01-31", "ts": "2020-01-31T09:30:00", "value": "100.5"}\n'
        '{"asset_id": "7", "date": "20200131", "ts": "40", "value": "101.5"}\n'
        '{"asset_id": "bad", "date": "nope", "ts": "xx", "value": "oops"}\n'
    )
    rows = {r.ts: r for r in ingest_json(spark, str(j)).collect()}
    assert set(rows) == {1580463000, 40}
    assert all(r.asset_id == 7 and r.date == 20200131 for r in rows.values())
    assert ingest_json(spark, str(j), drop_malformed=False).count() == 3


def test_ingest_to_asof_roundtrip(spark, tmp_path):
    """Full reference pipeline: CSV -> normalize -> as-of query (golden
    semantics through the ingestion path)."""
    p = tmp_path / "golden.csv"
    p.write_text(
        "0,2020-01-31,0,1.0\n0,2020-01-31,10,2.0\n0,2020-01-31,20,3.0\n"
    )
    prices = ingest_csv(spark, str(p))
    assert [r.value for r in asof_point(prices, 0, 20200131, 15).collect()] == [2.0]


def test_ingest_orc_matches_csv(spark, tmp_path):
    """ORC source: typed columns (int/timestamp) normalize to the same
    canonical schema as the CSV/JSON string paths."""
    from pyspark.sql import functions as F
    from findb_spark.ingest import ingest_orc

    src = spark.createDataFrame(
        [(7, "2020-01-31", "2020-01-31T09:30:00", 100.5), (7, "20200131", "40", 101.5)],
        "asset_id int, date string, ts string, value double",
    )
    path = str(tmp_path / "raw_orc")
    src.write.orc(path)
    rows = {r.ts: r for r in ingest_orc(spark, path).collect()}
    assert set(rows) == {1580463000, 40}
    assert all(r.asset_id == 7 and r.date == 20200131 for r in rows.values())
    assert rows[40].value == 101.5


def test_ingest_binary_reads_files(spark, tmp_path):
    from findb_spark.ingest import ingest_binary

    (tmp_path / "a.bin").write_bytes(b"\x00\x01\x02payload")
    (tmp_path / "b.bin").write_bytes(b"other")
    (tmp_path / "skip.txt").write_bytes(b"nope")
    df = ingest_binary(spark, str(tmp_path), glob="*.bin")
    rows = {r.path.rsplit("/", 1)[-1]: (r.length, bytes(r.content)) for r in df.collect()}
    assert rows == {
        "a.bin": (10, b"\x00\x01\x02payload"),
        "b.bin": (5, b"other"),
    }
    # length predicate prunes before content is read
    assert df.where("length > 5").count() == 1


def test_ingest_text_log_parses_and_quarantines(spark, tmp_path):
    from findb_spark.ingest import ingest_text_log

    log = tmp_path / "prices.log"
    log.write_text(
        "PRICE asset=3 date=20200101 value=1.5\n"
        "PRICE asset=4 date=20200202 value=2.25\n"
        "GARBAGE line without fields\n"
        "PRICE asset=x date=20200303 value=9.0\n"  # malformed asset -> dropped
    )
    df = ingest_text_log(
        spark,
        str(log),
        r"PRICE asset=(\d+) date=(\d+) value=([0-9.]+)",
        {"asset_id": "bigint", "date": "int", "value": "double"},
    )
    rows = {(r.asset_id, r.date, r.value) for r in df.collect()}
    assert rows == {(3, 20200101, 1.5), (4, 20200202, 2.25)}


def test_ingest_text_log_empty_optional_capture_survives(spark, tmp_path):
    """drop_malformed gates on WHOLE-pattern match: a line whose optional
    capture group is legitimately empty (tag reads as NULL) must survive,
    while a line that doesn't match the shape at all is still dropped."""
    from findb_spark.ingest import ingest_text_log

    log = tmp_path / "tagged.log"
    log.write_text(
        "EVT id=1 tag=alpha\n"
        "EVT id=2 tag=\n"  # empty optional capture: keep, tag NULL
        "not a log line\n"  # no pattern match: drop
    )
    df = ingest_text_log(
        spark,
        str(log),
        r"EVT id=(\d+) tag=(\w*)",
        {"id": "bigint", "tag": "string"},
    )
    rows = {(r.id, r.tag) for r in df.collect()}
    assert rows == {(1, "alpha"), (2, None)}
