"""CLI surface (python -m findb_spark) — the reference-binary analog."""

from __future__ import annotations

from findb_spark.__main__ import main


def test_cli_list(capsys):
    assert main(["list"]) == 0
    out = capsys.readouterr().out
    assert "q1_pricing_summary" in out and "dedup_minhash_lsh" in out


def test_cli_asof_and_sql(spark, sf_dir, capsys):
    assert main(["--sf-dir", sf_dir, "asof", "--asset", "0",
                 "--start", "19960101", "--end", "19981231"]) == 0
    assert "asset_id" in capsys.readouterr().out
    assert main(["--sf-dir", sf_dir, "sql",
                 "SELECT COUNT(*) AS n FROM lineitem"]) == 0
    assert "6000" in capsys.readouterr().out


def test_cli_unknown_query(spark, capsys):
    assert main(["query", "no_such_query"]) == 2
