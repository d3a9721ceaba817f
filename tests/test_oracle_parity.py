"""Every registered query with an oracle must hash-match DuckDB at sf0.001
— the in-suite replica of the driver's t2 correctness gate."""

from __future__ import annotations

import pytest

from findb_spark.oracle import compare_query, duck_connection, lint_oracle_types
from findb_spark.registry import all_specs


def _specs():
    return sorted(all_specs().values(), key=lambda s: s.name)


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duck_connection(sf_dir)
    yield c
    c.close()


def test_no_hugeint_oracle_columns(con):
    """DuckDB types SUM(<integer>) as HUGEINT; the driver canonicalizer
    renders int128 differently from Spark's BIGINT, so such oracles
    hash-FAIL at the driver while passing locally (red rows in rounds 1
    and 2).  Lint every oracle's DESCRIBE output so the class stays dead."""
    sqls = {s.name: s.sql for s in _specs() if s.sql is not None}
    problems = lint_oracle_types(con, sqls)
    assert not problems, "\n".join(problems)


@pytest.mark.parametrize("spec", _specs(), ids=lambda s: s.name)
def test_oracle_parity(spark, con, sf_dir, spec):
    if spec.sql is None:
        # rows-only check (non-SQL-expressible op)
        spec.fn(spark, sf_dir).count()
        return
    problems = compare_query(spark, con, spec.fn, spec.sql, sf_dir, name=spec.name)
    assert not problems, f"{spec.name}: {problems}"
