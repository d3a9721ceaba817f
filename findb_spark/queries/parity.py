"""Cross-engine numeric parity helpers.

Problem: a double sum is order-dependent (Spark partial aggregation vs
DuckDB sequential differ by ~1e-5 absolute at sf0.1), and double->DECIMAL
casts round differently between engines on computed products (observed:
cent-level diffs on TPC-H Q1 sum_disc_price).

Solution: fixed-point integer sums. Per row, ``floor(x * scale + 0.5)`` is
computed in *double* arithmetic — bit-identical on any IEEE-754 engine —
yielding an exact integer; the sum of integers is exact and
order-independent; the final ``CAST(sum AS DOUBLE) / scale`` is again a
single identical double op. Works for any engine pair, no decimal types.

Range: at scale=100, per-row values up to ~9e16 fit; a 100 TB lineitem
(~1e12 rows x 1e7 cents) sums to ~1e19 — at that scale switch the final
accumulation to DECIMAL(38,0) (Spark sum(long) overflows silently only
outside ANSI; ANSI mode, which we run, raises instead). The driver scale
factors are far below this.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def fxp_sum(expr: Column, alias: str, scale: int = 100) -> Column:
    """Order-independent fixed-point sum of a double expression (Spark)."""
    return (F.sum(F.floor(expr * scale + F.lit(0.5))).cast("double") / scale).alias(alias)


def fxp_sum_sql(expr: str, scale: int = 100) -> str:
    """DuckDB twin of `fxp_sum` (without alias)."""
    return f"CAST(SUM(CAST(FLOOR(({expr}) * {scale} + 0.5) AS BIGINT)) AS DOUBLE) / {scale}"


def fxp_avg(expr: Column, alias: str, scale: int = 100) -> Column:
    """Order-independent mean: exact fixed-point sum, then two double divides."""
    return (
        F.sum(F.floor(expr * scale + F.lit(0.5))).cast("double") / scale / F.count("*")
    ).alias(alias)


def fxp_avg_sql(expr: str, scale: int = 100) -> str:
    return (
        f"CAST(SUM(CAST(FLOOR(({expr}) * {scale} + 0.5) AS BIGINT)) AS DOUBLE)"
        f" / {scale} / COUNT(*)"
    )
