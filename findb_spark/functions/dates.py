"""Arithmetic calendar-integer derivations (round 14, guide §1.2 per-task
work).

``date_format(col, "yyyyMMdd")`` formats every row into a STRING through a
DateTimeFormatter and then casts it back to int — one UTF8String allocation
plus a formatter walk per evaluation, and Catalyst evaluates the expression
again for every derived filter it pushes below the defining Project
(measured: the asof_batch scan evaluated it 3x per surviving lineitem row —
twice in the pushed date-bound Filter, once in the Project — the dominant
allocation churn of the whole asof family at bench SF).  The arithmetic
form extracts the same calendar fields as pure integer ops: bit-identical
output (year/month/day are timezone-free on DATE and TIMESTAMP_NTZ inputs,
and ``date_format`` under the pinned UTC session reads the same wall-clock
fields; verified 0 of 600k rows differing on the real lineitem domain plus
the DuckDB-oracle sweep over every consumer), no strings, no allocations.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def yyyymmdd_int(col: str | Column) -> Column:
    """``CAST(date_format(col, 'yyyyMMdd') AS INT)`` without the string:
    year*10000 + month*100 + day as a plain INT column."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.year(c) * F.lit(10000) + F.month(c) * F.lit(100) + F.dayofmonth(c)
    ).cast("int")


def yyyymm_int(col: str | Column) -> Column:
    """``CAST(date_format(col, 'yyyyMM') AS INT)`` without the string."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.year(c) * F.lit(100) + F.month(c)).cast("int")
