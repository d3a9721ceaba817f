"""DuckDB oracle comparison — local replica of the driver's correctness
gate (row count + column names + order-insensitive multiset of canonical
row values; floats compared BIT-EXACT).

Floats were originally rounded to 6 decimals here, which round 5 proved
is LOOSER than the driver's hash: ``stats_benford`` passed this gate at
three scale factors yet hashed red on the driver, because the two
engines' ``ROUND(double, 6)`` outputs differed in the final ulp while
agreeing at 6dp.  The gate now compares full float bits — every double
an oracle emits must be the product of an identical correctly-rounded
IEEE op sequence on both engines (or be replaced by fixed-point int64).
"""

from __future__ import annotations

import math
from collections import Counter

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


#: Queries whose float outputs are compared at 6 decimals instead of
#: bit-exact: the truncated-EMA recurrences chain 10-26 dependent
#: multiply-adds whose cross-engine drift is ~1e-12 relative — exact-int64
#: reformulation is impossible (the 26-term MACD's rational-weight common
#: denominator 27^25 overflows int64), and both queries carry GREEN
#: external-hash rows, so the certified tolerance is what the gate pins.
#: Root cause (measured, round 6): DuckDB's evaluation of the
#: ``lag*w + lag*w + ...`` chain itself deviates ~1 ulp from the
#: canonical left-associated IEEE tree on a subset of rows (its window
#: evaluator fuses/reassociates the multiply-add chain), so no SQL
#: formulation of a chained double sum can be bit-equal — unlike single
#: divide/sqrt expressions, which are correctly rounded on both engines.
#: Everything else must be bit-exact.
SIX_DP_QUERIES = frozenset({"ts_ewma", "ts_macd"})

#: EXPECT_ROWS enforcement (round-9 verdict item 2): a hash match over an
#: EMPTY result certifies only the schema and the filter's emptiness —
#: round 8 found 8 queries whose driver rows were exactly that (one, the
#: z-order layout roundtrip, had a structurally dead predicate for 8
#: rounds).  ``compare_query`` therefore FAILS any query whose result is
#: 0-row on both engines at the gate's scale factor, unless the query is
#: listed here with the smallest SF at which it is expected non-empty
#: (empty stays acceptable strictly BELOW that SF — tail-threshold
#: queries legitimately have empty tails on very small samples).  A
#: query empty at EVERY available SF can never be certified non-vacuously
#: and must be recalibrated, not listed.
EMPTY_OK_BELOW_SF: dict[str, float] = {
    "q22_idle_customers": 0.01,  # 0 / 3 / 30 rows at sf0.001/0.01/0.1
}


def _sf_of(sf_dir: str) -> float | None:
    """Parse the scale factor from a testdata dir name (``.../sf0.01``);
    None for synthetic/fixture dirs, which skip the non-empty check."""
    import re

    m = re.search(r"sf(\d+(?:\.\d+)?)/?$", sf_dir)
    return float(m.group(1)) if m else None


def canon_value(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # bit-exact: repr round-trips every finite double uniquely
        return repr(v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(canon_value(x) for x in v)
    if isinstance(v, bytes):
        return v.hex()
    return v


def canon_rows(cols: list[str], rows) -> Counter:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(canon_value(r[i]) for i in order) for r in rows)


#: Absolute float tolerance for SIX_DP_QUERIES.  The certified drift is
#: ~1e-12 relative on O(1..100) values; 1e-6 absolute gives 3+ orders of
#: guard band while still catching any real formula divergence.
_TOL = 1e-6


def compare_rows_tolerant(
    s_cols: list[str], s_rows, o_rows, o_cols: list[str] | None = None
) -> list[str]:
    """Pairwise compare with a float tolerance instead of hashing: the
    old ``round(v, 6)`` canonicalization had banker's-rounding boundaries
    where two values 1 ulp apart straddling x.xxxxxx5 canonicalized
    differently — flaking on exactly the drift the relaxed gate exists to
    tolerate.  Rows are matched by sorting on their non-float columns
    (unique (asset_id, ts)-style keys in every allowlisted query), then
    floats compare with ``abs diff <= _TOL``.

    Each side is indexed by ITS OWN column layout (``o_cols`` defaults to
    ``s_cols``): the two engines are only guaranteed to agree on the
    column NAME SET, not the SELECT-list order, so reading oracle rows at
    Spark positions would compare values cross-column the moment an
    oracle's projection order drifts from the Spark fn's."""
    # standalone-safe: compare_query pre-checks rowcount, but a zip over
    # unequal lengths would silently pass on a prefix match for any other
    # caller (tests, future gates)
    if len(s_rows) != len(o_rows):
        return [f"rowcount mismatch: spark={len(s_rows)} oracle={len(o_rows)}"]
    if o_cols is None:
        o_cols = s_cols
    s_order = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
    o_order = sorted(range(len(o_cols)), key=lambda i: o_cols[i])

    def _key_safe(v) -> bool:
        """May this value participate in the row-matching sort key?  A
        numeric participates only when INTEGRAL, rendered type-blind as
        str(int(v)) — an INT-on-one-engine / DOUBLE-on-the-other key
        column (the affinity the value-compare below tolerates) must
        sort identically on both sides, and a per-VALUE float test
        would misalign the two sorts the moment affinities diverge."""
        if isinstance(v, bool) or not isinstance(v, (int, float)):
            return True
        return not (
            isinstance(v, float) and (math.isnan(v) or not v.is_integer())
        )

    # decide key columns JOINTLY over both sides: a column enters the key
    # iff every value on BOTH engines is key-safe, so the decision (and
    # hence the sort) can never be asymmetric
    keyable = [
        all(_key_safe(r[si]) for r in s_rows)
        and all(_key_safe(r[oi]) for r in o_rows)
        for si, oi in zip(s_order, o_order)
    ]

    def sort_key(order):
        def key(r):
            out = []
            for k, i in zip(keyable, order):
                v = r[i]
                if not k:
                    out.append("")
                elif not isinstance(v, bool) and isinstance(v, (int, float)):
                    out.append(str(int(v)))
                else:
                    out.append(str(canon_value(v)))
            return tuple(out)

        return key

    s_sorted = sorted(s_rows, key=sort_key(s_order))
    o_sorted = sorted(o_rows, key=sort_key(o_order))
    for rn, (sr, orow) in enumerate(zip(s_sorted, o_sorted)):
        for si, oi in zip(s_order, o_order):
            sv, ov = sr[si], orow[oi]
            # a float on either side compares numerically: the engines
            # agree on column names but not necessarily on INT vs DOUBLE
            # affinity for computed columns, and 2 vs 2.0 is not a drift
            both_num = isinstance(sv, (int, float)) and isinstance(
                ov, (int, float)
            ) and not isinstance(sv, bool) and not isinstance(ov, bool)
            if both_num and (isinstance(sv, float) or isinstance(ov, float)):
                if math.isnan(sv) and math.isnan(ov):
                    continue
                if math.isnan(sv) != math.isnan(ov):
                    return [
                        f"nan mismatch at sorted row {rn} col "
                        f"{s_cols[si]}: spark={sv!r} oracle={ov!r}"
                    ]
                if abs(sv - ov) <= _TOL:
                    continue
                return [
                    f"float drift > {_TOL} at sorted row {rn} col "
                    f"{s_cols[si]}: spark={sv!r} oracle={ov!r}"
                ]
            if canon_value(sv) != canon_value(ov):
                return [
                    f"value mismatch at sorted row {rn} col {s_cols[si]}: "
                    f"spark={sv!r} oracle={ov!r}"
                ]
    return []


#: DuckDB output types with no Spark analog.  ``SUM(<integer>)`` types as
#: HUGEINT (int128) in DuckDB while Spark emits BIGINT; the driver's
#: canonicalizer renders the two differently, so a bare integer SUM in an
#: oracle silently hash-mismatches even when every value is identical.
#: This class produced red CORRECTNESS rows in rounds 1 AND 2 — the lint
#: kills it permanently: every oracle must CAST such sums to BIGINT.
_FORBIDDEN_ORACLE_TYPES = ("HUGEINT", "UHUGEINT")


def lint_oracle_types(con, sqls: dict[str, str]) -> list[str]:
    """DESCRIBE every oracle SQL; return problems for any output column
    whose DuckDB type has no faithful Spark twin (HUGEINT/UHUGEINT).

    List-typed columns are allowed (the canonicalizer compares element
    tuples and ``array_agg`` oracles carry green driver rows), but integer
    128-bit types are a hard failure.
    """
    problems: list[str] = []
    for name, sql in sorted(sqls.items()):
        try:
            cols = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as e:  # noqa: BLE001 — surface as a lint problem
            problems.append(f"{name}: DESCRIBE failed: {str(e).splitlines()[0][:200]}")
            continue
        for col_name, col_type, *_ in cols:
            t = str(col_type).upper()
            if any(bad in t for bad in _FORBIDDEN_ORACLE_TYPES):
                problems.append(
                    f"{name}.{col_name}: oracle types as {col_type} "
                    f"(cast to BIGINT — Spark has no int128)"
                )
    return problems


def compare_query(
    spark, con, fn, sql: str, sf_dir: str, name: str | None = None
) -> list[str]:
    """Run one spec both ways; return a list of problems (empty = parity).

    ``name`` selects the per-query float policy (``SIX_DP_QUERIES``);
    callers that omit it get the strict bit-exact comparison."""
    six_dp = name in SIX_DP_QUERIES
    sdf = fn(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [[r[c] for c in s_cols] for r in sdf.collect()]
    o = con.execute(sql)
    o_cols = [d[0] for d in o.description]
    o_rows = o.fetchall()

    problems: list[str] = []
    if sorted(s_cols) != sorted(o_cols):
        problems.append(f"columns spark={sorted(s_cols)} oracle={sorted(o_cols)}")
    if len(s_rows) != len(o_rows):
        problems.append(f"rowcount spark={len(s_rows)} oracle={len(o_rows)}")
    if not problems and not s_rows and name is not None:
        sf = _sf_of(sf_dir)
        if sf is not None and sf >= EMPTY_OK_BELOW_SF.get(name, 0.0):
            problems.append(
                f"EMPTY result at sf={sf}: empty-vs-empty certifies nothing "
                "(recalibrate the predicate, or list in EMPTY_OK_BELOW_SF "
                "with the smallest SF at which rows are expected)"
            )
    if not problems:
        if six_dp:
            problems.extend(
                compare_rows_tolerant(s_cols, s_rows, o_rows, o_cols=o_cols)
            )
        else:
            sc = canon_rows(s_cols, s_rows)
            oc = canon_rows(o_cols, o_rows)
            if sc != oc:
                problems.append(
                    f"values spark-only={list((sc - oc).items())[:3]} "
                    f"oracle-only={list((oc - sc).items())[:3]}"
                )
    return problems
