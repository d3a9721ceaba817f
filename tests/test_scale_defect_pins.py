"""Regression pins for the latent scale defects the round-11 full
sf0.1 sweep exposed (on freshly regenerated testdata), plus the one
volume-unbounded sibling the round-11 class audit flagged
(events_burstiness, fixed round 12).

These defects share a property that makes them invisible to every
test-scale gate: at sf0.001/0.01 the broken forms also work (int64
moments don't overflow, daily series are dense), so nothing would catch
a revert until real volume hits it again.  Each pin below rebuilds the
triggering condition SYNTHETICALLY — moments big enough that the old
``n*sq - s*s`` int64 form throws ARITHMETIC_OVERFLOW under ANSI mode,
and a date-sparse series whose per-day pair alignment is empty — and
runs the REAL registered query fn against it (monkey-loaded input, the
tests/test_analytics.py precedent), asserting both survival and the
exact value against an independently computed expectation."""

from __future__ import annotations

import math

import pytest


def _monkey_orders(monkeypatch, spark, df):
    import findb_spark.queries.stats_queries as sq

    monkeypatch.setattr(sq, "load_table", lambda s, d, n: df)
    return sq


# deterministic synthetic totals: v(i) = 100_000 + (i * 7919) % 300_000
# (dollar-int already, so FLOOR(v + 0.5) == v and the expectation needs
# no float quantization modeling)
def _vals(n, offset=0):
    return [100_000 + ((i + offset) * 7919) % 300_000 for i in range(n)]


def test_welch_survives_overflow_scale_moments(spark, monkeypatch):
    """40k-row cohorts of ~1e5-dollar totals: n*sq ~ 1e20 overflows the
    pre-round-11 int64 form (reverting the fix makes THIS test throw
    ARITHMETIC_OVERFLOW); the double-tree form must complete and match
    the Welch t computed independently in Python floats with the same
    operation order."""
    n = 40_000
    v1, v2 = _vals(n), _vals(n, offset=1)
    rows = [("1-URGENT", float(v)) for v in v1] + [
        ("5-LOW", float(v)) for v in v2
    ]
    df = spark.createDataFrame(
        rows, "o_orderpriority string, o_totalprice double"
    )
    sq = _monkey_orders(monkeypatch, spark, df)
    # the overflow the old form hits: n * sum(v^2) far past 2^63
    assert n * sum(x * x for x in v1) > 2**63
    r = sq.stats_welch_ttest(spark, "unused").collect()[0]
    s1, s2 = sum(v1), sum(v2)
    q1, q2 = sum(x * x for x in v1), sum(x * x for x in v2)
    var1 = (float(q1) - float(s1) * s1 / n) / (n - 1) / n
    var2 = (float(q2) - float(s2) * s2 / n) / (n - 1) / n
    expect = (float(s1) / n - float(s2) / n) / math.sqrt(var1 + var2)
    assert r.n1 == r.n2 == n
    assert r.t_stat == pytest.approx(expect, rel=1e-12)


def test_anova_survives_overflow_scale_moments(spark, monkeypatch):
    """Five 16k-row groups: per-group s ~ 4e9 so s*s ~ 1.6e19 overflows
    the pre-round-11 int64 square; the DOUBLE-squared form must complete
    with the exact fxp-quantized between/within decomposition."""
    grps = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    n = 16_000
    data = {g: _vals(n, offset=i * 3) for i, g in enumerate(grps)}
    rows = [(g, float(v)) for g, vs in data.items() for v in vs]
    df = spark.createDataFrame(
        rows, "o_orderpriority string, o_totalprice double"
    )
    sq = _monkey_orders(monkeypatch, spark, df)
    assert max(sum(vs) for vs in data.values()) ** 2 > 2**63
    r = sq.stats_anova_f(spark, "unused").collect()[0]
    k, n_tot = len(grps), n * len(grps)
    s_tot = sum(sum(vs) for vs in data.values())
    sq_tot = sum(x * x for vs in data.values() for x in vs)
    sum_sg2 = (
        sum(
            math.floor(float(sum(vs)) * sum(vs) / n * 100 + 0.5)
            for vs in data.values()
        )
        / 100.0
    )
    ssb = (sum_sg2 - float(s_tot) * s_tot / n_tot) / (k - 1)
    ssw = (float(sq_tot) - sum_sg2) / (n_tot - k)
    assert r.k == k and r.n_tot == n_tot
    assert r.f_stat == pytest.approx(ssb / ssw, rel=1e-12)


def test_burstiness_survives_overflow_scale_moments(spark, monkeypatch):
    """One 4M-row hour plus 1M single-row hours: the pre-round-12 exact
    form ``n_hours * sq - s * s`` has n_hours·sq ≈ 1.6e19 > 2^63, so
    reverting the double-tree fix makes THIS test throw
    ARITHMETIC_OVERFLOW under ANSI mode; the fixed form must complete
    and match the Fano factor computed independently in Python floats
    with the same operation order.  Rows are generated JVM-side
    (spark.range), so the 5M-row trigger costs seconds, not minutes."""
    import pyspark.sql.functions as F

    import findb_spark.queries.events_analytics as ea

    H, NBIG = 1_000_000, 4_000_000
    base = 1_577_836_800  # 2020-01-01T00:00:00Z
    sparse = spark.range(H).select(
        F.lit("burst").alias("event_type"),
        F.timestamp_seconds(F.lit(base) + (F.col("id") + 1) * 3600).alias("ts"),
    )
    dense = spark.range(NBIG).select(
        F.lit("burst").alias("event_type"),
        F.timestamp_seconds(F.lit(base)).alias("ts"),
    )
    monkeypatch.setattr(ea, "load_table", lambda s, d, n: sparse.union(dense))
    n_hours, s, sq = H + 1, H + NBIG, H + NBIG * NBIG
    # the overflow the old form hits: n_hours * sq far past 2^63
    assert n_hours * sq > 2**63
    r = ea.events_burstiness(spark, "unused").collect()[0]
    mean = float(s) / n_hours
    var = (float(sq) - float(s) * s / n_hours) / n_hours
    assert r.n_hours == n_hours
    assert r.mean_per_hour == pytest.approx(mean, rel=1e-12)
    assert r.var_per_hour == pytest.approx(var, rel=1e-12)
    assert r.fano_factor == pytest.approx(var / mean, rel=1e-12)


def test_modularity_q_survives_overflow_scale_edge_counts(spark):
    """Edge counts near 1.5e9 pairs (realistic for template-heavy corpora
    at 100 TB): the pre-round-12 single-sum numerator 4*m*e_s - D_s^2 is
    quadratic in the edge count and throws ARITHMETIC_OVERFLOW under ANSI
    (asserted below on the same inputs); the split form — int64 sum(e_s)
    plus exact DECIMAL sum(D_s^2) — must complete through the REAL
    production seam (_modularity_q) and match the Q computed independently
    in Python floats with the same operation order."""
    from pyspark.sql import functions as F

    import findb_spark.queries.dedup_queries as dq

    m_val = 1_800_000_000
    per_rows = [
        ("s0", 1_600_000_000, 3_400_000_000),
        ("s1", 150_000_000, 200_000_000),
    ]
    per = spark.createDataFrame(
        per_rows, "source string, intra_edges long, degree_sum long"
    )
    m = spark.createDataFrame([(m_val,)], "m long")
    # the overflow the old form hits: 4*m*e_s ~ 1.15e19 > 2^63
    assert 4 * m_val * per_rows[0][1] > 2**63
    with pytest.raises(Exception, match="(?i)overflow"):
        per.crossJoin(F.broadcast(m)).agg(
            F.sum(
                4 * F.col("m") * F.col("intra_edges")
                - F.col("degree_sum") * F.col("degree_sum")
            ).cast("bigint")
        ).collect()
    got = dq._modularity_q(per, m).collect()
    sum_intra = sum(r[1] for r in per_rows)
    sum_d2 = sum(r[2] * r[2] for r in per_rows)
    expect = float(sum_intra) / m_val - float(sum_d2) / (
        float(m_val) * m_val * 4
    )
    assert len(got) == 2
    for r in got:
        assert r.q_modularity == pytest.approx(expect, rel=1e-12)


def test_hourly_anomaly_survives_overflow_scale_moments(spark, monkeypatch):
    """One user with a 4M-event hour plus 700k single-event hours: the
    pre-round-12 variance form n_h*ss - s*s has n_h*ss ~ 1.1e19 > 2^63
    (reverting the double-tree fix makes THIS test throw under ANSI);
    the fixed form must complete and flag exactly the hot hour with the
    z computed independently in Python floats, same operation order."""
    import pyspark.sql.functions as F

    import findb_spark.queries.events_queries as eq

    H, C = 700_000, 4_000_000
    base = 1_577_836_800  # 2020-01-01T00:00:00Z
    sparse = spark.range(H).select(
        F.lit(1).cast("long").alias("user_id"),
        F.timestamp_seconds(F.lit(base) + (F.col("id") + 1) * 3600).alias("ts"),
    )
    dense = spark.range(C).select(
        F.lit(1).cast("long").alias("user_id"),
        F.timestamp_seconds(F.lit(base)).alias("ts"),
    )
    monkeypatch.setattr(eq, "load_table", lambda s, d, n: sparse.union(dense))
    n_h, s, ss = H + 1, H + C, H + C * C
    # the overflow the old form hits: n_h * ss far past 2^63
    assert n_h * ss > 2**63
    got = eq.events_hourly_anomaly(spark, "unused").collect()
    mean = float(s) / n_h
    var = (float(ss) - float(s) * s / n_h) / n_h
    expect_z = (float(C) - mean) / math.sqrt(var)
    assert len(got) == 1 and got[0].cnt == C
    assert got[0].z == pytest.approx(expect_z, rel=1e-12)


def test_assortativity_survives_overflow_scale_hub_degrees(spark):
    """Hub-star moments: sum(x*x) over edge ends is degree-cubic with
    linear row compute, so the pre-round-12 int64 sum overflows at
    feasible hub sizes — a single row with x = 3.1e9 (one 3.1e9-edge
    hub's endpoint) already trips the per-row square under ANSI
    (asserted); the DECIMAL path must complete, and the combine seam
    must match the d=1e8 star's assortativity computed independently in
    Python floats with the same operation order."""
    import pyspark.sql.functions as F

    import findb_spark.queries.graph_quality_queries as gq

    big = spark.createDataFrame([(3_100_000_000,)], "x long")
    assert 3_100_000_000**2 > 2**63
    with pytest.raises(Exception, match="(?i)overflow"):
        big.agg(F.sum(F.col("x") * F.col("x"))).collect()
    # the decimal form completes on the same input
    dec = F.col("x").cast("decimal(18,0)")
    [r] = big.agg(F.sum(dec * dec).alias("sxx")).collect()
    assert int(r.sxx) == 3_100_000_000**2
    # combine seam on a d=1e8 hub star's exact moments (sxx = d^3 + d
    # ~ 1e24, far past int64; values here are literals — building the
    # 1e8-row relation is pointless when the moments are closed-form)
    d = 100_000_000
    n, sx, sxy, sxx = 2 * d, d * d + d, 2 * d * d, d**3 + d
    m = spark.sql(
        f"SELECT CAST({n} AS BIGINT) AS n,"
        f" CAST({sx} AS DECIMAL(38,0)) AS sx,"
        f" CAST({sx} AS DECIMAL(38,0)) AS sy,"
        f" CAST({sxy} AS DECIMAL(38,0)) AS sxy,"
        f" CAST({sxx} AS DECIMAL(38,0)) AS sxx,"
        f" CAST({sxx} AS DECIMAL(38,0)) AS syy"
    )
    [row] = gq._assortativity_combine(m).collect()
    num = float(sxy) - float(sx) * sx / n
    den = float(sxx) - float(sx) * sx / n
    expect = num / math.sqrt(den * den)
    assert row.n_edge_ends == n
    assert row.assortativity == pytest.approx(expect, rel=1e-12)
    # a star is maximally disassortative: the statistic must be -1ish
    assert row.assortativity < -0.99


def test_chi2_expected_counts_survive_overflow_scale_marginals(spark):
    """Contingency marginals of a 1e12-event corpus (row_tot 7e9 x
    col_tot 1.4e11): the pre-round-12 exact product row_tot*col_tot is
    ~9.8e20 > 2^63 and throws under ANSI (asserted); the double-tree
    expected-count form inside the shared production seam
    (_chi2_term_expr, used by stats_chi2_independence AND
    stats_cramers_v) must complete and match the term computed
    independently in Python floats with the same operation order."""
    from pyspark.sql import functions as F

    import findb_spark.queries.stats_queries as sq

    rt, ct, g = 7_000_000_000, 140_000_000_000, 1_000_000_000_000
    cells = spark.createDataFrame(
        [(200, rt, ct, g)], "o long, row_tot long, col_tot long, grand long"
    )
    assert rt * ct > 2**63
    with pytest.raises(Exception, match="(?i)overflow"):
        cells.select(
            F.expr("CAST(row_tot * col_tot AS DOUBLE) / grand")
        ).collect()
    [r] = cells.select(F.expr(sq._chi2_term_expr()).alias("t")).collect()
    e = float(rt) * ct / g
    expect = math.floor((200 - e) * (200 - e) / e * 1000000 + 0.5)
    assert r.t == expect


def test_gini_survives_overflow_scale_rank_revenue_sum(spark, monkeypatch):
    """2M customers at 1e7 revenue cents: sum(rank*revenue) ~ 2e19 > 2^63,
    so the pre-round-12 int64 accumulation throws under ANSI (asserted on
    the moment shape); the DECIMAL form must complete through the REAL
    registered query and hit the closed form — equal revenues give gini
    exactly as the double tree computes it (~0)."""
    import pyspark.sql.functions as F

    import findb_spark.queries.stats_queries as sq

    # the accumulation overflow the old form hits, on the same moment
    # shape (10 rows whose i*r products sum past 2^63)
    ten = spark.range(10).select(
        F.lit(1_000_000_000_000).alias("i"), F.lit(10_000_000).alias("r")
    )
    with pytest.raises(Exception, match="(?i)overflow"):
        ten.agg(F.sum(F.col("i") * F.col("r"))).collect()
    n, price = 2_000_000, 100_000.0  # r = 1e7 cents/customer
    orders = spark.range(n).select(
        F.col("id").alias("o_custkey"), F.lit(price).alias("o_totalprice")
    )
    monkeypatch.setattr(sq, "load_table", lambda s, d, t: orders)
    r = round(price * 100)
    sir, sr = r * n * (n + 1) // 2, n * r
    assert 2 * sir > 2**63  # the real query's old int64 sum would throw
    [row] = sq.stats_gini_revenue(spark, "unused").collect()
    expect = (2 * float(sir) - (n + 1) * float(sr)) / (n * float(sr))
    assert row.n_customers == n
    assert row.gini == pytest.approx(expect, abs=1e-15)
    assert abs(row.gini) < 1e-9  # equal revenues: zero concentration


def test_simpson_moment_forms_survive_overflow_scale_counts(spark):
    """Per-source doc counts past 3e9 (fixed-cardinality source/lang keys
    make per-cell counts grow linearly with corpus volume): the pre-
    round-12 int64 forms cnt*cnt and tot*tot throw under ANSI (asserted);
    the DECIMAL square and the double-tree divides — the exact expression
    forms now in stats_simpson_diversity — must complete and match Python
    floats with the same operation order.  Form-level pin: the trigger
    needs 3e9 physical rows through COUNT(*), which no test can generate;
    the production forms are string-identical to the query (grep-able)."""
    import pyspark.sql.functions as F

    cnt = 3_100_000_000
    one = spark.createDataFrame([(cnt,)], "cnt long")
    assert cnt * cnt > 2**63
    with pytest.raises(Exception, match="(?i)overflow"):
        one.agg(F.sum(F.col("cnt") * F.col("cnt"))).collect()
    [r1] = one.agg(
        F.sum(
            F.col("cnt").cast("decimal(18,0)") * F.col("cnt").cast("decimal(18,0)")
        ).alias("ssq")
    ).collect()
    assert int(r1.ssq) == cnt * cnt
    s = spark.createDataFrame([(cnt, cnt * 2)], "tot long, sq2 long").selectExpr(
        "tot", "CAST(sq2 AS DECIMAL(38,0)) * sq2 AS ssq"  # 4*cnt^2, decimal
    )
    with pytest.raises(Exception, match="(?i)overflow"):
        s.selectExpr("CAST(ssq AS DOUBLE) / (tot * tot)").collect()
    [r2] = s.selectExpr(
        "1 - CAST(ssq AS DOUBLE) / (CAST(tot AS DOUBLE) * tot) AS simpson",
        "CAST(tot AS DOUBLE) * tot / CAST(ssq AS DOUBLE) AS eff",
    ).collect()
    ssq = (cnt * 2) * (cnt * 2)
    assert r2.simpson == pytest.approx(
        1 - float(ssq) / (float(cnt) * cnt), rel=1e-12
    )
    assert r2.eff == pytest.approx(float(cnt) * cnt / float(ssq), rel=1e-12)


def test_corr_matrix_monthly_alignment_survives_sparse_series(
    spark, monkeypatch
):
    """Two assets that NEVER trade on the same day but cover the same
    months: the pre-round-11 per-day alignment returns an empty matrix
    (the sf0.1 failure shape — assets outgrow per-asset observations);
    the month-end alignment must produce the pair with one row per
    shared month and the exact Pearson of the month-end values."""
    # asset 1 trades the 3rd and 7th, asset 2 the 10th and 21st -> zero
    # shared dates, 6 shared months of 1995
    rows = []
    m_end = {1: [], 2: []}
    for m in range(1, 7):
        for aid, days, base in ((1, (3, 7), 100.0), (2, (10, 21), 50.0)):
            for d in days:
                val = base + m * (1.0 if aid == 1 else -2.0) + d * 0.01
                rows.append((aid, 19950100 + m * 100 + d, val))
            m_end[aid].append(round(val * 100))  # last day listed wins
    daily = spark.createDataFrame(rows, "asset_id long, date int, value double")
    import findb_spark.queries.timeseries as ts

    monkeypatch.setattr(ts, "_daily", lambda s, d: daily)
    # the old per-day join has nothing to align on
    assert (
        daily.alias("a")
        .join(
            daily.alias("b"),
            "date",
        )
        .where("a.asset_id < b.asset_id")
        .count()
        == 0
    )
    got = ts.corr_matrix_assets(spark, "unused").collect()
    assert len(got) == 1 and got[0].a1 == 1 and got[0].a2 == 2
    assert got[0].n == 6
    x, y = m_end[1], m_end[2]
    n = len(x)
    num = float(n) * sum(a * b for a, b in zip(x, y)) - float(sum(x)) * sum(y)
    den = math.sqrt(
        float(n) * sum(a * a for a in x) - float(sum(x)) * sum(x)
    ) * math.sqrt(float(n) * sum(b * b for b in y) - float(sum(y)) * sum(y))
    assert got[0].corr == pytest.approx(num / den, rel=1e-12)


def test_moment_accumulator_int64_sum_overflows_decimal_survives(spark):
    """Round-13 accumulator pin (advisor): the round-12 double-tree fixes
    removed the COMBINE overflow (n*sq - s*s), but an int64 ACCUMULATOR
    ``SUM(cnt*cnt)`` itself overflows once the squared terms total past
    2^63 — the regime one event type with ~1e12 events over ~1.7e4 hours
    reaches (sq ~ 6e19).  Worse than loud failure: DuckDB's HUGEINT sum
    succeeds there, so the engines silently diverge.  This pin rebuilds
    the regime at expression level (three hour-counts of 2e9: each
    product 4e18 FITS int64, their sum 1.2e19 does not) and asserts the
    old bigint accumulator throws under ANSI while the production
    DECIMAL(18,0)->(37,0)->(38,0) form completes with the exact sum."""
    from pyspark.sql import functions as F

    cnts = [2_000_000_000, 2_000_000_000, 2_000_000_000]
    assert all(c * c < 2**63 for c in cnts) and sum(c * c for c in cnts) > 2**63
    df = spark.createDataFrame([(c,) for c in cnts], "cnt long")
    with pytest.raises(Exception, match="(?i)overflow"):
        df.agg(F.sum(F.col("cnt") * F.col("cnt")).cast("bigint")).collect()
    got = df.agg(
        F.sum(
            F.col("cnt").cast("decimal(18,0)") * F.col("cnt").cast("decimal(18,0)")
        ).alias("sq")
    ).collect()[0]
    assert int(got.sq) == sum(c * c for c in cnts)


@pytest.mark.parametrize(
    "mod,fn,table",
    [
        ("findb_spark.queries.events_analytics", "events_burstiness", "events"),
        ("findb_spark.queries.events_queries", "events_hourly_anomaly", "events"),
    ],
)
def test_moment_accumulators_are_decimal_in_production_plans(spark, mod, fn, table):
    """Structural pin: the registered queries' analyzed plans must carry
    the DECIMAL moment accumulator (sum over a decimal product), so a
    future edit can't silently revert to the int64 SUM(n*n) form."""
    import importlib

    q = getattr(importlib.import_module(mod), fn)
    plan = (
        q(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .analyzed()
        .toString()
    )
    import re

    assert re.search(
        r"sum\(\(cast\(\w+#\d+L? as decimal\(18,0\)\)"
        r" \* cast\(\w+#\d+L? as decimal\(18,0\)\)\)\)",
        plan,
    ), "DECIMAL moment accumulator missing from the analyzed plan"
