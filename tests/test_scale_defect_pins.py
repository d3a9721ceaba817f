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
