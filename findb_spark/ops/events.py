"""Event-stream operators (batch form). The streaming twins live in
findb_spark.streaming; these batch versions define the semantics and give
the oracle something SQL-expressible to check.

All time arithmetic is in epoch *microseconds* (``unix_micros`` /
DuckDB ``epoch_us``) — the events table carries sub-second timestamps and
second-truncation would silently merge distinct instants.

Scale: sessionization is one exchange on user_id then two windows over it;
tumbling aggregation is a plain groupBy on the truncated bucket (map-side
combinable). Both survive 100 TB: no per-user collect, no skew beyond what
AQE splits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 minutes


def with_micros(events: DataFrame) -> DataFrame:
    return events.withColumn("tus", F.unix_micros("ts"))


def tumbling_agg(events: DataFrame, duration: str = "1 hour") -> DataFrame:
    """Tumbling-window aggregation; bucket exposed as epoch-micros of the
    window start for engine-neutral comparison."""
    cents = F.floor(F.col("value") * 100 + F.lit(0.5))
    return (
        events.groupBy(
            F.unix_micros(F.window("ts", duration).start).alias("bucket_start_us"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            (F.sum(cents).cast("double") / 100).alias("sum_value"),
        )
    )


def session_events(events: DataFrame, gap_us: int = SESSION_GAP_US) -> DataFrame:
    """Event-level session assignment (the building block under
    :func:`sessionize` and the path-analysis queries): every event row
    plus ``tus`` (epoch micros) and its ``session_num`` under the
    strictly-greater gap rule.  One shuffle on user_id; both windows
    reuse the same sort."""
    e = with_micros(events)
    order = Window.partitionBy("user_id").orderBy("tus", "event_id")
    prev = F.lag("tus").over(order)
    flagged = e.withColumn(
        "is_start",
        F.when(prev.isNull() | ((F.col("tus") - prev) > gap_us), 1).otherwise(0),
    )
    running = order.rowsBetween(Window.unboundedPreceding, 0)
    return flagged.withColumn("session_num", F.sum("is_start").over(running))


def sessionize(events: DataFrame, gap_us: int = SESSION_GAP_US) -> DataFrame:
    """Gap-based sessionization: a session breaks after `gap_us` of
    inactivity per user. Returns per-session stats.

    Boundary matches Spark's native ``session_window``: each event opens a
    window ``[ts, ts+gap)`` and touching windows MERGE, so an event at
    exactly ``prev + gap_us`` still EXTENDS the session — a new session
    starts only when the gap is strictly greater (``>``).  Pinned
    empirically by the exact-gap fixture in
    tests/test_streaming.py::test_sessionize_exact_gap_boundary_matches_session_window
    (an availableNow replay of session_window over micros-precise
    boundary events merges at == gap and splits at gap + 1µs)."""
    sessions = session_events(events, gap_us)
    return (
        sessions.groupBy("user_id", "session_num")
        .agg(
            F.count("*").alias("n_events"),
            F.min("tus").alias("session_start_us"),
            F.max("tus").alias("session_end_us"),
            ((F.max("tus") - F.min("tus")) / 1_000_000.0).alias("duration_sec"),
        )
    )


def event_type_pivot(events: DataFrame) -> DataFrame:
    """Per-user conditional counts of each event type (funnel counts)."""
    agg = [
        F.sum(F.when(F.col("event_type") == t, 1).otherwise(0)).alias(f"n_{t}")
        for t in ("view", "click", "purchase", "signup", "error")
    ]
    return events.groupBy("user_id").agg(*agg, F.count("*").alias("n_total"))


def hourly_anomaly(events: DataFrame, z_thresh: float = 2.0, min_hours: int = 3) -> DataFrame:
    """Per-user hourly-activity anomaly detection: hours whose event count
    sits more than ``z_thresh`` population standard deviations above the
    user's own mean hourly count.

    Two map-side-combinable aggregations (hour bucket, then per-user moment
    sums) + one join keyed on user_id — no window over raw events, so the
    heavy table is touched once. Moments (n, sum, sum-of-squares) are exact
    integers; mean/variance/z are a fixed double expression tree over them,
    bit-identical on any IEEE-754 engine (same pattern as finance.stats_corr).

    Variance uses the overflow-safe double-tree form (round 12, same class
    as events_burstiness): the old exact product ``n_h*ss - s*s`` trips
    ANSI int64 overflow once a degenerate user key pairs a ~2e7-event hour
    with a calendar-long active tail (n_h ~ 2e4) — feasible at 100 TB;
    ``(CAST(ss AS DOUBLE) - CAST(s AS DOUBLE)*s/n_h) / n_h`` converts each
    exact moment correctly-rounded and is written identically on both
    engines.  The ``ss`` ACCUMULATOR itself is exact DECIMAL (round 13,
    advisor): an int64 ``SUM(cnt*cnt)`` overflows in the same degenerate
    regime (one ~2e7-event hour contributes 4e14 per row; ~2e4 such rows
    exceed 2^63 only with hotter keys, but a single ~4e9-event key in one
    hour already does) — and DuckDB's HUGEINT sum would silently diverge
    from Spark's ANSI failure.  DECIMAL(18,0) inputs -> (37,0) products ->
    (38,0) sum is exact and order-independent on both engines.  Synthetic
    pins (product AND accumulator): tests/test_scale_defect_pins.py.
    """
    hourly = events.groupBy(
        F.col("user_id"),
        F.unix_micros(F.window("ts", "1 hour").start).alias("hour_us"),
    ).agg(F.count("*").alias("cnt"))
    stats = hourly.groupBy("user_id").agg(
        F.count("*").alias("n_h"),
        F.sum("cnt").alias("s"),
        F.sum(
            F.col("cnt").cast("decimal(18,0)")
            * F.col("cnt").cast("decimal(18,0)")
        ).alias("ss"),
    )
    mean = F.col("s").cast("double") / F.col("n_h")
    var_num = F.col("ss").cast("double") - F.col("s").cast("double") * F.col(
        "s"
    ) / F.col("n_h")
    var = var_num / F.col("n_h")
    z = (F.col("cnt").cast("double") - mean) / F.sqrt(var)
    return (
        hourly.join(stats, "user_id")
        .where((F.col("n_h") >= min_hours) & (var_num > 0))
        .select("user_id", "hour_us", "cnt", z.alias("z"))
        .where(F.col("z") > F.lit(z_thresh))
    )
