"""Finance time-series operators over bitemporal prices.

These compose the as-of dedup (the reference's core semantics,
file.rs:508-570) with window analytics the reference never had (SURVEY
§2.2): moving averages, returns, cumulative sums, cross-sectional ranks.

Scale: one exchange keyed on asset_id feeds every per-asset window
(partitionBy asset); with the clustered layout the exchange is the only
shuffle. Moving aggregates use fixed-point integer window sums (see
findb_spark.queries.parity) so results are deterministic under any
partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def daily_series(
    prices: DataFrame, asof_ts: int, max_asset: int | None = None
) -> DataFrame:
    """As-of snapshot as a daily series: per (asset_id, date) the latest
    revision with ts <= asof_ts; columns (asset_id, date, value).

    The tie-break contract lives in ONE place — asof._latest_revision."""
    from findb_spark.asof import _latest_revision

    f = prices.where(F.col("ts") <= asof_ts)
    if max_asset is not None:
        f = f.where(F.col("asset_id") <= max_asset)
    return _latest_revision(["asset_id", "date"], f).select(
        "asset_id", "date", "value"
    )


def _w(order_cols=("date",)):
    return Window.partitionBy("asset_id").orderBy(*order_cols)


def moving_average(daily: DataFrame, n: int, scale: int = 100) -> DataFrame:
    """Trailing n-row simple moving average per asset (deterministic
    fixed-point window sum)."""
    w = _w().rowsBetween(-(n - 1), 0)
    cents = F.floor(F.col("value") * scale + F.lit(0.5))
    return daily.select(
        "asset_id",
        "date",
        "value",
        (F.sum(cents).over(w).cast("double") / scale / F.count("*").over(w)).alias(
            f"sma_{n}"
        ),
    )


def pct_returns(daily: DataFrame) -> DataFrame:
    """Day-over-day percentage return per asset: value/lag(value) - 1."""
    prev = F.lag("value").over(_w())
    return daily.select(
        "asset_id", "date", "value", (F.col("value") / prev - 1).alias("ret")
    )


def cumulative_sum(daily: DataFrame, scale: int = 100) -> DataFrame:
    """Running total of value per asset (exact fixed-point accumulation)."""
    w = _w().rowsBetween(Window.unboundedPreceding, 0)
    cents = F.floor(F.col("value") * scale + F.lit(0.5))
    return daily.select(
        "asset_id",
        "date",
        "value",
        (F.sum(cents).over(w).cast("double") / scale).alias("cum_value"),
    )


def resample_ffill(daily: DataFrame) -> DataFrame:
    """Calendar resample + forward fill: densify each asset's series to
    every calendar day between its first and last observation, carrying
    the last known value forward — the gap-fill every daily-bar store
    needs (markets close; joins expect dense axes).

    Plan shape: per-asset min/max (one partial-aggregated shuffle),
    ``sequence()`` + ``explode`` to build the dense calendar
    executor-side (no driver loop), left join back to observations
    (shuffle on (asset_id, date)), then one per-asset ordered window for
    the ignore-nulls forward fill. Output: (asset_id, date, value,
    is_observed)."""
    obs = daily.select(
        "asset_id",
        F.to_date(F.col("date").cast("string"), "yyyyMMdd").alias("d"),
        "value",
    )
    bounds = obs.groupBy("asset_id").agg(
        F.min("d").alias("d0"), F.max("d").alias("d1")
    )
    calendar = bounds.select(
        "asset_id", F.explode(F.sequence("d0", "d1")).alias("d")
    )
    j = calendar.join(obs, ["asset_id", "d"], "left")
    w = (
        Window.partitionBy("asset_id")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    from findb_spark.functions.dates import yyyymmdd_int

    return j.select(
        "asset_id",
        yyyymmdd_int("d").alias("date"),
        F.last("value", ignorenulls=True).over(w).alias("value"),
        F.col("value").isNotNull().cast("int").alias("is_observed"),
    )


def vwap(prices: DataFrame, qty_col: str = "qty") -> DataFrame:
    """Volume-weighted average price per (asset, month): exact fixed-point
    sums of qty and qty*price, one double divide at the end — the standard
    daily/monthly bar statistic, deterministic under any partitioning."""
    month = F.floor(F.col("date") / 100).cast("int").alias("month")
    pq = F.floor(F.col("value") * F.col(qty_col) * 100 + F.lit(0.5))
    q = F.floor(F.col(qty_col) * 100 + F.lit(0.5))
    return (
        prices.groupBy("asset_id", month)
        .agg(
            (F.sum(pq).cast("double") / F.sum(q).cast("double")).alias("vwap"),
            (F.sum(q).cast("double") / 100).alias("total_qty"),
            F.count("*").alias("n_trades"),
        )
    )


def cross_sectional_rank(daily: DataFrame) -> DataFrame:
    """Rank assets per date by value (dense ranking, deterministic ties)."""
    w = Window.partitionBy("date").orderBy(F.desc("value"), "asset_id")
    return daily.select(
        "asset_id", "date", "value", F.row_number().over(w).alias("value_rank")
    )


def monthly_ohlc_bars(prices: DataFrame) -> DataFrame:
    """Monthly OHLC bars from the raw revision stream: open/close = value at
    the earliest/latest (date, ts) in the month (ties broken by value for
    cross-engine determinism), high/low = extreme values, n_rev = revisions.

    Two-phase: a window keyed (asset_id, month) tags each row with the
    bar's open/close, then a groupBy on the same key folds extremes — the
    window's exchange is reused by the aggregation (one shuffle total).
    open/high/low/close are *selected* raw values, never sums, so no
    fixed-point treatment is needed.
    """
    month = F.expr("date div 100").cast("int")
    base = prices.withColumn("month", month)
    w = Window.partitionBy("asset_id", "month").orderBy("date", "ts", "value")
    w_desc = Window.partitionBy("asset_id", "month").orderBy(
        F.desc("date"), F.desc("ts"), F.desc("value")
    )
    return (
        base.withColumn("open", F.first("value").over(w))
        .withColumn("close", F.first("value").over(w_desc))
        .groupBy("asset_id", "month")
        .agg(
            F.min("open").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.min("close").alias("close"),
            F.count("*").alias("n_rev"),
        )
    )


def drawdown(daily: DataFrame) -> DataFrame:
    """Running-peak drawdown per asset: dd = value / max_so_far - 1.

    ``max`` is order-independent (no fixed-point needed) and the division
    is one identical double op on both engines, so the output is
    deterministic under any partitioning. One window over the same
    asset_id exchange every other series op uses."""
    w = _w().rowsBetween(Window.unboundedPreceding, 0)
    run_max = F.max("value").over(w)
    return daily.select(
        "asset_id",
        "date",
        "value",
        run_max.alias("run_max"),
        (F.col("value") / run_max - 1.0).alias("drawdown"),
    )


def ewma(daily: DataFrame, alpha: float = 0.2, n_terms: int = 10) -> DataFrame:
    """Windowed exponential moving average: the ``n_terms``-term truncation
    of the EWMA recursion, emitted once a full window of history exists.

    True EWMA is a non-associative recursion (every prefix matters); the
    K-term truncation is the standard scale-safe form — at alpha=0.2 the
    dropped tail weighs (1-a)^10 ~ 0.107 of a renormalized window — and
    becomes a FIXED expression over K lag columns: one window shuffle on
    asset_id, no iteration, no UDF. Weights are Python-float literals
    embedded identically in both engines' plans, and the K-term product
    sum is the same left-associated double expression tree, so parity is
    bit-exact without fixed-point tricks."""
    w = _w()
    weights = [alpha * (1.0 - alpha) ** k for k in range(n_terms)]
    norm = sum(weights)
    acc = None
    for k, wt in enumerate(weights):
        term = F.lag("value", k).over(w) * F.lit(wt)
        acc = term if acc is None else acc + term
    return (
        daily.select(
            "asset_id",
            "date",
            "value",
            (acc / F.lit(norm)).alias("ewma"),
            F.row_number().over(w).alias("_rn"),
        )
        .where(F.col("_rn") >= n_terms)
        .drop("_rn")
    )
