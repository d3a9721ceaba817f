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
    revision with ts <= asof_ts; columns (asset_id, date, value)."""
    f = prices.where(F.col("ts") <= asof_ts)
    if max_asset is not None:
        f = f.where(F.col("asset_id") <= max_asset)
    return (
        f.groupBy("asset_id", "date")
        .agg(
            F.max_by(
                F.struct(F.col("ts"), F.col("value")),
                F.struct(F.col("ts"), F.col("value")),
            ).alias("_r")
        )
        .select("asset_id", "date", F.col("_r.value").alias("value"))
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


def cross_sectional_rank(daily: DataFrame) -> DataFrame:
    """Rank assets per date by value (dense ranking, deterministic ties)."""
    w = Window.partitionBy("date").orderBy(F.desc("value"), "asset_id")
    return daily.select(
        "asset_id", "date", "value", F.row_number().over(w).alias("value_rank")
    )
