"""Window-function query specs over the bitemporal daily series (SURVEY §2.2
'Window functions' row): moving average, lag returns, cumulative sums,
cross-sectional ranking — the finance analytics layer of the engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from findb_spark.ops.finance import (
    cross_sectional_rank,
    cumulative_sum,
    daily_series,
    moving_average,
    pct_returns,
)
from findb_spark.prices import PRICES_ORACLE_CTE, prices_from_lineitem
from findb_spark.queries.asof_queries import ASOF_2000
from findb_spark.registry import register

# Shared oracle CTE: the deduped daily series for assets 1..50 as of 2000-01-01
_DAILY_CTE = f"""
{PRICES_ORACLE_CTE},
daily AS (
  SELECT asset_id, date, value FROM (
    SELECT asset_id, date, value,
           ROW_NUMBER() OVER (PARTITION BY asset_id, date
                              ORDER BY ts DESC, value DESC) AS rn
    FROM prices_v WHERE ts <= {ASOF_2000} AND asset_id <= 50)
  WHERE rn = 1
)
"""


def _daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    return daily_series(prices_from_lineitem(spark, sf_dir), ASOF_2000, max_asset=50)


@register(
    "ts_moving_avg",
    f"""
WITH {_DAILY_CTE}
SELECT asset_id, date, value,
       CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT))
            OVER (PARTITION BY asset_id ORDER BY date
                  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS DOUBLE) / 100
       / COUNT(*) OVER (PARTITION BY asset_id ORDER BY date
                        ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS sma_5
FROM daily
""",
    category="timeseries",
    description="5-day trailing moving average per asset (windowed fixed-point sum)",
    bench=True,
)
def ts_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return moving_average(_daily(spark, sf_dir), 5)


@register(
    "ts_lag_returns",
    f"""
WITH {_DAILY_CTE}
SELECT asset_id, date, value,
       value / LAG(value) OVER (PARTITION BY asset_id ORDER BY date) - 1 AS ret
FROM daily
""",
    category="timeseries",
    description="Day-over-day returns via LAG (point-in-time correct: built on the as-of snapshot)",
)
def ts_lag_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pct_returns(_daily(spark, sf_dir))


@register(
    "ts_cumulative",
    f"""
WITH {_DAILY_CTE}
SELECT asset_id, date, value,
       CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT))
            OVER (PARTITION BY asset_id ORDER BY date
                  ROWS UNBOUNDED PRECEDING) AS DOUBLE) / 100 AS cum_value
FROM daily
""",
    category="timeseries",
    description="Running cumulative total per asset (exact fixed-point accumulation)",
)
def ts_cumulative(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cumulative_sum(_daily(spark, sf_dir))


@register(
    "ts_range_frame",
    f"""
WITH {_DAILY_CTE}
SELECT asset_id, date, value,
       CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT))
            OVER (PARTITION BY asset_id ORDER BY date
                  RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW) AS DOUBLE) / 100
         AS trailing_year_sum
FROM daily
""",
    category="timeseries",
    description="RANGE-frame window: trailing calendar-window sum keyed on the date value, not row count",
)
def ts_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window, functions as F

    daily = _daily(spark, sf_dir)
    w = (
        Window.partitionBy("asset_id")
        .orderBy("date")
        .rangeBetween(-10000, 0)
    )
    cents = F.floor(F.col("value") * 100 + F.lit(0.5))
    return daily.select(
        "asset_id",
        "date",
        "value",
        (F.sum(cents).over(w).cast("double") / 100).alias("trailing_year_sum"),
    )


@register(
    "ts_first_last",
    f"""
WITH {_DAILY_CTE}
SELECT asset_id, date, value,
       FIRST_VALUE(value) OVER w AS first_val,
       LAST_VALUE(value) OVER w AS last_val,
       NTH_VALUE(value, 2) OVER w AS second_val
FROM daily
WINDOW w AS (PARTITION BY asset_id ORDER BY date
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
    category="timeseries",
    description="Analytic first/last/nth value over full-partition frames",
)
def ts_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window, functions as F

    daily = _daily(spark, sf_dir)
    w = (
        Window.partitionBy("asset_id")
        .orderBy("date")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return daily.select(
        "asset_id",
        "date",
        "value",
        F.first("value").over(w).alias("first_val"),
        F.last("value").over(w).alias("last_val"),
        F.nth_value("value", 2).over(w).alias("second_val"),
    )


@register(
    "ts_ntile_pct_rank",
    f"""
WITH {_DAILY_CTE}
SELECT asset_id, date, value,
       NTILE(4) OVER w AS quartile,
       PERCENT_RANK() OVER w AS pct_rank
FROM daily
WINDOW w AS (PARTITION BY asset_id ORDER BY value, date)
""",
    category="timeseries",
    description="Distribution ranking: NTILE quartiles + PERCENT_RANK per asset",
)
def ts_ntile_pct_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window, functions as F

    daily = _daily(spark, sf_dir)
    w = Window.partitionBy("asset_id").orderBy("value", "date")
    return daily.select(
        "asset_id",
        "date",
        "value",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
    )


@register(
    "ts_cross_rank",
    f"""
WITH {_DAILY_CTE}
SELECT asset_id, date, value,
       ROW_NUMBER() OVER (PARTITION BY date ORDER BY value DESC, asset_id) AS value_rank
FROM daily
""",
    category="timeseries",
    description="Cross-sectional per-date ranking of assets by value",
)
def ts_cross_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cross_sectional_rank(_daily(spark, sf_dir))
