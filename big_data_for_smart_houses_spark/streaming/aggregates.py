"""Streaming windowed aggregation with watermark-driven state cleanup.

The streaming variant of the daily gold rollup (SURVEY.md §2.9 T4/T5):
the batch engine recomputes gold over a lookback window; this operator
instead maintains the tumbling-window aggregate incrementally, using a
watermark to bound state. Per SURVEY.md T3 the *silver* layer keeps
late rows and only flags them — the watermark here is the documented
divergence for the streaming-gold path: rows later than the watermark
are dropped from the running aggregate (state for their window has
been evicted), which is the price of bounded state at 100 TB/day.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_WATERMARK = "48 hours"
DEFAULT_WINDOW = "1 day"


def windowed_energy_rollup(
    stream: DataFrame,
    window_duration: str = DEFAULT_WINDOW,
    watermark_delay: str = DEFAULT_WATERMARK,
    ts_col: str = "timestamp",
) -> DataFrame:
    """Tumbling event-time window per device: incremental sum/avg/max of
    energy and power. State per (window, device) is evicted once the
    watermark passes the window end — memory stays proportional to the
    watermark horizon, not the stream length."""
    return (
        stream.withWatermark(ts_col, watermark_delay)
        .groupBy(
            F.window(F.col(ts_col), window_duration).alias("win"),
            F.col("device_id"),
        )
        .agg(
            F.sum("energy_consumption_wh").alias("energy_wh_sum"),
            F.avg("power_usage").alias("power_avg"),
            F.max("power_usage").alias("power_max"),
            F.count(F.lit(1)).alias("n_readings"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "device_id",
            "energy_wh_sum",
            "power_avg",
            "power_max",
            "n_readings",
        )
    )
