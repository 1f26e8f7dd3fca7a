"""Read-side analytics queries (SURVEY.md §2.11 — the dashboard DAGs).

Each function is the Spark-SQL equivalent of one dashboard query
(reference dashboard/app.py). They are small plans over the gold/silver
tables; at 100 TB the date filters hit partition pruning, and the top-k
live queries plan as TakeOrderedAndProject (no full sort).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.numeric import guarded_div
from ..schemas import ENERGY_RATE_PER_KWH
from .windows import top_k_latest


def kpi_today(daily_energy: DataFrame, today: dt.date) -> DataFrame:
    """KPI row: total energy (kWh), total cost, active devices for one
    date (reference dashboard/app.py:293-302)."""
    return (
        daily_energy.filter(F.col("date") == F.lit(today))
        .agg(
            (F.sum("energy_consumption_wh_sum") / 1000.0).alias("total_energy_kwh"),
            F.sum("energy_cost_estimate").alias("total_cost"),
            F.countDistinct("device_id").alias("active_devices"),
        )
    )


def kpi_last_24h_from_silver(silver: DataFrame, now: dt.datetime) -> DataFrame:
    """KPI fallback when gold is empty: aggregate raw silver over the
    last 24 h (reference dashboard/app.py:307-329)."""
    cutoff = now - dt.timedelta(hours=24)
    return silver.filter(F.col("timestamp") >= F.lit(cutoff)).agg(
        (F.sum("energy_consumption_wh") / 1000.0).alias("total_energy_kwh"),
        (F.sum("energy_consumption_wh") / 1000.0 * ENERGY_RATE_PER_KWH).alias(
            "total_cost"
        ),
        F.countDistinct("device_id").alias("active_devices"),
    )


def kpi_avg_health(health: DataFrame) -> DataFrame:
    """Average health score ×100 (reference dashboard/app.py:349-351)."""
    return health.agg((F.avg("health_score") * 100.0).alias("avg_health_pct"))


def energy_by_device_type(daily_energy: DataFrame) -> DataFrame:
    """Per-type energy (kWh) (reference dashboard/app.py:359-408)."""
    return daily_energy.groupBy("device_type").agg(
        (F.sum("energy_consumption_wh_sum") / 1000.0).alias("energy_kwh")
    )


def daily_energy_trend(daily_energy: DataFrame) -> DataFrame:
    """Per-date energy (kWh), ordered (reference dashboard/app.py:410-457)."""
    return (
        daily_energy.groupBy("date")
        .agg((F.sum("energy_consumption_wh_sum") / 1000.0).alias("energy_kwh"))
        .orderBy("date")
    )


def daily_cost_trend(daily_energy: DataFrame) -> DataFrame:
    """Per-date cost trend (reference dashboard/app.py:459-504)."""
    return (
        daily_energy.groupBy("date")
        .agg(
            (F.sum("energy_consumption_wh_sum") / 1000.0 * ENERGY_RATE_PER_KWH).alias(
                "cost"
            )
        )
        .orderBy("date")
    )


def health_scatter(health: DataFrame) -> DataFrame:
    """Projection for the health scatter plot (reference
    dashboard/app.py:506-544)."""
    return health.select(
        "health_score",
        "failure_probability",
        "total_alerts",
        "device_type",
        "device_id",
    )


def live_readings(
    silver: DataFrame,
    now: dt.datetime,
    hours: int = 2,
    k: int = 100,
    value_cols: tuple[str, ...] = ("temperature", "power_usage"),
) -> DataFrame:
    """Live chart feed: last ``hours`` of readings, newest ``k`` rows in
    ascending time order (reference dashboard/app.py:546-646;
    MAX_LIVE_CHART_RECORDS=100 at config/config.py:88)."""
    cutoff = now - dt.timedelta(hours=hours)
    recent = silver.filter(F.col("timestamp") >= F.lit(cutoff)).select(
        "device_id", "timestamp", *value_cols
    )
    return top_k_latest(recent, k)


def data_status(tables: dict[str, DataFrame]) -> DataFrame:
    """Sidebar counts + time range per table (reference
    dashboard/app.py:708-719)."""
    spark = next(iter(tables.values())).sparkSession
    parts = []
    for name, df in tables.items():
        ts_col = "timestamp" if "timestamp" in df.columns else (
            "date" if "date" in df.columns else None
        )
        agg = [F.count(F.lit(1)).alias("n_rows")]
        if ts_col:
            agg += [
                F.min(ts_col).cast("string").alias("min_ts"),
                F.max(ts_col).cast("string").alias("max_ts"),
            ]
        else:
            agg += [
                F.lit(None).cast("string").alias("min_ts"),
                F.lit(None).cast("string").alias("max_ts"),
            ]
        parts.append(df.agg(*agg).select(F.lit(name).alias("table"), "*"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def combine_historical_and_recent(
    historical: DataFrame, recent: DataFrame, keys: list[str]
) -> DataFrame:
    """U1 + W3 — union of the two read tiers with keep-newest dedup
    (reference dashboard/app.py:227-256). ``unionByName`` with
    allowMissingColumns tolerates schema drift between snapshots."""
    merged = historical.unionByName(recent, allowMissingColumns=True)
    from .cleaning import dedup_keep_first

    order = "ingestion_time" if "ingestion_time" in merged.columns else keys[-1]
    return dedup_keep_first(merged, keys=keys, order_col=order)
