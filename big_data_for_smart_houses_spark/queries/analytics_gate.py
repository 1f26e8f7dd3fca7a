"""The remaining gold tables (A2/A3) and the read-side dashboard
queries (SURVEY.md §2.11), pushed through the correctness gate on the
events-mapped silver pipeline.

The Spark side runs the production operators from ``operators/gold.py``
and ``operators/analytics.py`` (unrounded, timestamp-free variants so
the comparison is deterministic); the oracles extend the pipeline CTE
from ``queries/pipeline.py`` with the same aggregation algebra.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import quantize_cols
from ..operators import analytics
from ..operators.gold import (
    daily_business_summary,
    daily_energy_consumption,
    device_health_metrics,
)
from ..operators.silver import bronze_to_silver
from ..operators.windows import top_k_latest
from .pipeline import _BRONZE_CTE, _events_as_bronze

KPI_DATE = dt.date(2024, 1, 5)
LIVE_NOW = dt.datetime(2024, 1, 20, 0, 0, 0)
LIVE_HOURS = 48


def _silver(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bronze_to_silver(_events_as_bronze(spark, sf_dir), catalog=None)


def _daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    return daily_energy_consumption(_silver(spark, sf_dir), rounded=False)


def _health(spark: SparkSession, sf_dir: str) -> DataFrame:
    return device_health_metrics(
        _silver(spark, sf_dir), rounded=False, with_created_at=False
    )


# Shared oracle CTE: A1 per-group aggregates (unrounded) over the
# pipeline silver, and the A2 health table.
_GOLD_CTE = f"""
{_BRONZE_CTE},
agg AS (
  SELECT device_id, device_type, user_id, date,
    sum(energy_consumption_wh) AS s_energy,
    avg(energy_consumption_wh) AS m_energy,
    max(energy_consumption_wh) AS x_energy,
    count(energy_consumption_wh) AS c_energy,
    avg(CASE WHEN is_valid THEN 1.0 ELSE 0.0 END) AS m_valid
  FROM windowed
  GROUP BY device_id, device_type, user_id, date
),
health_agg AS (
  SELECT device_id, device_type,
    avg(quality_score) AS q,
    avg(CASE WHEN is_valid THEN 1.0 ELSE 0.0 END) AS v,
    avg(alert_frequency_1h) AS alerts,
    avg(CASE WHEN is_late_event THEN 1.0 ELSE 0.0 END) AS late,
    count(timestamp) AS n,
    min(timestamp) AS ts_min,
    max(timestamp) AS ts_max
  FROM windowed GROUP BY 1, 2
),
health_scored AS (
  SELECT *,
    q * 0.4 + v * 0.3 + (1.0 - late) * 0.2
      + (1.0 - least(1.0, alerts / 10.0)) * 0.1 AS health
  FROM health_agg
),
health AS (
  SELECT device_id, device_type,
    greatest(0.0, least(1.0, health)) AS health_score,
    greatest(0.0, least(1.0,
      least(1.0, (1.0 - health) * 0.7 + alerts / 20.0 + late * 0.3)))
      AS failure_probability,
    v * 0.6 + (1.0 - late) * 0.4 AS data_reliability,
    CAST(round_even(alerts * n / 60.0, 0) AS INT) AS total_alerts,
    least(100.0,
      (CASE WHEN (epoch_us(ts_max) - epoch_us(ts_min)) / 60000000.0 > 0
            THEN CAST(n AS DOUBLE)
                 / ((epoch_us(ts_max) - epoch_us(ts_min)) / 60000000.0)
            ELSE 100.0 END) * 100.0) AS uptime_percentage
  FROM health_scored
)
"""


# ---------------------------------------------------------------------------
# A2: device health gold table
# ---------------------------------------------------------------------------

def q_gold_device_health_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 gold device-health aggregation (operators/gold.py:device_health_summary)."""
    # health/failure chains of window-avg outputs carry ulp-level
    # cross-engine jitter — gate-quantized both sides (gate_quantize)
    return quantize_cols(
        _health(spark, sf_dir), "health_score", "failure_probability"
    )


ORACLE_GOLD_DEVICE_HEALTH_EVENTS = f"""
WITH {_GOLD_CTE}
SELECT device_id, device_type,
       CAST(CAST(health_score AS REAL) AS DOUBLE) AS health_score,
       CAST(CAST(failure_probability AS REAL) AS DOUBLE) AS failure_probability,
       data_reliability, total_alerts, uptime_percentage
FROM health
"""


# ---------------------------------------------------------------------------
# A3 + J2: business summary gold table
# ---------------------------------------------------------------------------

def q_gold_business_summary_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 gold business summary (operators/gold.py:business_summary)."""
    daily = _daily(spark, sf_dir)
    health = _health(spark, sf_dir)
    return quantize_cols(
        daily_business_summary(daily, health, rounded=False, with_created_at=False),
        "total_energy_wh",
        "total_cost_estimate",
        "avg_data_quality",
        "total_energy_kwh",
        "avg_device_health",
        "avg_failure_risk",
        "cost_per_kwh",
    )


ORACLE_GOLD_BUSINESS_SUMMARY_EVENTS = f"""
WITH {_GOLD_CTE},
daily AS (
  SELECT device_id, user_id, date, s_energy,
         s_energy / 1000.0 * 0.12 AS cost,
         m_valid * 100.0 AS completeness,
         c_energy AS readings
  FROM agg
),
summary AS (
  SELECT date,
         sum(s_energy) AS total_energy_wh,
         sum(cost) AS total_cost_estimate,
         count(DISTINCT device_id) AS active_devices,
         count(DISTINCT user_id) AS active_users,
         avg(completeness) AS avg_data_quality,
         CAST(sum(readings) AS BIGINT) AS total_data_points
  FROM daily GROUP BY 1
),
hs AS (
  SELECT avg(health_score) AS avg_device_health,
         avg(failure_probability) AS avg_failure_risk,
         CAST(sum(total_alerts) AS DOUBLE) AS total_alerts
  FROM health
)
SELECT date,
       CAST(CAST(total_energy_wh AS REAL) AS DOUBLE) AS total_energy_wh,
       CAST(CAST(total_cost_estimate AS REAL) AS DOUBLE) AS total_cost_estimate,
       active_devices, active_users,
       CAST(CAST(avg_data_quality AS REAL) AS DOUBLE) AS avg_data_quality,
       total_data_points,
       CAST(CAST(total_energy_wh / 1000.0 AS REAL) AS DOUBLE) AS total_energy_kwh,
       CAST(CAST(avg_device_health AS REAL) AS DOUBLE) AS avg_device_health,
       CAST(CAST(avg_failure_risk AS REAL) AS DOUBLE) AS avg_failure_risk,
       total_alerts,
       CAST(CAST(CASE WHEN total_energy_wh / 1000.0 > 0
                  THEN total_cost_estimate / (total_energy_wh / 1000.0)
                  ELSE 0.0 END AS REAL) AS DOUBLE) AS cost_per_kwh
FROM summary CROSS JOIN hs
"""


# ---------------------------------------------------------------------------
# §2.11 dashboard queries over the gold tables
# ---------------------------------------------------------------------------

def q_analytics_energy_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Energy-by-type chart aggregation (operators/analytics.py:energy_by_type)."""
    return quantize_cols(
        analytics.energy_by_device_type(_daily(spark, sf_dir)), "energy_kwh"
    )


ORACLE_ANALYTICS_ENERGY_BY_TYPE = f"""
WITH {_GOLD_CTE}
SELECT device_type, CAST(CAST(sum(s_energy) / 1000.0 AS REAL) AS DOUBLE) AS energy_kwh
FROM agg GROUP BY 1
"""


def q_analytics_daily_energy_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily energy trend chart series (operators/analytics.py:daily_energy_trend)."""
    return quantize_cols(
        analytics.daily_energy_trend(_daily(spark, sf_dir)), "energy_kwh"
    )


ORACLE_ANALYTICS_DAILY_ENERGY_TREND = f"""
WITH {_GOLD_CTE}
SELECT date, CAST(CAST(sum(s_energy) / 1000.0 AS REAL) AS DOUBLE) AS energy_kwh FROM agg GROUP BY 1
"""


def q_analytics_daily_cost_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily cost trend chart series (operators/analytics.py:daily_cost_trend)."""
    return quantize_cols(
        analytics.daily_cost_trend(_daily(spark, sf_dir)), "cost"
    )


ORACLE_ANALYTICS_DAILY_COST_TREND = f"""
WITH {_GOLD_CTE}
SELECT date, CAST(CAST(sum(s_energy) / 1000.0 * 0.12 AS REAL) AS DOUBLE) AS cost
FROM agg GROUP BY 1
"""


def q_analytics_kpi_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dashboard KPI tiles for the latest day (operators/analytics.py:kpi_day)."""
    return quantize_cols(
        analytics.kpi_today(_daily(spark, sf_dir), KPI_DATE),
        "total_energy_kwh",
        "total_cost",
    )


ORACLE_ANALYTICS_KPI_DAY = f"""
WITH {_GOLD_CTE},
day_rows AS (
  SELECT device_id, s_energy,
         s_energy / 1000.0 * 0.12 AS cost
  FROM agg WHERE date = DATE '{KPI_DATE.isoformat()}'
)
SELECT CAST(CAST(sum(s_energy) / 1000.0 AS REAL) AS DOUBLE) AS total_energy_kwh,
       CAST(CAST(sum(cost) AS REAL) AS DOUBLE) AS total_cost,
       count(DISTINCT device_id) AS active_devices
FROM day_rows
"""


# ---------------------------------------------------------------------------
# KPI fallback chain (reference dashboard/app.py:277-357): one gated
# query per source tier — gold-today, silver-24h, business-summary.
# ---------------------------------------------------------------------------

KPI_MISS_DATE = dt.date(2030, 1, 1)  # no gold rows on this date
KPI_DEAD_NOW = dt.datetime(2030, 1, 1, 0, 0, 0)  # silver-24h empty too


def _kpi_chain(spark: SparkSession, sf_dir: str, today, now) -> DataFrame:
    daily = _daily(spark, sf_dir)
    health = _health(spark, sf_dir)
    silver = _silver(spark, sf_dir)
    summary = daily_business_summary(
        daily, health, rounded=False, with_created_at=False
    )
    return quantize_cols(
        analytics.kpi_with_fallback(daily, silver, summary, health, today, now),
        "total_energy_kwh",
        "total_cost",
        "avg_health",
    )


def q_analytics_kpi_chain_gold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tier 1: gold has rows for 'today' -> KPIs from gold."""
    return _kpi_chain(spark, sf_dir, KPI_DATE, LIVE_NOW)


def q_analytics_kpi_chain_silver(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tier 2: no gold rows for 'today' -> silver last-24h."""
    return _kpi_chain(spark, sf_dir, KPI_MISS_DATE, LIVE_NOW)


def q_analytics_kpi_chain_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tier 3: gold miss AND empty silver window -> latest summary."""
    return _kpi_chain(spark, sf_dir, KPI_MISS_DATE, KPI_DEAD_NOW)


def _oracle_kpi_chain(today: dt.date, now: dt.datetime) -> str:
    cutoff = (now - dt.timedelta(hours=24)).isoformat(sep=" ")
    return f"""
WITH {_GOLD_CTE},
daily AS (
  SELECT device_id, user_id, date, s_energy,
         s_energy / 1000.0 * 0.12 AS cost
  FROM agg
),
summary AS (
  SELECT date,
         sum(s_energy) / 1000.0 AS total_energy_kwh,
         sum(cost) AS total_cost_estimate,
         count(DISTINCT device_id) AS active_devices
  FROM daily GROUP BY 1
),
g AS (
  SELECT count(*) AS n_g,
         sum(s_energy) / 1000.0 AS e_g,
         sum(cost) AS c_g,
         count(DISTINCT device_id) AS d_g
  FROM daily WHERE date = DATE '{today.isoformat()}'
),
s AS (
  SELECT coalesce(sum(energy_consumption_wh), 0.0) / 1000.0 AS e_s,
         count(DISTINCT device_id) AS d_s
  FROM windowed WHERE timestamp >= TIMESTAMP '{cutoff}'
),
b AS (
  SELECT count(*) AS n_b,
         arg_max(total_energy_kwh, date) AS e_b,
         arg_max(total_cost_estimate, date) AS c_b,
         arg_max(active_devices, date) AS d_b
  FROM summary
),
h AS (
  SELECT coalesce(avg(health_score) * 100.0, 0.0) AS avg_health FROM health
),
x AS (
  SELECT *,
    CASE WHEN n_g > 0 THEN e_g ELSE e_s END AS e1,
    CASE WHEN n_g > 0 THEN c_g ELSE e_s * 0.12 END AS c1,
    CASE WHEN n_g > 0 THEN d_g ELSE d_s END AS d1
  FROM g CROSS JOIN s CROSS JOIN b CROSS JOIN h
)
SELECT
  CAST(CAST(CASE WHEN e1 = 0.0 AND n_b > 0 THEN e_b ELSE e1 END
            AS REAL) AS DOUBLE) AS total_energy_kwh,
  CAST(CAST(CASE WHEN e1 = 0.0 AND n_b > 0 THEN c_b ELSE c1 END
            AS REAL) AS DOUBLE) AS total_cost,
  CAST(CASE WHEN e1 = 0.0 AND n_b > 0 THEN d_b ELSE d1 END
       AS BIGINT) AS active_devices,
  CAST(CAST(avg_health AS REAL) AS DOUBLE) AS avg_health,
  CASE WHEN e1 = 0.0 AND n_b > 0 THEN 'business_summary'
       WHEN n_g > 0 THEN 'gold_today'
       ELSE 'silver_24h' END AS kpi_source
FROM x
"""


ORACLE_ANALYTICS_KPI_CHAIN_GOLD = _oracle_kpi_chain(KPI_DATE, LIVE_NOW)
ORACLE_ANALYTICS_KPI_CHAIN_SILVER = _oracle_kpi_chain(KPI_MISS_DATE, LIVE_NOW)
ORACLE_ANALYTICS_KPI_CHAIN_SUMMARY = _oracle_kpi_chain(KPI_MISS_DATE, KPI_DEAD_NOW)


def q_analytics_health_scatter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Device-health scatter source (operators/analytics.py)."""
    return quantize_cols(
        analytics.health_scatter(_health(spark, sf_dir)),
        "health_score",
        "failure_probability",
    )


ORACLE_ANALYTICS_HEALTH_SCATTER = f"""
WITH {_GOLD_CTE}
SELECT CAST(CAST(health_score AS REAL) AS DOUBLE) AS health_score,
       CAST(CAST(failure_probability AS REAL) AS DOUBLE) AS failure_probability,
       total_alerts, device_type, device_id
FROM health
"""


def q_analytics_live_readings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2 live feed with a fixed 'now' and a deterministic tie-break."""
    silver = _silver(spark, sf_dir)
    cutoff = LIVE_NOW - dt.timedelta(hours=LIVE_HOURS)
    recent = silver.filter(F.col("timestamp") >= F.lit(cutoff)).select(
        "device_id", "timestamp", "temperature", "power_usage"
    )
    return top_k_latest(recent, 100, tiebreak="device_id")


ORACLE_ANALYTICS_LIVE_READINGS = f"""
WITH {_BRONZE_CTE}
SELECT device_id, timestamp, temperature, power_usage
FROM windowed
WHERE timestamp >= TIMESTAMP '{(LIVE_NOW - dt.timedelta(hours=LIVE_HOURS)).isoformat(sep=" ")}'
ORDER BY timestamp DESC, device_id DESC LIMIT 100
"""


def q_analytics_data_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sidebar data-status panel (counts + time range per table) over
    silver and the three gold tables — the U1 union-of-summaries shape."""
    silver = _silver(spark, sf_dir)
    daily = _daily(spark, sf_dir)
    health = _health(spark, sf_dir)
    summary = daily_business_summary(
        daily, health, rounded=False, with_created_at=False
    )
    return analytics.data_status(
        {
            "silver": silver.select("timestamp"),
            "daily_energy": daily.select("date"),
            "device_health": health.select("device_id"),
            "business_summary": summary.select("date"),
        }
    )


ORACLE_ANALYTICS_DATA_STATUS = f"""
WITH {_GOLD_CTE},
summary AS (SELECT date FROM agg GROUP BY date)
SELECT 'silver' AS table, count(*) AS n_rows,
       CAST(min(timestamp) AS VARCHAR) AS min_ts,
       CAST(max(timestamp) AS VARCHAR) AS max_ts
FROM windowed
UNION ALL
SELECT 'daily_energy', count(*),
       CAST(min(date) AS VARCHAR), CAST(max(date) AS VARCHAR) FROM agg
UNION ALL
SELECT 'device_health', count(*), NULL, NULL FROM health
UNION ALL
SELECT 'business_summary', count(*),
       CAST(min(date) AS VARCHAR), CAST(max(date) AS VARCHAR) FROM summary
"""


QUERIES = {
    "gold_device_health_events": q_gold_device_health_events,
    "gold_business_summary_events": q_gold_business_summary_events,
    "analytics_energy_by_type": q_analytics_energy_by_type,
    "analytics_daily_energy_trend": q_analytics_daily_energy_trend,
    "analytics_daily_cost_trend": q_analytics_daily_cost_trend,
    "analytics_kpi_day": q_analytics_kpi_day,
    "analytics_kpi_chain_gold": q_analytics_kpi_chain_gold,
    "analytics_kpi_chain_silver": q_analytics_kpi_chain_silver,
    "analytics_kpi_chain_summary": q_analytics_kpi_chain_summary,
    "analytics_health_scatter": q_analytics_health_scatter,
    "analytics_live_readings": q_analytics_live_readings,
    "analytics_data_status": q_analytics_data_status,
}

ORACLES = {
    "gold_device_health_events": ORACLE_GOLD_DEVICE_HEALTH_EVENTS,
    "gold_business_summary_events": ORACLE_GOLD_BUSINESS_SUMMARY_EVENTS,
    "analytics_energy_by_type": ORACLE_ANALYTICS_ENERGY_BY_TYPE,
    "analytics_daily_energy_trend": ORACLE_ANALYTICS_DAILY_ENERGY_TREND,
    "analytics_daily_cost_trend": ORACLE_ANALYTICS_DAILY_COST_TREND,
    "analytics_kpi_day": ORACLE_ANALYTICS_KPI_DAY,
    "analytics_kpi_chain_gold": ORACLE_ANALYTICS_KPI_CHAIN_GOLD,
    "analytics_kpi_chain_silver": ORACLE_ANALYTICS_KPI_CHAIN_SILVER,
    "analytics_kpi_chain_summary": ORACLE_ANALYTICS_KPI_CHAIN_SUMMARY,
    "analytics_health_scatter": ORACLE_ANALYTICS_HEALTH_SCATTER,
    "analytics_live_readings": ORACLE_ANALYTICS_LIVE_READINGS,
    "analytics_data_status": ORACLE_ANALYTICS_DATA_STATUS,
}
