"""Explicit StructType schemas for every layer of the medallion pipeline.

The reference has no schema definitions at all — bronze is whatever
``pd.DataFrame(list_of_dicts)`` infers (reference
consumer/ingest_bronze.py:172) and silver/gold columns appear by
assignment. Here every layer gets an explicit schema, which is what
lets Catalyst prune columns at the parquet scan and lets ``from_json``
replace the hand-rolled validator (reference
consumer/ingest_bronze.py:67-97).

Column inventory per layer: SURVEY.md §1.3 (verified against the
reference's shipped parquet footers).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DateType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# ---------------------------------------------------------------------------
# Bronze: the raw telemetry event as produced by the simulator
# (reference producer/telemetry_sim.py:138-151) plus ingestion_time
# (reference consumer/ingest_bronze.py:103). At the Kafka boundary both
# timestamps are ISO-8601 strings; TELEMETRY_JSON_SCHEMA is what
# from_json parses, with timestamps as strings exactly like bronze
# parquet stores them.
# ---------------------------------------------------------------------------

TELEMETRY_JSON_SCHEMA = StructType(
    [
        StructField("device_id", StringType()),
        StructField("device_type", StringType()),
        StructField("user_id", StringType()),
        StructField("timestamp", StringType()),  # ISO-8601 UTC, µs precision
        StructField("temperature", DoubleType()),
        StructField("power_usage", DoubleType()),
        StructField("energy_consumption_wh", DoubleType()),
        StructField("status", StringType()),
        StructField("alert", StringType()),
        StructField("location", StringType()),
        StructField("manufacturer", StringType()),
        StructField("model", StringType()),
    ]
)

BRONZE_SCHEMA = StructType(
    list(TELEMETRY_JSON_SCHEMA.fields)
    + [StructField("ingestion_time", StringType())]
)

# Required fields checked by the reference validator
# (consumer/ingest_bronze.py:70-75): message rejected unless all present.
REQUIRED_TELEMETRY_FIELDS = [
    "device_id",
    "device_type",
    "user_id",
    "timestamp",
    "temperature",
    "power_usage",
    "energy_consumption_wh",
    "status",
    "alert",
]

NUMERIC_TELEMETRY_FIELDS = ["temperature", "power_usage", "energy_consumption_wh"]

# Fields whose nullness must not survive into silver
# (reference consumer/bronze_to_silver.py:128-129).
CRITICAL_FIELDS = ["device_id", "device_type", "user_id", "timestamp"]

# ---------------------------------------------------------------------------
# Silver: bronze + parsed timestamps + quality/enrichment/window columns
# (reference consumer/bronze_to_silver.py:150-168, 200-204, 220-225,
# 249-268; SURVEY.md §1.3). installation_date / device_age_days carry the
# reference's *intended* semantics — its own catalog join silently no-ops
# at runtime (SURVEY.md §1.3 discrepancy note).
# ---------------------------------------------------------------------------

SILVER_SCHEMA = StructType(
    [
        StructField("device_id", StringType()),
        StructField("device_type", StringType()),
        StructField("user_id", StringType()),
        StructField("timestamp", TimestampType()),
        StructField("temperature", DoubleType()),
        StructField("power_usage", DoubleType()),
        StructField("energy_consumption_wh", DoubleType()),
        StructField("status", StringType()),
        StructField("alert", StringType()),
        StructField("location", StringType()),
        StructField("manufacturer", StringType()),
        StructField("model", StringType()),
        StructField("ingestion_time", TimestampType()),
        StructField("quality_score", DoubleType()),
        StructField("is_valid", BooleanType()),
        StructField("installation_date", DateType()),
        StructField("device_age_days", IntegerType()),
        StructField("processing_delay_hours", DoubleType()),
        StructField("is_late_event", BooleanType()),
        StructField("temp_1h_avg", DoubleType()),
        StructField("power_1h_avg", DoubleType()),
        StructField("energy_efficiency", DoubleType()),
        StructField("has_alert", BooleanType()),
        StructField("alert_frequency_1h", DoubleType()),
        StructField("date", DateType()),  # partition column
    ]
)

# ---------------------------------------------------------------------------
# Dimension tables (reference config/device_catalog.csv:1,
# config/billing_data.csv:1).
# ---------------------------------------------------------------------------

DEVICE_CATALOG_SCHEMA = StructType(
    [
        StructField("device_id", StringType()),
        StructField("device_type", StringType()),
        StructField("user_id", StringType()),
        StructField("location", StringType()),
        StructField("installation_date", DateType()),
        StructField("manufacturer", StringType()),
        StructField("model", StringType()),
    ]
)

BILLING_SCHEMA = StructType(
    [
        StructField("user_id", StringType()),
        StructField("billing_period", StringType()),
        StructField("energy_rate_kwh", DoubleType()),
        StructField("base_charge", DoubleType()),
        StructField("total_usage_kwh", DoubleType()),
        StructField("total_cost", DoubleType()),
    ]
)

# ---------------------------------------------------------------------------
# Gold (reference consumer/silver_to_gold.py:83-129 / :131-206 / :208-275).
# Aggregate column names follow the reference's flattened
# "{col}_{func}" convention (silver_to_gold.py:105).
# ---------------------------------------------------------------------------

GOLD_DAILY_ENERGY_SCHEMA = StructType(
    [
        StructField("device_id", StringType()),
        StructField("device_type", StringType()),
        StructField("user_id", StringType()),
        StructField("date", DateType()),
        StructField("energy_consumption_wh_sum", DoubleType()),
        StructField("energy_consumption_wh_mean", DoubleType()),
        StructField("energy_consumption_wh_max", DoubleType()),
        StructField("energy_consumption_wh_count", LongType()),
        StructField("power_usage_mean", DoubleType()),
        StructField("power_usage_max", DoubleType()),
        StructField("temperature_mean", DoubleType()),
        StructField("temperature_min", DoubleType()),
        StructField("temperature_max", DoubleType()),
        StructField("quality_score_mean", DoubleType()),
        StructField("is_valid_mean", DoubleType()),
        StructField("alert_frequency_1h_max", DoubleType()),
        StructField("energy_cost_estimate", DoubleType()),
        StructField("avg_efficiency", DoubleType()),
        StructField("data_completeness", DoubleType()),
        StructField("total_readings", LongType()),
    ]
)

GOLD_DEVICE_HEALTH_SCHEMA = StructType(
    [
        StructField("device_id", StringType()),
        StructField("device_type", StringType()),
        StructField("health_score", DoubleType()),
        StructField("failure_probability", DoubleType()),
        StructField("data_reliability", DoubleType()),
        StructField("total_alerts", IntegerType()),
        StructField("uptime_percentage", DoubleType()),
        StructField("created_at", TimestampType()),
    ]
)

GOLD_BUSINESS_SUMMARY_SCHEMA = StructType(
    [
        StructField("date", DateType()),
        StructField("total_energy_wh", DoubleType()),
        StructField("total_cost_estimate", DoubleType()),
        StructField("active_devices", LongType()),
        StructField("active_users", LongType()),
        StructField("avg_data_quality", DoubleType()),
        StructField("total_data_points", LongType()),
        StructField("total_energy_kwh", DoubleType()),
        StructField("avg_device_health", DoubleType()),
        StructField("avg_failure_risk", DoubleType()),
        StructField("total_alerts", DoubleType()),
        StructField("cost_per_kwh", DoubleType()),
        StructField("created_at", TimestampType()),
    ]
)

# ---------------------------------------------------------------------------
# North-star extension columns (SURVEY.md §1.4 / §7.4): embeddings and
# multimodal payloads as typed columns.
# ---------------------------------------------------------------------------

EMBEDDING_SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
        StructField("label", IntegerType()),
    ]
)

MULTIMODAL_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("modality", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("mime_type", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
    ]
)

# Energy pricing constants (reference config/config.py:46-47).
ENERGY_RATE_PER_KWH = 0.12
BASE_CHARGE = 15.00
