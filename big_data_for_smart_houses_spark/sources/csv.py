"""Dimension CSV sources (reference producer/telemetry_sim.py:41-49,
consumer/bronze_to_silver.py:29-36) with explicit schemas instead of
pandas inference."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..schemas import BILLING_SCHEMA, DEVICE_CATALOG_SCHEMA


def read_device_catalog(spark: SparkSession, path: str) -> DataFrame:
    return (
        spark.read.option("header", True)
        .schema(DEVICE_CATALOG_SCHEMA)
        .csv(path)
    )


def read_billing(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.option("header", True).schema(BILLING_SCHEMA).csv(path)
