"""Timestamp helpers with microsecond precision.

``unix_timestamp`` truncates to whole seconds; the reference's observed
silver ``processing_delay_hours`` values are ~1e-6 h (sub-second), so
delta arithmetic must keep microseconds (SURVEY.md §2.8 F4):
use ``unix_micros`` and divide.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MICROS_PER_HOUR = 3_600_000_000.0


def parse_iso_ts(col: Column) -> Column:
    """Parse an ISO-8601 string (incl. trailing ``Z``) to a UTC timestamp —
    the reference's ``pd.to_datetime(utc=True)`` /
    ``fromisoformat(s.replace('Z','+00:00'))``
    (consumer/bronze_to_silver.py:122, consumer/ingest_bronze.py:91).
    ``try_to_timestamp``: malformed input -> null (the reference's
    coerce semantics) even under Spark 4's default ANSI mode."""
    return F.try_to_timestamp(col)


def delta_hours_us(later: Column, earlier: Column) -> Column:
    """(later - earlier) in hours at µs precision (reference
    consumer/bronze_to_silver.py:220-222)."""
    return (F.unix_micros(later) - F.unix_micros(earlier)) / F.lit(MICROS_PER_HOUR)


def delta_minutes_us(later: Column, earlier: Column) -> Column:
    """(later - earlier) in minutes at µs precision (reference
    consumer/silver_to_gold.py:182-184)."""
    return (F.unix_micros(later) - F.unix_micros(earlier)) / F.lit(60_000_000.0)
