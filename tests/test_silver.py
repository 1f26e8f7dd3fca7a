"""Unit tests for the bronze->silver pipeline against hand-computed
expectations (FIXTURES.md §1 edge rows)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from big_data_for_smart_houses_spark.operators.silver import bronze_to_silver


@pytest.fixture(scope="module")
def silver(spark, telemetry_fixture, catalog_fixture):
    return bronze_to_silver(telemetry_fixture, catalog_fixture).cache()


def test_row_filtering(silver):
    # 10 input rows: 1 dup dropped, 2 out-of-range dropped, 1 null-critical dropped
    assert silver.count() == 6
    ids = {r.device_id for r in silver.select("device_id").collect()}
    assert "device_004" not in ids  # both rows out of physical range
    assert "device_005" not in ids  # null user_id


def test_dedup_keeps_first_by_ingestion(silver):
    row = silver.filter(
        (F.col("device_id") == "device_001")
        & (F.col("timestamp") == dt.datetime(2025, 7, 20, 10, 0, 0))
    ).collect()
    assert len(row) == 1
    assert row[0].temperature == 22.0  # first-ingested row won, not the 99.0 dup


def test_quality_score(silver):
    rows = {
        (r.device_id, str(r.timestamp)): r
        for r in silver.collect()
    }
    # all optional fields present, in-band numerics -> 1.0
    assert rows[("device_001", "2025-07-20 10:00:00")].quality_score == pytest.approx(1.0)
    # three missing optionals -> 0.7
    assert rows[("device_002", "2025-07-20 10:00:30")].quality_score == pytest.approx(0.7)
    # temp > 50 -> 0.8
    assert rows[("device_003", "2025-07-20 11:00:00")].quality_score == pytest.approx(0.8)
    # power > 5000 -> 0.8
    assert rows[("device_003", "2025-07-20 11:01:00")].quality_score == pytest.approx(0.8)
    for r in rows.values():
        assert r.is_valid == (r.quality_score >= 0.5)


def test_catalog_enrichment(silver):
    rows = {r.device_id: r for r in silver.collect()}
    # coalesce filled optional fields from catalog
    d2 = rows["device_002"]
    assert d2.location == "bedroom" and d2.manufacturer == "Philips"
    assert d2.installation_date == dt.date(2024, 1, 16)
    assert d2.device_age_days == (dt.date(2025, 7, 20) - dt.date(2024, 1, 16)).days
    # device missing from catalog: left join keeps row, nulls persist
    d99 = rows["device_099"]
    assert d99.installation_date is None and d99.device_age_days is None
    assert d99.location is None


def test_late_event_flag(silver):
    late = {r.device_id: r for r in silver.collect()}
    r = late["device_003"]
    flagged = [
        x
        for x in silver.filter(F.col("is_late_event")).collect()
    ]
    assert len(flagged) == 1
    assert flagged[0].device_id == "device_003"
    assert flagged[0].processing_delay_hours == pytest.approx(50.0)
    # normal rows: sub-second delays survive at µs precision (non-zero)
    normal = silver.filter(
        (F.col("device_id") == "device_001")
        & (F.col("timestamp") == dt.datetime(2025, 7, 20, 10, 0, 0))
    ).collect()[0]
    assert 0 < normal.processing_delay_hours < 1e-4


def test_rolling_metrics_row_frame(silver):
    rows = sorted(
        silver.filter(F.col("device_id") == "device_001").collect(),
        key=lambda r: r.timestamp,
    )
    # row 1: frame = [row1] -> avg = own temp
    assert rows[0].temp_1h_avg == pytest.approx(22.0)
    # row 2: frame = [row1, row2]
    assert rows[1].temp_1h_avg == pytest.approx(22.5)
    assert rows[1].alert_frequency_1h == pytest.approx(1.0)  # one alert in frame
    assert rows[0].has_alert is False and rows[1].has_alert is True


def test_energy_efficiency_guarded(silver):
    r = silver.filter(
        (F.col("device_id") == "device_001")
        & (F.col("timestamp") == dt.datetime(2025, 7, 20, 10, 0, 0))
    ).collect()[0]
    assert r.energy_efficiency == pytest.approx(33.3 / 2000.0)


def test_date_partition_column(silver):
    assert {str(r.date) for r in silver.select("date").distinct().collect()} == {
        "2025-07-20"
    }
