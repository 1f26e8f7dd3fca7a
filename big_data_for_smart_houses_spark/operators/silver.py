"""Bronze -> Silver pipeline (SURVEY.md §3.2).

One lazily-built DataFrame DAG replacing the reference's fixed pandas
pipeline (consumer/bronze_to_silver.py:311-348):

    parse timestamps -> clean (P2-P5) -> dedup (W3) -> quality (P7/P8)
    -> catalog join (J1/P10/P14) -> late flag (P13) -> windows (W1/W2)
    -> date partition column

Execution shape at scale: the scan+filters fuse into one codegen stage;
the dedup and the device windows share the device_id shuffle; the
broadcast join adds no exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.timeutil import parse_iso_ts
from . import cleaning, enrichment, quality, windows


def bronze_to_silver(
    bronze: DataFrame,
    catalog: DataFrame | None = None,
    watermark_hours: float = quality.DEFAULT_WATERMARK_HOURS,
) -> DataFrame:
    """Full silver transform over a bronze DataFrame (timestamps may be
    ISO strings, as stored by the bronze layer)."""
    df = bronze
    # F1: ISO-8601 strings -> UTC timestamps (silver is the first typed layer)
    for ts_col in ["timestamp", "ingestion_time"]:
        if dict(df.dtypes).get(ts_col) == "string":
            df = df.withColumn(ts_col, parse_iso_ts(F.col(ts_col)))
    df = cleaning.drop_null_critical(df)
    df = cleaning.coerce_numerics(df)
    df = cleaning.apply_range_filters(df)
    df = cleaning.drop_all_null_numeric(df)
    # One shuffle for the whole pipeline: hash by device_id up front.
    # HashPartitioning(device_id) satisfies the dedup window's required
    # clustering on (device_id, timestamp) AND the rolling windows'
    # clustering on device_id, so Catalyst plans a single exchange and
    # one shared sort instead of back-to-back exchanges. Skew profile is
    # unchanged — the rolling windows already force per-device clustering.
    # no tiebreak_cols: bronze carries no unique row id, and rows tying
    # on (device_id, timestamp, ingestion_time) are exact duplicates in
    # this data model (same reading delivered twice), so any survivor
    # is the same row — mirrors the reference's subset-keyed
    # drop_duplicates (consumer/bronze_to_silver.py:125)
    df = cleaning.dedup_keep_first(
        df.repartition("device_id"), keys=["device_id", "timestamp"]
    )
    df = quality.add_quality_score(df)
    if catalog is not None:
        df = enrichment.enrich_with_catalog(df, catalog)
    else:
        df = df.withColumn("installation_date", F.lit(None).cast("date")).withColumn(
            "device_age_days", F.lit(None).cast("int")
        )
    df = quality.add_late_event_flag(df, watermark_hours)
    df = windows.add_rolling_metrics(df)
    return df.withColumn("date", F.to_date("timestamp"))
