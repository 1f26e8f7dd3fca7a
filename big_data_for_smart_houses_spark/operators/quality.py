"""Quality scoring and late-event flagging (SURVEY.md §2.2 P7/P8/P13).

Pure Column arithmetic — stays in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.timeutil import delta_hours_us

DEFAULT_WATERMARK_HOURS = 48.0  # reference consumer/bronze_to_silver.py:213


def add_quality_score(df: DataFrame) -> DataFrame:
    """P7/P8 — start at 1.0; −0.1 per missing optional field
    (location/manufacturer/model); −0.2 if temperature outside [0, 50];
    −0.2 if power_usage > 5000; is_valid = score >= 0.5 (reference
    consumer/bronze_to_silver.py:150-168)."""
    penalty = F.lit(0.0)
    for f in ["location", "manufacturer", "model"]:
        penalty = penalty + F.when(F.col(f).isNull(), 0.1).otherwise(0.0)
    penalty = penalty + F.when(
        (F.col("temperature") < 0) | (F.col("temperature") > 50), 0.2
    ).otherwise(0.0)
    penalty = penalty + F.when(F.col("power_usage") > 5000, 0.2).otherwise(0.0)
    return df.withColumn("quality_score", F.lit(1.0) - penalty).withColumn(
        "is_valid", F.col("quality_score") >= 0.5
    )


def add_late_event_flag(
    df: DataFrame, watermark_hours: float = DEFAULT_WATERMARK_HOURS
) -> DataFrame:
    """P13/T3 — processing_delay_hours at µs precision and a
    flag-only late marker; late rows are kept, never dropped (reference
    consumer/bronze_to_silver.py:213-237 — semantics differ from a Spark
    ``withWatermark`` drop, so a watermark is deliberately NOT used)."""
    return df.withColumn(
        "processing_delay_hours",
        delta_hours_us(F.col("ingestion_time"), F.col("timestamp")),
    ).withColumn(
        "is_late_event", F.col("processing_delay_hours") > F.lit(watermark_hours)
    )
