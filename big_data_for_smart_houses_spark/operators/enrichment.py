"""Catalog enrichment (SURVEY.md §2.3 J1, §2.2 P10/P14).

The device catalog is a 10-row dimension — broadcast hash join, no
shuffle of the fact side. At 100 TB the fact table never moves; only
the kilobyte-sized dimension is shipped to executors.

Implements the reference's *intended* semantics for
installation_date/device_age_days: its own version silently no-ops at
runtime because of a tz-aware/naive subtraction bug swallowed by a
blanket except (reference consumer/bronze_to_silver.py:200-211;
SURVEY.md §1.3). Here the left join + datediff is done correctly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_with_catalog(telemetry: DataFrame, catalog: DataFrame) -> DataFrame:
    """J1 + P10 + P14: LEFT JOIN the broadcast catalog on device_id,
    coalesce location/manufacturer/model from the catalog where the
    event lacks them (reference consumer/bronze_to_silver.py:185-197),
    and derive device_age_days = datediff(timestamp, installation_date)
    (intended semantics of :200-204)."""
    cat = F.broadcast(
        catalog.select(
            "device_id",
            F.col("location").alias("_cat_location"),
            F.col("manufacturer").alias("_cat_manufacturer"),
            F.col("model").alias("_cat_model"),
            "installation_date",
        )
    )
    df = telemetry.join(cat, on="device_id", how="left")
    for f in ["location", "manufacturer", "model"]:
        df = df.withColumn(f, F.coalesce(F.col(f), F.col(f"_cat_{f}"))).drop(
            f"_cat_{f}"
        )
    return df.withColumn(
        "device_age_days",
        F.datediff(F.to_date("timestamp"), F.col("installation_date")).cast("int"),
    )
