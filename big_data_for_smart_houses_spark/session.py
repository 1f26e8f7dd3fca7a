"""SparkSession factory tuned for this engine.

Local testing runs on ``local[N]`` but every setting is chosen to be
correct on a multi-executor cluster too: AQE on (runtime coalescing,
skew-join splitting), UTC session timezone (parity with the DuckDB
oracle and with the reference's tz-aware silver timestamps,
reference consumer/bronze_to_silver.py:122), Arrow enabled for the
pandas-UDF extension operators.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "big-data-for-smart-houses-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with scale-aware defaults.

    At 100 TB the same code runs with a higher ``shuffle_partitions``
    (or simply relies on AQE coalescing from a large initial number);
    nothing else here is local-mode specific.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    if not SparkSession.getActiveSession():
        builder = builder.master(f"local[{cpus}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def configure_for_oracle_parity(spark: SparkSession) -> SparkSession:
    """Pin runtime confs that affect value-level parity with DuckDB.

    The driver hands us its own SparkSession, so confs that matter for
    correctness (UTC timestamps; ANSI off so invalid casts yield null,
    matching the reference's coerce-to-NaN semantics at
    consumer/bronze_to_silver.py:136) are (re)applied here.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        spark.conf.set("spark.sql.ansi.enabled", "false")
    except Exception as exc:  # non-modifiable in some deployments
        # Don't swallow this silently: under ANSI, invalid casts THROW
        # instead of yielding null, which changes P2's coerce-to-null
        # semantics. The dedup/sketch hash operators are ANSI-safe by
        # construction (xxhash64 rehash instead of multiply), and the
        # sampling module's multiplicative hashes compute on residues
        # so they cannot overflow at any id (extensions/sampling.
        # _salted_bucket) — only the cast paths are affected; surface
        # the condition.
        import warnings

        warnings.warn(
            f"could not disable spark.sql.ansi.enabled ({exc}); "
            "invalid-cast coercion will raise instead of yielding null"
        )
    return spark
