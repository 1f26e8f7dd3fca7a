"""Telemetry simulator on the rate source (SURVEY.md §2.10, M4).

The reference's producer (producer/telemetry_sim.py:86-153) is a
driver-side Python loop emitting 1 msg/device/s. Here the same value
model — per-type temperature/power ranges (config/config.py:50-76),
energy = power x elapsed-hours, ~5% alert rate — is a *distributed*
rate-source stream with deterministic hash-based pseudo-randomness, so
it scales to arbitrary msg/s by raising ``rowsPerSecond`` instead of
adding producer processes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_DEVICES = 10

DEVICE_TYPES = [
    # (type, temp_lo, temp_hi, power_lo, power_hi) — config/config.py:50-76
    ("thermostat", 18.0, 26.0, 1500.0, 3000.0),
    ("smart_bulb", 20.0, 25.0, 8.0, 15.0),
    ("smart_plug", 20.0, 25.0, 0.0, 1500.0),
    ("security_camera", 15.0, 30.0, 5.0, 12.0),
    ("motion_sensor", 18.0, 25.0, 0.1, 0.5),
]

ALERTS = [
    "high_temperature",
    "low_temperature",
    "high_power",
    "maintenance_required",
    "low_battery",
    "connectivity_issue",
]


def _unit_hash(*cols) -> F.Column:
    """Deterministic pseudo-uniform in [0, 1) from column values."""
    return (F.pmod(F.xxhash64(*cols), F.lit(1_000_000)) / 1_000_000.0)


def telemetry_stream_from_rate(
    spark: SparkSession, rows_per_second: int = 10
) -> DataFrame:
    """Rate-source stream shaped exactly like the producer's JSON
    (producer/telemetry_sim.py:138-151): one reading per device per
    tick, ISO-8601 string timestamps."""
    rate = spark.readStream.format("rate").option(
        "rowsPerSecond", rows_per_second
    ).load()
    dev_idx = F.pmod(F.col("value"), F.lit(N_DEVICES))
    type_idx = F.pmod(dev_idx, F.lit(len(DEVICE_TYPES)))

    temp = F.lit(None).cast("double")
    power = F.lit(None).cast("double")
    dtype = F.lit(None).cast("string")
    for i, (name, tlo, thi, plo, phi) in enumerate(DEVICE_TYPES):
        sel = type_idx == i
        u1 = _unit_hash(F.col("value"), F.lit(1))
        u2 = _unit_hash(F.col("value"), F.lit(2))
        temp = F.when(sel, F.lit(tlo) + u1 * (thi - tlo)).otherwise(temp)
        power = F.when(sel, F.lit(plo) + u2 * (phi - plo)).otherwise(power)
        dtype = F.when(sel, F.lit(name)).otherwise(dtype)

    alert_u = _unit_hash(F.col("value"), F.lit(3))
    alert_idx = F.pmod(F.xxhash64(F.col("value"), F.lit(4)), F.lit(len(ALERTS)))
    alert = F.when(alert_u < 0.95, "none").otherwise(
        F.element_at(
            F.array(*[F.lit(a) for a in ALERTS]), (alert_idx + 1).cast("int")
        )
    )

    return rate.select(
        F.concat(
            F.lit("device_"), F.lpad((dev_idx + 1).cast("string"), 3, "0")
        ).alias("device_id"),
        dtype.alias("device_type"),
        F.concat(
            F.lit("user_"),
            F.lpad((F.pmod(dev_idx, F.lit(2)) + 1).cast("string"), 3, "0"),
        ).alias("user_id"),
        F.date_format(F.col("timestamp"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX").alias(
            "timestamp"
        ),
        F.bround(temp, 2).alias("temperature"),
        F.bround(power, 2).alias("power_usage"),
        # energy = power x elapsed-hours at 1 reading/s (telemetry_sim.py:117-119)
        F.bround(power / 3600.0, 4).alias("energy_consumption_wh"),
        F.when(_unit_hash(F.col("value"), F.lit(5)) < 0.98, "online")
        .otherwise("maintenance")
        .alias("status"),
        alert.alias("alert"),
        F.lit("living_room").alias("location"),
        F.lit("Acme").alias("manufacturer"),
        F.lit("X1").alias("model"),
    )
