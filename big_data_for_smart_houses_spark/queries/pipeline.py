"""The real medallion pipeline pushed through the correctness gate.

`silver_pipeline_events` maps the driver's `events` table into the
bronze telemetry shape deterministically and runs the production
``bronze_to_silver`` operator composition (validation, dedup, quality,
late flag, rolling windows — SURVEY.md §3.2); `gold_daily_energy_events`
runs the production A1 gold aggregation on top. The oracles replicate
the full pipeline as DuckDB CTE chains, so the driver hash-checks the
actual engine code path, not a simplified stand-in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import quantize_cols
from ..operators.gold import daily_energy_consumption
from ..operators.silver import bronze_to_silver
from ..session import configure_for_oracle_parity
from ..sources.parquet import load_table

SILVER_OUT_COLS = [
    "device_id",
    "timestamp",
    "temperature",
    "power_usage",
    "energy_consumption_wh",
    "quality_score",
    "is_valid",
    "processing_delay_hours",
    "is_late_event",
    "temp_1h_avg",
    "power_1h_avg",
    "energy_efficiency",
    "has_alert",
    "alert_frequency_1h",
    "date",
]


def _events_as_bronze(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic events -> telemetry mapping (FIXTURES.md §5):
    each user is a device, value drives the numeric channels, the JSON
    ``k`` prop synthesizes ingestion lag (0-99 h, so the 48 h late flag
    fires) and optional-field nullness (quality penalties fire)."""
    configure_for_oracle_parity(spark)
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return ev.select(
        F.concat(F.lit("device_"), F.col("user_id").cast("string")).alias(
            "device_id"
        ),
        F.col("event_type").alias("device_type"),
        F.concat(F.lit("user_"), F.col("user_id").cast("string")).alias("user_id"),
        F.col("ts").alias("timestamp"),
        F.col("value").alias("temperature"),
        (F.col("value") * 20.0).alias("power_usage"),
        F.col("value").alias("energy_consumption_wh"),
        F.lit("online").alias("status"),
        F.when(F.col("event_type") == "error", "high_power")
        .otherwise("none")
        .alias("alert"),
        F.when(k % 5 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("room_"), (k % 5).cast("string")))
        .alias("location"),
        F.when(k % 7 == 0, F.lit(None).cast("string"))
        .otherwise(F.lit("acme"))
        .alias("manufacturer"),
        F.lit("model_x").alias("model"),
        (F.col("ts") + F.make_interval(hours=k)).alias("ingestion_time"),
    )


def q_silver_pipeline_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full bronze->silver pipeline (SURVEY.md §3.2) on mapped events.

    The 1h window avgs are gate-quantized (see
    :func:`...functions.numeric.gate_quantize`): DuckDB's segment-tree
    window aggregation sums in a different order than Spark's running
    frame, leaving ulp-level diffs a byte hash would flag."""
    bronze = _events_as_bronze(spark, sf_dir)
    silver = bronze_to_silver(bronze, catalog=None)
    return quantize_cols(
        silver.select(*SILVER_OUT_COLS), "temp_1h_avg", "power_1h_avg"
    )


# The oracle replays every pipeline stage as SQL. Window frames are the
# 60-ROW frames of W1/W2; the delay is integer-µs arithmetic divided
# once, which is bit-identical in both engines.
_BRONZE_CTE = """
bronze AS (
  SELECT 'device_' || CAST(user_id AS VARCHAR) AS device_id,
         event_type AS device_type,
         'user_' || CAST(user_id AS VARCHAR) AS user_id,
         ts AS timestamp,
         value AS temperature,
         value * 20.0 AS power_usage,
         value AS energy_consumption_wh,
         'online' AS status,
         CASE WHEN event_type = 'error' THEN 'high_power' ELSE 'none' END AS alert,
         CASE WHEN k % 5 = 0 THEN NULL
              ELSE 'room_' || CAST(k % 5 AS VARCHAR) END AS location,
         CASE WHEN k % 7 = 0 THEN NULL ELSE 'acme' END AS manufacturer,
         'model_x' AS model,
         ts + to_hours(k) AS ingestion_time
  FROM (SELECT *, CAST(json_extract_string(props, '$.k') AS INT) AS k FROM events)
),
cleaned AS (
  SELECT * FROM bronze
  WHERE device_id IS NOT NULL AND device_type IS NOT NULL
    AND user_id IS NOT NULL AND timestamp IS NOT NULL
    AND temperature >= -50 AND temperature <= 100
    AND power_usage >= 0 AND power_usage <= 10000
    AND energy_consumption_wh >= 0
    AND (temperature IS NOT NULL OR power_usage IS NOT NULL
         OR energy_consumption_wh IS NOT NULL)
),
deduped AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY device_id, timestamp
                                 ORDER BY ingestion_time ASC) AS rn
    FROM cleaned
  ) WHERE rn = 1
),
scored AS (
  SELECT *,
    1.0 - (CASE WHEN location IS NULL THEN 0.1 ELSE 0.0 END)
        - (CASE WHEN manufacturer IS NULL THEN 0.1 ELSE 0.0 END)
        - (CASE WHEN model IS NULL THEN 0.1 ELSE 0.0 END)
        - (CASE WHEN temperature < 0 OR temperature > 50 THEN 0.2 ELSE 0.0 END)
        - (CASE WHEN power_usage > 5000 THEN 0.2 ELSE 0.0 END) AS quality_score
  FROM deduped
),
flagged AS (
  SELECT *,
    quality_score >= 0.5 AS is_valid,
    (epoch_us(ingestion_time) - epoch_us(timestamp)) / 3600000000.0
      AS processing_delay_hours,
    ((epoch_us(ingestion_time) - epoch_us(timestamp)) / 3600000000.0) > 48.0
      AS is_late_event,
    alert <> 'none' AS has_alert
  FROM scored
),
windowed AS (
  SELECT *,
    avg(temperature) OVER w AS temp_1h_avg,
    avg(power_usage) OVER w AS power_1h_avg,
    CASE WHEN power_usage > 0 THEN energy_consumption_wh / power_usage
         ELSE 0.0 END AS energy_efficiency,
    CAST(sum(CASE WHEN has_alert THEN 1 ELSE 0 END) OVER w AS DOUBLE)
      AS alert_frequency_1h,
    CAST(timestamp AS DATE) AS date
  FROM flagged
  WINDOW w AS (PARTITION BY device_id ORDER BY timestamp
               ROWS BETWEEN 59 PRECEDING AND CURRENT ROW)
)
"""

ORACLE_SILVER_PIPELINE_EVENTS = f"""
WITH {_BRONZE_CTE}
SELECT device_id, timestamp, temperature, power_usage, energy_consumption_wh,
       CAST(quality_score AS DOUBLE) AS quality_score,
       is_valid, processing_delay_hours, is_late_event,
       CAST(CAST(temp_1h_avg AS REAL) AS DOUBLE) AS temp_1h_avg,
       CAST(CAST(power_1h_avg AS REAL) AS DOUBLE) AS power_1h_avg,
       energy_efficiency, has_alert,
       alert_frequency_1h, date
FROM windowed
"""


def q_gold_daily_energy_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production A1 gold aggregation (operators/gold.py) over the
    pipeline silver — groupBy (device, type, user, date) with the full
    aggregate set and half-even rounding."""
    bronze = _events_as_bronze(spark, sf_dir)
    silver = bronze_to_silver(bronze, catalog=None)
    # Quantize EVERY order-sensitive float aggregate, not just the ones
    # observed to diverge: any double sum/avg jitters at the ulp level
    # run-to-run with partial-agg merge order, so an unquantized column
    # is a latent gate failure. Exact-by-construction columns (counts,
    # min/max, means of 0/1 indicators, and their scalings) stay raw.
    return quantize_cols(
        daily_energy_consumption(silver, rounded=False),
        "energy_consumption_wh_sum",
        "energy_consumption_wh_mean",
        "power_usage_mean",
        "temperature_mean",
        "quality_score_mean",
        "energy_cost_estimate",
        "avg_efficiency",
    )


ORACLE_GOLD_DAILY_ENERGY_EVENTS = f"""
WITH {_BRONZE_CTE},
agg AS (
  SELECT device_id, device_type, user_id, date,
    sum(energy_consumption_wh) AS s_energy,
    avg(energy_consumption_wh) AS m_energy,
    max(energy_consumption_wh) AS x_energy,
    count(energy_consumption_wh) AS c_energy,
    avg(power_usage) AS m_power,
    max(power_usage) AS x_power,
    avg(temperature) AS m_temp,
    min(temperature) AS n_temp,
    max(temperature) AS x_temp,
    avg(quality_score) AS m_quality,
    avg(CASE WHEN is_valid THEN 1.0 ELSE 0.0 END) AS m_valid,
    max(alert_frequency_1h) AS x_alert
  FROM windowed
  GROUP BY device_id, device_type, user_id, date
)
SELECT device_id, device_type, user_id, date,
       CAST(CAST(s_energy AS REAL) AS DOUBLE) AS energy_consumption_wh_sum,
       CAST(CAST(m_energy AS REAL) AS DOUBLE) AS energy_consumption_wh_mean,
       x_energy AS energy_consumption_wh_max,
       c_energy AS energy_consumption_wh_count,
       CAST(CAST(m_power AS REAL) AS DOUBLE) AS power_usage_mean,
       x_power AS power_usage_max,
       CAST(CAST(m_temp AS REAL) AS DOUBLE) AS temperature_mean,
       n_temp AS temperature_min,
       x_temp AS temperature_max,
       CAST(CAST(m_quality AS REAL) AS DOUBLE) AS quality_score_mean,
       m_valid AS is_valid_mean,
       x_alert AS alert_frequency_1h_max,
       CAST(CAST(s_energy / 1000.0 * 0.12 AS REAL) AS DOUBLE) AS energy_cost_estimate,
       -- ratio of group means, guarded (reference silver_to_gold.py:114-118)
       CAST(CAST(CASE WHEN m_power > 0 THEN m_energy / m_power ELSE 0.0 END AS REAL) AS DOUBLE)
         AS avg_efficiency,
       m_valid * 100.0 AS data_completeness,
       c_energy AS total_readings
FROM agg
"""


def q_catalog_enrichment_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 + P10 + P14 gated end-to-end: a deterministic device catalog
    (synthesized from the even user ids) broadcast-joined to the bronze
    telemetry; location/manufacturer/model coalesce from the catalog
    where the event is null, and device_age_days derives from the
    catalog installation date (the reference's INTENDED semantics —
    its own version silently no-ops, SURVEY.md §1.3)."""
    from ..operators.enrichment import enrich_with_catalog

    bronze = _events_as_bronze(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    uid = F.col("user_id")
    catalog = (
        ev.select(uid).distinct()
        .filter(uid % 2 == 0)
        .select(
            F.concat(F.lit("device_"), uid.cast("string")).alias("device_id"),
            F.concat(F.lit("room_c"), (uid % 4).cast("string")).alias(
                "location"
            ),
            F.lit("cat_acme").alias("manufacturer"),
            F.lit("model_c").alias("model"),
            F.date_add(
                F.lit("2020-01-01").cast("date"), (uid % 365).cast("int")
            ).alias("installation_date"),
        )
    )
    return enrich_with_catalog(bronze, catalog).select(
        "device_id",
        "timestamp",
        "location",
        "manufacturer",
        "model",
        "device_age_days",
    )


ORACLE_CATALOG_ENRICHMENT_EVENTS = f"""
WITH {_BRONZE_CTE},
catalog AS (
  SELECT 'device_' || CAST(user_id AS VARCHAR) AS device_id,
         'room_c' || CAST(user_id % 4 AS VARCHAR) AS cat_location,
         'cat_acme' AS cat_manufacturer,
         'model_c' AS cat_model,
         DATE '2020-01-01' + to_days(CAST(user_id % 365 AS INT))
           AS installation_date
  FROM (SELECT DISTINCT user_id FROM events WHERE user_id % 2 = 0)
)
SELECT b.device_id, b.timestamp,
       coalesce(b.location, c.cat_location) AS location,
       coalesce(b.manufacturer, c.cat_manufacturer) AS manufacturer,
       coalesce(b.model, c.cat_model) AS model,
       CAST(datediff('day', c.installation_date, CAST(b.timestamp AS DATE))
            AS INT) AS device_age_days
FROM bronze b LEFT JOIN catalog c ON b.device_id = c.device_id
"""


def billing_statement_fixture(usage: DataFrame) -> DataFrame:
    """The deterministic statement table both billing gates (and the
    round-14 streaming ingestion gate) synthesize from the usage
    rollup: integer-derived rates/charges over the EXACT n_readings
    counts so both engines compute bit-identical doubles; odd users
    unbilled, users ≡ 0 (mod 7) get a phantom 2023-12 statement.
    ``usage`` needs user_id, billing_period, n_readings."""
    uid = F.col("user_id")
    rate = (F.lit(8).cast("double") + (uid % 5).cast("double")) / F.lit(
        100.0
    )
    base = (F.lit(10) + (uid % 3) * 5).cast("double")
    billed = (F.col("n_readings") * 99).cast("double") / F.lit(2000.0)
    statements = usage.where(uid % 2 == 0).select(
        "user_id",
        "billing_period",
        rate.alias("energy_rate_kwh"),
        base.alias("base_charge"),
        billed.alias("total_usage_kwh"),
        (base + billed * rate).alias("total_cost"),
    )
    phantom = (
        usage.select("user_id")
        .distinct()
        .where(uid % 7 == 0)
        .select(
            "user_id",
            F.lit("2023-12").alias("billing_period"),
            rate.alias("energy_rate_kwh"),
            base.alias("base_charge"),
            F.lit(100.0).alias("total_usage_kwh"),
            (base + F.lit(100.0) * rate).alias("total_cost"),
        )
    )
    return statements.unionByName(phantom)


def q_billing_reconciliation_events(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Billing reconciliation (operators/billing.py) — the join the
    reference's data model declares but never runs: its billing
    dimension (config/billing_data.csv:1), ``billing.raw`` topic and
    bronze/silver billing dirs (config/config.py:13,25,29) are
    consumed by NO ETL (SURVEY.md §1.3). Monthly tumbling usage
    rollup over events -> hint-free statement join (AQE picks
    broadcast at this scale; round-13 verdict ask #3) -> recomputed
    cost + guarded effective-rate division.

    The statement fixture is synthesized deterministically from the
    usage rollup's EXACT integer reading counts (never its float
    sums), with integer-derived rates/charges so both engines compute
    bit-identical doubles: rate = (8 + uid%5)/100, base = 10 +
    (uid%3)*5, billed kWh = readings*99/2000 — the metered sum's
    expected magnitude (mean event value ≈ 49.5 Wh, measured at all
    three SFs), so the 5%% usage verdict genuinely splits
    true/false on the data (~33-47%% true per SF) instead of being
    constant. Odd users get no statement
    (exercising the left-outer nulls); users ≡ 0 (mod 7) get a
    phantom 2023-12 statement no usage matches (dropped by the left
    join here; surfaced by operators/billing.unbilled_statements in
    the unit suite). The order-sensitive metered kWh sum is gate-
    quantized; every downstream delta derives from the quantized
    value identically in both engines."""
    configure_for_oracle_parity(spark)
    from ..operators.billing import monthly_usage, reconcile_billing

    ev = load_table(spark, sf_dir, "events")
    usage = quantize_cols(monthly_usage(ev), "metered_usage_kwh")
    return reconcile_billing(
        usage, billing_statement_fixture(usage), rel_tolerance=0.05
    )


ORACLE_BILLING_RECONCILIATION_EVENTS = """
WITH usage AS (
  SELECT user_id,
         strftime(ts, '%Y-%m') AS billing_period,
         CAST(CAST(sum(value) / 1000.0 AS REAL) AS DOUBLE)
           AS metered_usage_kwh,
         count(*) AS n_readings
  FROM events
  GROUP BY 1, 2
), statements AS (
  SELECT user_id, billing_period,
         CAST(8 + user_id % 5 AS DOUBLE) / 100.0 AS energy_rate_kwh,
         CAST(10 + (user_id % 3) * 5 AS DOUBLE) AS base_charge,
         CAST(n_readings * 99 AS DOUBLE) / 2000.0 AS total_usage_kwh,
         CAST(10 + (user_id % 3) * 5 AS DOUBLE)
           + (CAST(n_readings * 99 AS DOUBLE) / 2000.0)
             * (CAST(8 + user_id % 5 AS DOUBLE) / 100.0) AS total_cost,
         TRUE AS has_stmt
  FROM usage WHERE user_id % 2 = 0
  UNION ALL
  SELECT user_id, '2023-12',
         CAST(8 + user_id % 5 AS DOUBLE) / 100.0,
         CAST(10 + (user_id % 3) * 5 AS DOUBLE),
         CAST(100.0 AS DOUBLE),
         CAST(10 + (user_id % 3) * 5 AS DOUBLE)
           + 100.0 * (CAST(8 + user_id % 5 AS DOUBLE) / 100.0),
         TRUE
  FROM (SELECT DISTINCT user_id FROM events WHERE user_id % 7 = 0)
)
SELECT u.user_id, u.billing_period, u.metered_usage_kwh, u.n_readings,
       s.energy_rate_kwh, s.base_charge,
       s.total_usage_kwh AS billed_usage_kwh,
       s.total_cost AS billed_cost,
       u.metered_usage_kwh - s.total_usage_kwh AS usage_delta_kwh,
       s.base_charge + u.metered_usage_kwh * s.energy_rate_kwh
         AS computed_cost,
       (s.base_charge + u.metered_usage_kwh * s.energy_rate_kwh)
         - s.total_cost AS cost_delta,
       CASE WHEN s.total_usage_kwh > 0
            THEN (s.total_cost - s.base_charge) / s.total_usage_kwh
            ELSE 0.0 END AS effective_rate_kwh,
       COALESCE(s.has_stmt, FALSE) AS has_statement,
       COALESCE(
         abs(u.metered_usage_kwh - s.total_usage_kwh)
           <= CAST(0.05 AS DOUBLE) * s.total_usage_kwh,
         FALSE) AS usage_reconciled,
       COALESCE(
         abs((s.base_charge + u.metered_usage_kwh * s.energy_rate_kwh)
             - s.total_cost) <= CAST(0.05 AS DOUBLE) * s.total_cost,
         FALSE) AS reconciled
FROM usage u LEFT JOIN statements s USING (user_id, billing_period)
"""


def q_billing_unbilled_events(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The reconciliation's other direction
    (operators/billing.unbilled_statements): statements with no
    metered usage in their period — the phantom bills the left join
    in billing_reconciliation_events correctly drops. Anti-join
    driven from the statement side over the aggregated usage rollup
    (both dimension-sized at 100 TB), so this certifies the
    hint-free left_anti path (AQE broadcasts at this scale;
    round-13 verdict ask #3). Same deterministic statement fixture
    as the reconciliation gate: the result is exactly the users ≡ 0
    (mod 7) phantom 2023-12 statements."""
    configure_for_oracle_parity(spark)
    from ..operators.billing import monthly_usage, unbilled_statements

    ev = load_table(spark, sf_dir, "events")
    # no quantize here: the float usage sum never reaches this gate's
    # output (Catalyst prunes the unused aggregate), only the exact
    # integer n_readings feeds the fixture
    usage = monthly_usage(ev)
    return unbilled_statements(usage, billing_statement_fixture(usage))


ORACLE_BILLING_UNBILLED_EVENTS = """
WITH usage AS (
  SELECT user_id,
         strftime(ts, '%Y-%m') AS billing_period,
         count(*) AS n_readings
  FROM events
  GROUP BY 1, 2
), statements AS (
  SELECT user_id, billing_period,
         CAST(8 + user_id % 5 AS DOUBLE) / 100.0 AS energy_rate_kwh,
         CAST(10 + (user_id % 3) * 5 AS DOUBLE) AS base_charge,
         CAST(n_readings * 99 AS DOUBLE) / 2000.0 AS total_usage_kwh,
         CAST(10 + (user_id % 3) * 5 AS DOUBLE)
           + (CAST(n_readings * 99 AS DOUBLE) / 2000.0)
             * (CAST(8 + user_id % 5 AS DOUBLE) / 100.0) AS total_cost,
         TRUE AS has_stmt
  FROM usage WHERE user_id % 2 = 0
  UNION ALL
  SELECT user_id, '2023-12',
         CAST(8 + user_id % 5 AS DOUBLE) / 100.0,
         CAST(10 + (user_id % 3) * 5 AS DOUBLE),
         CAST(100.0 AS DOUBLE),
         CAST(10 + (user_id % 3) * 5 AS DOUBLE)
           + 100.0 * (CAST(8 + user_id % 5 AS DOUBLE) / 100.0),
         TRUE
  FROM (SELECT DISTINCT user_id FROM events WHERE user_id % 7 = 0)
)
SELECT s.user_id, s.billing_period, s.energy_rate_kwh, s.base_charge,
       s.total_usage_kwh, s.total_cost
FROM statements s
ANTI JOIN usage u USING (user_id, billing_period)
"""


QUERIES = {
    "silver_pipeline_events": q_silver_pipeline_events,
    "gold_daily_energy_events": q_gold_daily_energy_events,
    "catalog_enrichment_events": q_catalog_enrichment_events,
    "billing_reconciliation_events": q_billing_reconciliation_events,
    "billing_unbilled_events": q_billing_unbilled_events,
}

ORACLES = {
    "silver_pipeline_events": ORACLE_SILVER_PIPELINE_EVENTS,
    "gold_daily_energy_events": ORACLE_GOLD_DAILY_ENERGY_EVENTS,
    "catalog_enrichment_events": ORACLE_CATALOG_ENRICHMENT_EVENTS,
    "billing_reconciliation_events": ORACLE_BILLING_RECONCILIATION_EVENTS,
    "billing_unbilled_events": ORACLE_BILLING_UNBILLED_EVENTS,
}
