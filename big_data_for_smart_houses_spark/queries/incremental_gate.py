"""Incremental-maintenance gate queries (round 4, third batch):
MERGE/upsert application and mergeable partial-aggregate rollups
(operators/merge.py).

Both queries are self-contained derivations over the driver tables so
the oracle can replay them: the upsert batch is a deterministic
transform of a key slice, and the incremental state/delta split is an
event-time cut — the gate then proves (a) keep-latest-with-update-
priority MERGE semantics row-for-row, and (b) state ⊕ delta equals
the from-scratch aggregate bit-for-bit after quantization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import quantize_cols
from ..operators.merge import (
    finalize_means,
    merge_partial_aggs,
    merge_upsert,
    partial_aggregate,
)
from ..session import configure_for_oracle_parity
from ..sources.parquet import load_table

INCR_SPLIT = "2024-01-15"


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    configure_for_oracle_parity(spark)
    return load_table(spark, sf_dir, "events")


def _orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    configure_for_oracle_parity(spark)
    return load_table(spark, sf_dir, "orders")


# ---------------------------------------------------------------------------
# MERGE / upsert
# ---------------------------------------------------------------------------

def _update_batch(orders: DataFrame) -> DataFrame:
    """Deterministic CDC batch: every 10th order re-priced 10% up with
    status 'U'. Every 20th keeps its ORIGINAL order date — those rows
    tie with the base version on the merge order column, proving the
    updates-win tie rule; the rest shift one day later and win on
    recency alone."""
    upd = orders.filter(F.col("o_orderkey") % 10 == 0)
    return upd.select(
        "o_orderkey",
        "o_custkey",
        F.lit("U").alias("o_orderstatus"),
        (F.col("o_totalprice") * 1.1).alias("o_totalprice"),
        F.when(
            F.col("o_orderkey") % 20 == 0, F.col("o_orderdate")
        )
        .otherwise(F.col("o_orderdate") + F.expr("INTERVAL 1 DAY"))
        .alias("o_orderdate"),
        "o_orderpriority",
    )


def q_merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE-INTO on plain parquet (operators/merge.py:merge_upsert):
    union + keep-latest window, updates winning ties — the Delta/
    Iceberg upsert answer without a table format. One key shuffle."""
    orders = _orders(spark, sf_dir)
    merged = merge_upsert(
        orders,
        _update_batch(orders),
        keys=["o_orderkey"],
        order_col="o_orderdate",
    )
    return merged.select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    )


ORACLE_MERGE_UPSERT_ORDERS = """
WITH updates AS (
  SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
         o_totalprice * 1.1 AS o_totalprice,
         CASE WHEN o_orderkey % 20 = 0 THEN o_orderdate
              ELSE o_orderdate + INTERVAL 1 DAY END AS o_orderdate,
         o_orderpriority
  FROM orders WHERE o_orderkey % 10 = 0
),
tagged AS (
  SELECT *, 0 AS src FROM orders
  UNION ALL
  SELECT *, 1 AS src FROM updates
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY o_orderkey ORDER BY o_orderdate DESC, src DESC) AS rn
  FROM tagged
)
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
       o_orderpriority
FROM ranked WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# Mergeable partial aggregates (incremental rollup)
# ---------------------------------------------------------------------------

def q_incremental_energy_state(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Incremental rollup maintenance (operators/merge.py): the first
    half-month's per-(user, day) state absorbs the second half's delta
    via the monoid merge, finalized to means at read time — and must
    equal the from-scratch aggregate the oracle computes. Merging
    shuffles only |keys| rows, never raw events."""
    ev = _events(spark, sf_dir).select(
        "user_id",
        F.col("ts").cast("date").alias("date"),
        "value",
        "ts",
    )
    state = partial_aggregate(
        ev.filter(F.col("ts") < F.lit(INCR_SPLIT).cast("timestamp")),
        keys=["user_id", "date"],
        measures=["value"],
    )
    delta = partial_aggregate(
        ev.filter(F.col("ts") >= F.lit(INCR_SPLIT).cast("timestamp")),
        keys=["user_id", "date"],
        measures=["value"],
    )
    merged = merge_partial_aggs(
        state, delta, keys=["user_id", "date"], sum_cols=["value"]
    )
    out = finalize_means(merged, ["value"]).select(
        "user_id",
        "date",
        F.col("value").alias("sum_value"),
        "n",
        "avg_value",
    )
    return quantize_cols(out, "sum_value", "avg_value")


ORACLE_INCREMENTAL_ENERGY_STATE = """
SELECT user_id, CAST(ts AS DATE) AS date,
       CAST(CAST(sum(value) AS REAL) AS DOUBLE) AS sum_value,
       CAST(count(*) AS BIGINT) AS n,
       CAST(CAST(sum(value) / count(*) AS REAL) AS DOUBLE) AS avg_value
FROM events
GROUP BY 1, 2
"""


QUERIES = {
    "merge_upsert_orders": q_merge_upsert_orders,
    "incremental_energy_state": q_incremental_energy_state,
}

ORACLES = {
    "merge_upsert_orders": ORACLE_MERGE_UPSERT_ORDERS,
    "incremental_energy_state": ORACLE_INCREMENTAL_ENERGY_STATE,
}


# ---------------------------------------------------------------------------
# SCD2 dimension history
# ---------------------------------------------------------------------------

def q_scd2_customer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 history build (operators/merge.py:scd2_intervals): each
    order versions its customer's order state — valid_from/valid_to
    from the next change via one lead window, open-ended current
    version flagged. The point-in-time complement of the as-of join
    family."""
    orders = _orders(spark, sf_dir).select(
        "o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
    )
    from ..operators.merge import scd2_intervals

    return scd2_intervals(
        orders,
        keys=["o_custkey"],
        effective_col="o_orderdate",
        tiebreak_col="o_orderkey",
    ).select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        "valid_from",
        "valid_to",
        "is_current",
    )


ORACLE_SCD2_CUSTOMER_ORDERS = """
SELECT o_custkey, o_orderkey, o_totalprice,
       o_orderdate AS valid_from,
       lead(o_orderdate) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
       ) AS valid_to,
       lead(o_orderdate) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
       ) IS NULL AS is_current
FROM orders
"""

QUERIES["scd2_customer_orders"] = q_scd2_customer_orders
ORACLES["scd2_customer_orders"] = ORACLE_SCD2_CUSTOMER_ORDERS


# ---------------------------------------------------------------------------
# SCD2 point-in-time lookup (the read half of the version chain)
# ---------------------------------------------------------------------------

ASOF_LAG_DAYS = 15


def q_scd2_asof_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The READ half of SCD2: facts joined to the dimension version
    valid at their timestamp, composing scd2_intervals (the write
    half, gated by ``scd2_customer_orders``) with the single-shuffle
    as-of join (operators/joins.py:asof_join) instead of an interval
    containment join — same answer, O(n+m) rows per key instead of
    per-pair intermediates.

    Facts are each order asking for its customer's state 15 days
    later. Zero-length versions (two same-key changes at one instant:
    all but the chain's last get valid_to == valid_from) are dropped
    first, leaving exactly one LIVE version per (key, valid_from), so
    the as-of's latest-version-at-or-before-t lookup is precisely
    interval containment — which is what the DuckDB oracle runs."""
    orders = _orders(spark, sf_dir).select(
        "o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
    )
    from ..operators.joins import asof_join
    from ..operators.merge import scd2_intervals

    versions = scd2_intervals(
        orders,
        keys=["o_custkey"],
        effective_col="o_orderdate",
        tiebreak_col="o_orderkey",
    )
    live = versions.filter(
        F.col("valid_to").isNull()
        | (F.col("valid_to") > F.col("valid_from"))
    )
    dim = live.select(
        "o_custkey",
        "valid_from",
        F.col("o_orderkey").alias("v_orderkey"),
        F.col("o_totalprice").alias("v_totalprice"),
    )
    facts = orders.select(
        "o_orderkey",
        "o_custkey",
        F.col("o_orderdate")
        .cast("timestamp")
        .alias("t"),
    ).withColumn("t", F.col("t") + F.expr(f"INTERVAL {ASOF_LAG_DAYS} DAYS"))
    out = asof_join(
        facts,
        dim,
        on="o_custkey",
        left_ts="t",
        right_ts="valid_from",
        right_cols=["v_orderkey", "v_totalprice"],
    )
    return out.select(
        "o_orderkey",
        "o_custkey",
        "t",
        "v_orderkey",
        "v_totalprice",
        "valid_from_asof",
    )


ORACLE_SCD2_ASOF_LOOKUP = f"""
WITH versions AS (
  SELECT o_custkey,
         o_orderkey AS v_orderkey,
         o_totalprice AS v_totalprice,
         o_orderdate AS valid_from,
         lead(o_orderdate) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ) AS valid_to
  FROM orders
),
live AS (
  SELECT * FROM versions
  WHERE valid_to IS NULL OR valid_to > valid_from
),
facts AS (
  SELECT o_orderkey, o_custkey,
         o_orderdate + INTERVAL {ASOF_LAG_DAYS} DAY AS t
  FROM orders
)
SELECT f.o_orderkey, f.o_custkey, f.t,
       l.v_orderkey, l.v_totalprice,
       l.valid_from AS valid_from_asof
FROM facts f JOIN live l
  ON f.o_custkey = l.o_custkey
 AND l.valid_from <= f.t
 AND (l.valid_to IS NULL OR f.t < l.valid_to)
"""

QUERIES["scd2_asof_lookup"] = q_scd2_asof_lookup
ORACLES["scd2_asof_lookup"] = ORACLE_SCD2_ASOF_LOOKUP


def q_snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC between snapshots (operators/merge.py:snapshot_diff): B is
    A with every 7th key deleted, every 3rd surviving key's price
    revised, every 3rd's status NULLed alternately (exercising the
    null-safe comparison in both directions), and a block of new keys
    inserted. One full-outer key join; the oracle classifies the same
    deltas in closed form. Unchanged keys never leave the plan."""
    configure_for_oracle_parity(spark)
    from ..operators.merge import snapshot_diff

    a = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    surviving = a.filter(F.col("o_orderkey") % 7 != 0)
    b = surviving.select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 3 == 0, F.col("o_totalprice") * 1.05
        )
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
        F.when(F.col("o_orderkey") % 6 == 0, F.lit(None).cast("string"))
        .otherwise(F.col("o_orderstatus"))
        .alias("o_orderstatus"),
    ).unionByName(
        a.filter(F.col("o_orderkey") % 11 == 0).select(
            (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
            "o_totalprice",
            "o_orderstatus",
        )
    )
    return snapshot_diff(
        a, b, keys=["o_orderkey"],
        compare_cols=["o_totalprice", "o_orderstatus"],
    )


ORACLE_SNAPSHOT_DIFF_ORDERS = """
WITH a AS (
  SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
),
b AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice * 1.05
              ELSE o_totalprice END AS o_totalprice,
         CASE WHEN o_orderkey % 6 = 0 THEN NULL
              ELSE o_orderstatus END AS o_orderstatus
  FROM a WHERE o_orderkey % 7 <> 0
  UNION ALL
  SELECT o_orderkey + 10000000, o_totalprice, o_orderstatus
  FROM a WHERE o_orderkey % 11 = 0
),
j AS (
  SELECT coalesce(a.o_orderkey, b.o_orderkey) AS o_orderkey,
         CASE WHEN a.o_orderkey IS NULL THEN 'insert'
              WHEN b.o_orderkey IS NULL THEN 'delete'
              WHEN a.o_totalprice IS DISTINCT FROM b.o_totalprice
                OR a.o_orderstatus IS DISTINCT FROM b.o_orderstatus
              THEN 'update' ELSE 'unchanged' END AS change_type,
         a.o_totalprice AS o_totalprice_old,
         a.o_orderstatus AS o_orderstatus_old,
         b.o_totalprice AS o_totalprice_new,
         b.o_orderstatus AS o_orderstatus_new
  FROM a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey
)
SELECT * FROM j WHERE change_type <> 'unchanged'
"""

QUERIES["snapshot_diff_orders"] = q_snapshot_diff_orders
ORACLES["snapshot_diff_orders"] = ORACLE_SNAPSHOT_DIFF_ORDERS


def q_incremental_join_view_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Incremental JOIN-view maintenance
    (operators/merge.py:incremental_join_delta): the orders ⋈ customer
    enrichment view maintained under inserts to BOTH sides (every 4th
    order and every 5th customer arrive as deltas) — the old view plus
    the three delta-join terms, never re-running a_old ⋈ b_old. The
    oracle simply joins the COMPLETE tables: maintained == recomputed
    is the IVM correctness statement."""
    configure_for_oracle_parity(spark)
    from ..operators.merge import incremental_join_delta

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_custkey").alias("custkey"), "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"), "c_mktsegment", "c_acctbal"
    )
    a_old = orders.filter(F.col("o_orderkey") % 4 != 0)
    da = orders.filter(F.col("o_orderkey") % 4 == 0)
    b_old = cust.filter(F.col("custkey") % 5 != 0)
    db = cust.filter(F.col("custkey") % 5 == 0)
    view_old = a_old.join(b_old, "custkey")
    dj = incremental_join_delta(a_old, da, b_old, db, on=["custkey"])
    return view_old.unionByName(dj).select(
        "o_orderkey", "custkey", "o_totalprice", "c_mktsegment", "c_acctbal"
    )


ORACLE_INCREMENTAL_JOIN_VIEW_ORDERS = """
SELECT o_orderkey, o_custkey AS custkey, o_totalprice,
       c_mktsegment, c_acctbal
FROM orders JOIN customer ON o_custkey = c_custkey
"""

QUERIES["incremental_join_view_orders"] = q_incremental_join_view_orders
ORACLES["incremental_join_view_orders"] = (
    ORACLE_INCREMENTAL_JOIN_VIEW_ORDERS
)


def q_conform_union_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-drift conformance on the hash path
    (sources/conform.py:conform_to_schema): two deliberately drifted
    projections of the orders table — one missing the status column
    and carrying the price as a STRING (with every 13th value
    corrupted to a non-numeric token), one with an extra column the
    target drops — are conformed onto one target schema and unioned.
    try_cast nulls the corrupted prices instead of failing the stage;
    the oracle replays the drift and the coercion. Pure projection:
    zero shuffles."""
    configure_for_oracle_parity(spark)
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from ..sources.conform import conform_to_schema

    target = StructType(
        [
            StructField("o_orderkey", LongType()),
            StructField("o_totalprice", DoubleType()),
            StructField("o_orderstatus", StringType()),
            StructField("src", StringType()),
        ]
    )
    orders = load_table(spark, sf_dir, "orders")
    # source A: price arrives as a string, sometimes garbage; no status
    a = orders.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 13 == 0, F.lit("not-a-number"))
        .otherwise(F.col("o_totalprice").cast("string"))
        .alias("o_totalprice"),
        F.lit("a").alias("src"),
    )
    # source B: extra column the target schema drops
    b = orders.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey",
        "o_totalprice",
        "o_orderstatus",
        F.lit("b").alias("src"),
        F.lit(1).alias("debug_flag"),
    )
    return conform_to_schema(a, target).unionByName(
        conform_to_schema(b, target)
    )


ORACLE_CONFORM_UNION_SOURCES = """
SELECT o_orderkey,
       CASE WHEN o_orderkey % 13 = 0 THEN NULL
            ELSE TRY_CAST(CAST(o_totalprice AS VARCHAR) AS DOUBLE)
       END AS o_totalprice,
       NULL AS o_orderstatus,
       'a' AS src
FROM orders WHERE o_orderkey % 2 = 0
UNION ALL
SELECT o_orderkey, o_totalprice, o_orderstatus, 'b' AS src
FROM orders WHERE o_orderkey % 2 = 1
"""

QUERIES["conform_union_sources"] = q_conform_union_sources
ORACLES["conform_union_sources"] = ORACLE_CONFORM_UNION_SOURCES


# ---------------------------------------------------------------------------
# Time travel: as_of_version reconstruction (round 7 — the read-side
# completion of the IVM trio)
# ---------------------------------------------------------------------------

def _tt_batches(o: DataFrame) -> tuple[DataFrame, list[DataFrame]]:
    """Deterministic 2-version history over orders, keyed by
    o_orderkey: base (v0) holds keys with k%5≠4; v1 inserts the
    held-out k%5=4 keys, re-prices k%10=0 keys (+100, status U1) and
    deletes k%7=0 keys (among the non-updated base keys); v2 deletes
    k%11=0 and re-prices k%13=0 (×2, status U2 — including keys v1
    deleted, proving update-after-delete re-materializes). Every rule
    is a pure key predicate so the DuckDB oracle can materialize the
    v2 state INDEPENDENTLY (closed-form CASE per key), not by
    replaying the engine's window algorithm."""
    k = F.col("o_orderkey")
    cols = [k.alias("o_orderkey"), F.col("o_totalprice"),
            F.col("o_orderstatus")]
    base = o.filter(k % 5 != 4).select(*cols)
    v1 = (
        o.filter(k % 5 == 4)
        .select(*cols, F.lit("insert").alias("change_type"))
        .unionByName(
            o.filter((k % 5 != 4) & (k % 10 == 0)).select(
                k.alias("o_orderkey"),
                (F.col("o_totalprice") + F.lit(100.0)).alias(
                    "o_totalprice"
                ),
                F.lit("U1").alias("o_orderstatus"),
                F.lit("update").alias("change_type"),
            )
        )
        .unionByName(
            o.filter((k % 5 != 4) & (k % 10 != 0) & (k % 7 == 0))
            .select(
                k.alias("o_orderkey"),
                F.lit(None).cast("double").alias("o_totalprice"),
                F.lit(None).cast("string").alias("o_orderstatus"),
                F.lit("delete").alias("change_type"),
            )
        )
    )
    v2 = (
        o.filter(k % 11 == 0)
        .select(
            k.alias("o_orderkey"),
            F.lit(None).cast("double").alias("o_totalprice"),
            F.lit(None).cast("string").alias("o_orderstatus"),
            F.lit("delete").alias("change_type"),
        )
        .unionByName(
            o.filter((k % 11 != 0) & (k % 13 == 0)).select(
                k.alias("o_orderkey"),
                (F.col("o_totalprice") * F.lit(2.0)).alias(
                    "o_totalprice"
                ),
                F.lit("U2").alias("o_orderstatus"),
                F.lit("update").alias("change_type"),
            )
        )
    )
    return base, [v1, v2]


def q_time_travel_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`as_of_version` (operators/merge.py) on the hash path: a
    2-version CDC history over orders is reconstructed AS OF v2 in
    the operator's single windowed pass, and the oracle materializes
    the same state in CLOSED FORM (per-key CASE over the original
    table — an independent derivation, not a replay of the union +
    window algorithm). One row wrong in either direction — a
    resurrected delete, a stale price, a lost insert — is a hash
    mismatch. Arithmetic is engine-exact: +100.0 and ×2.0 are single
    IEEE ops on identical inputs."""
    from ..operators.merge import as_of_version

    base, batches = _tt_batches(_orders(spark, sf_dir))
    return as_of_version(
        base, batches, version=2, keys=["o_orderkey"]
    ).select("o_orderkey", "o_totalprice", "o_orderstatus")


ORACLE_TIME_TRAVEL_ORDERS = """
SELECT o_orderkey,
       CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice * 2.0
            WHEN o_orderkey % 5 = 4 THEN o_totalprice
            WHEN o_orderkey % 10 = 0 THEN o_totalprice + 100.0
            ELSE o_totalprice END AS o_totalprice,
       CASE WHEN o_orderkey % 13 = 0 THEN 'U2'
            WHEN o_orderkey % 5 = 4 THEN o_orderstatus
            WHEN o_orderkey % 10 = 0 THEN 'U1'
            ELSE o_orderstatus END AS o_orderstatus
FROM orders
WHERE o_orderkey % 11 <> 0
  AND NOT (o_orderkey % 13 <> 0 AND o_orderkey % 5 <> 4
           AND o_orderkey % 10 <> 0 AND o_orderkey % 7 = 0)
"""

QUERIES["time_travel_orders"] = q_time_travel_orders
ORACLES["time_travel_orders"] = ORACLE_TIME_TRAVEL_ORDERS


def q_vacuum_retention_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """`expire_versions` (operators/merge.py) on the hash path — the
    VACUUM/retention half of the format-free table-management story
    (OPTIMIZE = compact_files, time travel = as_of_version): fold the
    same 2-version CDC history as `time_travel_orders` at retention
    point v1 (base+v1 become the new base snapshot; v1 stops being
    independently reconstructable — that is the point), then read the
    retained history forward to the final state. The final state must
    be IDENTICAL to reading v2 off the un-vacuumed history, so the
    oracle is the same independent closed-form per-key CASE — but the
    engine path here is the two-stage fold (expire, then as_of over
    the survivors), which a broken retention fold (dropped tombstone,
    re-applied batch, off-by-one version split) breaks while leaving
    `time_travel_orders` green. Same engine-exact arithmetic."""
    from ..operators.merge import as_of_version, expire_versions

    base, batches = _tt_batches(_orders(spark, sf_dir))
    new_base, rest = expire_versions(
        base, batches, keep_from_version=1, keys=["o_orderkey"]
    )
    return as_of_version(
        new_base, rest, version=1, keys=["o_orderkey"]
    ).select("o_orderkey", "o_totalprice", "o_orderstatus")


QUERIES["vacuum_retention_orders"] = q_vacuum_retention_orders
ORACLES["vacuum_retention_orders"] = ORACLE_TIME_TRAVEL_ORDERS


def q_rollup_navigate_events(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Aggregate navigation (operators/merge.py:reaggregate_rollup):
    the DAILY per-type rollup answered FROM the materialized HOURLY
    partial-aggregate table — never rescanning the fact — while the
    oracle computes the daily answer DIRECT from raw events. A green
    hash row is therefore the materialized-view-rewrite correctness
    statement itself: navigating sum/count/min/max monoids up the
    time hierarchy loses nothing, and avg re-derived at the coarse
    grain (sum/count, one double division) equals the direct avg.
    Exactness: event values are 2-decimal by construction at every
    SF, so integer CENTS make every stored measure associative-exact
    (no float-sum ordering anywhere). Cost shape: one fact exchange
    into |hours x types| rows, then one tiny exchange over the
    partial table."""
    from ..operators.merge import reaggregate_rollup

    ev = _events(spark, sf_dir).withColumn(
        "cents", F.round(F.col("value") * 100).cast("bigint")
    )
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("hour"), "event_type"
    ).agg(
        F.sum("cents").alias("total_cents"),
        F.min("cents").alias("cents_min"),
        F.max("cents").alias("cents_max"),
        F.count(F.lit(1)).alias("n"),
    )
    daily = reaggregate_rollup(
        hourly.withColumn("day", F.to_date("hour")),
        coarse_keys=["day", "event_type"],
        sum_cols=["total_cents"],
        min_cols=["cents_min"],
        max_cols=["cents_max"],
    )
    return daily.select(
        "day",
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        "total_cents",
        "cents_min",
        "cents_max",
        (
            F.col("total_cents").cast("double")
            / (F.lit(100).cast("double") * F.col("n").cast("double"))
        ).alias("avg_value"),
    )


ORACLE_ROLLUP_NAVIGATE_EVENTS = """
WITH c AS (
  SELECT ts, event_type,
         CAST(round(value * 100, 0) AS BIGINT) AS cents
  FROM events
)
SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
       event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(cents) AS BIGINT) AS total_cents,
       min(cents) AS cents_min,
       max(cents) AS cents_max,
       CAST(CAST(sum(cents) AS BIGINT) AS DOUBLE)
         / (CAST(100 AS DOUBLE) * CAST(count(*) AS DOUBLE))
         AS avg_value
FROM c
GROUP BY 1, 2
"""

QUERIES["rollup_navigate_events"] = q_rollup_navigate_events
ORACLES["rollup_navigate_events"] = ORACLE_ROLLUP_NAVIGATE_EVENTS
