"""Streaming-EXECUTED gate query (round 5): the first CORRECTNESS row
produced by an actual Structured Streaming run, not a batch plan.

``locf_stream_availablenow`` drives the stateful streaming LOCF
operator (streaming/stateful.py:locf_stream — applyInPandasWithState,
one open-bucket row of state per key) over the driver's events table
via a file-source stream with ``trigger(availableNow=True)``, sinks to
parquet, and returns the sink. The DuckDB oracle replays the BATCH
gap-fill-LOCF semantics minus each key's final (still-open) bucket —
the operator's documented append-mode contract — so the hash gate
proves stream-vs-batch parity end to end through a real streaming
execution: state store, Arrow chunking, micro-batch plumbing and all.

Everything is staged under a fresh ``tempfile.mkdtemp()`` per call, so
re-runs (the driver calls each query at least twice: rows, then
values) always stream from a clean checkpoint and produce identical
output.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import configure_for_oracle_parity
from ..sources.parquet import load_table
from ..streaming.stateful import locf_stream

LOCF_STEP_S = 3600
_AWAIT_S = 300


def q_locf_stream_availablenow(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Run the streaming LOCF gap-fill over the events table as a real
    availableNow stream and return the parquet sink's contents.

    The input is staged as ONE file so the whole table arrives in one
    micro-batch (the operator drops cross-batch late events by
    contract — a watermark's job, not this gate's); within the batch
    the fold sorts the entire per-key group, so Arrow chunk order is
    irrelevant (the round-5 chunk fix, exercised here end to end)."""
    configure_for_oracle_parity(spark)
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "value"
    )
    tmp = tempfile.mkdtemp(prefix="locf_stream_gate_")
    staged = f"{tmp}/staged"
    out_dir = f"{tmp}/out"
    ev.coalesce(1).write.mode("overwrite").parquet(staged)
    stream = spark.readStream.schema(ev.schema).parquet(staged)
    q = (
        locf_stream(stream, LOCF_STEP_S)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", f"{tmp}/ckpt")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(_AWAIT_S):
        q.stop()
        raise TimeoutError(
            f"locf_stream availableNow run exceeded {_AWAIT_S}s"
        )
    return spark.read.parquet(out_dir).select(
        "user_id", "bucket_time", "value", "is_gap"
    )


# Batch LOCF oracle (mirrors stats_gate.ORACLE_GAPFILL_LOCF_EVENTS)
# with the grid stopping BEFORE each key's max bucket: range(lo, hi)
# instead of range(lo, hi + step) — the stream withholds the open
# bucket until a later event closes it, which never comes.
ORACLE_LOCF_STREAM_AVAILABLENOW = f"""
WITH obs AS (
  SELECT user_id,
         (epoch_us(ts) // {LOCF_STEP_S * 1_000_000}) * {LOCF_STEP_S}
           AS bucket_ts,
         ts, value
  FROM events
),
ranked AS (
  SELECT user_id, bucket_ts, value,
         row_number() OVER (
           PARTITION BY user_id, bucket_ts
           ORDER BY ts DESC, value DESC) AS rn
  FROM obs
),
per_bucket AS (
  SELECT user_id, bucket_ts, value AS observed FROM ranked WHERE rn = 1
),
span AS (
  SELECT user_id, min(bucket_ts) AS lo, max(bucket_ts) AS hi
  FROM obs GROUP BY 1
),
grid AS (
  SELECT user_id,
         unnest(range(lo, hi, {LOCF_STEP_S})) AS bucket_ts
  FROM span
)
SELECT g.user_id,
       make_timestamp(g.bucket_ts * 1000000) AS bucket_time,
       last_value(p.observed IGNORE NULLS) OVER (
         PARTITION BY g.user_id ORDER BY g.bucket_ts
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
       p.observed IS NULL AS is_gap
FROM grid g
LEFT JOIN per_bucket p USING (user_id, bucket_ts)
"""

def q_ewma_stream_availablenow(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming EWMA through a real availableNow run, hash-matched
    against the batch recursive-CTE oracle (the ``ewma_events``
    oracle verbatim): unlike LOCF the stream emits EVERY row, so
    stream output == full batch answer with no open-bucket carve-out.
    The fold's float64 recurrence (``0.25·v + 0.75·last``) is the
    same IEEE expression the CTE evaluates, so after the float32
    gate quantization the match is bit-exact."""
    from ..functions.numeric import quantize_cols
    from ..streaming.stateful import ewma_stream

    configure_for_oracle_parity(spark)
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "value", "event_id"
    )
    tmp = tempfile.mkdtemp(prefix="ewma_stream_gate_")
    staged = f"{tmp}/staged"
    out_dir = f"{tmp}/out"
    ev.coalesce(1).write.mode("overwrite").parquet(staged)
    stream = spark.readStream.schema(ev.schema).parquet(staged)
    q = (
        ewma_stream(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", f"{tmp}/ckpt")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(_AWAIT_S):
        q.stop()
        raise TimeoutError(
            f"ewma_stream availableNow run exceeded {_AWAIT_S}s"
        )
    out = spark.read.parquet(out_dir).select(
        "user_id", "ts", "event_id", "value", "ewma"
    )
    return quantize_cols(out, "ewma")


ORACLE_EWMA_STREAM_AVAILABLENOW = """
WITH RECURSIVE r AS (
  SELECT user_id, ts, event_id, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events
),
s(user_id, ts, event_id, value, rn, ewma) AS (
  SELECT user_id, ts, event_id, value, rn, value FROM r WHERE rn = 1
  UNION ALL
  SELECT r.user_id, r.ts, r.event_id, r.value, r.rn,
         0.25 * r.value + 0.75 * s.ewma
  FROM r JOIN s ON r.user_id = s.user_id AND r.rn = s.rn + 1
)
SELECT user_id, ts, event_id, value,
       CAST(CAST(ewma AS REAL) AS DOUBLE) AS ewma
FROM s
"""

SESSION_GAP_S = 300
SESSION_WM_S = 600


def q_session_stream_availablenow(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Built-in ``session_window`` aggregation executed as a WATERMARKED
    stream — the gate that puts Spark's event-time watermark machinery
    itself on the hash path. availableNow processes the staged file,
    then the no-data micro-batch advances the watermark to
    ``max(ts) - 600 s`` and append mode emits exactly the sessions
    whose end <= watermark (inclusive — probed empirically with a
    boundary-exact session; the final session(s) of the stream's most
    recent users stay withheld in state). The DuckDB oracle replays
    the batch session-islands computation filtered by that same
    closure predicate."""
    configure_for_oracle_parity(spark)
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    tmp = tempfile.mkdtemp(prefix="session_stream_gate_")
    staged = f"{tmp}/staged"
    out_dir = f"{tmp}/out"
    ev.coalesce(1).write.mode("overwrite").parquet(staged)
    stream = spark.readStream.schema(ev.schema).parquet(staged)
    agg = (
        stream.withWatermark("ts", f"{SESSION_WM_S} seconds")
        .groupBy(
            "user_id", F.session_window("ts", f"{SESSION_GAP_S} seconds")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )
    q = (
        agg.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", f"{tmp}/ckpt")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(_AWAIT_S):
        q.stop()
        raise TimeoutError(
            f"session_window availableNow run exceeded {_AWAIT_S}s"
        )
    return spark.read.parquet(out_dir).select(
        "user_id", "session_start", "session_end", "n_events"
    )


ORACLE_SESSION_STREAM_AVAILABLENOW = f"""
WITH ordered AS (
  SELECT user_id, ts,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (
                PARTITION BY user_id ORDER BY ts) > {SESSION_GAP_S * 1_000_000}
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
islands AS (
  SELECT user_id, ts,
         sum(new_session) OVER (
           PARTITION BY user_id ORDER BY ts
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
  FROM ordered
),
sessions AS (
  SELECT user_id,
         min(ts) AS session_start,
         max(ts) + INTERVAL {SESSION_GAP_S} SECOND AS session_end,
         CAST(count(*) AS BIGINT) AS n_events
  FROM islands
  GROUP BY user_id, session_seq
),
wm AS (
  SELECT max(ts) - INTERVAL {SESSION_WM_S} SECOND AS w FROM events
)
SELECT s.user_id, s.session_start, s.session_end, s.n_events
FROM sessions s CROSS JOIN wm
WHERE s.session_end <= wm.w
"""

QUERIES = {
    "locf_stream_availablenow": q_locf_stream_availablenow,
    "ewma_stream_availablenow": q_ewma_stream_availablenow,
    "session_stream_availablenow": q_session_stream_availablenow,
}

ORACLES = {
    "locf_stream_availablenow": ORACLE_LOCF_STREAM_AVAILABLENOW,
    "ewma_stream_availablenow": ORACLE_EWMA_STREAM_AVAILABLENOW,
    "session_stream_availablenow": ORACLE_SESSION_STREAM_AVAILABLENOW,
}
