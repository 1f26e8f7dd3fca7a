"""Gap-based sessionization (batch).

The reference declares a device-offline threshold (`DEVICE_OFFLINE_
THRESHOLD=300` s, reference config/config.py:83) but never uses it
(SURVEY.md §2.9 T7); this operator implements the semantics that
threshold implies — splitting each key's event sequence into sessions
wherever the inter-event gap exceeds the threshold — as the standard
lag + running-sum composition:

    new_session = (ts - lag(ts) > gap) OR first row
    session_seq = running sum of new_session per key

Scale shape: one shuffle on the key column; both window functions and
the final per-session aggregation share that clustering, so Catalyst
plans a single exchange (the aggregation keys are (key, session_seq),
a superset of the window partitioning — no re-shuffle). The streaming
equivalent is streaming/stateful.py.

Tie handling: session assignment is invariant to the relative order of
rows with EQUAL timestamps — their pairwise gaps are 0 (<= any
positive threshold), so they land in the same session regardless of
window order, and the first tied row's gap to the previous event does
not depend on which tied row comes first; the per-session aggregates
(min/max/count) are order-free. ``tiebreak_cols`` therefore only
matters if a caller consumes ``with_session_seq``'s row order itself,
not for session boundaries or aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_GAP_SECONDS = 300


def with_session_seq(
    df: DataFrame,
    key_col: str = "device_id",
    ts_col: str = "timestamp",
    gap_seconds: int = DEFAULT_GAP_SECONDS,
    tiebreak_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Assign a per-key session sequence number (1-based) to every row."""
    order = [F.col(ts_col), *[F.col(c) for c in tiebreak_cols]]
    w = Window.partitionBy(key_col).orderBy(*order)
    # integer-µs arithmetic: exact, and bit-identical to the SQL oracle
    # (double-cast seconds would round at µs precision near epoch 1.7e9)
    gap = F.unix_micros(F.col(ts_col)) - F.lag(F.unix_micros(F.col(ts_col))).over(w)
    is_new = F.when(gap.isNull() | (gap > gap_seconds * 1_000_000), 1).otherwise(0)
    return df.withColumn(
        "session_seq",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )


def sessionize(
    df: DataFrame,
    key_col: str = "device_id",
    ts_col: str = "timestamp",
    gap_seconds: int = DEFAULT_GAP_SECONDS,
    tiebreak_cols: tuple[str, ...] = (),
) -> DataFrame:
    """One row per (key, session): start/end timestamps, event count,
    duration. Single shuffle — see module docstring."""
    seq = with_session_seq(df, key_col, ts_col, gap_seconds, tiebreak_cols)
    return (
        seq.groupBy(key_col, "session_seq")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .withColumn(
            "duration_s",
            (
                F.unix_micros(F.col("session_end"))
                - F.unix_micros(F.col("session_start"))
            )
            / F.lit(1_000_000.0),
        )
    )
