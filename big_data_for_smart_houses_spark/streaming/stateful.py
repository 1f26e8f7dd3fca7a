"""Custom stateful streaming operator: per-device session tracking via
``applyInPandasWithState``.

The streaming counterpart of operators/sessions.py (gap sessionization;
semantics implied by the reference's unused `DEVICE_OFFLINE_THRESHOLD`,
reference config/config.py:83 / SURVEY.md §2.9 T7). Each device's open
session lives in the state store; a closed session is emitted as soon
as an event arrives more than ``gap_seconds`` after the session's last
event. State is per-key and checkpointed, so the operator scales
horizontally (state partitions follow the groupBy hash) and survives
restarts exactly-once.

This is the one operator family where built-in DataFrame ops genuinely
cannot express the semantics incrementally — arbitrary per-key state
across micro-batches — hence the Pandas-UDF-backed stateful API rather
than a composition (the brief's escalation order for custom operators).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

DEFAULT_GAP_SECONDS = 300

SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("device_id", StringType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
    ]
)

# open-session accumulator: epoch-microsecond bounds + event count
STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n_events", LongType()),
    ]
)

_US = 1_000_000


def _track_sessions(gap_seconds: int):
    gap_us = gap_seconds * _US

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (device_id,) = key
        if state.exists:
            start_us, last_us, n = state.get
        else:
            start_us = last_us = None
            n = 0
        closed: list[tuple[int, int, int]] = []
        for pdf in pdfs:
            ts_us = (
                pd.to_datetime(pdf["timestamp"]).astype("int64") // 1000
            ).sort_values()
            for t in ts_us:
                t = int(t)
                if last_us is None:
                    start_us, last_us, n = t, t, 1
                elif t - last_us > gap_us:
                    closed.append((start_us, last_us, n))
                    start_us, last_us, n = t, t, 1
                else:
                    last_us = max(last_us, t)
                    n += 1
        if last_us is not None:
            state.update((int(start_us), int(last_us), int(n)))
        if closed:
            yield pd.DataFrame(
                {
                    "device_id": device_id,
                    "session_start": [
                        pd.Timestamp(s, unit="us") for s, _, _ in closed
                    ],
                    "session_end": [
                        pd.Timestamp(e, unit="us") for _, e, _ in closed
                    ],
                    "n_events": [c for _, _, c in closed],
                }
            )

    return fn


def track_device_sessions(
    stream: DataFrame,
    gap_seconds: int = DEFAULT_GAP_SECONDS,
    key_col: str = "device_id",
) -> DataFrame:
    """Emit closed sessions from a stream with (device_id, timestamp)
    columns. The open session per device stays in checkpointed state
    until a later event (in a subsequent micro-batch or the same one)
    exceeds the gap."""
    return stream.groupBy(key_col).applyInPandasWithState(
        _track_sessions(gap_seconds),
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming EWMA: the incremental form of operators/windows.ewma_smooth
# ---------------------------------------------------------------------------

EWMA_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("value", DoubleType()),
        StructField("ewma", DoubleType()),
    ]
)

# the entire carried state: last smoothed value + last (ts, tiebreak)
EWMA_STATE_SCHEMA = StructType(
    [
        StructField("last_ewma", DoubleType()),
        StructField("last_ts_us", LongType()),
        StructField("last_event_id", LongType()),
    ]
)


def _ewma_fn(alpha: float):
    beta = 1.0 - alpha

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            last, _, _ = state.get
        else:
            last = None
        rows: list[tuple[int, pd.Timestamp, float, float]] = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for _, r in pdf.iterrows():
                v = float(r["value"])
                last = v if last is None else alpha * v + beta * last
                rows.append((int(r["event_id"]), r["ts"], v, last))
        if rows:
            last_eid, last_ts = rows[-1][0], rows[-1][1]
            state.update(
                (float(last), int(pd.Timestamp(last_ts).value // 1000),
                 int(last_eid))
            )
            yield pd.DataFrame(
                {
                    "user_id": user_id,
                    "event_id": [r[0] for r in rows],
                    "ts": [r[1] for r in rows],
                    "value": [r[2] for r in rows],
                    "ewma": [r[3] for r in rows],
                }
            )

    return fn


def ewma_stream(stream: DataFrame, alpha: float = 0.25) -> DataFrame:
    """Streaming EWMA per user: the incremental form of
    ``operators/windows.ewma_smooth`` — the carried state is ONE row
    per key (the last smoothed value), so memory is O(keys) however
    long the stream runs, and the recurrence continues seamlessly
    across micro-batches and restarts (state is checkpointed).

    Within a micro-batch rows are folded in (ts, event_id) order —
    the same total order as the batch operator, so a stream replayed
    batch-wise produces exactly the batch answer (asserted in tests).
    Late rows older than the carried (ts, event_id) cursor would fold
    out of order; feed the operator from a watermarked source when
    out-of-order arrival is possible."""
    return stream.groupBy("user_id").applyInPandasWithState(
        _ewma_fn(alpha),
        outputStructType=EWMA_OUTPUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
