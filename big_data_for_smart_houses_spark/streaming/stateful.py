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
    BooleanType,
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
        # A key's micro-batch may arrive as SEVERAL Arrow chunks with
        # no cross-chunk order; concatenate and sort ONCE, then
        # gap-merge INTERVALS: each event is a point interval and the
        # restored open session participates as the [start, last]
        # interval it is. This handles every out-of-order case in one
        # rule — an event inside the open session folds in, one within
        # the gap extends (min/max bounds), and one more than a gap
        # BELOW the restored start closes as its own earlier session
        # instead of silently merging. Batch-split invariance falls
        # out: processing a set of events as one batch or several
        # (state carried between) yields the same session set.
        chunks = [pd.to_datetime(pdf["timestamp"]) for pdf in pdfs]
        items = sorted(
            (int(t), int(t), 1)
            for t in (
                pd.concat(chunks, ignore_index=True).astype("int64")
                // 1000
                if chunks
                else ()
            )
        )
        if last_us is not None:
            items = sorted(items + [(start_us, last_us, n)])
        closed: list[tuple[int, int, int]] = []
        start_us = last_us = None
        n = 0
        for s, e, c in items:
            if last_us is None:
                start_us, last_us, n = s, e, c
            elif s - last_us > gap_us:
                closed.append((start_us, last_us, n))
                start_us, last_us, n = s, e, c
            else:
                last_us = max(last_us, e)
                n += c
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


TIMEOUT_SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("closed_by", StringType()),
    ]
)

TIMEOUT_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n_events", LongType()),
    ]
)


def _track_sessions_timeout(gap_seconds: int):
    gap_us = gap_seconds * _US

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            # watermark passed last_event + gap: the open session can
            # never be extended by in-order data — close it from the
            # TIMEOUT path (the state-lifecycle branch this operator
            # exists to exercise) and drop the state row.
            if state.exists:
                start_us, last_us, n = state.get
                state.remove()
                yield pd.DataFrame(
                    {
                        "user_id": [user_id],
                        "session_start": [
                            pd.Timestamp(start_us, unit="us")
                        ],
                        "session_end": [pd.Timestamp(last_us, unit="us")],
                        "n_events": [n],
                        "closed_by": ["timeout"],
                    }
                )
            return
        if state.exists:
            start_us, last_us, n = state.get
        else:
            start_us = last_us = None
            n = 0
        # same cross-chunk + interval gap-merge discipline as
        # _track_sessions (see the comment there)
        chunks = [pd.to_datetime(pdf["ts"]) for pdf in pdfs]
        items = sorted(
            (int(t), int(t), 1)
            for t in (
                pd.concat(chunks, ignore_index=True).astype("int64")
                // 1000
                if chunks
                else ()
            )
        )
        if last_us is not None:
            items = sorted(items + [(start_us, last_us, n)])
        closed: list[tuple[int, int, int]] = []
        start_us = last_us = None
        n = 0
        for s, e, c in items:
            if last_us is None:
                start_us, last_us, n = s, e, c
            elif s - last_us > gap_us:
                closed.append((start_us, last_us, n))
                start_us, last_us, n = s, e, c
            else:
                last_us = max(last_us, e)
                n += c
        if last_us is not None:
            state.update((int(start_us), int(last_us), int(n)))
            # event-time timeout: fire once the watermark passes the
            # instant a gap-close became impossible (ms epoch per the
            # GroupState API)
            state.setTimeoutTimestamp(
                last_us // 1000 + gap_seconds * 1000
            )
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": user_id,
                    "session_start": [
                        pd.Timestamp(s, unit="us") for s, _, _ in closed
                    ],
                    "session_end": [
                        pd.Timestamp(e, unit="us") for _, e, _ in closed
                    ],
                    "n_events": [c for _, _, c in closed],
                    "closed_by": "gap",
                }
            )

    return fn


def track_sessions_timeout(
    stream: DataFrame,
    gap_seconds: int = DEFAULT_GAP_SECONDS,
) -> DataFrame:
    """Gap sessionization over a WATERMARKED stream of
    ``(user_id, ts)`` that closes sessions two ways: by a later
    in-data event exceeding the gap (``closed_by = 'gap'``, same as
    :func:`track_device_sessions`), and by EVENT-TIME TIMEOUT
    (``closed_by = 'timeout'``) when the watermark passes
    ``last_event + gap`` — the ``GroupStateTimeout.EventTimeTimeout``
    lifecycle none of the NoTimeout operators touch. Without
    timeouts, each key's final session sits in state forever (exactly
    what the NoTimeout operators do by contract); with them, state is
    self-draining — the property that bounds state size on keys that
    go quiet, which at production stream cardinalities is most of
    them. Callers must put ``withWatermark`` on ``stream`` before
    this (EventTimeTimeout requires it)."""
    return stream.groupBy("user_id").applyInPandasWithState(
        _track_sessions_timeout(gap_seconds),
        outputStructType=TIMEOUT_SESSION_OUTPUT_SCHEMA,
        stateStructType=TIMEOUT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
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
        # Arrow may deliver one key's micro-batch as SEVERAL chunks with
        # no ordering guarantee across them — sorting each chunk alone
        # would fold rows out of (ts, event_id) order whenever a key
        # exceeds one Arrow batch (~10k rows). Materialize the whole
        # group ONCE and sort globally; memory is O(per-key micro-batch),
        # the price of a total order.
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            whole = pd.concat(chunks, ignore_index=True).sort_values(
                ["ts", "event_id"]
            )
            for _, r in whole.iterrows():
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


LOCF_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("bucket_time", TimestampType()),
        StructField("value", DoubleType()),
        StructField("is_gap", BooleanType()),
    ]
)

# open bucket accumulator: bucket epoch-seconds + the winning
# observation inside it ((ts, value) max — same tie rule as the batch
# operator)
LOCF_STATE_SCHEMA = StructType(
    [
        StructField("bucket_s", LongType()),
        StructField("obs_ts_us", LongType()),
        StructField("value", DoubleType()),
    ]
)


def _locf_fn(step_seconds: int):
    step_us = step_seconds * _US

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            bucket_s, obs_ts_us, value = state.get
        else:
            bucket_s = None
        out: list[tuple[int, float, bool]] = []
        # Same chunk hazard as _ewma_fn: Arrow chunk boundaries carry no
        # order, and an out-of-order row here is silently DROPPED by the
        # late-event branch below. Concat + one global sort restores the
        # batch operator's total order for the whole micro-batch.
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            whole = pd.concat(chunks, ignore_index=True).sort_values(
                ["ts", "value"]
            )
            for _, r in whole.iterrows():
                ts_us = int(pd.Timestamp(r["ts"]).value // 1000)
                v = float(r["value"])
                b = (ts_us // step_us) * step_seconds
                if bucket_s is None:
                    bucket_s, obs_ts_us, value = b, ts_us, v
                elif b == bucket_s:
                    if (ts_us, v) > (obs_ts_us, value):
                        obs_ts_us, value = ts_us, v
                elif b > bucket_s:
                    out.append((bucket_s, value, False))
                    for g in range(
                        bucket_s + step_seconds, b, step_seconds
                    ):
                        out.append((g, value, True))
                    bucket_s, obs_ts_us, value = b, ts_us, v
                # b < bucket_s: late event below the open bucket —
                # dropped; feed from a watermarked source upstream
        if bucket_s is not None:
            state.update((int(bucket_s), int(obs_ts_us), float(value)))
        if out:
            yield pd.DataFrame(
                {
                    "user_id": user_id,
                    "bucket_time": [
                        pd.Timestamp(b * _US * 1000) for b, _, _ in out
                    ],
                    "value": [v for _, v, _ in out],
                    "is_gap": [bool(g) for _, _, g in out],
                }
            )

    return fn


def locf_stream(
    stream: DataFrame, step_seconds: int = 3600
) -> DataFrame:
    """Streaming gap-filled LOCF resampling — the incremental form of
    ``operators/stats.gap_fill_locf``: per key the state store holds
    only the OPEN bucket (one row per key, O(keys) memory forever);
    when an event lands in a later bucket, the open bucket CLOSES and
    is emitted once — followed by carried-forward gap rows up to the
    new bucket — so append mode is exact: every bucket row is final
    the moment it is produced, no retractions ever needed. The
    still-open bucket is withheld until a later event closes it
    (batch parity: the batch operator's output minus each key's last
    bucket). Within a bucket the latest (ts, value) observation wins,
    the batch operator's exact tie rule.

    Late events older than the open bucket are dropped, not folded —
    feed from a watermarked source (the ewma_stream contract)."""
    return stream.groupBy("user_id").applyInPandasWithState(
        _locf_fn(step_seconds),
        outputStructType=LOCF_OUTPUT_SCHEMA,
        stateStructType=LOCF_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
