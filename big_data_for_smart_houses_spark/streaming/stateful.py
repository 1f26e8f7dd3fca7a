"""Custom stateful streaming operator: per-device session tracking via
``applyInPandasWithState``.

The streaming counterpart of operators/sessions.py (gap sessionization;
semantics implied by the reference's unused `DEVICE_OFFLINE_THRESHOLD`,
reference config/config.py:83 / SURVEY.md §2.9 T7). Each device's
PENDING sessions live in the state store as a list of disjoint
intervals; a session is emitted only once no admissible future event
can extend or bridge it (append-mode rows are final — premature
emission is a wrong answer, not a timing detail). State is per-key and
checkpointed, so the operator scales horizontally (state partitions
follow the groupBy hash) and survives restarts exactly-once.

Safe-closure rule (the round-9 fix): under a feeding contract that
admits events as late as ``max_seen - allowed_lateness``, a session
ending at ``e`` is bridgeable by a future event ``t`` iff
``t - e <= gap`` for some admissible ``t``, i.e. iff
``e >= max_seen - allowed_lateness - gap``. With the documented
``allowed_lateness <= gap`` contract of :func:`track_device_sessions`
that means only sessions with ``end < max_seen - 2*gap`` are final;
with a real watermark (:func:`track_sessions_timeout`, where Spark
drops input rows at ``ts <= watermark``) a session is final iff
``end + gap < watermark``. Everything inside the frontier stays in
state — hence the interval-LIST state schema.

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
    ArrayType,
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

# PENDING sessions per key: parallel arrays of disjoint
# epoch-microsecond intervals (sorted by start) + event counts. A list,
# not one row, because every session inside the safe-closure frontier
# must stay extendable by admissible late events (round-9 fix).
STATE_SCHEMA = StructType(
    [
        StructField("starts_us", ArrayType(LongType())),
        StructField("lasts_us", ArrayType(LongType())),
        StructField("counts", ArrayType(LongType())),
    ]
)

_US = 1_000_000


def _restore_pending(state: GroupState) -> list[tuple[int, int, int]]:
    if not state.exists:
        return []
    starts, lasts, counts = state.get
    return [
        (int(s), int(e), int(c)) for s, e, c in zip(starts, lasts, counts)
    ]


def _save_pending(
    state: GroupState, keep: list[tuple[int, int, int]]
) -> None:
    state.update(
        (
            [int(s) for s, _, _ in keep],
            [int(e) for _, e, _ in keep],
            [int(c) for _, _, c in keep],
        )
    )


def _gap_merge(
    items: list[tuple[int, int, int]], gap_us: int
) -> list[tuple[int, int, int]]:
    """Gap-merge sorted (start, end, count) intervals: consecutive
    intervals within ``gap_us`` of each other fold into one session
    (min/max bounds, summed counts). Each event is a point interval
    and restored pending sessions participate as the intervals they
    are — one rule covers every out-of-order case: an event inside a
    pending session folds in, one within the gap extends it, one more
    than a gap below an earlier pending start stands alone, and one
    bridging two pending sessions merges them. The merge is
    CHUNKING-invariant within a call by construction (it only sees
    the sorted union)."""
    merged: list[tuple[int, int, int]] = []
    start_us = last_us = None
    n = 0
    for s, e, c in items:
        if last_us is None:
            start_us, last_us, n = s, e, c
        elif s - last_us > gap_us:
            merged.append((start_us, last_us, n))
            start_us, last_us, n = s, e, c
        else:
            last_us = max(last_us, e)
            n += c
    if last_us is not None:
        merged.append((start_us, last_us, n))
    return merged


def _batch_points(
    pdfs: Iterable[pd.DataFrame], ts_col: str
) -> list[tuple[int, int, int]]:
    # A key's micro-batch may arrive as SEVERAL Arrow chunks with no
    # cross-chunk order; concatenate before the single global sort.
    chunks = [pd.to_datetime(pdf[ts_col]) for pdf in pdfs]
    return [
        (int(t), int(t), 1)
        for t in (
            pd.concat(chunks, ignore_index=True).astype("int64") // 1000
            if chunks
            else ()
        )
    ]


def _track_sessions(gap_seconds: int):
    gap_us = gap_seconds * _US

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (device_id,) = key
        items = sorted(
            _restore_pending(state) + _batch_points(pdfs, "timestamp")
        )
        merged = _gap_merge(items, gap_us)
        if not merged:
            return
        # Safe-closure frontier (module docstring): the operator's
        # feeding contract admits future events down to
        # max_seen - gap, and such an event can still bridge a
        # gap-closed session ending at e iff e >= max_seen - 2*gap.
        # Only sessions strictly below that frontier are final; the
        # rest (always including the open tail, whose end IS
        # max_seen) stay in state as pending intervals.
        frontier_us = merged[-1][1]
        thr_us = frontier_us - 2 * gap_us
        closed = [iv for iv in merged if iv[1] < thr_us]
        _save_pending(state, [iv for iv in merged if iv[1] >= thr_us])
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
    columns. Feeding contract: events may arrive out of order by at
    most ``gap_seconds`` (delay <= gap — feed from a source
    watermarked at most that late). Under that contract a session is
    emitted exactly when it becomes final: its end is more than
    ``2*gap`` behind the device's max seen timestamp, so no
    admissible future event can extend or bridge it. Sessions inside
    that frontier — including the open tail — stay in checkpointed
    state as a pending-interval list. Processing a set of events as
    one micro-batch or several (state carried between) yields the
    same emitted sessions + pending state (batch-split invariance,
    property-tested).

    CONTRACT — quiet keys: emission is driven by DATA (the per-key
    max-seen frontier), so a device that stops sending events
    PERMANENTLY never has its final sessions emitted and its pending
    intervals stay in state — the price of batch-split-invariant
    exactness under NoTimeout. For corpora with device churn use
    :func:`track_sessions_timeout`, whose processing-time timeout
    drains quiet keys (emitting their tail with ``closed_by =
    'timeout'``) and frees their state."""
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

# same pending-interval list state as the NoTimeout tracker — one
# definition, shared with _restore_pending/_save_pending, so a field
# change cannot desynchronize the two trackers' (de)serialization
TIMEOUT_STATE_SCHEMA = STATE_SCHEMA


def _track_sessions_timeout(gap_seconds: int):
    gap_us = gap_seconds * _US
    gap_ms = gap_seconds * 1000

    def _emit(user_id, closed, pending_last):
        # closed_by records WHY the session ended: 'gap' when a later
        # in-data event proved the gap (every non-tail interval),
        # 'timeout' when the key simply went quiet (the tail).
        return pd.DataFrame(
            {
                "user_id": user_id,
                "session_start": [
                    pd.Timestamp(s, unit="us") for s, _, _ in closed
                ],
                "session_end": [
                    pd.Timestamp(e, unit="us") for _, e, _ in closed
                ],
                "n_events": [c for _, _, c in closed],
                "closed_by": [
                    "timeout" if iv == pending_last else "gap"
                    for iv in closed
                ],
            }
        )

    def _split_safe(pending, wm_ms):
        # A session is FINAL iff end + gap < watermark: Spark drops
        # input rows at ts <= watermark, so any future event t > wm
        # has t - end > gap and can neither extend nor bridge it.
        # STRICT on both paths — the timeout itself only fires when
        # wm > timeout_ts, so a non-strict data-path emission would
        # make the final row set depend on which path saw the
        # boundary first.
        closed = [
            iv for iv in pending if iv[1] // 1000 + gap_ms < wm_ms
        ]
        keep = [iv for iv in pending if iv[1] // 1000 + gap_ms >= wm_ms]
        return closed, keep

    def _park(state, keep, wm_ms):
        _save_pending(state, keep)
        # fire when the watermark passes the EARLIEST pending
        # session's finality instant (end + gap, ms epoch per the
        # GroupState API); the API requires a timeout strictly above
        # the current watermark, hence the clamp — a session whose
        # finality instant equals the final watermark stays in state
        # (strict-< closure, pinned in tests).
        state.setTimeoutTimestamp(
            max(min(e // 1000 + gap_ms for _, e, _ in keep), wm_ms + 1)
        )

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        wm_ms = state.getCurrentWatermarkMs()
        pending = _restore_pending(state)
        if state.hasTimedOut:
            # the TIMEOUT path (the state-lifecycle branch this
            # operator exists to exercise): emit every pending
            # session the watermark has made final, keep the rest.
            closed, keep = _split_safe(pending, wm_ms)
            if keep:
                _park(state, keep, wm_ms)
            else:
                state.remove()
            if closed:
                yield _emit(user_id, closed, pending[-1])
            return
        # Spark does NOT late-filter input to this operator (verified
        # empirically: rows far below the watermark reach the
        # function) — drop them here, or an ultra-late row could
        # bridge a session already emitted as final and silently
        # corrupt the append-mode output. Standard late-data
        # semantics: admissible means strictly above the watermark.
        points = [
            p
            for p in _batch_points(pdfs, "ts")
            if p[0] > wm_ms * 1000
        ]
        merged = _gap_merge(sorted(pending + points), gap_us)
        if not merged:
            return
        closed, keep = _split_safe(merged, wm_ms)
        if keep:
            # any surviving point is > wm, so whenever this batch
            # contributed data the tail lands in keep
            _park(state, keep, wm_ms)
        else:
            # every input row was late and every pending session is
            # already watermark-final (its timeout just hadn't fired
            # yet — data invocations preempt the timeout path)
            state.remove()
        if closed:
            yield _emit(user_id, closed, merged[-1])

    return fn


def track_sessions_timeout(
    stream: DataFrame,
    gap_seconds: int = DEFAULT_GAP_SECONDS,
) -> DataFrame:
    """Gap sessionization over a WATERMARKED stream of
    ``(user_id, ts)``. A session is EMITTED only once the watermark
    proves it final (``end + gap < watermark`` — Spark drops input at
    ``ts <= watermark``, so nothing admissible can still bridge it);
    until then it stays in state as a pending interval, because in
    append mode an emitted row can never be retracted. ``closed_by``
    is EMISSION-TIME lifecycle metadata: ``'gap'`` when a later
    interval for the key was still pending at emission, ``'timeout'``
    when the emission fully drained the key's state. It is NOT a
    retrodictable whole-stream fact — in append mode no label can be
    (a key that drains and later receives admissible data gets a
    second 'timeout' row; a bounded-corpus replay would call the
    first one 'gap'). Treat it as monitoring metadata; the hash gate
    deliberately excludes it (round-10 advice), and the multi-batch
    divergence shape is pinned in tests/test_sessions.py. Emission
    happens on whichever
    side sees the watermark pass first: the key's next data batch, or
    the EVENT-TIME TIMEOUT set to the earliest pending finality
    instant — the ``GroupStateTimeout.EventTimeTimeout`` lifecycle
    none of the NoTimeout operators touch. Timeouts also make state
    self-draining on keys that go quiet, which at production stream
    cardinalities is most of them. Callers must put ``withWatermark``
    on ``stream`` before this (EventTimeTimeout requires it)."""
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


# per-worker-process count of (batch, key) late-drop occurrences,
# keyed by operator-instance token and used only to rate-limit the
# executor-log WARNING below — the driver-side accumulator is the
# precise monitoring signal. Keying per instance (round-12 advice):
# Spark reuses Python workers across queries, so a single shared
# counter would leave a freshly started unrelated stream's first
# drops already sampled at 1/1000 after 20 lifetime occurrences
# anywhere — its operators might emit no first-drop warning at all.
# BOUNDED (round-13 advice): workers outlive streams and nothing
# ever signals a worker that a stream definition died, so the dict
# would otherwise grow by one counter per stream/restart forever on
# a long-lived reused worker. Past the cap the OLDEST token (Python
# dicts iterate in insertion order) is evicted — worst case a
# still-live evicted stream re-logs its "first" drops, which is
# noise-bounded and strictly better than unbounded growth.
_EWMA_DROP_LOG: dict = {}
_EWMA_DROP_LOG_MAX = 256


def _ewma_fn(alpha: float, dropped_counter=None):
    beta = 1.0 - alpha
    # Stable for one stream, distinct across streams and restarts:
    # generated once at stream definition on the driver, then
    # captured in the closure Spark pickles to every worker.
    import uuid

    op_token = uuid.uuid4().hex[:12]

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            last, cur_ts_us, cur_eid = state.get
        else:
            last, cur_ts_us, cur_eid = None, None, None
        rows: list[tuple[int, object, float, float]] = []
        dropped = 0
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
            # column-wise numpy iteration — bit-identical float fold,
            # without iterrows' per-row Series boxing (the round-9
            # LOCF lesson applied here)
            eids = whole["event_id"].to_numpy()
            tss = whole["ts"].to_numpy()
            ts_us_arr = tss.astype("datetime64[us]").astype("int64")
            vals = whole["value"].to_numpy()
            for eid, ts, ts_us, v in zip(eids, tss, ts_us_arr, vals):
                if cur_ts_us is not None and (
                    ts_us, int(eid)
                ) <= (cur_ts_us, cur_eid):
                    # the carried (ts, event_id) cursor GUARDS the
                    # documented late-row hazard: a row at or before
                    # the last folded position cannot be inserted into
                    # an already-emitted append-mode prefix, so it is
                    # dropped rather than folded out of order (which
                    # would silently poison every later ewma for the
                    # key) — counted, never silent (round-10 advice)
                    dropped += 1
                    continue
                v = float(v)
                last = v if last is None else alpha * v + beta * last
                rows.append((int(eid), ts, v, last))
        if dropped:
            # sustained drops mean the upstream watermark is too
            # tight for the source's disorder — make that visible at
            # runtime, not only in the docstring (round-10 advice).
            # RATE-LIMITED per worker process (round-11 advice): a
            # hot-key late-data regime would otherwise emit one
            # WARNING per key per micro-batch — unbounded stderr
            # volume on executors. The first few occurrences log in
            # full, then every 1000th as a heartbeat; the accumulator
            # stays the precise signal.
            import logging

            if (
                op_token not in _EWMA_DROP_LOG
                and len(_EWMA_DROP_LOG) >= _EWMA_DROP_LOG_MAX
            ):
                _EWMA_DROP_LOG.pop(next(iter(_EWMA_DROP_LOG)))
            n = _EWMA_DROP_LOG[op_token] = (
                _EWMA_DROP_LOG.get(op_token, 0) + 1
            )
            if n <= 20 or n % 1000 == 0:
                logging.getLogger(__name__).warning(
                    "ewma_stream dropped %d late row(s) for "
                    "user_id=%s (at/before carried cursor); check "
                    "the source watermark if this persists "
                    "[occurrence %d on this worker%s]",
                    dropped, user_id, n,
                    "" if n <= 20 else "; further logs sampled 1/1000",
                )
            if dropped_counter is not None:
                dropped_counter.add(dropped)
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


def ewma_stream(
    stream: DataFrame, alpha: float = 0.25, dropped_counter=None
) -> DataFrame:
    """Streaming EWMA per user: the incremental form of
    ``operators/windows.ewma_smooth`` — the carried state is ONE row
    per key (the last smoothed value), so memory is O(keys) however
    long the stream runs, and the recurrence continues seamlessly
    across micro-batches and restarts (state is checkpointed).

    Within a micro-batch rows are folded in (ts, event_id) order —
    the same total order as the batch operator, so a stream replayed
    batch-wise produces exactly the batch answer (asserted in tests).
    Rows at or before the carried (ts, event_id) cursor — late
    arrivals from earlier micro-batches — are DROPPED, not folded:
    in append mode the already-emitted prefix cannot be revised, and
    folding a late row out of order would silently poison every
    subsequent ewma for the key (unit-tested). Feed the operator
    from a watermarked source to bound how much data that policy can
    discard. Drops are never silent: each occurrence logs a WARNING
    with the count, and ``dropped_counter`` (an optional
    ``sc.accumulator(0)``) aggregates the total driver-side for
    monitoring."""
    return stream.groupBy("user_id").applyInPandasWithState(
        _ewma_fn(alpha, dropped_counter),
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


def _locf_fn(step_seconds: int, max_gap_buckets: int = 100_000):
    step_us = step_seconds * _US

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            bucket_s, obs_ts_us, value = state.get
            have_state = True
        else:
            have_state = False
        out_b = None
        # Same chunk hazard as _ewma_fn: Arrow chunk boundaries carry no
        # order, and an out-of-order row here is silently DROPPED by the
        # late-event branch below. Concat + one global sort restores the
        # batch operator's total order for the whole micro-batch.
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            import numpy as np

            whole = pd.concat(chunks, ignore_index=True).sort_values(
                ["ts", "value"]
            )
            # Vectorized winner-per-bucket (round 9 — the fold was a
            # per-ROW iterrows loop, the Python hot spot of every
            # LOCF gate): sorted by (ts, value), the LAST row of each
            # bucket run IS the lexicographic-max observation the
            # row-wise compare selected, so folding only the winners
            # is bit-identical (pure selection, no arithmetic) at
            # ~rows/buckets fewer Python iterations.
            all_ts = whole["ts"].astype("int64").to_numpy() // 1000
            all_v = whole["value"].astype(float).to_numpy()
            all_b = (all_ts // step_us) * step_seconds
            last = np.nonzero(np.append(all_b[1:] != all_b[:-1], True))[0]
            # Winner arrays: strictly increasing buckets (fancy
            # indexing copies, so the in-place tie fix below is safe).
            wb = all_b[last]
            wts = all_ts[last]
            wv = all_v[last]
            if have_state:
                # Late events older than the open bucket are dropped,
                # not folded; feed from a watermarked source upstream.
                keep = wb >= bucket_s
                wb, wts, wv = wb[keep], wts[keep], wv[keep]
                if len(wb) and int(wb[0]) == bucket_s:
                    # same-bucket merge: the batch operator's exact
                    # tie rule — the incoming winner replaces the
                    # carried observation ONLY when strictly greater
                    # (same predicate, same polarity, as the scalar
                    # fold this replaced: a NaN value compares False
                    # either way, so the carried state must win then
                    # too)
                    if not (
                        (int(wts[0]), float(wv[0]))
                        > (obs_ts_us, value)
                    ):
                        wts[0] = obs_ts_us
                        wv[0] = value
                else:
                    wb = np.concatenate(([bucket_s], wb))
                    wts = np.concatenate(([obs_ts_us], wts))
                    wv = np.concatenate(([value], wv))
            if len(wb):
                if len(wb) > 1:
                    # Emission is fully vectorized (round 12 — the gap
                    # fill appended one Python tuple + one
                    # pd.Timestamp PER OUTPUT ROW, the 59x-at-100x
                    # wall driver in SCALE.md's stateful probe): each
                    # closed bucket i emits counts[i] rows — itself
                    # first (is_gap False), then its carried-forward
                    # gap rows up to the next observed bucket. Pure
                    # selection/repeat, no value arithmetic, so the
                    # rows are bit-identical to the scalar fold's.
                    counts = (wb[1:] - wb[:-1]) // step_seconds
                    worst = int(counts.max()) - 1
                    if worst > max_gap_buckets:
                        # A key resuming from a months-stale
                        # checkpoint would materialize millions of
                        # rows for ONE event. Fail loudly at the cap
                        # (observable, like the edit-1 over-cap
                        # guard) instead of stalling/OOMing the
                        # executor.
                        j = int(np.argmax(counts))
                        raise ValueError(
                            f"locf_stream: key {user_id} gap of "
                            f"{worst} buckets exceeds max_gap_"
                            f"buckets={max_gap_buckets} (open bucket "
                            f"{int(wb[j])}, next event bucket "
                            f"{int(wb[j + 1])}); "
                            "widen step_seconds, raise the cap, or "
                            "expire stale keys upstream"
                        )
                    total = int(counts.sum())
                    run_start = np.repeat(
                        np.concatenate(([0], np.cumsum(counts)[:-1])),
                        counts,
                    )
                    idx_in_run = np.arange(total) - run_start
                    out_b = np.repeat(wb[:-1], counts) + (
                        idx_in_run * step_seconds
                    )
                    out_v = np.repeat(wv[:-1], counts)
                    out_g = idx_in_run > 0
                bucket_s = int(wb[-1])
                obs_ts_us = int(wts[-1])
                value = float(wv[-1])
                have_state = True
        if have_state:
            state.update((int(bucket_s), int(obs_ts_us), float(value)))
        if out_b is not None and len(out_b):
            yield pd.DataFrame(
                {
                    "user_id": user_id,
                    "bucket_time": pd.to_datetime(
                        out_b.astype("int64") * 1_000_000_000
                    ),
                    "value": out_v,
                    "is_gap": out_g,
                }
            )

    return fn


def locf_stream(
    stream: DataFrame,
    step_seconds: int = 3600,
    max_gap_buckets: int = 100_000,
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
    feed from a watermarked source (the ewma_stream contract). A gap
    longer than ``max_gap_buckets`` (default 100k — ~70 days at 60 s
    steps) raises rather than materializing millions of gap rows in
    one task: resuming a months-stale key is a capacity decision the
    caller should make explicitly."""
    return stream.groupBy("user_id").applyInPandasWithState(
        _locf_fn(step_seconds, max_gap_buckets),
        outputStructType=LOCF_OUTPUT_SCHEMA,
        stateStructType=LOCF_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
