"""Stream-stream correlation (SURVEY.md §2.9).

The reference correlates telemetry with alert events only in batch;
Structured Streaming can do it online with BOUNDED state, which is the
100 TB-day-correct shape: both sides carry a watermark and the join
condition carries an explicit event-time range, so each side's state
buffer is evicted as the watermark passes (state ~ key-rate x
lookback, independent of stream length). An unbounded-condition
stream-stream join would buffer forever — Spark rejects it in append
mode for exactly that reason.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_WATERMARK = "1 hour"


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    lookback_seconds: int,
    watermark_delay: str = DEFAULT_WATERMARK,
    how: str = "inner",
) -> DataFrame:
    """Join two streams on a key, keeping right rows whose event
    time falls within ``[left_ts - lookback, left_ts]`` — the streaming
    analog of the batch as-of/range join family (operators/joins.py),
    e.g. "each purchase with the clicks of the preceding hour".

    ``how='left_outer'`` additionally emits each unmatched left row
    null-padded — but only once the watermark proves no future right
    row can match (l_ts < watermark), which is why outer results
    trail the watermark rather than the data. Spark requires the
    watermark + time-bound for outer stream-stream joins precisely so
    this decision is ever final.

    ``how='full_outer'`` additionally emits each unmatched RIGHT row
    null-padded once IT is final — which happens later than the left
    side: a right row at ``r_ts`` can still match a future left row
    until the watermark passes ``r_ts + lookback`` (the left-arrival
    window the condition admits), so right-outer emissions trail the
    watermark by the lookback on top of the delay. ``right_outer``
    is the mirror image.

    ``how='left_semi'`` emits each left row (left columns only, no
    duplication) as soon as ONE in-window right match is in state —
    the streaming EXISTS. Emission needs no finality decision (a
    match is a match the moment it arrives), so unlike the outer
    modes nothing trails the watermark; the watermark still GCs
    state. Spark has no NATIVE stream-stream left_anti (NOT EXISTS
    needs per-row finality like outer, but with nothing to emit on
    match), so ``how='left_anti'`` implements the standard emulation
    here: left_outer + watermark-gated null-side filter. Each left
    row with NO in-window right match emits EXACTLY ONCE (left
    columns only) — but only after the watermark proves the absence
    final (no admissible right row can still land in the window),
    so like the outer modes anti results trail the watermark; rows
    whose absence is not yet final stay in state, withheld. The
    filter keys on the right TIME column, which the join condition
    forces non-null on every matched row, so a null there is
    unambiguously the watermark-proven no-match marker.

    FINALITY BOUNDS, measured to the microsecond (pinned by the
    boundary test in tests/test_streaming.py): Spark tracks
    event-time stats in MILLISECONDS, so the global watermark is
    ``W = floor_ms(min(max_l, max_r)) - delay``, and the join
    state-watermark subtracts one further millisecond of
    conservatism (StreamingJoinHelper). An unmatched LEFT row
    therefore emits iff ``l_ts <= W - 1ms`` (µs comparison), and an
    unmatched RIGHT row iff ``r_ts <= W - lookback - 1ms``. Rows
    inside the trailing (sub-ms + 1 ms) slice stay withheld even
    though their raw event time is below ``min(max) - delay`` —
    oracles replaying these joins must model the ms-floor and the
    -1 ms or they over-emit on corpora with sub-millisecond
    timestamps.

    Both inputs must be streaming DataFrames with distinct column
    names apart from ``on``. The two-sided time bound plus the
    watermarks is what lets Spark GC join state."""
    if how not in (
        "inner",
        "left_outer",
        "right_outer",
        "full_outer",
        "left_semi",
        "left_anti",
    ):
        raise ValueError(f"unsupported stream join type: {how}")
    l = left.withWatermark(left_ts, watermark_delay)
    r = right.withWatermark(right_ts, watermark_delay)
    cond = (
        (l[on] == r[on])
        & (r[right_ts] >= l[left_ts] - F.expr(f"INTERVAL {lookback_seconds} SECONDS"))
        & (r[right_ts] <= l[left_ts])
    )
    if how == "left_anti":
        # the standard emulation (Spark has no native stream-stream
        # left_anti): left_outer emits each unmatched left row
        # null-padded once the watermark makes the absence final;
        # the null right_ts — impossible on a matched row, since the
        # condition bounds it — is the no-match marker
        joined = l.join(r, cond, "left_outer")
        return joined.filter(r[right_ts].isNull()).select(
            *[l[c] for c in left.columns]
        )
    joined = l.join(r, cond, how)
    if how in ("right_outer", "full_outer"):
        # unmatched right rows carry a NULL left key — surface the
        # key from whichever side is present
        return (
            joined.withColumn("__on", F.coalesce(l[on], r[on]))
            .drop(l[on])
            .drop(r[on])
            .withColumnRenamed("__on", on)
        )
    if how == "left_semi":
        return joined  # left columns only; nothing of r survives
    return joined.drop(r[on])
