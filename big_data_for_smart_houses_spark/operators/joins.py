"""Join operators beyond the reference's surface (SURVEY.md §2.3 notes
the reference has only J1/J2; the engine exposes Spark's full join
surface, plus the time-series joins Spark lacks natively).

``asof_join`` — for each left row, the latest right row with
``right_ts <= left_ts`` per key — is implemented as the single-shuffle
union trick rather than an inequality join:

    tag right rows 0 / left rows 1
    -> union
    -> last(right_cols, ignorenulls) over (key ORDER BY ts, tag
                                           ROWS UNBOUNDED PRECEDING..0)
    -> keep left rows

An inequality join (`l.key = r.key AND r.ts <= l.ts` + argmax) explodes
to per-pair intermediate rows; the union form shuffles each input once
on the key and scans linearly — at 100 TB it is the difference between
O(n·m) pairs per key and O(n+m) rows per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Interval containment join: each left row matches the right rows
    whose ``[start_col, end_col]`` interval (same key) contains its
    ``left_ts`` — inclusive on both ends.

    Spark plans a bare ``l.key = r.key AND ts BETWEEN start AND end``
    as a hash join on the key with the range as a post-filter, which
    degenerates when keys are few or hot (every row of a hot key meets
    every interval of that key). This implementation makes the range
    part of the JOIN KEY by time-bucketing: left rows get one bucket,
    right intervals explode to the buckets they span, and the join is
    a plain equi-join on (key, bucket) — the standard interval-
    bucketing trick (same family as Databricks' range-join bin
    optimization). Each left row carries exactly one bucket, so a
    (row, interval) match occurs exactly once — no post-dedup.

    Pick ``bucket_seconds`` near the typical interval length: the
    explode factor is ~len/bucket + 1 per interval, and the filter
    does the exact containment check after the equi-join.
    """
    width_us = bucket_seconds * 1_000_000
    l_b = left.withColumn(
        "_bucket", F.floor(F.unix_micros(F.col(left_ts)) / width_us)
    )
    r_b = right.withColumn(
        "_buckets",
        F.sequence(
            F.floor(F.unix_micros(F.col(start_col)) / width_us),
            F.floor(F.unix_micros(F.col(end_col)) / width_us),
        ),
    ).withColumn("_bucket", F.explode("_buckets")).drop("_buckets")
    return (
        l_b.join(r_b, [on, "_bucket"])
        .filter(
            (F.col(left_ts) >= F.col(start_col))
            & (F.col(left_ts) <= F.col(end_col))
        )
        .drop("_bucket")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join: every left row gains the most recent right row
    at-or-before its timestamp (per ``on`` key) — or, with
    ``direction="forward"``, the earliest right row at-or-after it
    (the next-event lookup: click -> next purchase, reading -> next
    calibration). Left rows with no matching right row keep nulls.
    Right rows are first reduced to one per (key, ts) — deterministic
    under ties. Both directions are the same single-shuffle union
    form; forward only flips the tie order and the window frame."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"asof_join direction must be backward/forward, got {direction!r}")
    right_cols = right_cols or [
        c for c in right.columns if c not in (on, right_ts)
    ]
    # one right row per (key, ts): keep the max of each payload column
    # (any deterministic reduction works; max matches the SQL oracle)
    r = right.groupBy(on, right_ts).agg(
        *[F.max(c).alias(c) for c in right_cols]
    )
    # Rename right payload columns to a private _r_ prefix BEFORE the
    # union: if a payload name also exists in the left DataFrame,
    # unionByName would merge both into one column and
    # last(col, ignorenulls) would pick up the left row's own value
    # (and earlier left rows' values) instead of the latest right
    # row's — silently wrong results exactly on the overlapping-name
    # path the `{col}_asof` rename exists to support. With the
    # prefix, left rows are guaranteed null in every fill column.
    ts_out = f"{right_ts}{suffix}"
    fill_src = {c: f"_r_{c}" for c in right_cols}
    fill_src[ts_out] = f"_r_{ts_out}"
    l_tagged = left.withColumn("_tag", F.lit(1)).withColumn(
        "_ts", F.col(left_ts)
    )
    r_tagged = r.select(
        F.col(on),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_tag"),
        F.col(right_ts).alias(fill_src[ts_out]),
        *[F.col(c).alias(fill_src[c]) for c in right_cols],
    )
    u = l_tagged.unionByName(r_tagged, allowMissingColumns=True)
    if direction == "backward":
        # right rows sort before left rows at equal ts (tag 0 < 1):
        # inclusive <= semantics; fill = last right value seen so far
        w = (
            Window.partitionBy(on)
            .orderBy(F.col("_ts"), F.col("_tag"))
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        fill = lambda c: F.last(c, ignorenulls=True).over(w)  # noqa: E731
    else:
        # forward: evaluated as a RUNNING last over the REVERSED sort
        # (ts desc, tag asc — the exact reverse of ts asc, tag desc,
        # so an equal-ts right row still sits inside the left row's
        # frame). Incremental O(n); the natural-order
        # first(ignorenulls) over an unbounded-FOLLOWING frame
        # re-scans ahead to the next non-null per row — O(gap²), the
        # same trap measured 12x in gap_fill_linear.
        w = (
            Window.partitionBy(on)
            .orderBy(F.col("_ts").desc(), F.col("_tag"))
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        fill = lambda c: F.last(c, ignorenulls=True).over(w)  # noqa: E731
    filled = u
    for src in fill_src.values():
        filled = filled.withColumn(f"_f{src}", fill(F.col(src)))
    out = filled.filter(F.col("_tag") == 1)
    keep = [c for c in left.columns]
    for c in [*right_cols, ts_out]:
        name = c if c not in left.columns else f"{c}{suffix}"
        out = out.withColumn(name, F.col(f"_f{fill_src[c]}"))
        keep.append(name)
    return out.select(*keep)


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_near",
) -> DataFrame:
    """Nearest as-of join: every left row gains the temporally CLOSEST
    right row per key — either direction, ties to the earlier
    (backward) side. The sensor-fusion alignment mode pandas calls
    ``merge_asof(direction='nearest')``; backward/forward alone
    cannot express it.

    Same single-shuffle union form as :func:`asof_join`, evaluated
    once: both directional fills are windows over the SAME
    ``partitionBy(on)`` exchange (one shuffle, two within-partition
    sorts), then the per-row winner is pure column arithmetic on the
    microsecond deltas. Adds ``{col}{suffix}`` for each right payload
    column, ``{right_ts}{suffix}``, and ``asof_direction``
    ('backward' / 'forward' / NULL when the key has no right rows at
    all)."""
    right_cols = right_cols or [
        c for c in right.columns if c not in (on, right_ts)
    ]
    r = right.groupBy(on, right_ts).agg(
        *[F.max(c).alias(c) for c in right_cols]
    )
    ts_out = f"{right_ts}{suffix}"
    payload = [*right_cols, ts_out]
    l_tagged = left.withColumn("_tag", F.lit(1)).withColumn(
        "_ts", F.col(left_ts)
    )
    r_tagged = r.select(
        F.col(on),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_tag"),
        F.col(right_ts).alias(f"_r_{ts_out}"),
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
    )
    u = l_tagged.unionByName(r_tagged, allowMissingColumns=True)
    wb = (
        Window.partitionBy(on)
        .orderBy(F.col("_ts"), F.col("_tag"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy(on)
        .orderBy(F.col("_ts").desc(), F.col("_tag"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = u
    for c in payload:
        filled = filled.withColumn(
            f"_b_{c}", F.last(f"_r_{c}", ignorenulls=True).over(wb)
        ).withColumn(
            f"_f_{c}", F.last(f"_r_{c}", ignorenulls=True).over(wf)
        )
    out = filled.filter(F.col("_tag") == 1)
    db = F.unix_micros(F.col(left_ts)) - F.unix_micros(
        F.col(f"_b_{ts_out}")
    )
    dfwd = F.unix_micros(F.col(f"_f_{ts_out}")) - F.unix_micros(
        F.col(left_ts)
    )
    # backward wins ties and any case where forward is absent
    pick_b = F.col(f"_b_{ts_out}").isNotNull() & (
        F.col(f"_f_{ts_out}").isNull() | (db <= dfwd)
    )
    keep = list(left.columns)
    for c in payload:
        name = c if c not in left.columns else f"{c}{suffix}"
        out = out.withColumn(
            name, F.when(pick_b, F.col(f"_b_{c}")).otherwise(F.col(f"_f_{c}"))
        )
        keep.append(name)
    out = out.withColumn(
        "asof_direction",
        F.when(pick_b, F.lit("backward")).otherwise(
            F.when(F.col(f"_f_{ts_out}").isNotNull(), F.lit("forward"))
        ),
    )
    return out.select(*keep, "asof_direction")
