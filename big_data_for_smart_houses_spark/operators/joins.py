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


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: every left row gains the most recent right row
    at-or-before its timestamp (per ``on`` key); left rows with no
    prior right row keep nulls. Right rows are first reduced to one
    per (key, ts) — deterministic under ties."""
    right_cols = right_cols or [
        c for c in right.columns if c not in (on, right_ts)
    ]
    # one right row per (key, ts): keep the max of each payload column
    # (any deterministic reduction works; max matches the SQL oracle)
    r = right.groupBy(on, right_ts).agg(
        *[F.max(c).alias(c) for c in right_cols]
    )
    l_tagged = left.withColumn("_tag", F.lit(1)).withColumn(
        "_ts", F.col(left_ts)
    )
    r_tagged = (
        r.withColumn("_tag", F.lit(0))
        .withColumn("_ts", F.col(right_ts))
        .withColumn(f"{right_ts}{suffix}", F.col(right_ts))
    )
    u = l_tagged.unionByName(r_tagged, allowMissingColumns=True)
    # right rows sort before left rows at equal ts (tag 0 < 1):
    # inclusive <= semantics
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("_ts"), F.col("_tag"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = u
    for c in [*right_cols, f"{right_ts}{suffix}"]:
        filled = filled.withColumn(
            f"_f_{c}", F.last(F.col(c), ignorenulls=True).over(w)
        )
    out = filled.filter(F.col("_tag") == 1)
    keep = [c for c in left.columns]
    for c in [*right_cols, f"{right_ts}{suffix}"]:
        out = out.withColumn(
            c if c not in left.columns else f"{c}{suffix}", F.col(f"_f_{c}")
        )
        keep.append(c if c not in left.columns else f"{c}{suffix}")
    return out.select(*keep)
