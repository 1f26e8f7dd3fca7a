"""Distributed global prefix scan (running totals under a total order).

The naive Spark formulation — ``SUM(x) OVER (ORDER BY ...)`` with no
PARTITION BY — plans an ``Exchange SinglePartition``: the entire input
funnels through ONE reducer, which is the single most common scale
bug in analytical Spark code (at 100 TB it simply never finishes).
The reference has no scan operator at all (its pandas ``cumsum`` at
consumer/bronze_to_silver.py-scale data is a single-process loop by
construction); this module is the engine-native answer.

Classic two-level scan (Blelloch): range-partition the rows by the
order key so partition *i* holds keys strictly before partition
*i+1*, compute each partition's LOCAL prefix sums, aggregate one
total per partition, exclusively scan that tiny per-partition totals
table (≤ ``num_partitions`` rows — the ONLY single-partition stage,
bounded by cluster size not data size), and broadcast the offsets
back. Every full-data stage is JVM-side whole-stage-codegen window /
aggregate work; the data shuffles twice (once by range, once by
partition id for the local window) and never converges on one task.

Determinism: the OUTPUT is independent of where the range boundaries
land — a global running sum under a total order does not care how the
rows were grouped — so the sampling inside ``repartitionByRange``
cannot perturb results. The caller must pass a TOTAL order
(``order_cols`` ending in a unique tiebreaker); ties across a
partition boundary would otherwise make "preceding rows" ambiguous.
Integer/decimal values scan exactly; float running sums inherit the
usual reassociation caveat (quantize for oracle parity).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "_scan_pid"
_LOCAL = "_scan_local"
_OFF = "_scan_off"


def global_running_sum(
    df: DataFrame,
    order_cols: Sequence[str],
    value: Column | str,
    out_col: str = "running",
    num_partitions: int | None = None,
    inclusive: bool = True,
) -> DataFrame:
    """Exact global running sum of ``value`` under the total order
    ``order_cols``, with no data-sized single-partition stage.

    ``inclusive=False`` gives the exclusive prefix (0 for the first
    row). Adds ``out_col``; all scan scaffolding columns are dropped.
    """
    if not order_cols:
        raise ValueError("global_running_sum needs a total order")
    spark = df.sparkSession
    n = int(
        num_partitions
        or spark.conf.get("spark.sql.shuffle.partitions", "200")
    )
    val = F.col(value) if isinstance(value, str) else value

    # Stage 1: range layout — partition i entirely precedes i+1.
    ranged = df.repartitionByRange(n, *[F.col(c) for c in order_cols])
    pid = ranged.withColumn(_PID, F.spark_partition_id())

    # Stage 2: local prefix within each former range partition. The
    # window's PARTITION BY pid re-shuffles by hash(pid) — a balanced
    # full-data exchange, NOT a single-partition one.
    frame_end = 0 if inclusive else -1
    w_local = (
        Window.partitionBy(_PID)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, frame_end)
    )
    local = pid.withColumn(
        _LOCAL, F.coalesce(F.sum(val).over(w_local), F.lit(0).cast("long"))
    )

    # Stage 3: one total per partition (map-side combined — the
    # shuffle moves <= n pre-aggregated rows), exclusively scanned.
    # This window IS single-partition, over <= num_partitions rows:
    # bounded by cluster parallelism, not by data volume.
    totals = pid.groupBy(_PID).agg(F.sum(val).alias("_ptot"))
    w_off = (
        Window.orderBy(_PID)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        _PID,
        F.coalesce(F.sum("_ptot").over(w_off), F.lit(0).cast("long")).alias(
            _OFF
        ),
    )

    # Stage 4: broadcast the tiny offsets table back onto the data.
    return (
        local.join(F.broadcast(offsets), _PID)
        .withColumn(out_col, F.col(_LOCAL) + F.col(_OFF))
        .drop(_PID, _LOCAL, _OFF)
    )


def global_row_number(
    df: DataFrame,
    order_cols: Sequence[str],
    out_col: str = "rownum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Dense 0-based global row numbers under a total order — the
    scalable replacement for ``row_number() OVER (ORDER BY ...)`` /
    ``zipWithIndex`` (and unlike ``monotonically_increasing_id``, the
    numbering is dense, deterministic, and order-defined)."""
    numbered = global_running_sum(
        df,
        order_cols,
        F.lit(1).cast("long"),
        out_col=out_col,
        num_partitions=num_partitions,
        inclusive=False,
    )
    return numbered


def sweepline_concurrency(
    intervals: DataFrame,
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    id_col: str = "event_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Interval sweep line: the running count of concurrently-open
    half-open intervals ``[start, end)`` at every boundary instant.

    Each interval contributes a +1 point at its start and a -1 at its
    end; the global running sum of deltas under the total order
    ``(t, delta, id)`` is the concurrency AFTER applying that
    boundary. Ordering delta=-1 before delta=+1 at equal ``t``
    encodes half-open semantics: an interval ending exactly when
    another starts never overlaps it. Returns one row per boundary
    point: ``(t, delta, id, concurrency)``.

    Scale shape: a 2x row fan-out (union of two projections of the
    same input) followed by :func:`global_running_sum` — no
    data-sized single-partition stage, unlike the textbook
    ``SUM(delta) OVER (ORDER BY t)`` formulation.
    """
    starts = intervals.select(
        F.col(start_col).alias("t"),
        F.lit(1).cast("long").alias("delta"),
        F.col(id_col).alias("id"),
    )
    ends = intervals.select(
        F.col(end_col).alias("t"),
        F.lit(-1).cast("long").alias("delta"),
        F.col(id_col).alias("id"),
    )
    points = starts.unionByName(ends)
    return global_running_sum(
        points,
        ["t", "delta", "id"],
        F.col("delta"),
        out_col="concurrency",
        num_partitions=num_partitions,
        inclusive=True,
    )
