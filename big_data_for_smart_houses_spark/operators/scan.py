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
When the input carries payload columns beyond (order, value) they
are joined back on the unique order key afterwards — see the
CORRECTNESS-CRITICAL note in :func:`global_running_agg` for why the
scaffolding must run on the minimal projection.

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
_NNN = "_scan_nnn"
_OFFN = "_scan_offn"


_AGGS = {
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
}


def _default_scan_partitions(spark) -> int:
    """Partition count for the range exchange when the caller does
    not pass one. ``spark.sql.shuffle.partitions`` is NOT always an
    int — deployments with auto-optimized shuffle set the literal
    string ``"auto"`` — so fall back to the cluster's default
    parallelism rather than crashing at plan-build time."""
    raw = spark.conf.get("spark.sql.shuffle.partitions", "200")
    try:
        return int(raw)
    except ValueError:
        return spark.sparkContext.defaultParallelism


def global_running_agg(
    df: DataFrame,
    order_cols: Sequence[str],
    value: Column | str,
    agg: str = "sum",
    out_col: str = "running",
    num_partitions: int | None = None,
    inclusive: bool = True,
) -> DataFrame:
    """Exact global running ``sum``/``min``/``max`` of ``value`` under
    the total order ``order_cols``, with no data-sized
    single-partition stage (any commutative-associative aggregate
    fits the two-level scheme; these three cover the query surface).

    ``inclusive=False`` gives the exclusive prefix; a prefix with
    ZERO non-null contributions (the first row, or a leading run of
    NULL values) yields NULL under every agg — exactly
    ``AGG(x) OVER (ORDER BY ... ROWS ...)`` semantics, where an
    aggregate over no non-null inputs is NULL, never a fabricated 0.
    Adds ``out_col``; all scan scaffolding columns are dropped.
    """
    if not order_cols:
        raise ValueError("global_running_agg needs a total order")
    if agg not in _AGGS:
        raise ValueError(f"agg must be one of {sorted(_AGGS)}, got {agg!r}")
    agg_fn = _AGGS[agg]
    spark = df.sparkSession
    # explicit None test: `or` would collapse num_partitions=0 into
    # the default instead of rejecting it (round-10 advice)
    n = (
        _default_scan_partitions(spark)
        if num_partitions is None
        else num_partitions
    )
    if n < 1:
        raise ValueError(f"num_partitions must be >= 1, got {n}")
    val = F.col(value) if isinstance(value, str) else value

    # CORRECTNESS-CRITICAL: the local-prefix branch and the totals
    # branch below each instantiate the range exchange. Spark's
    # RangePartitioner seeds its boundary sample with the RDD id, so
    # two PHYSICAL instances of the "same" repartitionByRange pick
    # DIFFERENT boundaries unless Catalyst's ReuseExchange replaces
    # one with the other — and reuse requires the two subtrees to be
    # canonically IDENTICAL after optimization. Any carried column
    # that column-pruning strips from the totals branch but not the
    # data branch breaks that equality, the branches split into two
    # inconsistent partitionings, and the scan silently corrupts
    # (offsets keyed to boundaries the local prefixes never saw).
    # Therefore: run ALL scaffolding on a minimal (order, value)
    # projection — both branches read exactly these columns, nothing
    # can prune differently, reuse is structural — and join carried
    # columns back on the total-order key (unique by contract).
    carried = [c for c in df.columns if c not in order_cols]
    mini = df.select(*order_cols, val.alias("_scan_val"))

    # Stage 1: range layout — partition i entirely precedes i+1.
    ranged = mini.repartitionByRange(n, *[F.col(c) for c in order_cols])
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
        _LOCAL, agg_fn(F.col("_scan_val")).over(w_local)
    ).withColumn(
        # non-null contributions in the local prefix — rides the SAME
        # window (no extra exchange); needed for exact SQL semantics
        # under sum: an aggregate over zero non-null inputs is NULL,
        # not 0 (leading-NULL prefixes, exclusive first row)
        _NNN, F.count(F.col("_scan_val")).over(w_local)
    )

    # Stage 3: one total per partition (map-side combined — the
    # shuffle moves <= n pre-aggregated rows), exclusively scanned.
    # This window IS single-partition, over <= num_partitions rows:
    # bounded by cluster parallelism, not by data volume.
    totals = pid.groupBy(_PID).agg(
        agg_fn(F.col("_scan_val")).alias("_ptot"),
        F.count(F.col("_scan_val")).alias("_pcnt"),
    )
    w_off = (
        Window.orderBy(_PID)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        _PID,
        agg_fn("_ptot").over(w_off).alias(_OFF),
        F.sum("_pcnt").over(w_off).alias(_OFFN),
    )

    # Stage 4: broadcast the tiny offsets table back onto the data.
    # min/max combine by least/greatest, which skip NULLs — so a NULL
    # exclusive prefix (first partition / first row) falls through to
    # the other side and an all-NULL prefix yields NULL, exactly the
    # SQL window result. sum combines by + over coalesced halves, but
    # guards on the total non-null count so a prefix with ZERO
    # non-null contributions is NULL — SUM(x) OVER (...) semantics —
    # instead of a fabricated 0.
    if agg == "sum":
        n_contrib = F.col(_NNN) + F.coalesce(
            F.col(_OFFN), F.lit(0).cast("long")
        )
        combined = F.when(
            n_contrib > 0,
            F.coalesce(F.col(_LOCAL), F.lit(0).cast("long"))
            + F.coalesce(F.col(_OFF), F.lit(0).cast("long")),
        )
    elif agg == "min":
        combined = F.least(F.col(_LOCAL), F.col(_OFF))
    else:
        combined = F.greatest(F.col(_LOCAL), F.col(_OFF))
    scanned = (
        local.join(F.broadcast(offsets), _PID)
        .withColumn(out_col, combined)
        .drop(_PID, _LOCAL, _OFF, _NNN, _OFFN, "_scan_val")
    )
    if not carried:
        return scanned
    # join carried columns back on the unique total-order key; the
    # scan side holds only (order, running). Null-SAFE equality: a
    # plain equi-join would silently drop rows whose order key
    # contains NULL (the scan side computes them, the join-back
    # loses them) — eqNullSafe keys stay hash-partitionable, so the
    # plan is the same shuffle join either way.
    left = df.alias("_gra_l")
    right = scanned.alias("_gra_r")
    cond = None
    for c in order_cols:
        clause = F.col(f"_gra_l.{c}").eqNullSafe(F.col(f"_gra_r.{c}"))
        cond = clause if cond is None else (cond & clause)
    return left.join(right, cond).select(
        *[F.col(f"_gra_l.{c}") for c in df.columns],
        F.col(f"_gra_r.{out_col}"),
    )


def global_running_sum(
    df: DataFrame,
    order_cols: Sequence[str],
    value: Column | str,
    out_col: str = "running",
    num_partitions: int | None = None,
    inclusive: bool = True,
) -> DataFrame:
    """Exact global running sum — see :func:`global_running_agg`."""
    return global_running_agg(
        df,
        order_cols,
        value,
        agg="sum",
        out_col=out_col,
        num_partitions=num_partitions,
        inclusive=inclusive,
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
    # the exclusive prefix of the FIRST row is empty, which the scan
    # reports as NULL (exact SUM-over-empty-frame semantics); row 0's
    # index is 0 by this function's 0-based contract
    return numbered.withColumn(
        out_col, F.coalesce(F.col(out_col), F.lit(0).cast("long"))
    )


def skyline_2d(
    df: DataFrame,
    minimize_col: str,
    maximize_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """2-D skyline / Pareto frontier (Börzsönyi et al., ICDE'01 — the
    classic operator the skyline literature defines): the distinct
    points ``(x, y)`` not dominated by any other point, where
    domination means ``x' <= x AND y' >= y`` with at least one strict
    (x minimized — price; y maximized — quality).

    The textbook evaluation is the quadratic NOT EXISTS self-join;
    the 2-D case collapses to a sort + running max: under the lex
    order ``(x ASC, y DESC)``, a point is dominated iff some
    predecessor has ``y' >= y`` (same-x predecessors have strictly
    larger y; smaller-x predecessors dominate at any ``y' >= y``) —
    so the skyline is exactly the strict running-maximum frontier of
    ``y``. Running max runs through :func:`global_running_agg`, so
    the whole operator is two balanced shuffles + a distinct, never
    a self-join and never a single-reducer sort. For d > 2 the
    sort trick no longer applies — the scale path is local skyline
    per partition, then a second pass over the (small) union of
    local skylines; not needed for the gated 2-D surface.

    Returns the distinct skyline points ``(minimize_col,
    maximize_col)``.
    """
    pts = df.select(minimize_col, maximize_col).distinct()
    # orderBy y DESC needs an expression column name; alias it.
    ordered = pts.select(
        F.col(minimize_col).alias("_sky_x"),
        F.col(maximize_col).alias("_sky_y"),
        (-F.col(maximize_col)).alias("_sky_yneg"),
    )
    scanned = global_running_agg(
        ordered,
        ["_sky_x", "_sky_yneg"],
        F.col("_sky_y"),
        agg="max",
        out_col="_sky_maxexcl",
        num_partitions=num_partitions,
        inclusive=False,
    )
    return (
        scanned.filter(
            F.col("_sky_maxexcl").isNull()
            | (F.col("_sky_maxexcl") < F.col("_sky_y"))
        )
        .select(
            F.col("_sky_x").alias(minimize_col),
            F.col("_sky_y").alias(maximize_col),
        )
    )


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


def global_ntile(
    df: DataFrame,
    order_cols: Sequence[str],
    buckets: int,
    out_col: str = "bucket",
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed ``NTILE(B) OVER (ORDER BY ...)`` — equi-depth
    bucketing of the WHOLE table, the second classic global-window
    casualty after row_number (quantile binning, decile reports,
    equal-size shard assignment all reach for it).

    NTILE's exact contract: with ``n`` rows and ``B`` buckets,
    ``q = n div B``, ``r = n mod B``, the first ``r`` buckets hold
    ``q+1`` rows, the rest ``q``. That is pure integer arithmetic on
    the dense rank, so the operator is :func:`global_row_number`
    plus a closed-form expression — the row count comes from the
    scan's own totals (a 1-row broadcast), nothing re-sorts. Buckets
    are 1-based like the SQL function.
    """
    if buckets < 1:
        raise ValueError("buckets must be >= 1")
    numbered = global_row_number(
        df, order_cols, out_col="_rn", num_partitions=num_partitions
    )
    total = numbered.agg(F.count(F.lit(1)).alias("_n"))
    # integer `div` throughout — exact at any n (double division
    # would start rounding past 2^53 rows). CASE evaluates lazily,
    # so the q=0 branch (n < B: every row its own bucket) never
    # divides by zero.
    b = int(buckets)
    bucket = F.expr(
        f"CASE WHEN _rn < (_n % {b}) * ((_n div {b}) + 1) "
        f"THEN _rn div ((_n div {b}) + 1) "
        f"ELSE (_n % {b}) + (_rn - (_n % {b}) * ((_n div {b}) + 1)) "
        f"div (_n div {b}) END + 1L"
    )
    return (
        numbered.crossJoin(F.broadcast(total))
        .withColumn(out_col, bucket)
        .drop("_rn", "_n")
    )


MAX_FRONTIER = 100_000


def skyline_nd(
    df: DataFrame,
    minimize_cols: Sequence[str],
    maximize_cols: Sequence[str] = (),
    max_frontier: int = MAX_FRONTIER,
) -> DataFrame:
    """d-dimensional skyline — the d > 2 scale path the sort-based
    :func:`skyline_2d` cannot take (no single order linearizes
    dominance past two dimensions).

    Two-phase local/merge (the distributed block-nested-loop of the
    skyline literature): a point dominated globally is dominated by
    some global skyline point, and every global skyline point
    survives its own partition's local skyline — so phase 1 computes
    per-partition local skylines (vectorized numpy dominance inside
    ``mapInPandas``, O(k²) per partition on the DISTINCT points
    only), and phase 2 re-runs the same kernel once over the union
    of survivors. The union is bounded by ``max_frontier`` with a
    hard raise — skylines are small by nature (dominance kills
    almost everything in correlated data); a frontier past the cap
    means the dimensions are anti-correlated enough that no skyline
    algorithm returns a usefully small answer, and the caller should
    hear that, not receive a silent truncation.

    All dimensions are normalized to MINIMIZE internally
    (``maximize_cols`` are negated in, un-negated out). Returns the
    distinct frontier points with their original columns/signs.
    """
    import pandas as pd

    mins = list(minimize_cols)
    maxs = list(maximize_cols)
    if not mins and not maxs:
        raise ValueError("skyline_nd needs at least one dimension")
    norm = [F.col(c).alias(f"_s{i}") for i, c in enumerate(mins)] + [
        (-F.col(c)).alias(f"_s{len(mins) + i}") for i, c in enumerate(maxs)
    ]
    d = len(mins) + len(maxs)
    cols = [f"_s{i}" for i in range(d)]
    pts = df.select(*norm).distinct()

    def _local(batches):
        import numpy as np

        chunk = [b for b in batches]
        if not chunk:
            return
        data = pd.concat(chunk, ignore_index=True)
        a = data.to_numpy(dtype="float64")
        k = a.shape[0]
        keep = np.ones(k, dtype=bool)
        # vectorized block-nested-loop: point i dominated iff some j
        # has all coords <= and any <
        for i in range(k):
            if not keep[i]:
                continue
            le = (a <= a[i]).all(axis=1)
            lt = (a < a[i]).any(axis=1)
            dom = le & lt
            if dom.any():
                keep[i] = False
            else:
                # i survives; kill everything i dominates (all >= and
                # any >) so later rows skip work
                ge = (a >= a[i]).all(axis=1)
                gt = (a > a[i]).any(axis=1)
                keep &= ~(ge & gt & (np.arange(k) != i))
        yield data[keep]

    schema = pts.schema
    # localCheckpoint: phase 1 (distinct + per-partition numpy
    # skylines) must run ONCE — both the cap count and phase 2 read
    # the materialized survivors instead of recomputing the lineage.
    local = pts.mapInPandas(_local, schema=schema).localCheckpoint(eager=False)
    n_cand = local.count()
    if n_cand > max_frontier:
        raise ValueError(
            f"skyline candidate union {n_cand} exceeds max_frontier="
            f"{max_frontier}: the dimensions are too anti-correlated "
            "for a small skyline; tighten dimensions or raise the cap"
        )
    # repartition(1), NOT coalesce(1): coalesce is a narrow
    # dependency that would fuse phase 1 into a single task,
    # defeating its per-partition parallelism — shuffle only the
    # bounded (<= max_frontier) survivor set to one task instead.
    final = local.repartition(1).mapInPandas(_local, schema=schema)
    out = [F.col(f"_s{i}").alias(c) for i, c in enumerate(mins)] + [
        (-F.col(f"_s{len(mins) + i}")).alias(c) for i, c in enumerate(maxs)
    ]
    return final.select(*out)
