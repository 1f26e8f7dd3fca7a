"""Distributed order statistics on the global prefix scan.

Weighted quantiles, the Gini coefficient, and the two-sample
Kolmogorov-Smirnov statistic are all "sort everything, then walk the
running total" computations — the textbook versions are single-pass
loops (and the naive Spark versions are single-reducer global
windows). Each is re-expressed here on
:func:`..operators.scan.global_running_sum`, so the sort is a range
partition and the walk is a balanced per-partition window: no
data-sized single-partition stage anywhere.

Exactness discipline: every running quantity is an INTEGER (weights,
counts, currency cents), every threshold comparison is cross-
multiplied into integer arithmetic (``2*cw >= W`` instead of ``cw >=
W/2``; ``|cA*nB - cB*nA|`` instead of ``|cA/nA - cB/nB|``), and the
one float division each statistic ends with is a single IEEE op on
exact integers — bit-reproducible on any engine, which is what lets
the DuckDB oracles gate these hash-exact.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .scan import global_running_sum


def weighted_quantiles(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    qs: Sequence[tuple[int, int]],
    id_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact weighted lower-quantiles: for each rational ``q = num/
    den`` the smallest value whose inclusive running weight ``cw``
    satisfies ``cw * den >= num * W`` (W = total weight). One global
    scan serves every requested quantile — a row emits for quantile q
    iff it is the FIRST to cross q's threshold (its exclusive prefix
    ``cw - w`` was still below), so selection is a single filter, not
    a per-quantile pass.

    Weights must be positive integers (the caller chooses the
    granularity); values pass through untouched, so doubles gate
    exactly. ``id_col`` breaks ties into a total order. Returns
    ``(q_num, q_den, value)``, one row per quantile.
    """
    scanned = global_running_sum(
        df.select(
            F.col(value_col).alias("_v"),
            F.col(weight_col).cast("long").alias("_w"),
            F.col(id_col).alias("_id"),
        ),
        ["_v", "_id"],
        F.col("_w"),
        out_col="_cw",
        num_partitions=num_partitions,
        inclusive=True,
    )
    total = scanned.agg(F.sum("_w").alias("_wtot"))
    qrows = F.array(
        *[
            F.struct(
                F.lit(int(num)).alias("q_num"), F.lit(int(den)).alias("q_den")
            )
            for num, den in qs
        ]
    )
    return (
        scanned.crossJoin(F.broadcast(total))
        .select(
            "_v",
            "_cw",
            "_w",
            "_wtot",
            F.explode(qrows).alias("_q"),
        )
        .filter(
            (F.col("_cw") * F.col("_q.q_den")
             >= F.col("_q.q_num") * F.col("_wtot"))
            & ((F.col("_cw") - F.col("_w")) * F.col("_q.q_den")
               < F.col("_q.q_num") * F.col("_wtot"))
        )
        .select(
            F.col("_q.q_num").alias("q_num"),
            F.col("_q.q_den").alias("q_den"),
            F.col("_v").alias("value"),
        )
    )


def gini_coefficient(
    df: DataFrame,
    amount_col,
    id_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Gini coefficient of a non-negative integer amount column
    (pass currency as cents): ``G = (2 * Σ i·x_(i)) / (n · Σx)
    - (n + 1) / n`` with ``i`` the 1-based rank under ``(amount,
    id)``. Rank order among equal amounts cannot change ``Σ i·x``,
    so the tiebreaker only makes the scan's order total, not the
    result arbitrary. ``Σ i·x`` runs as a plain aggregate over the
    scan's running count; both numerators stay integer until the two
    final divisions. Returns one row ``(gini, n_rows,
    total_amount)``."""
    amt = F.col(amount_col) if isinstance(amount_col, str) else amount_col
    ranked = global_running_sum(
        df.select(amt.cast("long").alias("_x"), F.col(id_col).alias("_id")),
        ["_x", "_id"],
        F.lit(1).cast("long"),
        out_col="_i",
        num_partitions=num_partitions,
        inclusive=True,
    )
    return ranked.agg(
        F.sum(F.col("_i") * F.col("_x")).alias("_six"),
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("_x").alias("total_amount"),
    ).select(
        (
            (F.lit(2.0) * F.col("_six"))
            / (F.col("n_rows") * F.col("total_amount"))
            - (F.col("n_rows") + F.lit(1)).cast("double") / F.col("n_rows")
        ).alias("gini"),
        "n_rows",
        "total_amount",
    )


def ks_two_sample(
    df: DataFrame,
    value_col: str,
    group_col,
    num_partitions: int | None = None,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic ``D = sup_t |F_A(t) -
    F_B(t)|`` where ``group_col`` is a boolean column (true = sample
    A). Ties handled correctly: both empirical CDFs are evaluated at
    DISTINCT values only (a mid-tie prefix is not a CDF value), so
    the input is pre-aggregated per value before the scan. The sup
    is an integer argmax of ``|cA·nB - cB·nA|``; D itself is that
    maximum over ``nA·nB`` — one exact division. Returns one row
    ``(d_stat, d_num, n_a, n_b)``."""
    grp = F.col(group_col) if isinstance(group_col, str) else group_col
    per_value = (
        df.select(F.col(value_col).alias("_v"), grp.alias("_is_a"))
        .groupBy("_v")
        .agg(
            F.sum(F.when(F.col("_is_a"), 1).otherwise(0))
            .cast("long")
            .alias("_a"),
            F.sum(F.when(F.col("_is_a"), 0).otherwise(1))
            .cast("long")
            .alias("_b"),
        )
    )
    ca = global_running_sum(
        per_value,
        ["_v"],
        F.col("_a"),
        out_col="_ca",
        num_partitions=num_partitions,
        inclusive=True,
    )
    cab = global_running_sum(
        ca,
        ["_v"],
        F.col("_b"),
        out_col="_cb",
        num_partitions=num_partitions,
        inclusive=True,
    )
    totals = per_value.agg(
        F.sum("_a").alias("n_a"), F.sum("_b").alias("n_b")
    )
    return (
        cab.crossJoin(F.broadcast(totals))
        .select(
            F.abs(
                F.col("_ca") * F.col("n_b") - F.col("_cb") * F.col("n_a")
            ).alias("_diff"),
            "n_a",
            "n_b",
        )
        .groupBy("n_a", "n_b")
        .agg(F.max("_diff").alias("d_num"))
        .select(
            (
                F.col("d_num").cast("double")
                / (F.col("n_a") * F.col("n_b")).cast("double")
            ).alias("d_stat"),
            "d_num",
            "n_a",
            "n_b",
        )
    )
