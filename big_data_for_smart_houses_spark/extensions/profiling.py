"""Single-pass table profiler (the ANALYZE-TABLE surface a curation
pipeline runs before and after every transform to catch schema drift,
null storms, and cardinality surprises).

One scan, one aggregate: every column's metrics are computed in the
same agg (Spark expands the multi-distinct into one Expand + two
aggregates — still a single pass over the data), then the wide 1-row
result is exploded into the long (column, metric...) layout. Never one
job per column: at 100 TB each extra pass is the dominant cost.

min/max are compared AFTER a cast to string on both engines (binary
byte order), so one profiler contract covers every input type — the
profile is for drift detection, not numeric stats, which belong to the
typed operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, columns: list[str]) -> DataFrame:
    """Long-format profile of ``columns``: row count, null count,
    exact distinct count, and string-ordered min/max per column —
    all exact integers/strings, engine-exact by construction."""
    if not columns:
        raise ValueError("profile_columns needs at least one column")
    aggs = [F.count(F.lit(1)).alias("_n_rows")]
    for c in columns:
        s = F.col(c).cast("string")
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"_nulls_{c}"),
            F.countDistinct(F.col(c)).alias(f"_dist_{c}"),
            F.min(s).alias(f"_min_{c}"),
            F.max(s).alias(f"_max_{c}"),
        ]
    wide = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("_n_rows").alias("n_rows"),
                F.col(f"_nulls_{c}").alias("n_nulls"),
                F.col(f"_dist_{c}").alias("n_distinct"),
                F.col(f"_min_{c}").alias("min_value"),
                F.col(f"_max_{c}").alias("max_value"),
            )
            for c in columns
        ]
    )
    return wide.select(F.explode(rows).alias("p")).select("p.*")


def value_histogram(
    df: DataFrame,
    col: str,
    lo: float,
    hi: float,
    n_bins: int,
) -> DataFrame:
    """Fixed-range histogram of a numeric column: ``n_bins`` equal
    bins over [lo, hi), with underflow clamped into bin 0 and overflow
    into the last bin (so every row is counted — the distribution
    readout that drives winsorization / bucketing decisions).

    One map-side-combined aggregate producing ``n_bins`` rows, scale-
    free. The bin arithmetic is row-level double math on constants —
    identical IEEE ops on every engine, so counts are exact without
    quantization; ``bin_lo`` is derived from the integer bin id the
    same way on both sides."""
    if n_bins < 1 or not hi > lo:
        raise ValueError("value_histogram needs n_bins >= 1 and hi > lo")
    width = (hi - lo) / n_bins
    raw = F.floor((F.col(col) - F.lit(lo)) / F.lit(width)).cast("long")
    bin_id = F.least(F.lit(n_bins - 1), F.greatest(F.lit(0), raw))
    return (
        df.groupBy(bin_id.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("bin_lo", F.lit(lo) + F.col("bin") * F.lit(width))
        .select("bin", "bin_lo", "n")
    )


def profile_drift(
    a: DataFrame,
    b: DataFrame,
    columns: list[str],
) -> DataFrame:
    """Data-quality drift between two snapshots of the same table
    (yesterday's load vs today's, upstream A vs migrated B): joins the
    two single-pass profiles on column name and reports per column the
    null-RATE delta, distinct-count ratio, and whether the min/max
    bounds moved. Everything derives from the two profile scans — no
    third pass over either table, and the join is |columns| rows.

    Rates are single divisions of exact ints (engine-exact); the
    distinct ratio divides two exact counts. A drifted column is one
    whose null-rate delta exceeds 1 % absolute or whose bounds
    changed — the alert predicate a nightly pipeline gate would page
    on."""
    pa = profile_columns(a, columns)
    pb = profile_columns(b, columns)
    left = pa.select(
        "column",
        F.col("n_rows").alias("a_rows"),
        F.col("n_nulls").alias("a_nulls"),
        F.col("n_distinct").alias("a_distinct"),
        F.col("min_value").alias("a_min"),
        F.col("max_value").alias("a_max"),
    )
    right = pb.select(
        "column",
        F.col("n_rows").alias("b_rows"),
        F.col("n_nulls").alias("b_nulls"),
        F.col("n_distinct").alias("b_distinct"),
        F.col("min_value").alias("b_min"),
        F.col("max_value").alias("b_max"),
    )
    j = left.join(right, "column")
    null_rate_a = F.col("a_nulls") / F.col("a_rows")
    null_rate_b = F.col("b_nulls") / F.col("b_rows")
    delta = null_rate_b - null_rate_a
    # null-SAFE comparison: an all-null column has NULL min/max, and
    # plain != would make bounds_moved NULL so the alert predicate
    # silently never fires — exactly the column most worth paging on.
    bounds_moved = (~F.col("a_min").eqNullSafe(F.col("b_min"))) | (
        ~F.col("a_max").eqNullSafe(F.col("b_max"))
    )
    # distinct ratio is undefined (NULL) when snapshot A had no
    # non-null values — guarded so the engine-vs-oracle behavior is
    # pinned rather than left to each engine's 0-division convention
    distinct_ratio = F.when(
        F.col("a_distinct") > 0,
        F.col("b_distinct") / F.col("a_distinct"),
    )
    return j.select(
        "column",
        "a_rows",
        "b_rows",
        delta.alias("null_rate_delta"),
        distinct_ratio.alias("distinct_ratio"),
        bounds_moved.alias("bounds_moved"),
        ((F.abs(delta) > 0.01) | bounds_moved).alias("drifted"),
    )


def token_kl_by_group(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Distribution-shift diagnostic for corpus mixing: per group (a
    source, a shard, a time slice), the KL divergence of its token
    distribution from the whole corpus's — KL(p_group ‖ p_corpus) =
    Σ_t p·ln(p/q). Near-zero means the slice looks like the mix;
    spikes flag a source whose token statistics drifted (scraper
    broke, new domain, template flood) BEFORE it pollutes a training
    run. The corpus is the superset of every group, so q > 0 wherever
    p > 0 and the sum is always finite.

    One explode feeds two count aggregations — (group, token) and
    (token) — joined back token-keyed (the vocabulary is multi-GB at
    100 TB, so a shuffle join, NOT a broadcast; same reasoning as
    TF-IDF's DF join), then one group-keyed sum. Group totals ride
    the (group, token) counts via a group-keyed window, reusing the
    final aggregation's exchange.
    """
    from .vocab import _ws_tokens

    toks = df.select(
        F.col(group_col).alias("grp"), F.explode(_ws_tokens(text_col)).alias("token")
    )
    gt = toks.groupBy("grp", "token").agg(F.count(F.lit(1)).alias("n_gt"))
    from pyspark.sql.window import Window

    gt = gt.withColumn(
        "n_g", F.sum("n_gt").over(Window.partitionBy("grp"))
    )
    t = toks.groupBy("token").agg(F.count(F.lit(1)).alias("n_t"))
    # corpus total: 1-row aggregate over the token counts, folded in
    # via broadcast cross join (J2 scalar shape) — no extra pass over
    # the exploded tokens and no driver-side action in the plan build
    total = t.agg(F.sum("n_t").cast("double").alias("n_total"))
    joined = gt.join(t, "token").crossJoin(F.broadcast(total))
    p = F.col("n_gt") / F.col("n_g")
    q = F.col("n_t") / F.col("n_total")
    return (
        joined.groupBy("grp")
        .agg(F.sum(p * F.log(p / q)).alias("kl"))
        .select(F.col("grp").alias(group_col), "kl")
    )
