"""Upsert (MERGE) and mergeable partial aggregates — the two
incremental-maintenance primitives a parquet-only lake needs.

The reference recomputes gold snapshots from scratch every cycle
(reference consumer/silver_to_gold.py:277-312); at 100 TB a full
recompute per batch is the thing you can never do. These two
operators are the standard escape hatches:

* ``merge_upsert`` — CDC batch application: new/changed rows replace
  their key's previous version, everything else survives. The same
  answer `MERGE INTO` gives on Delta/Iceberg, expressed on plain
  parquet as union + keep-latest (one key-partitioned window). At
  scale, pair with partition pruning: only partitions containing
  touched keys need rewriting.
* ``merge_partial_aggs`` — incremental rollup maintenance: aggregates
  stored as their MERGEABLE partial form (sum, count — never avg) can
  absorb a new batch with one tiny union+re-agg instead of a full
  recompute. Finalization (avg = sum/count) happens at read time.
  This is exactly Spark's own partial-aggregation contract (the
  map-side combine shape) lifted to table state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    keys: list[str],
    order_col: str,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Apply an upsert batch: for each key, the row with the highest
    ``order_col`` wins; ties go to the UPDATES side (the MERGE
    WHEN-MATCHED rule — an update with the same version stamp as the
    base row must still replace it).

    Batch contract: the UPDATES side carries at most one row per key
    per ``order_col`` value — the usual CDC shape. If a batch can
    violate that (two same-key rows with equal ``order_col``), pass
    ``tiebreak_cols`` (e.g. a CDC sequence id) to totalize the window
    order; otherwise ``row_number`` would pick the intra-batch winner
    arbitrarily.

    One key-partitioned window over base ∪ updates. Both sides must
    share the schema (conform first — sources/conform.py). At scale
    the union never materializes: it is a scan of two sources feeding
    one exchange on the keys.
    """
    tagged = base.withColumn("_src", F.lit(0)).unionByName(
        updates.withColumn("_src", F.lit(1))
    )
    order = [F.col(order_col).desc(), F.col("_src").desc()]
    if tiebreak_cols:
        order += [F.col(c).desc() for c in tiebreak_cols]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        tagged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_src")
    )


def merge_partial_aggs(
    state: DataFrame,
    delta: DataFrame,
    keys: list[str],
    sum_cols: list[str],
    count_col: str = "n",
) -> DataFrame:
    """Merge two partial-aggregate tables (same schema: keys +
    per-measure sums + a row count) into one — the monoid append. Both
    inputs are already aggregated, so this shuffles only |keys| rows,
    never raw data; applying a day's delta to a year's state costs one
    tiny exchange.
    """
    merged = state.unionByName(delta)
    aggs = [F.sum(c).alias(c) for c in sum_cols] + [
        F.sum(count_col).cast("long").alias(count_col)
    ]
    return merged.groupBy(*keys).agg(*aggs)


def partial_aggregate(
    df: DataFrame,
    keys: list[str],
    measures: list[str],
    count_col: str = "n",
) -> DataFrame:
    """Reduce raw rows to the mergeable partial form: per-key sums of
    each measure plus the row count. avg/rate finalization belongs at
    READ time (``finalize_means``) — storing a mean would make the
    state non-mergeable."""
    aggs = [F.sum(c).alias(c) for c in measures] + [
        F.count(F.lit(1)).alias(count_col)
    ]
    return df.groupBy(*keys).agg(*aggs)


def reaggregate_rollup(
    partial: DataFrame,
    coarse_keys: list[str],
    sum_cols: list[str],
    min_cols: list[str] | None = None,
    max_cols: list[str] | None = None,
    count_col: str = "n",
) -> DataFrame:
    """Aggregate NAVIGATION: answer a coarser-grained rollup FROM a
    finer materialized one (daily from hourly, monthly from daily)
    instead of rescanning the fact table — the continuous-aggregate /
    materialized-view rewrite every time-series store performs.

    Only works because the stored measures are the MERGEABLE partial
    forms (sum/count/min/max — the same monoids
    ``merge_partial_aggs`` relies on): sums re-sum, counts re-sum,
    min/max re-min/re-max; avg must be re-derived from sum/count at
    the coarser grain, never averaged-of-averages. At 100 TB the win
    is the input width: |hours x keys| rows instead of the fact
    table, so a year-to-date query costs one exchange over ~10^4
    rows per key.
    """
    aggs = (
        [F.sum(c).alias(c) for c in sum_cols]
        + [F.min(c).alias(c) for c in (min_cols or [])]
        + [F.max(c).alias(c) for c in (max_cols or [])]
        + [F.sum(count_col).cast("long").alias(count_col)]
    )
    return partial.groupBy(*coarse_keys).agg(*aggs)


def finalize_means(
    df: DataFrame, measures: list[str], count_col: str = "n"
) -> DataFrame:
    """Read-time finalization: attach ``avg_<m> = sum_m / n`` for each
    measure. Row-local arithmetic, zero shuffle."""
    for m in measures:
        df = df.withColumn(f"avg_{m}", F.col(m) / F.col(count_col))
    return df


def scd2_intervals(
    df: DataFrame,
    keys: list[str],
    effective_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Build slowly-changing-dimension type-2 history from a change
    log: each change row becomes a version with
    ``valid_from = effective_col`` and ``valid_to`` = the NEXT
    change's effective time (open-ended null for the current
    version, flagged ``is_current``). Point-in-time lookups then
    join on ``valid_from <= t < valid_to`` — or use the as-of join
    (operators/joins.py), which is the same question asked from the
    fact side.

    One key-partitioned window (lead) — the same single-shuffle
    shape as every versioned-row operator here; ties on the
    effective time are ordered by ``tiebreak_col`` so same-instant
    changes produce a deterministic (zero-length) version chain
    rather than an engine-dependent one."""
    w = Window.partitionBy(*keys).orderBy(
        F.col(effective_col), F.col(tiebreak_col)
    )
    nxt = F.lead(effective_col).over(w)
    return (
        df.withColumn("valid_from", F.col(effective_col))
        .withColumn("valid_to", nxt)
        .withColumn("is_current", nxt.isNull())
    )


def snapshot_diff(
    a: DataFrame,
    b: DataFrame,
    keys: list[str],
    compare_cols: list[str],
    include_unchanged: bool = False,
) -> DataFrame:
    """Change-data capture between two table snapshots: each key is
    classified ``insert`` (only in B), ``delete`` (only in A), or
    ``update`` (in both with any compared column differing,
    NULL-safely — NULL->value and value->NULL are updates, NULL->NULL
    is not). The read-side complement of ``merge_upsert``: diff two
    snapshots to recover the CDC batch that transforms one into the
    other, audit a pipeline re-run, or feed a downstream incremental
    consumer that only wants deltas.

    Output: keys + change_type + ``<col>_old`` / ``<col>_new`` for
    every compared column.

    Scale shape: ONE key-partitioned full outer join — both sides
    shuffle on the diff keys (or co-locate for free if the snapshots
    are bucketed by them, sources/parquet.py bucketing). The
    classification is row-local expression work on the joined row.
    ``include_unchanged=False`` drops identical keys EARLY, so the
    result is |delta|-sized, not |table|-sized.
    """
    if not keys or not compare_cols:
        raise ValueError(
            "snapshot_diff needs at least one key and one compare column"
        )
    # Literal presence markers, NOT key-nullability: detecting side
    # presence via `keys[0] IS NOT NULL` misclassifies rows whose key
    # itself is NULL (an A-only NULL-key row would report 'insert'
    # instead of 'delete'). The join is also null-SAFE so a NULL key
    # present in both snapshots diffs as one row (update/unchanged),
    # not a spurious delete+insert pair.
    ka = a.select(
        *[F.col(k).alias(f"_ka_{k}") for k in keys],
        *[F.col(c).alias(f"{c}_old") for c in compare_cols],
        F.lit(True).alias("_in_a"),
    )
    kb = b.select(
        *[F.col(k).alias(f"_kb_{k}") for k in keys],
        *[F.col(c).alias(f"{c}_new") for c in compare_cols],
        F.lit(True).alias("_in_b"),
    )
    cond = [ka[f"_ka_{k}"].eqNullSafe(kb[f"_kb_{k}"]) for k in keys]
    j = ka.join(kb, cond, "full_outer")
    in_a = F.col("_in_a").isNotNull()
    in_b = F.col("_in_b").isNotNull()
    changed = None
    for c in compare_cols:
        ne = ~F.col(f"{c}_old").eqNullSafe(F.col(f"{c}_new"))
        changed = ne if changed is None else (changed | ne)
    out = j.select(
        *[
            F.coalesce(F.col(f"_ka_{k}"), F.col(f"_kb_{k}")).alias(k)
            for k in keys
        ],
        F.when(~in_a, F.lit("insert"))
        .when(~in_b, F.lit("delete"))
        .when(changed, F.lit("update"))
        .otherwise(F.lit("unchanged"))
        .alias("change_type"),
        *[F.col(f"{c}_old") for c in compare_cols],
        *[F.col(f"{c}_new") for c in compare_cols],
    )
    if not include_unchanged:
        out = out.filter(F.col("change_type") != "unchanged")
    return out


def as_of_version(
    base: DataFrame,
    batches: list[DataFrame],
    version: int,
    keys: list[str],
    change_type_col: str = "change_type",
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Time travel on plain parquet: reconstruct the table state AS OF
    version ``version`` from a base snapshot (version 0) plus the
    ordered CDC batches 1..N — the read-side completion of
    ``merge_upsert``/``snapshot_diff`` and the format-free answer to
    Delta/Iceberg ``VERSION AS OF``.

    Batch contract: each batch carries the full row values plus
    ``change_type_col`` ∈ {insert, update, delete} (the
    ``snapshot_diff`` output shape), at most one row per key per
    batch (compact first, or pass ``tiebreak_cols``). Batches are
    UPSERT/DELETE streams in the compacted-topic sense: the LATEST
    change ≤ V wins per key, so an update after a delete
    re-materializes the key (it carries full values), and a delete
    is absence — no tombstone column in the result.

    Scale shape: ONE pass — base ∪ batches[0..V) tagged with their
    version feed a single key-partitioned window (latest version
    wins), then delete winners drop. NOT V sequential merges: V
    windows would shuffle the base V times; this shuffles everything
    once, and the batch sides are delta-sized. Same single-exchange
    contract as ``merge_upsert`` (which is the V=1 special case with
    no deletes)."""
    if not 0 <= version <= len(batches):
        raise ValueError(
            f"version {version} outside 0..{len(batches)}"
        )
    value_cols = [c for c in base.columns if c not in keys]
    tagged = base.select(
        *keys,
        *value_cols,
        F.lit("insert").alias("_ct"),
        F.lit(0).alias("_v"),
    )
    for i, b in enumerate(batches[:version]):
        tagged = tagged.unionByName(
            b.select(
                *keys,
                *value_cols,
                F.col(change_type_col).alias("_ct"),
                F.lit(i + 1).alias("_v"),
            )
        )
    order = [F.col("_v").desc()]
    if tiebreak_cols:
        order += [F.col(c).desc() for c in tiebreak_cols]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        tagged.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & (F.col("_ct") != "delete"))
        .drop("_rn", "_ct", "_v")
    )


def expire_versions(
    base: DataFrame,
    batches: list[DataFrame],
    keep_from_version: int,
    keys: list[str],
    change_type_col: str = "change_type",
) -> tuple[DataFrame, list[DataFrame]]:
    """Retention compaction — the VACUUM/retention half of the
    format-free time-travel story: fold versions 0..keep_from_version
    into a new base snapshot (one ``as_of_version`` pass) and keep
    only the later batches as replayable history. After
    ``new_base, rest = expire_versions(base, batches, k, keys)``,
    ``as_of_version(new_base, rest, v - k, keys)`` equals
    ``as_of_version(base, batches, v, keys)`` for every v ≥ k — the
    equivalence the unit suite asserts — while versions before k stop
    being reconstructable (that is the point: bounded history, like a
    table format's retention window).

    Scale shape: the fold is one windowed pass; the kept batches pass
    through untouched (no rewrite of retained history). Run it on the
    cadence history depth grows, exactly like OPTIMIZE/VACUUM."""
    new_base = as_of_version(
        base, batches, keep_from_version, keys, change_type_col
    )
    return new_base, list(batches[keep_from_version:])


def incremental_join_delta(
    a_old: DataFrame,
    da: DataFrame,
    b_old: DataFrame,
    db: DataFrame,
    on: list[str],
) -> DataFrame:
    """Incremental maintenance of an inner-join view under INSERTS to
    both sides: the new matches created by the deltas are exactly

        dJ = (da ⋈ b_old) ∪ (a_old ⋈ db) ∪ (da ⋈ db)

    so the maintained view is J_old ∪ dJ — no recomputation of
    a_old ⋈ b_old, the term that dominates at 100 TB. This is the
    classic counting-free delta rule for insert-only streams (deletes
    need the counting algorithm or snapshot_diff + anti-join, which
    composes with this).

    Scale shape: three joins, each with at least one DELTA input —
    deltas are typically partition-sized, so each join is
    |delta| x matching keys, and AQE broadcasts the delta side when
    it is small. Shuffles never touch more than one full-table side
    per term.
    """
    return (
        da.join(b_old, on)
        .unionByName(a_old.join(db, on))
        .unionByName(da.join(db, on))
    )
