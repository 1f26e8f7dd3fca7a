"""Skew-mitigation operators for 100 TB joins and aggregations.

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on in
session.py) handles sort-merge skew at runtime; these helpers cover the
cases AQE cannot:

- ``salted_join``: a shuffle join where one side has a few hot keys
  (the classic power-law device/user distribution). The fact side gets
  a random salt in [0, n); the dimension side is exploded n-fold so
  every salted key finds its match. Hot keys spread over n reducers at
  the cost of an n-fold copy of the (small) right side — the standard
  trade when the right side is too big to broadcast outright but its
  per-key rows are few.
- ``two_phase_agg``: partial aggregation under a salted key, then a
  final merge — for aggregations whose key distribution is so skewed
  that one reducer would own most of the data. Only valid for
  decomposable aggregates (sum/count/min/max and avg via sum+count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT_BUCKETS = 16

_SALT = "_salt"


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    how: str = "inner",
    n_buckets: int = DEFAULT_SALT_BUCKETS,
) -> DataFrame:
    """Equi-join with the fact side salted and the dim side replicated
    ``n_buckets`` times, so a hot join key occupies ``n_buckets``
    shuffle partitions instead of one."""
    salted_fact = fact.withColumn(
        _SALT, (F.rand(seed=0) * n_buckets).cast("int")
    )
    replicated_dim = dim.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_buckets - 1)))
    )
    return salted_fact.join(replicated_dim, [on, _SALT], how).drop(_SALT)


def two_phase_agg(
    df: DataFrame,
    keys: list[str],
    sum_cols: list[str],
    count_alias: str = "n_rows",
    n_buckets: int = DEFAULT_SALT_BUCKETS,
) -> DataFrame:
    """Sum/count aggregation in two phases: salted partial aggregation
    spreads a hot key over ``n_buckets`` reducers, the final merge runs
    over at most ``n_buckets`` rows per key. Emits ``sum_<c>`` per
    input column plus a row count.

    Spark's own partial aggregation already does this per *partition*;
    the salt phase adds a full shuffle boundary, which pays off only
    when per-partition partials still leave one reducer with the bulk
    of the groups' data (extreme skew + high-cardinality secondary
    keys). Measure before using.
    """
    salted = df.withColumn(_SALT, (F.rand(seed=0) * n_buckets).cast("int"))
    partial = salted.groupBy(*keys, _SALT).agg(
        F.count(F.lit(1)).alias("_pc"),
        *[F.sum(c).alias(f"_ps_{c}") for c in sum_cols],
    )
    return partial.groupBy(*keys).agg(
        F.sum("_pc").alias(count_alias),
        *[F.sum(f"_ps_{c}").alias(f"sum_{c}") for c in sum_cols],
    )


def two_phase_topk(
    df: DataFrame,
    group_col: str,
    k: int,
    order_col: str = "doc_id",
    n_buckets: int = DEFAULT_SALT_BUCKETS,
) -> DataFrame:
    """Skew-safe top-K per group (lowest ``order_col`` first): phase 1
    takes a per-(group, salt) partial top-K, so a hot group sorts in
    ``n_buckets`` reducer-local pieces instead of one; phase 2 merges
    at most ``n_buckets * k`` survivors per group into the final
    ranking. Semantics are identical to the single-window
    ``cap_per_group`` — only the physical shape changes (the same
    invariant the salted-join gate asserts: salting must never change
    the answer). Top-K selection is decomposable (the global top-K is
    contained in the union of partial top-Ks), which is what makes the
    rewrite sound; the salt is a deterministic hash of ``order_col``,
    not rand(), so retries and replays see the same buckets."""
    from pyspark.sql import Window

    salt = F.pmod(F.xxhash64(F.col(order_col)), F.lit(n_buckets))
    w1 = Window.partitionBy(group_col, _SALT).orderBy(F.col(order_col))
    partial = (
        df.withColumn(_SALT, salt)
        .withColumn("_pr", F.row_number().over(w1))
        .filter(F.col("_pr") <= k)
        .drop("_pr")
    )
    w2 = Window.partitionBy(group_col).orderBy(F.col(order_col))
    return (
        partial.withColumn("group_rank", F.row_number().over(w2).cast("long"))
        .filter(F.col("group_rank") <= k)
        .drop(_SALT)
    )
