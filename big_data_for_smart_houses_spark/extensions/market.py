"""Basket co-occurrence / association mining (market-basket lift).

The pair-counting core of association-rule mining (Agrawal & Srikant,
VLDB 1994's Apriori first pass; the same statistic modern retail and
recommendation pipelines compute over order logs): for items that
share a basket, support, confidence, and lift from three exact
counts — baskets containing a, containing b, containing both.

Plan shape at 100 TB:
- the basket self-join is keyed on the basket id, so both sides
  shuffle ONCE on the same key and Catalyst reuses the exchange
  (ReusedExchange — one physical shuffle of the item list, not two);
  pair fan-out is C(k,2) per k-item basket, so cost concentrates in
  jumbo baskets — ``max_basket_items`` drops those outright (the
  standard cap: a 10k-item basket contributes 50M pairs and no
  usable signal), making the fan-out per basket bounded by
  construction.
- pair counts and item counts are partial-aggregable groupBys (one
  keyed shuffle each); the global basket count is a 1-row aggregate
  folded back as a broadcast scalar (the J2 shape), never a join.
- the per-item counts join back keyed on the item — broadcast only
  when the item dimension is actually small; at catalog scale the
  optimizer keeps it a shuffle join on the pair's item key.

All three ratios are SINGLE IEEE divisions of exact integer products
(< 2^53 by construction), so results are bit-reproducible without
quantization — the gate relies on that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cooccurrence_lift(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_count: int = 2,
    max_basket_items: int | None = None,
) -> DataFrame:
    """Co-occurrence statistics for every item pair sharing at least
    ``min_pair_count`` baskets: ``(item_a, item_b, n_ab, n_a, n_b,
    support, confidence, lift)`` with ``item_a < item_b``.

    ``support = n_ab / N``; ``confidence = n_ab / n_a`` (of baskets
    with the smaller-keyed item, how many also hold the other);
    ``lift = n_ab * N / (n_a * n_b)`` (>1: appear together more than
    independence predicts). Duplicate item rows within a basket
    collapse first, so every count is over distinct (basket, item).
    ``max_basket_items`` (optional) drops baskets with more distinct
    items than the cap BEFORE pairing — the quadratic-fan-out guard.
    """
    if min_pair_count < 1:
        raise ValueError("min_pair_count must be >= 1")
    # lazy lineage cut: items feeds four consumers (basket count,
    # item counts, both self-join sides) — materialize the distinct
    # once instead of re-deriving it per consumer (round 14, 0.89x on
    # the sf0.1 gate; the x/y sides still share one exchange below)
    items = (
        df.select(
            F.col(basket_col).alias("basket"),
            F.col(item_col).alias("item"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    if max_basket_items is not None:
        sizes = items.groupBy("basket").agg(
            F.count(F.lit(1)).alias("_bsz")
        )
        items = (
            items.join(sizes, "basket")
            .filter(F.col("_bsz") <= max_basket_items)
            .drop("_bsz")
        )
    n_baskets = items.agg(
        F.count_distinct("basket").alias("n_baskets")
    )
    item_counts = items.groupBy("item").agg(
        F.count(F.lit(1)).alias("n_item")
    )
    # self-join with BOTH sides the identical subplan (alias AFTER the
    # join, not before): the two shuffles on basket are then the same
    # exchange and Catalyst plans one physical shuffle + a
    # ReusedExchange — asserted in test_plans.py. Renaming item before
    # the join would make the subplans differ and double the shuffle.
    x, y = items.alias("x"), items.alias("y")
    pairs = (
        x.join(y, F.col("x.basket") == F.col("y.basket"))
        .filter(F.col("x.item") < F.col("y.item"))
        .select(
            F.col("x.item").alias("item_a"),
            F.col("y.item").alias("item_b"),
        )
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= min_pair_count)
    )
    return (
        pairs.join(
            item_counts.withColumnRenamed("item", "item_a")
            .withColumnRenamed("n_item", "n_a"),
            "item_a",
        )
        .join(
            item_counts.withColumnRenamed("item", "item_b")
            .withColumnRenamed("n_item", "n_b"),
            "item_b",
        )
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "item_a",
            "item_b",
            "n_ab",
            "n_a",
            "n_b",
            (
                F.col("n_ab").cast("double")
                / F.col("n_baskets").cast("double")
            ).alias("support"),
            (
                F.col("n_ab").cast("double") / F.col("n_a").cast("double")
            ).alias("confidence"),
            (
                (F.col("n_ab") * F.col("n_baskets")).cast("double")
                / (F.col("n_a") * F.col("n_b")).cast("double")
            ).alias("lift"),
        )
    )
