"""Distributed clustering: Lloyd's k-means over an embedding column.

Where it sits in the LLM-pipeline surface (SURVEY.md §7.4): k-means
is the training half of IVF ANN (``similarity.py:ann_ivf`` assigns
to cells produced by a quantizer trained on a bounded driver-side
sample) and the core of cluster-based corpus curation (SemDeDup-style
semantic bucketing, topic balancing, cluster-level quality pruning).
This module is the FULLY DISTRIBUTED trainer: no vector ever reaches
the driver, so it scales to corpora where even a sample is too big to
collect — the 100 TB path that replaces the ≤100k-row quantizer
sample when the embedding table itself is the training set.

Plan shape at 100 TB:
- the centroid table is k rows of arrays (KB-scale model state) and
  rides a **broadcast cross join** into the corpus each iteration —
  the corpus NEVER shuffles for assignment;
- per-point distances are sequential ``zip_with``/``aggregate``
  folds (JVM codegen, defined evaluation order, no Python);
- the argmin is one ``min(struct(dist, cid, vec))`` groupBy per
  point (map-side combinable), the update one (cid, pos) keyed
  aggregate over posexploded winners — so each iteration costs one
  broadcast join plus two keyed exchanges whose width is O(N·k) and
  O(k·dim), independent of how the corpus is partitioned;
- ``localCheckpoint`` per iteration keeps lineage flat (same hygiene
  as ``graph.py:pagerank`` / ``dedup.dedup_groups``).

Determinism contract (what makes the gate hash-exact): seeding is
"k lowest ids" (no RNG), distance ties break on the LOWER cluster id,
and both distances and updated centroid components are quantized
through float32 (``functions/numeric.py:gate_quantize``) so the
engine's partial-agg merge order and the oracle's segment sums
collapse to identical IEEE values before any comparison or reuse.
Empty clusters keep their previous centroid (and report n_points=0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.numeric import gate_quantize


def kmeans_lloyd(
    points: DataFrame,
    k: int,
    iters: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Run ``iters`` Lloyd iterations over ``points`` and return the
    final model long-form: one row per (cluster, dimension) —
    ``(cid, n_points, pos, c)`` where ``n_points`` is the size of the
    assignment that PRODUCED the final update and ``c`` the
    float32-quantized centroid component.

    Seeds: the ``k`` rows with the smallest ids, cluster ids 0..k-1
    in id order. Assignment: squared L2, quantized, ties to the
    lowest cid. Update: per-dimension mean, quantized; an empty
    cluster carries its previous centroid with n_points = 0.
    """
    if k < 1 or iters < 1:
        raise ValueError("kmeans_lloyd needs k >= 1 and iters >= 1")
    pts = points.select(
        F.col(id_col).alias("pid"),
        F.col(vec_col).cast("array<double>").alias("x"),
    )
    w = Window.orderBy("pid")
    centroids = (
        pts.orderBy("pid")
        .limit(k)
        .select(
            (F.row_number().over(w) - 1).cast("int").alias("cid"),
            F.col("x").alias("c"),
        )
        .localCheckpoint(eager=False)
    )
    sizes = None
    for _ in range(iters):
        d2 = gate_quantize(
            F.aggregate(
                F.zip_with(
                    F.col("x"),
                    F.col("c"),
                    lambda a, b: (a - b) * (a - b),
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
        )
        assigned = (
            pts.crossJoin(F.broadcast(centroids))
            .select(
                "pid",
                F.struct(
                    d2.alias("d2"), F.col("cid"), F.col("x")
                ).alias("s"),
            )
            .groupBy("pid")
            .agg(F.min("s").alias("s"))
            .select(F.col("s.cid").alias("cid"), F.col("s.x").alias("x"))
        )
        means = (
            assigned.select("cid", F.posexplode("x").alias("pos", "xi"))
            .groupBy("cid", "pos")
            .agg(gate_quantize(F.avg("xi")).alias("ci"))
            .groupBy("cid")
            .agg(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "ci"))
                    ),
                    lambda s: s.ci,
                ).alias("c_new")
            )
        )
        sizes = assigned.groupBy("cid").agg(
            F.count(F.lit(1)).alias("n_points")
        )
        centroids = (
            centroids.join(means, "cid", "left")
            .select(
                "cid",
                F.coalesce(F.col("c_new"), F.col("c")).alias("c"),
            )
            .localCheckpoint(eager=False)
        )
    return (
        centroids.join(sizes, "cid", "left")
        .select(
            "cid",
            F.coalesce(F.col("n_points"), F.lit(0)).cast("bigint")
            .alias("n_points"),
            F.posexplode("c").alias("pos", "c_val"),
        )
        .select("cid", "n_points", F.col("pos").cast("int"), "c_val")
    )
