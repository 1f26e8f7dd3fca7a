"""Skew-mitigation operator tests: salted join and two-phase agg must
be result-identical to their plain equivalents, and the salted join
must actually spread a hot key across shuffle partitions."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_for_smart_houses_spark.operators.skew import (
    salted_join,
    two_phase_agg,
)


def _skewed_fact(spark):
    # 90% of rows share key 0 — the power-law hot key
    return spark.range(2000).select(
        F.when(F.col("id") % 10 < 9, F.lit(0))
        .otherwise(F.col("id") % 50)
        .alias("k"),
        (F.col("id") * 1.5).alias("v"),
    )


def _dim(spark):
    return spark.range(50).select(
        F.col("id").alias("k"), F.concat(F.lit("name_"), F.col("id")).alias("name")
    )


def test_salted_join_matches_plain_join(spark):
    fact, dim = _skewed_fact(spark), _dim(spark)
    plain = fact.join(dim, "k").groupBy("k", "name").agg(
        F.sum("v").alias("sv"), F.count(F.lit(1)).alias("n")
    )
    salted = salted_join(fact, dim, on="k").groupBy("k", "name").agg(
        F.sum("v").alias("sv"), F.count(F.lit(1)).alias("n")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_salted_join_spreads_hot_key(spark):
    fact, dim = _skewed_fact(spark), _dim(spark)
    joined = salted_join(fact, dim, on="k", n_buckets=8)
    # rows of the hot key must land in >1 partition after the join shuffle
    parts = (
        joined.filter(F.col("k") == 0)
        .select(F.spark_partition_id().alias("pid"))
        .distinct()
        .count()
    )
    assert parts > 1


def test_two_phase_agg_matches_plain_agg(spark):
    fact = _skewed_fact(spark)
    plain = {
        r.k: (r.n, r.sv)
        for r in fact.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"))
        .collect()
    }
    two = {
        r.k: (r.n_rows, r.sum_v)
        for r in two_phase_agg(fact, keys=["k"], sum_cols=["v"]).collect()
    }
    assert plain.keys() == two.keys()
    for k in plain:
        assert plain[k][0] == two[k][0]
        assert abs(plain[k][1] - two[k][1]) < 1e-6 * max(1.0, abs(plain[k][1]))
