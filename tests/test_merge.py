"""Unit semantics for MERGE/upsert and mergeable partial aggregates."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_for_smart_houses_spark.operators.merge import (
    finalize_means,
    merge_partial_aggs,
    merge_upsert,
    partial_aggregate,
)


def test_upsert_insert_update_and_untouched(spark):
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 10), (3, "c", 10)], "k long, v string, ver long"
    )
    updates = spark.createDataFrame(
        [(2, "B", 20), (4, "d", 20)], "k long, v string, ver long"
    )
    out = {
        r["k"]: (r["v"], r["ver"])
        for r in merge_upsert(base, updates, ["k"], "ver").collect()
    }
    assert out == {
        1: ("a", 10),  # untouched
        2: ("B", 20),  # updated
        3: ("c", 10),  # untouched
        4: ("d", 20),  # inserted
    }


def test_upsert_tie_goes_to_update(spark):
    base = spark.createDataFrame([(1, "old", 10)], "k long, v string, ver long")
    updates = spark.createDataFrame(
        [(1, "new", 10)], "k long, v string, ver long"
    )
    out = merge_upsert(base, updates, ["k"], "ver").collect()
    assert out[0]["v"] == "new"


def test_upsert_stale_update_loses(spark):
    """An update OLDER than the base row must not regress the row —
    the out-of-order CDC replay case."""
    base = spark.createDataFrame([(1, "cur", 20)], "k long, v string, ver long")
    updates = spark.createDataFrame(
        [(1, "stale", 10)], "k long, v string, ver long"
    )
    out = merge_upsert(base, updates, ["k"], "ver").collect()
    assert out[0]["v"] == "cur"


def test_partial_aggs_merge_equals_full_recompute(spark):
    df = spark.range(1000).select(
        (F.col("id") % 13).alias("k"),
        (F.col("id") % 7).cast("double").alias("x"),
    )
    half_a = partial_aggregate(df.filter("id < 500"), ["k"], ["x"])
    half_b = partial_aggregate(df.filter("id >= 500"), ["k"], ["x"])
    merged = finalize_means(
        merge_partial_aggs(half_a, half_b, ["k"], ["x"]), ["x"]
    )
    full = finalize_means(partial_aggregate(df, ["k"], ["x"]), ["x"])
    got = {r["k"]: (r["x"], r["n"], r["avg_x"]) for r in merged.collect()}
    want = {r["k"]: (r["x"], r["n"], r["avg_x"]) for r in full.collect()}
    assert set(got) == set(want)
    for k in want:
        assert got[k][1] == want[k][1]
        assert abs(got[k][0] - want[k][0]) < 1e-9
        assert abs(got[k][2] - want[k][2]) < 1e-9


def test_partial_aggs_absorb_empty_delta(spark):
    df = spark.range(100).select(
        (F.col("id") % 3).alias("k"), F.lit(1.0).alias("x")
    )
    state = partial_aggregate(df, ["k"], ["x"])
    empty = partial_aggregate(df.filter("id < 0"), ["k"], ["x"])
    merged = merge_partial_aggs(state, empty, ["k"], ["x"])
    assert sorted(r["n"] for r in merged.collect()) == sorted(
        r["n"] for r in state.collect()
    )
