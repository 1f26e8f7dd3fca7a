"""Bucketed co-located join: the join of two tables bucketed on the
same key must plan with ZERO exchanges (the scale story for repeated
fact-fact joins)."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_for_smart_houses_spark.sources.bucketing import (
    read_bucketed,
    write_bucketed,
)


def test_bucketed_join_has_no_exchange(spark):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").select(
        "l_orderkey", "l_extendedprice", "l_quantity"
    )
    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    write_bucketed(li, "li_bucketed", "l_orderkey", n_buckets=8)
    write_bucketed(
        o.withColumnRenamed("o_orderkey", "l_orderkey"),
        "o_bucketed",
        "l_orderkey",
        n_buckets=8,
    )
    a = read_bucketed(spark, "li_bucketed")
    b = read_bucketed(spark, "o_bucketed")
    # disable broadcast so the test exercises the co-located SMJ path
    # (at real scale neither side broadcasts anyway)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, "l_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
        # and it is not just a plan artifact — the join actually works
        n = joined.count()
        assert n == li.count()  # every lineitem has its order
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS li_bucketed")
        spark.sql("DROP TABLE IF EXISTS o_bucketed")
