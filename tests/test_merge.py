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


def test_scd2_interval_chain(spark):
    """Three versions of one key: contiguous [from, to) intervals,
    exactly one open current version; a single-version key is current
    immediately."""
    from big_data_for_smart_houses_spark.operators.merge import scd2_intervals

    df = spark.createDataFrame(
        [(1, 101, 10, 5.0), (1, 102, 20, 6.0), (1, 103, 30, 7.0),
         (2, 201, 15, 9.0)],
        "k long, rid long, eff long, attr double",
    )
    out = scd2_intervals(df, ["k"], "eff", "rid").collect()
    k1 = sorted(
        ((r["valid_from"], r["valid_to"], r["is_current"])
         for r in out if r["k"] == 1)
    )
    assert k1 == [(10, 20, False), (20, 30, False), (30, None, True)]
    k2 = [(r["valid_from"], r["valid_to"], r["is_current"])
          for r in out if r["k"] == 2]
    assert k2 == [(15, None, True)]


def test_scd2_same_instant_versions_deterministic(spark):
    """Two changes with the same effective time: the tiebreak column
    orders them — the earlier tiebreak gets a zero-length interval,
    the later one carries forward."""
    from big_data_for_smart_houses_spark.operators.merge import scd2_intervals

    df = spark.createDataFrame(
        [(1, 101, 10), (1, 102, 10)], "k long, rid long, eff long"
    )
    out = {r["rid"]: (r["valid_from"], r["valid_to"], r["is_current"])
           for r in scd2_intervals(df, ["k"], "eff", "rid").collect()}
    assert out[101] == (10, 10, False)
    assert out[102] == (10, None, True)


def test_upsert_tiebreak_cols_totalize_batch_order(spark):
    """Two same-key update rows with equal order_col: without a
    tiebreak the winner is arbitrary; with tiebreak_cols the highest
    sequence id wins deterministically."""
    base = spark.createDataFrame(
        [(1, "old", 10, 0)], "k long, v string, ver long, seq long"
    )
    updates = spark.createDataFrame(
        [(1, "u-first", 20, 1), (1, "u-second", 20, 2)],
        "k long, v string, ver long, seq long",
    )
    out = merge_upsert(
        base, updates, ["k"], "ver", tiebreak_cols=["seq"]
    ).collect()
    assert len(out) == 1
    assert (out[0]["v"], out[0]["seq"]) == ("u-second", 2)


def test_snapshot_diff_classifies_and_is_null_safe(spark):
    from big_data_for_smart_houses_spark.operators.merge import snapshot_diff

    a = spark.createDataFrame(
        [(1, 10.0, "A"), (2, 20.0, None), (3, 30.0, "C"), (4, 40.0, "D")],
        "k long, price double, status string",
    )
    b = spark.createDataFrame(
        [
            (1, 10.0, "A"),      # unchanged
            (2, 20.0, "B"),      # NULL -> value: update
            (3, 30.0, None),     # value -> NULL: update
            (5, 50.0, "E"),      # insert
        ],                        # 4 missing: delete
        "k long, price double, status string",
    )
    got = {
        r.k: r.change_type
        for r in snapshot_diff(
            a, b, keys=["k"], compare_cols=["price", "status"]
        ).collect()
    }
    assert got == {2: "update", 3: "update", 4: "delete", 5: "insert"}
    full = snapshot_diff(
        a, b, keys=["k"], compare_cols=["price", "status"],
        include_unchanged=True,
    )
    assert {r.k: r.change_type for r in full.collect()}[1] == "unchanged"
    # delete rows carry the old image, inserts the new one
    rows = {r.k: r for r in full.collect()}
    assert rows[4].price_old == 40.0 and rows[4].price_new is None
    assert rows[5].price_new == 50.0 and rows[5].price_old is None


def test_snapshot_diff_rejects_empty_specs(spark):
    import pytest

    from big_data_for_smart_houses_spark.operators.merge import snapshot_diff

    df = spark.createDataFrame([(1, 2.0)], "k long, v double")
    with pytest.raises(ValueError):
        snapshot_diff(df, df, keys=[], compare_cols=["v"])
    with pytest.raises(ValueError):
        snapshot_diff(df, df, keys=["k"], compare_cols=[])


def test_incremental_join_delta_equals_recompute(spark):
    from big_data_for_smart_houses_spark.operators.merge import (
        incremental_join_delta,
    )

    a_old = spark.createDataFrame([(1, "a1"), (2, "a2")], "k long, av string")
    da = spark.createDataFrame([(2, "a3"), (3, "a4")], "k long, av string")
    b_old = spark.createDataFrame([(1, "b1"), (3, "b2")], "k long, bv string")
    db = spark.createDataFrame([(2, "b3")], "k long, bv string")

    maintained = (
        a_old.join(b_old, "k")
        .unionByName(incremental_join_delta(a_old, da, b_old, db, on=["k"]))
        .collect()
    )
    recomputed = (
        a_old.unionByName(da).join(b_old.unionByName(db), "k").collect()
    )
    assert sorted(map(tuple, maintained)) == sorted(map(tuple, recomputed))


def _aov_history(spark):
    from big_data_for_smart_houses_spark.operators.merge import (
        as_of_version,
    )

    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, s string, v double",
    )
    v1 = spark.createDataFrame(
        [
            (4, "d", 40.0, "insert"),
            (2, "b2", 21.0, "update"),
            (3, None, None, "delete"),
        ],
        "k long, s string, v double, change_type string",
    )
    v2 = spark.createDataFrame(
        [
            (1, None, None, "delete"),
            (3, "c2", 31.0, "update"),  # update AFTER delete
            (4, "d2", 41.0, "update"),
        ],
        "k long, s string, v double, change_type string",
    )
    return as_of_version, base, [v1, v2]


def test_as_of_version_each_version(spark):
    """as_of(0) is the base; as_of(1) applies one batch; as_of(2)
    shows update-after-delete re-materializing key 3."""
    aov, base, batches = _aov_history(spark)

    def state(v):
        return sorted(
            map(tuple, aov(base, batches, v, keys=["k"]).collect())
        )

    assert state(0) == [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)]
    assert state(1) == [(1, "a", 10.0), (2, "b2", 21.0), (4, "d", 40.0)]
    assert state(2) == [(2, "b2", 21.0), (3, "c2", 31.0), (4, "d2", 41.0)]


def test_as_of_version_matches_sequential_merge(spark):
    """The one-pass windowed reconstruction must equal the
    independently materialized state: each batch applied one at a
    time through merge_upsert + anti-join deletes."""
    from pyspark.sql import functions as F

    aov, base, batches = _aov_history(spark)
    state = base
    for b in batches:
        ups = b.filter(F.col("change_type") != "delete").drop(
            "change_type"
        )
        dels = b.filter(F.col("change_type") == "delete").select("k")
        # upserts win over current state; deletes remove — same
        # latest-wins semantics, built from different operators
        merged = (
            state.withColumn("_o", F.lit(0))
            .unionByName(ups.withColumn("_o", F.lit(1)))
        )
        from pyspark.sql.window import Window

        w = Window.partitionBy("k").orderBy(F.col("_o").desc())
        state = (
            merged.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn", "_o")
            .join(dels, "k", "left_anti")
        )
    seq = sorted(map(tuple, state.collect()))
    one_pass = sorted(
        map(tuple, aov(base, batches, 2, keys=["k"]).collect())
    )
    assert seq == one_pass


def test_as_of_version_bounds(spark):
    import pytest

    aov, base, batches = _aov_history(spark)
    with pytest.raises(ValueError):
        aov(base, batches, 3, keys=["k"])
    with pytest.raises(ValueError):
        aov(base, batches, -1, keys=["k"])


def test_expire_versions_preserves_later_states(spark):
    """Retention compaction: folding versions 0..k into a new base
    must leave every state >= k reconstructable and identical."""
    from big_data_for_smart_houses_spark.operators.merge import (
        expire_versions,
    )

    aov, base, batches = _aov_history(spark)
    new_base, rest = expire_versions(base, batches, 1, keys=["k"])
    assert len(rest) == 1

    def rows(df):
        return sorted(map(tuple, df.collect()))

    # as_of on compacted history == as_of on full history, for v=k..N
    assert rows(aov(new_base, rest, 0, keys=["k"])) == rows(
        aov(base, batches, 1, keys=["k"])
    )
    assert rows(aov(new_base, rest, 1, keys=["k"])) == rows(
        aov(base, batches, 2, keys=["k"])
    )


def test_reaggregate_rollup_navigation_equals_direct(spark):
    """Navigating a fine partial-aggregate table to a coarser grain
    must equal aggregating the raw rows directly at that grain —
    including min/max monoids — and the re-derived mean must equal
    the direct mean (NOT the mean of hourly means, which differs
    whenever group sizes differ)."""
    from pyspark.sql import functions as F

    from big_data_for_smart_houses_spark.operators.merge import (
        partial_aggregate,
        reaggregate_rollup,
    )

    rows = [
        # (day, hour, key, v): day 1 has skewed hour sizes so
        # avg-of-avgs would be wrong (hour 0: one row, hour 1: three)
        (1, 0, "a", 10),
        (1, 1, "a", 1),
        (1, 1, "a", 2),
        (1, 1, "a", 3),
        (2, 0, "a", 7),
        (1, 0, "b", -5),
    ]
    df = spark.createDataFrame(rows, ["day", "hour", "key", "v"])
    hourly = partial_aggregate(
        df, keys=["day", "hour", "key"], measures=["v"]
    ).join(
        df.groupBy("day", "hour", "key").agg(
            F.min("v").alias("v_min"), F.max("v").alias("v_max")
        ),
        ["day", "hour", "key"],
    )
    daily = reaggregate_rollup(
        hourly,
        coarse_keys=["day", "key"],
        sum_cols=["v"],
        min_cols=["v_min"],
        max_cols=["v_max"],
    )
    got = {
        (r.day, r.key): (r.v, r.v_min, r.v_max, r.n, r.v / r.n)
        for r in daily.collect()
    }
    assert got == {
        (1, "a"): (16, 1, 10, 4, 4.0),
        (2, "a"): (7, 7, 7, 1, 7.0),
        (1, "b"): (-5, -5, -5, 1, -5.0),
    }
    # the trap the operator exists to avoid: mean of hourly means
    # for (1, a) would be (10 + 2) / 2 = 6.0, not 4.0
    assert got[(1, "a")][4] == 4.0


def test_snapshot_diff_null_keys_classify_correctly(spark):
    """REGRESSION (round-8 advice): side presence was detected via
    keys[0] IS NOT NULL, so a NULL-key row never joined and an
    A-only NULL-key row misreported 'insert'. Literal presence
    markers + null-safe key join: A-only NULL key = delete, and a
    NULL key present in BOTH snapshots diffs as one row."""
    from big_data_for_smart_houses_spark.operators.merge import snapshot_diff

    a = spark.createDataFrame(
        [(None, 40.0), (1, 10.0)], "k long, price double"
    )
    b = spark.createDataFrame([(1, 10.0)], "k long, price double")
    got = {
        r.k: r.change_type
        for r in snapshot_diff(a, b, keys=["k"], compare_cols=["price"])
        .collect()
    }
    assert got == {None: "delete"}

    b2 = spark.createDataFrame(
        [(None, 45.0), (1, 10.0)], "k long, price double"
    )
    diff2 = snapshot_diff(a, b2, keys=["k"], compare_cols=["price"])
    rows = diff2.collect()
    assert len(rows) == 1
    assert rows[0].k is None and rows[0].change_type == "update"
    assert rows[0].price_old == 40.0 and rows[0].price_new == 45.0
