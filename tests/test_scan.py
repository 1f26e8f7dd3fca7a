"""Distributed prefix scan (operators/scan.py): exactness vs the
single-reducer window, partition-count independence, half-open
sweep-line semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from big_data_for_smart_houses_spark.operators.scan import (
    global_row_number,
    global_running_agg,
    global_running_sum,
    skyline_2d,
    sweepline_concurrency,
)


def _rows(n, spark):
    # keys deliberately NOT in insertion order; values small ints
    return spark.createDataFrame(
        [(int((i * 7) % n), int(i % 5)) for i in range(n)],
        "k long, v long",
    )


def test_running_sum_matches_naive_window(spark):
    df = _rows(500, spark)
    got = {
        (r.k, r.running)
        for r in global_running_sum(
            df, ["k"], "v", num_partitions=8
        ).collect()
    }
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    want = {
        (r.k, r.running)
        for r in df.withColumn("running", F.sum("v").over(w)).collect()
    }
    assert got == want


def test_running_sum_partition_count_invariant(spark):
    """Output must not depend on where range boundaries land."""
    df = _rows(300, spark)
    a = sorted(
        (r.k, r.running)
        for r in global_running_sum(df, ["k"], "v", num_partitions=2).collect()
    )
    b = sorted(
        (r.k, r.running)
        for r in global_running_sum(
            df, ["k"], "v", num_partitions=17
        ).collect()
    )
    assert a == b


def test_exclusive_prefix_first_row_is_null(spark):
    """Round-10 semantics fix: an aggregate over an EMPTY (or
    all-NULL) prefix is NULL, matching SUM(x) OVER (ORDER BY ...
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) — the old
    behavior fabricated a 0. global_row_number coalesces at its own
    call site to keep its documented 0-based contract."""
    df = _rows(100, spark)
    out = global_running_sum(
        df, ["k"], "v", num_partitions=4, inclusive=False
    )
    first = out.orderBy("k").first()
    assert first.running is None


def test_running_sum_leading_nulls_match_sql_window(spark):
    """Leading NULL values: the scan must agree with the SQL window
    exactly — NULL while no non-null contribution exists, then the
    plain sums — for both inclusive and exclusive frames."""
    df = spark.createDataFrame(
        [(1, None), (2, None), (3, 5), (4, None), (5, 2)],
        "k long, v long",
    )
    df.createOrReplaceTempView("_lead_nulls")
    for inclusive, frame_end in ((True, "CURRENT ROW"),
                                 (False, "1 PRECEDING")):
        got = {
            r.k: r.running
            for r in global_running_sum(
                df, ["k"], "v", num_partitions=3,
                inclusive=inclusive,
            ).collect()
        }
        want = {
            r.k: r.w
            for r in df.sparkSession.sql(
                "SELECT k, SUM(v) OVER (ORDER BY k ROWS BETWEEN "
                f"UNBOUNDED PRECEDING AND {frame_end}) AS w "
                "FROM _lead_nulls"
            ).collect()
        }
        assert got == want, (inclusive, got, want)


def test_row_number_dense_zero_based(spark):
    df = _rows(257, spark)
    nums = sorted(
        r.rownum
        for r in global_row_number(df, ["k"], num_partitions=9).collect()
    )
    assert nums == list(range(257))


def test_requires_order(spark):
    df = _rows(10, spark)
    with pytest.raises(ValueError):
        global_running_sum(df, [], "v")


def test_sweepline_half_open_touch(spark):
    """[0,10) and [10,20) touch but never overlap: concurrency must
    never exceed 1, and the -1 boundary sorts before the +1 at t=10."""
    iv = spark.createDataFrame(
        [(1, 0, 10), (2, 10, 20)],
        "event_id long, start_ts long, end_ts long",
    )
    pts = sweepline_concurrency(iv, "start_ts", "end_ts").collect()
    assert max(p.concurrency for p in pts) == 1
    assert min(p.concurrency for p in pts) == 0
    at_10 = sorted(
        (p.delta, p.concurrency) for p in pts if p.t == 10
    )
    # end applies first (conc 1->0), then the next start (0->1)
    assert at_10 == [(-1, 0), (1, 1)]


def test_sweepline_nested_intervals(spark):
    iv = spark.createDataFrame(
        [(1, 0, 100), (2, 10, 20), (3, 15, 30)],
        "event_id long, start_ts long, end_ts long",
    )
    pts = sweepline_concurrency(iv, "start_ts", "end_ts")
    assert pts.agg(F.max("concurrency")).first()[0] == 3
    # conservation: final running value returns to zero
    last = pts.orderBy(F.desc("t"), F.desc("delta"), F.desc("id")).first()
    assert last.concurrency == 0


def test_running_min_max_match_naive(spark):
    df = _rows(400, spark)
    for agg, fn in (("min", F.min), ("max", F.max)):
        got = sorted(
            (r.k, r.running)
            for r in global_running_agg(
                df, ["k"], "v", agg=agg, num_partitions=7
            ).collect()
        )
        w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
        want = sorted(
            (r.k, r.running)
            for r in df.withColumn("running", fn("v").over(w)).collect()
        )
        assert got == want, agg


def test_running_min_exclusive_first_is_null(spark):
    df = _rows(50, spark)
    first = (
        global_running_agg(
            df, ["k"], "v", agg="min", num_partitions=4, inclusive=False
        )
        .orderBy("k")
        .first()
    )
    assert first.running is None


def test_running_agg_rejects_unknown(spark):
    df = _rows(10, spark)
    with pytest.raises(ValueError):
        global_running_agg(df, ["k"], "v", agg="median")


def test_skyline_matches_bruteforce(spark):
    """Sort-based skyline == the NOT EXISTS definition, on a point set
    with duplicates, dominance ties on each axis, and a single
    all-dominating point scenario."""
    import random

    rng = random.Random(42)
    pts = [(rng.randint(0, 30), rng.randint(0, 30)) for _ in range(300)]
    pts += pts[:20]  # duplicates
    df = spark.createDataFrame(pts, "x long, y long")
    got = {
        (r.x, r.y)
        for r in skyline_2d(df, "x", "y", num_partitions=5).collect()
    }
    uniq = set(pts)
    want = {
        (x, y)
        for (x, y) in uniq
        if not any(
            qx <= x and qy >= y and (qx < x or qy > y) for (qx, qy) in uniq
        )
    }
    assert got == want
    # frontier sanity: strictly increasing y along increasing x
    sky = sorted(want)
    assert all(a[1] < b[1] for a, b in zip(sky, sky[1:]))


def test_skyline_single_dominator(spark):
    df = spark.createDataFrame(
        [(0, 100), (1, 99), (5, 5), (0, 100)], "x long, y long"
    )
    got = {(r.x, r.y) for r in skyline_2d(df, "x", "y").collect()}
    assert got == {(0, 100)}


def test_trailing_window_distinct_bruteforce(spark):
    """Fan-out WAU == the definition computed in Python, including a
    user active on multiple days inside one window (counted once)."""
    import datetime as dt

    from big_data_for_smart_houses_spark.operators.windows import (
        trailing_window_distinct,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # user 1 active days 0,1,2; user 2 day 0 only; user 3 days 5,9
    for d, u in [(0, 1), (1, 1), (2, 1), (0, 2), (5, 3), (9, 3)]:
        # two raw events per active pair: dedup must collapse them
        rows.append((t0 + dt.timedelta(days=d, hours=1), u))
        rows.append((t0 + dt.timedelta(days=d, hours=2), u))
    df = spark.createDataFrame(rows, "ts timestamp, user_id long")
    got = {
        str(r.w_day): (r.dau, r.wau)
        for r in trailing_window_distinct(df, "ts", "user_id", 7).collect()
    }
    active = {(0, 1), (1, 1), (2, 1), (0, 2), (5, 3), (9, 3)}
    days = sorted({d for d, _ in active})
    want = {}
    for d in days:
        dau = len({u for (ad, u) in active if ad == d})
        wau = len({u for (ad, u) in active if d - 6 <= ad <= d})
        want[str((t0 + dt.timedelta(days=d)).date())] = (dau, wau)
    assert got == want
    # the interesting values: day 2 window holds users 1,2; day 9
    # window holds only user 3 (day-5 activity is 4 days back -> in)
    assert got[str((t0 + dt.timedelta(days=2)).date())] == (1, 2)
    assert got[str((t0 + dt.timedelta(days=9)).date())] == (1, 1)


def test_global_ntile_matches_window(spark):
    """global_ntile == NTILE() OVER for n%B != 0 (uneven buckets) and
    n < B (every row its own bucket, no div-by-zero)."""
    from big_data_for_smart_houses_spark.operators.scan import global_ntile

    # 103 rows, 8 buckets: first 103%8=7 buckets get 13 rows, last 12
    df = _rows(103, spark)
    got = {
        r.k: r.bucket
        for r in global_ntile(df, ["k"], 8, num_partitions=5).collect()
    }
    w = Window.orderBy("k")
    want = {
        r.k: r.nt
        for r in df.withColumn("nt", F.ntile(8).over(w)).collect()
    }
    assert got == want
    sizes = sorted(
        [list(got.values()).count(b) for b in set(got.values())],
        reverse=True,
    )
    assert sizes == [13] * 7 + [12]

    # n < B: 3 rows into 10 buckets -> buckets 1,2,3
    small = _rows(3, spark)
    got_small = sorted(
        r.bucket for r in global_ntile(small, ["k"], 10).collect()
    )
    assert got_small == [1, 2, 3]

    import pytest as _pytest

    with _pytest.raises(ValueError):
        global_ntile(df, ["k"], 0)


def test_scan_carried_columns_all_partition_counts(spark):
    """REGRESSION (round 7): a carried column beyond (order, value)
    used to break ReuseExchange between the scan's two branches —
    RangePartitioner seeds its boundary sample with the RDD id, so
    unreused twin exchanges pick different boundaries and the scan
    silently corrupts. The minimal-projection + join-back fix must
    hold at every partition count, including chained scans."""
    import itertools

    rows = [(float(i % 97) + i * 0.001, 1, 2, "x") for i in range(2000)]
    df = spark.createDataFrame(rows, "v double, a long, b long, c string")
    ta = list(itertools.accumulate([1] * 2000))
    tb = list(itertools.accumulate([2] * 2000))
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for parts in ("3", "11", "32"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            chained = global_running_sum(
                global_running_sum(df, ["v"], F.col("a"), out_col="ca"),
                ["v"],
                F.col("b"),
                out_col="cb",
            )
            out = sorted((r.v, r.ca, r.cb) for r in chained.collect())
            assert all(
                r[1] == ta[i] and r[2] == tb[i] for i, r in enumerate(out)
            ), f"scan corrupt at shuffle.partitions={parts}"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def test_skyline_nd_matches_bruteforce_3d(spark):
    import random

    from big_data_for_smart_houses_spark.operators.scan import skyline_nd

    rng = random.Random(19)
    pts = [
        (rng.randint(0, 12), rng.randint(0, 12), rng.randint(0, 12))
        for _ in range(400)
    ]
    df = spark.createDataFrame(pts, "x long, y long, z long")
    got = {
        (r.x, r.y, r.z)
        for r in skyline_nd(
            df, minimize_cols=["x"], maximize_cols=["y", "z"]
        ).collect()
    }
    uniq = set(pts)
    want = {
        p
        for p in uniq
        if not any(
            q[0] <= p[0]
            and q[1] >= p[1]
            and q[2] >= p[2]
            and (q[0] < p[0] or q[1] > p[1] or q[2] > p[2])
            for q in uniq
        )
    }
    assert got == want and len(got) > 0


def test_skyline_nd_2d_consistent_with_sort_based(spark):
    import random

    from big_data_for_smart_houses_spark.operators.scan import (
        skyline_2d,
        skyline_nd,
    )

    rng = random.Random(23)
    pts = [(rng.randint(0, 40), rng.randint(0, 40)) for _ in range(300)]
    df = spark.createDataFrame(pts, "x long, y long")
    a = {
        (r.x, r.y)
        for r in skyline_nd(
            df, minimize_cols=["x"], maximize_cols=["y"]
        ).collect()
    }
    b = {(r.x, r.y) for r in skyline_2d(df, "x", "y").collect()}
    assert a == b


def test_skyline_nd_frontier_cap_raises(spark):
    import pytest as _pytest

    from big_data_for_smart_houses_spark.operators.scan import skyline_nd

    # perfectly anti-correlated: every point is on the frontier
    pts = [(i, -i) for i in range(50)]
    df = spark.createDataFrame(pts, "x long, y long")
    with _pytest.raises(ValueError, match="max_frontier"):
        skyline_nd(
            df, minimize_cols=["x", "y"], max_frontier=10
        )
    with _pytest.raises(ValueError):
        skyline_nd(df, minimize_cols=[], maximize_cols=[])


def test_running_agg_preserves_null_order_keys(spark):
    """REGRESSION (round-8 advice): the carried-column join-back used
    a plain equi-join on the order key, silently dropping rows whose
    key is NULL — the scan computes them, the join-back lost them.
    Null-safe keys must keep every row (NULLS FIRST under the
    window's default ascending order)."""
    df = spark.createDataFrame(
        [(None, 1, "a"), (2.0, 10, "b"), (5.0, 100, "c")],
        "v double, x long, c string",
    )
    out = {
        (r.v, r.c): r.run
        for r in global_running_sum(
            df, ["v"], F.col("x"), out_col="run"
        ).collect()
    }
    assert len(out) == 3, "NULL-key row dropped by the join-back"
    # NULLS FIRST: the NULL row is the first prefix
    assert out[(None, "a")] == 1
    assert out[(2.0, "b")] == 11
    assert out[(5.0, "c")] == 111


def test_skyline_nd_merge_pass_shuffles_not_coalesces(spark):
    """REGRESSION (round-8 advice): phase 2 must repartition(1) — a
    coalesce(1) is a narrow dependency that fuses phase 1's
    per-partition local skylines into ONE task, defeating the
    documented parallelism. The bounded survivor set shuffles; the
    distinct+local stage must not collapse."""
    from big_data_for_smart_houses_spark.operators.scan import skyline_nd

    df = spark.createDataFrame(
        [(float(i % 13), float((i * 7) % 11), float(i % 5)) for i in range(200)],
        "x double, y double, z double",
    )
    sky = skyline_nd(df, ["x", "y", "z"])
    plan = sky._jdf.queryExecution().executedPlan().toString()
    assert "Coalesce" not in plan, plan
    sky.collect()
