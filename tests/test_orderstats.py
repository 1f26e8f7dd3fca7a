"""Order statistics on the scan (operators/orderstats.py): brute-force
Python cross-checks, closed-form identities, tie handling."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from big_data_for_smart_houses_spark.operators.orderstats import (
    gini_coefficient,
    ks_two_sample,
    weighted_quantiles,
)


def test_weighted_quantiles_bruteforce(spark):
    rng = random.Random(7)
    rows = [
        (i, rng.randint(0, 50) / 4.0, rng.randint(1, 9)) for i in range(400)
    ]
    df = spark.createDataFrame(rows, "id long, v double, wt long")
    qs = [(1, 4), (1, 2), (3, 4), (99, 100)]
    got = {
        (r.q_num, r.q_den): r.value
        for r in weighted_quantiles(
            df, "v", "wt", qs, id_col="id", num_partitions=6
        ).collect()
    }
    ordered = sorted(rows, key=lambda r: (r[1], r[0]))
    W = sum(r[2] for r in rows)
    for num, den in qs:
        cw = 0
        for _, v, wt in ordered:
            cw += wt
            if cw * den >= num * W:
                assert got[(num, den)] == v, (num, den)
                break


def test_weighted_quantiles_unit_weights_are_plain_quantiles(spark):
    df = spark.createDataFrame(
        [(i, float(i), 1) for i in range(100)], "id long, v double, wt long"
    )
    got = {
        (r.q_num, r.q_den): r.value
        for r in weighted_quantiles(
            df, "v", "wt", [(1, 2), (9, 10)], id_col="id"
        ).collect()
    }
    # lower quantile of 0..99 with unit weights: ceil(q*100)-1
    assert got[(1, 2)] == 49.0
    assert got[(9, 10)] == 89.0


def test_gini_extremes(spark):
    # perfect equality -> 0
    eq = spark.createDataFrame(
        [(i, 5) for i in range(50)], "id long, x long"
    )
    g0 = gini_coefficient(eq, "x", id_col="id").first()
    assert abs(g0.gini) < 1e-12
    assert g0.n_rows == 50 and g0.total_amount == 250
    # one holder of everything -> (n-1)/n
    one = spark.createDataFrame(
        [(0, 100)] + [(i, 0) for i in range(1, 10)], "id long, x long"
    )
    g1 = gini_coefficient(one, "x", id_col="id").first()
    assert abs(g1.gini - 9 / 10) < 1e-12


def test_gini_bruteforce(spark):
    rng = random.Random(11)
    xs = [rng.randint(0, 30) for _ in range(200)]
    df = spark.createDataFrame(
        [(i, x) for i, x in enumerate(xs)], "id long, x long"
    )
    got = gini_coefficient(df, "x", id_col="id").first().gini
    s = sorted(xs)
    n, tot = len(s), sum(s)
    want = 2 * sum((i + 1) * x for i, x in enumerate(s)) / (n * tot) - (
        n + 1
    ) / n
    assert abs(got - want) < 1e-12


def test_ks_bruteforce_with_ties(spark):
    rng = random.Random(3)
    a = [rng.randint(0, 20) / 2.0 for _ in range(150)]
    b = [rng.randint(5, 25) / 2.0 for _ in range(120)]  # shifted: big D
    rows = [(v, True) for v in a] + [(v, False) for v in b]
    df = spark.createDataFrame(rows, "v double, is_a boolean")
    r = ks_two_sample(df, "v", "is_a", num_partitions=5).first()
    na, nb = len(a), len(b)
    pts = sorted(set(a + b))
    want_num = max(
        abs(
            sum(1 for x in a if x <= t) * nb
            - sum(1 for x in b if x <= t) * na
        )
        for t in pts
    )
    assert r.n_a == na and r.n_b == nb
    assert r.d_num == want_num
    assert abs(r.d_stat - want_num / (na * nb)) < 1e-15


def test_ks_identical_samples_zero(spark):
    vals = [float(i % 7) for i in range(70)]
    rows = [(v, True) for v in vals] + [(v, False) for v in vals]
    df = spark.createDataFrame(rows, "v double, is_a boolean")
    r = ks_two_sample(df, "v", "is_a").first()
    assert r.d_num == 0 and r.d_stat == 0.0
