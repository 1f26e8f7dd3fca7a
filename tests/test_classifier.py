"""Focused tests for the round-14 training-loop optimization in
extensions/classifier.py: small models are inlined into the margin
expression as a map literal (zero exchanges per GD iteration) instead
of the explode -> broadcast-join -> keyed-agg plan. The two paths must
agree — the inline fold adds weights in array order where the join
path summed in partition order, so agreement is asserted to float
tolerance on margins and EXACTLY on the trained model's predictions
(the planted gate corpus has margins ~0.4, far above any sum-order
ulp)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_for_smart_houses_spark.extensions import classifier as C


@pytest.fixture(scope="module")
def feats(spark):
    rows = [
        (i, f"tok{i % 7} tok{(i * 3) % 11} tok{(i * 5) % 13} common")
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    f = C.hashed_token_features(df, dim=32)
    y = (F.col("doc_id") % 3 == 0).cast("int")
    # planted separable indicator outside the hash range, as the gate
    return f.withColumn("y", y).withColumn(
        "f_idx",
        F.concat(
            F.col("f_idx"),
            F.array(
                F.when(F.col("y") == 1, F.lit(32))
                .otherwise(F.lit(33))
                .cast("long")
            ),
        ),
    )


def test_inline_margin_matches_join_margins(spark, feats):
    """_inline_margin == _margins on the same model, incl. indices the
    model does not know (contribute 0) and the empty model."""
    for w_now, bias in [
        ({}, 0.0),
        ({0: 0.5, 3: -0.25, 33: 1.0}, -0.125),
        ({i: 0.01 * (i - 16) for i in range(34)}, 0.375),
    ]:
        weights = spark.createDataFrame(
            [(int(k), float(v)) for k, v in w_now.items()],
            "idx long, w double",
        )
        base = feats.select(
            "doc_id", "f_idx", F.col("y").cast("double").alias("_y")
        )
        j = C._margins(base, weights, "doc_id", "f_idx", bias)
        i = base.select(
            "doc_id",
            C._inline_margin("f_idx", w_now, bias).alias("z"),
        )
        got = {
            r.doc_id: r.z
            for r in i.collect()
        }
        want = {r.doc_id: r.z for r in j.collect()}
        assert set(got) == set(want)
        for k in want:
            assert got[k] == pytest.approx(want[k], abs=1e-12), (
                k, got[k], want[k],
            )


def test_inline_margin_null_array_scores_bias(spark):
    """A NULL feature array scores bias alone — parity with
    _margins' explode_outer behavior."""
    df = spark.createDataFrame(
        [(1, None)], "doc_id long, f_idx array<long>"
    )
    row = df.select(
        C._inline_margin("f_idx", {0: 1.0}, 0.75).alias("z")
    ).collect()[0]
    assert row.z == 0.75


def test_train_inline_and_join_paths_agree(spark, feats, monkeypatch):
    """The trained model's predictions are identical whichever margin
    path the loop used (INLINE_MODEL_MAX=-1 forces the join path)."""
    w_i, b_i = C.train_logreg_hashed(
        feats, "doc_id", "f_idx", "y", iters=4, lr=0.5
    )
    monkeypatch.setattr(C, "INLINE_MODEL_MAX", -1)
    w_j, b_j = C.train_logreg_hashed(
        feats, "doc_id", "f_idx", "y", iters=4, lr=0.5
    )
    assert b_i == pytest.approx(b_j, abs=1e-9)
    pi = {
        r.doc_id: (r.y_pred, round(r.z, 6))
        for r in C.predict_logreg(
            feats, w_i, "doc_id", "f_idx", b_i
        ).collect()
    }
    pj = {
        r.doc_id: (r.y_pred, round(r.z, 6))
        for r in C.predict_logreg(
            feats, w_j, "doc_id", "f_idx", b_j
        ).collect()
    }
    assert pi == pj
