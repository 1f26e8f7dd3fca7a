"""Declarative expectations operator (operators/expectations.py):
null-is-violation contract, quarantine split, single-pass report."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_for_smart_houses_spark.operators.expectations import (
    apply_expectations,
    expectations_report,
    split_on_expectations,
)


def _df(spark):
    return spark.createDataFrame(
        [
            (1, 10.0, "click"),
            (2, -5.0, "click"),       # fails value_nonneg
            (3, None, "view"),        # NULL rule result -> violation
            (4, 7.0, "weird"),        # fails known_type
        ],
        "id long, value double, etype string",
    )


def _rules():
    # built lazily: Column construction needs an active session
    return {
        "value_nonneg": F.col("value") >= 0,  # NULL for row 3
        "known_type": F.col("etype").isin("click", "view"),
    }


def test_null_rule_result_is_a_violation(spark):
    """ANSI three-valued logic must not smuggle NULL rows past a
    filter: a rule evaluating to NULL counts as violated."""
    flagged = {
        r.id: sorted(r._violations)
        for r in apply_expectations(_df(spark), _rules()).collect()
    }
    assert flagged == {
        1: [],
        2: ["value_nonneg"],
        3: ["value_nonneg"],
        4: ["known_type"],
    }


def test_split_partitions_rows_exactly(spark):
    clean, bad = split_on_expectations(_df(spark), _rules())
    assert [r.id for r in clean.collect()] == [1]
    assert "_violations" not in clean.columns
    assert sorted(r.id for r in bad.collect()) == [2, 3, 4]


def test_report_counts_and_pass_rate(spark):
    rep = {
        r.rule: (r.n_rows, r.n_violations, r.pass_rate)
        for r in expectations_report(_df(spark), _rules()).collect()
    }
    assert rep["value_nonneg"] == (4, 2, 0.5)
    assert rep["known_type"] == (4, 1, 0.75)


def test_empty_input_pass_rate_is_defined(spark):
    """0-row input: pass_rate must be a defined 1.0 (vacuous pass),
    never a NULL from 0/0 — report consumers threshold on it."""
    empty = _df(spark).filter(F.lit(False))
    rep = {
        r.rule: (r.n_rows, r.n_violations, r.pass_rate)
        for r in expectations_report(empty, _rules()).collect()
    }
    assert rep["value_nonneg"] == (0, 0, 1.0)
    assert rep["known_type"] == (0, 0, 1.0)


def test_empty_rules_dict_is_typed(spark):
    """Zero rules: _violations is a typed empty array<string> (not
    void), the split sends everything to clean, and the report is
    zero rows with the contract schema."""
    flagged = apply_expectations(_df(spark), {})
    assert dict(flagged.dtypes)["_violations"] == "array<string>"
    assert all(r._violations == [] for r in flagged.collect())
    clean, bad = split_on_expectations(_df(spark), {})
    assert clean.count() == 4 and bad.count() == 0
    rep = expectations_report(_df(spark), {})
    assert rep.columns == ["rule", "n_rows", "n_violations", "pass_rate"]
    assert rep.count() == 0
