"""Declarative data-quality expectations — the DLT/dbt-test analog on
plain DataFrames (SURVEY.md §2.2's validation family generalized).

The reference hand-rolls one validator per field inline in its
consumer loop (consumer/ingest_bronze.py:67-103); production
pipelines want the rules DECLARED once and applied uniformly:

    rules = {
        "value_nonneg":   F.col("value") >= 0,
        "known_type":     F.col("event_type").isin(list_of_types),
        "ts_present":     F.col("ts").isNotNull(),
    }
    flagged = apply_expectations(df, rules)          # adds _violations
    good, bad = split_on_expectations(df, rules)     # quarantine split
    report = expectations_report(df, rules)          # per-rule counts

Scale shape: each rule is one boolean codegen expression evaluated in
the same scan pass — N rules cost zero extra scans and zero shuffles
(`_violations` is an array literal of failed rule names). The report
is a single global aggregate (one COUNT per rule, map-side partial).
A null rule result counts as a VIOLATION (ANSI three-valued logic
must not smuggle bad rows past a filter).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

VIOLATIONS_COL = "_violations"


def _passed(rule: Column) -> Column:
    # null-safe: a rule evaluating to NULL is a failure, not a pass
    return F.coalesce(rule.cast("boolean"), F.lit(False))


def apply_expectations(
    df: DataFrame, rules: dict[str, Column]
) -> DataFrame:
    """Annotate each row with the array of violated rule names
    (empty array = clean row). Pure row-local codegen."""
    if not rules:
        # F.array() with zero elements is array<void>; downstream
        # size()/filter consumers need a typed empty string array.
        viols = F.lit([]).cast("array<string>")
    else:
        viols = F.array_compact(
            F.array(
                *[
                    F.when(~_passed(rule), F.lit(name))
                    for name, rule in rules.items()
                ]
            )
        )
    return df.withColumn(VIOLATIONS_COL, viols)


def split_on_expectations(
    df: DataFrame, rules: dict[str, Column]
) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantined) — quarantined rows keep their violation
    list for triage; clean rows drop the bookkeeping column."""
    flagged = apply_expectations(df, rules)
    clean = flagged.filter(F.size(VIOLATIONS_COL) == 0).drop(
        VIOLATIONS_COL
    )
    bad = flagged.filter(F.size(VIOLATIONS_COL) > 0)
    return clean, bad


def expectations_report(
    df: DataFrame, rules: dict[str, Column]
) -> DataFrame:
    """One row per rule: evaluated / violated counts and the pass
    rate — a single aggregate pass over the data (every count is a
    conditional sum in the same partial agg)."""
    if not rules:
        # zero rules → zero report rows, with the contract schema
        # (exploding an empty F.array() would produce void columns)
        return df.sparkSession.createDataFrame(
            [],
            "rule string, n_rows bigint, n_violations bigint, "
            "pass_rate double",
        )
    aggs = []
    for name, rule in rules.items():
        aggs.append(
            # coalesce: SUM over zero rows is NULL, counts must be 0
            F.coalesce(
                F.sum((~_passed(rule)).cast("bigint")), F.lit(0)
            ).alias(f"_v_{name}")
        )
    totals = df.agg(F.count(F.lit(1)).alias("_n"), *aggs)
    per_rule = totals.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("rule"),
                        F.col("_n").alias("n_rows"),
                        F.col(f"_v_{name}").alias("n_violations"),
                    )
                    for name in rules
                ]
            )
        ).alias("r")
    ).select("r.rule", "r.n_rows", "r.n_violations")
    return per_rule.withColumn(
        "pass_rate",
        # Empty input: every rule vacuously passes (1.0), never NULL
        # from a 0/0 — a report consumer thresholding pass_rate must
        # see a defined value.
        F.when(
            F.col("n_rows") > 0,
            (F.col("n_rows") - F.col("n_violations"))
            / F.col("n_rows"),
        ).otherwise(F.lit(1.0)),
    )
