"""Schema-drift conformance: missing/extra/type-drifted batches all
project onto the target schema without task failures."""

from __future__ import annotations

import pytest
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from big_data_for_smart_houses_spark.sources.conform import (
    conform_to_schema,
    drift_report,
)

TARGET = StructType(
    [
        StructField("id", LongType()),
        StructField("name", StringType()),
        StructField("score", DoubleType()),
    ]
)


def test_conform_missing_column_becomes_typed_null(spark):
    df = spark.createDataFrame([(1, "a")], "id long, name string")
    out = conform_to_schema(df, TARGET)
    assert out.schema == TARGET
    row = out.collect()[0]
    assert (row["id"], row["name"], row["score"]) == (1, "a", None)


def test_conform_type_drift_try_casts(spark):
    """A producer shipping score as string: numeric strings coerce,
    garbage nulls — never a task failure."""
    df = spark.createDataFrame(
        [(1, "a", "3.5"), (2, "b", "oops")], "id long, name string, score string"
    )
    rows = conform_to_schema(df, TARGET).orderBy("id").collect()
    assert rows[0]["score"] == 3.5
    assert rows[1]["score"] is None


def test_conform_drops_extras_and_orders_columns(spark):
    df = spark.createDataFrame(
        [("a", 9.0, 1, "noise")], "name string, score double, id long, junk string"
    )
    out = conform_to_schema(df, TARGET)
    assert out.columns == ["id", "name", "score"]


def test_conform_strict_extras_raises(spark):
    df = spark.createDataFrame([(1, "a", 1.0, "x")],
                               "id long, name string, score double, junk string")
    with pytest.raises(ValueError, match="junk"):
        conform_to_schema(df, TARGET, strict_extras=True)


def test_drift_report(spark):
    df = spark.createDataFrame(
        [("a", "1.0", "x")], "name string, score string, junk string"
    )
    rep = drift_report(df, TARGET)
    assert rep == {
        "missing": ["id"],
        "type_drift": ["score"],
        "extra": ["junk"],
    }


def test_conform_is_shuffle_free(spark):
    df = spark.createDataFrame([(1, "a")], "id long, name string")
    plan = (
        conform_to_schema(df, TARGET)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan


def test_synthetic_source_partition_invariant(spark):
    """The custom Python data source must yield the SAME rows under
    any partition count — the determinism that makes speculative
    retries safe (no shared RNG state to diverge)."""
    from big_data_for_smart_houses_spark.sources.synthetic import register

    register(spark)

    def rows(parts):
        return sorted(
            map(
                tuple,
                spark.read.format("synthetic_telemetry")
                .option("n", "200")
                .option("partitions", str(parts))
                .load()
                .collect(),
            )
        )

    assert rows(1) == rows(7)
    df = (
        spark.read.format("synthetic_telemetry")
        .option("n", "100")
        .option("partitions", "5")
        .load()
    )
    assert df.rdd.getNumPartitions() == 5
