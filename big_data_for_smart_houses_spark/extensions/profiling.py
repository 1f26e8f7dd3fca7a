"""Single-pass table profiler (the ANALYZE-TABLE surface a curation
pipeline runs before and after every transform to catch schema drift,
null storms, and cardinality surprises).

One scan, one aggregate: every column's metrics are computed in the
same agg (Spark expands the multi-distinct into one Expand + two
aggregates — still a single pass over the data), then the wide 1-row
result is exploded into the long (column, metric...) layout. Never one
job per column: at 100 TB each extra pass is the dominant cost.

min/max are compared AFTER a cast to string on both engines (binary
byte order), so one profiler contract covers every input type — the
profile is for drift detection, not numeric stats, which belong to the
typed operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, columns: list[str]) -> DataFrame:
    """Long-format profile of ``columns``: row count, null count,
    exact distinct count, and string-ordered min/max per column —
    all exact integers/strings, engine-exact by construction."""
    if not columns:
        raise ValueError("profile_columns needs at least one column")
    aggs = [F.count(F.lit(1)).alias("_n_rows")]
    for c in columns:
        s = F.col(c).cast("string")
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"_nulls_{c}"),
            F.countDistinct(F.col(c)).alias(f"_dist_{c}"),
            F.min(s).alias(f"_min_{c}"),
            F.max(s).alias(f"_max_{c}"),
        ]
    wide = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("_n_rows").alias("n_rows"),
                F.col(f"_nulls_{c}").alias("n_nulls"),
                F.col(f"_dist_{c}").alias("n_distinct"),
                F.col(f"_min_{c}").alias("min_value"),
                F.col(f"_max_{c}").alias("max_value"),
            )
            for c in columns
        ]
    )
    return wide.select(F.explode(rows).alias("p")).select("p.*")
