"""Schema-drift conformance at the ingestion boundary.

A 100 TB multi-source lake never has one schema: producers add fields,
rename nothing, and ship the occasional wrong type (the reference
tolerates this implicitly because pandas coerces on read; Spark's
strict schemas surface it instead — reference consumer/ingest_bronze.py
parses whatever JSON arrives). ``conform_to_schema`` makes the
engine's contract explicit: every batch is projected onto the target
``StructType`` — missing columns materialize as typed nulls, type
drift goes through ``try_cast`` (coerce-to-null, the P2 semantics, so
one bad producer can't fail a 10k-task stage), unknown columns are
dropped (or reported first via ``drift_report``).

Pure projection — zero shuffles, codegen-friendly, safe to prepend to
every source in `plans/etl.py` and the streaming readers alike
(column-level ops only, so it lifts unchanged onto streaming frames).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def conform_to_schema(
    df: DataFrame,
    target: StructType,
    strict_extras: bool = False,
) -> DataFrame:
    """Project ``df`` onto ``target``: same columns, same order, same
    types, regardless of what the batch actually carried.

    - missing field  -> typed null column
    - present, wrong type -> ``try_cast`` (null on bad values, never
      a task failure)
    - extra columns -> dropped; with ``strict_extras`` raise instead
      (catch a renamed upstream field before silently nulling it)
    """
    have = {f.name: f.dataType for f in df.schema.fields}
    want = {f.name for f in target.fields}
    extras = [c for c in df.columns if c not in want]
    if extras and strict_extras:
        raise ValueError(
            f"unexpected columns {extras} not in target schema — "
            "a producer likely renamed a field; pass "
            "strict_extras=False to drop them"
        )
    cols = []
    for f in target.fields:
        if f.name not in have:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
        elif have[f.name] != f.dataType:
            cols.append(F.col(f.name).try_cast(f.dataType).alias(f.name))
        else:
            cols.append(F.col(f.name))
    return df.select(*cols)


def drift_report(df: DataFrame, target: StructType) -> dict[str, list[str]]:
    """Plan-time drift summary (no job runs): which target fields are
    missing from the batch, which carry a different type, and which
    batch columns the target doesn't know. Feed it to logging/metrics
    before conforming, so silent schema evolution is visible."""
    have = {f.name: f.dataType for f in df.schema.fields}
    want = {f.name: f.dataType for f in target.fields}
    return {
        "missing": [n for n in want if n not in have],
        "type_drift": [
            n for n, t in want.items() if n in have and have[n] != t
        ],
        "extra": [n for n in have if n not in want],
    }
