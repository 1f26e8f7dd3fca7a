"""JSON-lines source/sink (SURVEY.md §2.1).

The reference's telemetry is JSON on the wire (producer → Kafka →
`json.loads`, consumer/ingest_bronze.py:46-65); this module is the
file-based equivalent for batch backfills and interchange: newline-
delimited JSON read with an EXPLICIT schema.

Schema inference is disabled on purpose: at 100 TB `inferSchema` means
a full extra pass over the data before the real one, and a drifting
producer silently changes column types mid-dataset. With a declared
schema the scan is single-pass, malformed rows are quarantined instead
of poisoning the frame (PERMISSIVE + `_corrupt_record`), and column
pruning still reaches the parser (Jackson only materializes requested
fields).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType,
    keep_corrupt: bool = False,
) -> DataFrame:
    """Schema-enforced JSONL read. Rows that fail to parse land in
    ``_corrupt_record`` (PERMISSIVE mode); by default they are split
    off and dropped, with ``keep_corrupt=True`` returning them as a
    column for quarantine sinks."""
    full = StructType(
        list(schema.fields) + [StructField(CORRUPT_COL, StringType())]
    )
    df = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    if keep_corrupt:
        return df
    return df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)


def write_jsonl(df: DataFrame, path: str, partition_cols: list[str] | None = None) -> None:
    """JSONL sink, optionally hive-partitioned (same layout contract as
    the parquet sinks, so downstream partition pruning works)."""
    w = df.write.mode("overwrite")
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.json(path)
