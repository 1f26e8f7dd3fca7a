"""Continuous document-ingestion curation (SURVEY.md §7.4 meets the
medallion streaming shape): the batch curation operators — fingerprint,
quality scoring, Gopher rules, PII scrub — are all row-local
expressions, so they lift onto a streaming DataFrame unchanged; the
only stateful step is fingerprint dedup, bounded by a watermark
exactly like the telemetry T6 path.

At 100 TB/day this is the shape that matters: documents land
continuously (crawl dumps, upload queues), and curation must keep up
incrementally instead of recomputing the corpus. State is
O(fingerprints per watermark horizon), never O(corpus) — the
persisted-fingerprint-store batch dedup
(``extensions.dedup.dedup_against_history``) remains the backstop for
duplicates arriving further apart than the horizon.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..extensions.text import (
    add_quality_score,
    fingerprint,
    gopher_quality_flags,
    scrub_pii,
)

# Incoming document schema (explicit — a streaming source cannot infer,
# and at scale inference would cost a full extra pass anyway).
DOC_STREAM_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
        StructField("source", StringType(), True),
        StructField("ingest_ts", TimestampType(), True),
    ]
)


def document_stream_from_files(
    spark: SparkSession, path: str, fmt: str = "parquet"
) -> DataFrame:
    """Incremental document consumption as a streaming file source —
    Spark tracks processed files exactly-once (same S8 rationale as the
    bronze file stream)."""
    reader = spark.readStream.schema(DOC_STREAM_SCHEMA)
    if fmt == "parquet":
        return reader.parquet(path)
    if fmt == "json":
        return reader.json(path)
    raise ValueError(f"unsupported document stream format: {fmt}")


def curate_document_stream(
    stream: DataFrame, watermark_delay: str = "24 hours"
) -> DataFrame:
    """The full curation pass as one streaming transformation chain:

    1. drop rows with null/empty text (nothing to curate),
    2. exact-dedup on the normalized-text fingerprint within the
       watermark horizon (bounded state, at-least-once -> effectively
       once),
    3. quality score + Gopher-rule flags (row-local),
    4. PII scrub (row-local),
    5. keep only documents passing the quality bar.

    Every step except the dedup is stateless, so the micro-batch plan
    is the batch plan — identical operator code, identical semantics
    (asserted in tests by running the same chain in batch mode)."""
    cleaned = stream.filter(
        F.col("text").isNotNull() & (F.length(F.col("text")) > 0)
    ).withColumn("fp", fingerprint(F.col("text")))
    deduped = cleaned.withWatermark(
        "ingest_ts", watermark_delay
    ).dropDuplicatesWithinWatermark(["fp"])
    scored = gopher_quality_flags(add_quality_score(deduped))
    scrubbed = scrub_pii(scored)
    return scrubbed.filter(F.col("is_quality")).select(
        "doc_id",
        "lang",
        "source",
        "ingest_ts",
        "fp",
        "text_quality",
        "passes_gopher",
        F.col("scrubbed_text").alias("text"),
    )


def write_curated_stream(
    curated: DataFrame,
    path: str,
    checkpoint: str,
    available_now: bool = False,
) -> StreamingQuery:
    """Lang-partitioned parquet sink for the curated stream (the silver
    S6 shape: downstream per-language jobs prune partitions instead of
    scanning the corpus). ``available_now=True`` runs the
    catch-up-then-stop mode used for scheduled incremental batches."""
    writer = (
        curated.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .partitionBy("lang")
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
