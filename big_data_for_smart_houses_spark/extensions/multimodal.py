"""Multimodal column plumbing (SURVEY.md §7.4).

Images/audio/video are opaque BinaryType payloads + typed metadata.
The Spark-side plumbing — schema, partition-parallel batch iteration,
Arrow transfer shape — is real and tested; the actual media decode is
stubbed (`decode_media` raises NotImplementedError) because no
image/audio libraries ship in this container. `extract_features`
computes deterministic byte-level features through the same
mapInPandas path a real decoder would use, so swapping in PIL/ffmpeg
later changes one function, not the pipeline.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("modality", StringType()),
        StructField("mime_type", StringType()),
        StructField("n_bytes", LongType()),
    ]
)

MODALITIES = ["image", "audio", "video"]
MIME_BY_MODALITY = {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}


def decode_media(payload: bytes, mime_type: str):  # pragma: no cover - stub
    """Real media decode (resize / frame-sample / spectrogram) plugs in
    here. Deliberately stubbed: media libs are not available in this
    environment."""
    raise NotImplementedError(
        "media decoding requires image/audio libraries not present in this "
        "environment; extract_features uses byte-level features instead"
    )


def attach_payloads(docs: DataFrame) -> DataFrame:
    """Build a multimodal table from the documents fixture: UTF-8 bytes
    as the opaque payload, modality assigned deterministically."""
    modality = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        modality.alias("modality"),
    ).withColumn(
        "mime_type",
        F.when(F.col("modality") == "image", MIME_BY_MODALITY["image"])
        .when(F.col("modality") == "audio", MIME_BY_MODALITY["audio"])
        .otherwise(MIME_BY_MODALITY["video"]),
    )


def extract_features(assets: DataFrame) -> DataFrame:
    """Per-batch feature extraction over binary payloads via
    mapInPandas: Arrow-batched, partition-parallel, zero shuffle.
    Byte-length here; a real decoder returns image dims / audio
    duration through the identical signature."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": pdf["modality"],
                    "mime_type": pdf["mime_type"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                }
            )

    return assets.mapInPandas(batches, schema=FEATURE_SCHEMA)
