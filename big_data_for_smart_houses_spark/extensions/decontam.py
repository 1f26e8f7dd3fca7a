"""Train/test decontamination for training corpora (SURVEY.md §7.4).

Benchmark contamination — test-set text leaking into the training
corpus — is detected the standard way: n-gram overlap. Every training
document sharing at least ``min_shared`` word n-grams with any test
document is flagged, with the overlap fraction reported so callers can
threshold harder.

Plan shape (the part that must survive 100 TB): both sides shingle into
distinct word n-grams (explode — narrow), then join ON THE SHINGLE.
Only (train, test) pairs that actually share a shingle ever
materialize — the same blocking idea as n-gram Jaccard dedup
(extensions/dedup.py), never an all-pairs comparison. The test side is
tiny by construction (benchmarks are KBs-to-MBs against a 100 TB
corpus), so its shingle set is broadcast and the training corpus NEVER
shuffles — the whole check is one broadcast-join pass over the train
scan plus a (train_id, test_id)-keyed aggregation of matched shingles
only.

All built-in expressions; no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import shingles

DEFAULT_NGRAM = 3


def contamination_check(
    train: DataFrame,
    test: DataFrame,
    n: int = DEFAULT_NGRAM,
    min_shared: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Flag training documents that share word n-grams with test
    documents.

    Returns one row per contaminated (train_id, test_id) pair:
    ``n_shared`` matching distinct n-grams, ``test_size`` (the test
    doc's distinct n-gram count) and ``contamination`` =
    n_shared / test_size — the fraction of the test document present
    in that training document (1.0 = the test doc is fully contained).
    """
    tr = shingles(train, id_col=id_col, text_col=text_col, n=n).select(
        F.col(id_col).alias("train_id"), "shingle"
    )
    te = shingles(test, id_col=id_col, text_col=text_col, n=n).select(
        F.col(id_col).alias("test_id"), "shingle"
    )
    sizes = te.groupBy("test_id").agg(F.count(F.lit(1)).alias("test_size"))
    matched = (
        tr.join(F.broadcast(te), "shingle")
        .groupBy("train_id", "test_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
    return matched.join(F.broadcast(sizes), "test_id").select(
        "train_id",
        "test_id",
        "n_shared",
        "test_size",
        (F.col("n_shared").cast("double") / F.col("test_size")).alias(
            "contamination"
        ),
    )


def decontaminate(
    train: DataFrame,
    test: DataFrame,
    n: int = DEFAULT_NGRAM,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Drop training documents whose contamination against ANY test
    document reaches ``threshold`` — the remove-side companion of
    :func:`contamination_check`. One broadcast left-anti join; the
    training corpus still never shuffles."""
    flagged = (
        contamination_check(
            train, test, n=n, id_col=id_col, text_col=text_col
        )
        .filter(F.col("contamination") >= threshold)
        .select(F.col("train_id").alias(id_col))
        .distinct()
    )
    return train.join(F.broadcast(flagged), id_col, "left_anti")
