"""End-to-end CLI tests for the dataprep subcommand (the batch ETL
subcommands are covered by test_etl_pipeline.py)."""

from __future__ import annotations

import tempfile

import pytest

from big_data_for_smart_houses_spark.cli import main


@pytest.fixture()
def corpus(spark):
    tmp = tempfile.mkdtemp()
    rows = [
        (0, "the quick brown fox jumps over the lazy dog today"),
        (1, "the quick brown fox jumps over the lazy dog today"),  # exact dup
        (2, "an entirely different document about spark joins and plans"),
        (3, "mail me at a.b@x.io or ping 10.0.0.1 about the offer"),
    ]
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(f"{tmp}/docs")
    return tmp


def test_cli_dedup_exact(spark, corpus):
    main(["dataprep", "--input", f"{corpus}/docs", "--out", f"{corpus}/out",
          "--op", "dedup-exact"])
    out = spark.read.parquet(f"{corpus}/out")
    ids = sorted(r.doc_id for r in out.collect())
    assert ids == [0, 2, 3]  # keeps min-id of the dup pair


def test_cli_split_and_shuffle(spark, corpus):
    main(["dataprep", "--input", f"{corpus}/docs", "--out", f"{corpus}/split",
          "--op", "split"])
    split = spark.read.parquet(f"{corpus}/split")
    assert set(split.columns) >= {"doc_id", "split", "split_bucket"}
    main(["dataprep", "--input", f"{corpus}/docs", "--out", f"{corpus}/shuf",
          "--op", "shuffle", "--salt", "3"])
    shuf = spark.read.parquet(f"{corpus}/shuf")
    assert sorted(r.shuffle_pos for r in shuf.collect()) == [0, 1, 2, 3]


def test_cli_scrub_and_decontam(spark, corpus):
    main(["dataprep", "--input", f"{corpus}/docs", "--out", f"{corpus}/scrub",
          "--op", "scrub-pii"])
    scrubbed = {
        r.doc_id: r for r in spark.read.parquet(f"{corpus}/scrub").collect()
    }
    assert scrubbed[3].n_email == 1 and scrubbed[3].n_ip == 1
    assert "<EMAIL>" in scrubbed[3].scrubbed_text

    # doc 0/1 leak the "test set" (doc 0's text); both are removed
    spark.read.parquet(f"{corpus}/docs").filter("doc_id = 0").write.mode(
        "overwrite"
    ).parquet(f"{corpus}/test")
    main(["dataprep", "--input", f"{corpus}/docs", "--out", f"{corpus}/clean",
          "--op", "decontam", "--test-input", f"{corpus}/test"])
    kept = sorted(
        r.doc_id for r in spark.read.parquet(f"{corpus}/clean").collect()
    )
    assert kept == [2, 3]


def test_cli_profile_chunk_and_lm_score(spark, corpus):
    main(["dataprep", "--input", f"{corpus}/docs", "--out", f"{corpus}/prof",
          "--op", "profile"])
    prof = {r.column: r for r in spark.read.parquet(f"{corpus}/prof").collect()}
    assert prof["doc_id"].n_rows == 4 and prof["text"].n_distinct == 3

    main(["dataprep", "--input", f"{corpus}/docs", "--out", f"{corpus}/cdc",
          "--op", "chunk-cdc"])
    cdc = spark.read.parquet(f"{corpus}/cdc")
    assert set(cdc.columns) == {"doc_id", "chunk_id", "chunk_text"}
    assert cdc.count() >= 4

    main(["dataprep", "--input", f"{corpus}/docs", "--out", f"{corpus}/lm",
          "--op", "lm-score"])
    lm = {r.doc_id: r for r in spark.read.parquet(f"{corpus}/lm").collect()}
    # the duplicated doc's bigrams are corpus-typical: higher logprob
    assert lm[0].avg_logprob > lm[2].avg_logprob


def test_cli_sentence_dedup(spark, corpus):
    import tempfile as _tf

    tmp = _tf.mkdtemp()
    rows = [
        (0, "shared chrome line. unique body zero"),
        (1, "shared chrome line. unique body one"),
    ]
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(f"{tmp}/docs")
    main(["dataprep", "--input", f"{tmp}/docs", "--out", f"{tmp}/out",
          "--op", "dedup-sentence"])
    out = {r.doc_id: r for r in spark.read.parquet(f"{tmp}/out").collect()}
    assert out[0].cleaned_text == "unique body zero"
    assert out[1].cleaned_text == "unique body one"
