"""Unit tests for the curation-tier operators: sentence-level dedup,
semantic (embedding) dedup, per-group caps, mix manifest, profiling,
and winsorization edges the gate corpus doesn't exercise."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_for_smart_houses_spark.extensions import profiling, text
from big_data_for_smart_houses_spark.extensions.sampling import (
    cap_per_group,
    mix_manifest,
)
from big_data_for_smart_houses_spark.extensions.similarity import (
    semantic_dedup,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_sentence_dedup_strips_chrome_keeps_order(spark):
    docs = _docs(
        spark,
        [
            (0, "subscribe to our newsletter. unique alpha content here"),
            (1, "original beta text. subscribe to our newsletter. more beta"),
            (2, "subscribe to our newsletter"),
            (3, "totally unrelated gamma document"),
        ],
    )
    rows = {
        r.doc_id: r
        for r in text.sentence_dedup(docs, min_doc_freq=2).collect()
    }
    # the shared sentence is removed from every doc, order preserved
    assert rows[0].cleaned_text == "unique alpha content here"
    assert rows[1].cleaned_text == "original beta text. more beta"
    assert rows[1].n_sentences == 3 and rows[1].n_removed == 1
    # a doc that was ONLY chrome comes back empty, not missing
    assert rows[2].cleaned_text == "" and rows[2].n_removed == 1
    assert rows[3].cleaned_text == "totally unrelated gamma document"
    assert rows[3].n_removed == 0


def test_sentence_dedup_counts_docs_not_occurrences(spark):
    # the repeated sentence appears twice in ONE doc: doc frequency is
    # 1, so it must survive (df counts documents, not occurrences)
    docs = _docs(spark, [(0, "echo echo sentence. other. echo echo sentence")])
    r = text.sentence_dedup(docs, min_doc_freq=2).collect()[0]
    assert r.n_removed == 0
    assert r.cleaned_text == "echo echo sentence. other. echo echo sentence"


def test_semantic_dedup_groups_and_keepers(spark):
    # two tight clusters + one singleton; within-cluster cosine ~1,
    # across ~orthogonal
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.999, 0.001, 0.0, 0.0]),
        (5, [0.0, 1.0, 0.0, 0.0]),
        (7, [0.0, 0.999, 0.001, 0.0]),
        (9, [0.0, 0.0, 0.0, 1.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r.vec_id: r for r in semantic_dedup(emb, threshold=0.95).collect()}
    assert out[0].group_id == 0 and out[1].group_id == 0
    assert out[5].group_id == 5 and out[7].group_id == 5
    assert out[9].group_id == 9
    keepers = {v for v, r in out.items() if r.is_keeper}
    assert keepers == {0, 5, 9}


def test_cap_per_group_keeps_lowest_ids(spark):
    df = spark.range(0, 100).select(
        F.col("id").alias("doc_id"), (F.col("id") % 4).cast("string").alias("src")
    )
    out = cap_per_group(df, "src", 5, id_col="doc_id").collect()
    assert len(out) == 20
    for r in out:
        # lowest ids per group: doc_id = group + 4*k for k < 5
        assert r.doc_id < 4 * 5
        assert 1 <= r.group_rank <= 5


def test_mix_manifest_budget_and_epochs(spark):
    df = spark.createDataFrame(
        [("en", 100), ("de", 100)] * 50 + [("fr", 100)] * 10,
        "lang string, n_tok long",
    )
    out = {r.lang: r for r in mix_manifest(df, "lang", "n_tok", alpha=0.5,
                                           token_budget=12_000).collect()}
    # en/de symmetric: identical manifests
    assert out["en"].target_tokens == out["de"].target_tokens
    assert out["en"].n_tokens == 5000 and out["fr"].n_tokens == 1000
    # alpha=0.5 gives fr sqrt(1000)/(2*sqrt(5000)+sqrt(1000)) ~ 0.1828
    # of the budget => ~2194 tokens over 1000 observed => epochs > 2
    assert out["fr"].epochs > 2.0
    assert out["en"].epochs < 1.0
    # shares sum to at most the budget (floor per group)
    assert sum(r.target_tokens for r in out.values()) <= 12_000


def test_profile_columns_single_pass_metrics(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "b"), (4, "a")],
        "id long, tag string",
    )
    out = {r.column: r for r in profiling.profile_columns(df, ["id", "tag"]).collect()}
    assert out["id"].n_rows == 4 and out["id"].n_nulls == 0
    assert out["id"].n_distinct == 4
    # string-ordered min/max, stated contract: '1' < '4' here
    assert out["id"].min_value == "1" and out["id"].max_value == "4"
    assert out["tag"].n_nulls == 1 and out["tag"].n_distinct == 2
    assert out["tag"].min_value == "a" and out["tag"].max_value == "b"
    # single job: the plan contains exactly one scan of the source
    plan = profiling.profile_columns(df, ["id", "tag"])._jdf.queryExecution().optimizedPlan().toString()
    assert plan.lower().count("logicalrdd") == 1


def test_token_heavy_hitters_counts_and_ties(spark):
    docs = _docs(
        spark,
        [
            (0, "zz aa zz"),
            (1, "aa bb zz"),
            (2, "cc"),
        ],
    )
    out = text.token_heavy_hitters(docs, k=3).collect()
    assert [(r.token, r.n_occurrences, r.n_docs, r.rank) for r in out] == [
        ("zz", 3, 2, 1),
        ("aa", 2, 2, 2),
        # bb/cc tie on count 1: token ascending breaks it
        ("bb", 1, 1, 3),
    ]


def test_value_histogram_clamps_edges(spark):
    df = spark.createDataFrame(
        [(-5.0,), (0.0,), (9.9,), (10.0,), (25.0,), (99.0,), (250.0,)],
        "v double",
    )
    out = {r.bin: r for r in profiling.value_histogram(df, "v", 0.0, 100.0, 10).collect()}
    assert out[0].n == 3          # -5 clamped in, 0.0, 9.9
    assert out[1].n == 1          # 10.0
    assert out[2].n == 1          # 25.0
    assert out[9].n == 2          # 99.0, 250 clamped into last bin
    assert sum(r.n for r in out.values()) == 7
    assert out[1].bin_lo == 10.0


def test_bigram_lm_smoothed_probabilities(spark):
    import math

    from big_data_for_smart_houses_spark.extensions.ranking import (
        bigram_lm_scores,
    )

    docs = _docs(spark, [(0, "a b"), (1, "a b"), (2, "a c"), (3, "x")])
    out = {r.doc_id: r for r in bigram_lm_scores(docs).collect()}
    # V=4 (a,b,c,x), C(a ·)=3: P(b|a)=(2+1)/(3+4), P(c|a)=(1+1)/7
    assert abs(out[0].avg_logprob - math.log(3 / 7)) < 1e-6
    assert abs(out[2].avg_logprob - math.log(2 / 7)) < 1e-6
    assert abs(out[0].ppl - 7 / 3) < 1e-6
    # corpus-typical text scores higher than the rarer continuation
    assert out[0].avg_logprob > out[2].avg_logprob
    # single-token doc has no bigrams: absent
    assert 3 not in out


def test_cdc_chunking_is_shift_robust(spark):
    base = "aa bb cc dd ee ff gg hh ii jj kk ll mm nn oo pp qq rr ss tt"
    # insert one token at the front: fixed-size chunking would shift
    # every chunk; CDC must leave the tail chunks identical
    shifted = "zz " + base
    docs = _docs(spark, [(0, base), (1, shifted)])
    out = text.cdc_chunk_documents(docs).collect()
    chunks0 = [r.chunk_text for r in sorted(out, key=lambda r: r.chunk_id)
               if r.doc_id == 0]
    chunks1 = [r.chunk_text for r in sorted(out, key=lambda r: r.chunk_id)
               if r.doc_id == 1]
    # chunks tile the document exactly
    assert " ".join(chunks0) == base
    assert " ".join(chunks1) == shifted
    # content-defined boundaries: the chunk sets share their tail
    assert len(set(chunks0) & set(chunks1)) >= max(len(chunks0) - 2, 1)


def test_cdc_chunking_short_doc_single_chunk(spark):
    docs = _docs(spark, [(0, "one two"), (1, "single")])
    out = {(r.doc_id, r.chunk_id): r.chunk_text
           for r in text.cdc_chunk_documents(docs).collect()}
    assert out == {(0, 0): "one two", (1, 0): "single"}


def test_ewma_fold_and_tiebreak(spark):
    import datetime as _dt

    from big_data_for_smart_houses_spark.operators.windows import ewma_smooth

    t = _dt.datetime(2025, 1, 1)
    rows = [
        # same timestamp: event_id must break the tie (20 then 40)
        (1, t, 20.0, 7),
        (1, t, 40.0, 8),
        (2, t, 9.0, 9),  # single-event key: ewma == value
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, value double, event_id long"
    )
    out = {(r.user_id, r.event_id): r.ewma for r in ewma_smooth(df).collect()}
    assert out[(1, 7)] == 20.0
    assert out[(1, 8)] == 0.25 * 40.0 + 0.75 * 20.0
    assert out[(2, 9)] == 9.0


def test_two_phase_topk_matches_plain_window(spark):
    from big_data_for_smart_houses_spark.operators.skew import two_phase_topk

    # skewed groups: group 0 holds 90% of rows
    df = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 900, "hot").otherwise("cold").alias("src"),
    )
    salted = two_phase_topk(df, "src", 7, order_col="doc_id")
    plain = cap_per_group(df, "src", 7, id_col="doc_id")
    a = sorted((r.src, r.doc_id, r.group_rank) for r in salted.collect())
    b = sorted((r.src, r.doc_id, r.group_rank) for r in plain.collect())
    assert a == b and len(a) == 14


def test_asof_forward_ties_and_no_match(spark):
    import datetime as _dt

    from big_data_for_smart_houses_spark.operators.joins import asof_join

    t = lambda s: _dt.datetime(2025, 1, 1) + _dt.timedelta(seconds=s)  # noqa: E731
    left = spark.createDataFrame(
        [(1, t(5), 100), (1, t(10), 101), (1, t(30), 102)],
        "user_id long, ts timestamp, event_id long",
    )
    right = spark.createDataFrame(
        [(1, t(10), 7), (1, t(20), 8)],
        "user_id long, ts timestamp, nxt long",
    )
    out = {
        r.event_id: r
        for r in asof_join(
            left, right, on="user_id", right_cols=["nxt"],
            direction="forward",
        ).collect()
    }
    assert out[100].nxt == 7                      # strictly after
    assert out[101].nxt == 7                      # equal ts: inclusive
    assert out[101].ts_asof == t(10)
    assert out[102].nxt is None                   # nothing follows
    # backward on the same data still matches at-or-before
    back = {
        r.event_id: r
        for r in asof_join(
            left, right, on="user_id", right_cols=["nxt"]
        ).collect()
    }
    assert back[100].nxt is None and back[101].nxt == 7 and back[102].nxt == 8


def test_hash_sample_per_group_exact_k_and_uniformity(spark):
    from big_data_for_smart_houses_spark.extensions.sampling import (
        hash_sample_per_group,
    )

    df = spark.range(0, 400).select(
        F.col("id").alias("doc_id"), (F.col("id") % 2).cast("string").alias("g")
    )
    out = hash_sample_per_group(df, "g", 10).collect()
    by_g = {}
    for r in out:
        by_g.setdefault(r.g, set()).add(r.doc_id)
    assert all(len(v) == 10 for v in by_g.values())
    # uniform, not lowest-id-biased: the sample is not the first 10 ids
    assert by_g["0"] != {2 * i for i in range(10)}
    # a different salt draws a (near-)disjoint sample
    other = hash_sample_per_group(df, "g", 10, salt=1).collect()
    o0 = {r.doc_id for r in other if r.g == "0"}
    assert len(o0 & by_g["0"]) < 5
