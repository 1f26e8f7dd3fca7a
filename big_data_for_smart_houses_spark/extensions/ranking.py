"""Corpus-statistics term ranking: TF-IDF and BM25 (SURVEY.md §7.4).

Classic distributed text scoring — term frequencies are row-local,
document frequencies are one aggregation over (term, doc) pairs, and
the global constants (corpus size, average doc length) are 1-row
aggregates broadcast back, the J2 scalar-cross-join shape from the
reference's business summary.

Plan shape at 100 TB:
- tokenize + per-doc term counts: explode + groupBy(doc, term) with
  map-side combine — one shuffle keyed (doc, term).
- document frequency: groupBy(term) over the (doc, term) pairs — one
  shuffle keyed term. The vocabulary can be huge, so DF joins back by
  a term-keyed shuffle join, NOT a broadcast (a 100 TB corpus has a
  multi-GB vocabulary).
- N and avgdl: 1-row aggregates, broadcast cross join (free).
- top-k per doc: rank window over (doc)-keyed shuffle — the same
  single-exchange reuse as the silver pipeline when the (doc, term)
  partitioning is already in place (doc is a prefix of the key).

All built-in expressions; ties rank deterministically by term.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import normalized

BM25_K1 = 1.2
BM25_B = 0.75


def term_counts(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc, term, tf, doc_len): per-document term frequencies over
    whitespace tokens of the normalized text."""
    toks = F.split(normalized(F.col(text_col)), " ")
    exploded = df.select(
        F.col(id_col), F.size(toks).alias("doc_len"), F.explode(toks).alias("term")
    )
    return exploded.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).alias("tf"), F.first("doc_len").alias("doc_len")
    )


def doc_frequencies(tc: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(term, df): number of documents containing each term. Input is
    the term_counts output, whose (doc, term) rows are distinct, so a
    plain count works."""
    return tc.groupBy("term").agg(F.count(F.lit(1)).alias("df"))


def tfidf_top_terms(
    df: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    score_transform=None,
) -> DataFrame:
    """Top-k characteristic terms per document by smoothed TF-IDF
    (``tf * (ln((1 + N) / (1 + df)) + 1)`` — the sklearn-style smooth
    idf, never negative, defined for df = N).

    ``score_transform`` (Column -> Column), when given, is applied to
    the score BOTH for ranking and for output — cross-engine gates pass
    a quantizer here so a 1-ulp ``ln`` difference can't flip the rank
    order of two nearly-equal scores."""
    # lazy lineage cut: tc feeds both the DF aggregate and the score
    # join — materialize the tokenize+count pass once instead of
    # twice (round 14, 0.76x on the sf0.1 gate)
    tc = term_counts(df, id_col=id_col, text_col=text_col).localCheckpoint(
        eager=False
    )
    dfreq = doc_frequencies(tc, id_col=id_col)
    n_docs = df.agg(F.count(F.lit(1)).alias("n_docs"))
    tfidf = F.col("tf") * (
        F.log((1.0 + F.col("n_docs")) / (1.0 + F.col("df"))) + F.lit(1.0)
    )
    if score_transform is not None:
        tfidf = score_transform(tfidf)
    scored = (
        tc.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("tfidf", tfidf)
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "df", "tfidf", "rank")
    )


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    k1: float = BM25_K1,
    b: float = BM25_B,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 relevance of every document against a bag of query terms.

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    with the Robertson-Sparck-Jones idf
    ``ln(1 + (N − df + 0.5)/(df + 0.5))``. The query-term filter is
    pushed below the DF join, so only matching (doc, term) pairs flow."""
    # same two-consumer lineage cut as tfidf_top_terms (round 14)
    tc = (
        term_counts(df, id_col=id_col, text_col=text_col)
        .filter(F.col("term").isin(query_terms))
        .localCheckpoint(eager=False)
    )
    dfreq = doc_frequencies(tc, id_col=id_col)
    globals_ = df.select(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.size(F.split(normalized(F.col(text_col)), " "))).alias("avgdl"),
    )
    scored = (
        tc.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(globals_))
        .withColumn(
            "idf",
            F.log(
                1.0
                + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ),
        )
        .withColumn(
            "term_score",
            F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (
                F.col("tf")
                + k1
                * (1.0 - b + b * F.col("doc_len") / F.col("avgdl"))
            ),
        )
    )
    return scored.groupBy(id_col).agg(
        F.sum("term_score").alias("bm25"),
        F.count(F.lit(1)).alias("n_matched_terms"),
    )


def bigram_lm_scores(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Bigram language-model quality scoring (the CC-Net perplexity
    filter, self-trained): fit an add-one-smoothed bigram LM on the
    corpus itself, then score every document by its mean token
    log-probability — fluent, corpus-typical text scores high;
    gibberish, wrong-language, and template spam score low. The
    standard model-based quality dimension next to the rule-based
    Gopher filters.

    P(w2|w1) = (C(w1 w2) + 1) / (C(w1 ·) + V), avg_logprob =
    mean ln P over the document's bigrams, ppl = exp(-avg_logprob).
    Documents with fewer than two tokens have no bigrams and are
    absent from the output.

    Plan shape at 100 TB (the TF-IDF template): bigram construction is
    row-local (transform over token slices, zero shuffle); the LM
    counts are two map-side-combined aggregates (bigram-keyed,
    history-keyed); V is a 1-row scalar broadcast. Scoring joins the
    model back by bigram-keyed shuffle — a 100 TB corpus' bigram
    vocabulary cannot broadcast. Float contract: the per-doc ln-sum is
    order-sensitive, so the mean is gate-quantized, and ppl is
    exp() of the already-quantized mean, quantized again."""
    from ..functions.numeric import gate_quantize
    from .text import tokens

    toks = tokens(F.col(text_col))
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - 2),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # lazy lineage cut: bi feeds THREE consumers (bigram counts,
    # history counts, the scoring join) — tokenize + build bigrams
    # once instead of three times (round 14, 0.58x on the sf0.1 gate)
    bi = df.select(
        F.col(id_col), F.explode(bigrams).alias("bigram")
    ).localCheckpoint(eager=False)

    model = bi.groupBy("bigram").agg(F.count(F.lit(1)).alias("_c_bi"))
    hist = (
        bi.select(F.split(F.col("bigram"), " ").getItem(0).alias("_w1"))
        .groupBy("_w1")
        .agg(F.count(F.lit(1)).alias("_c_w1"))
    )
    vocab = df.select(F.explode(toks).alias("_tok")).agg(
        F.countDistinct("_tok").alias("_v")
    )

    scored = (
        bi.withColumn("_w1", F.split(F.col("bigram"), " ").getItem(0))
        .join(model, "bigram")
        .join(hist, "_w1")
        .crossJoin(F.broadcast(vocab))
        .withColumn(
            "_logp",
            F.log(
                (F.col("_c_bi") + F.lit(1.0))
                / (F.col("_c_w1") + F.col("_v"))
            ),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        gate_quantize(
            F.sum("_logp") / F.count(F.lit(1))
        ).alias("avg_logprob"),
    )
    return per_doc.withColumn(
        "ppl", gate_quantize(F.exp(-F.col("avg_logprob")))
    )
