"""Text-analysis operators over a document table (SURVEY.md §7.4).

All pure built-in expressions (split/transform/filter/aggregate are
JVM higher-order functions — no Python in the hot path, fully
partition-parallel, no shuffle at all for the row-level stats).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Stopword sets for the n-gram language heuristic. Tiny on purpose —
# the operator shape (per-row token scan, argmax over per-language
# scores) is what scales, the lists are a config.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "is"],
    "de": ["der", "die", "das", "und", "ist"],
    "fr": ["le", "la", "et", "les", "est"],
    "es": ["el", "los", "y", "es", "una"],
}

QUALITY_STOPWORDS = ["the", "a", "of", "and", "is", "to", "in"]

# BPE-ish tokenizer regex: letter runs, digit runs, single punctuation.
BPE_TOKEN_RE = "[a-z]+|[0-9]+|[^a-z0-9\\s]"


def tokens(text: Column) -> Column:
    return F.split(text, " ")


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(text))


def bpe_token_count(text: Column) -> Column:
    """Token count under the BPE-ish regex — the cheap proxy for LLM
    token budgeting."""
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(BPE_TOKEN_RE), 0))


def avg_token_len(text: Column) -> Column:
    toks = tokens(text)
    total = F.aggregate(
        F.transform(toks, lambda x: F.length(x)), F.lit(0), lambda a, x: a + x
    )
    return total.cast("double") / F.size(toks)


def stopword_count(text: Column, words: list[str] | None = None) -> Column:
    wl = words or QUALITY_STOPWORDS
    return F.size(F.filter(tokens(text), lambda x: x.isin(*wl)))


def normalized(text: Column) -> Column:
    """Canonical form for fingerprinting: lowercase, collapsed
    whitespace."""
    return F.regexp_replace(F.lower(text), "\\s+", " ")


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text —
    the exact-dedup key that survives case/whitespace jitter."""
    return F.md5(normalized(text))


def add_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    t = F.col(text_col)
    return (
        df.withColumn("n_tokens", token_count(t))
        .withColumn("n_bpe_tokens", bpe_token_count(t))
        .withColumn("n_chars_computed", F.length(t))
        .withColumn("avg_token_len", avg_token_len(t))
        .withColumn("n_stopwords", stopword_count(t))
        .withColumn(
            "stopword_ratio",
            F.col("n_stopwords").cast("double") / F.col("n_tokens"),
        )
    )


def add_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length/stopword/shape-based quality score — the §7.4 analog of
    the telemetry quality score (operators/quality.py): additive
    penalties, flag at 0.5."""
    df = add_text_stats(df, text_col)
    score = (
        F.lit(1.0)
        - F.when(F.col("n_tokens") < 10, 0.3).otherwise(0.0)
        - F.when(F.col("stopword_ratio") < 0.01, 0.2).otherwise(0.0)
        - F.when(
            (F.col("avg_token_len") > 12) | (F.col("avg_token_len") < 2), 0.2
        ).otherwise(0.0)
        - F.when(F.col("n_chars_computed") < 50, 0.2).otherwise(0.0)
    )
    return df.withColumn("text_quality", score).withColumn(
        "is_quality", F.col("text_quality") >= 0.5
    )


# PII patterns kept to constructs with identical semantics in Java
# regex (Spark) and RE2 (DuckDB): character classes, bounded repeats,
# word boundaries. No backrefs, no lookaround (RE2 has neither).
PII_PATTERNS = {
    "email": "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}",
    "ip": "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b",
    "phone": "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b",
}


def scrub_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact PII-shaped substrings (emails, IPv4s, phone numbers) with
    typed placeholder tokens and count each kind — the standard
    pre-training scrub pass. Row-local regex work: zero shuffle, scales
    linearly with the scan.

    Counts are independent matches against the ORIGINAL text;
    replacements apply sequentially in PII_PATTERNS order (email, ip,
    phone), so an email whose host is an IP is consumed by the email
    pass first."""
    t = F.col(text_col)
    out = df
    for kind, pat in PII_PATTERNS.items():
        out = out.withColumn(
            f"n_{kind}", F.size(F.regexp_extract_all(t, F.lit(pat), 0))
        )
    scrubbed = t
    for kind, pat in PII_PATTERNS.items():
        scrubbed = F.regexp_replace(scrubbed, pat, f"<{kind.upper()}>")
    return out.withColumn("scrubbed_text", scrubbed)


def add_repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Within-document repetition signals (the Gopher/C4 quality family):
    fraction of duplicate tokens, duplicate sentences, and duplicate
    word trigrams. All row-local array arithmetic (split /
    array_distinct / size) — zero shuffle."""
    toks = tokens(normalized(F.col(text_col)))
    sents = F.filter(
        F.split(F.col(text_col), "\\. "), lambda s: F.length(s) > 0
    )
    tri = F.when(
        F.size(toks) >= 3,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - 3),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, 3)),
        ),
    ).otherwise(F.array().cast("array<string>"))

    def dup_frac(arr: Column) -> Column:
        n = F.size(arr)
        return F.when(
            n > 0,
            (n - F.size(F.array_distinct(arr))).cast("double") / n,
        ).otherwise(F.lit(0.0))

    return (
        df.withColumn("dup_token_frac", dup_frac(toks))
        .withColumn("dup_sentence_frac", dup_frac(sents))
        .withColumn("dup_trigram_frac", dup_frac(tri))
    )


# Gopher-rule thresholds (Rae et al. 2021, table A1 spirit — exact
# values are config, the operator shape is the point).
GOPHER_MIN_TOKENS = 50
GOPHER_MAX_TOKENS = 100_000
GOPHER_TOKEN_LEN_RANGE = (3.0, 10.0)
GOPHER_MAX_DUP_TRIGRAM_FRAC = 0.30
GOPHER_MIN_STOPWORD_HITS = 2


def gopher_quality_flags(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Compose the Gopher-style document filter: token-count bounds,
    mean token length bounds, trigram repetition cap, and a minimum
    stopword presence — one boolean per rule plus the conjunction
    ``passes_gopher``. Builds on add_text_stats / add_repetition_stats
    (all row-local)."""
    df = add_text_stats(df, text_col)
    df = add_repetition_stats(df, text_col)
    checks = {
        "ok_n_tokens": (F.col("n_tokens") >= GOPHER_MIN_TOKENS)
        & (F.col("n_tokens") <= GOPHER_MAX_TOKENS),
        "ok_token_len": (F.col("avg_token_len") >= GOPHER_TOKEN_LEN_RANGE[0])
        & (F.col("avg_token_len") <= GOPHER_TOKEN_LEN_RANGE[1]),
        "ok_repetition": F.col("dup_trigram_frac")
        <= GOPHER_MAX_DUP_TRIGRAM_FRAC,
        "ok_stopwords": F.col("n_stopwords") >= GOPHER_MIN_STOPWORD_HITS,
    }
    passes = None
    for name, cond in checks.items():
        df = df.withColumn(name, cond)
        passes = F.col(name) if passes is None else passes & F.col(name)
    return df.withColumn("passes_gopher", passes)


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split documents into overlapping token windows — the
    context-window chunking step before embedding or training. Each
    chunk holds ``chunk_tokens`` whitespace tokens and starts
    ``chunk_tokens - overlap`` after the previous one; the final chunk
    may be short but is never empty, and a doc shorter than one window
    yields exactly one chunk.

    Row-local: tokenize once, generate chunk starts with ``sequence``
    (stride = chunk_tokens - overlap), slice per start, posexplode.
    Zero shuffle — the 1:N fan-out scales with the scan exactly like
    the multimodal frame sampler."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = tokens(F.col(text_col))
    # last start: the largest multiple of stride that still begins a
    # non-empty window; docs with <= chunk_tokens tokens get start 0
    last_start = F.greatest(
        F.lit(0),
        F.floor((F.size(toks) - 1) / F.lit(stride)).cast("int") * stride,
    )
    # drop trailing starts that would chunk only already-seen tokens
    last_start = F.least(
        last_start,
        F.when(
            F.size(toks) > chunk_tokens,
            F.ceil((F.size(toks) - chunk_tokens) / F.lit(stride)).cast("int")
            * stride,
        ).otherwise(F.lit(0)),
    )
    starts = F.sequence(F.lit(0), last_start, F.lit(stride))
    chunks = F.transform(
        starts,
        lambda s: F.concat_ws(" ", F.slice(toks, s + 1, chunk_tokens)),
    )
    exploded = df.select(
        F.col(id_col), F.posexplode(chunks).alias("chunk_id", "chunk_text")
    )
    return exploded.withColumn(
        "n_chunk_tokens", F.size(F.split(F.col("chunk_text"), " "))
    )


def sentence_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = ". ",
    min_doc_freq: int = 2,
) -> DataFrame:
    """Cross-document sentence-level dedup (the CC-Net / C4 line-dedup
    rule): a sentence appearing in >= ``min_doc_freq`` DISTINCT
    documents is boilerplate chrome and is removed from every document;
    the survivors are re-joined in their original order. Unlike
    document-level dedup this salvages the unique remainder of a page
    instead of dropping or keeping it whole.

    Scale shape: sentence-keyed aggregate for document frequency
    (map-side combined), sentence-keyed join back, then one per-doc
    aggregate that rebuilds the text — ``collect_list`` is safe here
    because its input is one document's sentences (bounded by document
    length, the same bound every per-doc array op in this module
    relies on), and order is restored by sorting on the captured
    position, never on collection order. The sentence vocabulary of a
    100 TB corpus cannot broadcast, so the join back is a shuffle —
    the same shape as :func:`~..extensions.dedup.boilerplate_ngram_stats`.

    Output: ``n_sentences`` / ``n_removed`` (exact ints) and
    ``cleaned_text`` — all engine-exact, no floats anywhere."""
    import re as _re

    sents = F.split(F.col(text_col), _re.escape(sep), -1)
    exploded = df.select(
        F.col(id_col), F.posexplode(sents).alias("pos", "sentence")
    )
    # document frequency: per-doc de-dup happens ROW-LOCALLY
    # (array_distinct) so the aggregate is a plain count — one
    # exchange; a countDistinct(doc_id) here would cost a second
    # exchange for Spark's distinct-aggregate rewrite
    doc_freq = (
        df.select(
            F.explode(F.array_distinct(sents)).alias("sentence")
        )
        .groupBy("sentence")
        .agg(F.count(F.lit(1)).alias("_sdf"))
    )
    keep = F.col("_sdf") < F.lit(min_doc_freq)
    return (
        exploded.join(doc_freq, "sentence")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_sentences"),
            F.sum((~keep).cast("long")).alias("n_removed"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        # collect_list skips nulls, so the when() keeps
                        # only surviving sentences; sorting the
                        # (pos, sentence) structs restores document
                        # order regardless of collection order
                        F.collect_list(
                            F.when(
                                keep,
                                F.struct(
                                    F.col("pos"), F.col("sentence")
                                ),
                            )
                        )
                    ),
                    lambda s: s.getField("sentence"),
                ),
                sep,
            ).alias("cleaned_text"),
        )
    )


def add_language_guess(df: DataFrame, text_col: str = "text") -> DataFrame:
    """n-gram (stopword-count) language heuristic: score each language
    by stopword hits, argmax with a fixed preference order on ties."""
    t = F.col(text_col)
    for lang, words in STOPWORDS.items():
        df = df.withColumn(f"score_{lang}", stopword_count(t, words))
    en, de, fr, es = (F.col(f"score_{x}") for x in ["en", "de", "fr", "es"])
    guess = (
        F.when((en >= de) & (en >= fr) & (en >= es) & (en > 0), "en")
        .when((de >= fr) & (de >= es) & (de > 0), "de")
        .when((fr >= es) & (fr > 0), "fr")
        .when(es > 0, "es")
        .otherwise("unknown")
    )
    return df.withColumn("lang_guess", guess)


def token_heavy_hitters(
    df: DataFrame,
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` tokens by corpus frequency with document counts — the
    vocabulary heavy-hitter readout (tokenizer coverage checks, stopword
    discovery, Zipf-head inspection).

    Scale shape: one token-keyed aggregate (map-side combined — the
    shuffle carries |vocab| partial counts, not corpus tokens), then
    ``orderBy(...).limit(k)``, which Spark executes as
    TakeOrderedAndProject: each partition contributes at most ``k``
    rows, never a global sort. The rank window afterwards runs over the
    ``k`` surviving rows only. Ties break by token ascending, so the
    cut is deterministic on both engines."""
    toks = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("token")
    )
    counts = toks.groupBy("token").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.countDistinct(id_col).alias("n_docs"),
    )
    top = counts.orderBy(
        F.col("n_occurrences").desc(), F.col("token")
    ).limit(k)
    w = Window.orderBy(F.col("n_occurrences").desc(), F.col("token"))
    return top.withColumn("rank", F.row_number().over(w).cast("long"))


CDC_WINDOW = 3
# Boundary rule: first hex nibble of the window fingerprint in {0, 1}
# => boundary probability 1/8, expected chunk length ~8 tokens.
CDC_BOUNDARY_NIBBLES = ("0", "1")


def cdc_chunk_documents(
    df: DataFrame,
    window: int = CDC_WINDOW,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Content-defined chunking: chunk boundaries fall where the
    fingerprint of the trailing ``window``-token sequence matches a
    bit pattern, so boundaries are a function of CONTENT, not
    position. Insert or delete one token and only the neighbouring
    chunks change — unlike fixed-size chunking, where every downstream
    chunk shifts. That shift-robustness is why CDC is the dedup
    primitive for revision-heavy corpora (wiki dumps, crawl re-fetches,
    code histories): re-chunk a new revision and every unchanged chunk
    re-fingerprints identically for exact dedup against the store.

    Entirely row-local array work (filter over positions + slice per
    chunk), zero shuffle, exact md5/integer arithmetic — no floats
    anywhere. The fingerprint is md5 of the window text, engine-exact;
    a boundary fires when its first hex nibble lands in
    ``CDC_BOUNDARY_NIBBLES`` (p = 1/8 per position). A document
    shorter than ``window`` is one chunk.

    The expensive subtrees are STAGED through intermediate projections
    (round 15): the boundary filter (one md5 per token position) is a
    higher-order function, which codegen evaluates as an interpreted
    fallback with NO common-subexpression elimination — inlined, the
    original single-select form evaluated ``ends`` twice per row (once
    for ``_ends``, once inside ``posexplode``) and ``ends0`` up to
    three times inside each ``ends`` (predicate + both branches).
    Aliasing each stage into a column makes every md5 scan run exactly
    once per row; CollapseProject keeps the stages separate because it
    never inlines a non-cheap alias referenced more than once."""
    toked = df.select(F.col(id_col), tokens(F.col(text_col)).alias("_toks"))
    t = F.col("_toks")
    n = F.size(t)
    ends0 = F.filter(
        F.when(n >= window, F.sequence(F.lit(window), n)).otherwise(
            F.array().cast("array<int>")
        ),
        lambda i: F.substring(
            F.md5(F.concat_ws(" ", F.slice(t, i - window + 1, window))),
            1,
            1,
        ).isin(*CDC_BOUNDARY_NIBBLES),
    )
    staged0 = toked.select(F.col(id_col), t, ends0.alias("_ends0"))
    e0 = F.col("_ends0")
    ends = F.when(
        (F.size(e0) == 0) | (F.element_at(e0, -1) != n),
        F.concat(e0, F.array(n)),
    ).otherwise(e0)
    staged = staged0.select(F.col(id_col), t, ends.alias("_ends"))
    # posexplode_OUTER: identical rows (``_ends`` is non-null and
    # non-empty by construction — the concat branch always appends n),
    # but the outer form stops InferFiltersFromGenerate from injecting
    # a `size(_ends) > 0` Filter that predicate-pushdown would re-inline
    # through the staging aliases, re-duplicating the md5 scan.
    exploded = staged.select(
        F.col(id_col),
        t,
        F.col("_ends"),
        F.posexplode_outer(F.col("_ends")).alias("chunk_id", "_end"),
    )
    start = F.when(F.col("chunk_id") == 0, F.lit(1)).otherwise(
        F.element_at(F.col("_ends"), F.col("chunk_id")) + 1
    )
    return exploded.select(
        F.col(id_col),
        F.col("chunk_id"),
        F.concat_ws(
            " ",
            F.slice(F.col("_toks"), start, F.col("_end") - start + 1),
        ).alias("chunk_text"),
    )


def cdc_crossdoc_stats(
    df: DataFrame,
    window: int = CDC_WINDOW,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Cross-document EXACT-substring dedup at CDC-chunk granularity:
    chunk every document content-defined (:func:`cdc_chunk_documents`),
    fingerprint each chunk, and report per document how much of it
    also appears verbatim in other documents — ``n_chunks``,
    ``n_shared_chunks`` (chunks whose fingerprint occurs in >= 2
    distinct docs), and the drop-decision flag ``mostly_shared``
    (> half the chunks are shared). Because CDC boundaries follow
    content, a paragraph copied between two crawls re-chunks and
    re-fingerprints identically wherever it lands — this is the
    scalable stand-in for suffix-array substring dedup
    (deduplicate-text-datasets) at chunk resolution.

    Scale shape (the sentence-dedup template): per-doc chunking is
    row-local; document frequency per fingerprint needs one
    fingerprint-keyed aggregate — per-doc DISTINCT first
    (groupBy(doc, fp), map-side combined) so the frequency agg is a
    plain count, never a countDistinct rewrite; then one
    fingerprint-keyed join back and one per-doc count. The chunk
    vocabulary of a 100 TB corpus cannot broadcast, so the join back
    is a shuffle — TF-IDF's exact shape. Fractions are exact-int
    ratios of small counts; ``shared_frac`` is engine-exact (one
    division of two exact ints, no accumulation).
    """
    chunks = cdc_chunk_documents(
        df, window=window, id_col=id_col, text_col=text_col
    ).select(
        F.col(id_col), F.md5(F.col("chunk_text")).alias("_fp")
    )
    # lazy lineage cut: doc_fp feeds both the DF aggregate and the
    # join back — materialize the CDC chunk+fingerprint pass once
    # instead of twice (round 14, 0.70x on the sf0.1 gate)
    doc_fp = (
        chunks.groupBy(id_col, "_fp")
        .agg(F.count(F.lit(1)).alias("_occ"))
        .localCheckpoint(eager=False)
    )
    fp_df = doc_fp.groupBy("_fp").agg(F.count(F.lit(1)).alias("_docs"))
    shared = F.col("_docs") >= 2
    return (
        doc_fp.join(fp_df, "_fp")
        .groupBy(id_col)
        .agg(
            F.sum("_occ").cast("long").alias("n_chunks"),
            F.sum(F.when(shared, F.col("_occ")).otherwise(0))
            .cast("long")
            .alias("n_shared_chunks"),
        )
        .withColumn(
            "shared_frac",
            F.col("n_shared_chunks") / F.col("n_chunks"),
        )
        .withColumn("mostly_shared", F.col("shared_frac") > 0.5)
    )


def add_readability(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Flesch reading-ease per document (Flesch 1948; a standard
    corpus-quality prior alongside the Gopher rules): 206.835 −
    1.015·(words/sentences) − 84.6·(syllables/words), with syllables
    approximated as vowel GROUPS per word (the usual regex-only
    estimator) and sentences as [.!?]+ runs, floored at 1 so
    fragment-only documents stay finite. Pure row-local regexp
    counting — zero shuffles, codegen-friendly, and every regex stays
    in the dialect-identical character-class subset."""
    t = F.lower(F.col(text_col))
    words = F.size(F.regexp_extract_all(t, F.lit("[a-z]+"), 0))
    sentences = F.greatest(
        F.size(F.regexp_extract_all(t, F.lit("[.!?]+"), 0)), F.lit(1)
    )
    syllables = F.size(F.regexp_extract_all(t, F.lit("[aeiouy]+"), 0))
    flesch = (
        F.lit(206.835)
        - F.lit(1.015) * (words / sentences)
        - F.lit(84.6) * (syllables / F.greatest(words, F.lit(1)))
    )
    return df.withColumns(
        {
            "n_words": words.cast("long"),
            "n_sentences": sentences.cast("long"),
            "n_syllables": syllables.cast("long"),
            "flesch": F.when(words > 0, flesch),
        }
    )
