"""Text-analysis operators over a document table (SURVEY.md §7.4).

All pure built-in expressions (split/transform/filter/aggregate are
JVM higher-order functions — no Python in the hot path, fully
partition-parallel, no shuffle at all for the row-level stats).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
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
