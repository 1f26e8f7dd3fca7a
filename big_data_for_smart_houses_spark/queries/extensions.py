"""LLM-data-pipeline extension queries (SURVEY.md §7.4) over the
driver's `documents` and `embeddings` tables.

Oracle-backed wherever the computation is hash-free (exact dedup,
n-gram Jaccard — integer set arithmetic, cosine similarity — identical
sequential double folds, text stats, fingerprints, multimodal feature
plumbing). MinHash/SimHash/LSH queries are seeded with xxhash64 and
cannot be replayed in DuckDB — those get rows-only checks, but their
candidate sets are cross-checked against exact Jaccard in unit tests.

Near-dup queries plant duplicates deterministically (docs re-unioned
with shifted ids) so the dedup operators demonstrably *find* dups on
the otherwise-unique synthetic corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..extensions import dedup, multimodal, similarity, text
from ..extensions.sampling import fraction_buckets
from ..functions.numeric import quantize_cols
from ..session import configure_for_oracle_parity
from ..sources.parquet import load_table, spread

PLANT_OFFSET = 100_000
PLANT_N = 50
JACCARD_THRESHOLD = 0.2
TOPK_QUERY_MAX_ID = 10
TOPK_K = 5


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    configure_for_oracle_parity(spark)
    # spread(): the text operators downstream are compute-bound narrow
    # transforms (shingle explode, per-token hashing); parallelism must
    # come from the source partitioning, not the later shuffles.
    return spread(load_table(spark, sf_dir, "documents"), spark)


def _docs_with_planted_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    dups = d.filter(F.col("doc_id") < PLANT_N).withColumn(
        "doc_id", F.col("doc_id") + PLANT_OFFSET
    )
    return d.unionByName(dups)


_PLANTED_CTE = f"""
docs2 AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {PLANT_OFFSET} AS doc_id, text
  FROM documents WHERE doc_id < {PLANT_N}
)
"""


# ---------------------------------------------------------------------------
# Exact dedup (hash-groupBy on normalized fingerprint)
# ---------------------------------------------------------------------------

def q_dedup_exact_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup keepers via text-hash groupBy (extensions/dedup.py:exact_dedup)."""
    return dedup.exact_dedup(_docs_with_planted_dups(spark, sf_dir))


ORACLE_DEDUP_EXACT_DOCUMENTS = f"""
WITH {_PLANTED_CTE}
SELECT md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS fp,
       min(doc_id) AS keeper_id,
       count(*) AS n_copies
FROM docs2 GROUP BY 1
"""


# ---------------------------------------------------------------------------
# n-gram Jaccard near-dup pairs (exact set arithmetic — oracle-safe)
# ---------------------------------------------------------------------------

def q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-trigram Jaccard near-dup pairs (extensions/dedup.py:ngram_jaccard_pairs)."""
    return dedup.ngram_jaccard_pairs(
        _docs_with_planted_dups(spark, sf_dir), threshold=JACCARD_THRESHOLD
    )


# Shared CTE chain: planted corpus -> shingles -> pairwise jaccard,
# reused by the pair query, the connected-components oracle, and the
# PPJoin completeness gate (same exhaustive join at its threshold).
def _jaccard_ctes(threshold: float, planted_filter: str = "TRUE") -> str:
    return f"""{_PLANTED_CTE},
norm AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(text), '\\s+', ' ', 'g'), ' ') AS toks
  FROM docs2 WHERE {planted_filter}
),
sh AS (
  SELECT doc_id, unnest(list_distinct(
           [array_to_string(toks[i:i+2], ' ') for i in range(1, len(toks) - 1)]
         )) AS shingle
  FROM norm WHERE len(toks) >= 3
),
sizes AS (SELECT doc_id, count(*) AS set_size FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS n_inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
jac AS (
  SELECT id1, id2, n_inter, s1.set_size AS size1, s2.set_size AS size2,
         CAST(n_inter AS DOUBLE) / (s1.set_size + s2.set_size - n_inter)
           AS jaccard
  FROM inter
  JOIN sizes s1 ON inter.id1 = s1.doc_id
  JOIN sizes s2 ON inter.id2 = s2.doc_id
  WHERE CAST(n_inter AS DOUBLE) / (s1.set_size + s2.set_size - n_inter)
        >= {threshold}
)"""


_JACCARD_CTES = _jaccard_ctes(JACCARD_THRESHOLD)

ORACLE_NGRAM_JACCARD_PAIRS = f"""
WITH {_JACCARD_CTES}
SELECT id1, id2, n_inter, size1, size2, jaccard FROM jac
"""


# ---------------------------------------------------------------------------
# PPJoin: prefix-filtered exact set-similarity join
# ---------------------------------------------------------------------------

PPJOIN_THRESHOLD = 0.5


def q_ppjoin_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-filtering set-similarity join (extensions/dedup.py:
    ppjoin_pairs — All-Pairs/PPJoin candidate scheme). The oracle is
    the EXHAUSTIVE shared-shingle join at the same threshold, so the
    hash gate proves the prefix + length filters dropped no true pair
    (completeness), not merely that the verifier computes Jaccard
    correctly. Threshold 0.5 (vs the 0.2 blocking gate) so the prefix
    is ~half of each set and the filter does real pruning.

    Gate corpus: the deterministic EVEN-doc_id half of the planted
    corpus (round-8 trim) — the completeness statement (engine pairs
    ≡ exhaustive pairs on the SAME corpus) is corpus-size-invariant,
    and the exhaustive oracle's shared-shingle join is the quadratic
    side of the gate; halving docs sheds ~3/4 of its pairs with
    identical semantics."""
    half = _docs_with_planted_dups(spark, sf_dir).filter(
        F.col("doc_id") % 2 == 0
    )
    return dedup.ppjoin_pairs(half, threshold=PPJOIN_THRESHOLD)


ORACLE_PPJOIN_PAIRS = f"""
WITH {_jaccard_ctes(PPJOIN_THRESHOLD, planted_filter="doc_id % 2 = 0")}
SELECT id1, id2, n_inter, size1, size2, jaccard FROM jac
"""


# ---------------------------------------------------------------------------
# Connected components: near-dup pairs -> dedup groups
# ---------------------------------------------------------------------------

def q_dedup_groups_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairs -> groups: min-label connected components
    (extensions/dedup.py:dedup_groups) over the exact jaccard pair
    graph; every doc reports the minimum doc id of its component.
    Oracle replays the closure with a recursive CTE — a full
    hash-checked gate for an iterative distributed algorithm."""
    d = _docs_with_planted_dups(spark, sf_dir)
    pairs = dedup.ngram_jaccard_pairs(
        d, threshold=JACCARD_THRESHOLD
    ).select("id1", "id2")
    return dedup.dedup_groups(d, pairs)


ORACLE_DEDUP_GROUPS_DOCUMENTS = f"""
WITH RECURSIVE {_JACCARD_CTES},
edges AS (
  SELECT id1 AS src, id2 AS dst FROM jac
  UNION ALL
  SELECT id2 AS src, id1 AS dst FROM jac
),
reach(src, dst) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
)
SELECT d.doc_id,
       CAST(least(d.doc_id, coalesce(min(r.dst), d.doc_id)) AS BIGINT)
         AS group_id
FROM docs2 d LEFT JOIN reach r ON r.src = d.doc_id
GROUP BY d.doc_id
"""


# ---------------------------------------------------------------------------
# MinHash + LSH and SimHash (hash-seeded -> rows-only checks)
# ---------------------------------------------------------------------------

def q_minhash_dedup_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH candidate pairs on the planted-dup corpus; the planted exact
    dups (Jaccard 1.0) must all collide in every band."""
    return dedup.minhash_lsh_pairs(_docs_with_planted_dups(spark, sf_dir))


def q_simhash_dedup_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs, rows-only (extensions/dedup.py:simhash_fingerprints; hash-seeded, no SQL oracle)."""
    return dedup.simhash_neardup_pairs(_docs_with_planted_dups(spark, sf_dir))


# ---------------------------------------------------------------------------
# Dataset assembly: deterministic split + token-budget packing
# ---------------------------------------------------------------------------

TOKEN_BATCH_BUDGET = 2000


def q_dataset_split_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 split (extensions/sampling.py) — pure
    integer hash of doc_id, zero shuffles."""
    from ..extensions.sampling import deterministic_split

    return deterministic_split(_docs(spark, sf_dir)).select(
        "doc_id", "split_bucket", "split"
    )


ORACLE_DATASET_SPLIT_DOCUMENTS = """
SELECT doc_id,
       CAST((doc_id * 2654435761) % 1000 AS BIGINT) AS split_bucket,
       CASE WHEN (doc_id * 2654435761) % 1000 < 900 THEN 'train'
            WHEN (doc_id * 2654435761) % 1000 < 950 THEN 'val'
            ELSE 'test' END AS split
FROM documents
"""


MIX_EN_WEIGHT = 0.7
MIX_OTHER_WEIGHT = 0.3


def q_weighted_corpus_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted mixture (extensions/sampling.py): English
    docs sampled at 0.7, all other languages at 0.3, tagged by
    source — the pretraining data-mixing recipe with zero shuffles."""
    from ..extensions.sampling import weighted_mix

    d = _docs(spark, sf_dir).select("doc_id", "lang")
    return weighted_mix(
        [
            (d.filter(F.col("lang") == "en"), MIX_EN_WEIGHT, "en"),
            (d.filter(F.col("lang") != "en"), MIX_OTHER_WEIGHT, "other"),
        ]
    )


ORACLE_WEIGHTED_CORPUS_MIX = f"""
SELECT doc_id, lang, 'en' AS source FROM documents
WHERE lang = 'en' AND (doc_id * 2654435761) % 1000 < {fraction_buckets(MIX_EN_WEIGHT)}
UNION ALL
SELECT doc_id, lang, 'other' AS source FROM documents
WHERE lang <> 'en' AND (doc_id * 2654435761) % 1000 < {fraction_buckets(MIX_OTHER_WEIGHT)}
"""


def q_token_batch_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget batch packing (extensions/sampling.py) sharded by
    language: exclusive running token sum -> floor-division batch id.
    Integer-exact, so the oracle hash-checks the full assignment."""
    from ..extensions.sampling import pack_token_batches

    d = _docs(spark, sf_dir).withColumn(
        "n_tokens", F.size(F.split(F.col("text"), " ")).cast("long")
    )
    return pack_token_batches(
        d, token_col="n_tokens", budget=TOKEN_BATCH_BUDGET, shard_col="lang"
    ).select("doc_id", "lang", "n_tokens", "batch_id")


ORACLE_TOKEN_BATCH_PACKING = f"""
SELECT doc_id, lang,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       CAST(floor(
         coalesce(sum(len(string_split(text, ' ')))
                    OVER (PARTITION BY lang ORDER BY doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) / {TOKEN_BATCH_BUDGET}
       ) AS BIGINT) AS batch_id
FROM documents
"""


TEMP_MIX_ALPHA = 0.5
TEMP_MIX_BASE_FRAC = 0.5


def q_temperature_mix_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based corpus re-balancing (extensions/sampling.py:
    temperature_mix): per-language keep fraction ∝ n_lang^alpha
    renormalized — alpha=0.5 up-weights low-resource languages, the
    multilingual pretraining recipe. Group counts are one tiny
    broadcast; the corpus never shuffles."""
    from ..extensions.sampling import temperature_mix

    d = _docs(spark, sf_dir).select("doc_id", "lang")
    return temperature_mix(
        d, "lang", alpha=TEMP_MIX_ALPHA, base_frac=TEMP_MIX_BASE_FRAC
    ).select("doc_id", "lang")


# pow() is not guaranteed correctly rounded, so the keep-fraction ->
# bucket bound is float32-quantized on BOTH engines before flooring
# (same rule as the float-aggregate gate contract).
ORACLE_TEMPERATURE_MIX_DOCUMENTS = f"""
WITH counts AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
tot AS (
  SELECT sum(n) AS total, sum(pow(n, {TEMP_MIX_ALPHA})) AS wsum FROM counts
),
fr AS (
  SELECT lang,
         floor(CAST(CAST(
           least(1.0, {TEMP_MIX_BASE_FRAC} * total
                        * (pow(n, {TEMP_MIX_ALPHA}) / wsum) / n)
         AS REAL) AS DOUBLE) * 1000) AS keep_buckets
  FROM counts CROSS JOIN tot
)
SELECT d.doc_id, d.lang
FROM documents d JOIN fr USING (lang)
WHERE (d.doc_id * 2654435761) % 1000 < fr.keep_buckets
"""


LENGTH_BUCKET_WIDTH = 32
LENGTH_PACK_BUDGET = 2000


def q_length_bucketed_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed token packing (extensions/sampling.py:
    pack_length_bucketed): batches contain only similar-length docs so
    pad-to-max waste is bounded by the bucket width — the standard
    sequence-model batching efficiency trick. Integer-exact."""
    from ..extensions.sampling import pack_length_bucketed

    d = _docs(spark, sf_dir).withColumn(
        "n_tokens", F.size(F.split(F.col("text"), " ")).cast("long")
    )
    return pack_length_bucketed(
        d,
        token_col="n_tokens",
        budget=LENGTH_PACK_BUDGET,
        bucket_width=LENGTH_BUCKET_WIDTH,
    ).select("doc_id", "length_bucket", "n_tokens", "batch_id")


ORACLE_LENGTH_BUCKETED_PACKING = f"""
WITH t AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         CAST(floor(len(string_split(text, ' ')) / {LENGTH_BUCKET_WIDTH})
              AS BIGINT) AS length_bucket
  FROM documents
)
SELECT doc_id, length_bucket, n_tokens,
       CAST(floor(
         coalesce(sum(n_tokens)
                    OVER (PARTITION BY length_bucket ORDER BY doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) / {LENGTH_PACK_BUDGET}
       ) AS BIGINT) AS batch_id
FROM t
"""


BOILERPLATE_MIN_DF = 3
BOILERPLATE_FRAC_THRESHOLD = 0.5


def q_boilerplate_ngram_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document boilerplate detection (extensions/dedup.py:
    boilerplate_ngram_stats): trigrams shared by >= 3 documents are
    boilerplate; each doc reports its boilerplate fraction and a drop
    flag — the C4-style repeated-content rule, TF-IDF-shaped at scale
    (shingle-keyed DF join, never broadcast)."""
    return dedup.boilerplate_ngram_stats(
        _docs(spark, sf_dir),
        min_doc_freq=BOILERPLATE_MIN_DF,
        frac_threshold=BOILERPLATE_FRAC_THRESHOLD,
    )


ORACLE_BOILERPLATE_NGRAM_DOCUMENTS = f"""
WITH norm AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(text), '\\s+', ' ', 'g'), ' ') AS toks
  FROM documents
),
sh AS (
  SELECT doc_id, unnest(list_distinct(
           [array_to_string(toks[i:i+2], ' ') for i in range(1, len(toks) - 1)]
         )) AS shingle
  FROM norm WHERE len(toks) >= 3
),
dfreq AS (SELECT shingle, count(*) AS df FROM sh GROUP BY 1),
per_doc AS (
  SELECT sh.doc_id,
         CAST(count(*) AS BIGINT) AS n_shingles,
         CAST(sum(CASE WHEN dfreq.df >= {BOILERPLATE_MIN_DF}
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_boilerplate
  FROM sh JOIN dfreq USING (shingle)
  GROUP BY 1
)
SELECT doc_id, n_shingles, n_boilerplate,
       CAST(n_boilerplate AS DOUBLE) / n_shingles AS boilerplate_frac,
       CAST(n_boilerplate AS DOUBLE) / n_shingles
         >= {BOILERPLATE_FRAC_THRESHOLD} AS is_boilerplate
FROM per_doc
"""


# ---------------------------------------------------------------------------
# Text analysis (oracle-safe: pure string/list arithmetic)
# ---------------------------------------------------------------------------

def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-local text statistics (extensions/text.py:add_text_stats)."""
    d = text.add_text_stats(_docs(spark, sf_dir))
    return d.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_bpe_tokens").cast("long").alias("n_bpe_tokens"),
        F.col("n_chars_computed").cast("long").alias("n_chars_computed"),
        "avg_token_len",
        F.col("n_stopwords").cast("long").alias("n_stopwords"),
        "stopword_ratio",
    )


_STOP = ",".join(f"'{w}'" for w in text.QUALITY_STOPWORDS)

ORACLE_TEXT_STATS = f"""
WITH t AS (
  SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents
)
SELECT doc_id,
       len(toks) AS n_tokens,
       len(regexp_extract_all(lower(text), '{text.BPE_TOKEN_RE}')) AS n_bpe_tokens,
       length(text) AS n_chars_computed,
       CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks)
         AS avg_token_len,
       len(list_filter(toks, x -> x IN ({_STOP}))) AS n_stopwords,
       CAST(len(list_filter(toks, x -> x IN ({_STOP}))) AS DOUBLE) / len(toks)
         AS stopword_ratio
FROM t
"""


def q_text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality score (extensions/text.py:add_quality_score)."""
    d = text.add_quality_score(_docs(spark, sf_dir))
    # text_quality gate-quantized: DuckDB evaluates the 0.3/0.2 penalty
    # literals in exact DECIMAL arithmetic, Spark in double — ulp diffs
    return quantize_cols(
        d.select("doc_id", "text_quality", "is_quality"), "text_quality"
    )


ORACLE_TEXT_QUALITY_SCORE = f"""
WITH t AS (
  SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents
), s AS (
  SELECT doc_id,
         len(toks) AS n_tokens,
         length(text) AS n_chars,
         CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks)
           AS avg_len,
         CAST(len(list_filter(toks, x -> x IN ({_STOP}))) AS DOUBLE) / len(toks)
           AS stop_ratio
  FROM t
), q AS (
  SELECT doc_id,
         1.0 - (CASE WHEN n_tokens < 10 THEN 0.3 ELSE 0.0 END)
             - (CASE WHEN stop_ratio < 0.01 THEN 0.2 ELSE 0.0 END)
             - (CASE WHEN avg_len > 12 OR avg_len < 2 THEN 0.2 ELSE 0.0 END)
             - (CASE WHEN n_chars < 50 THEN 0.2 ELSE 0.0 END) AS text_quality
  FROM s
)
SELECT doc_id, CAST(CAST(text_quality AS REAL) AS DOUBLE) AS text_quality,
       text_quality >= 0.5 AS is_quality
FROM q
"""


def q_language_guess(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram language ID (extensions/text.py:add_language_guess)."""
    d = text.add_language_guess(_docs(spark, sf_dir))
    return d.select(
        "doc_id",
        "lang",
        "lang_guess",
        (F.col("lang") == F.col("lang_guess")).alias("is_match"),
    )


def _lang_score_sql(lang: str) -> str:
    words = ",".join(f"'{w}'" for w in text.STOPWORDS[lang])
    return f"len(list_filter(string_split(text, ' '), x -> x IN ({words})))"


ORACLE_LANGUAGE_GUESS = f"""
WITH s AS (
  SELECT doc_id, lang,
         {_lang_score_sql('en')} AS en,
         {_lang_score_sql('de')} AS de,
         {_lang_score_sql('fr')} AS fr,
         {_lang_score_sql('es')} AS es
  FROM documents
), g AS (
  SELECT doc_id, lang,
         CASE WHEN en >= de AND en >= fr AND en >= es AND en > 0 THEN 'en'
              WHEN de >= fr AND de >= es AND de > 0 THEN 'de'
              WHEN fr >= es AND fr > 0 THEN 'fr'
              WHEN es > 0 THEN 'es'
              ELSE 'unknown' END AS lang_guess
  FROM s
)
SELECT doc_id, lang, lang_guess, lang = lang_guess AS is_match FROM g
"""


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash document fingerprints (extensions/text.py:fingerprint)."""
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        text.fingerprint(F.col("text")).alias("fp"),
        F.substring(text.fingerprint(F.col("text")), 1, 4).alias("fp_bucket"),
    )


ORACLE_DOC_FINGERPRINT = """
SELECT doc_id,
       md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS fp,
       substr(md5(regexp_replace(lower(text), '\\s+', ' ', 'g')), 1, 4) AS fp_bucket
FROM documents
"""


def q_token_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language token statistics rollup (extensions/text.py)."""
    d = text.add_text_stats(_docs(spark, sf_dir))
    return d.groupBy("lang").agg(
        F.sum(F.col("n_tokens").cast("long")).alias("total_tokens"),
        F.avg("n_tokens").alias("avg_tokens"),
        F.sum(F.col("n_bpe_tokens").cast("long")).alias("total_bpe_tokens"),
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("n_chars_computed").alias("avg_chars"),
    )


ORACLE_TOKEN_STATS_BY_LANG = f"""
WITH t AS (
  SELECT lang, len(string_split(text, ' ')) AS n_tokens,
         len(regexp_extract_all(lower(text), '{text.BPE_TOKEN_RE}')) AS n_bpe,
         length(text) AS n_chars
  FROM documents
)
SELECT lang,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       avg(n_tokens) AS avg_tokens,
       CAST(sum(n_bpe) AS BIGINT) AS total_bpe_tokens,
       count(*) AS n_docs,
       avg(n_chars) AS avg_chars
FROM t GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Embedding similarity (oracle-safe: identical sequential double folds)
# ---------------------------------------------------------------------------

def q_embedding_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k baseline (extensions/similarity.py:brute_force_topk)."""
    configure_for_oracle_parity(spark)
    emb = spread(load_table(spark, sf_dir, "embeddings"), spark)
    queries = emb.filter(F.col("vec_id") < TOPK_QUERY_MAX_ID)
    return similarity.brute_force_topk(emb, queries, k=TOPK_K)


ORACLE_EMBEDDING_COSINE_TOPK = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {TOPK_QUERY_MAX_ID}),
scored AS (
  SELECT query_id, e.vec_id AS neighbor_id,
         list_dot_product(qv, v)
           / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v)))
           AS cosine_sim
  FROM e CROSS JOIN q WHERE e.vec_id <> query_id
)
SELECT query_id, neighbor_id, cosine_sim, rank FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                 ORDER BY cosine_sim DESC, neighbor_id) AS INT) AS rank
  FROM scored
) WHERE rank <= {TOPK_K}
"""


# Planted embedding near-dups: 50 vectors re-appear with shifted ids
# and a +0.01 per-coordinate perturbation (cosine ~0.9968 to the
# original — genuine near-dups, not byte-identical). The shift is
# plain double arithmetic, so the oracle replays it bit-exactly.
EMB_PLANT_N = 50
EMB_PLANT_OFFSET = 100_000
EMB_PLANT_SHIFT = 0.01
# 0.95 is the documented minimum supported threshold for the banded
# hyperplane LSH path (similarity.NEARDUP_MIN_THRESHOLD): below it the
# band count needed to hold recall goes near-quadratic. The planted
# pairs sit at cosine ~0.9968 and random 64-dim embeddings have no
# organic pairs above ~0.52, so the gate's answer set is the same as at
# the old 0.7 setting — but now inside the family's honest regime.
NEARDUP_LSH_THRESHOLD = 0.95


def _emb_with_planted_neardups(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spread(load_table(spark, sf_dir, "embeddings"), spark).select(
        "vec_id", similarity.as_double(F.col("embedding")).alias("embedding")
    )
    planted = emb.filter(F.col("vec_id") < EMB_PLANT_N).select(
        (F.col("vec_id") + EMB_PLANT_OFFSET).alias("vec_id"),
        F.transform(
            F.col("embedding"), lambda x: x + F.lit(EMB_PLANT_SHIFT)
        ).alias("embedding"),
    )
    return emb.unionByName(planted)


def q_embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs via banded-LSH candidates + exact cosine verify
    (extensions/similarity.py:neardup_pairs_lsh) — the sub-quadratic
    plan. The brute-force O(n²) baseline (similarity.neardup_pairs)
    survives as the unit-test cross-check only; parity between the two
    at this threshold is asserted in tests/test_extensions.py."""
    configure_for_oracle_parity(spark)
    return similarity.neardup_pairs_lsh(
        _emb_with_planted_neardups(spark, sf_dir),
        threshold=NEARDUP_LSH_THRESHOLD,
    )


# The oracle is the brute-force pair scan (quadratic is fine in DuckDB
# at gate scale) over the same planted corpus — so the gate verifies
# that LSH candidate generation + exact verification reproduces the
# full answer set.
ORACLE_EMBEDDING_NEARDUP_PAIRS = f"""
WITH e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
e AS (
  SELECT vec_id, v FROM e0
  UNION ALL
  SELECT vec_id + {EMB_PLANT_OFFSET} AS vec_id,
         list_transform(v, x -> x + {EMB_PLANT_SHIFT}) AS v
  FROM e0 WHERE vec_id < {EMB_PLANT_N}
)
SELECT a.vec_id AS id1, b.vec_id AS id2,
       list_dot_product(a.v, b.v)
         / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
         AS cosine_sim
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE list_dot_product(a.v, b.v)
        / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
      >= {NEARDUP_LSH_THRESHOLD}
"""


def q_embedding_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH bucketed ANN — rows-only check (the bucket
    assignment uses fixed pseudo-random planes DuckDB can't replay);
    recall vs brute force is asserted in unit tests."""
    configure_for_oracle_parity(spark)
    emb = spread(load_table(spark, sf_dir, "embeddings"), spark)
    queries = emb.filter(F.col("vec_id") < TOPK_QUERY_MAX_ID)
    return similarity.ann_lsh_topk(emb, queries, k=TOPK_K)


# ---------------------------------------------------------------------------
# Multimodal plumbing (mapInPandas over BinaryType; byte-level oracle)
# ---------------------------------------------------------------------------

def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal feature extraction via Arrow-batched mapInPandas (extensions/multimodal.py)."""
    assets = multimodal.attach_payloads(_docs(spark, sf_dir))
    return multimodal.extract_features(assets)


ORACLE_MULTIMODAL_FEATURES = """
SELECT doc_id,
       CASE WHEN doc_id % 3 = 0 THEN 'image'
            WHEN doc_id % 3 = 1 THEN 'audio'
            ELSE 'video' END AS modality,
       CASE WHEN doc_id % 3 = 0 THEN 'image/png'
            WHEN doc_id % 3 = 1 THEN 'audio/wav'
            ELSE 'video/mp4' END AS mime_type,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
FROM documents
"""


def q_embedding_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (k-means inverted file) ANN — rows-only check (centroid
    training isn't SQL-replayable); recall vs brute force asserted in
    unit tests. Centroids train on the corpus with a fixed seed, so
    the result is deterministic."""
    configure_for_oracle_parity(spark)
    emb = spread(load_table(spark, sf_dir, "embeddings"), spark)
    queries = emb.filter(F.col("vec_id") < TOPK_QUERY_MAX_ID)
    centroids = similarity.train_ivf_centroids(emb, n_cells=8)
    return similarity.ann_ivf_topk(emb, queries, centroids, k=TOPK_K, n_probe=3)


# ---------------------------------------------------------------------------
# Recall-invariant gates for the hash-seeded sketches (minhash / simhash
# / ANN-LSH / ANN-IVF). The sketches themselves can't be replayed in
# SQL, but their RECALL against an exactly-computable truth set can be
# hash-gated: the Spark side returns truth-set rows that the sketch
# recovered; the oracle returns the FULL truth set. Any truth row the
# sketch misses is a row-count mismatch => hard driver failure — so the
# rows-only status of the sketch queries is now backed by a gated
# invariant, not just a count.
# ---------------------------------------------------------------------------

_FP_SQL = "md5(regexp_replace(lower(text), '\\s+', ' ', 'g'))"


def _exact_dup_truth_pairs(d: DataFrame) -> DataFrame:
    """All (id1 < id2) pairs of documents with identical normalized
    fingerprints — the Jaccard-1.0 truth set (planted dups plus any
    organic exact dups in the corpus, e.g. sf0.1 has 8)."""
    fps = d.select(F.col("doc_id"), dedup.fingerprint(F.col("text")).alias("fp"))
    a = fps.select(F.col("fp"), F.col("doc_id").alias("id1"))
    b = fps.select(F.col("fp"), F.col("doc_id").alias("id2"))
    return a.join(b, "fp").filter(F.col("id1") < F.col("id2")).select("id1", "id2")


_TRUTH_PAIRS_SQL = f"""
fps AS (SELECT doc_id, {_FP_SQL} AS fp FROM docs2),
truth AS (
  SELECT a.doc_id AS id1, b.doc_id AS id2
  FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
)
"""


def q_minhash_recall_exact_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH recall gate: every identical-text pair (Jaccard 1.0)
    MUST appear in the LSH candidate set — identical shingle sets give
    identical signatures, so every band collides (a structural
    guarantee, not a probabilistic one). Spark returns truth ∩
    candidates; the oracle returns the full truth set; a single missed
    pair fails the hash/row gate."""
    d = _docs_with_planted_dups(spark, sf_dir)
    cands = dedup.minhash_lsh_pairs(d).select("id1", "id2")
    return _exact_dup_truth_pairs(d).join(cands, ["id1", "id2"])


ORACLE_MINHASH_RECALL_EXACT_DUPS = f"""
WITH {_PLANTED_CTE},
{_TRUTH_PAIRS_SQL}
SELECT id1, id2 FROM truth
"""


def q_simhash_recall_exact_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash recall gate: identical texts have identical 64-bit
    fingerprints (hamming 0 <= 3), and the 4x16-bit banding pigeonhole
    guarantees any hamming<=3 pair agrees on a full band — so every
    truth pair must be recovered. Same truth-∩-candidates vs
    full-truth-oracle shape as the MinHash gate."""
    d = _docs_with_planted_dups(spark, sf_dir)
    cands = dedup.simhash_neardup_pairs(d).select("id1", "id2")
    return _exact_dup_truth_pairs(d).join(cands, ["id1", "id2"])


ORACLE_SIMHASH_RECALL_EXACT_DUPS = ORACLE_MINHASH_RECALL_EXACT_DUPS


def q_ann_lsh_recall_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN-LSH recall gate: each planted near-twin (cosine ~0.9968 —
    the corpus' global-max similarity, far above the ~0.52 organic
    ceiling) must surface as its query's rank-1 neighbor through the
    bucket + hamming-1 multiprobe path. Spark returns the twin rows the
    ANN search recovered; the oracle enumerates all planted twins with
    the exact cosine — a missed twin is a row mismatch."""
    configure_for_oracle_parity(spark)
    corpus = _emb_with_planted_neardups(spark, sf_dir)
    queries = corpus.filter(F.col("vec_id") < EMB_PLANT_N)
    topk = similarity.ann_lsh_topk(corpus, queries, k=TOPK_K)
    return topk.filter(
        F.col("neighbor_id") == F.col("query_id") + EMB_PLANT_OFFSET
    )


_ANN_RECALL_ORACLE = f"""
WITH e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
pairs AS (
  SELECT vec_id AS query_id,
         vec_id + {EMB_PLANT_OFFSET} AS neighbor_id,
         v AS qv, list_transform(v, x -> x + {EMB_PLANT_SHIFT}) AS nv
  FROM e0 WHERE vec_id < {EMB_PLANT_N}
)
SELECT query_id, neighbor_id,
       list_dot_product(qv, nv)
         / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(nv, nv)))
         AS cosine_sim,
       CAST(1 AS INT) AS rank
FROM pairs
"""

ORACLE_ANN_LSH_RECALL_PLANTED = _ANN_RECALL_ORACLE


def q_ann_ivf_recall_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN-IVF recall gate: same planted-twin invariant through the IVF
    path — the twin's cell must land inside the query's n_probe nearest
    cells (a +0.01 shift moves a vector a tiny fraction of a cell
    radius, so query and twin quantize together). Centroids train on
    the planted corpus with a fixed seed => deterministic."""
    configure_for_oracle_parity(spark)
    corpus = _emb_with_planted_neardups(spark, sf_dir)
    queries = corpus.filter(F.col("vec_id") < EMB_PLANT_N)
    centroids = similarity.train_ivf_centroids(corpus, n_cells=8)
    topk = similarity.ann_ivf_topk(
        corpus, queries, centroids, k=TOPK_K, n_probe=3
    )
    return topk.filter(
        F.col("neighbor_id") == F.col("query_id") + EMB_PLANT_OFFSET
    )


ORACLE_ANN_IVF_RECALL_PLANTED = _ANN_RECALL_ORACLE


# ---------------------------------------------------------------------------
# Incremental-ingestion dedup, two-batch gate (VERDICT r2 #6)
# ---------------------------------------------------------------------------

INCR_BATCH_MOD = 4  # history = doc_id % 4 != 0; incoming = the rest + plants


def q_dedup_incremental_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-batch incremental dedup (extensions/dedup.py:
    dedup_against_history): batch 1 (three quarters of the corpus)
    persists only its fingerprint store; batch 2 (the remaining
    quarter, plus planted copies of the first 50 docs) anti-joins that
    store, then dedups within itself. Exercises all three paths:
    cross-batch drop (plants of history docs), within-batch keep-min
    (plants of incoming docs), and fresh keeps."""
    d = _docs(spark, sf_dir)
    history = d.filter(F.col("doc_id") % INCR_BATCH_MOD != 0)
    history_fps = dedup.exact_dedup(history).select("fp")
    incoming = d.filter(F.col("doc_id") % INCR_BATCH_MOD == 0).unionByName(
        d.filter(F.col("doc_id") < PLANT_N).withColumn(
            "doc_id", F.col("doc_id") + PLANT_OFFSET
        )
    )
    return dedup.dedup_against_history(incoming, history_fps).select(
        "doc_id", "fp"
    )


def q_minhash_incremental_recall(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Incremental MinHash-LSH recall gate (extensions/dedup.py:
    minhash_lsh_pairs_incremental — the NEAR-dup counterpart of the
    exact fingerprint store above): history persists only its band
    rows (minhash_band_rows, never re-shingled); the incoming batch
    carries planted identical copies of 1) HISTORY docs — the
    cross-boundary class, findable only through the store equi-join —
    and 2) its own docs — the within-batch class, findable only
    through the batch's bucket fold. Identical texts give identical
    signatures, so every truth pair collides in EVERY band on its
    respective path: recall 1.0 structurally for both classes. Spark
    returns truth ∩ candidates labeled by class; the oracle
    enumerates the planted pairs; one missed pair on either path
    fails the row gate."""
    d = _docs(spark, sf_dir)
    history = d.filter(F.col("doc_id") % INCR_BATCH_MOD != 0)
    store = dedup.minhash_band_rows(history)
    plants_hist = (
        d.filter(
            (F.col("doc_id") < PLANT_N)
            & (F.col("doc_id") % INCR_BATCH_MOD != 0)
        )
        .withColumn("doc_id", F.col("doc_id") + PLANT_OFFSET)
    )
    plants_batch = (
        d.filter(
            (F.col("doc_id") < PLANT_N)
            & (F.col("doc_id") % INCR_BATCH_MOD == 0)
        )
        .withColumn("doc_id", F.col("doc_id") + 2 * PLANT_OFFSET)
    )
    incoming = (
        d.filter(F.col("doc_id") % INCR_BATCH_MOD == 0)
        .unionByName(plants_hist)
        .unionByName(plants_batch)
    )
    cands = dedup.minhash_lsh_pairs_incremental(incoming, store).select(
        "id1", "id2"
    )
    truth = (
        d.filter(
            (F.col("doc_id") < PLANT_N)
            & (F.col("doc_id") % INCR_BATCH_MOD != 0)
        )
        .select(
            F.col("doc_id").alias("id1"),
            (F.col("doc_id") + PLANT_OFFSET).alias("id2"),
            F.lit("history").alias("via"),
        )
        .unionByName(
            d.filter(
                (F.col("doc_id") < PLANT_N)
                & (F.col("doc_id") % INCR_BATCH_MOD == 0)
            ).select(
                F.col("doc_id").alias("id1"),
                (F.col("doc_id") + 2 * PLANT_OFFSET).alias("id2"),
                F.lit("batch").alias("via"),
            )
        )
    )
    return truth.join(cands, ["id1", "id2"]).select("id1", "id2", "via")


ORACLE_MINHASH_INCREMENTAL_RECALL = f"""
SELECT doc_id AS id1, doc_id + {PLANT_OFFSET} AS id2,
       'history' AS via
FROM documents
WHERE doc_id < {PLANT_N} AND doc_id % {INCR_BATCH_MOD} <> 0
UNION ALL
SELECT doc_id AS id1, doc_id + {2 * PLANT_OFFSET} AS id2,
       'batch' AS via
FROM documents
WHERE doc_id < {PLANT_N} AND doc_id % {INCR_BATCH_MOD} = 0
"""



ORACLE_DEDUP_INCREMENTAL_DOCUMENTS = f"""
WITH hist AS (
  SELECT DISTINCT {_FP_SQL} AS fp FROM documents
  WHERE doc_id % {INCR_BATCH_MOD} <> 0
),
incoming AS (
  SELECT doc_id, text FROM documents WHERE doc_id % {INCR_BATCH_MOD} = 0
  UNION ALL
  SELECT doc_id + {PLANT_OFFSET} AS doc_id, text
  FROM documents WHERE doc_id < {PLANT_N}
),
fps AS (SELECT doc_id, {_FP_SQL} AS fp FROM incoming),
fresh AS (
  SELECT doc_id, fp FROM fps WHERE fp NOT IN (SELECT fp FROM hist)
),
ranked AS (
  SELECT doc_id, fp,
         row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
  FROM fresh
)
SELECT doc_id, fp FROM ranked WHERE rn = 1
"""


FRAME_SAMPLE_EVERY_N = 10
FRAME_BYTES = 25


def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling fan-out through mapInPandas: one video row
    emits one row per sampled frame. The oracle replays the
    deterministic fake decoder with blob slicing."""
    assets = multimodal.attach_payloads(_docs(spark, sf_dir))
    frames = multimodal.sample_frames(assets, every_n=FRAME_SAMPLE_EVERY_N)
    # binary -> hex at the comparison boundary: bytes round-trip through
    # pandas as bytearray-vs-bytes depending on engine, which breaks
    # naive value hashing; hex strings compare unambiguously
    return frames.select(
        "doc_id", "frame_index", F.hex(F.col("frame")).alias("frame_hex")
    )


# documents.text is pure ASCII at every SF (verified), so character
# slicing on the VARCHAR equals byte slicing on the BLOB — DuckDB's
# substring() has no BLOB overload.
ORACLE_MULTIMODAL_FRAME_SAMPLE = f"""
WITH v AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 3 = 2
), f AS (
  SELECT doc_id, text,
         unnest(range(0,
                      greatest(1, length(text) // {FRAME_BYTES}),
                      {FRAME_SAMPLE_EVERY_N})) AS frame_index
  FROM v
)
SELECT doc_id, frame_index,
       upper(hex(encode(substring(text,
                                  CAST(frame_index * {FRAME_BYTES} + 1 AS INT),
                                  {FRAME_BYTES})))) AS frame_hex
FROM f
"""


def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata via the deterministic fake decoder
    (extensions/multimodal.py:84). Fully oracle-checked: the fake
    decoder's byte-sum digest over ASCII payloads is replayable in SQL
    as a char-ordinal sum, so the mapInPandas plumbing gets a real
    hash gate, not just a rows-only check."""
    assets = multimodal.attach_payloads(_docs(spark, sf_dir))
    return multimodal.decode_metadata(assets)


# Replays fake_decode (extensions/multimodal.py:84): digest = sum of
# the first 64 payload bytes; documents.text is pure ASCII, so
# ord(char) == byte value.
ORACLE_MULTIMODAL_DECODE = """
WITH d AS (
  SELECT doc_id,
         CAST(list_sum(list_transform(split(substring(text, 1, 64), ''),
                                      x -> ord(x))) AS BIGINT) AS digest,
         CAST(length(text) AS BIGINT) AS n
  FROM documents
)
SELECT doc_id,
       CASE WHEN doc_id % 3 = 0 THEN 'image'
            WHEN doc_id % 3 = 1 THEN 'audio'
            ELSE 'video' END AS modality,
       CASE WHEN doc_id % 3 = 0 THEN 16 + digest % 240
            WHEN doc_id % 3 = 1 THEN CAST(NULL AS BIGINT)
            ELSE 320 END AS width,
       CASE WHEN doc_id % 3 = 0 THEN 16 + (digest * 7) % 240
            WHEN doc_id % 3 = 1 THEN CAST(NULL AS BIGINT)
            ELSE 240 END AS height,
       CASE WHEN doc_id % 3 = 0 THEN CAST(NULL AS BIGINT)
            WHEN doc_id % 3 = 1 THEN n * 10
            ELSE n * 40 END AS duration_ms,
       CASE WHEN doc_id % 3 = 2 THEN greatest(1, n // 25)
            ELSE CAST(NULL AS BIGINT) END AS n_frames
FROM d
"""


QUERIES = {
    "dedup_exact_documents": q_dedup_exact_documents,
    "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
    "ppjoin_pairs_documents": q_ppjoin_pairs,
    "dedup_groups_documents": q_dedup_groups_documents,
    "dataset_split_documents": q_dataset_split_documents,
    "token_batch_packing": q_token_batch_packing,
    "weighted_corpus_mix": q_weighted_corpus_mix,
    "minhash_dedup_documents": q_minhash_dedup_documents,
    "simhash_dedup_documents": q_simhash_dedup_documents,
    "text_stats": q_text_stats,
    "text_quality_score": q_text_quality_score,
    "language_guess": q_language_guess,
    "doc_fingerprint": q_doc_fingerprint,
    "token_stats_by_lang": q_token_stats_by_lang,
    "embedding_cosine_topk": q_embedding_cosine_topk,
    "embedding_neardup_pairs": q_embedding_neardup_pairs,
    "embedding_ann_lsh": q_embedding_ann_lsh,
    "embedding_ann_ivf": q_embedding_ann_ivf,
    "multimodal_features": q_multimodal_features,
    "multimodal_frame_sample": q_multimodal_frame_sample,
    "multimodal_decode": q_multimodal_decode,
    "minhash_recall_exact_dups": q_minhash_recall_exact_dups,
    "simhash_recall_exact_dups": q_simhash_recall_exact_dups,
    "ann_lsh_recall_planted": q_ann_lsh_recall_planted,
    "ann_ivf_recall_planted": q_ann_ivf_recall_planted,
    "dedup_incremental_documents": q_dedup_incremental_documents,
    "temperature_mix_documents": q_temperature_mix_documents,
    "length_bucketed_packing": q_length_bucketed_packing,
    "boilerplate_ngram_documents": q_boilerplate_ngram_documents,
}

ORACLES = {
    "dedup_exact_documents": ORACLE_DEDUP_EXACT_DOCUMENTS,
    "ngram_jaccard_pairs": ORACLE_NGRAM_JACCARD_PAIRS,
    "ppjoin_pairs_documents": ORACLE_PPJOIN_PAIRS,
    "dedup_groups_documents": ORACLE_DEDUP_GROUPS_DOCUMENTS,
    "dataset_split_documents": ORACLE_DATASET_SPLIT_DOCUMENTS,
    "token_batch_packing": ORACLE_TOKEN_BATCH_PACKING,
    "weighted_corpus_mix": ORACLE_WEIGHTED_CORPUS_MIX,
    "text_stats": ORACLE_TEXT_STATS,
    "text_quality_score": ORACLE_TEXT_QUALITY_SCORE,
    "language_guess": ORACLE_LANGUAGE_GUESS,
    "doc_fingerprint": ORACLE_DOC_FINGERPRINT,
    "token_stats_by_lang": ORACLE_TOKEN_STATS_BY_LANG,
    "embedding_cosine_topk": ORACLE_EMBEDDING_COSINE_TOPK,
    "embedding_neardup_pairs": ORACLE_EMBEDDING_NEARDUP_PAIRS,
    "multimodal_features": ORACLE_MULTIMODAL_FEATURES,
    "multimodal_frame_sample": ORACLE_MULTIMODAL_FRAME_SAMPLE,
    "multimodal_decode": ORACLE_MULTIMODAL_DECODE,
    "minhash_recall_exact_dups": ORACLE_MINHASH_RECALL_EXACT_DUPS,
    "simhash_recall_exact_dups": ORACLE_SIMHASH_RECALL_EXACT_DUPS,
    "ann_lsh_recall_planted": ORACLE_ANN_LSH_RECALL_PLANTED,
    "ann_ivf_recall_planted": ORACLE_ANN_IVF_RECALL_PLANTED,
    "dedup_incremental_documents": ORACLE_DEDUP_INCREMENTAL_DOCUMENTS,
    "temperature_mix_documents": ORACLE_TEMPERATURE_MIX_DOCUMENTS,
    "length_bucketed_packing": ORACLE_LENGTH_BUCKETED_PACKING,
    "boilerplate_ngram_documents": ORACLE_BOILERPLATE_NGRAM_DOCUMENTS,
}


# ---------------------------------------------------------------------------
# Edit-distance near-dup recall gate (typo-planted)
# ---------------------------------------------------------------------------

TYPO_MARK = "~"


def _docs_with_planted_typos(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each of the first PLANT_N docs gains a copy (shifted id) with
    ONE character substituted at a doc_id-derived position — the
    corpus contains no '~' (asserted at testdata generation sizes), so
    every planted pair is at edit distance exactly 1 and equal
    length."""
    d = _docs(spark, sf_dir)
    typos = (
        d.filter(F.col("doc_id") < PLANT_N)
        .withColumn("_p", (F.pmod(F.col("doc_id"), F.lit(40)) + 1).cast("int"))
        .withColumn(
            "text",
            F.expr(
                f"concat(substring(text, 1, _p - 1), '{TYPO_MARK}', "
                "substring(text, _p + 1, length(text)))"
            ),
        )
        .withColumn("doc_id", F.col("doc_id") + PLANT_OFFSET)
        .drop("_p")
    )
    return d.unionByName(typos)


def q_editdist_recall_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance near-dup recall gate
    (extensions/dedup.py:editdist_blocked_pairs): every planted
    one-substitution pair MUST surface through the prefix/suffix
    blocking — a single edit cannot corrupt both the 8-char prefix and
    the 8-char suffix of a >= 44-char text, so each planted pair
    collides in at least one block (structural recall 1.0, the
    MinHash-gate contract). Spark returns truth ∩ candidates with the
    computed distance; the oracle enumerates the planted pairs at
    their known distance 1; one missed pair fails the row gate."""
    d = _docs_with_planted_typos(spark, sf_dir)
    pairs = dedup.editdist_blocked_pairs(d, max_dist=1)
    truth = d.filter(F.col("doc_id") < PLANT_N).select(
        F.col("doc_id").alias("id1"),
        (F.col("doc_id") + PLANT_OFFSET).alias("id2"),
    )
    return truth.join(pairs, ["id1", "id2"]).select(
        "id1", "id2", "edit_dist"
    )


ORACLE_EDITDIST_RECALL_PLANTED = f"""
SELECT doc_id AS id1,
       doc_id + {PLANT_OFFSET} AS id2,
       CAST(1 AS INT) AS edit_dist
FROM documents WHERE doc_id < {PLANT_N}
"""

QUERIES["editdist_recall_planted"] = q_editdist_recall_planted
ORACLES["editdist_recall_planted"] = ORACLE_EDITDIST_RECALL_PLANTED
QUERIES["minhash_incremental_recall"] = q_minhash_incremental_recall
ORACLES["minhash_incremental_recall"] = ORACLE_MINHASH_INCREMENTAL_RECALL


def q_edit1_neighborhood_customer(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """COMPLETENESS gate for the SymSpell deletion-neighborhood join
    (extensions/dedup.py:deletion_neighborhood_pairs, round 9): ALL
    edit-distance<=1 customer-name pairs — including the
    insertion/deletion pairs the (prefix|suffix, length) blocking of
    editdist_blocked_pairs structurally cannot see — against an
    EXHAUSTIVE O(n^2) levenshtein self-join oracle, the same
    proof-shape as the PPJoin gate. TPC-H names ('Customer#...') are
    dense in Hamming-1 neighbors, so the truth set is large and
    non-trivial (one digit substitution apart), while the engine
    never materializes an all-pairs join: candidates come only from
    shared deletion-neighborhood keys."""
    configure_for_oracle_parity(spark)
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name"
    )
    return dedup.deletion_neighborhood_pairs(
        c, id_col="c_custkey", text_col="c_name"
    ).select("id1", "id2", "edit_dist")


ORACLE_EDIT1_NEIGHBORHOOD_CUSTOMER = """
SELECT a.c_custkey AS id1, b.c_custkey AS id2,
       CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS edit_dist
FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) <= 1
"""

QUERIES["edit1_neighborhood_customer"] = q_edit1_neighborhood_customer
ORACLES["edit1_neighborhood_customer"] = (
    ORACLE_EDIT1_NEIGHBORHOOD_CUSTOMER
)


PR_ITERS = 5
PR_DAMPING = 0.85


def q_pagerank_user_transitions(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PageRank (extensions/graph.py:pagerank) over the user-transition
    graph: an edge u->v for each consecutive event pair within a day
    where the acting user changes, weighted by transition count (the
    link-centrality quality prior a crawl-curation pipeline computes
    over its link graph). Edge derivation is a DAY-partitioned window
    — never an unpartitioned global sort — then 5 fixed iterations of
    the join+aggregate superstep; ranks are a probability distribution
    and ship through the float32 gate quantization."""
    from pyspark.sql import Window

    from ..extensions.graph import pagerank

    configure_for_oracle_parity(spark)
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy(F.to_date("ts")).orderBy("ts", "event_id")
    edges = (
        ev.select(
            "user_id", F.lag("user_id").over(w).alias("prev_user")
        )
        .filter(
            F.col("prev_user").isNotNull()
            & (F.col("prev_user") != F.col("user_id"))
        )
        .groupBy(
            F.col("prev_user").alias("src"), F.col("user_id").alias("dst")
        )
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
    )
    ranks = pagerank(
        edges, weight="w", iterations=PR_ITERS, damping=PR_DAMPING
    )
    return quantize_cols(
        ranks.select(F.col("id").alias("user_id"), "rank"), "rank"
    )


def _pagerank_oracle_sql(iters: int, d: float) -> str:
    """Unrolled fixed-iteration PageRank in ANSI SQL: one
    (dangling-mass, contribution, rank) CTE triple per iteration —
    the oracle mirror of the operator's superstep loop."""
    parts = [
        f"""
WITH seq AS (
  SELECT user_id,
         lag(user_id) OVER (
           PARTITION BY CAST(ts AS DATE) ORDER BY ts, event_id
         ) AS prev_user
  FROM events
),
edges0 AS (
  SELECT prev_user AS src, user_id AS dst,
         CAST(count(*) AS DOUBLE) AS w
  FROM seq
  WHERE prev_user IS NOT NULL AND prev_user <> user_id
  GROUP BY 1, 2
),
outw AS (SELECT src, sum(w) AS out_w FROM edges0 GROUP BY src),
edges AS (
  SELECT e.src, e.dst, e.w / o.out_w AS frac
  FROM edges0 e JOIN outw o ON e.src = o.src
),
nodes AS (SELECT src AS id FROM edges0 UNION SELECT dst FROM edges0),
cnt AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
srcs AS (SELECT DISTINCT src FROM edges0),
r0 AS (SELECT id, 1.0 / cnt.n AS rank FROM nodes CROSS JOIN cnt)"""
    ]
    for i in range(iters):
        parts.append(
            f""",
d{i} AS (
  SELECT coalesce(sum(r.rank), 0.0) AS dm
  FROM r{i} r LEFT JOIN srcs s ON r.id = s.src
  WHERE s.src IS NULL
),
c{i} AS (
  SELECT e.dst AS id, sum(r.rank * e.frac) AS contrib
  FROM edges e JOIN r{i} r ON e.src = r.id
  GROUP BY e.dst
),
r{i + 1} AS (
  SELECT n.id,
         (1.0 - {d}) / cnt.n
           + {d} * (coalesce(c.contrib, 0.0) + dg.dm / cnt.n) AS rank
  FROM nodes n
  CROSS JOIN cnt
  CROSS JOIN d{i} dg
  LEFT JOIN c{i} c ON n.id = c.id
)"""
        )
    parts.append(
        f"""
SELECT id AS user_id, CAST(CAST(rank AS REAL) AS DOUBLE) AS rank
FROM r{iters}"""
    )
    return "".join(parts)


ORACLE_PAGERANK_USER_TRANSITIONS = _pagerank_oracle_sql(
    PR_ITERS, PR_DAMPING
)

QUERIES["pagerank_user_transitions"] = q_pagerank_user_transitions
ORACLES["pagerank_user_transitions"] = ORACLE_PAGERANK_USER_TRANSITIONS


BFS_HOPS = 4
BFS_SEED_MOD = 37


def q_bfs_distances_transitions(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Multi-source BFS (extensions/graph.py:bfs_distances) over the
    same user-transition graph as `pagerank_user_transitions`: hop
    distance from the deterministic seed set (node ids ≡ 0 mod 37) to
    every node reachable within 4 hops — the reachability/propagation
    primitive (contamination spread, crawl frontier depth, influence
    radius) next to PageRank's centrality. Each round is one
    frontier-into-edges equi-join plus one min-fold; distances are
    integers, so the gate is engine-exact with zero quantization. The
    oracle unrolls the identical fold as chained CTEs — a replay of
    the superstep maths, not of the DataFrame code."""
    from pyspark.sql import Window

    from ..extensions.graph import bfs_distances

    configure_for_oracle_parity(spark)
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy(F.to_date("ts")).orderBy("ts", "event_id")
    edges = (
        ev.select(
            "user_id", F.lag("user_id").over(w).alias("prev_user")
        )
        .filter(
            F.col("prev_user").isNotNull()
            & (F.col("prev_user") != F.col("user_id"))
        )
        .select(
            F.col("prev_user").alias("src"), F.col("user_id").alias("dst")
        )
    )
    nodes = (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    seeds = nodes.filter(F.col("id") % BFS_SEED_MOD == 0)
    out = bfs_distances(edges, seeds, max_hops=BFS_HOPS)
    return out.select(F.col("id").alias("user_id"), "dist")


def _bfs_oracle_sql(hops: int, seed_mod: int) -> str:
    """Unrolled fixed-round BFS min-fold in ANSI SQL: one CTE per
    hop, each folding frontier expansions (dist = hop-1) into the
    running per-node minimum — the oracle mirror of the
    bfs_distances superstep loop."""
    parts = [
        f"""
WITH seq AS (
  SELECT user_id,
         lag(user_id) OVER (
           PARTITION BY CAST(ts AS DATE) ORDER BY ts, event_id
         ) AS prev_user
  FROM events
),
edges AS (
  SELECT DISTINCT prev_user AS src, user_id AS dst
  FROM seq
  WHERE prev_user IS NOT NULL AND prev_user <> user_id
),
nodes AS (SELECT src AS id FROM edges UNION SELECT dst FROM edges),
d0 AS (
  SELECT id, 0 AS dist FROM nodes WHERE id % {seed_mod} = 0
)"""
    ]
    for i in range(hops):
        parts.append(
            f""",
d{i + 1} AS (
  SELECT id, MIN(dist) AS dist FROM (
    SELECT id, dist FROM d{i}
    UNION ALL
    SELECT e.dst AS id, d.dist + 1 AS dist
    FROM edges e JOIN d{i} d ON e.src = d.id
    WHERE d.dist = {i}
  ) GROUP BY id
)"""
        )
    parts.append(
        f"""
SELECT id AS user_id, CAST(dist AS INT) AS dist FROM d{hops}"""
    )
    return "".join(parts)


ORACLE_BFS_DISTANCES_TRANSITIONS = _bfs_oracle_sql(
    BFS_HOPS, BFS_SEED_MOD
)

QUERIES["bfs_distances_transitions"] = q_bfs_distances_transitions
ORACLES["bfs_distances_transitions"] = ORACLE_BFS_DISTANCES_TRANSITIONS


SSSP_ROUNDS = 5
SSSP_SEED_MOD = 41
SSSP_W_MOD = 7


def q_sssp_weighted_transitions(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Weighted shortest path (extensions/graph.py:sssp_weighted)
    over the user-transition graph with deterministic integer edge
    weights (w = 1 + (src+dst) mod 7, computed AFTER the distinct
    src/dst fold so both engines weigh identical edges): Bellman-Ford
    relaxation as frontier-pruned supersteps — the cost-aware
    generalization of `bfs_distances_transitions` (hop counts are
    this with w ≡ 1). The gate leans on the Bellman-Ford invariant
    instead of convergence: after k rounds BOTH the frontier-pruned
    DataFrame loop and the oracle's full-relaxation unrolled CTEs
    equal "minimum-weight path using ≤ k edges", so the comparison
    is exact at a FIXED round count with no fixed-point assumption.
    Integer distances, zero quantization."""
    from pyspark.sql import Window

    from ..extensions.graph import sssp_weighted

    configure_for_oracle_parity(spark)
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy(F.to_date("ts")).orderBy("ts", "event_id")
    edges = (
        ev.select(
            "user_id", F.lag("user_id").over(w).alias("prev_user")
        )
        .filter(
            F.col("prev_user").isNotNull()
            & (F.col("prev_user") != F.col("user_id"))
        )
        .select(
            F.col("prev_user").alias("src"), F.col("user_id").alias("dst")
        )
        .distinct()
        .withColumn(
            "w",
            (
                F.lit(1)
                + (F.col("src") + F.col("dst")) % F.lit(SSSP_W_MOD)
            ).cast("long"),
        )
    )
    nodes = (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    seeds = nodes.filter(F.col("id") % SSSP_SEED_MOD == 0)
    out = sssp_weighted(edges, seeds, max_rounds=SSSP_ROUNDS)
    return out.select(
        F.col("id").alias("user_id"), F.col("dist").cast("bigint")
    )


def _sssp_oracle_sql(rounds: int, seed_mod: int, w_mod: int) -> str:
    """Unrolled Bellman-Ford full relaxation: one CTE per round, each
    folding EVERY node's relaxations into the running minimum. The
    Spark side prunes its frontier to last-round improvements; both
    equal shortest-distance-with-≤k-edges after round k, so the
    replay needs no frontier bookkeeping."""
    parts = [
        f"""
WITH seq AS (
  SELECT user_id,
         lag(user_id) OVER (
           PARTITION BY CAST(ts AS DATE) ORDER BY ts, event_id
         ) AS prev_user
  FROM events
),
edges AS (
  SELECT src, dst, 1 + (src + dst) % {w_mod} AS w FROM (
    SELECT DISTINCT prev_user AS src, user_id AS dst
    FROM seq
    WHERE prev_user IS NOT NULL AND prev_user <> user_id
  )
),
nodes AS (SELECT src AS id FROM edges UNION SELECT dst FROM edges),
d0 AS (
  SELECT id, 0 AS dist FROM nodes WHERE id % {seed_mod} = 0
)"""
    ]
    for i in range(rounds):
        parts.append(
            f""",
d{i + 1} AS (
  SELECT id, MIN(dist) AS dist FROM (
    SELECT id, dist FROM d{i}
    UNION ALL
    SELECT e.dst AS id, d.dist + e.w AS dist
    FROM edges e JOIN d{i} d ON e.src = d.id
  ) GROUP BY id
)"""
        )
    parts.append(
        f"""
SELECT id AS user_id, CAST(dist AS BIGINT) AS dist FROM d{rounds}"""
    )
    return "".join(parts)


ORACLE_SSSP_WEIGHTED_TRANSITIONS = _sssp_oracle_sql(
    SSSP_ROUNDS, SSSP_SEED_MOD, SSSP_W_MOD
)

QUERIES["sssp_weighted_transitions"] = q_sssp_weighted_transitions
ORACLES["sssp_weighted_transitions"] = ORACLE_SSSP_WEIGHTED_TRANSITIONS


def q_triangle_count_transitions(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Degree-oriented triangle counting
    (extensions/graph.py:triangle_count) over the undirected closure
    of the user-transition graph — the clustering/cohesion primitive
    (graph density, community tightness, link-spam signatures in
    crawl curation) completing the graph family next to PageRank
    (centrality), BFS (reachability), and connected components
    (partition). The orientation bounds wedge enumeration at
    O(E^1.5) regardless of degree skew; the oracle replays the same
    canonicalize → degree-okey → orient → wedge → close pipeline in
    SQL. All four outputs are exact integers — one wedge miscounted,
    one triangle double-counted across its three rotations, and the
    hash fails."""
    from pyspark.sql import Window

    from ..extensions.graph import triangle_count

    configure_for_oracle_parity(spark)
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy(F.to_date("ts")).orderBy("ts", "event_id")
    edges = (
        ev.select(
            "user_id", F.lag("user_id").over(w).alias("prev_user")
        )
        .filter(
            F.col("prev_user").isNotNull()
            & (F.col("prev_user") != F.col("user_id"))
        )
        .select(
            F.col("prev_user").alias("src"), F.col("user_id").alias("dst")
        )
    )
    return triangle_count(edges)


ORACLE_TRIANGLE_COUNT_TRANSITIONS = """
WITH seq AS (
  SELECT user_id,
         lag(user_id) OVER (
           PARTITION BY CAST(ts AS DATE) ORDER BY ts, event_id
         ) AS prev_user
  FROM events
),
e0 AS (
  SELECT DISTINCT prev_user AS a, user_id AS b
  FROM seq
  WHERE prev_user IS NOT NULL AND prev_user <> user_id
),
und AS (
  SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v
  FROM e0 WHERE a <> b
),
deg AS (
  SELECT id, count(*) * 4294967296 + id AS okey
  FROM (SELECT u AS id FROM und UNION ALL SELECT v AS id FROM und)
  GROUP BY id
),
orient AS (
  SELECT CASE WHEN du.okey < dv.okey THEN und.u ELSE und.v END AS ls,
         CASE WHEN du.okey < dv.okey THEN und.v ELSE und.u END AS hs,
         greatest(du.okey, dv.okey) AS okey_hs
  FROM und
  JOIN deg du ON und.u = du.id
  JOIN deg dv ON und.v = dv.id
),
wedges AS (
  SELECT w1.ls, w1.hs AS x, w2.hs AS y
  FROM orient w1
  JOIN orient w2 ON w1.ls = w2.ls AND w1.okey_hs < w2.okey_hs
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_nodes,
       (SELECT CAST(count(*) AS BIGINT) FROM und) AS n_edges,
       (SELECT CAST(count(*) AS BIGINT) FROM wedges) AS n_wedges,
       (SELECT CAST(count(*) AS BIGINT)
        FROM wedges w JOIN orient o ON w.x = o.ls AND w.y = o.hs)
         AS n_triangles
"""

QUERIES["triangle_count_transitions"] = q_triangle_count_transitions
ORACLES["triangle_count_transitions"] = ORACLE_TRIANGLE_COUNT_TRANSITIONS


COPURCHASE_MIN_PAIRS = 2


def q_copurchase_lift_parts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Market-basket association mining
    (extensions/market.py:cooccurrence_lift): orders are baskets,
    parts are items; support / confidence / lift for every part pair
    co-purchased in >= 2 orders — the Apriori pair pass that retail
    and recommendation pipelines run over order logs, absent from
    the engine until now. The basket self-join shuffles once on the
    order key (exchange reused for both sides) and pair fan-out is
    C(k,2) per k-line order — bounded at 7 in this schema, capped
    via max_basket_items in general. All three ratios are single
    IEEE divisions of exact integer products, so the gate needs no
    quantization; the oracle replays the identical expressions."""
    from ..extensions.market import cooccurrence_lift

    configure_for_oracle_parity(spark)
    li = load_table(spark, sf_dir, "lineitem")
    return cooccurrence_lift(
        li,
        basket_col="l_orderkey",
        item_col="l_partkey",
        min_pair_count=COPURCHASE_MIN_PAIRS,
    )


ORACLE_COPURCHASE_LIFT_PARTS = f"""
WITH items AS (
  SELECT DISTINCT l_orderkey AS basket, l_partkey AS item
  FROM lineitem
),
nb AS (SELECT CAST(count(DISTINCT basket) AS BIGINT) AS n FROM items),
ic AS (
  SELECT item, CAST(count(*) AS BIGINT) AS n_item
  FROM items GROUP BY 1
),
pc AS (
  SELECT a.item AS item_a, b.item AS item_b,
         CAST(count(*) AS BIGINT) AS n_ab
  FROM items a JOIN items b
    ON a.basket = b.basket AND a.item < b.item
  GROUP BY 1, 2
)
SELECT p.item_a, p.item_b, p.n_ab,
       ia.n_item AS n_a, ib.n_item AS n_b,
       CAST(p.n_ab AS DOUBLE) / CAST(nb.n AS DOUBLE) AS support,
       CAST(p.n_ab AS DOUBLE) / CAST(ia.n_item AS DOUBLE)
         AS confidence,
       CAST(p.n_ab * nb.n AS DOUBLE)
         / CAST(ia.n_item * ib.n_item AS DOUBLE) AS lift
FROM pc p
JOIN ic ia ON p.item_a = ia.item
JOIN ic ib ON p.item_b = ib.item
CROSS JOIN nb
WHERE p.n_ab >= {COPURCHASE_MIN_PAIRS}
"""

QUERIES["copurchase_lift_parts"] = q_copurchase_lift_parts
ORACLES["copurchase_lift_parts"] = ORACLE_COPURCHASE_LIFT_PARTS


EMB_DIM = 64


def q_label_centroids_embeddings(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Distributed per-class embedding centroids
    (extensions/similarity.py:group_centroids): posexplode to
    (label, dim, value), one keyed mean — the k-means/IVF centroid
    update that never touches the driver, vs train_ivf_centroids'
    bounded-sample training path. Flat (label, dim, centroid) rows;
    the order-sensitive mean ships through float32 quantization."""
    configure_for_oracle_parity(spark)
    from ..extensions.similarity import group_centroids

    emb = spread(load_table(spark, sf_dir, "embeddings"), spark)
    return quantize_cols(group_centroids(emb), "centroid")


ORACLE_LABEL_CENTROIDS_EMBEDDINGS = f"""
SELECT label,
       CAST(i - 1 AS INT) AS dim,
       CAST(CAST(avg(CAST(embedding[i] AS DOUBLE)) AS REAL) AS DOUBLE)
         AS centroid
FROM embeddings,
     (SELECT unnest(generate_series(1, {EMB_DIM})) AS i) dims
GROUP BY label, i
"""

QUERIES["label_centroids_embeddings"] = q_label_centroids_embeddings
ORACLES["label_centroids_embeddings"] = ORACLE_LABEL_CENTROIDS_EMBEDDINGS


def q_contrastive_triplets_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Contrastive training triplets
    (extensions/sampling.py:contrastive_triplets): positives from the
    exact-jaccard near-dup pairs over the planted corpus, negatives
    hash-drawn from 256 corpus buckets (one tiny aggregate +
    broadcast; the corpus never shuffles). The oracle replays the
    jaccard chain and the multiplicative-hash draw verbatim."""
    from ..extensions.sampling import contrastive_triplets

    d = _docs_with_planted_dups(spark, sf_dir)
    pairs = dedup.ngram_jaccard_pairs(d, threshold=JACCARD_THRESHOLD)
    return contrastive_triplets(d, pairs)


from ..extensions.sampling import (  # noqa: E402
    CONTRASTIVE_BUCKETS as _CB,
    KNUTH as _KN,
    SALT_STRIDE as _SS,
)

ORACLE_CONTRASTIVE_TRIPLETS_DOCUMENTS = f"""
WITH {_JACCARD_CTES},
bk AS (
  SELECT doc_id, (doc_id * {_KN}) % {_CB} AS b FROM docs2
),
cand AS (
  SELECT b, min(doc_id) AS negative,
         row_number() OVER (ORDER BY b) - 1 AS r
  FROM bk GROUP BY b
),
m AS (SELECT count(*) AS m FROM cand)
SELECT j.id1 AS anchor, j.id2 AS positive, c.negative, j.jaccard
FROM jac j
CROSS JOIN m
JOIN cand c
  ON c.r = (j.id1 * {_KN} + j.id2 * {_SS}) % m.m
WHERE c.negative <> j.id1 AND c.negative <> j.id2
"""

QUERIES["contrastive_triplets_documents"] = q_contrastive_triplets_documents
ORACLES["contrastive_triplets_documents"] = (
    ORACLE_CONTRASTIVE_TRIPLETS_DOCUMENTS
)


KMEANS_K = 8
KMEANS_ITERS = 3


def q_kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fully distributed Lloyd k-means
    (extensions/clustering.py:kmeans_lloyd) over the embeddings
    table — the trainer behind IVF ANN cells and semantic corpus
    bucketing, with NO driver-side sample (the 100 TB path where the
    IVF quantizer's bounded collect is replaced by broadcast-join
    supersteps; the corpus never shuffles for assignment). Three
    iterations from the deterministic "k lowest ids" seeding; ties to
    the lower cluster id; distances and updated centroid components
    float32-quantized so both engines' reduction orders collapse to
    identical IEEE values BEFORE every argmin and every reuse —
    which is what lets an iterative float algorithm sit on a
    bit-exact hash gate. Output: the final model long-form (cid,
    n_points, pos, c_val), k×dim rows; the oracle unrolls the same
    three assign→update rounds in SQL."""
    from ..extensions.clustering import kmeans_lloyd

    configure_for_oracle_parity(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    return kmeans_lloyd(
        emb, k=KMEANS_K, iters=KMEANS_ITERS,
        id_col="vec_id", vec_col="embedding",
    )


def _kmeans_oracle_sql(k: int, iters: int) -> str:
    """Unrolled Lloyd rounds: per iteration one quantized-distance
    argmin (ties to the lower cid via the window ORDER BY) and one
    quantized per-dimension mean with empty-cluster carry — the SQL
    replay of the superstep loop."""
    parts = [
        f"""
WITH ex AS (
  SELECT vec_id, i - 1 AS pos, CAST(embedding[i] AS DOUBLE) AS x
  FROM embeddings,
       unnest(range(1, len(embedding) + 1)) AS t(i)
),
init AS (
  SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS cid
  FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {k})
),
c0 AS (
  SELECT init.cid, ex.pos, ex.x AS c
  FROM init JOIN ex USING (vec_id)
)"""
    ]
    for i in range(iters):
        parts.append(
            f""",
dist{i} AS (
  SELECT e.vec_id, c.cid,
         CAST(CAST(sum((e.x - c.c) * (e.x - c.c)) AS REAL)
           AS DOUBLE) AS d2
  FROM ex e JOIN c{i} c ON e.pos = c.pos
  GROUP BY e.vec_id, c.cid
),
a{i} AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           row_number() OVER (
             PARTITION BY vec_id ORDER BY d2, cid
           ) AS rn
    FROM dist{i}
  ) WHERE rn = 1
),
m{i} AS (
  SELECT a.cid, e.pos,
         CAST(CAST(avg(e.x) AS REAL) AS DOUBLE) AS c
  FROM a{i} a JOIN ex e USING (vec_id)
  GROUP BY a.cid, e.pos
),
c{i + 1} AS (
  SELECT c.cid, c.pos, coalesce(m.c, c.c) AS c
  FROM c{i} c LEFT JOIN m{i} m
    ON m.cid = c.cid AND m.pos = c.pos
)"""
        )
    parts.append(
        f"""
SELECT CAST(c.cid AS INT) AS cid,
       CAST(coalesce(n.n, 0) AS BIGINT) AS n_points,
       CAST(c.pos AS INT) AS pos,
       c.c AS c_val
FROM c{iters} c
LEFT JOIN (
  SELECT cid, count(*) AS n FROM a{iters - 1} GROUP BY cid
) n ON n.cid = c.cid"""
    )
    return "".join(parts)


ORACLE_KMEANS_EMBEDDINGS = _kmeans_oracle_sql(KMEANS_K, KMEANS_ITERS)

QUERIES["kmeans_embeddings"] = q_kmeans_embeddings
ORACLES["kmeans_embeddings"] = ORACLE_KMEANS_EMBEDDINGS
