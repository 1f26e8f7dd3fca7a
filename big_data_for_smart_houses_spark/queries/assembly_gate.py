"""Dataset-assembly gate queries (round 4, second batch): weighted
sampling without replacement, packed-sequence offsets, and
cross-document exact-substring dedup at CDC-chunk granularity.

Float contract: the Efraimidis-Spirakis key quantizes its ln() through
float32 on both engines (ln is not correctly rounded) with an id
tie-break, so the selected SET is engine-exact; everything else in
this module is integer/md5 arithmetic or one division of two exact
ints — no accumulation-order hazards anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..extensions import text
from ..extensions.sampling import (
    KNUTH,
    SHUFFLE_BUCKETS,
    pack_with_offsets,
    weighted_sample_wor,
)
from ..session import configure_for_oracle_parity
from ..sources.parquet import load_table, spread

WOR_K = 100
PACK_BUDGET = 2000
CDC_PLANT_N = 30
CDC_PLANT_OFFSET = 200_000


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    configure_for_oracle_parity(spark)
    return spread(load_table(spark, sf_dir, "documents"), spark)


# ---------------------------------------------------------------------------
# Weighted sampling without replacement (Efraimidis-Spirakis A-Res)
# ---------------------------------------------------------------------------

def q_weighted_sample_wor_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exactly-100 weighted sample without replacement, weights =
    n_chars (longer docs proportionally likelier), deterministic u
    from the id hash — ln(u)/w ranked as a TakeOrdered top-K, never a
    global sort (extensions/sampling.py:weighted_sample_wor)."""
    d = _docs(spark, sf_dir).select("doc_id", "lang", "source", "n_chars")
    return weighted_sample_wor(d, weight_col="n_chars", k=WOR_K)


ORACLE_WEIGHTED_SAMPLE_WOR_DOCUMENTS = f"""
WITH t AS (
  SELECT doc_id, lang, source, n_chars,
         ((doc_id * {KNUTH}) % {SHUFFLE_BUCKETS} + 1)
           / {float(SHUFFLE_BUCKETS + 1)} AS u
  FROM documents
  WHERE n_chars > 0
)
SELECT doc_id, lang, source, n_chars,
       CAST(CAST(ln(u) / CAST(n_chars AS DOUBLE) AS REAL) AS DOUBLE)
         AS sample_key
FROM t
ORDER BY sample_key DESC, doc_id
LIMIT {WOR_K}
"""


# ---------------------------------------------------------------------------
# Packed sequences with in-batch offsets
# ---------------------------------------------------------------------------

def q_packed_sequence_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token packing with the per-document position inside its batch
    (extensions/sampling.py:pack_with_offsets) — what a packed
    pretraining loader consumes to place attention-reset boundaries.
    Sharded by lang; integer-exact throughout."""
    d = _docs(spark, sf_dir).withColumn(
        "n_tokens", F.size(F.split(F.col("text"), " ")).cast("long")
    )
    return pack_with_offsets(
        d, token_col="n_tokens", budget=PACK_BUDGET, shard_col="lang"
    ).select("doc_id", "lang", "n_tokens", "batch_id", "offset_in_batch")


ORACLE_PACKED_SEQUENCE_OFFSETS = f"""
WITH t AS (
  SELECT doc_id, lang,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         CAST(coalesce(sum(len(string_split(text, ' ')))
                OVER (PARTITION BY lang ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
              0) AS BIGINT) AS excl
  FROM documents
)
SELECT doc_id, lang, n_tokens,
       CAST(floor(excl / {PACK_BUDGET}) AS BIGINT) AS batch_id,
       CAST(excl - CAST(floor(excl / {PACK_BUDGET}) AS BIGINT)
              * {PACK_BUDGET} AS BIGINT) AS offset_in_batch
FROM t
"""


# ---------------------------------------------------------------------------
# Cross-document CDC-chunk dedup
# ---------------------------------------------------------------------------

def _docs_with_planted_copies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plant verbatim copies so cross-document shared chunks exist at
    every sf: docs 1..30 are duplicated under new ids — every chunk of
    a duplicated doc is then shared (df >= 2), so the planted pairs
    must report shared_frac = 1.0 and the untouched remainder only
    whatever chunk collisions occur naturally."""
    d = _docs(spark, sf_dir).select("doc_id", "text")
    copies = d.filter(
        (F.col("doc_id") >= 1) & (F.col("doc_id") <= CDC_PLANT_N)
    ).select(
        (F.col("doc_id") + CDC_PLANT_OFFSET).alias("doc_id"), F.col("text")
    )
    return d.unionByName(copies)


def q_cdc_crossdoc_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup at CDC-chunk granularity
    (extensions/text.py:cdc_crossdoc_stats): content-defined chunks,
    md5 fingerprints, per-doc shared-chunk fractions — the scalable
    stand-in for suffix-array substring dedup. Planted verbatim copies
    must surface with shared_frac = 1.0.

    Gate corpus: the deterministic EVEN-doc_id half (round-8 trim) —
    the chunk/fingerprint/df pipeline is linear in corpus size and
    its semantics are per-doc, so halving the corpus halves the gate
    cost with an identical proof (planted even-id copies still report
    shared_frac = 1.0 against their even-id sources)."""
    return text.cdc_crossdoc_stats(
        _docs_with_planted_copies(spark, sf_dir).filter(
            F.col("doc_id") % 2 == 0
        )
    )


ORACLE_CDC_CROSSDOC_DOCUMENTS = f"""
WITH docs2 AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {CDC_PLANT_OFFSET} AS doc_id, text FROM documents
  WHERE doc_id >= 1 AND doc_id <= {CDC_PLANT_N}
),
t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM docs2
      WHERE doc_id % 2 = 0),
b AS (
  SELECT doc_id, toks, len(toks) AS n,
         [i for i in range({text.CDC_WINDOW}, len(toks) + 1)
          if substr(md5(array_to_string(
               toks[i - {text.CDC_WINDOW - 1}:i], ' ')), 1, 1)
             IN {text.CDC_BOUNDARY_NIBBLES!r}] AS ends0
  FROM t
),
b2 AS (
  SELECT doc_id, toks,
         CASE WHEN len(ends0) = 0 OR ends0[-1] != n
              THEN list_append(ends0, n) ELSE ends0 END AS ends
  FROM b
),
e AS (
  SELECT doc_id, toks, ends,
         unnest(range(1, len(ends) + 1)) AS j
  FROM b2
),
chunks AS (
  SELECT doc_id,
         md5(array_to_string(
           toks[CASE WHEN j = 1 THEN 1 ELSE ends[j - 1] + 1 END : ends[j]],
           ' ')) AS fp
  FROM e
),
doc_fp AS (
  SELECT doc_id, fp, count(*) AS occ FROM chunks GROUP BY 1, 2
),
fp_df AS (
  SELECT fp, count(*) AS docs FROM doc_fp GROUP BY 1
)
SELECT d.doc_id,
       CAST(sum(d.occ) AS BIGINT) AS n_chunks,
       CAST(sum(CASE WHEN f.docs >= 2 THEN d.occ ELSE 0 END) AS BIGINT)
         AS n_shared_chunks,
       sum(CASE WHEN f.docs >= 2 THEN d.occ ELSE 0 END)
         / CAST(sum(d.occ) AS DOUBLE) AS shared_frac,
       (sum(CASE WHEN f.docs >= 2 THEN d.occ ELSE 0 END)
         / CAST(sum(d.occ) AS DOUBLE)) > 0.5 AS mostly_shared
FROM doc_fp d JOIN fp_df f USING (fp)
GROUP BY d.doc_id
"""


QUERIES = {
    "weighted_sample_wor_documents": q_weighted_sample_wor_documents,
    "packed_sequence_offsets": q_packed_sequence_offsets,
    "cdc_crossdoc_documents": q_cdc_crossdoc_documents,
}

ORACLES = {
    "weighted_sample_wor_documents": ORACLE_WEIGHTED_SAMPLE_WOR_DOCUMENTS,
    "packed_sequence_offsets": ORACLE_PACKED_SEQUENCE_OFFSETS,
    "cdc_crossdoc_documents": ORACLE_CDC_CROSSDOC_DOCUMENTS,
}


# ---------------------------------------------------------------------------
# Count-min sketch
# ---------------------------------------------------------------------------

CMS_TOP_K = 20


def q_cms_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over the corpus token stream
    (extensions/sketches.py): depth x width counters from md5-derived
    buckets (engine-replayable — no overflow-prone mixing), then point
    estimates for the top-20 exact heavy hitters next to their true
    counts. The gate hash-checks the full sketch arithmetic: a single
    mis-bucketed token shifts a counter and fails the hash. est >=
    exact always (the CMS one-sided guarantee, unit-asserted)."""
    from ..extensions.sketches import cms_build, cms_lookup

    d = _docs(spark, sf_dir)
    toks = d.select(
        F.explode(F.split(F.col("text"), " ")).alias("token")
    )
    exact = toks.groupBy("token").agg(
        F.count(F.lit(1)).alias("exact_count")
    )
    top = exact.orderBy(
        F.col("exact_count").desc(), F.col("token")
    ).limit(CMS_TOP_K)
    sketch = cms_build(toks, "token")
    return (
        cms_lookup(sketch, top.select("token"), "token")
        .join(top, "token")
        .select("token", "exact_count", "est_count")
    )


from ..extensions.sketches import CMS_DEPTH, CMS_WIDTH  # noqa: E402

ORACLE_CMS_TOKEN_COUNTS = f"""
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents
),
exact AS (
  SELECT token, CAST(count(*) AS BIGINT) AS exact_count
  FROM toks GROUP BY 1
),
top AS (
  SELECT token, exact_count FROM exact
  ORDER BY exact_count DESC, token LIMIT {CMS_TOP_K}
),
hashes AS (
  SELECT token,
         r.i AS cms_row,
         CAST(('0x' || substr(md5(CAST(r.i AS VARCHAR) || ':' || token),
                              1, 15)) AS BIGINT) % {CMS_WIDTH} AS cms_bucket
  FROM toks CROSS JOIN range({CMS_DEPTH}) r(i)
),
counters AS (
  SELECT cms_row, cms_bucket, CAST(count(*) AS BIGINT) AS counter
  FROM hashes GROUP BY 1, 2
),
qh AS (
  SELECT t.token, t.exact_count,
         r.i AS cms_row,
         CAST(('0x' || substr(md5(CAST(r.i AS VARCHAR) || ':' || t.token),
                              1, 15)) AS BIGINT) % {CMS_WIDTH} AS cms_bucket
  FROM top t CROSS JOIN range({CMS_DEPTH}) r(i)
)
SELECT q.token, q.exact_count,
       CAST(min(coalesce(c.counter, 0)) AS BIGINT) AS est_count
FROM qh q LEFT JOIN counters c USING (cms_row, cms_bucket)
GROUP BY q.token, q.exact_count
"""

QUERIES["cms_token_counts"] = q_cms_token_counts
ORACLES["cms_token_counts"] = ORACLE_CMS_TOKEN_COUNTS


# ---------------------------------------------------------------------------
# Bloom-filter membership (the pre-join pruning sketch)
# ---------------------------------------------------------------------------

def q_bloom_probe_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter gate (extensions/sketches.py:bloom_build /
    bloom_might_contain): build an 8 KB filter over the distinct
    custkeys that placed orders, probe EVERY customer, and return the
    probe verdict beside exact membership. The hash checks the full
    bit arithmetic (one mis-set bit flips a verdict) and the
    no-false-negatives guarantee is structural: a member's k bits are
    all set by construction, so is_member = true forces
    might_contain = true — the oracle replays bit-for-bit and any
    false NEGATIVE would already be a hash mismatch.

    Scale shape: this is the semi-join bypass — at 100 TB the 8 KB
    filter broadcasts into the probe scan and discards ~all
    non-members without shuffling either table; the exact semi-join
    then runs only on survivors."""
    from ..extensions.sketches import bloom_build, bloom_might_contain

    configure_for_oracle_parity(spark)
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    members = orders.select(
        F.col("o_custkey").cast("string").alias("key")
    ).distinct()
    bloom = bloom_build(members, "key")
    probe = customer.select(
        "c_custkey", F.col("c_custkey").cast("string").alias("key")
    )
    verdicts = bloom_might_contain(bloom, probe.select("key"), "key")
    exact = orders.select("o_custkey").distinct()
    return (
        probe.join(verdicts, "key")
        .join(
            exact.withColumn("_m", F.lit(True)),
            probe.c_custkey == exact.o_custkey,
            "left",
        )
        .select(
            "c_custkey",
            "might_contain",
            F.coalesce(F.col("_m"), F.lit(False)).alias("is_member"),
        )
    )


from ..extensions.sketches import (  # noqa: E402
    BLOOM_K,
    BLOOM_M_BITS,
    BLOOM_WORD_BITS,
)

ORACLE_BLOOM_PROBE_CUSTOMERS = f"""
WITH members AS (
  SELECT DISTINCT CAST(o_custkey AS VARCHAR) AS key FROM orders
),
mpos AS (
  SELECT CAST(('0x' || substr(md5('b' || r.i || ':' || key), 1, 15))
              AS BIGINT) % {BLOOM_M_BITS} AS p
  FROM members CROSS JOIN range({BLOOM_K}) r(i)
),
words AS (
  SELECT p // {BLOOM_WORD_BITS} AS bloom_word,
         bit_or(CAST(1 AS BIGINT) << CAST(p % {BLOOM_WORD_BITS} AS INT))
           AS bits
  FROM mpos GROUP BY 1
),
probe AS (
  SELECT c_custkey, CAST(c_custkey AS VARCHAR) AS key FROM customer
),
ppos AS (
  SELECT c_custkey, key,
         CAST(('0x' || substr(md5('b' || r.i || ':' || key), 1, 15))
              AS BIGINT) % {BLOOM_M_BITS} AS p
  FROM probe CROSS JOIN range({BLOOM_K}) r(i)
),
verdicts AS (
  SELECT c_custkey,
         bool_and(
           (coalesce(w.bits, 0) >> CAST(p % {BLOOM_WORD_BITS} AS INT))
           & 1 = 1) AS might_contain
  FROM ppos LEFT JOIN words w ON p // {BLOOM_WORD_BITS} = w.bloom_word
  GROUP BY 1
)
SELECT v.c_custkey, v.might_contain,
       m.o_custkey IS NOT NULL AS is_member
FROM verdicts v
LEFT JOIN (SELECT DISTINCT o_custkey FROM orders) m
  ON v.c_custkey = m.o_custkey
"""

QUERIES["bloom_probe_customers"] = q_bloom_probe_customers
ORACLES["bloom_probe_customers"] = ORACLE_BLOOM_PROBE_CUSTOMERS
