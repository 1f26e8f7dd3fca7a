"""Driver-facing query registry.

Each query is a named (Spark callable, DuckDB oracle SQL) pair running
the engine's operators (SURVEY.md §2) against the driver testdata
tables (TESTDATA.md). Queries without an oracle are genuinely
non-SQL-expressible (hash-seeded sketches) and get rows-only checks.

ORDER MATTERS: the external driver certifies the first 50 entries by
insertion order. `_CERTIFICATION_FRONT` therefore leads with every
query that has never had a driver CORRECTNESS row (the LLM-pipeline
block cut at index 50 in rounds 1-2, plus every query added this
round), followed by whatever already-certified sentinels still fit.
This round the never-certified block is 49 queries, so the sentinel
spine is down to one (`silver_pipeline_events`, the deepest core
pipeline); the rest of the core surface — all green in
CORRECTNESS_r02.json — sits after index 50 and is re-verified every
session by the local `SPARK_GRAFT_EXACT=1` mirror of the driver gate,
which covers ALL entries, not just 50.
"""

from __future__ import annotations

from .analytics_gate import ORACLES as _GATE_ORACLES
from .analytics_gate import QUERIES as _GATE_QUERIES
from .core import ORACLES as _CORE_ORACLES
from .core import QUERIES as _CORE_QUERIES
from .curation import ORACLES as _CUR_ORACLES
from .curation import QUERIES as _CUR_QUERIES
from .extensions import ORACLES as _EXT_ORACLES
from .extensions import QUERIES as _EXT_QUERIES
from .llm_ops import ORACLES as _LLM_ORACLES
from .llm_ops import QUERIES as _LLM_QUERIES
from .pipeline import ORACLES as _PIPE_ORACLES
from .pipeline import QUERIES as _PIPE_QUERIES

_ALL_QUERIES = {
    **_CORE_QUERIES,
    **_PIPE_QUERIES,
    **_GATE_QUERIES,
    **_EXT_QUERIES,
    **_LLM_QUERIES,
    **_CUR_QUERIES,
}
ORACLES = {
    **_CORE_ORACLES,
    **_PIPE_ORACLES,
    **_GATE_ORACLES,
    **_EXT_ORACLES,
    **_LLM_ORACLES,
    **_CUR_ORACLES,
}

_CERTIFICATION_FRONT = [
    # --- never driver-certified (r1-r2 window cut them at index 50) ---
    "dedup_groups_documents",
    "dataset_split_documents",
    "token_batch_packing",
    "weighted_corpus_mix",
    "minhash_dedup_documents",
    "simhash_dedup_documents",
    "text_stats",
    "text_quality_score",
    "language_guess",
    "doc_fingerprint",
    "token_stats_by_lang",
    "embedding_cosine_topk",
    "embedding_neardup_pairs",
    "embedding_ann_lsh",
    "embedding_ann_ivf",
    "multimodal_features",
    "multimodal_frame_sample",
    "multimodal_decode",
    "contamination_check_documents",
    "decontaminated_train_docs",
    "tfidf_top_terms",
    "bm25_documents",
    "stratified_sample_events",
    "corpus_shuffle_documents",
    "pii_scrub_documents",
    "gopher_quality_documents",
    "quality_topk_per_lang",
    "chunk_documents",
    # --- new this round (recall invariants, incremental dedup, and
    #     the temperature-mix / length-packing / boilerplate ops) ---
    "minhash_recall_exact_dups",
    "simhash_recall_exact_dups",
    "ann_lsh_recall_planted",
    "ann_ivf_recall_planted",
    "dedup_incremental_documents",
    "temperature_mix_documents",
    "length_bucketed_packing",
    "boilerplate_ngram_documents",
    "sentence_dedup_documents",
    "semantic_dedup_embeddings",
    "source_cap_documents",
    "mix_manifest_documents",
    "profile_documents",
    "winsorize_events",
    "token_heavy_hitters",
    "value_histogram_events",
    "bigram_lm_documents",
    "cdc_chunk_documents",
    "ewma_events",
    "zscore_anomaly_events",
    "source_cap_two_phase",
    # --- certified sentinel spine (green in CORRECTNESS_r02.json) ---
    "silver_pipeline_events",
]

assert len(_CERTIFICATION_FRONT) == 50, len(_CERTIFICATION_FRONT)
assert len(set(_CERTIFICATION_FRONT)) == 50
_missing = [n for n in _CERTIFICATION_FRONT if n not in _ALL_QUERIES]
assert not _missing, _missing

QUERIES = {n: _ALL_QUERIES[n] for n in _CERTIFICATION_FRONT}
for _n, _fn in _ALL_QUERIES.items():
    if _n not in QUERIES:
        QUERIES[_n] = _fn

__all__ = ["QUERIES", "ORACLES"]
