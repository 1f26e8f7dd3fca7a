"""Driver-facing query registry.

Each query is a named (Spark callable, DuckDB oracle SQL) pair running
the engine's operators (SURVEY.md §2) against the driver testdata
tables (TESTDATA.md). Queries without an oracle are genuinely
non-SQL-expressible (hash-seeded sketches) and get rows-only checks.

ORDER MATTERS: the external driver certifies the first 50 entries by
insertion order. Round 8's `_CERTIFICATION_FRONT` is a pure
certification rotation (no new gates this round, per the round-7
verdict): the round-7 red row `tpch_q12_priority_shipping` (oracle
HUGEINT bug fixed — CAST both sum(CASE) columns AS BIGINT; engine
values were already bit-identical) plus 49 of the 63 never-certified
round-7 gates, prioritized exactly as the round-7 verdict asked:
the seventh-wave distributed-operator gates (scan family, skylines,
NTILE, order statistics, MAD, percentile WITHIN GROUP, nearest
as-of, trailing-distinct), the graph gates, the LLM-pipeline
composition and sketch gates, the four highest-semantic-value
streaming-execution gates (statestore_join, upsert_restart,
timeout_sessions, sliding) and the join-mode matrix completions,
the incremental/storage gates, and the source round-trips —
plus cdc_crossdoc_documents, whose gate corpus round 8 trimmed to
the deterministic even-doc_id half (re-certification of edited
behavior, same rule round 7 applied to its own edits).

ROUND-9 ROTATION QUEUE (the 14 never-certified entries that did not
fit the 50-slot window — all low-risk function-surface gates, all
passing the sf0.01 exact mirror and the oracle type audit
(tests/test_registry.py::test_all_oracles_return_narrow_types)):
agg_completeness_lineitem, url_functions_orders,
transpose_summary_lineitem, pipe_syntax_lineitem,
parameterized_sql_orders, identifier_clause_orders,
sugar_syntax_orders, session_variables_orders, sql_scripting_orders,
datetime_functions_events, array_sort_hof_documents,
map_hof_functions_events, approx_topk_events, explode_outer_events
(displaced by the cdc_crossdoc_documents re-certification), and
tpch_q1_pricing_summary (a registry alias of the long-certified
pricing_summary).

Round 8 also re-verified (sf0.01 exact mirror) the two oracles whose
declared output type was narrowed this round —
silver_pipeline_events (quality_score DECIMAL(7,1) → explicit CAST
AS DOUBLE) and value_histogram_events (bin_lo DECIMAL literal
arithmetic → CAST AS DOUBLE). Both were already driver-green: the
cast makes explicit the exact decimal→float64 conversion the
DuckDB→pandas bridge was already performing, so values are
unchanged; they are not re-queued.

After the round-9 queue certifies, EVERY oracle-backed query in the
registry will have had a green driver row at least once. The
remaining rows-only entries are the 4 structural sketches
(minhash/simhash/ann_lsh/ann_ivf), each carrying a hash-gated recall
companion that IS driver-certified.
"""

from __future__ import annotations

from .analytics_gate import ORACLES as _GATE_ORACLES
from .assembly_gate import ORACLES as _ASM_ORACLES
from .assembly_gate import QUERIES as _ASM_QUERIES
from .analytics_gate import QUERIES as _GATE_QUERIES
from .core import ORACLES as _CORE_ORACLES
from .core import QUERIES as _CORE_QUERIES
from .curation import ORACLES as _CUR_ORACLES
from .curation import QUERIES as _CUR_QUERIES
from .extensions import ORACLES as _EXT_ORACLES
from .incremental_gate import ORACLES as _INC_ORACLES
from .incremental_gate import QUERIES as _INC_QUERIES
from .extensions import QUERIES as _EXT_QUERIES
from .llm_ops import ORACLES as _LLM_ORACLES
from .llm_ops import QUERIES as _LLM_QUERIES
from .modern_gate import ORACLES as _MODERN_ORACLES
from .modern_gate import QUERIES as _MODERN_QUERIES
from .pipeline import ORACLES as _PIPE_ORACLES
from .pipeline import QUERIES as _PIPE_QUERIES
from .stats_gate import ORACLES as _STATS_ORACLES
from .stats_gate import QUERIES as _STATS_QUERIES
from .streaming_gate import ORACLES as _STREAM_ORACLES
from .streaming_gate import QUERIES as _STREAM_QUERIES
from .tpch_gate import ORACLES as _TPCH_ORACLES
from .tpch_gate import QUERIES as _TPCH_QUERIES

# A name registered in two modules silently overwrites on merge —
# assert disjointness so a collision is an import error, not a
# shadowed gate (round 7 caught one: a late HOF gate landed on a
# round-5 name and hid it until the bench-dedupe test flagged it).
_MODULE_DICTS = (
    _CORE_QUERIES, _PIPE_QUERIES, _GATE_QUERIES, _EXT_QUERIES,
    _LLM_QUERIES, _CUR_QUERIES, _STATS_QUERIES, _ASM_QUERIES,
    _INC_QUERIES, _STREAM_QUERIES, _MODERN_QUERIES, _TPCH_QUERIES,
)
_name_counts: dict = {}
for _d in _MODULE_DICTS:
    for _k in _d:
        _name_counts[_k] = _name_counts.get(_k, 0) + 1
_dups = sorted(k for k, v in _name_counts.items() if v > 1)
assert not _dups, f"query name registered in two modules: {_dups}"

_ALL_QUERIES = {
    **_CORE_QUERIES,
    **_PIPE_QUERIES,
    **_GATE_QUERIES,
    **_EXT_QUERIES,
    **_LLM_QUERIES,
    **_CUR_QUERIES,
    **_STATS_QUERIES,
    **_ASM_QUERIES,
    **_INC_QUERIES,
    **_STREAM_QUERIES,
    **_MODERN_QUERIES,
    **_TPCH_QUERIES,
}
ORACLES = {
    **_CORE_ORACLES,
    **_PIPE_ORACLES,
    **_GATE_ORACLES,
    **_EXT_ORACLES,
    **_LLM_ORACLES,
    **_CUR_ORACLES,
    **_STATS_ORACLES,
    **_ASM_ORACLES,
    **_INC_ORACLES,
    **_STREAM_ORACLES,
    **_MODERN_ORACLES,
    **_TPCH_ORACLES,
}

_CERTIFICATION_FRONT = [
    # --- the round-7 red row: oracle-type bug fixed (both
    #     sum(CASE) columns CAST AS BIGINT; engine values were
    #     already bit-identical per the round-7 verdict) ---
    "tpch_q12_priority_shipping",
    # --- seventh-wave distributed-operator gates: scan family,
    #     order statistics, robust stats, as-of, trailing windows ---
    "global_rownum_orders",
    "concurrency_sweepline_events",
    "ntile_scan_orders",
    "skyline_parts",
    "skyline3d_parts",
    "weighted_quantiles_orders",
    "gini_customer_orders",
    "ks_statistic_events",
    "mad_outliers_events",
    "percentile_within_group_events",
    "asof_nearest_events",
    "cogroup_asof_events",
    "trailing_active_users_events",
    "bitwise_aggs_events",
    # --- graph supersteps ---
    "bfs_distances_transitions",
    "sssp_weighted_transitions",
    "triangle_count_transitions",
    # --- LLM-pipeline / similarity / sketch gates ---
    "ppjoin_pairs_documents",
    "kmeans_embeddings",
    "bpe_train_documents",
    "llm_corpus_pipeline_documents",
    "copurchase_lift_parts",
    "kmv_distinct_events",
    "kmv_merge_events",
    "kmv_jaccard_events",
    "theta_sketch_events",
    "mapinarrow_tokens_documents",
    # --- streaming-execution gates: the four highest-semantic-
    #     value first (state read-back, idempotent re-apply after
    #     mid-commit crash, event-time timeout, overlapping-window
    #     closure), then the join-mode matrix completions ---
    "statestore_join_availablenow",
    "stream_upsert_restart_availablenow",
    "stream_timeout_sessions_availablenow",
    "stream_sliding_availablenow",
    "stream_chained_availablenow",
    "stream_multiwatermark_availablenow",
    "stream_update_mode_availablenow",
    "stream_fullouter_join_availablenow",
    "stream_semi_join_availablenow",
    "stream_interval_enrich_availablenow",
    # --- incremental / storage-layout gates ---
    "vacuum_retention_orders",
    "rollup_navigate_events",
    "dynamic_partition_overwrite_events",
    "agg_pushdown_events",
    "file_metadata_events",
    # --- source/sink round-trips + remaining surface gates ---
    "xml_roundtrip_events",
    "json_roundtrip_events",
    "binaryfile_bmp_assets",
    "csv_malformed_modes_events",
    "join_types_orders",
    "polymorphic_udtf_events",
    # --- re-certification: round 8 trimmed this gate's corpus to the
    #     deterministic even-doc_id half (same per-doc semantics,
    #     planted copies still shared_frac = 1.0) ---
    "cdc_crossdoc_documents",
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
