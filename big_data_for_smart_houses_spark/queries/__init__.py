"""Driver-facing query registry.

Each query is a named (Spark callable, DuckDB oracle SQL) pair running
the engine's operators (SURVEY.md §2) against the driver testdata
tables (TESTDATA.md). Queries without an oracle are genuinely
non-SQL-expressible (hash-seeded sketches) and get rows-only checks.

ORDER MATTERS: the external driver certifies the first 50 entries by
insertion order. Round 5's `_CERTIFICATION_FRONT` leads with the
eleven new queries (never certified), then the 34 queries whose only
driver rows predate the round-3 testdata regeneration (so the hard
signal re-certifies them on the CURRENT parquet), then 5 r4-green
sentinels chosen from the code paths this round touched. Everything past index
50 — green in rounds 3-4 on current data — is re-verified every
session by the local `SPARK_GRAFT_EXACT=1` mirror of the driver gate,
which covers ALL entries, not just 50.

Round 6 rotation note: the round-5 second wave sits past index 50
this round (the window is spent on the stale-row re-certification
above) — lead round 6's front with these never-certified entries:
stream_{join,dedup,tumbling,enrich,merge}_availablenow,
bpe_pair_counts_documents, inverted_index_documents,
pagerank_user_transitions, snapshot_diff_orders, source_kl_documents,
label_centroids_embeddings, stats_moments_lineitem,
{regexp,math,navigation}_functions_*, rolling_median_events,
hll_reach_events, tpch_q{3,5,7,10,18}_*, ab_lift_events,
json_schema_profile_events, contrastive_triplets_documents,
incremental_join_view_orders, conform_union_sources,
span_masks_documents.
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
from .pipeline import ORACLES as _PIPE_ORACLES
from .pipeline import QUERIES as _PIPE_QUERIES
from .stats_gate import ORACLES as _STATS_ORACLES
from .stats_gate import QUERIES as _STATS_QUERIES
from .streaming_gate import ORACLES as _STREAM_ORACLES
from .streaming_gate import QUERIES as _STREAM_QUERIES

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
}

_CERTIFICATION_FRONT = [
    # --- new this round (never driver-certified): SCD2 read half,
    #     approx-percentile scale variant, map/struct + generator +
    #     higher-order-function families, and the first two
    #     streaming-EXECUTED gates (LOCF and EWMA availableNow) ---
    "scd2_asof_lookup",
    "quality_topk_approx_pct",
    "map_functions_events",
    "locf_stream_availablenow",
    "ewma_stream_availablenow",
    "generator_functions_documents",
    "hof_functions_documents",
    "bloom_probe_customers",
    "editdist_recall_planted",
    "session_stream_availablenow",
    "setops_events",
    # --- the 34 queries whose only driver rows predate the round-3
    #     testdata regeneration (certified r1/r2 on the OLD parquet;
    #     all pass the local SPARK_GRAFT_EXACT sf0.01 mirror and the
    #     round-4 judge's independent 32/32 run — this window makes
    #     the hard driver signal say so on the CURRENT data) ---
    "analytics_daily_cost_trend",
    "analytics_daily_energy_trend",
    "analytics_data_status",
    "analytics_health_scatter",
    "analytics_kpi_chain_gold",
    "analytics_kpi_chain_silver",
    "analytics_kpi_chain_summary",
    "analytics_live_readings",
    "business_summary_approx",
    "catalog_enrichment_events",
    "customers_with_orders",
    "customers_without_orders",
    "dedup_exact_documents",
    "event_quality_score",
    "event_transition_counts",
    "event_type_pivot",
    "events_cube",
    "events_in_session_range",
    "hourly_event_window",
    "json_props_extract",
    "late_shipment_flag",
    "latest_event_per_user",
    "ngram_jaccard_pairs",
    "part_value_density",
    "pricing_rollup",
    "revenue_vs_global",
    "rolling_time_window_events",
    "salted_join_orders",
    "top_orders_per_customer",
    "two_phase_agg_orders",
    "union_dedup_orders",
    "user_event_type_sets",
    "value_percentiles",
    "value_percentiles_approx",
    # --- r4-green sentinels: queries whose code paths round 5 touched
    #     (de-forced broadcasts, null-safe drift, quantize null gate,
    #     merge tiebreak param) plus the medallion spine ---
    "funnel_click_purchase",
    "cohort_retention_events",
    "profile_drift_documents",
    "zorder_key_events",
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
