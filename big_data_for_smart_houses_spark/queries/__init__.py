"""Driver-facing query registry.

Each query is a named (Spark callable, DuckDB oracle SQL) pair running
the engine's operators (SURVEY.md §2) against the driver testdata
tables (TESTDATA.md). Queries without an oracle are genuinely
non-SQL-expressible (hash-seeded sketches) and get rows-only checks.

ORDER MATTERS: the external driver certifies the first 50 entries by
insertion order. `_CERTIFICATION_FRONT` leads with queries that have
never had a green driver CORRECTNESS row, then the round-3 NTZ
casualty, then rotates the core/gate spine (certified in rounds 1-2
against the OLD testdata) back into the window so it re-certifies on
the regenerated parquet. Everything past index 50 — the round-3-green
LLM block — is re-verified every session by the local
`SPARK_GRAFT_EXACT=1` mirror of the driver gate, which covers ALL
entries, not just 50.
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
}

_CERTIFICATION_FRONT = [
    # --- never driver-certified (added after the round-3 window froze,
    #     or new this round: stats/layout gate) ---
    "regression_drift_events",
    "gapfill_locf_events",
    "unpivot_daily_metrics",
    "zorder_key_events",
    "weighted_sample_wor_documents",
    "packed_sequence_offsets",
    "cdc_crossdoc_documents",
    "merge_upsert_orders",
    "incremental_energy_state",
    "cms_token_counts",
    "scd2_customer_orders",
    "session_window_events",
    "time_weighted_avg_events",
    "rate_of_change_events",
    "ratio_to_report_events",
    "funnel_click_purchase",
    "cohort_retention_events",
    "zorder3_key_events",
    "hopping_window_events",
    "grouping_sets_events",
    "trending_types_hourly",
    "profile_drift_documents",
    "daily_value_pop_change",
    "session_paths",
    "abc_customers",
    "conditional_aggs_by_type",
    "string_functions_documents",
    "date_functions_events",
    "array_functions_documents",
    "ranking_functions_events",
    "json_null_functions_events",
    "click_asof_next_purchase",
    "hash_sample_per_lang",
    "quantile_normalize_events",
    # --- failed in round 3 (TIMESTAMP_NTZ testdata regression, fixed in
    #     sources/parquet.py: NTZ columns normalized to TIMESTAMP) ---
    "silver_pipeline_events",
    # --- core/gate spine: last driver-certified in rounds 1-2 AGAINST THE
    #     OLD testdata; the driver regenerated the parquet (µs-NTZ now),
    #     so these re-certify on the new data. The round-3 LLM block
    #     (all green in CORRECTNESS_r03.json on the new data) rotates out
    #     and stays covered by the local SPARK_GRAFT_EXACT gate. ---
    "pricing_summary",
    "daily_user_rollup",
    "customer_enrichment",
    "rolling_event_metrics",
    "dedup_events_keepfirst",
    "latest_events_topk",
    "orders_business_summary",
    "supplier_health_scores",
    "sessionize_events",
    "purchase_asof_click",
    "gold_daily_energy_events",
    "gold_device_health_events",
    "gold_business_summary_events",
    "analytics_energy_by_type",
    "analytics_kpi_day",
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
