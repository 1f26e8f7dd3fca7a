#!/usr/bin/env python
"""Benchmark the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with the noop sink (full computation,
no driver collect). A tiny warm-up query first so JVM/codegen startup
is not billed to the first benchmark entry.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: one per operator family (scan+agg, join, window, dedup,
# pipeline, gold, topk, json) plus extension ops as they land.
HEADLINE = [
    "pricing_summary",
    "daily_user_rollup",
    "customer_enrichment",
    "late_shipment_flag",
    "rolling_event_metrics",
    "dedup_events_keepfirst",
    "latest_events_topk",
    "orders_business_summary",
    "supplier_health_scores",
    "json_props_extract",
    "silver_pipeline_events",
    "gold_daily_energy_events",
    "sessionize_events",
    "purchase_asof_click",
    "pricing_rollup",
    "minhash_dedup_documents",
    "simhash_dedup_documents",
    "embedding_cosine_topk",
    "embedding_neardup_pairs",
    "embedding_ann_ivf",
    "embedding_ann_lsh",
    "text_stats",
    "multimodal_frame_sample",
    "contamination_check_documents",
    "tfidf_top_terms",
    "corpus_shuffle_documents",
    "chunk_documents",
    "quality_topk_per_lang",
    "bm25_documents",
    "pii_scrub_documents",
    "dedup_groups_documents",
    "token_batch_packing",
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
    "regression_drift_events",
    "gapfill_locf_events",
    "unpivot_daily_metrics",
    "zorder_key_events",
    "click_asof_next_purchase",
    "hash_sample_per_lang",
    "quantile_normalize_events",
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
    "map_functions_events",
    "quality_topk_approx_pct",
    "scd2_asof_lookup",
    "locf_stream_availablenow",
    "ewma_stream_availablenow",
    "generator_functions_documents",
    "hof_functions_documents",
    "bloom_probe_customers",
    "editdist_recall_planted",
    "ppjoin_pairs_documents",
    "global_rownum_orders",
    "concurrency_sweepline_events",
    "skyline_parts",
    "stream_semi_join_availablenow",
    "stream_left_anti_availablenow",
    "weighted_quantiles_orders",
    "gini_customer_orders",
    "ks_statistic_events",
    "percentile_within_group_events",
    "bitwise_aggs_events",
    "csv_malformed_modes_events",
    "asof_nearest_events",
    "trailing_active_users_events",
    "mad_outliers_events",
    "ntile_scan_orders",
    "skyline3d_parts",
    "session_stream_availablenow",
    "setops_events",
    "stream_join_availablenow",
    "stream_dedup_availablenow",
    "stream_tumbling_availablenow",
    "bpe_pair_counts_documents",
    "bpe_train_documents",
    "inverted_index_documents",
    "rollup_navigate_events",
    "pagerank_user_transitions",
    "regexp_functions_documents",
    "math_functions_events",
    "stream_merge_availablenow",
    "snapshot_diff_orders",
    "rolling_median_events",
    "stream_enrich_availablenow",
    "source_kl_documents",
    "label_centroids_embeddings",
    "stats_moments_lineitem",
    "navigation_functions_events",
    "hll_reach_events",
    "tpch_q3_shipping_priority",
    "tpch_q5_region_volume",
    "ab_lift_events",
    "json_schema_profile_events",
    "contrastive_triplets_documents",
    "incremental_join_view_orders",
    "tpch_q10_returned_items",
    "span_masks_documents",
    "tpch_q7_volume_shipping",
    "tpch_q18_large_orders",
    "conform_union_sources",
    "synthetic_source_telemetry",
    "readability_documents",
    "zipf_slope_documents",
    "curation_funnel_report",
    "stream_restart_availablenow",
    "business_summary_approx_gate",
    "variant_functions_events",
    "try_functions_events",
    "xml_functions_events",
    "lateral_topk_orders",
    "sliding_chunks_documents",
    "observe_metrics_orders",
    "compaction_roundtrip_events",
    "stream_fanout_availablenow",
    "stream_rocksdb_availablenow",
    "collation_group_events",
    "tpch_q4_order_priority",
    "tpch_q14_promo_revenue",
    "tpch_q19_disjunctive",
    "tpch_q22_global_balance",
    "window_completeness_events",
    "time_travel_orders",
    "udtf_sentences_documents",
    "runtime_bloom_join_lineitem",
    "sql_udf_functions_events",
    "null_aware_notin_orders",
    "tpch_q2_min_acctbal_supplier",
    "tpch_q6_forecast_revenue",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "tpch_q11_important_stock",
    "tpch_q12_priority_shipping",
    "tpch_q13_order_distribution",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_counts",
    "tpch_q17_small_qty_revenue",
    "tpch_q20_excess_supply",
    "tpch_q21_waiting_supplier",
    "agg_completeness_lineitem",
    "url_functions_orders",
    "statestore_read_availablenow",
    "statestore_join_availablenow",
    "stream_chained_availablenow",
    "transpose_summary_lineitem",
    "pipe_syntax_lineitem",
    "parameterized_sql_orders",
    "sugar_syntax_orders",
    "mapinarrow_tokens_documents",
    "stream_upsert_availablenow",
    "stream_upsert_restart_availablenow",
    "datetime_functions_events",
    "array_sort_hof_documents",
    "kmv_distinct_events",
    "kmv_merge_events",
    "bfs_distances_transitions",
    "triangle_count_transitions",
    "vacuum_retention_orders",
    "stream_multiwatermark_availablenow",
    "stream_timeout_sessions_availablenow",
    "stream_device_sessions_availablenow",
    "statestore_sessions_availablenow",
    "statestore_timeout_rearm_availablenow",
    "rocksdb_pysessions_availablenow",
    "edit1_neighborhood_customer",
    "minhash_incremental_recall",
    "bpe_apply_documents",
    "bpe_rankmap_documents",
    "pysink_roundtrip_orders",
    "copurchase_lift_parts",
    "agg_pushdown_events",
    "stream_sliding_availablenow",
    "stream_interval_enrich_availablenow",
    "approx_topk_events",
    "identifier_clause_orders",
    "kmv_jaccard_events",
    "hdr_quantile_sketch_events",
    "hdr_quantile_error_bound_events",
    "hdr_sketch_stream_availablenow",
    "stream_update_mode_availablenow",
    "xml_roundtrip_events",
    "json_roundtrip_events",
    "binaryfile_bmp_assets",
    "sssp_weighted_transitions",
    "map_hof_functions_events",
    "kmeans_embeddings",
    "dynamic_partition_overwrite_events",
    "cogroup_asof_events",
    "stream_fullouter_join_availablenow",
    "session_variables_orders",
    "sql_scripting_orders",
    "polymorphic_udtf_events",
    "theta_sketch_events",
    "explode_outer_events",
    "llm_corpus_pipeline_documents",
    "file_metadata_events",
    "join_types_orders",
    "bucketed_join_orders",
    "recursive_cte_hierarchy",
    "listagg_events",
    "stream_outer_join_availablenow",
    "dynamic_session_window_events",
    "logreg_quality_planted",
    "embedding_int8_quantize",
    "orc_roundtrip_events",
    "csv_roundtrip_customers",
    "expectations_events",
    "synthetic_stream_availablenow",
    "gapfill_linear_events",
    "table_checksum_orders",
    "mergeschema_read_events",
    "rle_segments_events",
    "stream_restart_pystate_availablenow",
    "stream_observe_availablenow",
    "referential_check_orders",
    "nullsafe_join_events",
    "bmp_decode_assets",
    "wav_decode_assets",
    "avi_frame_sample_assets",
    "funnel_three_step_events",
    "argmax_functions_events",
    "dynamic_partition_pruning_events",
    "pandas_udaf_geomean_events",
    "bitmap_distinct_events",
    "stream_torture_availablenow",
    "billing_reconciliation_events",
    "billing_unbilled_events",
    "billing_stream_availablenow",
]

# Iteration aid: SPARK_GRAFT_BENCH_ONLY=a,b,c restricts the run to the
# named headline queries (unknown names are an error, not a no-op).
_only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
if _only:
    _names = [n.strip() for n in _only.split(",") if n.strip()]
    _bad = [n for n in _names if n not in HEADLINE]
    if _bad:
        sys.exit(f"SPARK_GRAFT_BENCH_ONLY: not in HEADLINE: {_bad}")
    HEADLINE = _names

# N_RUNS > 1 bounds run-to-run variance: per-query time is the MIN
# across runs (the least-noisy estimator of the plan's cost on an
# otherwise-idle machine); the reported value stays the sum of
# per-query times so round-over-round numbers remain comparable.
# n=3: with min-of-2, a single noisy run still sets half the floor.
N_RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))

# Pre-adjudicated round-over-round regression flags: queries whose
# slowdown against the previous BENCH_LOCAL.json has a KNOWN cause
# (a deliberate corpus/methodology change this round). Anything not
# listed prints as UNEXPLAINED and must be attributed before the
# round ships. Entries should be cleared once the new baseline is
# committed (they adjudicate exactly one transition), EXCEPT
# standing bistability waivers, which must pin the set of known
# static-plan fingerprints (``pinned_fp_init``) — a waiver with no
# pin is invalidated the moment the static plan moves (round-12
# advice: a stale hand waiver must never mask a genuine plan change,
# that is the exact blind spot the fingerprint exists to close).
# Value shape: {"note": str, "pinned_fp_init": list[str] | absent}.
_REGRESSION_ADJUDICATIONS: dict[str, dict] = {
    # Attributed round 11 (the bar flagged it UNEXPLAINED because io
    # moved): q21's EXISTS semi join sits at the static
    # autoBroadcastJoinThreshold boundary for the projected lineitem
    # side, so committed artifacts alternate between two states —
    # statically-planned BHJ (0.67 MB shuffle) and SMJ-planned then
    # AQE-converted-to-broadcast (10.13 MB written before the
    # runtime conversion). Both states recur across the r8-r10
    # committed BENCH_LOCAL.json history with bit-identical values
    # per state and overlapping wall (1.1-1.6 s); the logical rewrite
    # (one LeftSemi + one LeftAnti, plan-asserted) is identical in
    # both. At 100 TB stats keep the SMJ — the declarative form is
    # the scale-correct one; the flip is estimate noise at gate SF,
    # not a plan defect.
    "tpch_q21_waiting_supplier": {
        "note": (
            "bistable static broadcast-threshold estimate: "
            "BHJ-planned (0.67 MB) vs SMJ-planned + AQE-converted "
            "(10.13 MB), both states recurring across committed "
            "r8-r10 artifacts with overlapping wall — estimate "
            "noise at gate SF, same logical plan"
        ),
        # every static fingerprint observed across the committed
        # BENCH_LOCAL.json history since the r12 fp split (the two
        # final-plan states 90ba5945/cd75f952 share it — the flip is
        # the AQE runtime conversion, not static planning). A run
        # whose static plan lands OUTSIDE this set is a genuine
        # code/stats change and escalates past this waiver.
        "pinned_fp_init": ["fc523a44b39d330c"],
    },
    # (round-12's multimodal_frame_sample ambient-drift waiver and
    # round-14's synthetic_stream_availablenow one-transition waiver
    # were each removed per their own cleanup rule: the next
    # committed BENCH_LOCAL.json baseline absorbs the transition.)
}


def regression_flag_fires(p: float | None, t: float) -> bool:
    """The per-query flag gate: RAW wall ratio > 1.25x AND raw delta
    > 0.3 s vs the previous artifact. Raw, not canary-adjusted
    (round-14 verdict fix #2): normalizing the GATE by the canary
    created flags whenever the machine sped up between runs — 51
    auto-waived rows in the r14 driver tail, including queries that
    got FASTER. The canary ratio is applied only downstream, to the
    adjudication of queries this gate actually flags."""
    return bool(p) and t > p * 1.25 and t - p > 0.3


def adjudicate_regression(
    name: str,
    p: float,
    t: float,
    pfp: str | None,
    nfp: str | None,
    pfi: str | None,
    nfi: str | None,
    io_same: bool,
    waivers: dict | None = None,
):
    """Classify a round-over-round per-query slowdown (prev wall
    ``p`` -> now ``t``) using the dual plan fingerprints and io
    deltas. Returns ``(adjudication, fp_moved)`` where anything
    starting with "UNEXPLAINED" must be attributed by hand before the
    round ships. Extracted from main() so the decision tree — in
    particular the waiver-vs-fingerprint precedence — is unit-tested
    (tests/test_bench_audit.py), not just exercised.

    Precedence (round-12 advice): a manual waiver applies ONLY while
    the static plan is inside the waiver's pinned set — taking the
    waiver before the fpi check would let a stale hand entry mask a
    genuine static-plan change, the exact blind spot the fingerprint
    exists to close. A pin-less waiver survives only while fpi is
    provably unmoved (False, not None/unknown).

    Magnitude bound (round-13 advice): a pin says "this static plan
    is known and fine", which is evidence about the PLAN, not about
    runtime cost — an io-moved 10x slowdown with an unchanged static
    plan is still a real CPU/runtime regression. So even inside the
    pinned set the waiver only covers wall ratios up to the waiver's
    ``wall_cap`` (default 3.0x — comfortably above every committed
    same-plan spread: seven dedup_groups runs spanned 1.42x, q21's
    bistable states overlap at 1.1-1.6 s); past the cap the flag
    escalates to UNEXPLAINED."""
    fp_moved = pfp != nfp if (pfp and nfp) else None
    fpi_moved = pfi != nfi if (pfi and nfi) else None
    adjudication = None
    waiver = (_REGRESSION_ADJUDICATIONS if waivers is None
              else waivers).get(name)
    if waiver is not None:
        pinned = waiver.get("pinned_fp_init")
        fpi_ok = nfi in pinned if pinned else fpi_moved is False
        wall_cap = waiver.get("wall_cap", 3.0)
        if fpi_ok and t > p * wall_cap:
            adjudication = (
                "UNEXPLAINED (static plan inside the waiver's "
                f"pinned set but wall moved {t / p:.2f}x > the "
                f"{wall_cap}x waiver cap — a same-plan runtime "
                "regression the waiver must not mask)"
            )
        elif fpi_ok:
            adjudication = waiver["note"]
        elif fpi_moved or (pinned and nfi is not None):
            adjudication = (
                "UNEXPLAINED (static plan fingerprint "
                f"{pfi} -> {nfi} is outside the manual "
                f"waiver's pinned set {pinned} — the "
                "waiver is stale; attribute the plan "
                "change by hand)"
            )
        # else: no fingerprint captured this run — fall through to
        # the mechanical rules below, which handle the
        # fpi_moved-is-None case explicitly
    if adjudication is None and fpi_moved:
        # Mechanical plan-flip detection (round-11 verdict ask #2):
        # the STATIC (initial) plan moved — that only happens on a
        # genuine code/plan/stats change, never on AQE runtime races
        # — so this must be attributed by hand regardless of io,
        # closing the CPU-only-plan-change blind spot.
        adjudication = (
            "UNEXPLAINED (static plan fingerprint moved "
            f"{pfi} -> {nfi})"
        )
    if adjudication is None and fp_moved and fpi_moved is False:
        # The static plan is identical but the FINAL adaptive plan
        # differs: an AQE runtime re-plan (build-side race on ~equal
        # broadcast candidates, stage-reuse timing, q21-class
        # threshold conversion). Waivable only when the bytes stayed
        # bit-identical inside the variance band; a runtime re-plan
        # that MOVED data is exactly the q21 class and needs
        # attribution.
        if io_same and t <= p * 2.0:
            adjudication = (
                "static plan identical; AQE runtime "
                "re-plan with bit-identical io inside "
                "the 2x band — runtime nondeterminism, "
                "not a code change"
            )
        else:
            adjudication = (
                "UNEXPLAINED (AQE runtime re-plan "
                f"{pfp} -> {nfp} with moved io or >2x)"
            )
    if adjudication is None and fp_moved and fpi_moved is None:
        # no initial-plan baseline yet (first round after the
        # split): fall back to the conservative rule
        adjudication = (
            "UNEXPLAINED (plan fingerprint moved "
            f"{pfp} -> {nfp})"
        )
    if adjudication is None:
        # First-line auto-adjudication, the same evidence the manual
        # r9/r10 investigations used: if the query moved EXACTLY the
        # bytes it moved in the baseline run (shuffle/spill/input
        # identical at 0.01 MB granularity), the plan did not change
        # — a plan flip, corpus edit, or superstep change moves
        # bytes; ambient machine slowness does not. Anything whose io
        # DID move stays UNEXPLAINED and must be attributed by hand
        # before shipping. CAPPED (round-10 advice): identical bytes
        # rule out plan flips that MOVE data, but CPU-only changes
        # (extra codegen stage, UDF overhead, an added local agg)
        # move zero bytes while genuinely slowing a query — so the
        # waiver only covers the variance band (<= 2.0x). An
        # io-identical regression beyond 2x is not "ambient machine
        # variance" on any box we have measured (seven committed
        # dedup_groups runs spanned 1.42x) and stays UNEXPLAINED for
        # hand attribution.
        if io_same and t <= p * 2.0:
            adjudication = (
                "io-identical to baseline run (plan and "
                "data volume unchanged) within the 2x "
                "variance band — ambient machine variance"
            )
            if fp_moved is False:
                adjudication = (
                    "plan fingerprint AND io identical "
                    "to baseline run within the 2x "
                    "variance band — ambient machine "
                    "variance (mechanically confirmed)"
                )
        else:
            adjudication = "UNEXPLAINED"
    return adjudication, fp_moved


def adjudicate_throughput_floor(
    tp_now: float,
    floor: float,
    canary_ratio: float,
    silver_fpi_same: bool | None,
    silver_io_same: bool | None,
):
    """Adjudicate the silver-throughput floor (round 14): the
    dedicated throughput runs execute at the very END of the bench —
    exactly where a slow VM phase lands hardest — and the trailing
    driver-round comparators carry no canary, so the raw check
    flagged ambient drift as a pipeline regression. Normalize the
    measured figure by the canary ratio vs the previous local
    artifact (same clamp discipline as the per-query flags) and,
    when the normalized figure clears the floor, require the
    mechanical plan evidence (silver_pipeline_events' static
    fingerprint AND io identical) before waiving. Returns
    (adjudication_or_None, tp_adjusted)."""
    tp_adj = round(tp_now * canary_ratio)
    if tp_now >= floor:
        return None, tp_adj
    if tp_adj >= floor and silver_fpi_same and silver_io_same:
        return (
            "below the raw floor but canary-adjusted above it "
            f"({tp_now} raw, {tp_adj} adjusted at canary ratio "
            f"{canary_ratio:.2f}) with silver_pipeline_events' static "
            "plan fingerprint and io identical to the previous "
            "artifact — ambient machine drift, not a pipeline "
            "regression"
        ), tp_adj
    return (
        "UNEXPLAINED throughput regression: "
        f"{tp_now} raw / {tp_adj} canary-adjusted < floor "
        f"{round(floor)}"
        + (
            ""
            if (silver_fpi_same and silver_io_same)
            else " (silver plan fingerprint or io moved, or no "
            "previous artifact to compare)"
        )
    ), tp_adj


def _bench_stream_boot(spark) -> float:
    """Time a minimal availableNow stream (1-row parquet in, parquet
    out) — the fixed startup cost shared by every streaming gate.
    Min over N_RUNS, fresh checkpoint each run (matching how the
    gates themselves execute)."""
    import shutil
    import tempfile
    import time

    root = tempfile.mkdtemp(prefix="bench_stream_boot_")
    try:
        spark.range(1).write.mode("overwrite").parquet(f"{root}/in")
        schema = spark.read.parquet(f"{root}/in").schema
        best = None
        for i in range(N_RUNS):
            t0 = time.perf_counter()
            q = (
                spark.readStream.schema(schema)
                .parquet(f"{root}/in")
                .writeStream.format("parquet")
                .option("path", f"{root}/out{i}")
                .option("checkpointLocation", f"{root}/ckpt{i}")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
            t = round(time.perf_counter() - t0, 3)
            best = t if best is None else min(best, t)
        return best
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _bench_compaction(spark, capture=None) -> dict[str, float]:
    """Small-file tax, measured: the same full-scan aggregate over the
    events table fragmented into 256 files vs compacted output
    (sources/parquet.py:compact_files). The delta is pure per-file
    overhead (open/footer/task-schedule) — the cost the compaction
    operator exists to delete, which grows linearly with file count
    at a fixed data size.

    ``capture(name)`` hooks the main loop's fingerprint/io pollers
    (round-12 verdict ask #2: these plans — the compaction payoff —
    ARE the thing benchmarked, so they must be in query_plan_fp);
    ``capture(None)`` discards the setup writes' executions so they
    are never attributed to the first scan."""
    import shutil
    import tempfile
    import time

    from pyspark.sql import functions as F

    from big_data_for_smart_houses_spark.sources.parquet import (
        compact_files,
    )

    root = tempfile.mkdtemp(prefix="bench_compaction_")
    try:
        ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
        ev.repartition(256).write.mode("overwrite").parquet(
            f"{root}/small"
        )
        compact_files(
            spark,
            f"{root}/small",
            f"{root}/compacted",
            target_file_bytes=32 * 1024 * 1024,
        )
        if capture is not None:
            capture(None)
        results: dict[str, float] = {}
        for run in range(N_RUNS):
            for name, path in (
                ("scan_small_files", f"{root}/small"),
                ("scan_compacted", f"{root}/compacted"),
            ):
                t0 = time.perf_counter()
                spark.read.parquet(path).agg(
                    F.count(F.lit(1)), F.sum("value")
                ).write.mode("overwrite").format("noop").save()
                t = round(time.perf_counter() - t0, 3)
                results[name] = min(results.get(name, t), t)
                if run == 0 and capture is not None:
                    capture(name)
        return results
    finally:
        shutil.rmtree(root, ignore_errors=True)


# Queries probed by the 10x nonlinear-blowup sweep: the most
# expensive batch entries with join/iteration/window structure (the
# shapes where O(n^k) hides at small SF — round 6's two O(gap²)
# windows were found exactly this way). Streaming gates are excluded:
# their cost is fixed machinery, measured by stream_boot_s.
SCALE10X_FACTOR = 10
SCALE10X_FLAG_RATIO = 15.0
SCALE10X_PROBES = [
    "logreg_quality_planted",
    "semantic_dedup_embeddings",
    "embedding_neardup_pairs",
    "simhash_dedup_documents",
    "minhash_dedup_documents",
    "recursive_cte_hierarchy",
    "pagerank_user_transitions",
    "dedup_groups_documents",
    "embedding_ann_ivf",
    "embedding_ann_lsh",
    "cdc_crossdoc_documents",
    "contrastive_triplets_documents",
    "bucketed_join_orders",
    "cms_token_counts",
    "editdist_recall_planted",
    "ppjoin_pairs_documents",
    "bigram_lm_documents",
    "source_kl_documents",
    "dedup_exact_documents",
    "tpch_q7_volume_shipping",
    "tpch_q17_small_qty_revenue",
    "tpch_q20_excess_supply",
    "tpch_q21_waiting_supplier",
    "zipf_slope_documents",
    "bpe_pair_counts_documents",
    "bpe_train_documents",
    "inverted_index_documents",
    "sessionize_events",
    "gapfill_linear_events",
    "rolling_median_events",
    # round-7 late wave: streaming execution gates scale with STATE
    # and staged input; join_types with both join sides
    "stream_upsert_availablenow",
    "statestore_read_availablenow",
    "statestore_join_availablenow",
    "stream_chained_availablenow",
    "join_types_orders",
    # round-7 fifth wave: new iterative supersteps (k-means broadcast
    # assignment, Bellman-Ford frontier), the cogrouped pandas as-of,
    # and the full-outer stream join's two-sided state
    "kmeans_embeddings",
    "sssp_weighted_transitions",
    "cogroup_asof_events",
    "stream_fullouter_join_availablenow",
    # round-7 sixth wave: prefix-filter candidate volume (PPJoin),
    # the distributed scan family (2 balanced shuffles — must stay
    # linear), and its order-statistics/skyline riders
    "global_rownum_orders",
    "concurrency_sweepline_events",
    "skyline_parts",
    "weighted_quantiles_orders",
    "gini_customer_orders",
    "ks_statistic_events",
    "ntile_scan_orders",
    "trailing_active_users_events",
    "asof_nearest_events",
    # round 9: the deletion-neighborhood join's candidate volume
    # (L+1 keys per string — must stay linear in rows), the
    # pending-interval session trackers' state growth, and the
    # Python-writer sink's per-partition fan-out
    "edit1_neighborhood_customer",
    "minhash_incremental_recall",
    "bpe_apply_documents",
    "bpe_rankmap_documents",
    "stream_device_sessions_availablenow",
    "stream_timeout_sessions_availablenow",
    "pysink_roundtrip_orders",
    # round 10: the HDR sketch's counter volume (bucket count is
    # bounded by the value RANGE, not rows — shuffle should grow
    # sublinearly), its streaming partial-merge variant, and the
    # left-anti join's state volume
    "hdr_quantile_sketch_events",
    "hdr_sketch_stream_availablenow",
    "stream_left_anti_availablenow",
    # round 11: the remaining applyInPandasWithState pair — the EWMA
    # fold (O(keys) state, per-key numpy fold) and LOCF gap-fill
    # (open-bucket accumulator + bounded gap materialization);
    # device/timeout session trackers already sweep above
    "ewma_stream_availablenow",
    "locf_stream_availablenow",
    # round 12: the d>2 skyline's local/merge path — phase-1 local
    # skylines must keep the merge union small as parts grow
    # (probes/skyline10x.py measures the union directly)
    "skyline3d_parts",
]


def _bench_scale10x(spark) -> dict:
    """Nonlinear-blowup sweep (env SPARK_GRAFT_SCALE10X=1): run each
    probe query at 1x and at a deterministic 10x scale-up
    (sources/synthetic.py:scale_up_tables — 10x the keys, constant
    per-key density, linear dup structure) and report BOTH the
    wall-time ratio and the shuffle-write-bytes ratio. rows x10 with
    wall ratio > SCALE10X_FLAG_RATIO flags a superlinear query;
    shuffle growth > row-growth x 1.5 (same 15x bar) with a
    non-trivial absolute size flags a scale-killer hiding behind
    local[32]'s free shuffle — bytes that become NETWORK at 1000
    executors even when local wall time stays flat. One timed run
    per side — the signal sought is 15x-vs-10x, far above noise."""
    import shutil
    import tempfile
    import time

    from big_data_for_smart_houses_spark.queries import QUERIES
    from big_data_for_smart_houses_spark.sources.synthetic import (
        scale_up_tables,
    )

    root = tempfile.mkdtemp(prefix="bench_scale10x_")
    out: dict = {}
    poll = _stage_metrics_poller(spark)
    last_stage, _ = poll(-1)
    # Streaming gates memoize per (gate, sf_dir); the headline pass
    # already ran them at SF_DIR, so without this the 1x timing below
    # would be a memo hit (~0s) and the ratio meaningless.
    prev_memo = os.environ.get("SPARK_GRAFT_NO_STREAM_MEMO")
    os.environ["SPARK_GRAFT_NO_STREAM_MEMO"] = "1"
    try:
        scale_up_tables(spark, SF_DIR, f"{root}/x10", SCALE10X_FACTOR)
        for name in SCALE10X_PROBES:
            fn = QUERIES.get(name)
            if fn is None:
                continue
            try:
                last_stage, _ = poll(last_stage)
                t0 = time.perf_counter()
                fn(spark, SF_DIR).write.mode("overwrite").format(
                    "noop"
                ).save()
                t1 = round(time.perf_counter() - t0, 3)
                last_stage, io1 = poll(last_stage)
                t0 = time.perf_counter()
                fn(spark, f"{root}/x10").write.mode(
                    "overwrite"
                ).format("noop").save()
                t10 = round(time.perf_counter() - t0, 3)
                last_stage, io10 = poll(last_stage)
            except Exception as exc:  # noqa: BLE001
                out[name] = {"error": f"{type(exc).__name__}: {exc}"[:200]}
                continue
            ratio = round(t10 / t1, 2) if t1 > 0 else None
            sw1 = io1["shuffle_write_mb"]
            sw10 = io10["shuffle_write_mb"]
            # shuffle growth bar: row-growth (10x) x 1.5 — but only at
            # a non-trivial absolute size, so a 0.01->0.3 MB startup
            # artifact can't flag
            sw_ratio = round(sw10 / sw1, 2) if sw1 > 0.05 else None
            sw_flag = bool(
                sw_ratio
                and sw_ratio > SCALE10X_FACTOR * 1.5
                and sw10 > 10.0
            )
            out[name] = {
                "t1": t1,
                "t10": t10,
                "ratio": ratio,
                "shuffle_mb_1x": sw1,
                "shuffle_mb_10x": sw10,
                "shuffle_ratio": sw_ratio,
                "flagged": bool(ratio and ratio > SCALE10X_FLAG_RATIO),
                "shuffle_flagged": sw_flag,
            }
            print(
                f"  scale10x {name}: {t1:.2f}s -> {t10:.2f}s"
                f" ({ratio}x); shuffle {sw1:.1f} -> {sw10:.1f} MB"
                f" ({sw_ratio}x)",
                file=sys.stderr,
            )
        # Skyline DISTINCT-GROWTH contract (round-12 verdict ask #7):
        # the value-replicating scale-up above keeps skyline3d's
        # distinct-point count constant (the dedup absorbs the 10x),
        # so the sweep row alone cannot catch a frontier-size
        # regression. This permanent entry re-projects the third
        # dimension from the raw partkey modulo a prime so distinct
        # points genuinely grow ~10x, then ASSERTS the operator's
        # scale contract — the phase-1 local-skyline union the single
        # merge task receives must stay near the true frontier
        # (sublinear), never near the input. The union is measured by
        # an independent copy of the dominance kernel
        # (probes/skyline10x._local_survivors) so the operator under
        # test stays untouched. Flag bar: union growing as fast as
        # half the distinct growth, or past 1% of distinct points,
        # means local dominance stopped pruning — the merge task
        # becomes the 100 TB bottleneck.
        try:
            from pyspark.sql import functions as F

            from probes.skyline10x import _local_survivors

            def _wide_pts(d):
                return (
                    spark.read.parquet(f"{d}/part.parquet")
                    .select(
                        F.col("p_retailprice").alias("_s0"),
                        (-F.col("p_size")).alias("_s1"),
                        (-(F.col("p_partkey") % 10007)).alias("_s2"),
                    )
                    .distinct()
                )
            p1, p10 = _wide_pts(SF_DIR), _wide_pts(f"{root}/x10")
            d1, d10 = p1.count(), p10.count()
            u1, u10 = _local_survivors(p1), _local_survivors(p10)
            growth = d10 / max(d1, 1)
            # The binding contract is ABSOLUTE: the merge task's
            # input must stay ~the frontier size, never near the
            # input — 1% of distinct points is ~60x the measured
            # union at the standing config (128 of 200k). Guards:
            # below ~10k distinct the partitions hold too few points
            # for local dominance to prune (small-input geometry,
            # same idea as the shuffle bar's >10 MB floor), and the
            # growth-ratio rule needs a stable base (frontier sizes
            # in the low tens are integer-lumpy: the measured 13 ->
            # 128 is healthy log^2 growth, not a regression).
            union_flagged = bool(
                d10 > 10_000
                and (
                    u10 > 0.01 * d10
                    or (u1 >= 100 and u10 > u1 * growth * 0.5)
                )
            )
            out["skyline3d_distinct_growth"] = {
                "distinct_1x": d1,
                "distinct_10x": d10,
                "union_1x": u1,
                "union_10x": u10,
                "flagged": union_flagged,
            }
            print(
                f"  scale10x skyline3d_distinct_growth: union {u1} ->"
                f" {u10} over distinct {d1} -> {d10}"
                f" (flagged={union_flagged})",
                file=sys.stderr,
            )
        except Exception as exc:  # noqa: BLE001
            out["skyline3d_distinct_growth"] = {
                "error": f"{type(exc).__name__}: {exc}"[:200]
            }
        return out
    finally:
        if prev_memo is None:
            os.environ.pop("SPARK_GRAFT_NO_STREAM_MEMO", None)
        else:
            os.environ["SPARK_GRAFT_NO_STREAM_MEMO"] = prev_memo
        shutil.rmtree(root, ignore_errors=True)


def _bench_skew(spark, capture=None) -> dict[str, float]:
    """Time the same skewed shuffle join plain vs salted. The fact is
    the events table with every user_id % 5 == 0 collapsed onto key 0
    (one key = ~20% of rows); plain hashes that key into ONE shuffle
    partition, salted spreads it over 16. Reported as min over
    N_RUNS, same estimator as the headline entries.

    ``capture(name)`` hooks the main loop's fingerprint/io pollers
    (round-12 verdict ask #2: the salt fan-out plan is the thing
    benchmarked); ``capture(None)`` discards the dim-write setup."""
    import shutil
    import tempfile
    import time

    from pyspark.sql import functions as F

    from big_data_for_smart_houses_spark.operators.skew import salted_join

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    fact = ev.select(
        F.when((F.col("user_id") % 5) == 0, 0)
        .otherwise(F.col("user_id"))
        .alias("k"),
        "value",
        "ts",
    )
    tmp = tempfile.mkdtemp(prefix="bench_skew_dim_")
    try:
        fact.select("k").distinct().withColumn(
            "attr", F.md5(F.col("k").cast("string"))
        ).write.mode("overwrite").parquet(tmp)
        dim = spark.read.parquet(tmp)
        if capture is not None:
            capture(None)
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            results: dict[str, float] = {}
            for run in range(N_RUNS):
                for name, df in (
                    ("skew_join_plain", fact.join(dim, "k")),
                    ("skew_join_salted", salted_join(fact, dim, on="k")),
                ):
                    t0 = time.perf_counter()
                    df.write.mode("overwrite").format("noop").save()
                    t = round(time.perf_counter() - t0, 3)
                    results[name] = min(results.get(name, t), t)
                    if run == 0 and capture is not None:
                        capture(name)
            return results
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _stage_metrics_poller(spark):
    """Per-query physical I/O from the JVM AppStatusStore: shuffle
    read/write bytes, spill, and scan input bytes, summed over the
    stages each query ran. Deltas are keyed by stageId (sum stages
    ABOVE the pre-query max), not by cumulative totals, so the UI
    store evicting old stages (spark.ui.retainedStages) can never
    make a delta go negative. This is the scale signal wall-time
    can't give on local[32]: shuffle bytes are what become network
    at 1000 executors, and spill is what becomes disk pressure.
    Returns poll(after_stage_id) -> (new_max_id, totals_dict); any
    py4j failure degrades to None metrics rather than killing the
    bench."""
    sc = spark.sparkContext
    jvm = sc._jvm
    store = sc._jsc.sc().statusStore()
    statuses = jvm.java.util.ArrayList()
    taskstatus = jvm.java.util.ArrayList()
    quantiles = sc._gateway.new_array(jvm.double, 0)
    mb = 1024.0 * 1024.0

    def poll(after_stage_id: int):
        # The status listener consumes task-end events ASYNC from the
        # bus; poll without draining it and a query's bytes smear into
        # the next entry. waitUntilEmpty() is cheap at this cadence.
        sc._jsc.sc().listenerBus().waitUntilEmpty()
        stages = store.stageList(
            statuses, False, False, quantiles, taskstatus
        )
        mx = after_stage_id
        tot = {
            "shuffle_write_mb": 0.0,
            "shuffle_read_mb": 0.0,
            "spill_mb": 0.0,
            "input_mb": 0.0,
        }
        for i in range(stages.size()):
            s = stages.apply(i)
            sid = s.stageId()
            if sid > mx:
                mx = sid
            if sid <= after_stage_id:
                continue
            tot["shuffle_write_mb"] += s.shuffleWriteBytes() / mb
            tot["shuffle_read_mb"] += s.shuffleReadBytes() / mb
            tot["spill_mb"] += (
                s.memoryBytesSpilled() + s.diskBytesSpilled()
            ) / mb
            tot["input_mb"] += s.inputBytes() / mb
        return mx, {k: round(v, 2) for k, v in tot.items()}

    return poll


def _plan_fingerprinter(spark):
    """Per-query EXECUTED-plan fingerprint (round-11 verdict ask #2):
    a short hash over the canonicalized physical-plan descriptions of
    every SQL execution the query ran, read back from the JVM
    SQLAppStatusStore AFTER the query completes — so under AQE the
    description holds the FINAL adaptive plan, which is exactly where
    the q21-class broadcast-threshold bistability shows up.
    Canonicalization strips run-varying tokens (expression ids,
    Statistics(...) estimates, filesystem/tempdir paths) and keeps
    structure (node tree, join strategies, exchange placement,
    codegen spans), so: fingerprint moved => the plan changed;
    fingerprint identical => a wall-time move is variance or
    same-plan CPU cost. Makes plan-flip-vs-variance adjudication
    mechanical instead of prose (it previously inferred plan identity
    from io bytes alone, which is blind to CPU-only plan changes).

    TWO hashes are kept per query, because two different things can
    move a plan description (measured on this engine, round 12):

    * ``fp`` — the full description incl. the FINAL adaptive plan.
      Moves on ANY executed-plan change.
    * ``fp_init`` — the INITIAL (statically-planned) trees only,
      node ids stripped. Static planning is deterministic given the
      same code and stats, so this hash moves ONLY on a genuine
      code/plan/stats change — it is immune to AQE runtime races
      (ks_statistic_events flips BHJ build side run-to-run because
      two ~equal 8.5 MiB broadcast candidates race; q21-class
      runtime conversions are the same family).

    Adjudication reads them as: fp_init moved => real plan change,
    attribute by hand; fp_init same + fp moved => AQE runtime
    re-plan, waivable when io is bit-identical inside the variance
    band; both same => strongest variance confirmation.

    Returns poll(after_exec_id) -> (new_max_id, fp_or_None,
    fp_init_or_None); walks the executions list from the NEWEST end
    and stops at the watermark, so py4j round-trips are O(new
    executions), not O(retained executions)."""
    import hashlib

    sc = spark.sparkContext
    store = spark._jsparkSession.sharedState().statusStore()
    strip = [
        (re.compile(r"#\d+L?"), "#"),
        (re.compile(r"plan_id=\d+"), "plan_id="),
        # lambda-variable names carry a SESSION-GLOBAL counter
        # (x_16, y_17, ...) that shifts with everything planned
        # earlier in the session — identity noise, not structure
        (re.compile(r"\blambda ([a-z]+)_\d+"), r"lambda \1_"),
        (re.compile(r"Statistics\([^)]*\)"), "Statistics()"),
        # RDD ids (session-global counter, e.g. MapPartitionsRDD[34])
        # and streaming run UUIDs are per-run identity, not structure
        (re.compile(r"RDD\[\d+\]"), "RDD[]"),
        # RDD creation callsites flip between the reflective frame
        # and <unknown> depending on JIT state (e.g. "at
        # applySchemaToPythonRDD at NativeMethodAccessorImpl.java:0"
        # vs "at <unknown>:0") — introspection noise, not structure
        (re.compile(r" at [A-Za-z0-9_.$<>]+:\d+"), " at <callsite>"),
        (
            re.compile(
                r"[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}"
                r"-[0-9a-f]{4}-[0-9a-f]{12}"
            ),
            "<uuid>",
        ),
        (re.compile(r"file:[^\s\],)]+"), "<path>"),
        (re.compile(r"/(?:root|tmp|home|private)[^\s\],)]*"), "<path>"),
        # auto-generated temp-view names (parameterized SQL, scripting)
        (re.compile(r"_pyspark_[0-9a-f]{32}"), "_pyspark_<id>"),
    ]

    def canon(desc: str) -> str:
        for pat, rep in strip:
            desc = pat.sub(rep, desc)
        return desc

    init_re = re.compile(r"== Initial Plan ==\n(.*?)\n\s*\n", re.S)
    tree_re = re.compile(r"== Physical Plan ==\n(.*?)\n\s*\n", re.S)
    # node ids renumber with the FINAL tree's size, so the initial
    # hash must ignore them
    node_id_re = re.compile(r"\(\d+\)")

    def initial_tree(desc: str) -> str:
        m = init_re.search(desc) or tree_re.search(desc)
        return node_id_re.sub("", m.group(1)) if m else desc

    def poll(after_exec_id: int):
        # The SQL status listener consumes execution-end events ASYNC
        # from the bus (same hazard as the stage poller): without a
        # drain, a just-finished execution can land AFTER this poll
        # and smear into the NEXT query's fingerprint.
        sc._jsc.sc().listenerBus().waitUntilEmpty()
        lst = store.executionsList()
        n = lst.size()
        descs = []
        mx = after_exec_id
        for i in range(n - 1, -1, -1):
            e = lst.apply(i)
            eid = e.executionId()
            if eid <= after_exec_id:
                break
            mx = max(mx, eid)
            descs.append(canon(e.physicalPlanDescription()))
        if not descs:
            return mx, None, None
        descs.reverse()  # executionId order — deterministic per gate
        h = hashlib.sha256(
            "\n---\n".join(descs).encode()
        ).hexdigest()[:16]
        hi = hashlib.sha256(
            "\n---\n".join(initial_tree(d) for d in descs).encode()
        ).hexdigest()[:16]
        return mx, h, hi

    return poll


def _vm_canary_s() -> float:
    """Fixed pure-CPU calibration task (round-13 verdict ask #7):
    r11->r13 wall moved -10%/+11% on near-identical code and every
    round's adjudication leaned on "uniform ratio + fingerprints
    identical" INFERENCE to call it ambient VM drift. This turns
    that inference into a measurement: a constant numpy workload —
    no io, no Spark, no allocation growth — timed at bench start and
    end. The ratio of this number across two artifacts is the
    machine-speed ratio between those runs, so the regression
    adjudicator can normalize per-query wall ratios by it before
    flagging (a slow VM moves the canary and the queries together; a
    code regression moves only the queries)."""
    import numpy as np

    x = np.arange(2_000_000, dtype=np.float64)
    t0 = time.perf_counter()
    acc = 0.0
    for _ in range(6):
        acc += float(np.sin(x).sum())
    dt = time.perf_counter() - t0
    if acc != acc:  # NaN guard keeps the work observable
        raise AssertionError("canary produced NaN")
    return round(dt, 4)


def main() -> None:
    from big_data_for_smart_houses_spark.queries import QUERIES
    from big_data_for_smart_houses_spark.session import get_spark

    # Bench times REAL executions only: disable the streaming gates'
    # session memo so the warm (second) run re-streams end to end.
    os.environ["SPARK_GRAFT_NO_STREAM_MEMO"] = "1"

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up: JVM, codegen, parquet footer caches
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()

    try:
        canary_start = _vm_canary_s()
    except Exception:  # noqa: BLE001 - calibration is best-effort
        canary_start = None

    # One failing query must not zero out the whole round's numbers
    # (round 3 lost every timing to a single AnalysisException): record
    # the error, skip the query in later runs, keep benchmarking.
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    query_io: dict[str, dict] = {}
    query_fp: dict[str, str] = {}
    query_fp_init: dict[str, str] = {}
    try:
        poll_stages = _stage_metrics_poller(spark)
        last_stage_id, _ = poll_stages(-1)
    except Exception:  # noqa: BLE001 - metrics are best-effort
        poll_stages = None
        last_stage_id = -1
    try:
        poll_fp = _plan_fingerprinter(spark)
        last_exec_id, _, _ = poll_fp(-1)
    except Exception:  # noqa: BLE001 - fingerprints are best-effort
        poll_fp = None
        last_exec_id = -1

    def _micro_capture(name):
        """io + plan-fingerprint capture for the micro-bench entries
        (scan_compacted/scan_small_files/skew_join_plain/salted),
        which execute outside the HEADLINE loop — round-12 verdict
        ask #2: they were the only 4 timings with no query_plan_fp,
        and their plans (compaction payoff, salt fan-out) are
        exactly what those benchmarks exist to pin. ``name=None``
        polls-and-discards setup executions so they are never billed
        to the next named entry. Same capture discipline as the main
        loop: first (cold) run only."""
        nonlocal last_stage_id, last_exec_id, poll_stages, poll_fp
        if poll_stages is not None:
            try:
                last_stage_id, io = poll_stages(last_stage_id)
                if name is not None and name not in query_io:
                    query_io[name] = io
            except Exception:  # noqa: BLE001 - best-effort
                poll_stages = None
        if poll_fp is not None:
            try:
                last_exec_id, fp, fpi = poll_fp(last_exec_id)
                if (
                    name is not None
                    and fp is not None
                    and name not in query_fp
                ):
                    query_fp[name] = fp
                    query_fp_init[name] = fpi
            except Exception:  # noqa: BLE001 - best-effort
                poll_fp = None
    for run in range(N_RUNS):
        for name in HEADLINE:
            fn = QUERIES.get(name)
            if fn is None or name in errors:
                continue
            # Streaming gates execute TWICE (cold + warm), not N_RUNS
            # times: the min is the warm number (codegen/worker
            # startup amortized — same quantity r6's min-of-3
            # reported, at one fewer full stream per gate), and the
            # memo is bypassed below so the warm run is a REAL
            # end-to-end stream, never a cache read.
            if name.endswith("_availablenow") and run > 1:
                continue
            t0 = time.perf_counter()
            try:
                df = fn(spark, SF_DIR)
                df.write.mode("overwrite").format("noop").save()
            except Exception as exc:  # noqa: BLE001 - report, don't die
                errors[name] = f"{type(exc).__name__}: {exc}"[:300]
                print(f"  [{run}] {name}: ERROR {errors[name]}", file=sys.stderr)
                # poll-and-discard the failed query's stages so its
                # bytes are not attributed to the next query's entry
                if run == 0 and poll_stages is not None:
                    try:
                        last_stage_id, _ = poll_stages(last_stage_id)
                    except Exception:  # noqa: BLE001
                        poll_stages = None
                if run == 0 and poll_fp is not None:
                    try:
                        last_exec_id, _, _ = poll_fp(last_exec_id)
                    except Exception:  # noqa: BLE001
                        poll_fp = None
                continue
            t = round(time.perf_counter() - t0, 3)
            timings[name] = min(timings.get(name, t), t)
            # I/O is a property of the plan, not the run: capture it
            # once, on the first (cold) execution of each query —
            # and poll ONLY during run 0. Each poll walks every
            # retained StageData over py4j (~1000 round-trips late
            # in the bench), so polling on warm runs would bill real
            # wall-time to every min-of-N timing for zero new data.
            if run == 0 and poll_stages is not None:
                try:
                    last_stage_id, io = poll_stages(last_stage_id)
                    if name not in query_io:
                        query_io[name] = io
                except Exception:  # noqa: BLE001
                    poll_stages = None
            # Plan fingerprint follows the same capture discipline:
            # run 0 only (the plan is a property of the code + data,
            # not the run), polled AFTER the query so AQE plans are
            # final.
            if run == 0 and poll_fp is not None:
                try:
                    last_exec_id, fp, fpi = poll_fp(last_exec_id)
                    if fp is not None and name not in query_fp:
                        query_fp[name] = fp
                        query_fp_init[name] = fpi
                except Exception:  # noqa: BLE001
                    poll_fp = None
            print(f"  [{run}] {name}: {t:.3f}s", file=sys.stderr)

    # Stream-boot baseline: the fixed cost every `*_availablenow`
    # gate pays before its first row (query start + checkpoint init +
    # one empty-ish micro-batch). Recorded so round-over-round
    # streaming-gate deltas can be read net of boot noise — a gate
    # that moved by ~stream_boot_s moved by NOTHING.
    try:
        out_boot = _bench_stream_boot(spark)
    except Exception as exc:  # noqa: BLE001
        errors["stream_boot"] = f"{type(exc).__name__}: {exc}"[:300]
        out_boot = None

    # Skew microbenchmark (performance signal for the salting path —
    # correctness is gated separately by salted_join_orders): one key
    # owns 20% of the fact rows; the dim is written out first so its
    # construction isn't billed, and broadcast is disabled so the join
    # actually shuffles (at 100 TB the dim wouldn't broadcast — this
    # measures the shape that exists at scale). AQE skew-split stays ON
    # for the plain side: the delta reported is salting vs what AQE
    # alone does at this partition size.
    try:
        skew_t = _bench_skew(spark, capture=_micro_capture)
        timings.update(skew_t)
    except Exception as exc:  # noqa: BLE001
        errors["skew_bench"] = f"{type(exc).__name__}: {exc}"[:300]

    # Small-file-tax microbenchmark (the compaction operator's
    # standing perf signal, like skew for salting)
    try:
        timings.update(_bench_compaction(spark, capture=_micro_capture))
    except Exception as exc:  # noqa: BLE001
        errors["compaction_bench"] = f"{type(exc).__name__}: {exc}"[:300]

    # Opt-in 10x nonlinear-blowup sweep (several extra minutes):
    # SPARK_GRAFT_SCALE10X=1 python bench.py
    scale10x = None
    if os.environ.get("SPARK_GRAFT_SCALE10X"):
        try:
            scale10x = _bench_scale10x(spark)
        except Exception as exc:  # noqa: BLE001
            errors["scale10x_bench"] = f"{type(exc).__name__}: {exc}"[:300]

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline_query_wall_time",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    # The reference's published baseline is consumer THROUGHPUT
    # (300+ events/s, reference README.md:265); report the silver
    # pipeline's end-to-end equivalent in the same unit so the
    # comparison never needs hand arithmetic.
    if out_boot is not None:
        out["stream_boot_s"] = out_boot
    if scale10x is not None:
        out["scale10x"] = scale10x
    if query_io:
        out["query_io"] = query_io
    if query_fp:
        out["query_plan_fp"] = query_fp
        out["query_plan_fp_init"] = query_fp_init
    silver_t = timings.get("silver_pipeline_events")
    if silver_t:
        # ADVICE r9: the best-of-6 figure is not comparable to prior
        # rounds' min-of-3-interleaved numbers. Report BOTH for this
        # transition round so round-over-round deltas are computed
        # under a constant methodology.
        n_ev_pre = spark.read.parquet(
            f"{SF_DIR}/events.parquet"
        ).count()
        out["silver_throughput_interleaved_min3_events_per_s"] = round(
            n_ev_pre / silver_t
        )
        # Throughput is the one headline the baseline comparison
        # hangs on, so it gets tighter methodology than the per-query
        # table (round-8 verdict ask #8: the r7->r8 dip was run
        # noise): best of SIX — the three interleaved runs above plus
        # three dedicated back-to-back runs here at end-of-bench,
        # when the JVM/codegen/page cache are as warm as they get.
        fn = QUERIES.get("silver_pipeline_events")
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.mode("overwrite").format(
                "noop"
            ).save()
            silver_t = min(silver_t, time.perf_counter() - t0)
        n_events = n_ev_pre
        out["silver_throughput_events_per_s"] = round(n_events / silver_t)
        out["silver_throughput_methodology"] = (
            "events / best-of-6 silver_pipeline wall "
            "(3 interleaved min-of-N runs + 3 dedicated "
            "end-of-bench warm runs); round-over-round comparisons "
            "use THIS best-of-6 field (the parsed "
            "silver_throughput_events_per_s in BENCH_r{N}.json), "
            "never the interleaved-min3 transition figure"
        )
        # Mechanical throughput regression bar (round-12 verdict ask
        # #3): query wall has a per-query bar and the 10x sweep has a
        # ratio bar, but the r11->r12 driver throughput moved -19%
        # with no flag because throughput had none. Floor = best of
        # the last 3 driver rounds' parsed best-of-6 figures / 1.5
        # (the committed same-code spread is 76,977-94,344 events/s
        # ~= 1.23x, so 1.5x separates ambient VM drift from a real
        # pipeline regression). Below the floor the artifact carries
        # an UNEXPLAINED flag that must be adjudicated before the
        # round ships, exactly like a per-query regression.
        import glob as _glob

        trailing = []
        here = os.path.dirname(os.path.abspath(__file__))
        for f in sorted(_glob.glob(os.path.join(here, "BENCH_r*.json"))):
            try:
                with open(f) as fh:
                    parsed = (json.load(fh).get("parsed") or {})
                tp = parsed.get("silver_throughput_events_per_s")
                if tp:
                    trailing.append((f, tp))
            except (OSError, ValueError):
                continue
        trailing = trailing[-3:]
        if trailing:
            best_f, best_tp = max(trailing, key=lambda x: x[1])
            floor = best_tp / 1.5
            out["silver_throughput_floor"] = {
                "floor_events_per_s": round(floor),
                "comparator": "best of trailing 3 driver rounds",
                "best_round_file": os.path.basename(best_f),
                "best_events_per_s": best_tp,
            }
            # Adjudication happens AFTER the end-of-run canary is
            # measured (below), so the floor check can be normalized
            # by machine speed the way the per-query flags are
            # (round 14): the dedicated throughput runs execute at
            # the very END of the bench, exactly where a slow VM
            # phase lands hardest, and an un-normalized floor flags
            # ambient drift as a pipeline regression.
    if errors:
        out["errors"] = errors
    # Close the canary bracket at end-of-bench: two samples bound the
    # machine's speed over the run; the MEAN is the run's calibration
    # figure (a mid-run frequency step shows up as start/end skew in
    # vm_canary_detail, so an adjudication can notice it).
    try:
        canary_end = _vm_canary_s()
    except Exception:  # noqa: BLE001
        canary_end = None
    if canary_start is not None and canary_end is not None:
        out["vm_canary_s"] = round((canary_start + canary_end) / 2, 4)
        out["vm_canary_detail"] = {
            "start": canary_start,
            "end": canary_end,
        }
    # Round-over-round per-query regression bar (round-10 verdict ask
    # #2 — the same discipline the 10x sweep applies to shuffle,
    # applied to time): diff against the PREVIOUS committed
    # BENCH_LOCAL.json before overwriting it, and flag any query
    # slower by BOTH >1.25x AND >+0.3 s. Flags are reported in the
    # artifact and the compact summary so COVERAGE's round-over-round
    # claims are generated from the artifact, never hand-computed.
    # Known methodology deltas can be pre-adjudicated in
    # _REGRESSION_ADJUDICATIONS; everything else prints as
    # UNEXPLAINED and should be attributed (variance? plan flip?
    # corpus edit?) before the round ships.
    local = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BENCH_LOCAL.json")
    regressions = {}
    try:
        with open(local) as fh:
            prev = json.load(fh)
        prev_q = prev.get("queries", {})
        prev_io = prev.get("query_io", {})
        prev_fp = prev.get("query_plan_fp", {})
        prev_fpi = prev.get("query_plan_fp_init", {})
        # Ambient-drift normalization (round-13 verdict ask #7):
        # divide each wall ratio by the machine-speed ratio the pure-
        # CPU canary measured between the two artifacts, so a
        # uniformly slower VM stops tripping per-query flags while a
        # code regression (which moves queries but not the canary)
        # still does. Clamped to [0.5, 2.0]: a canary claiming more
        # than a 2x machine swing is itself suspect (or the workload
        # isn't CPU-shaped), and adjudication should then see the
        # raw ratios rather than trust it.
        canary_ratio = 1.0
        prev_canary = prev.get("vm_canary_s")
        now_canary = out.get("vm_canary_s")
        if prev_canary and now_canary:
            canary_ratio = max(0.5, min(2.0, now_canary / prev_canary))
            out["vm_canary_ratio_vs_prev"] = round(canary_ratio, 3)
        # Throughput-floor adjudication, deferred to here so it can
        # use the end-of-run canary and the previous artifact's plan
        # fingerprints (round 14 — see adjudicate_throughput_floor).
        flo = out.get("silver_throughput_floor")
        tp_now = out.get("silver_throughput_events_per_s")
        if flo and tp_now:
            adjudication, tp_adj = adjudicate_throughput_floor(
                tp_now,
                flo["floor_events_per_s"],
                canary_ratio,
                silver_fpi_same=(
                    prev_fpi.get("silver_pipeline_events") is not None
                    and prev_fpi.get("silver_pipeline_events")
                    == query_fp_init.get("silver_pipeline_events")
                ),
                silver_io_same=(
                    prev_io.get("silver_pipeline_events") is not None
                    and prev_io.get("silver_pipeline_events")
                    == query_io.get("silver_pipeline_events")
                ),
            )
            if canary_ratio != 1.0:
                flo["throughput_canary_adjusted"] = tp_adj
            if adjudication is not None:
                flo["adjudication"] = adjudication
                print(
                    f"  THROUGHPUT FLOOR: {adjudication}",
                    file=sys.stderr,
                )
        for name, t in timings.items():
            p = prev_q.get(name)
            t_adj = t / canary_ratio
            # Flag on the RAW ratio only (regression_flag_fires); the
            # canary stays as ESCALATION evidence: flagged queries are
            # adjudicated at the normalized time, so a slow-VM run
            # still auto-waives and a same-wall query on a faster
            # machine still escalates.
            if regression_flag_fires(p, t):
                pio, nio = prev_io.get(name), query_io.get(name)
                adjudication, fp_moved = adjudicate_regression(
                    name,
                    p,
                    t_adj,
                    pfp=prev_fp.get(name),
                    nfp=query_fp.get(name),
                    pfi=prev_fpi.get(name),
                    nfi=query_fp_init.get(name),
                    io_same=bool(pio and nio and pio == nio),
                )
                regressions[name] = {
                    "prev_s": round(p, 3),
                    "now_s": round(t, 3),
                    "ratio": round(t / p, 2),
                    "adjudication": adjudication,
                }
                if canary_ratio != 1.0:
                    regressions[name]["ratio_canary_adjusted"] = round(
                        t_adj / p, 2
                    )
                if fp_moved is not None:
                    regressions[name]["plan_fp_moved"] = fp_moved
    except (OSError, ValueError):
        pass  # first run / no previous artifact: nothing to diff
    # No previous artifact -> the floor adjudication above never ran;
    # fall back to the raw (un-normalized) check so a below-floor
    # figure is never silently unflagged.
    _flo = out.get("silver_throughput_floor")
    _tp = out.get("silver_throughput_events_per_s")
    if _flo and _tp and "adjudication" not in _flo:
        _adj, _ = adjudicate_throughput_floor(
            _tp, _flo["floor_events_per_s"], 1.0, None, None
        )
        if _adj is not None:
            _flo["adjudication"] = _adj
            print(f"  THROUGHPUT FLOOR: {_adj}", file=sys.stderr)
    if regressions:
        out["regressions_vs_prev"] = regressions
        for name, r in sorted(regressions.items()):
            print(
                f"  REGRESSION {name}: {r['prev_s']}s -> {r['now_s']}s "
                f"({r['ratio']}x) [{r['adjudication']}]",
                file=sys.stderr,
            )
    payload = json.dumps(out)
    # The driver keeps only the TAIL of stdout (~2000 chars) and
    # parses the FINAL line: the full per-query JSON (250+ timings +
    # query_io) blew past that window in rounds 6-7, leaving the round
    # artifact with "parsed": null. Persist the complete JSON next to
    # this script (committed per round), then print a compact summary
    # — same schema, "queries" trimmed to the slowest 5 — as the LAST
    # stdout line so the driver's parse always succeeds.
    with open(local, "w") as fh:
        fh.write(payload + "\n")
    slowest = dict(
        sorted(timings.items(), key=lambda kv: kv[1], reverse=True)[:5]
    )
    compact = {
        "metric": out["metric"],
        "value": out["value"],
        "unit": out["unit"],
        "sf": out["sf"],
        "n_queries": len(timings),
        "queries": slowest,
        "queries_note": "slowest 5 of "
        f"{len(timings)}; full per-query timings + query_io in "
        "BENCH_LOCAL.json",
    }
    if "silver_throughput_events_per_s" in out:
        compact["silver_throughput_events_per_s"] = out[
            "silver_throughput_events_per_s"
        ]
    _floor_adj = out.get("silver_throughput_floor", {}).get("adjudication")
    if _floor_adj:
        if _floor_adj.startswith("UNEXPLAINED"):
            compact["silver_throughput_flag"] = _floor_adj
        else:
            # round-14 verdict fix #3: a WAIVED floor adjudication was
            # invisible in the compact line the driver parses — carry a
            # one-token marker so the external record is self-contained
            # (the full adjudication text stays in BENCH_LOCAL.json).
            compact["floor_waived"] = True
    if errors:
        compact["n_errors"] = len(errors)
    if regressions:
        compact["n_regressions_vs_prev"] = len(regressions)
        compact["regressions_unexplained"] = sorted(
            n for n, r in regressions.items()
            if r["adjudication"].startswith("UNEXPLAINED")
        )[:5]
    print(json.dumps(compact))
    if not timings:
        sys.exit(1)


if __name__ == "__main__":
    main()
