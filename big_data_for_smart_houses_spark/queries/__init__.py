"""Driver-facing query registry.

Each query is a named (Spark callable, DuckDB oracle SQL) pair running
the engine's operators (SURVEY.md §2) against the driver testdata
tables (TESTDATA.md). Queries without an oracle are genuinely
non-SQL-expressible (hash-seeded sketches) and get rows-only checks.

ORDER MATTERS: the external driver certifies the first 50 entries by
insertion order. Round 7's `_CERTIFICATION_FRONT`:

1. The 28 round-6 gates that landed after that round's front filled
   (never driver-certified; queued by the round-6 verdict, all pass
   the local `SPARK_GRAFT_EXACT=1` sf0.01 exact mirror): bucketed
   join, recursive CTE, listagg, streaming outer-join /
   pystate-restart / observe / torture / synthetic-source gates,
   dynamic session window, logreg planted recovery, int8
   quantization, ORC/CSV round-trips, expectations, linear gap-fill,
   table checksum, mergeSchema, RLE islands, referential check,
   null-safe join, BMP/WAV/AVI codecs, 3-step funnel, argmax family
   (round-7 collision-free keys), dynamic partition pruning, pandas
   UDAF, bitmap distinct (round-7 cross-bucket fix).
2. The 18 new round-7 gates: the TPC-H completion (Q2, Q6, Q8, Q9,
   Q11, Q12, Q13, Q15, Q16, and the correlated-decorrelation trio
   Q17/Q20/Q21 — all 22 TPC-H shapes now gated), the
   ntile/cume_dist/percent_rank + frame-exclusion window gate,
   `as_of_version` time travel, the Python UDTF surface, runtime
   bloom-filter join pruning (RAISES without the injected
   might_contain), SQL UDFs (scalar + lateral table function), and
   the null-aware NOT IN three-valued-logic gate.
3. The two queries round 7 edited (xml_functions_events — now a
   deterministic 1-in-23 slice; compaction_roundtrip_events —
   compact_files returns the actual file count), plus the two
   highest-signal late-round-7 streaming-execution gates
   (statestore_read_availablenow — Spark 4 State Data Source
   read-back of agg buffers; stream_upsert_availablenow —
   foreachBatch CDC apply via merge_upsert with versioned snapshot
   swap).

ROUND-8 ROTATION QUEUE (late-round-7 gates that did not fit the
50-slot window; all pass the sf0.01 exact mirror):
agg_completeness_lineitem, url_functions_orders,
transpose_summary_lineitem, pipe_syntax_lineitem,
parameterized_sql_orders, sugar_syntax_orders,
mapinarrow_tokens_documents, datetime_functions_events,
array_sort_hof_documents, kmv_distinct_events (bottom-k sketch,
hash-exact state), join_types_orders (full-outer/semi/anti
accounting), stream_chained_availablenow (two chained
stateful operators in one query), statestore_join_availablenow (joinSide
state read-back), stream_upsert_restart_availablenow (crash
AFTER the merge write, BEFORE the offset commit — idempotent
re-apply), tpch_q1_pricing_summary (registry alias of the
long-certified pricing_summary), bfs_distances_transitions
(multi-source BFS superstep loop, integer-exact vs an unrolled-CTE
oracle), kmv_merge_events (KMV shard-state merge ≡ direct sketch —
the mergeability property that matters at scale), and
vacuum_retention_orders (expire_versions fold + as_of over the
survivors ≡ the un-vacuumed final state),
stream_multiwatermark_availablenow (two source streams with
different watermark delays unioned — the min-watermark policy's
emission closure, hash-exact), and triangle_count_transitions
(degree-oriented O(E^1.5) triangle counting, exact integers vs a
full SQL replay of the orient→wedge→close pipeline), and
stream_timeout_sessions_availablenow (GroupStateTimeout.
EventTimeTimeout executed: sessions closed by gap AND by
watermark-fired timeout, strict-> boundary pinned by test), and
copurchase_lift_parts (market-basket support/confidence/lift over
order baskets — the Apriori pair pass, single-division-exact),
agg_pushdown_events (parquet AGGREGATE pushdown: COUNT/MIN/MAX
answered from row-group statistics under the DSv2 reader — RAISES
without the full PushedAggregation list), and
stream_sliding_availablenow (overlapping 2 h/1 h sliding windows
as a stream — every event in two window states, append closure on
window sets that share rows), and
stream_interval_enrich_availablenow (stream-static join on a RANGE
condition — the stateless SCD2-lookup shape against a live stream,
vs stream_enrich's equi-key broadcast),
approx_topk_events (Spark 4.1 approx_top_k pinned in its exactness
regime: k and tracked-item budget above the distinct count), and
identifier_clause_orders (IDENTIFIER name binding for tables and
columns ≡ the static SQL), and kmv_jaccard_events (bottom-k
Jaccard estimator — cohort overlap from sketch states, estimate
and exact target both hash-exact), and
stream_update_mode_availablenow (UPDATE output mode: changed-group
emission without the append closure — the open final hour emits,
vs the tumbling gate that must withhold it), and
xml_roundtrip_events (the native Spark 4 XML FILE source/sink —
text round-trip bit-exact incl. doubles and entity-escaped JSON
strings, next to the ORC/CSV round-trips), and
json_roundtrip_events (JSON-lines sink/source — µs timestamps
survive only under an explicit 6-digit timestampFormat; the
default truncates to millis, pinned here), and
binaryfile_bmp_assets (the `binaryFile` opaque-blob source: id
recovered from the file path, source `length` column checked
against the closed-form BMP size, content decoded through the
real stdlib codec), and sssp_weighted_transitions (Bellman-Ford
frontier supersteps over integer weights — gate exact at a FIXED
round count via the ≤k-edges invariant, no convergence
assumption), and map_hof_functions_events (str_to_map /
transform_keys / map_zip_with — the remaining MAP expression
surface, closed-form oracle), and kmeans_embeddings (fully
distributed Lloyd k-means: broadcast-join supersteps, no
driver-side sample — float32-quantized argmin/means make the
iterative float algorithm hash-exact vs 3 unrolled SQL rounds),
and dynamic_partition_overwrite_events (INSERT OVERWRITE under
partitionOverwriteMode=dynamic: a one-partition patch replaces
exactly that partition; conf restored in finally), and
cogroup_asof_events (cogrouped applyInPandas — per-user pandas
merge_asof value-checked against the SQL as-of LEFT JOIN +
composite arg_max, incl. the empty-side NULL contract), and
stream_fullouter_join_availablenow (FULL OUTER stream-stream
interval join — the right side's finality rule: null-padded
clicks emit only once the watermark passes click_ts + lookback,
strictly; completes the inner/left/full join-mode matrix), and
session_variables_orders (DECLARE / SET VARIABLE + EXECUTE
IMMEDIATE INTO ... USING — dynamic SQL without string splicing,
integer threshold so no float crosses the binding), and
sql_scripting_orders (BEGIN/WHILE procedural block folding five
data-dependent aggregates through a loop-carried accumulator ≡
the unrolled Σ nᵦ·2⁴⁻ᵇ closed form, bit-exact), and
polymorphic_udtf_events (the OTHER UDTF half: analyze()-derived
output schema from the input table's schema + TABLE argument with
PARTITION BY/ORDER BY — ordered partition folds, terminate() per
partition), and theta_sketch_events (DataSketches THETA family —
the set-ALGEBRA sketch: intersection/difference cohort overlap
HLL can't answer, pinned in the exact regime incl. shard-merge ≡
direct), and explode_outer_events (posexplode_outer's empty-array
row preservation — the vanishing-document bug, both halves
pinned), and llm_corpus_pipeline_documents (the COMPOSITION gate:
quality → exact dedup → decontam → per-source cap → split, end to
end through the same library functions the stage gates certify,
whole chain replayed as five SQL CTEs — proves the stages
compose, not just that each works), and file_metadata_events (the
hidden `_metadata` lineage struct: one-file-per-partition layout,
dense 0-based row_index proved by the triangular-number closed
form; environment-dependent values carried as invariants), and
bpe_train_documents (the FULL iterative BPE training loop —
3 frequency-weighted merge rules learned over the distinct-word
table, winning pair a 1-row broadcast per round, greedy
left-to-right fold application; every word's final segmentation
hash-exact vs a 3-round unrolled gaps-and-islands SQL replay),
and rollup_navigate_events (aggregate NAVIGATION: the daily rollup
answered FROM the materialized hourly partial-aggregate table —
sum/count/min/max monoids re-aggregated up the time hierarchy and
avg re-derived at the coarse grain — while the oracle computes
daily DIRECT from raw events; integer-cents measures make the
identity associative-exact, so the green row is the
materialized-view-rewrite correctness statement itself), and
ppjoin_pairs_documents (prefix-filtered exact set-similarity join —
All-Pairs/PPJoin candidate generation touching only each set's
(1-t)-fraction prefix under a global document-frequency token
order, length-filter banded, verified by exact array_intersect;
the oracle replays the EXHAUSTIVE shared-shingle join at the same
threshold, so the green row proves filter completeness), and
global_rownum_orders + concurrency_sweepline_events (the
distributed global prefix scan, operators/scan.py — two-level
Blelloch scan: range partition → local window → ≤num_partitions-row
offsets table broadcast back; the oracles are the single-reducer
`row_number() OVER (ORDER BY ...)` / `SUM(delta) OVER (ORDER BY
...)` formulations, so the green rows state the scalable plan
computes exactly what the unscalable one computes; plan test pins
zero data-sized SinglePartition exchanges), and skyline_parts (the
2-D skyline / Pareto-frontier operator, Börzsönyi ICDE'01 —
engine runs the sort-based strict running-max formulation through
the same distributed scan, two balanced shuffles and no self-join;
the oracle is the quadratic NOT EXISTS dominance DEFINITION, a
different algorithm, so the green row certifies semantics), and
stream_semi_join_availablenow (LEFT SEMI stream-stream interval
join — the streaming EXISTS: emits each matched left row exactly
once, left columns only, no finality wait, completing the
inner/left-outer/full-outer/semi join-mode matrix), and the
distributed order-statistics trio on the scan
(weighted_quantiles_orders — exact weighted lower-quantiles, one
scan serves every q via integer cross-multiplied threshold
crossings; gini_customer_orders — Gini of orders-per-customer,
Σi·x and Σx integer to the end, two final IEEE divisions;
ks_statistic_events — two-sample Kolmogorov-Smirnov distance
click-vs-purchase, CDFs at distinct values only, sup as an
integer argmax of |cA·nB−cB·nA|; each oracle is the
single-reducer running-total window the operator replaces), and
percentile_within_group_events (the ANSI ordered-set aggregates
percentile_cont/percentile_disc WITHIN GROUP — disc is raw value
selection, cont rides the float32 quantize bridge) and
bitwise_aggs_events (bit_and/bit_or/bit_xor aggregate folding,
integer-exact by algebra), and csv_malformed_modes_events (the
CSV PERMISSIVE/DROPMALFORMED/FAILFAST parser-mode matrix over a
deterministically corrupted serialization — integer-only
accounting; the gate pins the two production traps: CSV column
pruning silently defeats malformed detection in every mode, and
the corrupt-record column may only be queried off a cached parse,
per Spark's own contract), and asof_nearest_events (nearest-mode
as-of join — pandas merge_asof(direction='nearest') semantics:
closest right row either side, ties backward, single-shuffle
two-window union form vs the min-over-all-pairs DEFINITION
oracle), and trailing_active_users_events (exact DAU/7-day-WAU
per day — COUNT(DISTINCT) OVER is illegal SQL; the bounded
fan-out replicates deduplicated (day,user) pairs to their window
anchors, shuffle ~ W×|active pairs| independent of raw volume,
vs the day-range-join definition oracle), and mad_outliers_events
(robust MAD outlier detection with the 1.4826 consistency constant
— both medians percentile_disc, pure value selection, hash-exact
with no quantizing; the robust sibling of the z-score gate), and
ntile_scan_orders (distributed NTILE — equi-depth bucketing of the
whole table from the scan's dense rank with NTILE's exact integer
contract, integer `div` throughout; the oracle IS the
single-reducer NTILE() OVER window), and skyline3d_parts (the
d>2 skyline scale path — per-partition numpy local skylines via
mapInPandas then one bounded merge pass, hard raise past the
frontier cap instead of silent truncation; 3-D NOT EXISTS oracle).

After this window certifies, EVERY oracle-backed query in the
registry will have had a green driver row at least once. The
remaining rows-only entries are the 4 structural sketches
(minhash/simhash/ann_lsh/ann_ivf), each carrying a hash-gated recall
companion; round 7 retired the two orphan rows-only queries
(business_summary_approx, value_percentiles_approx) from the
registry per the round-6 verdict — their library functions remain,
with the hash signal carried by business_summary_approx_gate /
quality_topk_approx_pct.
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
    # --- the 28 round-6 gates queued by the round-6 verdict (never
    #     driver-certified; all pass the sf0.01 exact mirror) ---
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
    # --- new round-7 gates: TPC-H completion (all 22 shapes now
    #     gated), window completeness, time travel ---
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
    "window_completeness_events",
    "time_travel_orders",
    "udtf_sentences_documents",
    "runtime_bloom_join_lineitem",
    "sql_udf_functions_events",
    "null_aware_notin_orders",
    # --- the two queries round 7 edited (need re-certification on
    #     their new behavior) ---
    "xml_functions_events",
    "compaction_roundtrip_events",
    # --- the two highest-signal late-round-7 gates (streaming
    #     EXECUTION paths: state-store read-back, foreachBatch CDC
    #     upsert); the remaining 15 late-round-7 entries are queued
    #     for the round-8 rotation (exact list in the module
    #     docstring's ROUND-8 ROTATION QUEUE) ---
    "statestore_read_availablenow",
    "stream_upsert_availablenow",
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
