"""Driver-facing query registry.

Each query is a named (Spark callable, DuckDB oracle SQL) pair running
the engine's operators (SURVEY.md §2) against the driver testdata
tables (TESTDATA.md). Queries without an oracle are genuinely
non-SQL-expressible (hash-seeded sketches) and get rows-only checks.

ORDER MATTERS: the external driver certifies the first 50 entries by
insertion order.

ROUND-10 ROTATION POLICY (verdict ask #1): the front is COMPUTED by
``certification.next_front`` from per-query provenance, not curated —

1. every gate whose code or corpus this round TOUCHED (the
   ``_TOUCHED_R10`` list below is the one per-round human input);
2. every never-certified query (new gates this round) — detected
   mechanically as names absent from ``certification.LAST_CERTIFIED``;
3. remaining slots fill oldest-green-first, so the r3/r4 rows that
   predate five rounds of refactors rotate forward mechanically.

``certification.LAST_CERTIFIED`` records, for every registered query,
the most recent round with a green driver row in
``CORRECTNESS_r{N}.json``; a registry test re-derives it from the
artifacts so the static map can never drift. The remaining rows-only
entries are the 4 structural sketches (minhash/simhash/ann_lsh/
ann_ivf), each carrying a hash-gated recall companion that IS
driver-certified.

END-OF-ROUND-10 STATE: registry 314 queries / 310 oracles; the front
= 36 touched (arrow-staging users, timeout-gate projection, edit-1
over-cap guard, narrowed sink poll, fused bpe_apply; the three
watermark-emission gates — outer/full-outer joins and session
windows — whose oracles now model the MEASURED finality bounds
(ms-floored watermark, -1 ms join-state conservatism, non-strict
aggregate <=); and the 19 gates running through the late-round
operator review fixes — sampling envelope guard + round() buckets,
shared packer core, scan NULL-prefix exactness, EWMA late-row
cursor, LOCF gap cap) + 5 new (hdr_quantile_sketch_events,
hdr_quantile_error_bound_events, hdr_sketch_stream_availablenow,
stream_left_anti_availablenow, bpe_rankmap_documents) + 9
oldest-green refreshes (r3 rows). Rotation takes the hit this round
by design: a re-certification of edited code outranks a refresh of
untouched code.
ROUND-11 PROCEDURE: (1) regenerate LAST_CERTIFIED from the new
CORRECTNESS_r10.json (``python -m ...queries.certification``, paste,
test re-derives); (2) replace _TOUCHED_R10 with the round-11 touched
list; next_front() does the rest — the 25 r3 rows this front could
not seat (tests/test_registry.py recomputes the exact set; the name-
ordered head is embedding_ann_lsh, embedding_cosine_topk,
ewma_events, gopher_quality_documents, language_guess, ...) rotate
in first, then the r4 block.
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

# Round-10 rotation (verdict ask #1): the front is COMPUTED, not
# curated — touched gates first, then never-certified new gates, then
# oldest-green-first from certification.LAST_CERTIFIED. The touched
# list is the one per-round input a human supplies: every gate whose
# code or corpus this round edited.
_TOUCHED_R10 = [
    # closed_by dropped from the hash projection + oracle (advice:
    # the label is emission-time metadata, not split-invariant)
    "stream_timeout_sessions_availablenow",
    # _arrow_events now normalizes timestamps to us/UTC before
    # staging — every gate staging through it re-certifies
    "statestore_timeout_rearm_availablenow",
    "stream_device_sessions_availablenow",
    "rocksdb_pysessions_availablenow",
    "statestore_sessions_availablenow",
    "locf_stream_availablenow",
    "ewma_stream_availablenow",
    "stream_dedup_availablenow",
    "stream_multiwatermark_availablenow",
    "stream_restart_pystate_availablenow",
    "stream_torture_availablenow",
    # deletion_neighborhood_pairs gained the in-plan over-cap guard
    # (default on_overcap='error') — the gate runs through it
    "edit1_neighborhood_customer",
    # review fix: the stream-join oracles now model the engine's
    # measured finality bound (ms-floored watermark minus the 1 ms
    # state-watermark conservatism) instead of the raw
    # min(max)-delay — robust to sub-ms corpora; re-certify both
    "stream_outer_join_availablenow",
    "stream_fullouter_join_availablenow",
    # same class: the session-window oracle now models the ms-floored
    # watermark against the µs-precision session ends (aggregates:
    # non-strict <=, no -1 ms — measured and boundary-tested)
    "session_stream_availablenow",
    # sink-poll except narrowed to AnalysisException
    "synthetic_stream_availablenow",
    # bpe_apply_tokens now fuses 4 folds per projection (round-10
    # cost-envelope work) — same semantics, re-certify the gate
    "bpe_apply_documents",
    # late-round review fixes (all re-mirrored bit-exact before
    # shipping): every gate running through the edited operators —
    # sampling's _salted_bucket now computes on residues (overflow-
    # free at any id, bit-identical in the old envelope) and
    # weighted_mix/stratified_sample switched int() -> round() on
    # fraction buckets (weighted_corpus_mix VALUES change: 0.7 now
    # keeps 700 buckets, not int(699.999...)=699; oracle updated
    # identically); the packers share one core; scan's running sum
    # gained exact SQL NULL-prefix semantics + a non-numeric
    # shuffle-partitions fallback; the EWMA cursor now drops
    # cross-batch late rows; LOCF gained a gap cap
    "weighted_corpus_mix",
    "stratified_sample_events",
    "dataset_split_documents",
    "corpus_shuffle_documents",
    "hash_sample_per_lang",
    "contrastive_triplets_documents",
    "token_batch_packing",
    "packed_sequence_offsets",
    "inverted_index_documents",
    "llm_corpus_pipeline_documents",
    "global_rownum_orders",
    "ntile_scan_orders",
    "concurrency_sweepline_events",
    "skyline_parts",
    "skyline3d_parts",
    "gini_customer_orders",
    "weighted_quantiles_orders",
    "ks_statistic_events",
    "stream_rocksdb_availablenow",
]

# round-agnostic alias: tests and tooling read this name, so next
# round only renames the list above
_TOUCHED_THIS_ROUND = _TOUCHED_R10

from .certification import next_front as _next_front  # noqa: E402

_CERTIFICATION_FRONT = _next_front(
    _ALL_QUERIES, _TOUCHED_THIS_ROUND, size=50
)

assert len(_CERTIFICATION_FRONT) == 50, len(_CERTIFICATION_FRONT)
assert len(set(_CERTIFICATION_FRONT)) == 50
_missing = [n for n in _CERTIFICATION_FRONT if n not in _ALL_QUERIES]
assert not _missing, _missing

QUERIES = {n: _ALL_QUERIES[n] for n in _CERTIFICATION_FRONT}
for _n, _fn in _ALL_QUERIES.items():
    if _n not in QUERIES:
        QUERIES[_n] = _fn

__all__ = ["QUERIES", "ORACLES"]
