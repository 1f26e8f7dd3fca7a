"""Physical-plan property tests: the scale guarantees the engine's
docstrings claim, asserted against `.explain` output so regressions in
broadcast, pushdown, top-k, or shuffle count fail CI, not a cluster.

Run at sf0.001 — plan shape is scale-free (same Catalyst decisions the
driver's sf and a production cluster would see, modulo AQE runtime
re-planning which only improves on these static plans).
"""

from __future__ import annotations

from big_data_for_smart_houses_spark.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = QUERIES[name](spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def test_dimension_joins_broadcast(spark):
    """J1: 25-row nation / 5-row region must broadcast — a shuffled
    join here would shuffle the full customer table at 100 TB."""
    plan = _plan(spark, "customer_enrichment")
    assert plan.count("BroadcastHashJoin") == 2, plan
    assert "SortMergeJoin" not in plan


def test_pricing_summary_pushdown_and_partial_agg(spark):
    """A1: the shipdate filter must reach the parquet scan (row-group
    skipping) and the aggregation must have a map-side partial pass."""
    plan = _plan(spark, "pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    assert "partial_sum" in plan
    # column pruning: l_comment (the widest column) must not be read
    assert "l_comment" not in plan


def test_topk_plans_take_ordered(spark):
    """O2: newest-100 must plan as a true top-k (TakeOrderedAndProject),
    never a global sort of the full table."""
    plan = _plan(spark, "latest_events_topk")
    assert "TakeOrderedAndProject" in plan


def test_silver_pipeline_single_exchange(spark):
    """The whole silver pipeline (dedup + quality + late flag + two
    rolling windows) must run on ONE shuffle."""
    plan = _plan(spark, "silver_pipeline_events")
    assert plan.count("Exchange") == 1, plan


def test_sessionize_single_exchange(spark):
    """Sessionization: lag window + running sum + session aggregate
    share the key shuffle."""
    plan = _plan(spark, "sessionize_events")
    assert plan.count("Exchange") == 1, plan


def test_scalar_cross_join_is_broadcast(spark):
    """J2: the 1-row global aggregate must broadcast, not shuffle."""
    plan = _plan(spark, "revenue_vs_global")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_whole_stage_codegen_covers_hot_path(spark):
    """The pricing scan+filter+partial-agg must fuse into codegen —
    falling out of codegen (e.g. via a Python UDF) is the 10-100x
    regression the engine is designed to avoid."""
    # AQE hides codegen stages until runtime; inspect the static plan
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = _plan(spark, "pricing_summary")
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    # "*(N)" prefixes mark WholeStageCodegen stages in compact plan form
    assert "*(1)" in plan and "*(2)" in plan, plan
    assert "BatchEvalPython" not in plan and "PythonUDF" not in plan


def test_no_cartesian_anywhere_in_core(spark):
    for name in (
        "pricing_summary",
        "daily_user_rollup",
        "customer_enrichment",
        "supplier_health_scores",
        "orders_business_summary",
    ):
        assert "CartesianProduct" not in _plan(spark, name), name


def test_range_join_is_equi_join(spark):
    """The bucketized range join must plan as a HASH equi-join on
    (key, bucket) with the range as a join condition — never a
    BroadcastNestedLoopJoin/CartesianProduct, which is what a bare
    inequality join degenerates to and what dies at 100 TB."""
    plan = _plan(spark, "events_in_session_range")
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan, plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan, plan


def test_kpi_chain_tiers_all_broadcast(spark):
    """The KPI fallback chain cross-joins four 1-row aggregates — every
    one must broadcast; a shuffled join of 1-row relations would be
    plan noise at best and a full exchange at worst."""
    plan = _plan(spark, "analytics_kpi_chain_gold")
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("BroadcastExchange") >= 3, plan


def test_neardup_lsh_has_no_join(spark):
    """Banded-LSH near-dup mining is explode -> groupBy -> pair expr:
    candidate generation must contain NO join at all (vectors ride
    along to the buckets), and certainly no quadratic join."""
    plan = _plan(spark, "embedding_neardup_pairs")
    assert "Join" not in plan, plan


def test_approx_count_distinct_error_bound(spark):
    """A7 scale variant: HLL++ estimate within the FAMILY-WISE bound
    of the exact distinct count — 5x rsd, not 3x, because the
    assertion runs once per date and a per-group 3-sigma provably
    trips by multiplicity on corpora with thousands of dates whose
    cardinalities leave HLL's exact sparse mode (the round-11
    business_summary_approx_gate finding; same constant)."""
    from big_data_for_smart_houses_spark.queries.core import (
        APPROX_CD_ABS_SLACK,
        APPROX_CD_BOUND_SIGMAS,
        APPROX_CD_RSD,
        q_business_summary_approx,
    )
    from pyspark.sql import functions as F

    approx = {
        r.order_date: r.approx_customers
        for r in q_business_summary_approx(spark, SF_DIR).collect()
    }
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    exact = {
        r.order_date: r.exact_customers
        for r in o.groupBy(F.to_date("o_orderdate").alias("order_date"))
        .agg(F.countDistinct("o_custkey").alias("exact_customers"))
        .collect()
    }
    assert approx.keys() == exact.keys()
    bound_frac = APPROX_CD_BOUND_SIGMAS * APPROX_CD_RSD
    for d, ex in exact.items():
        assert abs(approx[d] - ex) <= max(
            APPROX_CD_ABS_SLACK, bound_frac * ex
        ), (d, approx[d], ex)


def test_contamination_train_side_never_shuffles_for_the_join(spark):
    """Decontamination joins the train shingles against a BROADCAST of
    the (tiny) test shingle set — a SortMergeJoin here would shuffle
    the whole training corpus at 100 TB."""
    plan = _plan(spark, "contamination_check_documents")
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("BroadcastHashJoin") >= 2, plan


def test_stratified_sample_is_scan_only(spark):
    """The deterministic sample is a pure projection + filter: zero
    exchanges of any kind."""
    plan = _plan(spark, "stratified_sample_events")
    assert "Exchange" not in plan, plan


def test_gopher_rules_are_scan_only(spark):
    """Row-local quality rules must not shuffle."""
    plan = _plan(spark, "gopher_quality_documents")
    assert "Exchange" not in plan.replace("Exchange RoundRobinPartitioning", ""), plan


def test_approx_percentile_error_bound(spark):
    """GK-sketch percentile guarantee is on RANK, not value (a sparse
    tail makes value distance meaningless): the returned element's
    empirical quantile must sit within eps of the target."""
    from big_data_for_smart_houses_spark.queries.core import (
        q_value_percentiles_approx,
    )

    approx = {
        r.event_type: r
        for r in q_value_percentiles_approx(spark, SF_DIR).collect()
    }
    vals = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("event_type", "value")
        .toPandas()
    )
    eps = 0.01
    for et, grp in vals.groupby("event_type"):
        v = grp["value"].sort_values().to_numpy()
        for col, q in (("p50", 0.5), ("p90", 0.9), ("p99", 0.99)):
            a = getattr(approx[et], col)
            rank = (v <= a).mean()
            assert q - eps <= rank <= q + eps, (et, col, a, rank)


def test_heavy_hitters_take_ordered_not_global_sort(spark):
    """token_heavy_hitters: the top-K cut must be TakeOrderedAndProject
    (per-partition partial top-K) — a global Sort of the vocabulary
    would single-thread a multi-GB token table at 100 TB."""
    plan = _plan(spark, "token_heavy_hitters")
    assert "TakeOrderedAndProject" in plan, plan


def test_winsorize_and_zscore_broadcast_the_moments(spark):
    """The per-type percentile/moment tables are |types| rows — they
    must ride a BroadcastHashJoin back onto the events scan, never a
    shuffle of the fact side."""
    for name in ["winsorize_events", "zscore_anomaly_events"]:
        plan = _plan(spark, name)
        assert "BroadcastHashJoin" in plan, (name, plan)
        assert "SortMergeJoin" not in plan, (name, plan)


def test_temperature_mix_broadcasts_keep_fractions(spark):
    """temperature_mix: the per-group keep fractions join back by
    broadcast; the corpus side must not shuffle for it."""
    plan = _plan(spark, "temperature_mix_documents")
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_cdc_chunking_no_key_shuffle(spark):
    """cdc_chunk_documents is row-local: the only Exchange allowed is
    the deliberate round-robin `spread()` of the small scan — no
    hash-partitioned shuffle may exist (nothing is keyed)."""
    plan = _plan(spark, "cdc_chunk_documents")
    assert "Exchange hashpartitioning" not in plan, plan


def test_bigram_lm_joins_adapt_and_aggregate_map_side(spark):
    """The model joins are plain equi-joins with nothing forcing a
    broadcast: at gate scale Catalyst broadcasts the tiny model (right
    call), at 100 TB the same plan degrades to a bigram-keyed shuffle
    because stats forbid the broadcast — assert the scale-free
    properties instead: equi-join (the only nested-loop join is the
    1-row vocab cross join) and map-side partial aggregation on the
    model counts."""
    plan = _plan(spark, "bigram_lm_documents")
    assert "partial_count" in plan, plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1, plan
    assert "CartesianProduct" not in plan, plan


def test_shuffle_budgets_of_new_ops(spark):
    """Pin the SCALE.md shuffle budgets: ewma = 1 key exchange,
    two-phase top-K = 2 (salted + merge), sentence dedup = 3 (the
    doc-frequency branch de-dups row-locally via array_distinct — a
    countDistinct would cost a 4th exchange)."""
    budgets = {
        "ewma_events": 1,
        "source_cap_two_phase": 2,
        "sentence_dedup_documents": 3,
        "boilerplate_ngram_documents": 2,
    }
    for name, n in budgets.items():
        plan = _plan(spark, name)
        assert plan.count("Exchange hashpartitioning") == n, (
            name, plan.count("Exchange hashpartitioning"))


def test_stats_gate_shuffle_budgets(spark):
    """Round-4 ops: regression is ONE hash aggregate (all regr_*
    moments partial-agg map-side); unpivot's melt is a row-local
    Expand on top of one agg exchange; the Morton key never shuffles
    (scalar bounds broadcast); gap-fill pays at most its three
    key-partitioned exchanges (span agg, bucket agg, LOCF window)."""
    assert (
        _plan(spark, "regression_drift_events").count(
            "Exchange hashpartitioning"
        )
        == 1
    )
    up = _plan(spark, "unpivot_daily_metrics")
    assert up.count("Exchange hashpartitioning") == 1, up
    assert "Expand" in up, up
    zp = _plan(spark, "zorder_key_events")
    assert zp.count("Exchange hashpartitioning") == 0, zp
    assert "BroadcastExchange" in zp, zp
    gp = _plan(spark, "gapfill_locf_events")
    assert gp.count("Exchange hashpartitioning") <= 3, gp
    assert "CartesianProduct" not in gp, gp


def test_assembly_gate_plan_shapes(spark):
    """weighted WOR sampling must plan as TakeOrderedAndProject (per-
    partition top-K, no global sort); cross-doc CDC dedup pays the
    sentence-dedup budget (doc-fp agg, fp DF agg+join back, per-doc
    agg) and never broadcasts the chunk vocabulary at scale."""
    wp = _plan(spark, "weighted_sample_wor_documents")
    assert "TakeOrderedAndProject" in wp, wp
    assert wp.count("Exchange hashpartitioning") == 0, wp
    cp = _plan(spark, "cdc_crossdoc_documents")
    assert cp.count("Exchange hashpartitioning") <= 4, cp
    assert "CartesianProduct" not in cp, cp
    pp = _plan(spark, "packed_sequence_offsets")
    assert pp.count("Exchange hashpartitioning") == 1, pp


def test_incremental_gate_plan_shapes(spark):
    """MERGE/upsert is one key-partitioned window over the union (no
    join at all); the partial-agg merge re-aggregates only pre-reduced
    rows — every Exchange in the plan carries aggregated partials, and
    the two half-scans each map-side combine before shuffling."""
    mp = _plan(spark, "merge_upsert_orders")
    assert mp.count("Exchange hashpartitioning") == 1, mp
    assert "Join" not in mp, mp
    ip = _plan(spark, "incremental_energy_state")
    assert "HashAggregate" in ip, ip
    assert "CartesianProduct" not in ip, ip


def test_cms_lookup_broadcasts_sketch(spark):
    """The CMS counter table is kilobytes — the lookup join must
    broadcast it; the items side never shuffles for the join."""
    plan = _plan(spark, "cms_token_counts")
    assert "BroadcastHashJoin" in plan, plan


def test_session_window_single_exchange(spark):
    """The built-in session_window aggregation pays one key exchange —
    same budget as the custom sessionize path it parallels."""
    plan = _plan(spark, "session_window_events")
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_time_weighted_avg_single_exchange(spark):
    """The TWA aggregate reuses the lead window's key clustering —
    one exchange total."""
    plan = _plan(spark, "time_weighted_avg_events")
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_timeseries_calculus_plan_shapes(spark):
    """Derivative and ratio-to-report each pay exactly one key
    exchange; the funnel broadcasts the |users|-row click side so the
    purchase scan never shuffles for the join."""
    rp = _plan(spark, "rate_of_change_events")
    assert rp.count("Exchange hashpartitioning") == 1, rp
    sp = _plan(spark, "ratio_to_report_events")
    assert sp.count("Exchange hashpartitioning") == 1, sp
    fp = _plan(spark, "funnel_click_purchase")
    assert "BroadcastHashJoin" in fp, fp
    assert "CartesianProduct" not in fp, fp


def test_hopping_and_grouping_sets_expand_once(spark):
    """Both the hopping-window fan-out and GROUPING SETS are a single
    row-local Expand feeding one aggregate — never one scan per
    window/set."""
    hp = _plan(spark, "hopping_window_events")
    assert hp.count("Expand") == 1, hp
    assert hp.count("Exchange hashpartitioning") == 1, hp
    gp = _plan(spark, "grouping_sets_events")
    assert gp.count("Expand") == 1, gp
    assert gp.count("Exchange hashpartitioning") == 1, gp


def test_session_paths_single_exchange(spark):
    """Path rebuild shares the sessionizer's key exchange: the
    per-session collect runs on the same clustering, one exchange
    total."""
    plan = _plan(spark, "session_paths")
    assert plan.count("Exchange hashpartitioning") <= 2, plan
    assert "CartesianProduct" not in plan, plan


def test_user_keyed_joins_carry_no_broadcast_hint(spark):
    """Funnel and cohort join |users|-row aggregates onto the fact
    scan. A FORCED broadcast hint on a user-keyed table OOMs at 100 TB
    (~10^8-10^9 users); the join strategy must be left to AQE, so the
    optimized logical plan must contain no ResolvedHint — whatever
    physical join Catalyst then picks at this SF is fine."""
    for name in (
        "funnel_click_purchase",
        "cohort_retention_events",
        # round 6: supplier (10k x SF) and part (200k x SF) are
        # data-scaled too — their joins must also be hint-free
        "supplier_health_scores",
        "part_value_density",
        # round 14: the billing joins are user x month keyed — the
        # same rule (round-13 verdict ask #3 de-hinted billing.py)
        "billing_reconciliation_events",
        "billing_unbilled_events",
    ):
        df = QUERIES[name](spark, SF_DIR)
        optimized = (
            df._jdf.queryExecution().optimizedPlan().toString()
        )
        assert "ResolvedHint" not in optimized, (name, optimized)
        assert "hint" not in optimized.lower(), (name, optimized)
        # and the query still executes end-to-end under AQE
        assert df.count() > 0


def test_round5_gate_plan_shapes(spark):
    """map/struct family is row-local (zero exchanges); the SCD2 as-of
    lookup runs on the single-shuffle union form — key exchanges only,
    no pair-explosion join; the approx-percentile gate runs the sketch
    as one aggregate (no per-partition global sort)."""
    plan = _plan(spark, "map_functions_events")
    assert "Exchange" not in plan, plan

    plan = _plan(spark, "scd2_asof_lookup")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

    plan = _plan(spark, "quality_topk_approx_pct")
    assert "percentile_approx" in plan or "approx_percentile" in plan

    # generator + HOF families are row-local: Generate / codegen
    # lambdas, zero exchanges, no Python evaluation
    plan = _plan(spark, "generator_functions_documents")
    assert "Generate" in plan, plan
    assert "Exchange" not in plan, plan
    plan = _plan(spark, "hof_functions_documents")
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan, plan

    # the 8 KB Bloom word-table must broadcast into the probe side
    plan = _plan(spark, "bloom_probe_customers")
    assert "BroadcastHashJoin" in plan, plan


def test_vocab_ops_shuffle_budgets(spark):
    """BPE pair counting: pair extraction is row-local (shifted zip,
    no self-join), so the plan is one count Exchange feeding
    TakeOrderedAndProject — never a global sort. Inverted index: two
    hash Exchanges, (token, doc) pre-count then token, and the per-doc
    pre-count must aggregate partially map-side."""
    bp = _plan(spark, "bpe_pair_counts_documents")
    assert bp.count("Exchange hashpartitioning") == 1, bp
    assert "TakeOrderedAndProject" in bp, bp
    assert "Join" not in bp, bp
    ip = _plan(spark, "inverted_index_documents")
    assert ip.count("Exchange hashpartitioning") == 2, ip
    assert "partial_count" in ip, ip


def test_pagerank_superstep_plan_shape(spark):
    """Each PageRank superstep folds the dangling mass in via a 1-row
    broadcast cross join (the J2 scalar shape) and carries exactly the
    documented exchanges: the src-keyed contribution join+sum and the
    final id-keyed left join — no cartesian product. Asserted on the
    un-checkpointed superstep (the gate query's final plan is a
    checkpoint scan by design)."""
    from pyspark.sql import functions as F

    from big_data_for_smart_houses_spark.extensions.graph import _superstep

    e = spark.createDataFrame(
        [(0, 1, 1.0), (1, 0, 1.0), (0, 2, 1.0)],
        "src long, dst long, frac double",
    )
    nodes = spark.range(3).withColumnRenamed("id", "id")
    sources = e.select("src").distinct()
    ranks = nodes.select("id", F.lit(1.0 / 3).alias("rank"))
    step = _superstep(e, nodes, sources, ranks, 3, 0.85)
    plan = step._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "partial_sum" in plan, plan


def test_bfs_round_plan_shape(spark):
    """One BFS round is the documented superstep: an equi-join of the
    frontier into the edge list plus an id-keyed MIN-fold with a
    map-side partial (partial_min) — never a cartesian product, and
    at most the three keyed exchanges those imply in the static plan
    (both join sides on src, the fold on id; AQE may still demote
    the small frontier side to a broadcast at runtime). Prior rounds
    sit behind a localCheckpoint scan, so a 1-hop call exposes
    exactly one live round."""
    from big_data_for_smart_houses_spark.extensions.graph import (
        bfs_distances,
    )

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (0, 2)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(0,)], "id long")
    out = bfs_distances(edges, seeds, max_hops=1)
    # the result itself is checkpointed; assert on the round plan by
    # rebuilding the un-checkpointed fold the operator runs
    from pyspark.sql import functions as F

    dist = seeds.select("id", F.lit(0).cast("int").alias("dist"))
    cand = (
        edges.join(
            dist.filter(F.col("dist") == 0).withColumnRenamed(
                "id", "src"
            ),
            "src",
        ).select(
            F.col("dst").alias("id"),
            (F.col("dist") + F.lit(1)).cast("int").alias("dist"),
        )
    )
    step = dist.unionByName(cand).groupBy("id").agg(
        F.min("dist").alias("dist")
    )
    plan = step._jdf.queryExecution().executedPlan().toString()
    assert "partial_min" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert plan.count("Exchange hashpartitioning") <= 3, plan
    # and the operator's observable result is right
    got = {r["id"]: r["dist"] for r in out.collect()}
    assert got == {0: 0, 1: 1, 2: 1}


def test_copurchase_reuses_basket_exchange(spark):
    """The market-basket self-join must REUSE the basket-keyed
    shuffle: both join sides are the identical distinct-(basket,item)
    subplan (aliased AFTER the join, not before — renaming item first
    would make the subplans differ and double the shuffle), so the
    final adaptive plan carries a ReusedExchange instead of a second
    physical shuffle of the item list. Asserted on the executed
    plan — AQE only materializes reuse at runtime — plus the usual
    no-cartesian guard."""
    from big_data_for_smart_houses_spark.queries import QUERIES

    df = QUERIES["copurchase_lift_parts"](
        spark, "/root/testdata/sf0.001"
    )
    df.collect()
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode
    plan = df._jdf.queryExecution().explainString(
        jmode.fromString("formatted")
    )
    assert "ReusedExchange" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_tpch_q3_q5_join_strategies(spark):
    """Q3: the filtered customer dimension must broadcast into the
    fact-fact join (one shuffled join on orderkey, TakeOrdered for the
    top-10, never a global sort). Q5: the region→nation→supplier chain
    must reach the spine as broadcasts."""
    q3 = _plan(spark, "tpch_q3_shipping_priority")
    assert "BroadcastHashJoin" in q3, q3
    assert "TakeOrderedAndProject" in q3, q3
    q5 = _plan(spark, "tpch_q5_region_volume")
    assert q5.count("BroadcastHashJoin") >= 3, q5
    assert "CartesianProduct" not in q5, q5


def test_round5_gate_shuffle_budgets(spark):
    """Shuffle budgets of the second-wave gates: the moment and
    navigation families are single-exchange (one keyed agg / one
    keyed window); the KL diagnostic carries at most 4 keyed
    exchanges — two count aggregations, the token-keyed vocab join,
    the final per-group sum — with the corpus total folded in as a
    broadcast scalar, never a fifth exchange."""
    for name, budget in (
        ("stats_moments_lineitem", 1),
        ("navigation_functions_events", 1),
        ("rolling_median_events", 1),
        ("source_kl_documents", 4),
    ):
        p = _plan(spark, name)
        assert p.count("Exchange hashpartitioning") <= budget, (name, p)
        assert "CartesianProduct" not in p, name


def test_round6_gate_plan_shapes(spark):
    """Round-6 surfaces: the VARIANT, try_, XML, and sliding-chunk
    families are pure row-local codegen (zero exchanges, no Python
    evaluation — variant shredding and XML formatting run JVM-side);
    the correlated LATERAL subquery must DECORRELATE into a ranked
    join (WindowGroupLimit + one join), never a per-row subquery or
    cartesian product — the difference between one keyed exchange and
    |customers| subquery executions at 100 TB."""
    for name in (
        "variant_functions_events",
        "try_functions_events",
        "xml_functions_events",
        "sliding_chunks_documents",
    ):
        p = _plan(spark, name)
        assert "Exchange" not in p, (name, p)
        assert "BatchEvalPython" not in p, (name, p)
        assert "ArrowEvalPython" not in p, (name, p)

    p = _plan(spark, "lateral_topk_orders")
    assert "WindowGroupLimit" in p, p
    assert "CartesianProduct" not in p, p
    assert "BroadcastNestedLoopJoin" not in p, p


def test_round6_tpch_shapes(spark):
    """Q19's disjunctive envelope must push into BOTH scans (the
    quantity OR-bounds reach lineitem, the brand/size OR-bounds reach
    part) — the defining property of the query; Q4's EXISTS must plan
    as a semi join (orders never duplicated); Q22's only nested-loop
    join is the broadcast of the 1-row stats aggregate."""
    p = _plan(spark, "tpch_q19_disjunctive")
    li_scan = next(s for s in p.splitlines() if "lineitem.parquet" in s)
    part_scan = next(s for s in p.splitlines() if "part.parquet" in s)
    assert "Or(" in li_scan and "l_quantity" in li_scan, li_scan
    assert "Or(" in part_scan and "p_brand" in part_scan, part_scan

    p = _plan(spark, "tpch_q4_order_priority")
    assert "LeftSemi" in p, p
    assert "CartesianProduct" not in p, p

    p = _plan(spark, "tpch_q22_global_balance")
    assert "CartesianProduct" not in p, p
    assert "LeftAnti" in p, p


def test_round6_analytic_shuffle_budgets(spark):
    """Islands RLE and the bucket checksum are single-exchange (the
    change-point window, the island aggregate, and the checksum
    bucket agg each reuse one keyed clustering); linear gap-fill
    stays within the LOCF family's documented budget; the dynamic
    session window is one keyed exchange like any sessionizer."""
    for name, budget in (
        ("rle_segments_events", 1),
        ("table_checksum_orders", 1),
        ("dynamic_session_window_events", 1),
        ("gapfill_linear_events", 3),
        # three funnel steps, ONE exchange (running-flag windows +
        # conditional agg share the user clustering) — the property
        # that makes the shape k-step-scalable
        ("funnel_three_step_events", 1),
    ):
        p = _plan(spark, name)
        assert p.count("Exchange hashpartitioning") <= budget, (name, p)
        assert "CartesianProduct" not in p, name


def test_tpch_correlated_shapes_decorrelate(spark):
    """Round-7 TPC-H correlated family: Catalyst must rewrite every
    correlated subquery into joins — a surviving per-row subquery
    (SubqueryExec under a filter/project) would execute |rows| times.
    Q17's scalar-AVG threshold becomes a per-partkey aggregate joined
    back (two lineitem scans, no more); Q21's EXISTS / NOT EXISTS pair
    becomes one LeftSemi and one LeftAnti on l_orderkey; Q20's nested
    IN chain + correlated HAVING becomes semi joins + an aggregate
    join; Q2's correlated MIN joins the aggregate back on (partkey,
    acctbal). Nothing plans a CartesianProduct."""
    p = _plan(spark, "tpch_q17_small_qty_revenue")
    assert "Subquery" not in p, p
    assert p.count("lineitem.parquet") == 2, p
    assert "CartesianProduct" not in p, p

    p = _plan(spark, "tpch_q21_waiting_supplier")
    assert "Subquery" not in p, p
    assert "LeftSemi" in p, p
    assert "LeftAnti" in p, p
    assert "CartesianProduct" not in p, p

    p = _plan(spark, "tpch_q20_excess_supply")
    assert "Subquery" not in p, p
    assert "LeftSemi" in p, p
    assert "CartesianProduct" not in p, p

    p = _plan(spark, "tpch_q2_min_acctbal_supplier")
    assert "Subquery" not in p, p
    assert "CartesianProduct" not in p, p


def test_tpch_q6_pushdown_and_q16_antijoin(spark):
    """Q6's four range predicates must ALL reach the lineitem scan
    (the query is a pure pushdown benchmark — at 100 TB row-group
    pruning does the work); Q16's null-free NOT IN must plan as a
    plain anti join, not the null-aware nested loop."""
    p = _plan(spark, "tpch_q6_forecast_revenue")
    scan = next(s for s in p.splitlines() if "lineitem.parquet" in s)
    for frag in ("l_shipdate", "l_discount", "l_quantity"):
        assert frag in scan, (frag, scan)

    p = _plan(spark, "tpch_q16_supplier_counts")
    assert "LeftAnti" in p, p
    assert "BroadcastNestedLoopJoin" not in p, p


def test_round7_extension_gate_plan_shapes(spark):
    """SQL UDFs must INLINE (their whole point vs Python UDFs): the
    scalar body becomes codegen'd expression work and the table body
    a native Generate/explode — zero Python eval nodes. The Python
    UDTF is the opposite contract: a real Python boundary
    (BatchEvalPythonUDTF) fanning out rows. The null-aware NOT IN
    compiles to an anti join (never a per-row subquery), and the
    runtime-bloom gate self-asserts its might_contain injection (it
    RAISES without it — executing it here IS the assertion)."""
    p = _plan(spark, "sql_udf_functions_events")
    assert "Python" not in p, p
    assert "Generate" in p, p

    p = _plan(spark, "udtf_sentences_documents")
    assert "BatchEvalPythonUDTF" in p, p

    p = _plan(spark, "null_aware_notin_orders")
    assert "LeftAnti" in p, p
    assert "CartesianProduct" not in p, p

    QUERIES["runtime_bloom_join_lineitem"](spark, SF_DIR)


def test_round7_function_gate_plan_shapes(spark):
    """The new function-family gates keep their scale contracts:
    url_functions is pure row-local codegen (zero exchanges, zero
    Python); agg_completeness is one partial-aggregated shuffle of 3
    grouping keys; the pipe-syntax front-end compiles to the same
    partial-agg + single-exchange shape as its ANSI twin (pipes are
    syntax, not a different engine); parameterized SQL binds typed
    literals that still PUSH DOWN to the parquet scan."""
    p = _plan(spark, "url_functions_orders")
    assert "Exchange" not in p, p
    assert "Python" not in p, p
    # '*' prefixes mark whole-stage-codegen'd nodes in this format
    assert "*(1) Project" in p, p

    p = _plan(spark, "agg_completeness_lineitem")
    assert p.count("Exchange") == 1, p
    assert "partial_" in p, p

    p = _plan(spark, "pipe_syntax_lineitem")
    assert p.count("Exchange") == 1, p
    assert "partial_" in p, p

    p = _plan(spark, "parameterized_sql_orders")
    assert "PushedFilters" in p and "GreaterThan(o_totalprice" in p, p


def test_cbo_analyze_statistics_flip_join_strategy(spark):
    """Catalog statistics are the 100-TB join-planning lever file
    sizes can't provide: without column stats a filtered dimension's
    size estimate stays the FULL relation size (103 KB here), so at a
    fixed autoBroadcastJoinThreshold the join plans as SortMergeJoin;
    after ANALYZE ... FOR COLUMNS, CBO's range-selectivity estimate
    shrinks the filtered side below the threshold and the same query
    plans a BroadcastHashJoin. Asserts both directions of the flip on
    the same session, then restores confs and drops the tables."""
    import shutil

    prev_cbo = spark.conf.get("spark.sql.cbo.enabled")
    prev_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    for t in ("cbo_stats_o", "cbo_stats_l"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
    try:
        spark.read.parquet(f"{SF_DIR}/orders.parquet").write.mode(
            "overwrite"
        ).saveAsTable("cbo_stats_o")
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet").write.mode(
            "overwrite"
        ).saveAsTable("cbo_stats_l")
        q = """SELECT l.l_orderkey, o.o_totalprice
               FROM cbo_stats_l l
               JOIN cbo_stats_o o ON l.l_orderkey = o.o_orderkey
               WHERE o.o_totalprice > 495000.0"""
        spark.conf.set("spark.sql.cbo.enabled", "true")
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(8 * 1024)
        )
        pre = (
            spark.sql(q)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "SortMergeJoin" in pre, pre
        assert "BroadcastHashJoin" not in pre, pre
        spark.sql(
            "ANALYZE TABLE cbo_stats_o COMPUTE STATISTICS"
            " FOR COLUMNS o_totalprice, o_orderkey"
        )
        spark.sql("ANALYZE TABLE cbo_stats_l COMPUTE STATISTICS")
        post = (
            spark.sql(q)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in post, post
    finally:
        spark.conf.set("spark.sql.cbo.enabled", prev_cbo)
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", prev_thr
        )
        for t in ("cbo_stats_o", "cbo_stats_l"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_kmeans_assignment_broadcasts_centroids(spark):
    """kmeans_lloyd's assignment must broadcast the k-row centroid
    side (BroadcastNestedLoopJoin over the cross join) — a shuffled
    cross join would move the corpus once PER ITERATION at 100 TB —
    and the argmin fold must carry a map-side partial_min."""
    from pyspark.sql import functions as F

    from big_data_for_smart_houses_spark.functions.numeric import (
        gate_quantize,
    )

    pts = spark.createDataFrame(
        [(i, [float(i), 0.0]) for i in range(20)],
        "pid long, x array<double>",
    )
    cent = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [9.0, 0.0])],
        "cid int, c array<double>",
    )
    d2 = gate_quantize(
        F.aggregate(
            F.zip_with(
                F.col("x"), F.col("c"), lambda a, b: (a - b) * (a - b)
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    step = (
        pts.crossJoin(F.broadcast(cent))
        .select(
            "pid",
            F.struct(d2.alias("d2"), F.col("cid"), F.col("x")).alias(
                "s"
            ),
        )
        .groupBy("pid")
        .agg(F.min("s").alias("s"))
    )
    plan = step._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "partial_min" in plan, plan


def test_sssp_round_plan_shape(spark):
    """One Bellman-Ford round = the BFS superstep with a weight ride:
    frontier equi-join into edges plus an id-keyed min(struct) fold
    with a map-side partial — no cartesian product."""
    from pyspark.sql import functions as F

    edges = spark.createDataFrame(
        [(0, 1, 2), (1, 2, 1), (0, 2, 9)], "src long, dst long, w long"
    )
    dist = spark.createDataFrame(
        [(0, 0, 0)], "id long, dist long, rnd int"
    )
    cand = edges.join(
        dist.filter(F.col("rnd") == 0).withColumnRenamed("id", "src"),
        "src",
    ).select(
        F.col("dst").alias("id"),
        (F.col("dist") + F.col("w")).alias("dist"),
        F.lit(1).cast("int").alias("rnd"),
    )
    step = (
        dist.unionByName(cand)
        .groupBy("id")
        .agg(F.min(F.struct("dist", "rnd")).alias("s"))
    )
    plan = step._jdf.queryExecution().executedPlan().toString()
    assert "partial_min" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_global_scan_no_data_sized_single_partition(spark):
    """The distributed prefix scan's whole point: the data path is
    range-partitioned + hash-by-pid windowed, and the ONLY
    SinglePartition exchange feeds on the per-partition totals
    aggregate (<= num_partitions rows), never the raw data. The naive
    `row_number() OVER (ORDER BY ...)` formulation this replaces
    funnels every row through one reducer."""
    from pyspark.sql import functions as F
    from pyspark.sql import Window

    from big_data_for_smart_houses_spark.operators.scan import (
        global_row_number,
    )
    from big_data_for_smart_houses_spark.sources.parquet import load_table

    o = load_table(spark, SF_DIR, "orders")
    plan = (
        global_row_number(o, ["o_orderdate", "o_orderkey"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange SinglePartition") == 1, plan
    assert "Exchange rangepartitioning" in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    # the single-partition stage consumes the pid-keyed aggregate, not
    # the data: its immediate child (next plan line) is HashAggregate
    lines = plan.splitlines()
    idx = next(
        i for i, ln in enumerate(lines) if "Exchange SinglePartition" in ln
    )
    assert "HashAggregate" in lines[idx + 1], plan

    # contrast: the naive global window IS the single-reducer plan
    naive = (
        o.withColumn(
            "rn",
            F.row_number().over(
                Window.orderBy("o_orderdate", "o_orderkey")
            ),
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    nlines = naive.splitlines()
    nidx = next(
        i for i, ln in enumerate(nlines) if "Exchange SinglePartition" in ln
    )
    assert "HashAggregate" not in nlines[nidx + 1], naive


def test_tpch_q17_broadcast_to_shuffle_phase_transition(spark):
    """Pin the q17 join phase transition the 10x sweep adjudicated
    (SCALE.md round-8): at gate SF the decorrelated per-partkey AVG
    side sits far below the broadcast threshold and the join-back is
    a BroadcastHashJoin; once the side outgrows the threshold the
    SAME query must plan the keyed exchange its docstring promises at
    100 TB. The big side is emulated by disabling the static AND
    adaptive broadcast thresholds (the size-relative condition, in
    milliseconds, instead of materializing 10x data): the final
    adaptive plan must carry SortMergeJoin/ShuffledHashJoin and ZERO
    BroadcastHashJoins — a future broadcast() hint in the query or an
    AQE conf change that forces broadcast regardless of size fails
    one direction or the other."""
    p = _plan(spark, "tpch_q17_small_qty_revenue")
    assert "BroadcastHashJoin" in p, p

    prev_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_aqe_thr = spark.conf.get(
        "spark.sql.adaptive.autoBroadcastJoinThreshold", None
    )
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.autoBroadcastJoinThreshold", "-1"
        )
        df = QUERIES["tpch_q17_small_qty_revenue"](spark, SF_DIR)
        df.collect()
        jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode
        plan = df._jdf.queryExecution().explainString(
            jmode.fromString("formatted")
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thr)
        if prev_aqe_thr is not None:
            spark.conf.set(
                "spark.sql.adaptive.autoBroadcastJoinThreshold",
                prev_aqe_thr,
            )
        else:
            spark.conf.unset(
                "spark.sql.adaptive.autoBroadcastJoinThreshold"
            )
    assert "BroadcastHashJoin" not in plan, plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_hdr_sketch_shuffle_budget(spark):
    """The HDR quantile gate's plan (round 10): each half-build is a
    map-side-combined count aggregate (partial_count below the
    exchange), the merge + quantile windows + probe agg all ride ONE
    further counter-row exchange — 3 hash exchanges total, every one
    of them moving (group, bucket, cnt) counters, never raw values.
    A 4th exchange would mean the merge or the probe agg lost the
    event_type partitioning; losing partial_count would mean the
    build ships rows instead of counters."""
    plan = _plan(spark, "hdr_quantile_sketch_events")
    assert plan.count("Exchange hashpartitioning") == 3, plan.count(
        "Exchange hashpartitioning"
    )
    assert "partial_count" in plan, plan


def test_plan_fingerprint_stable_and_plan_sensitive(spark):
    """bench._plan_fingerprinter (round-11 verdict ask #2): the
    canonicalized executed-plan hash must be (a) STABLE across
    repeated runs of the same query in one session — expression ids,
    lambda counters, RDD ids, UUIDs, paths and callsites are all
    stripped — and (b) SENSITIVE to a genuine plan change (the
    q21-class broadcast-threshold flip is exactly a different final
    adaptive plan). (a) false-positive plan flips would erode the
    regression bar into noise; (b) false negatives would silently
    waive real flips as variance."""
    import bench
    from big_data_for_smart_houses_spark.queries import QUERIES

    poll = bench._plan_fingerprinter(spark)
    last, _, _ = poll(-1)
    sf = "/root/testdata/sf0.001"

    # (a) stability, on a query with NO known plan bistability —
    # q21 would be wrong here: its broadcast-threshold boundary is
    # exactly the documented bistable case and can flip between two
    # back-to-back runs when neighbouring tests have churned
    # stats/conf (observed in-suite)
    stable_fn = QUERIES["gold_daily_energy_events"]
    fps, fpis = [], []
    for _ in range(2):
        stable_fn(spark, sf).write.mode("overwrite").format(
            "noop"
        ).save()
        last, fp, fpi = poll(last)
        fps.append(fp)
        fpis.append(fpi)
    assert fps[0] is not None and fps[0] == fps[1], fps
    assert fpis[0] is not None and fpis[0] == fpis[1], fpis

    # (b) sensitivity: forcing the broadcast threshold on the
    # q21-class join changes static planning — BOTH hashes must move
    # (the initial hash is the one that escalates to UNEXPLAINED
    # unconditionally). Pin the threshold for the reference run too,
    # so the bistability can't race the comparison.
    fn = QUERIES["tpch_q21_waiting_supplier"]
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", "10485760"
        )
        fn(spark, sf).write.mode("overwrite").format("noop").save()
        last, fp_b, fpi_b = poll(last)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        fn(spark, sf).write.mode("overwrite").format("noop").save()
        last, fp_nb, fpi_nb = poll(last)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert fp_nb is not None and fp_nb != fp_b, (fp_nb, fp_b)
    assert fpi_nb is not None and fpi_nb != fpi_b, (fpi_nb, fpi_b)


def test_synthetic_stream_static_fingerprint_is_run_stable(spark):
    """round-13 verdict ask #2 done-condition: the synthetic-stream
    gate's STATIC plan fingerprint must be identical across two fresh
    gate executions (it was run-varying through r13 because the
    sink-poll count() queries added a timing-dependent number of SQL
    executions; the gate now watches q.recentProgress driver-side).
    Uses bench's own fingerprinter + execution pattern so the value
    asserted here is the value the regression adjudicator sees."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    import bench

    poll = bench._plan_fingerprinter(spark)
    os.environ["SPARK_GRAFT_NO_STREAM_MEMO"] = "1"
    try:
        fpis = []
        for _ in range(2):
            last, _, _ = poll(-1)
            df = QUERIES["synthetic_stream_availablenow"](spark, SF_DIR)
            df.write.mode("overwrite").format("noop").save()
            _, _, fpi = poll(last)
            fpis.append(fpi)
    finally:
        os.environ.pop("SPARK_GRAFT_NO_STREAM_MEMO", None)
    assert fpis[0] is not None
    assert fpis[0] == fpis[1], fpis
    # ...and the value matches the waiver's pin, so the one-round
    # transition entry and this test can never drift apart silently
    pin = bench._REGRESSION_ADJUDICATIONS[
        "synthetic_stream_availablenow"
    ]["pinned_fp_init"]
    assert fpis[0] in pin, (fpis[0], pin)


def test_localcheckpoint_sites_documented():
    """Round-15 verdict ask #8: every module carrying a
    localCheckpoint lineage cut must be named in SCALE.md's
    fault-tolerance section (local checkpoints are unreplicated and
    not recomputable — the cluster-mode variant documented there is a
    per-job decision). A new site in an undocumented module fails
    here rather than shipping silently."""
    import glob
    import os
    import re

    root = os.path.join(os.path.dirname(__file__), "..")
    scale = open(os.path.join(root, "SCALE.md")).read()
    section = scale.split(
        "fault tolerance of the localCheckpoint pattern", 1
    )
    assert len(section) == 2, "SCALE.md fault-tolerance section missing"
    doc = section[1]
    pkg = os.path.join(root, "big_data_for_smart_houses_spark")
    sites = set()
    for path in glob.glob(os.path.join(pkg, "**", "*.py"), recursive=True):
        if re.search(r"\.localCheckpoint\(", open(path).read()):
            sites.add(os.path.basename(path))
    assert sites, "no localCheckpoint sites found at all?"
    undocumented = {s for s in sites if s not in doc}
    assert not undocumented, (
        f"localCheckpoint site(s) in {sorted(undocumented)} not named "
        "in SCALE.md's fault-tolerance section"
    )
