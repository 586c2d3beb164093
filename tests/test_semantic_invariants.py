"""First-principles invariants for round-5 operators.

The DuckDB oracle proves cross-engine agreement, but where the oracle
MIRRORS the Spark dataflow a shared misunderstanding would pass both
engines. These tests assert properties derived independently of either
implementation — conservation laws, bounds, and partition axioms."""

from __future__ import annotations

from pyspark.sql import functions as F

from event_stream_aggr_spark.plans.registry import load_all
from event_stream_aggr_spark.tables import load_table


def test_q75_attribution_conserves_purchase_credit(spark, sf_dir):
    # every credited purchase hands out n * round(1e6/n) ppm in total —
    # within n/2 ppm of exactly one unit of credit. Totals over the
    # click side must equal totals over the purchase side.
    from event_stream_aggr_spark.plans.relational import CEP_WINDOW_S

    clicks = load_all()["q75_attribution"].fn(spark, sf_dir)
    total_click_ppm = clicks.agg(F.sum("credit_ppm")).collect()[0][0]

    e = load_table(spark, sf_dir, "events")
    tsm = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    ev = e.select("user_id", "event_type", tsm.alias("tsm"))
    from pyspark.sql import Window as W

    back = (
        W.partitionBy("user_id")
        .orderBy("tsm")
        .rangeBetween(-CEP_WINDOW_S * 1_000_000, -1)
    )
    nc = F.count(F.when(F.col("event_type") == "click", 1)).over(back)
    per_purchase = (
        ev.withColumn("nc", nc)
        .where((F.col("event_type") == "purchase") & (F.col("nc") > 0))
        .select((F.col("nc") * F.round(1_000_000.0 / F.col("nc"))).alias("out_ppm"))
    )
    total_purchase_ppm = per_purchase.agg(F.sum("out_ppm")).collect()[0][0]
    assert total_click_ppm == total_purchase_ppm
    n_credited = per_purchase.count()
    # each purchase's distributed total is within n/2 ppm of 1e6
    assert abs(total_click_ppm - n_credited * 1_000_000) <= n_credited * 500_000


def test_qv02_scd2_versions_partition_activity(spark, sf_dir):
    # SCD2 axioms: per user, version day-counts sum to the user's
    # distinct active days; exactly one current version; the current
    # version ends on the user's last active day.
    dim = load_all()["qv02_scd2_dimension"].fn(spark, sf_dir)
    e = load_table(spark, sf_dir, "events")
    activity = (
        e.select("user_id", F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .distinct()
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_days"), F.max("day").alias("last_day"))
    )
    agg = dim.groupBy("user_id").agg(
        F.sum("n_days").alias("dim_days"),
        F.sum("is_current").alias("n_current"),
        F.max(F.when(F.col("is_current") == 1, F.col("valid_to"))).alias(
            "current_end"
        ),
    )
    joined = agg.join(activity, "user_id")
    bad = joined.where(
        (F.col("dim_days") != F.col("n_days"))
        | (F.col("n_current") != 1)
        | (F.col("current_end") != F.col("last_day"))
    ).count()
    assert bad == 0 and joined.count() > 0


def test_qf05_psi_terms_are_nonnegative(spark, sf_dir):
    # (pB - pA) ln(pB/pA) >= 0 for every bucket (same sign factors), so
    # PSI >= 0 always — a mirror bug flipping a ratio goes negative
    rows = load_all()["qf05_feature_drift_psi"].fn(spark, sf_dir).collect()
    assert len(rows) > 0
    assert all(r.psi >= 0 for r in rows)


def test_qf06_correlations_bounded(spark, sf_dir):
    rows = load_all()["qf06_feature_correlation"].fn(spark, sf_dir).collect()
    assert len(rows) == 10
    assert all(-1.0 <= r.corr <= 1.0 for r in rows)


def test_q77_cohort_offset_zero_is_full(spark, sf_dir):
    rows = load_all()["q77_cohort_retention"].fn(spark, sf_dir).collect()
    zero = [r for r in rows if r.week_offset == 0]
    assert zero and all(r.retention == 1.0 for r in zero)
    assert all(0.0 < r.retention <= 1.0 for r in rows)


def test_qg02_triangle_count_matches_per_node_sum(spark, sf_dir):
    # independent recomputation: 3 * triangles == sum over nodes of
    # per-node triangle participation — derived from the same edge set
    # by a DIFFERENT algorithm (neighbor-set intersection per edge)
    out = load_all()["qg02_triangle_count"].fn(spark, sf_dir).collect()[0]
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    e = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .distinct()
    )
    # undirected adjacency → per-edge common-neighbor count
    und = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    n1 = und.select(F.col("u").alias("x"), F.col("v").alias("w"))
    n2 = und.select(F.col("u").alias("w"), F.col("v").alias("y"))
    closing = e.select(F.col("u").alias("x"), F.col("v").alias("y"))
    common = (
        n1.join(n2, "w")
        .join(closing, ["x", "y"], "left_semi")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()[0][0]
    )
    # per closing edge (x, y) the wedge x-w-y counts each common
    # neighbor w exactly once; a triangle contributes its third vertex
    # for each of its 3 closing edges, so common == 3 * triangles
    assert common == 3 * out.n_triangles


def test_qs13_negatives_never_positive(spark, sf_dir):
    # the one property negative sampling exists for: no sampled
    # negative is an actual interaction — checked against the
    # interaction table directly, not via the query's own anti-join
    neg = load_all()["qs13_negative_sampling"].fn(spark, sf_dir)
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    pos = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            F.col("o_custkey").alias("user_id"), F.col("l_partkey").alias("item_id")
        )
        .distinct()
    )
    leaked = neg.join(pos, ["user_id", "item_id"], "left_semi").count()
    assert leaked == 0 and neg.count() > 0
    # and draws per user never exceed k, ranks are 1..k
    from event_stream_aggr_spark.operators.sampling import NEG_K

    per_user = neg.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"), F.max("draw_rank").alias("mx")
    )
    assert per_user.where((F.col("n") > NEG_K) | (F.col("mx") > NEG_K)).count() == 0


def test_qt24_coverage_monotone_and_minimal(spark, sf_dir):
    rows = sorted(
        load_all()["qt24_vocab_coverage"].fn(spark, sf_dir).collect(),
        key=lambda r: r.target_pct,
    )
    sizes = [r.vocab_size for r in rows]
    covs = [r.coverage for r in rows]
    assert sizes == sorted(sizes)  # higher target never needs fewer words
    assert covs == sorted(covs)
    assert all(r.coverage * 100 >= r.target_pct for r in rows)  # target met


def test_q78_throttle_conserves_alerts(spark, sf_dir):
    from event_stream_aggr_spark.plans.relational import THROTTLE_N

    rows = load_all()["q78_alert_throttle"].fn(spark, sf_dir).collect()
    e = load_table(spark, sf_dir, "events")
    n_errors = e.where(F.col("event_type") == "error").count()
    assert sum(r.n_alerts for r in rows) == n_errors  # nothing lost
    assert all(r.n_kept + r.n_suppressed == r.n_alerts for r in rows)
    assert all(r.n_kept <= THROTTLE_N for r in rows)
    # the throttle bites exactly where a key exceeds the budget (at
    # tiny SFs no key may — suppression must then be zero everywhere)
    assert all((r.n_suppressed > 0) == (r.n_alerts > THROTTLE_N) for r in rows)


def test_qe15_kcenter_separations_nonincreasing(spark, sf_dir):
    # farthest-point property: the separation of pick r is the max
    # over points of a min-distance that only SHRINKS as centers are
    # added, so the sequence sep_1 >= sep_2 >= ... is guaranteed —
    # a selection-order bug breaks the chain immediately
    rows = sorted(
        load_all()["qe15_kcenter_coreset"].fn(spark, sf_dir).collect(),
        key=lambda r: r.center_rank,
    )
    seps = [r.sep_us for r in rows if r.sep_us is not None]
    assert len(seps) == len(rows) - 1 and len(set(r.vec_id for r in rows)) == len(rows)
    assert all(a >= b for a, b in zip(seps, seps[1:]))
    assert all(s > 0 for s in seps)


def test_qt25_overlap_jaccard_bounded_and_consistent(spark, sf_dir):
    rows = load_all()["qt25_source_overlap"].fn(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert 0.0 < r.jaccard <= 1.0
        assert r.n_shared <= min(r.n_grams_a, r.n_grams_b)
        assert r.source_a < r.source_b  # one row per unordered pair
