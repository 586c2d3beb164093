"""Mechanical lint over every registered query's optimized plan
(round-7 VERDICT ask #3): a partitionless Window is only ever allowed
over a provably-bounded relation. See plans/lint.py for the rule."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from event_stream_aggr_spark.plans.lint import partitionless_window_violations
from event_stream_aggr_spark.plans.registry import load_all
from event_stream_aggr_spark.tables import load_table

#: sites where the lint's structural rule can't see the boundedness
#: but a human audit has: each entry documents WHY the global window
#: is safe at 100 TB. Keep this list short — every addition needs the
#: justification string.
ALLOWLIST: dict[str, str] = {}


@pytest.fixture(scope="module")
def specs():
    return load_all()


@pytest.fixture(scope="module")
def frames(spark, sf_dir, specs):
    """One DataFrame per registered query, built ONCE for the module:
    three lint walks each need every query's plan, and several queries
    now do eager driver-side work at construction time (qg07's peel,
    qz08's stats pass, connected-components convergence loops) that
    would otherwise execute once per walk."""
    return {name: spec.fn(spark, sf_dir) for name, spec in sorted(specs.items())}


def test_no_partitionless_window_over_fact_grain(frames):
    """Every registered query: any Window with an empty partitionSpec
    must sit above an Aggregate/Limit/Deduplicate on EVERY path to a
    leaf. This is the mechanical backstop for the documented
    tiny-derived-relation pattern (qa04 deciles, qt24 vocab prefix,
    qs11/qs15 quota ranks...)."""
    bad: dict[str, list[str]] = {}
    for name, df in frames.items():
        if name in ALLOWLIST:
            continue
        v = partitionless_window_violations(df)
        if v:
            bad[name] = v
    assert not bad, f"partitionless windows over unbounded input: {bad}"


def test_lint_catches_deliberate_violation(spark, sf_dir):
    """The lint must actually fire: a global running total straight
    over the fact-grain events table is the exact 100 TB killer the
    rule exists for."""
    ev = load_table(spark, sf_dir, "events")
    df = ev.withColumn("cum", F.sum("value").over(W.orderBy("ts")))
    assert partitionless_window_violations(df)


def test_lint_accepts_bounded_global_window(spark, sf_dir):
    """...and must NOT fire on the documented-safe pattern: a global
    rank over an aggregation's group grain."""
    ev = load_table(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(F.sum("value").alias("v"))
    df = per_type.withColumn("rk", F.rank().over(W.orderBy(F.desc("v"))))
    assert partitionless_window_violations(df) == []


def test_lint_flags_fact_side_of_join_under_global_window(spark, sf_dir):
    """A window over agg ⋈ fact is still a violation — the fact side
    streams through the single partition even though one input is
    bounded."""
    ev = load_table(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(F.sum("value").alias("v"))
    joined = ev.join(per_type, "event_type")
    df = joined.withColumn("rk", F.row_number().over(W.orderBy("ts")))
    assert partitionless_window_violations(df)


# ---------------------------------------------------------------------------
# Round-9 lints: nested-loop joins / unbroadcast tiny sides (VERDICT ask #6)
# ---------------------------------------------------------------------------

from event_stream_aggr_spark.plans.lint import (  # noqa: E402
    nested_loop_join_violations,
    unbroadcast_tiny_side_violations,
)

#: same contract as ALLOWLIST above: structural lints should need no
#: name-based exemptions — keep these empty.
NLJ_ALLOWLIST: dict[str, str] = {}
TINY_SIDE_ALLOWLIST: dict[str, str] = {}


def test_no_data_sized_nested_loop_join_anywhere(frames):
    """Every registered query: any CartesianProduct/BroadcastNestedLoop
    join must have at least one BY-CONSTRUCTION-tiny side (scalar
    aggregate, small limit, literal rows) or an explicit broadcast
    hint. The accepted 1-row stats crossJoins pass structurally — the
    allowlist stays empty."""
    bad: dict[str, list[str]] = {}
    for name, df in frames.items():
        if name in NLJ_ALLOWLIST:
            continue
        v = nested_loop_join_violations(df)
        if v:
            bad[name] = v
    assert not bad, f"data-sized nested-loop joins: {bad}"


def test_no_shuffle_join_with_provably_tiny_side(frames):
    """Every registered query: a sort-merge/shuffled-hash join whose
    one side is provably tiny shuffles the big side for nothing — the
    tiny side must ride a broadcast."""
    bad: dict[str, list[str]] = {}
    for name, df in frames.items():
        if name in TINY_SIDE_ALLOWLIST:
            continue
        v = unbroadcast_tiny_side_violations(df)
        if v:
            bad[name] = v
    assert not bad, f"shuffle joins with broadcastable tiny sides: {bad}"


def test_nlj_lint_catches_data_sized_cross_join(spark, sf_dir):
    """Deliberate violation: events x documents cross join — two
    data-sized sides, the textbook 100 TB quadratic."""
    ev = load_table(spark, sf_dir, "events").select("event_id")
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    assert nested_loop_join_violations(ev.crossJoin(docs))


def test_nlj_lint_accepts_scalar_aggregate_cross_join(spark, sf_dir):
    """...and must NOT fire on the accepted calibration pattern: a
    1-row global aggregate broadcast against the fact table (bounded
    by structure, hint not even needed)."""
    ev = load_table(spark, sf_dir, "events")
    cal = ev.agg(F.max("value").alias("mx"))
    assert nested_loop_join_violations(ev.crossJoin(F.broadcast(cal))) == []
    assert nested_loop_join_violations(ev.crossJoin(cal)) == []  # unhinted too


def test_nlj_lint_accepts_explicit_hint_as_author_assertion(spark, sf_dir):
    """An explicitly F.broadcast-hinted side passes even when no
    static rule can bound it (the ANN query-vector pattern: a
    selective literal key filter on a scan) — the hint is the
    author's auditable, greppable assertion. The SAME join without
    the hint must flag."""
    ev = load_table(spark, sf_dir, "events")
    anchors = ev.filter(F.col("event_id") < 3).select("event_id", "value")
    theta = (F.col("v2") > F.col("value"))
    hinted = ev.select(F.col("value").alias("v2")).join(F.broadcast(anchors), theta)
    assert nested_loop_join_violations(hinted) == []
    bare = ev.select(F.col("value").alias("v2")).join(anchors, theta)
    assert nested_loop_join_violations(bare)
    # a merge/shuffle_hash hint asserts nothing about SIZE — still flags
    merged = ev.select(F.col("value").alias("v2")).join(anchors.hint("merge"), theta)
    assert nested_loop_join_violations(merged)


def test_tiny_side_lint_catches_unbroadcast_scalar_agg_join(spark, sf_dir):
    """Deliberate violation: with auto-broadcast disabled and no hint,
    a scalar aggregate side lands in a sort-merge join — the lint must
    flag it (the fix is F.broadcast on the tiny side)."""
    ev = load_table(spark, sf_dir, "events")
    cal = ev.agg(F.max("value").alias("value"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = ev.join(cal, "value")
        assert unbroadcast_tiny_side_violations(j)
        # and the broadcast-hinted twin is clean
        j2 = ev.join(F.broadcast(ev.agg(F.max("value").alias("value"))), "value")
        assert unbroadcast_tiny_side_violations(j2) == []
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_tiny_side_lint_ignores_grouped_aggregates(spark, sf_dir):
    """A grouped aggregate's cardinality is data-dependent — never
    flagged, even under a shuffle join."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(F.sum("value").alias("v"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = ev.join(per_user, "user_id")
        assert unbroadcast_tiny_side_violations(j) == []
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_nlj_lint_literal_equality_is_not_a_join_key(spark, sf_dir):
    """Round-9 review fix: theta AND (col == literal) extracts no
    equi-key — execution is still a nested loop over two data-sized
    sides, so the lint must flag it; a genuine cross-side equality
    conjunct makes it a keyed join and exempts it."""
    ev = load_table(spark, sf_dir, "events").select(
        F.col("event_id").alias("eid"), F.col("value").alias("v")
    )
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("n_chars").alias("score")
    )
    theta_plus_literal = (F.col("v") < F.col("score")) & (F.col("doc_id") == 1)
    assert nested_loop_join_violations(ev.join(docs, theta_plus_literal))
    # equality under OR is not a usable key either
    or_equality = (F.col("eid") == F.col("doc_id")) | (F.col("v") < F.col("score"))
    assert nested_loop_join_violations(ev.join(docs, or_equality))
    # a genuine cross-side equality conjunct IS a key: exempt
    keyed = (F.col("eid") == F.col("doc_id")) & (F.col("v") < F.col("score"))
    assert nested_loop_join_violations(ev.join(docs, keyed)) == []


def test_boundedness_respects_join_type_and_multipliers(spark, sf_dir):
    """Round-9 review fixes: (a) a left join with only a bounded RIGHT
    side is fact-sized — a cross join above it must still flag; (b) a
    scalar-agg 1-row cross multiplier does not make a fact relation
    bounded; (c) explode under a limit is not bounded."""
    ev = load_table(spark, sf_dir, "events")
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    scalar = ev.agg(F.max("value").alias("mx"))

    # (a) fact LEFT-joined to a 1-row agg keeps |fact| rows
    fact_left = ev.withColumn("mx", F.lit(1.0)).join(
        scalar.withColumnRenamed("mx", "value2"),
        F.col("value") == F.col("value2"),
        "left",
    )
    assert nested_loop_join_violations(fact_left.crossJoin(docs))

    # (b) fact x 1-row scalar cross join is still fact-sized
    widened = ev.crossJoin(F.broadcast(scalar))
    assert nested_loop_join_violations(widened.crossJoin(docs))

    # (c) explode multiplies: limit(10) then explode is unbounded
    exploded = (
        docs.limit(10)
        .select(F.explode(F.expr("sequence(1, 100000)")).alias("x"))
    )
    assert nested_loop_join_violations(exploded.crossJoin(ev))
