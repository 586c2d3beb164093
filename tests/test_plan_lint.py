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


def test_no_partitionless_window_over_fact_grain(spark, sf_dir, specs):
    """Every registered query: any Window with an empty partitionSpec
    must sit above an Aggregate/Limit/Deduplicate on EVERY path to a
    leaf. This is the mechanical backstop for the documented
    tiny-derived-relation pattern (qa04 deciles, qt24 vocab prefix,
    qs11/qs15 quota ranks...)."""
    bad: dict[str, list[str]] = {}
    for name, spec in sorted(specs.items()):
        if name in ALLOWLIST:
            continue
        df = spec.fn(spark, sf_dir)
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
