"""connected_components' ``pairs_unique`` flag (round 15, second half):
skipping the edge-dedup Exchange must be invisible in the results —
identical components with the flag on/off for honest (one row per
unordered ``a < b`` pair) callers, and a correct (never wrong, merely
less cheap) answer even if a caller lies about uniqueness, because
min-label propagation is idempotent under duplicate edges."""

from __future__ import annotations

from pyspark.sql import functions as F

from event_stream_aggr_spark.operators.cluster import connected_components


def _comp_map(df):
    return {r.node: r.component for r in df.collect()}


def test_pairs_unique_flag_equivalence(spark):
    # chain + pair + triangle-by-two-edges: unique a < b rows
    rows = [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (20, 22)]
    pairs = spark.createDataFrame(rows, "doc_a long, doc_b long")
    base = _comp_map(connected_components(pairs))
    fast = _comp_map(connected_components(pairs, pairs_unique=True))
    assert fast == base
    assert base[4] == 1 and base[11] == 10 and base[22] == 20


def test_pairs_unique_flag_equivalence_seeded(spark):
    # the streaming ER shape: seeded init labels + label_offset
    # priority encoding, a_id < b_id strict
    off = 1 << 62
    pairs = spark.createDataFrame(
        [(100, 200), (200, 300), (400, 500)], "a_id long, b_id long"
    )
    init = spark.createDataFrame([(200, 7)], "node long, component long")
    kw = dict(a_col="a_id", b_col="b_id", init=init, label_offset=off)
    base = _comp_map(connected_components(pairs, **kw))
    fast = _comp_map(connected_components(pairs, pairs_unique=True, **kw))
    assert fast == base
    # the seeded store label (7 < offset) must win its component
    assert base[100] == base[200] == base[300] == 7
    assert base[400] == 400 + off


def test_pairs_unique_tolerates_lying_caller(spark):
    # duplicate rows AND both orientations: the flag skips the dedup,
    # but min-label is idempotent — components still exact
    rows = [(1, 2), (1, 2), (2, 1), (2, 3), (10, 11)]
    pairs = spark.createDataFrame(rows, "doc_a long, doc_b long")
    got = _comp_map(connected_components(pairs, pairs_unique=True))
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_pairs_unique_skips_edge_dedup_exchange(spark):
    # plan-shape pin: the reversed-union edge frame compiles WITHOUT
    # an aggregate-dedup when the flag is set (the caller-visible
    # contract this optimization rests on). Reconstruct the exact edge
    # expression CC builds, both ways, and compare plan node counts.
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "doc_a long, doc_b long")
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).union(pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
    plan_fast = edges._jdf.queryExecution().executedPlan().toString()
    plan_slow = edges.distinct()._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan_fast
    assert "Exchange" in plan_slow
