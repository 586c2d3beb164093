"""Streaming skyline maintenance (q86's stateful twin): the module
claims EXACT batch equivalence — any batching of the input folds to
byte-identical frontier state — plus the shared store protocol
(redelivery no-op, below-committed raise)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from event_stream_aggr_spark.streaming.skyline import (
    frontier_sweep,
    skyline_sink,
)
from event_stream_aggr_spark.streaming.state_store import read_state

SF = "/root/testdata/sf0.001"
SCHEMA = "p_brand string, p_retailprice double, p_size int"


def _state(spark, root):
    df, _ = read_state(spark, root)
    return sorted(map(tuple, df.collect()))


def _q86(spark, specs):
    return sorted(
        map(tuple, specs["q86_pareto_frontier"].fn(spark, SF).collect())
    )


@pytest.fixture(scope="module")
def specs():
    from event_stream_aggr_spark.plans.registry import load_all

    return load_all()


def test_three_way_split_equals_batch_q86(spark, tmp_path, specs):
    from event_stream_aggr_spark.tables import load_table

    parts = load_table(spark, SF, "part").select(
        "p_brand", "p_retailprice", "p_size"
    )
    # deterministic 3-way split on partkey-free content hash
    split = F.abs(F.hash("p_brand", "p_retailprice", "p_size")) % 3
    root = str(tmp_path / "state")
    sink = skyline_sink(root)
    for ep in range(3):
        sink(parts.filter(split == ep), ep)
    assert _state(spark, root) == _q86(spark, specs)


def test_single_batch_equals_batch_q86(spark, tmp_path, specs):
    from event_stream_aggr_spark.tables import load_table

    parts = load_table(spark, SF, "part").select(
        "p_brand", "p_retailprice", "p_size"
    )
    root = str(tmp_path / "state")
    skyline_sink(root)(parts, 0)
    assert _state(spark, root) == _q86(spark, specs)


def test_redelivery_noop_and_stale_checkpoint_raises(spark, tmp_path):
    rows = [("B1", 10.0, 5), ("B1", 12.0, 7), ("B1", 11.0, 6)]
    df = spark.createDataFrame(rows, SCHEMA)
    root = str(tmp_path / "state")
    sink = skyline_sink(root)
    sink(df, 0)
    before = _state(spark, root)
    sink(df, 0)  # redelivery: no double-count
    assert _state(spark, root) == before
    with pytest.raises(ValueError, match="below"):
        sink(df, -1)


def _brute_frontier(points):
    """Reference skyline with counts, pure Python."""
    from collections import Counter

    cnt = Counter(points)
    keys = set(cnt)

    def dominated(p):
        return any(
            q[0] <= p[0] and q[1] >= p[1] and (q[0] < p[0] or q[1] > p[1])
            for q in keys
        )

    return sorted(
        ("B", p[0], p[1], cnt[p]) for p in keys if not dominated(p)
    )


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    pts=st.lists(
        st.tuples(
            st.sampled_from([1.0, 2.0, 3.0, 4.0, 5.0]),
            st.integers(min_value=1, max_value=5),
        ),
        min_size=1,
        max_size=24,
    ),
    cuts=st.tuples(st.integers(0, 23), st.integers(0, 23)),
)
def test_any_batching_matches_brute_force(spark, tmp_path_factory, pts, cuts):
    """The merge-closure claim under Hypothesis: random point multisets
    split at random boundaries fold to the brute-force frontier with
    exact cumulative counts, regardless of where the cuts fall."""
    i, j = sorted((cuts[0] % len(pts), cuts[1] % len(pts)))
    batches = [pts[:i], pts[i:j], pts[j:]]
    root = str(tmp_path_factory.mktemp("sky") / "state")
    sink = skyline_sink(root)
    for ep, batch in enumerate(batches):
        rows = [("B", p, s) for (p, s) in batch]
        df = (
            spark.createDataFrame(rows, SCHEMA)
            if rows
            else spark.createDataFrame([], SCHEMA)
        )
        sink(df, ep)
    assert _state(spark, root) == _brute_frontier(pts)


def test_frontier_sweep_is_idempotent(spark):
    rows = [("B", float(p), s, 1) for p in range(1, 6) for s in range(1, 6)]
    pts = spark.createDataFrame(
        rows, "p_brand string, price double, p_size int, n_parts long"
    )
    once = sorted(map(tuple, frontier_sweep(pts).collect()))
    twice = sorted(map(tuple, frontier_sweep(frontier_sweep(pts)).collect()))
    assert once == twice
