"""Hypothesis property: the interval-union streaming state machine
(streaming/stats.py:ivu_fold) is batch-split invariant and equals a
sweep-line reference — the cross-micro-batch logic the Spark parity
test exercises at one data point, verified here across random inputs
and random batch boundaries without a Spark session.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from event_stream_aggr_spark.streaming.stats import ivu_fold, ivu_totals

HOLD = 300
EMPTY = (None, None, 0, 0, 0, 0)


def sweep_line(starts: list[int]) -> tuple[int, int, int]:
    """Reference: merge [s, s+HOLD] holds by sorting, count islands /
    intervals / covered seconds."""
    if not starts:
        return (0, 0, 0)
    islands = []
    for s in sorted(starts):
        e = s + HOLD
        if islands and s <= islands[-1][1]:
            islands[-1][1] = max(islands[-1][1], e)
        else:
            islands.append([s, e])
    return (
        len(islands),
        len(starts),
        sum(e - s for s, e in islands),
    )


starts_strategy = st.lists(
    st.integers(min_value=0, max_value=50_000), min_size=0, max_size=200
)


@given(starts=starts_strategy)
@settings(max_examples=300, deadline=None)
def test_single_fold_equals_sweep_line(starts):
    st_ = ivu_fold(EMPTY, sorted(starts), HOLD)
    assert ivu_totals(st_) == sweep_line(starts)


@given(
    starts=starts_strategy,
    cut_seed=st.integers(min_value=0, max_value=2**31 - 1),
    n_cuts=st.integers(min_value=0, max_value=8),
)
@settings(max_examples=300, deadline=None)
def test_fold_is_batch_split_invariant(starts, cut_seed, n_cuts):
    """Splitting the time-sorted run at ARBITRARY points (micro-batch
    boundaries) and folding each slice through the carried state must
    equal the single-shot fold — the property that makes the Spark
    twin correct however the file stream batches the replay."""
    import random

    ordered = sorted(starts)
    rng = random.Random(cut_seed)
    cuts = sorted(rng.randint(0, len(ordered)) for _ in range(n_cuts))
    state = EMPTY
    prev = 0
    for c in [*cuts, len(ordered)]:
        state = ivu_fold(state, ordered[prev:c], HOLD)
        prev = c
    assert ivu_totals(state) == sweep_line(starts)
    assert ivu_totals(state) == ivu_totals(ivu_fold(EMPTY, ordered, HOLD))
