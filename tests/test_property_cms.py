"""Hypothesis property: the count-min sketch is batch-split invariant
— merging per-chunk counter tables (operators/sketch.py:cms_merge's
cell-wise-sum semantics) over ANY partition of the key stream equals
the whole-stream sketch, and the min-over-rows point estimate never
underestimates the exact count. This is the cross-micro-batch logic
the Spark parity test (test_stream_batch_equiv.py count_min twin)
exercises at one data point, verified here across random inputs and
random batch boundaries without a Spark session.

The pure mirror reuses the PRODUCTION hash constants/derivation
(_CMS_MIX / CMS_W / CMS_D), so a drift in the Spark-side hashing
would break the mirror's agreement with the oracle too.
"""

from __future__ import annotations

from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

from event_stream_aggr_spark.operators.sketch import CMS_D, CMS_W, _CMS_MIX, _MOD32


def cms_cells(keys: list[int]) -> Counter:
    """Pure mirror of cms_build: (row, col) -> count."""
    cells: Counter = Counter()
    for k in keys:
        for r in range(CMS_D):
            mul, add = _CMS_MIX[r]
            cells[(r, ((k * mul + add) % _MOD32) % CMS_W)] += 1
    return cells


def cms_point(cells: Counter, k: int) -> int:
    ests = []
    for r in range(CMS_D):
        mul, add = _CMS_MIX[r]
        ests.append(cells.get((r, ((k * mul + add) % _MOD32) % CMS_W), 0))
    return min(ests)


keys_strategy = st.lists(
    st.integers(min_value=0, max_value=100_000), min_size=0, max_size=300
)


@given(keys=keys_strategy, data=st.data())
@settings(max_examples=300, deadline=None)
def test_merge_is_batch_split_invariant(keys, data):
    """For any split of the stream into chunks, cell-wise-summing the
    per-chunk sketches equals the whole-stream sketch."""
    n_cuts = data.draw(st.integers(min_value=0, max_value=5))
    cuts = sorted(
        data.draw(
            st.lists(
                st.integers(min_value=0, max_value=len(keys)),
                min_size=n_cuts,
                max_size=n_cuts,
            )
        )
    )
    bounds = [0, *cuts, len(keys)]
    merged: Counter = Counter()
    for lo, hi in zip(bounds, bounds[1:]):
        merged += cms_cells(keys[lo:hi])
    assert merged == cms_cells(keys)


@given(keys=keys_strategy)
@settings(max_examples=300, deadline=None)
def test_point_estimate_never_underestimates(keys):
    cells = cms_cells(keys)
    exact = Counter(keys)
    for k, n in exact.items():
        assert cms_point(cells, k) >= n


@given(keys=keys_strategy)
@settings(max_examples=100, deadline=None)
def test_sketch_size_is_bounded(keys):
    """However long the stream, the sketch never exceeds d*w cells and
    its total mass is exactly d * len(stream)."""
    cells = cms_cells(keys)
    assert len(cells) <= CMS_D * CMS_W
    assert sum(cells.values()) == CMS_D * len(keys)
