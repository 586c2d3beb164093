"""Hypothesis property: the KMV sketch is batch-split invariant —
folding kmv_merge (operators/sketch.py: union, dedup, keep k smallest
per group) over ANY partition of the (group, hash) rows equals the
whole-input sketch. This is the cross-micro-batch logic the Spark
parity test (test_stream_batch_equiv.py kmv twin) exercises at one
data point, verified here across random inputs and random batch
boundaries without a Spark session — including the edges the real
corpus doesn't hit: the same hash arriving in several batches, groups
with fewer than k distinct values (degrade-to-exact), empty batches,
and groups absent from some batches.

The pure mirror reuses the PRODUCTION k (KMV_K semantics with a small
k for coverage) and the same build/merge derivation: build = k
smallest DISTINCT per group; merge = build over the distinct union —
so a drift in the Spark-side ordering/dedup contract would break the
law the Spark twin asserts too.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st


def kmv_sketch(rows: list[tuple[str, int]], k: int) -> dict[str, frozenset]:
    """Pure mirror of kmv_build over an arbitrary (group, h) multiset:
    dedup, then keep each group's k smallest hashes."""
    groups: dict[str, set] = {}
    for g, h in rows:
        groups.setdefault(g, set()).add(h)
    return {g: frozenset(sorted(hs)[:k]) for g, hs in groups.items()}


def kmv_merge_pure(
    a: dict[str, frozenset], b: dict[str, frozenset], k: int
) -> dict[str, frozenset]:
    """Pure mirror of kmv_merge: union the sketches, keep k smallest."""
    out = {}
    for g in set(a) | set(b):
        out[g] = frozenset(sorted(a.get(g, frozenset()) | b.get(g, frozenset()))[:k])
    return out


rows_strategy = st.lists(
    st.tuples(
        st.sampled_from(["web", "books", "code", "wiki"]),
        st.integers(min_value=0, max_value=40),  # tight range forces dups
    ),
    min_size=0,
    max_size=120,
)


@given(rows=rows_strategy, k=st.integers(min_value=1, max_value=12), data=st.data())
@settings(max_examples=300, deadline=None)
def test_merge_fold_equals_whole_build(rows, k, data):
    """For any split of the rows into chunks, folding per-chunk
    sketches through the merge equals the whole-input sketch — the law
    that makes a streaming KMV maintainer exact rather than
    approximate-on-approximate."""
    n_cuts = data.draw(st.integers(min_value=0, max_value=5))
    cuts = sorted(
        data.draw(
            st.lists(
                st.integers(min_value=0, max_value=len(rows)),
                min_size=n_cuts,
                max_size=n_cuts,
            )
        )
    )
    bounds = [0, *cuts, len(rows)]
    chunks = [rows[lo:hi] for lo, hi in zip(bounds, bounds[1:])]

    folded: dict[str, frozenset] = {}
    for chunk in chunks:
        folded = kmv_merge_pure(folded, kmv_sketch(chunk, k), k)

    assert folded == kmv_sketch(rows, k)


@given(rows=rows_strategy, k=st.integers(min_value=1, max_value=12))
@settings(max_examples=200, deadline=None)
def test_small_groups_degrade_to_exact(rows, k):
    """A group with fewer than k distinct hashes keeps its WHOLE set —
    the degrade-gracefully clause qh04's Jaccard relies on (small
    sources get exact Jaccard, not an estimate)."""
    sk = kmv_sketch(rows, k)
    exact: dict[str, set] = {}
    for g, h in rows:
        exact.setdefault(g, set()).add(h)
    for g, hs in exact.items():
        if len(hs) <= k:
            assert sk[g] == frozenset(hs)
        else:
            assert len(sk[g]) == k and sk[g] == frozenset(sorted(hs)[:k])
