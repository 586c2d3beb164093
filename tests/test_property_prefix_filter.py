"""Hypothesis property test for the prefix-filtering losslessness
claim (operators/dedup.py:prefix_filtered_pairs, round 8): over random
small corpora — adversarial for exactly the places a prefix scheme can
go wrong (ties in the global df order, identical sets, singleton and
near-empty sets, thresholds hit exactly) — the prefix-filtered output
must equal the brute-force all-pairs join pair-for-pair.

The comparison oracle here is PURE PYTHON (independent of any Spark
join), so this test also cross-checks the sf0.001 Spark-vs-Spark
equality in test_dedup.py against a third implementation."""

from __future__ import annotations

from fractions import Fraction

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

VOCAB = [f"t{i}" for i in range(12)]

doc_sets = st.lists(
    st.sets(st.sampled_from(VOCAB), min_size=0, max_size=8),
    min_size=2,
    max_size=10,
)

thresholds = st.sampled_from([(3, 5), (9, 50), (1, 2), (4, 5), (1, 10)])


def _brute_force(sets: list[set], t: Fraction) -> set[tuple[int, int]]:
    out = set()
    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            union = len(sets[i] | sets[j])
            if union == 0:
                continue
            if Fraction(len(sets[i] & sets[j]), union) >= t:
                out.add((i, j))
    return out


def _prefix_filtered(sets: list[set], t_num: int, t_den: int) -> set[tuple[int, int]]:
    """Pure-python replay of the prefix_filtered_pairs dataflow: global
    (df, token) order, per-set prefix of n - ceil(t·n) + 1, candidates
    share a prefix token, exact verification."""
    df: dict[str, int] = {}
    for s in sets:
        for tok in s:
            df[tok] = df.get(tok, 0) + 1
    t = Fraction(t_num, t_den)
    prefixes = []
    for s in sets:
        ranked = sorted(s, key=lambda tok: (df[tok], tok))
        n = len(ranked)
        o_min = -((-n * t_num) // t_den)  # ceil(t*n) in exact ints
        prefixes.append(set(ranked[: n - o_min + 1]))
    cands = set()
    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            if prefixes[i] & prefixes[j]:
                cands.add((i, j))
    out = set()
    for i, j in cands:
        union = len(sets[i] | sets[j])
        if union and Fraction(len(sets[i] & sets[j]), union) >= t:
            out.add((i, j))
    return out


@settings(max_examples=300, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(doc_sets, thresholds)
def test_prefix_filter_candidates_are_complete(sets, t):
    t_num, t_den = t
    got = _prefix_filtered(sets, t_num, t_den)
    want = _brute_force(sets, Fraction(t_num, t_den))
    assert got == want


def test_prefix_filter_python_replay_matches_spark(spark):
    """Anchor the pure-python replay above to the REAL Spark operator
    on one deterministic corpus containing the adversarial shapes
    (identical sets, subset pairs, df ties, empty set), so the
    hypothesis property genuinely speaks for prefix_filtered_pairs."""
    from pyspark.sql import functions as F

    from event_stream_aggr_spark.operators.dedup import prefix_filtered_pairs

    corpora = [
        {"a", "b", "c"},
        {"a", "b", "c"},          # identical pair
        {"a", "b"},               # subset
        {"b", "c", "d", "e"},
        {"e"},                    # singleton
        set(),                    # empty
        {"d", "e", "f", "g", "h"},
    ]
    rows = [(i, 0, sorted(s)) for i, s in enumerate(corpora)]
    d = spark.createDataFrame(rows, "doc_id long, blk long, toks array<string>")
    got = {
        (r.doc_a, r.doc_b)
        for r in prefix_filtered_pairs(d, "toks", 3, 5, ["blk"]).collect()
    }
    want = _prefix_filtered(corpora, 3, 5)
    assert got == want == _brute_force(corpora, Fraction(3, 5))
    assert (0, 1) in got  # the identical pair survived
