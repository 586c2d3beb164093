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


# ---------------------------------------------------------------------------
# Winnowing (qt31) — the selection guarantee, fuzzed
# ---------------------------------------------------------------------------

from event_stream_aggr_spark.operators.text import (  # noqa: E402
    WINNOW_B,
    WINNOW_K,
    WINNOW_M,
    WINNOW_W,
)


def _winnow_py(text: str) -> set[int]:
    hs = []
    for i in range(len(text) - WINNOW_K + 1):
        h = 0
        for c in text[i : i + WINNOW_K]:
            h = h * WINNOW_B + ord(c)
        hs.append(h % WINNOW_M)
    return {
        min(hs[i : i + WINNOW_W]) for i in range(len(hs) - WINNOW_W + 1)
    }


@settings(max_examples=200, deadline=None)
@given(
    st.text(alphabet="abcdefgh ", min_size=0, max_size=30),
    st.text(alphabet="abcdefgh ", min_size=0, max_size=30),
    st.text(alphabet="abcdefgh ", min_size=WINNOW_K + WINNOW_W - 1, max_size=20),
)
def test_winnowing_shared_substring_guarantee(prefix_a, prefix_b, shared):
    """Schleimer et al.'s correctness theorem, executed: two documents
    sharing a substring of length >= k + w - 1 MUST share at least one
    selected fingerprint — the property that makes window-minima a
    fingerprint scheme instead of lossy sampling."""
    doc_a = prefix_a + shared
    doc_b = prefix_b + shared
    assert _winnow_py(doc_a) & _winnow_py(doc_b)


def test_winnowing_python_replay_matches_spark(spark):
    """Anchor the pure-python replay to the registered query on real
    corpus docs, so the hypothesis property speaks for qt31."""
    from event_stream_aggr_spark.plans.registry import load_all
    from event_stream_aggr_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    out = {
        r.doc_id: (r.n_kgrams, r.n_selected, r.fp_min, r.fp_max)
        for r in load_all()["qt31_winnowing_fingerprints"].fn(spark, sf).collect()
    }
    texts = {
        r.doc_id: r.text
        for r in load_table(spark, sf, "documents").select("doc_id", "text").collect()
    }
    checked = 0
    for doc_id, (n_kgrams, n_selected, fp_min, fp_max) in list(out.items())[:25]:
        sel = _winnow_py(texts[doc_id])
        assert n_kgrams == len(texts[doc_id]) - WINNOW_K + 1
        assert (n_selected, fp_min, fp_max) == (len(sel), min(sel), max(sel))
        checked += 1
    assert checked == 25
