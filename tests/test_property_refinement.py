"""Hypothesis guard for the block-refinement ladder (qer04's kernel,
operators/linkage.refinement_report): on random small corpora the
Spark dataflow must agree, count for count, with an independent
pure-Python replay of the ladder rule — level-0 blocks over the cap
re-block by +nation, +segment, then the exact name, purge only at
the bottom; kept
levels partition the pair space (every candidate pair counted exactly
once). Randomizing names across two coarse prefixes, nations, and
segments drives all level transitions and the purge branch."""

from __future__ import annotations

from collections import Counter
from decimal import Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from event_stream_aggr_spark.operators.linkage import (
    B_ID_OFFSET,
    REFINE_COARSE_LEN,
    refinement_report,
)

_SETTINGS = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# a record: (coarse-prefix index, name suffix, nation, segment) —
# two 14-char prefixes, tiny key domains so blocks collide hard
_record = st.tuples(
    st.integers(0, 1),
    st.integers(0, 3),
    st.integers(0, 2),
    st.integers(0, 1),
)
_corpus = st.lists(_record, min_size=1, max_size=14)
_cap = st.integers(min_value=1, max_value=30)

_PREFIXES = ("CoarsePrefixAA", "CoarsePrefixBB")
assert all(len(p) == REFINE_COARSE_LEN for p in _PREFIXES)


def _rows(recs):
    return [
        (
            i,
            _PREFIXES[p] + f"_{sfx}",
            f"S{seg}",
            Decimal(f"{100 + i}.00"),
            nat,
        )
        for i, (p, sfx, nat, seg) in enumerate(recs)
    ]


def _ladder_reference(rows, cap):
    """Pure-Python replay of the ladder rule on (id, name, seg, bal,
    nation) A rows and the identity twin (B = A with offset ids)."""
    a = [
        (i, n[:REFINE_COARSE_LEN], nat, s, n) for i, n, s, _b, nat in rows
    ]
    b = a  # identity twin: same compare fields, offset ids

    def level(a_rows, b_rows, keyfn):
        ca = Counter(keyfn(r) for r in a_rows)
        cb = Counter(keyfn(r) for r in b_rows)
        keep = {k for k in ca if k in cb and ca[k] * cb[k] <= cap}
        over = {k for k in ca if k in cb and ca[k] * cb[k] > cap}
        return keep, over

    k0 = lambda r: r[1]  # noqa: E731
    k1 = lambda r: (r[1], r[2])  # noqa: E731
    k2 = lambda r: (r[1], r[2], r[3])  # noqa: E731
    k3 = lambda r: (r[1], r[2], r[3], r[4])  # noqa: E731

    keep0, over0 = level(a, b, k0)
    a1 = [r for r in a if k0(r) in over0]
    keep1, over1 = level(a1, a1, k1)
    a2 = [r for r in a1 if k1(r) in over1]
    keep2, over2 = level(a2, a2, k2)
    a3 = [r for r in a2 if k2(r) in over2]
    keep3, purged = level(a3, a3, k3)

    cand = 0
    true_found = 0
    for ra in a:
        for rb in b:
            if k0(ra) == k0(rb) and k0(ra) in keep0:
                pass
            elif k1(ra) == k1(rb) and k1(ra) in keep1:
                pass
            elif k2(ra) == k2(rb) and k2(ra) in keep2:
                pass
            elif k3(ra) == k3(rb) and k3(ra) in keep3:
                pass
            else:
                continue
            cand += 1
            if ra[0] == rb[0]:
                true_found += 1
    return {
        "n_l0_blocks_kept": len(keep0),
        "n_l1_blocks_kept": len(keep1),
        "n_l2_blocks_kept": len(keep2),
        "n_l3_blocks_kept": len(keep3),
        "n_purged_blocks": len(purged),
        "n_candidates": cand,
        "n_true_found": true_found,
        "n_true_missed": len(a) - true_found,
    }


@_SETTINGS
@given(recs=_corpus, cap=_cap)
def test_ladder_matches_pure_python_replay(spark, recs, cap):
    rows = _rows(recs)
    a = spark.createDataFrame(
        rows,
        "a_id long, a_name string, a_seg string, a_bal decimal(12,2), "
        "a_nation int",
    )
    b = spark.createDataFrame(
        [(i + B_ID_OFFSET, n, s, bal, nat) for i, n, s, bal, nat in rows],
        "b_id long, b_name string, b_seg string, b_bal decimal(13,2), "
        "b_nation int",
    )
    got = refinement_report(a, b, cap=cap).collect()[0].asDict()
    want = _ladder_reference(rows, cap)
    got = {k: got[k] for k in want}
    assert got == want, f"cap={cap} rows={rows}"


# ---------------------------------------------------------------------------
# qer05 composed report vs pure-Python replay (round 14): the
# inclusion-exclusion + membership-test dataflow must agree, count for
# count, with a naive set-union model — the optimization (per-pass
# map-side flags, block-grain membership joins, no pair-grain shuffle)
# must be invisible in the numbers.
# ---------------------------------------------------------------------------

from event_stream_aggr_spark.operators.linkage import (  # noqa: E402
    BAL_BAND,
    BAL_TOL,
    T_MATCH,
    W_AGREE,
    W_DISAGREE,
    composed_blocking_report,
)

# (prefix idx, name suffix, nation, segment, band idx, in-band value):
# two coarse prefixes and two balance bands with colliding exact
# values drive every level of BOTH chains plus both purge branches
_crecord = st.tuples(
    st.integers(0, 1),
    st.integers(0, 2),
    st.integers(0, 1),
    st.integers(0, 1),
    st.integers(0, 1),
    st.integers(0, 1),
)
_ccorpus = st.lists(_crecord, min_size=1, max_size=12)


def _crows(recs):
    return [
        (
            i,
            _PREFIXES[p] + f"_{sfx}",
            f"S{seg}",
            Decimal(f"{100 * (band + 1) + val}.00"),
            nat,
        )
        for i, (p, sfx, nat, seg, band, val) in enumerate(recs)
    ]


def _composed_reference(rows, cap):
    """Naive model: run each chain's ladder (identity twin), take the
    SET UNION of the two passes' pair sets, then count."""

    def ladder_pairs(keyfns):
        cur = list(rows)
        keeps = []
        for kf in keyfns:
            c = Counter(kf(r) for r in cur)
            keeps.append({k for k in c if c[k] * c[k] <= cap})
            over = {k for k in c if c[k] * c[k] > cap}
            cur = [r for r in cur if kf(r) in over]
        purged = over if keyfns else set()
        pairs = set()
        for ra in rows:
            for rb in rows:
                if any(
                    kf(ra) == kf(rb) and kf(ra) in keep
                    for kf, keep in zip(keyfns, keeps)
                ):
                    pairs.add((ra[0], rb[0]))
        return keeps, purged, pairs

    name_kfs = [
        lambda r: r[1][:REFINE_COARSE_LEN],
        lambda r: (r[1][:REFINE_COARSE_LEN], r[4]),
        lambda r: (r[1][:REFINE_COARSE_LEN], r[4], r[1]),
    ]
    band_kfs = [
        lambda r: r[3] // BAL_BAND,
        lambda r: (r[3] // BAL_BAND, r[4]),
        lambda r: (r[3] // BAL_BAND, r[4], r[2]),
        lambda r: (r[3] // BAL_BAND, r[4], r[2], r[3]),
    ]
    keeps_a, purged_a, pairs_a = ladder_pairs(name_kfs)
    keeps_b, purged_b, pairs_b = ladder_pairs(band_kfs)
    union = pairs_a | pairs_b
    by_id = {r[0]: r for r in rows}
    matches = true_found = 0
    for ia, ib in union:
        ra, rb = by_id[ia], by_id[ib]
        w = (
            (W_AGREE["name"] if ra[1] == rb[1] else W_DISAGREE["name"])
            + (W_AGREE["seg"] if ra[2] == rb[2] else W_DISAGREE["seg"])
            + (
                W_AGREE["bal"]
                if abs(ra[3] - rb[3]) <= Decimal(BAL_TOL)
                else W_DISAGREE["bal"]
            )
        )
        if w >= T_MATCH:
            matches += 1
        if ia == ib:  # identity twin: b_id - OFFSET == a_id
            true_found += 1
    return {
        "pa_l0_blocks_kept": len(keeps_a[0]),
        "pa_l1_blocks_kept": len(keeps_a[1]),
        "pa_l2_blocks_kept": len(keeps_a[2]),
        "pa_purged_blocks": len(purged_a),
        "pb_l0_blocks_kept": len(keeps_b[0]),
        "pb_l1_blocks_kept": len(keeps_b[1]),
        "pb_l2_blocks_kept": len(keeps_b[2]),
        "pb_l3_blocks_kept": len(keeps_b[3]),
        "pb_purged_blocks": len(purged_b),
        "n_candidates": len(union),
        "n_match_pairs": matches,
        "n_true_found": true_found,
        "n_true_missed": len(rows) - true_found,
    }


@_SETTINGS
@given(recs=_ccorpus, cap=_cap)
def test_composed_report_matches_pure_python_replay(spark, recs, cap):
    rows = _crows(recs)
    a = spark.createDataFrame(
        rows,
        "a_id long, a_name string, a_seg string, a_bal decimal(12,2), "
        "a_nation int",
    )
    b = spark.createDataFrame(
        [(i + B_ID_OFFSET, n, s, bal, nat) for i, n, s, bal, nat in rows],
        "b_id long, b_name string, b_seg string, b_bal decimal(13,2), "
        "b_nation int",
    )
    got = composed_blocking_report(a, b, cap=cap).collect()[0].asDict()
    want = _composed_reference(rows, cap)
    got = {k: got[k] for k in want}
    assert got == want, f"cap={cap} rows={rows}"
