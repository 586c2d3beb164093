"""Hypothesis property for qj03's Allen classifier: the PRODUCTION
CASE precedence chain (operators/interval.py:_ALLEN_CASE — the exact
SQL text both engines execute) is evaluated through DuckDB against a
pure-Python reference of Allen (1983)'s definitions, across random
interval pairs including the degenerate point-interval cases the
precedence order exists to resolve. No Spark session needed: the CASE
string is engine-portable SQL, and binding the test to the string
itself means a drift in the chain breaks this test before it breaks
the cross-engine hash."""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from event_stream_aggr_spark.operators.interval import _ALLEN_CASE


def allen_reference(ls: int, le: int, rs: int, re: int) -> str:
    """Textbook Allen relations over closed intervals, with the SAME
    documented precedence for point-interval ambiguity (equality
    tests first, then containment, then meets, then overlap)."""
    if ls == rs and le == re:
        return "equals"
    if ls == rs:
        return "starts" if le < re else "started_by"
    if le == re:
        return "finishes" if ls > rs else "finished_by"
    if ls > rs and le < re:
        return "during"
    if ls < rs and le > re:
        return "contains"
    if le == rs:
        return "meets"
    if re == ls:
        return "met_by"
    return "overlaps" if ls < rs else "overlapped_by"


bound = st.integers(min_value=-100, max_value=100)


@st.composite
def touching_pair(draw):
    ls, le = sorted((draw(bound), draw(bound)))
    rs, re = sorted((draw(bound), draw(bound)))
    # only touching pairs reach the classifier (the overlap join's
    # postcondition): ls <= re and rs <= le
    if not (ls <= re and rs <= le):
        # translate r to touch l deterministically
        shift = ls - re if ls > re else le - rs
        rs, re = rs + shift, re + shift
    return ls, le, rs, re


@given(pair=touching_pair())
@settings(max_examples=500, deadline=None)
def test_case_chain_matches_reference(pair):
    ls, le, rs, re = pair
    assert ls <= re and rs <= le
    got = duckdb.sql(
        f"SELECT {_ALLEN_CASE} FROM (SELECT {ls} AS ls, {le} AS le,"
        f" {rs} AS rs, {re} AS re)"
    ).fetchone()[0]
    assert got == allen_reference(ls, le, rs, re), (pair, got)


@given(pair=touching_pair())
@settings(max_examples=500, deadline=None)
def test_inverse_pairs_swap(pair):
    """classify(l, r) and classify(r, l) are always an inverse pair —
    the algebra's converse law, which precedence bugs break first."""
    inverse = {
        "equals": "equals",
        "starts": "started_by",
        "started_by": "starts",
        "finishes": "finished_by",
        "finished_by": "finishes",
        "during": "contains",
        "contains": "during",
        "meets": "met_by",
        "met_by": "meets",
        "overlaps": "overlapped_by",
        "overlapped_by": "overlaps",
    }
    ls, le, rs, re = pair
    fwd = allen_reference(ls, le, rs, re)
    bwd = allen_reference(rs, re, ls, le)
    assert inverse[fwd] == bwd, (pair, fwd, bwd)
