"""Semantic pins for the round-12 governance/temporal operators that
go beyond the driver's oracle compare: the bitemporal distinction
itself (qv05), ladder minimality (qa11), and a Hypothesis guard on the
linkage blocking's recall contract."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def specs():
    from event_stream_aggr_spark.plans.registry import load_all

    return load_all()


# ---------------------------------------------------------------------------
# qv05: the bitemporal distinction, probed at coordinates the
# registered query doesn't use
# ---------------------------------------------------------------------------


def _snap(spark, tx, v):
    from event_stream_aggr_spark.operators.versioning import (
        bitemporal_snapshot,
    )

    rows = bitemporal_snapshot(spark, SF, tx, v).collect()
    return {
        r["o_orderpriority"]: (r["n_orders"], r["n_corrected"]) for r in rows
    }


def test_correction_invisible_before_its_transaction_time(spark):
    """Same VALID time V, two TRANSACTION times around the 30-day
    correction lag: at TX = V the corrections for orders booked in the
    30 days before V are not yet recorded, so n_corrected must be
    strictly smaller than at TX = V + 40 days — while the order SET
    (validity covers V, initial rows all booked by V) is identical.
    That set-equality with count-inequality IS the bitemporal
    distinction; a single-axis (valid-time-only) view could never show
    it."""
    v = "1998-06-01 00:00:00"
    early = _snap(spark, "1998-06-01 00:00:00", v)
    late = _snap(spark, "1998-07-11 00:00:00", v)
    assert set(early) == set(late)
    assert all(early[k][0] == late[k][0] for k in early)  # same orders
    assert sum(c for _, c in early.values()) < sum(
        c for _, c in late.values()
    )


def test_validity_window_bounds_the_snapshot(spark):
    """With TX far in the future (everything recorded), a V before any
    order's valid_from yields an empty snapshot, and a V more than
    VALID_DAYS after the last order date yields empty too."""
    far_tx = "2005-01-01 00:00:00"
    assert _snap(spark, far_tx, "1990-01-01 00:00:00") == {}
    assert _snap(spark, far_tx, "2002-06-01 00:00:00") == {}


def test_transaction_time_monotonicity(spark):
    """Fixing V and moving TX forward can only ADD corrections, never
    remove orders: believed rows are monotone in recorded knowledge."""
    v = "1998-06-01 00:00:00"
    txs = ["1998-06-01 00:00:00", "1998-06-20 00:00:00", "1998-07-11 00:00:00"]
    snaps = [_snap(spark, tx, v) for tx in txs]
    for a, b in zip(snaps, snaps[1:]):
        assert set(a) == set(b)
        for k in a:
            assert a[k][0] == b[k][0]
            assert a[k][1] <= b[k][1]


# ---------------------------------------------------------------------------
# qa11: ladder minimality
# ---------------------------------------------------------------------------


def test_generalization_ladder_is_minimal(spark, specs):
    from event_stream_aggr_spark.operators.maintenance import K_ANON
    from event_stream_aggr_spark.tables import load_table

    rows = {
        r["nation_key"]: r
        for r in specs["qa11_generalization_ladder"].fn(spark, SF).collect()
    }
    c = load_table(spark, SF, "customer")

    def min_k(level_cols, nation):
        cls = (
            c.filter(F.col("c_nationkey") == nation)
            .groupBy(*level_cols)
            .count()
        )
        return cls.agg(F.min("count")).collect()[0][0]

    levels = {
        0: ["c_mktsegment", F.floor(F.col("c_acctbal") / 1000)],
        1: ["c_mktsegment"],
        2: [F.lit(1)],
    }
    for nation, r in list(rows.items())[:5]:  # spot-check 5 nations
        lvl = r["chosen_level"]
        assert min_k(levels[lvl], nation) >= K_ANON
        # minimality: every coarser-than-needed level below fails
        for below in range(lvl):
            assert min_k(levels[below], nation) < K_ANON


# ---------------------------------------------------------------------------
# linkage blocking recall: a Hypothesis contract
# ---------------------------------------------------------------------------


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    perturb=st.lists(
        st.sampled_from(["same", "seg", "name", "bal_small"]),
        min_size=1,
        max_size=12,
    )
)
def test_blocking_recall_contract(spark, perturb):
    """For ANY record whose twin keeps either its exact name or its
    (nation, balance-band) pair, blocking MUST produce the candidate
    pair (no block here approaches the purge cap). 'name' perturbation
    keeps the balance, 'bal_small' keeps the name — so every generated
    twin is recoverable by at least one pass."""
    from event_stream_aggr_spark.operators.linkage import scored_pairs

    a_rows, b_rows = [], []
    for i, kind in enumerate(perturb):
        name, seg, bal, nation = f"N{i}", "S1", 100.0 + 7 * i, i % 3
        a_rows.append((i, name, seg, bal, nation))
        if kind == "seg":
            b_rows.append((1000 + i, name, "S2", bal, nation))
        elif kind == "name":
            b_rows.append((1000 + i, "X" + name, seg, bal, nation))
        elif kind == "bal_small":
            b_rows.append((1000 + i, name, seg, bal + 3.0, nation))
        else:
            b_rows.append((1000 + i, name, seg, bal, nation))
    a = spark.createDataFrame(
        a_rows,
        "a_id long, a_name string, a_seg string, a_bal double, a_nation int",
    ).withColumn("a_bal", F.col("a_bal").cast("decimal(12,2)"))
    b = spark.createDataFrame(
        b_rows,
        "b_id long, b_name string, b_seg string, b_bal double, b_nation int",
    ).withColumn("b_bal", F.col("b_bal").cast("decimal(13,2)"))
    pairs = {(r["a_id"], r["b_id"]) for r in scored_pairs(a, b).collect()}
    for i in range(len(perturb)):
        assert (i, 1000 + i) in pairs
