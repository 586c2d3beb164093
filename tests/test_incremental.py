"""Incremental rollup maintenance (operators/incremental.py): the
monoid laws the IVM design rests on — merge(state(A), state(B)) must
equal state(A ∪ B) exactly, for any split and any merge order."""

from __future__ import annotations

from pyspark.sql import functions as F

from event_stream_aggr_spark.operators.incremental import (
    finalize_rollup,
    merge_rollups,
    partial_rollup,
)
from event_stream_aggr_spark.tables import load_table


def _canon(df):
    return sorted(tuple(r) for r in finalize_rollup(df).collect())


def test_merge_equals_full_rescan_any_split_any_order(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    full = partial_rollup(e)
    # arbitrary 3-way content split (not time-aligned: every state
    # shares groups with every other, so merging is exercised for real)
    parts = [partial_rollup(e.where(F.col("event_id") % 3 == i)) for i in range(3)]
    merged_lr = merge_rollups(parts[0], parts[1], parts[2])
    merged_rl = merge_rollups(merge_rollups(parts[2], parts[1]), parts[0])
    want = _canon(full)
    assert _canon(merged_lr) == want  # split-invariant
    assert _canon(merged_rl) == want  # order/associativity-invariant


def test_merge_is_idempotent_grain(spark, sf_dir):
    # merging a state with an EMPTY state is the identity — the
    # no-new-data refresh must not perturb stored values
    e = load_table(spark, sf_dir, "events")
    state = partial_rollup(e)
    empty = partial_rollup(e.where(F.lit(False)))
    assert _canon(merge_rollups(state, empty)) == _canon(state)


def test_delta_refresh_only_scans_delta(spark, sf_dir):
    # the delta partial's scan must carry the day filter down to the
    # parquet read — the whole point of IVM is not re-reading history
    from event_stream_aggr_spark.operators.incremental import DELTA_CUT_DAY

    e = load_table(spark, sf_dir, "events")
    day = F.date_format("ts", "yyyy-MM-dd")
    delta = partial_rollup(e.where(day >= DELTA_CUT_DAY))
    plan = delta._jdf.queryExecution().executedPlan().toString()
    # the filter exists pre-scan (date_format over ts is not pushable
    # as a parquet predicate, but it must run before the aggregate and
    # prune rows, and only (event_type, ts, value) columns are read)
    read_schema = plan.split("ReadSchema:", 1)[1].splitlines()[0]
    assert "event_id" not in read_schema and "props" not in read_schema
    assert "Filter" in plan


def test_hll_sketch_union_matches_global_sketch(spark, sf_dir):
    # the sketch monoid claim behind qi02: union of per-split sketches
    # estimates EXACTLY what a single global sketch does (Datasketches
    # HLL is deterministic and merge-invariant, not just approximate)
    from pyspark.sql import functions as F

    e = load_table(spark, sf_dir, "events")
    global_est = {
        r.event_type: r.est
        for r in e.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est"))
        .collect()
    }
    parts = [
        e.where(F.col("event_id") % 3 == i)
        .groupBy("event_type")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        for i in range(3)
    ]
    merged = (
        parts[0]
        .unionByName(parts[1])
        .unionByName(parts[2])
        .groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
    )
    merged_est = {r.event_type: r.est for r in merged.collect()}
    assert merged_est == global_est and len(global_est) > 0


def test_signed_state_full_retraction_and_revival(spark):
    """qi05's retraction contract at the helper grain: a fully
    retracted group reaches n=0 and vanishes from the FINALIZED view
    but stays mergeable — a later re-insert revives it with fresh
    (not stale) sums; and the fold is batch-order independent."""
    from decimal import Decimal

    from event_stream_aggr_spark.operators.incremental import (
        finalize_signed,
        merge_signed,
        signed_partial,
    )

    def chg(rows):
        return spark.createDataFrame(
            [(k, w, Decimal(v)) for k, w, v in rows],
            "k string, w long, v decimal(18,2)",
        )

    keys = ["k"]
    e0 = signed_partial(chg([("a", 1, "10.00"), ("b", 1, "20.00")]), keys)
    e1 = signed_partial(chg([("a", -1, "10.00")]), keys)  # full retraction
    e2 = signed_partial(chg([("a", 1, "99.00")]), keys)  # revival

    s1 = merge_signed(e0, e1, keys)
    live1 = {r.k: (r.n_live, str(r.total_price)) for r in finalize_signed(s1, keys).collect()}
    assert live1 == {"b": (1, "20.0")}
    # the n=0 group is retained in state (mergeable), hidden at read
    assert {r.k for r in s1.collect()} == {"a", "b"}

    s2 = merge_signed(s1, e2, keys)
    live2 = {r.k: (r.n_live, str(r.total_price)) for r in finalize_signed(s2, keys).collect()}
    assert live2 == {"a": (1, "99.0"), "b": (1, "20.0")}

    # batch-order independence: folding e2 before e1 ends identically
    alt = merge_signed(merge_signed(e0, e2, keys), e1, keys)
    alt_live = {r.k: (r.n_live, str(r.total_price)) for r in finalize_signed(alt, keys).collect()}
    assert alt_live == live2


def test_signed_state_split_invariance_property(spark):
    """Hypothesis guard for qi05's monoid law: for ANY signed change
    set and ANY split into epochs, folding the epochs equals the
    one-pass aggregate — including chains that dip a group negative
    mid-fold (a delete folded before its insert) and recover."""
    from decimal import Decimal

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from event_stream_aggr_spark.operators.incremental import (
        finalize_signed,
        merge_signed,
        signed_partial,
    )

    rows_st = st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),
            st.sampled_from([1, -1]),
            st.integers(min_value=0, max_value=999),
        ),
        min_size=1,
        max_size=12,
    )

    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(rows=rows_st, cut=st.integers(min_value=0, max_value=12))
    def run(rows, cut):
        cut = min(cut, len(rows))

        def chg(rs):
            return spark.createDataFrame(
                [(k, w, Decimal(v) / 4) for k, w, v in rs],
                "k string, w long, v decimal(18,2)",
            )

        keys = ["k"]
        one_pass = signed_partial(chg(rows), keys)
        if cut in (0, len(rows)):
            folded = one_pass
        else:
            folded = merge_signed(
                signed_partial(chg(rows[:cut]), keys),
                signed_partial(chg(rows[cut:]), keys),
                keys,
            )
        as_dict = lambda df: {  # noqa: E731
            r.k: (r.n_live, str(r.total_price))
            for r in finalize_signed(df, keys).collect()
        }
        assert as_dict(folded) == as_dict(one_pass)

    run()


def test_topk_state_is_merge_closed_and_displacement_safe(spark):
    """qi07's monotone-prune argument on a hand corpus: an early
    epoch's leader is displaced by a later epoch's arrival, and the
    folded state still equals the one-pass top-k — pruning to k rows
    per group between epochs lost nothing."""
    from pyspark.sql import functions as F

    from event_stream_aggr_spark.operators.incremental import (
        TOPK_K,
        topk_prune,
    )

    rows = [
        # epoch 1: leaders 100, 90, 80 (40, 30 pruned)
        ("P", 1, 100.0), ("P", 2, 90.0), ("P", 3, 80.0),
        ("P", 4, 40.0), ("P", 5, 30.0),
        # epoch 2: 95 displaces 80; 85 displaces nothing after that
        ("P", 6, 95.0), ("P", 7, 85.0),
    ]
    df = spark.createDataFrame(
        rows, "o_orderpriority string, o_orderkey long, price double"
    ).withColumn("price", F.col("price").cast("decimal(18,2)"))
    keys = ["o_orderpriority"]
    e1 = topk_prune(df.filter("o_orderkey <= 5"), keys)
    e2 = topk_prune(df.filter("o_orderkey > 5"), keys)
    folded = sorted(
        map(tuple, topk_prune(e1.unionByName(e2), keys).collect())
    )
    onepass = sorted(map(tuple, topk_prune(df, keys).collect()))
    assert folded == onepass
    assert len(folded) == TOPK_K
    assert {r[1] for r in folded} == {1, 6, 2}  # 100, 95, 90
