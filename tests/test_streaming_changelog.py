"""Streaming CDC changelog sink (round 12): deletes via retained
tombstones, folded over micro-batches through the shared versioned
merge store.

Pins the module contract (streaming/changelog.py):
1. one epoch == the qv04 batch kernel (changelog_snapshot + live_view);
2. cross-epoch: a later DELETE kills a previously-admitted key, a
   later UPDATE replaces its value;
3. the resurrection guard — a STALE insert (lower seq) replayed in a
   LATER epoch cannot revive a tombstoned key, because the tombstone
   row is retained in state and wins latest-per-key;
4. merge-order independence: any batching of the same change set
   yields the same live view;
5. the store-protocol inheritance: post-commit redelivery is a no-op,
   an epoch id below the committed one raises.
"""

from __future__ import annotations

from decimal import Decimal

import pytest

from event_stream_aggr_spark.streaming.changelog import (
    changelog_sink,
    changelog_snapshot,
    live_view,
)
from event_stream_aggr_spark.streaming.state_store import read_state

_SCHEMA = "order_id long, seq long, op string, val decimal(18,2)"


def _changes(spark, rows):
    return spark.createDataFrame(
        [(k, s, op, Decimal(v)) for k, s, op, v in rows], _SCHEMA
    )


def _live(spark, root):
    state, _ = read_state(spark, root)
    return {
        r.order_id: (r.op, str(r.val))
        for r in live_view(state).collect()
    }


def test_single_epoch_equals_batch_kernel(spark, tmp_path):
    rows = [
        (1, 1, "I", "10.00"),
        (2, 1, "I", "20.00"),
        (2, 2, "U", "25.00"),
        (3, 1, "I", "30.00"),
        (3, 2, "D", "30.00"),
    ]
    root = str(tmp_path / "state")
    changelog_sink(root, ["order_id"], ["seq"])(_changes(spark, rows), 0)
    got = _live(spark, root)
    kernel = {
        r.order_id: (r.op, str(r.val))
        for r in live_view(
            changelog_snapshot(_changes(spark, rows), ["order_id"], ["seq"])
        ).collect()
    }
    assert got == kernel == {1: ("I", "10.00"), 2: ("U", "25.00")}


def test_cross_epoch_delete_and_update(spark, tmp_path):
    root = str(tmp_path / "state")
    sink = changelog_sink(root, ["order_id"], ["seq"])
    sink(_changes(spark, [(1, 1, "I", "10.00"), (2, 1, "I", "20.00")]), 0)
    assert set(_live(spark, root)) == {1, 2}
    # epoch 1: delete 1, update 2
    sink(_changes(spark, [(1, 2, "D", "10.00"), (2, 2, "U", "22.00")]), 1)
    assert _live(spark, root) == {2: ("U", "22.00")}
    # the tombstone row is retained in raw state (qv03's purge input)
    state, committed = read_state(spark, root)
    assert committed == 1
    ops = {r.order_id: r.op for r in state.collect()}
    assert ops[1] == "D"


def test_stale_insert_cannot_resurrect_tombstoned_key(spark, tmp_path):
    root = str(tmp_path / "state")
    sink = changelog_sink(root, ["order_id"], ["seq"])
    # epoch 0 delivers the delete (seq 3); the at-least-once source
    # then replays the ORIGINAL insert (seq 1) in a later epoch
    sink(_changes(spark, [(7, 3, "D", "70.00")]), 0)
    sink(_changes(spark, [(7, 1, "I", "70.00")]), 1)
    assert _live(spark, root) == {}
    state, _ = read_state(spark, root)
    assert {(r.order_id, r.op) for r in state.collect()} == {(7, "D")}


def test_merge_order_independence(spark, tmp_path):
    rows = [
        (1, 1, "I", "10.00"),
        (1, 2, "U", "11.00"),
        (2, 1, "I", "20.00"),
        (2, 2, "D", "20.00"),
        (3, 1, "I", "30.00"),
    ]
    one_root = str(tmp_path / "one")
    changelog_sink(one_root, ["order_id"], ["seq"])(_changes(spark, rows), 0)
    # same set, batched out of order (updates/deletes arrive first)
    two_root = str(tmp_path / "two")
    sink = changelog_sink(two_root, ["order_id"], ["seq"])
    sink(_changes(spark, rows[1::2]), 0)
    sink(_changes(spark, rows[0::2]), 1)
    assert _live(spark, one_root) == _live(spark, two_root) == {
        1: ("U", "11.00"),
        3: ("I", "30.00"),
    }


def test_redelivery_noop_and_stale_checkpoint_raises(spark, tmp_path):
    root = str(tmp_path / "state")
    sink = changelog_sink(root, ["order_id"], ["seq"])
    sink(_changes(spark, [(1, 1, "I", "10.00")]), 0)
    sink(_changes(spark, [(2, 1, "I", "20.00")]), 1)
    before = _live(spark, root)
    sink(_changes(spark, [(2, 1, "I", "20.00")]), 1)  # redelivery
    assert _live(spark, root) == before
    with pytest.raises(ValueError, match="below"):
        sink(_changes(spark, [(9, 1, "I", "90.00")]), 0)


def test_end_to_end_stream_matches_hand_driven(spark, tmp_path):
    from event_stream_aggr_spark.sources.files import stream_parquet_dir

    rows = [
        (1, 1, "I", "10.00"),
        (2, 1, "I", "20.00"),
        (1, 2, "U", "12.00"),
        (2, 2, "D", "20.00"),
        (3, 1, "I", "30.00"),
    ]
    src = str(tmp_path / "src")
    df = _changes(spark, rows)
    df.repartition(2).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema

    root = str(tmp_path / "state")
    q = (
        stream_parquet_dir(spark, src, schema, max_files_per_trigger=1)
        .writeStream.foreachBatch(changelog_sink(root, ["order_id"], ["seq"]))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert _live(spark, root) == {1: ("U", "12.00"), 3: ("I", "30.00")}


def test_retraction_rollup_sink_matches_one_pass_signed_aggregate(
    spark, tmp_path
):
    """qi05's streaming twin: fold signed CDC batches (deletes arrive
    an epoch after their inserts) and the finalized state equals the
    one-pass signed aggregate over the whole change set; redelivery
    of a committed epoch does not double-count."""
    from event_stream_aggr_spark.operators.incremental import (
        finalize_signed,
        signed_partial,
    )
    from event_stream_aggr_spark.streaming.changelog import (
        retraction_rollup_sink,
    )

    def chg(rows):
        return spark.createDataFrame(
            [(k, w, Decimal(v)) for k, w, v in rows],
            "k string, w long, v decimal(18,2)",
        )

    batches = [
        [("a", 1, "10.00"), ("a", 1, "15.00"), ("b", 1, "20.00")],
        [("a", -1, "10.00"), ("c", 1, "30.00")],   # cross-epoch delete
        [("b", -1, "20.00")],                      # fully retracts b
    ]
    root = str(tmp_path / "state")
    sink = retraction_rollup_sink(root, ["k"])
    for i, rows in enumerate(batches):
        sink(chg(rows), i)
    sink(chg(batches[2]), 2)  # redelivery: must not double-retract

    state, committed = read_state(spark, root)
    assert committed == 2
    got = {
        r.k: (r.n_live, str(r.total_price))
        for r in finalize_signed(state, ["k"]).collect()
    }
    one_pass = {
        r.k: (r.n_live, str(r.total_price))
        for r in finalize_signed(
            signed_partial(chg([x for b in batches for x in b]), ["k"]), ["k"]
        ).collect()
    }
    assert got == one_pass == {"a": (1, "15.0"), "c": (1, "30.0")}
    # b is retained at n=0 in raw state (mergeable), hidden at read
    assert {r.k for r in state.collect()} == {"a", "b", "c"}


def test_streaming_cms_retraction_matches_batch_net_sketch(spark, tmp_path):
    """qh06's streaming story: the CMS maintainer (merge_state_sink,
    unchanged) absorbs a DELETE batch as a negated cms_build — the
    folded store equals the batch net sketch cell-for-cell, and point
    estimates through it never underestimate the LIVE counts."""
    from pyspark.sql import functions as F

    from event_stream_aggr_spark.operators.sketch import (
        cms_build,
        cms_estimate,
        cms_merge,
    )
    from event_stream_aggr_spark.streaming.state_store import (
        merge_state_sink,
        read_state,
    )

    def keys(vals):
        return spark.createDataFrame([(v,) for v in vals], "k long")

    inserts = keys([1, 1, 1, 2, 2, 3])
    deletes = keys([1, 3])  # retract one of key 1's, key 3 entirely

    def step(state, batch):
        # batch carries a signed weight column; negate delete cells
        built = cms_build(batch.select("k"), "k")
        w = batch.select(F.first("w")).first()[0]
        if w < 0:
            built = built.withColumn("c", -F.col("c"))
        return built if state is None else cms_merge(state, built)

    root = str(tmp_path / "state")
    sink = merge_state_sink(root, step)
    sink(inserts.withColumn("w", F.lit(1)), 0)
    sink(deletes.withColumn("w", F.lit(-1)), 1)

    streamed, _ = read_state(spark, root)
    batch_net = cms_merge(
        cms_build(inserts, "k"),
        cms_build(deletes, "k").withColumn("c", -F.col("c")),
    )
    assert sorted(map(tuple, streamed.collect())) == sorted(
        map(tuple, batch_net.collect())
    )
    live = {1: 2, 2: 2, 3: 0}
    est = {
        r.k: r.cms_n
        for r in cms_estimate(keys(live), "k", streamed).collect()
    }
    for k, n in live.items():
        assert est[k] >= n, (k, est[k], n)
