"""Torn-epoch chaos for the round-12 streaming sinks (entity
resolution, skyline, top-k): kill each sink between the state write
and the pointer commit, assert readers still see the pre-crash state,
heal by at-least-once replay, then REDELIVER the committed epoch —
final state must equal the single clean application (the same contract
the additive maintainers prove in test_maintainer_replay_chaos)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import event_stream_aggr_spark.streaming.state_store as ss
from event_stream_aggr_spark.streaming.state_store import (
    read_append_state,
    read_state,
)


def _run_with_crash(spark, monkeypatch, sink, batches, root, reader=read_state):
    """Epochs 0..n-2 clean; epoch n-1 crashes at the pointer swap,
    pre-image must survive, replay heals, redelivery is a no-op.
    Returns the final state rows (sorted tuples). ``reader`` is the
    store's resolve function (read_state for merge-protocol sinks,
    read_append_state for the ER registry's append protocol)."""
    last = len(batches) - 1
    for i, b in enumerate(batches[:-1]):
        sink(b, i)
    pre_image = sorted(map(tuple, reader(spark, root)[0].collect()))

    def crash_at_commit(spark_, root_, epoch_):
        raise OSError("simulated kill between write and commit")

    monkeypatch.setattr(ss, "_commit", crash_at_commit)
    with pytest.raises(OSError, match="simulated kill"):
        sink(batches[last], last)
    monkeypatch.undo()
    # torn epoch: pointer still on the old version — readers see the
    # pre-crash state, not the orphaned new file
    assert sorted(map(tuple, reader(spark, root)[0].collect())) == (
        pre_image
    )
    sink(batches[last], last)  # at-least-once replay heals
    healed = sorted(map(tuple, reader(spark, root)[0].collect()))
    sink(batches[last], last)  # post-commit redelivery: no-op
    assert sorted(map(tuple, reader(spark, root)[0].collect())) == healed
    return healed


def test_entity_resolution_sink_torn_epoch(spark, tmp_path, monkeypatch):
    from event_stream_aggr_spark.streaming.linkage import (
        entity_resolution_sink,
        link_batch,
    )

    schema = "rec_id long, name string, seg string, bal double, nation int"
    b0 = spark.createDataFrame([(1, "Acme", "AUTO", 100.0, 7)], schema)
    b1 = spark.createDataFrame(
        [(2, "Acme", "AUTO", 900.0, 7), (3, "Bolt", "RETAIL", 5.0, 3)],
        schema,
    )
    root, out = str(tmp_path / "state"), str(tmp_path / "out")
    healed = _run_with_crash(
        spark, monkeypatch, entity_resolution_sink(root, out), [b0, b1],
        root, reader=read_append_state,
    )
    # registry equals the clean run's canonicals: 1 (Acme) and 3 (Bolt)
    assert {r[0] for r in healed} == {1, 3}
    # the torn epoch's OUTPUT dir was written before the crash and
    # rewritten on replay (overwrite) — assignments are the clean set
    a = {
        r.rec_id: (r.entity_id, r.is_new)
        for r in spark.read.parquet(f"{out}/epoch=*").collect()
    }
    assert a == {1: (1, True), 2: (1, False), 3: (3, True)}
    # and equal the one-shot batch kernel over the same arrivals
    clean = {
        r["rec_id"]: (r["entity_id"], r["is_new"])
        for r in link_batch(
            b0, None
        ).collect()
    }
    assert a[1] == clean[1]


def test_skyline_sink_torn_epoch(spark, tmp_path, monkeypatch):
    from event_stream_aggr_spark.streaming.skyline import (
        frontier_sweep,
        skyline_sink,
    )

    schema = "p_brand string, p_retailprice double, p_size int"
    all_rows = [
        ("B1", 10.0, 5), ("B1", 12.0, 7), ("B1", 11.0, 6), ("B1", 9.0, 4)
    ]
    b0 = spark.createDataFrame(all_rows[:2], schema)
    b1 = spark.createDataFrame(all_rows[2:], schema)
    root = str(tmp_path / "state")
    healed = _run_with_crash(
        spark, monkeypatch, skyline_sink(root), [b0, b1], root
    )
    pts = spark.createDataFrame(all_rows, schema).groupBy(
        "p_brand", F.col("p_retailprice").alias("price"), "p_size"
    ).agg(F.count(F.lit(1)).alias("n_parts"))
    batch = sorted(map(tuple, frontier_sweep(pts).collect()))
    assert healed == batch


def test_topk_sink_torn_epoch(spark, tmp_path, monkeypatch):
    from event_stream_aggr_spark.operators.incremental import topk_prune
    from event_stream_aggr_spark.streaming.topk import topk_sink

    schema = "o_orderpriority string, o_orderkey long, price double"
    rows = [("P", i, float((i * 31) % 70)) for i in range(1, 13)]

    def df(chunk):
        return spark.createDataFrame(chunk, schema).withColumn(
            "price", F.col("price").cast("decimal(18,2)")
        )

    root = str(tmp_path / "state")
    healed = _run_with_crash(
        spark, monkeypatch, topk_sink(root), [df(rows[:6]), df(rows[6:])], root
    )
    onepass = sorted(
        map(tuple, topk_prune(df(rows), ["o_orderpriority"]).collect())
    )
    assert healed == onepass


# ---------------------------------------------------------------------------
# Null contracts (the round-11 "silent drop" ADVICE class, pre-empted)
# ---------------------------------------------------------------------------


def test_er_gate_admits_null_field_records_as_new_entities(spark):
    """A record with NULL compare fields can match nothing (equality
    blocking drops nulls) — it must still be ADMITTED as its own
    entity, never silently dropped from the assignment output."""
    from event_stream_aggr_spark.streaming.linkage import link_batch

    recs = spark.createDataFrame(
        [
            (1, "Acme", "AUTO", 100.0, 7),
            (2, None, None, None, None),
            (3, "Acme", "AUTO", 101.0, 7),
        ],
        "rec_id long, name string, seg string, bal double, nation int",
    )
    out = {
        r.rec_id: (r.entity_id, r.is_new)
        for r in link_batch(recs, None).collect()
    }
    assert out == {1: (1, True), 2: (2, True), 3: (1, False)}


def test_skyline_null_coordinate_points_excluded_symmetrically(spark, tmp_path):
    """Pre-fix, a null-SIZE point was dropped silently while a
    null-PRICE point rode nulls-first ordering into state. The
    contract: BOTH are excluded at intake, explicitly."""
    from event_stream_aggr_spark.streaming.skyline import skyline_sink

    df = spark.createDataFrame(
        [("B", 10.0, 5), ("B", None, 7), ("B", 9.0, None)],
        "p_brand string, p_retailprice double, p_size int",
    )
    root = str(tmp_path / "state")
    skyline_sink(root)(df, 0)
    state = sorted(map(tuple, read_state(spark, root)[0].collect()))
    assert state == [("B", 10.0, 5, 1)]


def test_topk_null_prices_rank_last_and_get_displaced(spark, tmp_path):
    from event_stream_aggr_spark.streaming.topk import topk_sink

    schema = "o_orderpriority string, o_orderkey long, price double"

    def df(rows):
        return spark.createDataFrame(rows, schema).withColumn(
            "price", F.col("price").cast("decimal(18,2)")
        )

    root = str(tmp_path / "state")
    sink = topk_sink(root)
    # underfull group: a null-priced row may hold a seat...
    sink(df([("P", 1, 10.0), ("P", 2, None)]), 0)
    s0 = sorted(map(tuple, read_state(spark, root)[0].collect()))
    assert ("P", 2, None) in s0
    # ...until ranked rows displace it
    sink(df([("P", 3, 30.0), ("P", 4, 20.0)]), 1)
    s1 = sorted(map(tuple, read_state(spark, root)[0].collect()))
    assert all(r[2] is not None for r in s1)
    assert {r[1] for r in s1} == {1, 3, 4}
