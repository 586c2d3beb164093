"""Streaming CDC-upsert sink: stream↔batch equivalence and replay
idempotence. The snapshot maintained incrementally by foreachBatch must
equal the one-shot batch latest-wins merge (q52's shape) regardless of
how the change stream is batched."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from event_stream_aggr_spark.sources.files import stream_parquet_dir
from event_stream_aggr_spark.streaming.upsert import (
    latest_wins,
    read_snapshot,
    snapshot_upsert_sink,
)
from event_stream_aggr_spark.tables import load_table

SF = "/root/testdata/sf0.001"
KEYS = ["user_id"]
ORDER = ["ts", "event_id"]


def _snapshot_rows(df):
    return {
        (r.user_id, r.event_id) for r in df.select("user_id", "event_id").collect()
    }


def test_streamed_snapshot_equals_batch_merge(spark, tmp_path):
    events = load_table(spark, SF, "events")
    src = str(tmp_path / "changes")
    root = str(tmp_path / "snapshot")
    # many small files -> many micro-batches, arrival order not ts order
    events.repartition(8).write.parquet(src)

    stream = stream_parquet_dir(spark, src, events.schema, max_files_per_trigger=2)
    q = (
        stream.writeStream.foreachBatch(snapshot_upsert_sink(root, KEYS, ORDER))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    streamed = read_snapshot(spark, root)
    expected = latest_wins(events, KEYS, ORDER)
    assert _snapshot_rows(streamed) == _snapshot_rows(expected)
    # one row per key, values carried intact
    assert streamed.count() == events.select("user_id").distinct().count()
    joined = streamed.alias("s").join(events.alias("e"), "event_id")
    assert joined.filter(F.col("s.value") != F.col("e.value")).count() == 0


def test_epoch_replay_is_idempotent(spark, tmp_path):
    from event_stream_aggr_spark.streaming.state_store import committed_epoch

    events = load_table(spark, SF, "events").limit(100).cache()
    root = str(tmp_path / "snap")
    sink = snapshot_upsert_sink(root, KEYS, ORDER)
    sink(events, 0)
    once = _snapshot_rows(read_snapshot(spark, root))
    sink(events, 0)  # at-least-once redelivery of the same epoch
    twice = _snapshot_rows(read_snapshot(spark, root))
    events.unpersist()  # a leaked cache entry would substitute an
    # unpruned InMemoryRelation into every later test's events scan
    assert once == twice
    assert committed_epoch(spark, root) == 0


def test_older_change_never_overwrites_newer(spark, tmp_path):
    root = str(tmp_path / "snap2")
    sink = snapshot_upsert_sink(root, KEYS, ORDER)
    events = load_table(spark, SF, "events")
    newest_first = events.orderBy(F.col("ts").desc()).limit(50)
    oldest = events.orderBy(F.col("ts").asc()).limit(50)
    sink(newest_first, 0)
    before = _snapshot_rows(read_snapshot(spark, root))
    sink(oldest, 1)  # late-arriving old data
    after = read_snapshot(spark, root)
    # old rows only ADD keys, never replace a newer row for an existing key
    kept = _snapshot_rows(after) & before
    assert kept == {
        p
        for p in before
        if p[0] in {r.user_id for r in after.select("user_id").collect()}
    } & before
    merged_expected = latest_wins(newest_first.unionByName(oldest), KEYS, ORDER)
    assert _snapshot_rows(after) == _snapshot_rows(merged_expected)


def test_torn_epoch_invisible_to_readers_and_healed_on_replay(spark, tmp_path, monkeypatch):
    """Chaos: kill between the v{epoch} snapshot write and the marker
    commit (since r9 the upsert sink shares state_store's Hadoop-FS
    marker protocol). The torn epoch's directory exists on disk but
    readers must keep resolving the previous committed version;
    replaying the epoch (at-least-once) rewrites the version
    deterministically and completes the commit."""
    import event_stream_aggr_spark.streaming.state_store as ss
    from event_stream_aggr_spark.streaming.state_store import committed_epoch

    root = str(tmp_path / "snap3")
    sink = snapshot_upsert_sink(root, KEYS, ORDER)
    events = load_table(spark, SF, "events").cache()
    first = events.limit(60)
    second = events.limit(120)

    sink(first, 0)  # epoch 0 commits cleanly
    committed = _snapshot_rows(read_snapshot(spark, root))

    def crash_at_commit(spark_, root_, epoch_):
        raise OSError("simulated kill between snapshot write and commit")

    monkeypatch.setattr(ss, "_commit", crash_at_commit)
    import pytest

    with pytest.raises(OSError, match="simulated kill"):
        sink(second, 1)
    monkeypatch.undo()

    # torn state: v1 fully written, commit markers still -> v0
    assert os.path.isdir(os.path.join(root, "v1"))
    assert committed_epoch(spark, root) == 0
    # readers see only the committed epoch
    assert _snapshot_rows(read_snapshot(spark, root)) == committed

    sink(second, 1)  # replay heals: rewrites v1, completes the commit
    events.unpersist()  # see test_epoch_replay_is_idempotent
    assert committed_epoch(spark, root) == 1
    expected = latest_wins(second.unionByName(first), KEYS, ORDER)
    assert _snapshot_rows(read_snapshot(spark, root)) == _snapshot_rows(expected)
