"""The append-only state-store protocol (round 14): delta-per-epoch
writes + periodic compaction + pre-image vacuum, shared by the ER
registry (streaming/linkage.py) and the near-dedup band store
(streaming/near_dedup.py). The merge protocol's guarantees — epoch
gating, pre-image reads, atomic marker commit — are inherited; these
tests pin what the append variant ADDS:

- per-epoch writes are deltas sized by the batch, not the store;
- a compaction snapshot absorbs the deltas every ``compact_every``
  epochs and vacuum drops the absorbed parts, so the committed read
  set (and on-disk part count) stays bounded for an unbounded stream;
- empty appends write nothing but still commit the epoch;
- a crash between write and marker leaves readers on the pre-image
  and replay heals deterministically (the chaos matrix's shape).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

import event_stream_aggr_spark.streaming.state_store as ss
from event_stream_aggr_spark.streaming.state_store import (
    append_commit,
    read_append_state,
)


def _rows(spark, ids):
    return spark.createDataFrame(
        [(int(i), f"p{i}") for i in ids], "k long, payload string"
    )


def _store_parts(root):
    names = sorted(os.listdir(root))
    return (
        [n for n in names if n.startswith("v") and n[1:].isdigit()],
        [n for n in names if n.startswith("d") and n[1:].isdigit()],
    )


def _state_ids(spark, root):
    df, epoch = read_append_state(spark, root)
    return (sorted(r.k for r in df.collect()) if df is not None else []), epoch


def test_append_deltas_then_compaction_bounds_parts(spark, tmp_path):
    root = str(tmp_path / "store")
    committed = -1
    for e in range(10):  # compact_every=3 → snapshots at e=3,7 …
        state, committed = read_append_state(spark, root)
        new = _rows(spark, [e])
        append_commit(
            spark, root, new, e, committed, n_new=1, state=state,
            compact_every=3,
        )
        ids, epoch = _state_ids(spark, root)
        assert epoch == e
        assert ids == list(range(e + 1))  # nothing lost, nothing doubled
    snaps, deltas = _store_parts(root)
    # bounded parts: at most 2 snapshots (current + pre-image side)
    # and at most compact_every live deltas per retained generation
    assert 1 <= len(snaps) <= 2
    assert len(deltas) <= 2 * 3
    # the committed read set is ONE snapshot + its later deltas
    df, epoch = read_append_state(spark, root)
    assert epoch == 9
    assert df.count() == 10


def test_append_empty_epoch_commits_without_files(spark, tmp_path):
    root = str(tmp_path / "store")
    state, committed = read_append_state(spark, root)
    empty = _rows(spark, []).filter("k > 0")
    append_commit(spark, root, empty, 0, committed, n_new=0, state=state)
    df, epoch = read_append_state(spark, root)
    assert epoch == 0 and df is None  # committed-but-empty is visible
    snaps, deltas = _store_parts(root)
    assert snaps == [] and deltas == []
    # a later non-empty epoch proceeds normally on top of it
    state, committed = read_append_state(spark, root)
    append_commit(
        spark, root, _rows(spark, [7]), 1, committed, n_new=1, state=state
    )
    assert _state_ids(spark, root) == ([7], 1)


def test_append_crash_between_write_and_marker_replays(
    spark, tmp_path, monkeypatch
):
    root = str(tmp_path / "store")
    for e in range(2):
        state, committed = read_append_state(spark, root)
        append_commit(
            spark, root, _rows(spark, [e]), e, committed, n_new=1,
            state=state,
        )
    pre_ids, pre_epoch = _state_ids(spark, root)
    assert (pre_ids, pre_epoch) == ([0, 1], 1)

    def crash(spark_, root_, epoch_):
        raise OSError("simulated kill between append and commit")

    monkeypatch.setattr(ss, "_commit", crash)
    state, committed = read_append_state(spark, root)
    with pytest.raises(OSError, match="simulated kill"):
        append_commit(
            spark, root, _rows(spark, [2]), 2, committed, n_new=1,
            state=state,
        )
    monkeypatch.undo()
    # torn epoch: delta exists, readers still on the pre-image
    assert os.path.isdir(os.path.join(root, "d2"))
    assert _state_ids(spark, root) == (pre_ids, pre_epoch)
    # replay heals (overwrite + marker), then the store moves on
    state, committed = read_append_state(spark, root)
    append_commit(
        spark, root, _rows(spark, [2]), 2, committed, n_new=1, state=state
    )
    assert _state_ids(spark, root) == ([0, 1, 2], 2)


def test_append_compaction_crash_preserves_preimage(
    spark, tmp_path, monkeypatch
):
    """Crash exactly at the compaction epoch's marker: the (possibly
    torn) snapshot must stay invisible and replay must both heal and
    vacuum the absorbed deltas."""
    root = str(tmp_path / "store")
    for e in range(3):
        state, committed = read_append_state(spark, root)
        append_commit(
            spark, root, _rows(spark, [e]), e, committed, n_new=1,
            state=state, compact_every=3,
        )

    def crash(spark_, root_, epoch_):
        raise OSError("simulated kill at compaction commit")

    monkeypatch.setattr(ss, "_commit", crash)
    state, committed = read_append_state(spark, root)
    with pytest.raises(OSError, match="simulated kill"):
        append_commit(
            spark, root, _rows(spark, [3]), 3, committed, n_new=1,
            state=state, compact_every=3,
        )
    monkeypatch.undo()
    assert os.path.isdir(os.path.join(root, "v3"))  # torn snapshot
    assert _state_ids(spark, root) == ([0, 1, 2], 2)  # invisible
    state, committed = read_append_state(spark, root)
    append_commit(
        spark, root, _rows(spark, [3]), 3, committed, n_new=1,
        state=state, compact_every=3,
    )
    assert _state_ids(spark, root) == ([0, 1, 2, 3], 3)
    # absorbed deltas below the retained pre-image are vacuumed by
    # the NEXT commit (vacuum keeps one generation back)
    state, committed = read_append_state(spark, root)
    append_commit(
        spark, root, _rows(spark, [4]), 4, committed, n_new=1,
        state=state, compact_every=3,
    )
    snaps, deltas = _store_parts(root)
    assert "v3" in snaps
    assert all(int(d[1:]) > 3 for d in deltas), (snaps, deltas)


def test_append_fresh_checkpoint_regression_still_raises(spark, tmp_path):
    """The epoch gate is enforced by the SINKS (linkage/near_dedup),
    not append_commit itself — pin it end-to-end through the ER sink:
    a fresh checkpoint's epoch 0 against a store committed at 2 must
    raise, not silently relink."""
    from event_stream_aggr_spark.streaming.linkage import (
        entity_resolution_sink,
    )

    root = str(tmp_path / "reg")
    out = str(tmp_path / "out")
    batch = spark.createDataFrame(
        [(1, "alice", "SEG", 10.0, 3)],
        "rec_id long, name string, seg string, bal double, nation long",
    )
    sink = entity_resolution_sink(root, out)
    sink(batch, 2)
    with pytest.raises(ValueError, match="below the committed epoch"):
        sink(batch, 0)


def test_er_registry_append_matches_rewrite_semantics(spark, tmp_path):
    """The delta-fold registry must be row-identical to what the old
    rewrite-the-snapshot fold produced: same entities after several
    epochs with cross-epoch links (linked arrivals never append)."""
    from event_stream_aggr_spark.streaming.linkage import (
        entity_resolution_sink,
    )

    root = str(tmp_path / "reg")
    out = str(tmp_path / "out")
    schema = (
        "rec_id long, name string, seg string, bal double, nation long"
    )
    e0 = spark.createDataFrame(
        [(1, "alice", "AUTO", 10.0, 3), (2, "bob", "BIKE", 20.0, 4)], schema
    )
    # rec 3 links to alice (exact compare fields) → no append;
    # rec 4 founds a new entity
    e1 = spark.createDataFrame(
        [(3, "alice", "AUTO", 10.0, 3), (4, "carol", "SHIP", 30.0, 5)],
        schema,
    )
    sink = entity_resolution_sink(root, out)
    sink(e0, 0)
    sink(e1, 1)
    state, epoch = read_append_state(spark, root)
    got = sorted((r.entity_id, r.name) for r in state.collect())
    assert epoch == 1
    assert got == [(1, "alice"), (2, "bob"), (4, "carol")]
    # the linked arrival's assignment points at the registry entity
    asg = spark.read.parquet(f"{out}/epoch=1").collect()
    by_rec = {r.rec_id: (r.entity_id, r.is_new) for r in asg}
    assert by_rec[3] == (1, False) and by_rec[4] == (4, True)


def test_er_sink_cold_restart_resumes_with_fresh_cursor(spark, tmp_path):
    """Round 15 (AppendCursor): a NEW sink closure — the process-
    restart case, cursor cold — must resolve the existing store from
    disk, link against it, skip the redelivered committed epoch, and
    keep appending. Pins that the cursor is cache, not authority."""
    from event_stream_aggr_spark.streaming.linkage import (
        entity_resolution_sink,
    )

    schema = "rec_id long, name string, seg string, bal double, nation long"
    root, out = str(tmp_path / "reg"), str(tmp_path / "out")
    a = entity_resolution_sink(root, out)
    a(spark.createDataFrame([(1, "alice", "AUTO", 10.0, 3)], schema), 0)
    a(spark.createDataFrame([(2, "bob", "BIKE", 20.0, 4)], schema), 1)

    b = entity_resolution_sink(root, out)  # fresh closure, cold cursor
    b(spark.createDataFrame([(2, "bob", "BIKE", 20.0, 4)], schema), 1)
    # redelivery of the committed epoch via the cold cursor: no-op —
    # the registry must NOT have folded bob twice
    state, epoch = read_append_state(spark, root)
    assert epoch == 1
    assert sorted(r.entity_id for r in state.collect()) == [1, 2]
    # rec 3 links to alice across the restart boundary; rec 4 founds
    b(
        spark.createDataFrame(
            [(3, "alice", "AUTO", 10.0, 3), (4, "carol", "SHIP", 30.0, 5)],
            schema,
        ),
        2,
    )
    state, epoch = read_append_state(spark, root)
    assert epoch == 2
    assert sorted((r.entity_id, r.name) for r in state.collect()) == [
        (1, "alice"),
        (2, "bob"),
        (4, "carol"),
    ]
    by_rec = {
        r.rec_id: (r.entity_id, r.is_new)
        for r in spark.read.parquet(f"{out}/epoch=2").collect()
    }
    assert by_rec[3] == (1, False) and by_rec[4] == (4, True)
