"""Unit-pin the bench's stage-metrics attribution (bench.py:
_stage_metrics_since): stages are attributed to a query by MONOTONIC
stage id relative to the pre-run snapshot, so UI eviction of old
stages can never corrupt the diff, and the summed REST field names
stay in sync with what the status API actually serves (the live
end-to-end evidence is the bench run itself — BENCH_LOCAL.json
`stage_metrics` with 45/45 queries captured)."""

from __future__ import annotations

import bench


def _fake_stage(stage_id, **kw):
    base = {
        "stageId": stage_id,
        "numTasks": 4,
        "numCompleteTasks": 4,
        "inputBytes": 1_000_000,
        "shuffleWriteBytes": 250_000,
        "shuffleReadBytes": 250_000,
        "memoryBytesSpilled": 0,
        "diskBytesSpilled": 0,
    }
    base.update(kw)
    return base


def test_only_stages_after_snapshot_are_attributed(monkeypatch):
    stages = [
        _fake_stage(3),  # before the snapshot: someone else's work
        _fake_stage(7, inputBytes=2_000_000, diskBytesSpilled=500_000),
        _fake_stage(8, shuffleWriteBytes=750_000),
    ]
    monkeypatch.setattr(bench, "_completed_stages", lambda spark: stages)
    m = bench._stage_metrics_since(None, prev_max_stage_id=3)
    assert m["stages"] == 2 and m["tasks"] == 8
    assert m["input_mb"] == 3.0  # stage 3 excluded
    assert m["shuffle_write_mb"] == 1.0
    assert m["spill_disk_mb"] == 0.5
    assert m["spill_mem_mb"] == 0.0


def test_no_new_stages_yields_none(monkeypatch):
    """A query whose stages were all reused (or a REST hiccup returning
    []) records no metrics rather than zeros-that-look-measured."""
    monkeypatch.setattr(
        bench, "_completed_stages", lambda spark: [_fake_stage(5)]
    )
    assert bench._stage_metrics_since(None, prev_max_stage_id=5) is None
    monkeypatch.setattr(bench, "_completed_stages", lambda spark: [])
    assert bench._stage_metrics_since(None, prev_max_stage_id=-1) is None


def test_max_stage_id_none_when_unreachable(monkeypatch):
    """No completed stages (UI off / REST down) → snapshot is None and
    the headline loop skips capture instead of mis-attributing."""
    monkeypatch.setattr(bench, "_completed_stages", lambda spark: [])
    assert bench._max_stage_id(None) is None
