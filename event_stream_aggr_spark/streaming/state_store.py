"""Versioned merge-state store for foreachBatch maintainers of
ADDITIVE monoid state (count-min cells, KMV sketches, inverted-index
postings, maintained join views, bucket histograms).

Why ``snapshot_upsert_sink`` (upsert.py) is not enough here: its merge
(latest-wins max per key) is IDEMPOTENT, so re-folding an already-
committed batch is harmless and it can safely read whatever state is
current. Additive merges are not idempotent — redelivering a committed
epoch would double-count — so this store adds the two missing pieces:

1. **Epoch gating**: the ``_LATEST`` pointer encodes the last
   committed epoch (``v{epoch}``); an arriving batch with
   ``epoch_id <= committed`` is skipped outright. Structured
   Streaming's foreachBatch redelivers with the SAME batch_id after a
   restart (the reference's model is the same: process, then commit
   the consumer offset — reference internal/app/app.go:220 — so
   everything after the last commit is redelivered), which makes this
   check exact, not heuristic.
2. **Pre-image reads**: a new epoch merges into the state AS OF THE
   POINTER, writing version ``v{epoch}`` while reading ``v{prev}`` —
   never read-modify-overwriting one directory. A crash anywhere
   between the merge write and the pointer swap leaves the pointer on
   the pre-image; the replayed epoch recomputes ``v{epoch}``
   deterministically and completes the swap. Readers resolve the
   pointer first and never observe a torn version.

Together: at-least-once delivery + (epoch gate, pre-image merge,
atomic pointer swap) = effectively-once state, chaos-tested in
tests/test_maintainer_replay_chaos.py (kill between merge and commit;
restart; redeliver after commit).

Scale: each epoch writes only the (sketch-sized / group-grain) state
relation, reading the previous version directly — no driver-side
staging, no lineage into the directory being overwritten (the version
dirs are distinct). At 100 TB the version write is bucketed by the
state key and old versions are vacuumed by retention, exactly like a
lakehouse table's commit log.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_POINTER = "_LATEST"


def read_state(spark: SparkSession, root: str) -> tuple[DataFrame | None, int]:
    """Resolve the committed state: (DataFrame, epoch), or (None, -1)
    when no epoch has ever committed. Readers never see a version
    whose pointer swap did not complete."""
    ptr = os.path.join(root, _POINTER)
    if not os.path.exists(ptr):
        return None, -1
    with open(ptr) as f:
        version = f.read().strip()
    epoch = int(version[1:])
    return spark.read.parquet(os.path.join(root, version)), epoch


def merge_state_sink(
    root: str,
    step: Callable[[DataFrame | None, DataFrame], DataFrame],
) -> Callable[[DataFrame, int], None]:
    """A ``foreachBatch`` function maintaining monoid state at
    ``root``. ``step(state_or_none, batch_df)`` returns the NEW full
    state (e.g. ``cms_merge(state, cms_build(batch))``); it receives
    ``None`` on the first epoch. Use:

        stream.writeStream.foreachBatch(
            merge_state_sink(root, lambda s, b:
                cms_build(b) if s is None else cms_merge(s, cms_build(b)))
        ).option("checkpointLocation", ckpt).start()
    """
    os.makedirs(root, exist_ok=True)

    def apply(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        state, committed = read_state(spark, root)
        if epoch_id <= committed:
            # post-commit redelivery: this epoch is already folded in;
            # merging again would double-count an additive monoid
            return
        new_state = step(state, batch)
        vdir = f"v{epoch_id}"
        new_state.write.mode("overwrite").parquet(os.path.join(root, vdir))
        tmp = os.path.join(root, _POINTER + ".tmp")
        with open(tmp, "w") as f:
            f.write(vdir)
        os.replace(tmp, os.path.join(root, _POINTER))

    return apply
