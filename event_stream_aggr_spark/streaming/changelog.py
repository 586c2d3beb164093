"""Streaming CDC changelog sink — upsert WITH deletes (round 12).

``streaming/upsert.py`` maintains a latest-wins snapshot but has no
notion of a DELETE: a Debezium-style change feed (op ∈ I/U/D) pointed
at it would leave cancelled keys alive forever. This module closes
that gap with the standard tombstone discipline:

- the stored state is the latest change PER KEY — *including* delete
  rows. A tombstone must be remembered, not just applied: if deleted
  keys were simply dropped from the snapshot, a replayed or
  out-of-order OLDER insert arriving in a later epoch would resurrect
  the key (the classic CDC resurrection bug — pinned in
  tests/test_streaming_changelog.py). With the tombstone retained,
  latest-wins by ``order_cols`` makes the stale insert lose on merge.
- the LIVE view (``live_view``) filters tombstones out at read time.
- tombstones are garbage, eventually: once no older change for the
  key can still arrive (retention horizon), qv03's tombstone-purge
  pass deletes them — retention policy is deliberately NOT this
  sink's job, exactly as in Kafka compacted topics (delete.retention.
  ms) and Cassandra (gc_grace_seconds).

Epoch/commit discipline is ``merge_state_sink``'s, unchanged: full
new snapshot version per epoch, atomic marker commit, redelivery
no-op, fresh-checkpoint-against-nonempty-store raises.

Merge order independence: the state is a per-key argmax by
``order_cols`` (an associative/commutative maximum) over ALL changes
seen, so the final snapshot — and therefore the live view — is
independent of how the change stream is batched across epochs;
asserted against the batch twin in the test suite.

Scale: each epoch is ONE hash shuffle of snapshot ∪ batch on the key
(row_number over the key-grain window — every partition is one key's
handful of change rows, never history-proportional). At 100 TB the
snapshot is stored bucketed by key so only the small batch side
shuffles and the rewrite is partition-scoped, as in upsert.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from event_stream_aggr_spark.streaming.state_store import merge_state_sink
from event_stream_aggr_spark.streaming.upsert import latest_wins


def changelog_snapshot(
    changes: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """The batch twin (and per-epoch step): latest change per key by
    ``order_cols`` — tombstone rows RETAINED (see module docstring for
    why dropping them here would allow resurrection). ``op_col`` and
    ``delete_op`` are accepted for signature symmetry with
    ``live_view``; the snapshot itself treats every op the same."""
    del op_col, delete_op  # snapshot retains all ops; liveness is a read-time fact
    return latest_wins(changes, key_cols, order_cols)


def live_view(
    snapshot: DataFrame, op_col: str = "op", delete_op: str = "D"
) -> DataFrame:
    """The user-facing rows: everything whose latest change is not a
    tombstone."""
    return snapshot.filter(F.col(op_col) != delete_op)


def changelog_sink(
    root: str,
    key_cols: list[str],
    order_cols: list[str],
) -> Callable[[DataFrame, int], None]:
    """A ``foreachBatch`` function folding a CDC change stream
    (insert/update/delete rows, op column retained in the schema)
    into the tombstone-retaining snapshot at ``root``. Use::

        stream.writeStream.foreachBatch(
            changelog_sink(root, ["order_id"], ["seq"])
        ).option("checkpointLocation", ckpt).start()

    Read back with ``state_store.read_state`` +
    ``live_view`` for the live rows, or inspect the raw state for
    tombstones (qv03's purge input).
    """

    def step(state: DataFrame | None, batch: DataFrame) -> DataFrame:
        unioned = batch if state is None else state.unionByName(batch)
        return changelog_snapshot(unioned, key_cols, order_cols)

    return merge_state_sink(root, step)


def retraction_rollup_sink(
    root: str, keys: list[str]
) -> Callable[[DataFrame, int], None]:
    """qi05's streaming twin: fold SIGNED change batches (columns
    ``w`` = ±1, ``v`` = DECIMAL measure, plus ``keys``) into the
    grouped Z-set state at ``root`` — the aggregate-grain counterpart
    of ``changelog_sink``'s snapshot grain. Deletes arriving epochs
    after their inserts cancel exactly (signed sums), fully-retracted
    groups persist at n=0 in state (mergeable — a revival must see
    them) and disappear only through ``finalize_signed`` at read
    time. Inherits ``merge_state_sink``'s commit protocol: redelivery
    no-op (an additive monoid would double-count otherwise),
    fresh-checkpoint raise.

    Scale: each epoch aggregates only its batch to |grain| signed
    rows map-side, then shuffles 2·|grain| state rows — O(|Δ| +
    |rollup|) per micro-batch, history-independent.
    """
    from event_stream_aggr_spark.operators.incremental import (
        merge_signed,
        signed_partial,
    )

    def step(state: DataFrame | None, batch: DataFrame) -> DataFrame:
        delta = signed_partial(batch, keys)
        return delta if state is None else merge_signed(state, delta, keys)

    return merge_state_sink(root, step)
