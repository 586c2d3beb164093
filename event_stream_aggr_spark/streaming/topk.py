"""Streaming exact top-k maintenance — qi07's stateful twin, with the
same EXACT batch-equivalence argument as the streaming skyline: the
per-group top-k is merge-closed (merge(A, B) = prune(A ∪ B)) and
falling out of the top-k is MONOTONE under inserts (a row outside some
prefix's top-k is outside every superset's), so folding micro-batches
through union → prune yields byte-identical state to the one-pass
global top-k under ANY batching. Deletes are out of scope by design
(top-k is not retraction-safe — a deleted leader needs history to
backfill; qi05 states the same boundary for MIN/MAX).

NULL prices rank below every non-null price (Spark's DESC default
is nulls last, and ``topk_prune``'s window inherits it): a null-priced
row enters state only while its group holds fewer than k ranked rows,
and any arriving ranked row displaces it — pinned in tests.

State (at most k rows per group: the leaderboard itself) lives in the
repo's versioned merge store (``streaming/state_store.py``), same
epoch-gated protocol as the sketch/near-dedup/ER/skyline maintainers
(redelivery no-op, below-committed raise).

Scale shape (100 TB): each epoch prunes its batch to ≤ k·|groups| rows
with one PARTITIONED window, the merge re-ranks ≤ 2k rows per group,
and the store never exceeds k·|groups| rows however much history has
flowed through — the bounded-state property that makes a leaderboard
maintainable at all.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame

from event_stream_aggr_spark.operators.incremental import TOPK_K, topk_prune
from event_stream_aggr_spark.streaming import state_store as ss


def topk_sink(
    root: str, keys: list[str] | None = None, k: int = TOPK_K
) -> Callable[[DataFrame, int], None]:
    """A ``foreachBatch`` function maintaining per-group exact top-k
    (by ``price`` desc, ``o_orderkey`` asc — qi07's leaderboard shape)
    in the merge store at ``root``. Read the maintained leaderboard
    with ``ss.read_state(spark, root)``.
    """
    group_keys = keys or ["o_orderpriority"]

    def apply(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        state, committed = ss.read_state(spark, root)
        if epoch_id < committed:
            raise ValueError(
                f"topk_sink at {root}: batch id {epoch_id} is below the "
                f"committed epoch {committed}. Batch ids only move forward "
                "within one checkpoint lineage, so this store was built by a "
                "DIFFERENT (or deleted) streaming checkpoint; merging would "
                "double-count rows. Point the query at its original "
                "checkpointLocation, or start a new state root."
            )
        if epoch_id == committed:
            return  # post-commit redelivery: already folded
        delta = topk_prune(batch, group_keys, k)
        merged = (
            topk_prune(state.unionByName(delta), group_keys, k)
            if state is not None
            else delta
        )
        merged.write.mode("overwrite").parquet(ss._join(root, f"v{epoch_id}"))
        ss._commit(spark, root, epoch_id)
        ss._vacuum(spark, root, keep_from=committed)

    return apply
