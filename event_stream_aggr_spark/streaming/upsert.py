"""Streaming CDC upsert sink (W6 + q52's MERGE shape, incremental):
maintain a latest-wins per-key snapshot from a change stream with
``foreachBatch``, without requiring a table format.

Since round 9 the commit protocol is shared with
``streaming/state_store.py`` (``merge_state_sink``): each epoch writes
a full new snapshot version ``v{epoch}`` reading the PRE-IMAGE version,
then commits an atomic ``_COMMIT_v{epoch}`` marker file through the
session's Hadoop FileSystem — portable to hdfs:/ and object stores,
bounded two-generation retention, loud failure when a fresh/foreign
checkpoint's restarted batch ids are pointed at a non-empty store.
The earlier local-``os`` pointer-swap variant had two latent defects
the shared store fixes: it silently resolved to "no snapshot" on any
non-local root, and a post-commit REDELIVERY re-merged the batch into
the same ``v{epoch}`` directory it was overwriting (reading a path
while overwriting it). Latest-wins is an idempotent merge, so the
epoch gate's skip-on-redelivery and the old re-merge produce the same
snapshot — the gate just does it without the hazard.

Merge order independence: latest-wins by (order_cols) is a per-key
associative/commutative maximum, so the final snapshot is the same no
matter how the change stream is batched or reordered across epochs —
asserted by the stream↔batch equivalence test.

Scale: the merge is ONE hash shuffle of snapshot ∪ batch on the key.
At 100 TB the snapshot is written bucketed by key so only the (small)
batch side shuffles, and the rewrite is partition-scoped (only
partitions containing changed keys), not a full-table rewrite.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from event_stream_aggr_spark.streaming.state_store import (
    merge_state_sink,
    read_state,
)


def latest_wins(df: DataFrame, key_cols: list[str], order_cols: list[str]) -> DataFrame:
    """One row per key: the greatest row by ``order_cols`` (last column
    must make the ordering total — e.g. a unique id as tiebreak)."""
    w = W.partitionBy(*key_cols).orderBy(*[F.col(c).desc() for c in order_cols])
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def read_snapshot(spark: SparkSession, root: str) -> DataFrame | None:
    """Resolve the committed snapshot; None if no committed version."""
    return read_state(spark, root)[0]


def snapshot_upsert_sink(
    root: str, key_cols: list[str], order_cols: list[str]
) -> Callable[[DataFrame, int], None]:
    """A ``foreachBatch`` function maintaining a latest-wins snapshot
    at ``root`` — ``merge_state_sink`` with the latest-wins step. Use:

        stream.writeStream.foreachBatch(
            snapshot_upsert_sink(root, ["user_id"], ["ts", "event_id"])
        ).option("checkpointLocation", ckpt).start()
    """

    def step(state: DataFrame | None, batch: DataFrame) -> DataFrame:
        unioned = batch if state is None else state.unionByName(batch)
        return latest_wins(unioned, key_cols, order_cols)

    return merge_state_sink(root, step)
