"""Bounded per-round state for iterative DataFrame loops.

A driver-side loop of DataFrame steps (k-core peeling, label
propagation, BFS, Lloyd iterations) needs per-round materialization:
without lineage truncation, round r replays rounds 1..r-1. Spark's
obvious mechanisms each fail a requirement at scale, measured on qg07
in round 9 (`operators/cluster.py` docstring has the numbers):

- eager ``localCheckpoint`` chains hoard every round's blocks in
  block-manager MEMORY until the last consumer runs — at 30x data the
  blocks co-resident with execution hash maps spilled 7.9 GB;
- pure recompute (one job, ReuseExchange dedup) ran 10x slower —
  optimizer tree-copying destroys DAG sharing between round branches;
- ``persist(DISK_ONLY)`` + ``unpersist`` ran 5x slower — SPARK-24596
  non-cascading uncache rebuilds dependent cache entries from their
  SOURCE plans, so freeing round r-1 forces round r+1 back to parquet.

The working recipe: ``localCheckpoint`` at ``DISK_ONLY`` (lineage
truncated AND zero unified-pool tenancy — disk blocks are not
evictable pool tenants, and the OS page cache serves re-reads), with
the registered RDD ids captured at mark time so a superseded
generation can be freed deterministically the moment its successor
materializes. ``Dataset.unpersist`` cannot do this (it only talks to
the SQL cache manager); without explicit freeing, checkpoint blocks
linger until driver-side GC happens to collect the plan — exactly the
accumulation the round-8 30x probe flagged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _registered_ids(sc) -> set[int]:
    return set(sc._jsc.getPersistentRDDs().keySet().toArray())


def disk_checkpoint(df: DataFrame) -> tuple[DataFrame, int, list[int]]:
    """Eagerly materialized DISK_ONLY checkpoint:
    ``(checkpointed_df, row_count, rdd_ids)``. The lazy mark + count
    fold materialization and row-counting into ONE job (``eager=True``
    would run a materialization job and the caller's count a second).
    """
    from pyspark import StorageLevel

    sc = df.sparkSession.sparkContext
    before = _registered_ids(sc)
    ck = df.localCheckpoint(eager=False, storageLevel=StorageLevel.DISK_ONLY)
    n = ck.count()  # materializes the checkpoint blocks
    return ck, n, [i for i in _registered_ids(sc) if i not in before]


def disk_checkpoint_lazy(df: DataFrame) -> tuple[DataFrame, list[int]]:
    """Lazily marked DISK_ONLY checkpoint: ``(df, rdd_ids)``. The RDD
    registers in the block manager at mark time, so the generation's
    ids are known before any action; blocks materialize with the
    caller's next action over the frame (e.g. a convergence count)."""
    from pyspark import StorageLevel

    sc = df.sparkSession.sparkContext
    before = _registered_ids(sc)
    ck = df.localCheckpoint(eager=False, storageLevel=StorageLevel.DISK_ONLY)
    return ck, [i for i in _registered_ids(sc) if i not in before]


def free_blocks(spark: SparkSession, rdd_ids: list[int]) -> None:
    """Unpersist the given registered RDD ids (non-blocking).
    ``JavaSparkContext.getPersistentRDDs`` is the public registry of
    persisted RDDs; ids already freed (or GC-cleaned) are simply
    absent and skipped. Only free a generation no later plan
    references — a localCheckpoint's lineage is truncated, so its
    blocks are the ONLY copy of its data."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for rid in rdd_ids:
        jrdd = jmap.get(rid)
        if jrdd is not None:
            jrdd.unpersist(False)
