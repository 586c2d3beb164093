"""Table-maintenance operators (SURVEY.md §2.1 S7 extension): the
layout work a 100 TB lakehouse runs continuously so the *query* side
stays fast — small-file compaction and partition/sort layout.

Why these live in the engine: at 1000-executor scale the dominant read
costs are (a) file-open overhead from millions of tiny files produced
by streaming ingest, and (b) scanning partitions/row-groups the query
provably doesn't need. Compaction fixes (a); hive-style partitioning +
sort-within-partitions (min/max row-group pruning) fixes (b). Neither
changes query results, so they are covered by round-trip equality
tests (tests/test_maintenance.py) rather than oracle rows.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession

#: Default compaction target — the classic 128 MiB HDFS-block-shaped file.
TARGET_FILE_BYTES = 128 * 1024 * 1024


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def compact_parquet(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    target_file_bytes: int = TARGET_FILE_BYTES,
) -> int:
    """Rewrite a parquet directory into ~``target_file_bytes`` files.

    Returns the output file count. Sizing reads only filesystem
    metadata (no data pass); the rewrite itself is one narrow
    ``coalesce`` job — no shuffle — because compaction must be cheaper
    than the scans it saves. ``coalesce`` (not ``repartition``) is
    deliberate: merging small files needs no redistribution, and a
    shuffle of the whole table would defeat the purpose at 100 TB.
    """
    n_files = max(1, math.ceil(_dir_bytes(in_path) / target_file_bytes))
    df = spark.read.parquet(in_path)
    df.coalesce(n_files).write.mode("overwrite").parquet(out_path)
    return len(
        [
            f
            for f in os.listdir(out_path)
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        ]
    )


def write_pruned_layout(
    df: DataFrame,
    out_path: str,
    partition_cols: list[str],
    sort_cols: list[str],
) -> None:
    """Write ``df`` hive-partitioned by ``partition_cols`` with rows
    sorted by ``sort_cols`` inside each file.

    Partition columns give directory-level pruning (Catalyst's
    PartitionFilters skip whole directories before listing files);
    the within-file sort clusters values so parquet row-group min/max
    statistics prune I/O for range predicates on ``sort_cols``. The
    sort is ``sortWithinPartitions`` — per-task, no global shuffle.
    """
    (
        df.repartition(*[df[c] for c in partition_cols])
        .sortWithinPartitions(*sort_cols)
        .write.mode("overwrite")
        .partitionBy(*partition_cols)
        .parquet(out_path)
    )
