"""Bucketed tables: shuffle-free co-located joins (SURVEY.md Phase 4).

At 100 TB the single biggest recurring cost is re-shuffling the same
fact table on the same join key every query. Bucketing pays the
shuffle ONCE at write time: `bucketBy(n, key)` hash-partitions files
on disk; a join of two tables bucketed on the same key with the same n
plans as a sort-merge join with NO Exchange on either side (verified
in tests/test_scale_ops.py::test_bucketed_join_has_no_shuffle by
asserting the plan is Exchange-free).

Spark's bucketed layout lives in the session catalog (`saveAsTable`),
so these helpers wrap table-name I/O rather than raw paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort_col: str | None = None,
) -> None:
    """Persist ``df`` bucketed (and optionally sorted) on the join key."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner"
) -> DataFrame:
    """Join two same-key same-bucket-count tables — Catalyst elides both
    shuffles (co-located sort-merge join)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
