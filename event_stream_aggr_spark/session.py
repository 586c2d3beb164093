"""SparkSession factory with scale-aware defaults.

The reference sizes a worker pool from the cgroup cpu quota
(``cmd/main.go:70-76``) to hide synchronous per-message Kafka produces.
In Spark that whole concern disappears: parallelism is partition count,
and the knobs that matter are shuffle partitioning, AQE, and Arrow.

Design notes for the 100 TB target (local[N] is only the test harness):

- AQE on: runtime partition coalescing, skew-join splitting, and
  join-strategy switching replace any hand-tuned static plan.
- ``spark.sql.shuffle.partitions`` is a *starting* number; AQE coalesces
  down. On a real cluster set it ~2-3x total cores; locally ~cores.
- Arrow on: every Pandas-UDF operator (enrichment, multimodal decode)
  moves batches, not rows.
- Session timezone pinned UTC so timestamp semantics match both the
  reference (Go ``time.UTC`` formatting, processor.go:16-18) and the
  DuckDB oracle (UTC-naive timestamps).
- ``parquet.aggregatePushdown``: push count/min/max straight to footers.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "event_stream_aggr_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session with engine defaults applied."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    sp = shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(sp))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
