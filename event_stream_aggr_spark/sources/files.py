"""File sources/sinks (SURVEY.md §2.1 S7-S9).

Explicit schemas everywhere: schema inference is a full extra pass at
100 TB and non-deterministic under drift. Parquet is the default
interchange (columnar pruning + predicate pushdown); JSON/CSV readers
exist for ingest edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_json(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return spark.read.schema(schema).json(path)


def read_csv(
    spark: SparkSession, path: str, schema: T.StructType, header: bool = True
) -> DataFrame:
    return spark.read.schema(schema).option("header", str(header).lower()).csv(path)


def stream_parquet_dir(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    max_files_per_trigger: int = 16,
) -> DataFrame:
    """Hermetic streaming source: a directory of parquet files replayed
    as micro-batches — the test stand-in for the Kafka source (S1),
    used by tests/test_streaming.py. maxFilesPerTrigger bounds batch
    size the way maxOffsetsPerTrigger does on Kafka."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )
