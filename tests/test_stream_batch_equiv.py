"""Streaming↔batch equivalence at the data level (the reference's A1
interval-stats parity, app.go:75-110): the same event-time hourly
rollup computed (a) as a batch query and (b) as a multi-micro-batch
file-stream query must produce identical results.

countDistinct is excluded (unsupported in streaming aggregation —
documented trade; q29's approx_count_distinct is the streaming-safe
form); the sum uses DECIMAL so accumulation order cannot perturb
equality."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from event_stream_aggr_spark.sources.files import stream_parquet_dir
from event_stream_aggr_spark.tables import load_table


def _hourly_rollup(df: DataFrame) -> DataFrame:
    return df.groupBy(
        F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss").alias(
            "hour_bucket"
        ),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(38,6)")).alias("total_value"),
    )


def test_stream_batch_equivalence_hourly_rollup(spark, sf_dir, tmp_path):
    src = str(tmp_path / "events_stream")
    load_table(spark, sf_dir, "events").repartition(6).write.parquet(src)

    stored = spark.read.parquet(src)
    batch = {
        (r.hour_bucket, r.event_type): (r.n, r.total_value)
        for r in _hourly_rollup(stored).collect()
    }

    stream = stream_parquet_dir(spark, src, stored.schema, max_files_per_trigger=2)
    q = (
        _hourly_rollup(stream)
        .writeStream.format("memory")
        .queryName("sb_equiv")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r.hour_bucket, r.event_type): (r.n, r.total_value)
        for r in spark.table("sb_equiv").collect()
    }
    assert q.lastProgress["batchId"] >= 1  # really ran >1 micro-batch
    assert streamed == batch and len(batch) > 0
