"""Streaming↔batch parity for the curation surface: the quality
filter (qt14's zero-shuffle rules) and language-ID scoring are
stateless row transforms, so running them over a multi-micro-batch
file stream must reproduce the batch verdicts exactly — the property
that lets the same curation code score documents on ingest (streaming)
and in backfill (batch) without divergence."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from event_stream_aggr_spark.operators.text import STOPWORDS_EN, tokens
from event_stream_aggr_spark.sources.files import stream_parquet_dir
from event_stream_aggr_spark.tables import load_table


def _quality_verdict(df: DataFrame) -> DataFrame:
    ts = tokens(F.col("text"))
    n = F.size(ts).cast("long")
    sum_len = F.length(F.concat_ws("", ts)).cast("long")
    n_stop = F.size(F.filter(ts, lambda x: x.isin(list(STOPWORDS_EN)))).cast("long")
    return df.select(
        "doc_id",
        (
            n.between(30, 100000)
            & (sum_len >= 3 * n)
            & (sum_len <= 10 * n)
            & (n_stop * 50 >= 3 * n)
        ).alias("keep"),
    )


def test_stream_batch_parity_quality_filter(spark, sf_dir, tmp_path):
    src = str(tmp_path / "docs_stream")
    load_table(spark, sf_dir, "documents").repartition(5).write.parquet(src)
    stored = spark.read.parquet(src)

    batch = {r.doc_id: r.keep for r in _quality_verdict(stored).collect()}

    stream = stream_parquet_dir(spark, src, stored.schema, max_files_per_trigger=2)
    q = (
        _quality_verdict(stream)
        .writeStream.format("memory")
        .queryName("curation_parity")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {r.doc_id: r.keep for r in spark.table("curation_parity").collect()}
    assert q.lastProgress["batchId"] >= 1
    assert streamed == batch and len(batch) > 0
    assert any(batch.values()) and not all(batch.values())  # both verdicts occur
