"""Kafka source/sink builders (SURVEY.md §2.1 S1-S6).

Reproduces the reference's Kafka contract on Structured Streaming:

- source (S1): subscribe topic, earliest offsets
  (internal/kafka_client/consumer.go:5-22); offset progress lives in
  the checkpoint, not a consumer-group commit — this subsumes the
  manual commit-after-produce (S6, app.go:220) with the same
  at-least-once delivery into the sink and stronger replay semantics.
- sink (S2/S5): the DataFrame must carry ``key``/``value`` (and
  optionally ``headers``/``topic``); batching knobs mirror the
  reference's producer tuning (linger 10ms / batch 64KiB,
  producer.go:11-13).
- payload codecs (S3/S4): ``from_protobuf`` / ``to_avro`` from
  pyspark.sql.protobuf/avro — descriptor-file based here; Schema
  Registry wire format is a config away on a real deployment.

The Kafka connector jar is not in this container, so everything here
is builder-only (no I/O at import); tests exercise the same pipeline
through file streams (sources/files.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import DataStreamWriter


def read_kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
    include_headers: bool = True,
) -> DataFrame:
    """S1: Kafka source (value: binary, key: binary, headers, timestamp)."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("includeHeaders", str(include_headers).lower())
        .option("kafka.session.timeout.ms", "6000")  # consumer.go:7
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    return reader.load()


def write_kafka_stream(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint_location: str,
    linger_ms: int = 10,
    batch_size: int = 65536,
) -> DataStreamWriter:
    """S2+S5+S6: Kafka sink honoring key/value/headers columns.

    acks=all + idempotence mirror producer.go:10-15; exactly-once
    source tracking via the checkpoint + at-least-once produce matches
    the reference's delivery contract (SURVEY.md §2.1 S6).
    """
    return (
        df.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_location)
        .option("kafka.linger.ms", str(linger_ms))  # producer.go:12
        .option("kafka.batch.size", str(batch_size))  # producer.go:13
        .option("kafka.acks", "all")  # producer.go:14
        .option("kafka.enable.idempotence", "true")  # producer.go:10
    )


def decode_protobuf(df: DataFrame, message_name: str, desc_file_path: str) -> DataFrame:
    """S3: value binary → SensorEvent struct via from_protobuf
    (schema.go:23-34 analogue; needs a compiled descriptor for
    protos/sensor_event.proto)."""
    from pyspark.sql import functions as F
    from pyspark.sql.protobuf.functions import from_protobuf

    return df.select(
        from_protobuf(F.col("value"), message_name, descFilePath=desc_file_path).alias(
            "event"
        )
    ).select("event.*")


#: columns that ride the Kafka envelope, never the Avro record body.
_ENVELOPE_COLS = ("key", "headers", "event_time", "topic")
#: engine-internal columns absent from the reference's SnortAlert Avro
#: record (schema.go:36-43): metric_idx is the synthetic explode ordinal.
_INTERNAL_COLS = ("metric_idx",)


def avro_payload_columns(columns: list[str]) -> list[str]:
    """The subset of ``columns`` that belongs in the Avro record body:
    everything except the Kafka envelope, engine-internal ordinals, and
    underscore-prefixed temporaries."""
    return [
        c
        for c in columns
        if c not in _ENVELOPE_COLS and c not in _INTERNAL_COLS and not c.startswith("_")
    ]


def encode_avro(df: DataFrame, json_format_schema: str) -> DataFrame:
    """S4: alert struct → Avro binary ``value`` via to_avro
    (schema.go:36-43 analogue), keeping key/headers for the sink."""
    from pyspark.sql import functions as F
    from pyspark.sql.avro.functions import to_avro

    payload_cols = avro_payload_columns(df.columns)
    keep = [c for c in _ENVELOPE_COLS if c in df.columns]
    return df.select(
        *keep, to_avro(F.struct(*payload_cols), json_format_schema).alias("value")
    )
