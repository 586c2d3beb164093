"""S1/S2 contract parity, executable without the Kafka connector jar:
option dicts mirror consumer.go:5-22 / producer.go:7-27, and the
envelope frame binds key/headers/event_time the way the sink consumes
them (app.go:182-215)."""

from __future__ import annotations

from pyspark.sql import functions as F

from event_stream_aggr_spark.plans.snort import with_kafka_envelope
from event_stream_aggr_spark.sources.kafka import (
    kafka_sink_options,
    kafka_source_options,
    write_kafka_stream,
)


def test_source_options_consumer_parity():
    opts = kafka_source_options("broker:9092", "sensor_events", max_offsets_per_trigger=5000)
    assert opts["kafka.bootstrap.servers"] == "broker:9092"
    assert opts["subscribe"] == "sensor_events"
    assert opts["startingOffsets"] == "earliest"          # consumer.go:12
    assert opts["kafka.session.timeout.ms"] == "6000"     # consumer.go:7
    assert opts["includeHeaders"] == "true"               # S5 metadata
    assert opts["maxOffsetsPerTrigger"] == "5000"


def test_sink_options_producer_parity():
    opts = kafka_sink_options("broker:9092", "snort_alerts", "/tmp/ckpt")
    assert opts["topic"] == "snort_alerts"
    assert opts["kafka.linger.ms"] == "10"                # producer.go:12
    assert opts["kafka.batch.size"] == "65536"            # producer.go:13
    assert opts["kafka.acks"] == "all"                    # producer.go:14
    assert opts["kafka.enable.idempotence"] == "true"     # producer.go:10
    assert opts["checkpointLocation"] == "/tmp/ckpt"      # S6 at-least-once


def test_envelope_binds_key_headers_event_time(spark):
    from tests.fixtures import make_sensor_event

    events = spark.createDataFrame([make_sensor_event(0, n_metrics=2)])
    env = with_kafka_envelope(events)
    schema = {f.name: f.dataType.simpleString() for f in env.schema.fields}
    assert schema["key"] == "string"
    assert schema["headers"] == "array<struct<key:string,value:binary>>"
    assert schema["event_time"] == "timestamp"
    rows = env.collect()
    assert all(r.key is not None for r in rows)
    header_keys = [h.key for h in rows[0].headers]
    assert header_keys == ["hash_sha256", "sensor_id", "priorityStr", "classification"]


def test_write_stream_builder_accepts_envelope_frame(spark, tmp_path):
    # builder-level only (connector jar absent): the writer constructs
    # with the full option set; .start() is what would need the jar
    from tests.fixtures import make_sensor_event

    events = spark.createDataFrame([make_sensor_event(0, n_metrics=1)])
    frame = with_kafka_envelope(events).select(
        "key", F.to_json(F.struct("sid", "msg")).cast("binary").alias("value"), "headers"
    )
    stream_frame = spark.readStream.format("rate").load().select(
        F.lit("k").alias("key"), F.col("value").cast("string").cast("binary").alias("value")
    )
    writer = write_kafka_stream(
        stream_frame, "broker:9092", "snort_alerts", str(tmp_path / "ckpt")
    )
    assert writer is not None
    assert set(frame.columns) == {"key", "value", "headers"}
