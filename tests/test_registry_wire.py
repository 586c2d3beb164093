"""Confluent Schema Registry wire format (schema.go:23-43 serde
framing), executed: JVM-side frame/unframe expressions, protobuf
message-index encoding, and the full framed-bytes → decode → flatten
path."""

from __future__ import annotations

import struct

from pyspark.sql import functions as F

from event_stream_aggr_spark.plans.snort import flatten_alerts
from event_stream_aggr_spark.sources.protobuf_wire import (
    decode_sensor_events_py,
    encode_sensor_event,
)
from event_stream_aggr_spark.sources.registry import (
    SENSOR_EVENT_MESSAGE_INDEXES,
    frame_confluent,
    protobuf_message_index_bytes,
    unframe_payload,
    unframe_schema_id,
)
from tests.fixtures import make_sensor_event


def test_message_index_encoding():
    assert protobuf_message_index_bytes([0]) == b"\x00"          # special case
    assert protobuf_message_index_bytes([1]) == b"\x02\x02"      # zigzag(1)=2
    assert protobuf_message_index_bytes([2, 3]) == b"\x04\x04\x06"
    assert protobuf_message_index_bytes(SENSOR_EVENT_MESSAGE_INDEXES) == b"\x02\x02"


def test_frame_layout_matches_confluent_spec(spark):
    payload = b"\x0a\x02hi"
    df = spark.createDataFrame([(bytearray(payload),)], "p binary")
    framed = bytes(
        df.select(
            frame_confluent(F.col("p"), 1234, SENSOR_EVENT_MESSAGE_INDEXES).alias("v")
        ).collect()[0].v
    )
    assert framed == b"\x00" + struct.pack(">I", 1234) + b"\x02\x02" + payload


def test_frame_with_column_schema_id(spark):
    df = spark.createDataFrame([(bytearray(b"xy"), 7)], "p binary, sid int")
    framed = bytes(
        df.select(frame_confluent(F.col("p"), F.col("sid")).alias("v")).collect()[0].v
    )
    assert framed == b"\x00" + struct.pack(">I", 7) + b"xy"


def test_unframe_roundtrip_jvm_side(spark):
    events = [make_sensor_event(i, n_metrics=2) for i in range(3)]
    idx_len = len(protobuf_message_index_bytes(SENSOR_EVENT_MESSAGE_INDEXES))
    raw = spark.createDataFrame(
        [(bytearray(encode_sensor_event(e)),) for e in events], "payload binary"
    )
    framed = raw.select(
        frame_confluent(F.col("payload"), 42, SENSOR_EVENT_MESSAGE_INDEXES).alias("value")
    )
    back = framed.select(
        unframe_schema_id(F.col("value")).alias("schema_id"),
        unframe_payload(F.col("value"), idx_len).alias("value"),
    )
    assert {r.schema_id for r in back.select("schema_id").collect()} == {42}
    alerts = flatten_alerts(decode_sensor_events_py(back.select("value")))
    assert alerts.count() == 6
    # framing must be byte-transparent: payloads identical after unframe
    orig = sorted(bytes(r.payload) for r in raw.collect())
    got = sorted(bytes(r.value) for r in back.collect())
    assert got == orig
