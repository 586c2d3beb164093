"""Confluent Schema Registry wire format (the framing the reference's
serde stack applies around every Kafka value: schema.go:23-43 via
confluent-kafka-go serde).

Public layout (Confluent docs):

    byte 0        magic byte 0x00
    bytes 1-4     schema id, big-endian uint32
    [protobuf]    message-indexes: zigzag varints (count, then indexes);
                  the common [0] case is the single byte 0x00
    rest          the Avro/Protobuf payload

Framing/unframing are pure Catalyst expressions (concat / substring /
conv / hex / unhex) — JVM-side, codegen'd, no Python in the row path.
The message-index prefix length is a deploy-time constant for a fixed
registered subject (the reference registers exactly one message type,
schema.go:29), so unframing takes it as a constant, and
``protobuf_message_index_bytes`` computes the constant from the proto
file layout (SensorEvent is message index 1 in sensor_event.proto).
"""

from __future__ import annotations

import struct

from pyspark.sql import Column
from pyspark.sql import functions as F

from event_stream_aggr_spark.sources.avro_wire import write_zigzag_varint

MAGIC_BYTE = 0


def protobuf_message_index_bytes(indexes: list[int]) -> bytes:
    """Confluent protobuf message-index encoding: zigzag varint count
    then zigzag varint indexes ([0] compresses to the single byte 0) —
    the same zigzag-varint primitive Avro uses, so it is shared with
    avro_wire rather than re-implemented."""
    if indexes == [0]:
        return b"\x00"
    out = write_zigzag_varint(len(indexes))
    for i in indexes:
        out += write_zigzag_varint(i)
    return out


#: SensorEvent is the second top-level message in sensor_event.proto
#: (Metric=0, SensorEvent=1, AlertSummary=2).
SENSOR_EVENT_MESSAGE_INDEXES = [1]


def frame_confluent(
    payload: Column,
    schema_id: int | Column,
    message_indexes: list[int] | None = None,
) -> Column:
    """payload BINARY → Confluent-framed BINARY.

    A literal ``schema_id`` folds the whole 5-byte header into one
    binary literal; a Column schema_id stays an unhex/lpad/hex
    expression (still JVM-side).
    """
    idx = (
        F.lit(bytearray(protobuf_message_index_bytes(message_indexes)))
        if message_indexes is not None
        else None
    )
    if isinstance(schema_id, int):
        header = F.lit(bytearray(bytes([MAGIC_BYTE]) + struct.pack(">I", schema_id)))
    else:
        header = F.concat(
            F.unhex(F.lit("00")),
            F.unhex(F.lpad(F.hex(schema_id.cast("long")), 8, "0")),
        )
    parts = [header] + ([idx] if idx is not None else []) + [payload]
    return F.concat(*parts)


def unframe_schema_id(value: Column) -> Column:
    """Framed BINARY → schema id (int). substring is 1-based."""
    return F.conv(F.hex(F.substring(value, 2, 4)), 16, 10).cast("int")


def unframe_payload(value: Column, n_index_bytes: int = 0) -> Column:
    """Framed BINARY → raw payload. ``n_index_bytes`` is the constant
    message-index prefix width (0 for Avro; len(protobuf_message_index_
    bytes(...)) for protobuf subjects). An over-long length clamps, so
    taking len(value) is safe."""
    return F.substring(value, F.lit(6 + n_index_bytes), F.length(value))
