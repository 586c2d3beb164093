"""Dual-path serde parity (round-7 VERDICT ask #8): the day this
environment gains the spark-protobuf / spark-avro jars, these tests
automatically run the JVM fast paths (sources/kafka.py:decode_protobuf,
encode_avro) against the executed pure-Python wire codecs and require
byte/struct equality. Until then they SKIP with an explicit jar-probe
reason — the probe executes a 1-row decode/encode, so a jar that loads
but can't run still counts as absent."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from event_stream_aggr_spark.schemas import SENSOR_EVENT_SCHEMA
from event_stream_aggr_spark.sources.protobuf_wire import (
    decode_sensor_events_py,
    encode_sensor_event,
)
from tests.fixtures import make_sensor_event


def _protobuf_jar_available(spark) -> bool:
    try:
        from event_stream_aggr_spark.sources.kafka import decode_protobuf

        probe = spark.createDataFrame(
            [(bytearray(encode_sensor_event(make_sensor_event(0, n_metrics=1))),)],
            "value binary",
        )
        decode_protobuf(probe).collect()
        return True
    except Exception:
        return False


def _avro_jar_available(spark) -> bool:
    try:
        from pyspark.sql.avro.functions import to_avro

        probe = spark.createDataFrame([(1,)], "x long")
        probe.select(
            to_avro(
                F.struct("x"),
                '{"type":"record","name":"p","fields":'
                '[{"name":"x","type":"long"}]}',
            ).alias("v")
        ).collect()
        return True
    except Exception:
        return False


def test_protobuf_jvm_path_matches_python_codec(spark):
    if not _protobuf_jar_available(spark):
        pytest.skip("spark-protobuf jar not in this container (env waiver S3)")
    from event_stream_aggr_spark.sources.kafka import decode_protobuf

    events = [make_sensor_event(i, n_metrics=2) for i in range(5)]
    raw = spark.createDataFrame(
        [(bytearray(encode_sensor_event(e)),) for e in events], "value binary"
    )
    names = [f.name for f in SENSOR_EVENT_SCHEMA.fields]
    jvm_rows = sorted(
        decode_protobuf(raw).select(*names).collect(),
        key=lambda r: r.event_hash_sha256,
    )
    py_rows = sorted(
        decode_sensor_events_py(raw).select(*names).collect(),
        key=lambda r: r.event_hash_sha256,
    )
    assert jvm_rows == py_rows and len(py_rows) == 5


def test_avro_jvm_path_matches_python_codec(spark):
    if not _avro_jar_available(spark):
        pytest.skip("spark-avro jar not in this container (env waiver S4)")
    import json

    from pyspark.sql import types as T

    from event_stream_aggr_spark.plans.snort import with_kafka_envelope
    from event_stream_aggr_spark.sources.avro_wire import (
        avro_schema_of,
        encode_avro_py,
    )
    from event_stream_aggr_spark.sources.kafka import (
        avro_payload_columns,
        encode_avro,
    )

    events = [make_sensor_event(i, n_metrics=2) for i in range(3)]
    env = with_kafka_envelope(spark.createDataFrame(events))
    payload = [
        f for f in env.schema.fields if f.name in avro_payload_columns(env.columns)
    ]
    schema_json = json.dumps(avro_schema_of(T.StructType(payload)))
    key = lambda r: (bytes(r.key or b""), r.metric_idx)  # noqa: E731
    jvm = {
        key(r): bytes(r.value)
        for r in encode_avro(env, schema_json).collect()
    }
    py = {
        key(r): bytes(r.value) for r in encode_avro_py(env).collect()
    }
    assert jvm == py and len(py) == 6
