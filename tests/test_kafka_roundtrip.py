"""S1/S2 executed against real Kafka *record* semantics, no broker:
protobuf-encoded sensor events are laid out as source-shaped records
(key/value/topic/partition/offset/timestamp/headers — the exact schema
the Spark Kafka source yields), streamed through the full pipeline
(S3 decode → P1/P2 flatten → S5 envelope → S4 Avro encode), and bound
back into producer-shaped records. Asserts the reference's producer
contract (app.go:182-215, producer.go:8-21): key = event hash, the 4
headers, record timestamp = parsed Snort event time, per-key partition
stability, contiguous per-partition offsets, and a payload free of
engine-internal columns."""

from __future__ import annotations

import datetime as dt
import hashlib

from pyspark.sql import functions as F

from event_stream_aggr_spark.plans.snort import with_kafka_envelope
from event_stream_aggr_spark.schemas import SNORT_ALERT_SCHEMA
from event_stream_aggr_spark.sources.avro_wire import (
    avro_schema_of,
    decode_record,
    encode_avro_py,
)
from event_stream_aggr_spark.sources.kafka import (
    avro_payload_columns,
    kafka_record_schema,
    read_kafka_records_sim,
    to_kafka_records,
)
from event_stream_aggr_spark.sources.protobuf_wire import (
    decode_sensor_events_py,
    encode_sensor_event,
)
from tests.fixtures import make_sensor_event

N_EVENTS = 24
N_METRICS = 2
_PRIORITY = {1: "High", 2: "Medium", 3: "Low"}


def _input_records(events: list[dict]) -> list[dict]:
    """What the sensor_events topic would hand the consumer
    (consumer.go:6-12 shape): proto bytes keyed by event hash."""
    return [
        {
            "key": e["event_hash_sha256"].encode(),
            "value": encode_sensor_event(e),
            "topic": "sensor_events",
            "partition": i % 3,
            "offset": i // 3,
            "timestamp": dt.datetime(2025, 1, 31, 4, 15, 6),
            "timestampType": 0,
            "headers": [],
        }
        for i, e in enumerate(events)
    ]


def test_kafka_record_semantics_roundtrip(spark, tmp_path):
    events = [make_sensor_event(i, n_metrics=N_METRICS) for i in range(N_EVENTS)]
    in_dir = str(tmp_path / "topic_sensor_events")
    out_dir = str(tmp_path / "topic_snort_alerts")
    spark.createDataFrame(
        _input_records(events), kafka_record_schema()
    ).repartition(4).write.parquet(in_dir)

    # S1 (record shape) → S3 decode → flatten/envelope → S4 encode →
    # producer-side record binding, one streaming query
    raw = read_kafka_records_sim(spark, in_dir, max_files_per_trigger=2)
    alerts = with_kafka_envelope(decode_sensor_events_py(raw))

    def produce(batch, epoch_id):
        import os

        prev = (
            batch.sparkSession.read.schema(kafka_record_schema()).parquet(out_dir)
            if os.path.isdir(out_dir)
            else None
        )
        to_kafka_records(
            encode_avro_py(batch), "snort_alerts", continue_from=prev
        ).write.mode("append").parquet(out_dir)

    q = (
        alerts.writeStream.foreachBatch(produce)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    out = spark.read.schema(kafka_record_schema()).parquet(out_dir)
    rows = out.collect()
    assert len(rows) == N_EVENTS * N_METRICS  # one record per metric

    # reproduce the encoder's record schema exactly (field order matters
    # in Avro): same payload-column selection over the same alert frame
    from event_stream_aggr_spark.schemas import SENSOR_EVENT_SCHEMA

    alert_schema = with_kafka_envelope(
        spark.createDataFrame([], SENSOR_EVENT_SCHEMA)
    ).schema
    payload_cols = avro_payload_columns([f.name for f in alert_schema.fields])
    payload_schema = avro_schema_of(
        type(alert_schema)([alert_schema[c] for c in payload_cols])
    )
    by_key: dict[bytes, list] = {}
    for r in rows:
        by_key.setdefault(bytes(r.key), []).append(r)

    assert len(by_key) == N_EVENTS
    for i, e in enumerate(events):
        key = e["event_hash_sha256"].encode()
        recs = by_key[key]
        assert len(recs) == N_METRICS
        # per-key partition stability (the Kafka ordering guarantee the
        # reference's key-by-hash partitioning relies on, app.go:189)
        assert len({r.partition for r in recs}) == 1
        for r in recs:
            # S5 header binding (app.go:183-188), in order
            hdr = {h.key: bytes(h.value).decode() for h in r.headers}
            assert [h.key for h in r.headers] == [
                "hash_sha256", "sensor_id", "priorityStr", "classification",
            ]
            assert hdr["hash_sha256"] == e["event_hash_sha256"]
            assert hdr["sensor_id"] == e["sensor_id"]
            assert hdr["priorityStr"] == _PRIORITY.get(
                e["snort_priority"], "Informational"
            )
            assert hdr["classification"] == e["snort_classification"]
            # record timestamp = parsed Snort event time (app.go:195-211):
            # fixture metric ts 25/01/31-04:15:06.927463 (UTC session)
            assert r.timestamp.replace(tzinfo=None) == dt.datetime(
                2025, 1, 31, 4, 15, 6, 927463
            )
            assert r.timestampType == 0
            # S4 payload decodes and carries no engine-internal columns
            payload = decode_record(bytes(r.value), payload_schema)
            assert payload["sid"] == e["snort_rule_sid"]
            assert payload["msg"] == e["snort_message"]
            assert "metric_idx" not in payload and "topic" not in payload
        # key really is the sha256 the reference mints (processor.go:100-103)
        assert key.decode() == hashlib.sha256(f"event-{i}".encode()).hexdigest()

    # contiguous per-partition offsets (broker append semantics)
    for part, grp in out.groupBy("partition").agg(
        F.collect_list("offset").alias("offs")
    ).collect():
        assert sorted(grp) == list(range(len(grp)))
