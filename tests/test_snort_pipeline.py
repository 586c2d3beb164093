"""The flagship flatten pipeline vs the reference's data path
(internal/app/app.go:173-225, processor.go:21-94)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from event_stream_aggr_spark.plans.snort import flatten_alerts, with_kafka_envelope
from event_stream_aggr_spark.schemas import SENSOR_EVENT_SCHEMA, SNORT_ALERT_SCHEMA
from tests.fixtures import make_metric, make_sensor_event


def _df(spark, events):
    return spark.createDataFrame(events, schema=SENSOR_EVENT_SCHEMA)


def test_one_row_per_metric(spark):
    events = [make_sensor_event(0, 3), make_sensor_event(1, 1), make_sensor_event(2, 5)]
    out = flatten_alerts(_df(spark, events))
    assert out.count() == 9  # app.go:192: one alert per metric


def test_projection_and_renames(spark):
    ev = make_sensor_event(7, 2)
    rows = flatten_alerts(_df(spark, [ev])).collect()
    r = rows[0]
    # event-level renames (processor.go:30-40,60-75)
    assert r.msg == "test alert 7"
    assert r.sid == 1000007
    assert r.gid == 1
    assert r["class"] == "attempted-recon"
    assert r.action == "allow"
    assert r.tos == 0
    # metric-level renames (processor.go:41-59,76-92)
    assert r.src_addr == "192.168.1.0"
    assert r.pkt_len == 60
    assert r.ttl == 64
    assert r.b64_data == "cGt00"
    # metadata struct (types.go:3-24) with ISO ms strings
    assert r.metadata.hash_sha256 == ev["event_hash_sha256"]
    assert r.metadata.sent_at == "2025-01-31T04:15:06.937Z"
    assert r.metadata.read_at == "2025-01-31T04:15:06.927Z"
    # F2 derivation: priority 7%4+1=4 → Informational
    assert r.priority == 4 and r.priority_str == "Informational"


def test_alert_schema_field_parity(spark):
    out = flatten_alerts(_df(spark, [make_sensor_event(0, 1)]))
    assert set(out.columns) == {f.name for f in SNORT_ALERT_SCHEMA.fields}


def test_null_passthrough(spark):
    ev = make_sensor_event(0, 1)
    ev["snort_action"] = None
    ev["metrics"] = [make_metric(0, snort_target=None, snort_vlan=None)]
    r = flatten_alerts(_df(spark, [ev])).collect()[0]
    assert r.action is None and r.target is None and r.vlan is None


def test_kafka_envelope(spark):
    ev = make_sensor_event(3, 2)
    rows = with_kafka_envelope(_df(spark, [ev])).collect()
    assert len(rows) == 2
    r = rows[0]
    # key = event hash (app.go:182,209)
    assert r.key == ev["event_hash_sha256"]
    # 4 headers (app.go:183-188)
    headers = {h.key: bytes(h.value).decode() for h in r.headers}
    assert headers == {
        "hash_sha256": ev["event_hash_sha256"],
        "sensor_id": "sensor-0",
        "priorityStr": "Informational",
        "classification": "attempted-recon",
    }
    # event-time from snort_timestamp (app.go:195-211)
    assert r.event_time is not None
    assert r.event_time.year == 2025


def test_event_time_fallback_on_malformed_ts(spark):
    ev = make_sensor_event(0, 1)
    ev["metrics"] = [make_metric(0, ts="garbage")]
    r = with_kafka_envelope(_df(spark, [ev])).collect()[0]
    # falls back to snort_seconds = 1738296906 (app.go:197)
    assert r.event_time.timestamp() == 1738296906.0


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    n_metrics=st.lists(st.integers(min_value=0, max_value=6), min_size=1, max_size=5),
    malformed=st.booleans(),
    drop_optional=st.booleans(),
)
def test_flatten_properties(spark, n_metrics, malformed, drop_optional):
    """Property: output rows == sum(metrics); optional-null fidelity;
    malformed timestamps never drop rows (F3 fallback)."""
    events = []
    for i, n in enumerate(n_metrics):
        ev = make_sensor_event(i, n)
        if malformed:
            ev["metrics"] = [make_metric(j, ts="xx/xx") for j in range(n)]
        if drop_optional:
            ev["snort_action"] = None
            ev["snort_service"] = None
        events.append(ev)
    out = with_kafka_envelope(_df(spark, events))
    assert out.count() == sum(n_metrics)
    assert out.filter(F.col("event_time").isNull()).count() == 0
