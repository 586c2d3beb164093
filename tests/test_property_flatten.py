"""Property-based tests (SURVEY.md §5 model): Hypothesis-generated
SensorEvents — optional-field presence, 0..N metrics, malformed
snort_timestamp — asserting the flatten invariant (alerts out == Σ
metrics, app.go:192) and the F3 event-time fallback (app.go:195-198),
plus wire-codec round-trip over arbitrary field values."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from event_stream_aggr_spark.plans.snort import flatten_alerts, with_kafka_envelope
from event_stream_aggr_spark.schemas import SENSOR_EVENT_SCHEMA
from event_stream_aggr_spark.sources.protobuf_wire import (
    METRIC_FIELDS,
    SENSOR_EVENT_FIELDS,
    decode_sensor_event,
    encode_sensor_event,
)
from tests.fixtures import make_metric, make_sensor_event

# ---------------------------------------------------------------------------
# Wire-codec round trip: arbitrary values, including presence-of-default
# for proto3 optional fields and negative int64s
# ---------------------------------------------------------------------------

_opt_str = st.none() | st.text(max_size=20)
_opt_int = st.none() | st.integers(min_value=-(2**63), max_value=2**63 - 1)

_metric_dict = st.fixed_dictionaries(
    {
        name: (
            st.text(max_size=20)
            if name == "snort_timestamp"
            else _opt_str
            if kind == "string"
            else _opt_int
        )
        for _, name, kind, _ in METRIC_FIELDS
    }
)

_event_dict = st.fixed_dictionaries(
    {
        name: (
            st.lists(_metric_dict, max_size=3)
            if kind == "metric[]"
            else (_opt_str if kind == "string" else _opt_int)
            if optional
            else (
                st.text(max_size=20)
                if kind == "string"
                else st.integers(min_value=-(2**63), max_value=2**63 - 1)
            )
        )
        for _, name, kind, optional in SENSOR_EVENT_FIELDS
    }
)


@given(_event_dict)
@settings(max_examples=200, deadline=None)
def test_wire_roundtrip_property(e):
    assert decode_sensor_event(encode_sensor_event(e)) == e


# ---------------------------------------------------------------------------
# Flatten invariant + F3 fallback through Spark
# ---------------------------------------------------------------------------

_VALID_TS = [
    ("25/01/31-04:15:06.927463", True),
    ("25/01/31-04:15:06.92", True),
    ("25/01/31-04:15:06", True),
    ("not-a-timestamp", False),
    ("2025-01-31 04:15:06", False),
    ("", False),
]

FALLBACK_SECONDS = 1_700_000_000  # distinctive: differs from any valid ts

_metric_st = st.builds(
    lambda tsv, cb, flags: (
        make_metric(0, ts=tsv[0], snort_client_bytes=cb, snort_tcp_flags=flags),
        tsv[1],
    ),
    tsv=st.sampled_from(_VALID_TS),
    cb=st.none() | st.integers(min_value=0, max_value=2**40),
    flags=st.none() | st.sampled_from(["S", "SA", "R"]),
)

_event_st = st.builds(
    lambda i, tagged, action, svc: (
        make_sensor_event(
            i,
            metrics=[m for m, _ in tagged],
            event_metrics_count=len(tagged),
            snort_action=action,
            snort_service=svc,
            snort_seconds=FALLBACK_SECONDS,
        ),
        [ok for _, ok in tagged],
    ),
    i=st.integers(0, 999),
    tagged=st.lists(_metric_st, min_size=0, max_size=4),
    action=st.none() | st.sampled_from(["allow", "drop"]),
    svc=st.none() | st.sampled_from(["http", "dns"]),
)


@given(st.lists(_event_st, min_size=1, max_size=4))
@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_flatten_and_fallback_properties(spark, tagged_events):
    events = [e for e, _ in tagged_events]
    valid_flags = [ok for _, oks in tagged_events for ok in oks]
    df = spark.createDataFrame(events, SENSOR_EVENT_SCHEMA)

    alerts = flatten_alerts(df)
    # alerts out == Σ metrics (0-metric events vanish, none duplicated)
    assert alerts.count() == sum(len(e["metrics"]) for e in events)

    env = with_kafka_envelope(df).select(
        "key",
        "timestamp",
        F.date_format("event_time", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("et"),
    )
    rows = env.collect()
    assert len(rows) == len(valid_flags)
    fallback_et = dt.datetime.fromtimestamp(FALLBACK_SECONDS, dt.timezone.utc).strftime(
        "%Y-%m-%d %H:%M:%S.%f"
    )
    ts_to_valid = dict((ts, ok) for ts, ok in _VALID_TS)
    for r in rows:
        if ts_to_valid[r.timestamp]:
            assert r.et.startswith("2025-01-31 04:15:06"), (r.timestamp, r.et)
        else:
            assert r.et == fallback_et, (r.timestamp, r.et)
