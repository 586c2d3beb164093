"""Golden scalar tests — conformance fixtures from the reference's own
test suite (processor_test.go) plus corner cases (FIXTURES.md §A4)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from event_stream_aggr_spark.functions.scalar import (
    iso_micro_timestamp,
    parse_snort_event_time,
    priority_label,
    round_time,
    sha256_hex,
)


def _eval(spark, col, **data):
    df = spark.createDataFrame(
        [tuple(data.values())], list(data.keys())
    )
    return df.select(col.alias("out")).collect()[0].out


@pytest.mark.parametrize(
    ("micros", "expected"),
    [
        # the reference's only golden (processor_test.go:14-18)
        (1738296906927463, "2025-01-31T04:15:06.927Z"),
        # trailing-zero suppression of Go's ".999" layout
        (1738296906920000, "2025-01-31T04:15:06.92Z"),
        (1738296906900000, "2025-01-31T04:15:06.9Z"),
        (1738296906000000, "2025-01-31T04:15:06Z"),
        # truncation (not rounding) of sub-millisecond digits
        (1738296906999999, "2025-01-31T04:15:06.999Z"),
        (1738296910000500, "2025-01-31T04:15:10Z"),
    ],
)
def test_iso_micro_timestamp_golden(spark, micros, expected):
    assert _eval(spark, iso_micro_timestamp("m"), m=micros) == expected


@pytest.mark.parametrize(
    ("priority", "expected"),
    [(1, "High"), (2, "Medium"), (3, "Low"), (0, "Informational"), (99, "Informational")],
)
def test_priority_label(spark, priority, expected):
    # processor.go:109-120
    assert _eval(spark, priority_label("p"), p=priority) == expected


def test_snort_event_time_parse(spark):
    out = _eval(
        spark,
        F.date_format(parse_snort_event_time("ts", "fb"), "yyyy-MM-dd HH:mm:ss.SSSSSS"),
        ts="25/01/31-04:15:06.927463",
        fb=0,
    )
    assert out == "2025-01-31 04:15:06.927463"


def test_snort_event_time_fallback(spark):
    # malformed timestamp → epoch-seconds fallback (app.go:195-198)
    out = _eval(
        spark,
        F.date_format(parse_snort_event_time("ts", "fb"), "yyyy-MM-dd HH:mm:ss"),
        ts="not-a-timestamp",
        fb=1738296906,
    )
    assert out == "2025-01-31 04:15:06"


def test_sha256_hex(spark):
    out = _eval(spark, sha256_hex("s"), s="abc")
    assert out == "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad"


@pytest.mark.parametrize(
    ("t", "n", "expected"),
    [(1738296906, 10, 1738296900), (1738296906, 60, 1738296900), (99, 100, 0)],
)
def test_round_time(spark, t, n, expected):
    # processor.go:105-107: (t / n) * n integer floor
    assert _eval(spark, round_time("t", n), t=t) == expected


@pytest.mark.parametrize(
    ("ts", "expected"),
    [
        # Go's ".999999" layout accepts 0-6 fraction digits
        ("25/01/31-04:15:06.927463", "2025-01-31 04:15:06.927463"),
        ("25/01/31-04:15:06.9274", "2025-01-31 04:15:06.927400"),
        ("25/01/31-04:15:06.9", "2025-01-31 04:15:06.900000"),
        ("25/01/31-04:15:06", "2025-01-31 04:15:06.000000"),
    ],
)
def test_snort_event_time_variable_fraction(spark, ts, expected):
    out = _eval(
        spark,
        F.date_format(parse_snort_event_time("ts", "fb"), "yyyy-MM-dd HH:mm:ss.SSSSSS"),
        ts=ts,
        fb=0,
    )
    assert out == expected


def test_avro_payload_columns_exclude_internal():
    from event_stream_aggr_spark.sources.kafka import avro_payload_columns

    cols = ["key", "headers", "event_time", "metric_idx", "_tmp", "sid", "message"]
    assert avro_payload_columns(cols) == ["sid", "message"]
