"""The reference's end-to-end streaming job on Structured Streaming.

Batch and streaming share the SAME transformation (plans/snort.py) —
a DataFrame chain doesn't care whether its source is bounded. This is
the architectural payoff over the reference's hand-rolled consumer
loop (app.go:112-171): the whole job is

    source → with_kafka_envelope → [dedupe] → sink

and every operator stays narrow (no shuffle) unless stats/windows are
added. Kafka endpoints come from sources/kafka.py; hermetic tests
drive the identical pipeline through file streams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from event_stream_aggr_spark.plans.snort import with_kafka_envelope


def snort_alert_stream(sensor_events: DataFrame, dedupe: bool = False) -> DataFrame:
    """SensorEvent stream → enveloped SnortAlert stream (E2 parity).

    ``dedupe=True`` adds the W4 upgrade: redelivered events (same
    event_hash_sha256) are dropped within the watermark horizon
    instead of being produced twice as the reference does. The dedup
    identity is (event hash, metric index) — all N alerts of one event
    share the event-level hash (app.go:182), so keying on the hash
    alone would collapse sibling alerts, not just redeliveries.
    """
    alerts = with_kafka_envelope(sensor_events)
    if dedupe:
        if alerts.isStreaming:
            alerts = alerts.withWatermark(
                "event_time", "10 minutes"
            ).dropDuplicatesWithinWatermark(["key", "metric_idx"])
        else:
            alerts = alerts.dropDuplicates(["key", "metric_idx"])
    return alerts
