"""Streaming parity tests (SURVEY.md §5): the reference's pipeline
driven hermetically through file streams, windows/watermarks, and the
replay-twice dedup contract (W4) the reference lacks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from event_stream_aggr_spark.schemas import SENSOR_EVENT_SCHEMA
from event_stream_aggr_spark.sources.files import stream_parquet_dir
from event_stream_aggr_spark.streaming.pipeline import snort_alert_stream
from event_stream_aggr_spark.streaming.stats import IntervalStatsListener, windowed_stats
from event_stream_aggr_spark.streaming.windows import session_agg, sliding_agg, tumbling_agg
from tests.fixtures import make_sensor_event


def _run_to_memory(df, name, mode="append"):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return q


def _write_events(spark, path, events):
    spark.createDataFrame(events, schema=SENSOR_EVENT_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_snort_pipeline_streaming_end_to_end(spark, tmp_path):
    src = str(tmp_path / "sensor_events")
    _write_events(spark, src, [make_sensor_event(i, 2) for i in range(5)])
    stream = stream_parquet_dir(spark, src, SENSOR_EVENT_SCHEMA, max_files_per_trigger=1)
    assert stream.isStreaming
    _run_to_memory(snort_alert_stream(stream), "alerts_out")
    out = spark.sql("SELECT * FROM alerts_out")
    assert out.count() == 10  # 5 events x 2 metrics
    r = out.filter(F.col("msg") == "test alert 3").collect()[0]
    assert r.key is not None and len(r.headers) == 4


def test_replay_twice_dedup_contract(spark, tmp_path):
    """Reference: redelivery duplicates output (at-least-once,
    app.go:220). Our W4 upgrade: same input replayed → one output."""
    src = str(tmp_path / "replay")
    # 2 metrics per event: sibling alerts share the event hash and must
    # BOTH survive dedup — only the redelivered copies are dropped
    events = [make_sensor_event(i, 2) for i in range(3)]
    _write_events(spark, src, events)
    _write_events(spark, src, events)  # the "redelivery"
    stream = stream_parquet_dir(spark, src, SENSOR_EVENT_SCHEMA, max_files_per_trigger=1)

    _run_to_memory(snort_alert_stream(stream, dedupe=False), "dup_out")
    assert spark.sql("SELECT * FROM dup_out").count() == 12  # reference behavior

    _run_to_memory(snort_alert_stream(stream, dedupe=True), "dedup_out")
    assert spark.sql("SELECT * FROM dedup_out").count() == 6  # deduped


def _write_ts_rows(spark, path, rows, schema="id long, ts_str string"):
    spark.createDataFrame(rows, schema).select(
        "id", F.to_timestamp("ts_str").alias("ts")
    ).coalesce(1).write.mode("append").parquet(path)


def test_tumbling_window_agg(spark, tmp_path):
    src = str(tmp_path / "ev")
    _write_ts_rows(spark, src, [(i, f"2024-01-01 00:{i:02d}:30") for i in range(10)])
    # second micro-batch advances the watermark past both windows so
    # append mode emits them (late-data semantics, SURVEY W3)
    _write_ts_rows(spark, src, [(99, "2024-01-01 00:30:00")])
    stream = (
        spark.readStream.schema("id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    agg = tumbling_agg(
        stream, "ts", "5 minutes", [], [F.count(F.lit(1)).alias("n")], watermark="1 minute"
    )
    _run_to_memory(agg, "tumb", mode="append")
    got = {
        r.window.start.minute: r.n
        for r in spark.sql("SELECT * FROM tumb").collect()
    }
    # rows 0..9 over minutes 0-9 → two full 5-min windows of 5 events
    assert got.get(0) == 5 and got.get(5) == 5


def test_sliding_and_session_windows_batch_semantics(spark):
    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:10"), (1, "2024-01-01 00:00:50"),
         (1, "2024-01-01 00:10:00"), (2, "2024-01-01 00:00:20")],
        "uid long, ts_str string",
    ).select("uid", F.to_timestamp("ts_str").alias("ts"))
    slid = sliding_agg(df, "ts", "2 minutes", "1 minute", ["uid"],
                       [F.count(F.lit(1)).alias("n")])
    # event at 00:00:10 appears in windows starting 23:59 and 00:00
    assert slid.filter(F.col("uid") == 2).count() == 2
    sess = session_agg(df, "ts", "5 minutes", ["uid"], [F.count(F.lit(1)).alias("n")])
    rows = {(r.uid, r.n) for r in sess.collect()}
    # uid 1: two events within 5min gap → one session of 2, plus a lone session
    assert (1, 2) in rows and (1, 1) in rows and (2, 1) in rows


def test_interval_stats_listener(spark, tmp_path):
    src = str(tmp_path / "stats_src")
    _write_events(spark, src, [make_sensor_event(i, 1) for i in range(4)])
    listener = IntervalStatsListener()
    spark.streams.addListener(listener)
    try:
        stream = stream_parquet_dir(spark, src, SENSOR_EVENT_SCHEMA, max_files_per_trigger=1)
        _run_to_memory(snort_alert_stream(stream), "stats_out")
        # listener callbacks arrive on an async bus — wait for them
        import time

        for _ in range(40):
            if sum(s["events"] for s in listener.snapshots) >= 4:
                break
            time.sleep(0.25)
    finally:
        spark.streams.removeListener(listener)
    total_events = sum(s["events"] for s in listener.snapshots)
    assert total_events == 4  # one input row per event (explode is downstream)
    assert max(s["total"] for s in listener.snapshots) == 4
    assert all("batch_duration_ms" in s for s in listener.snapshots)


def test_windowed_stats_stream(spark, tmp_path):
    src = str(tmp_path / "wstats")

    def write(rows):
        spark.createDataFrame(rows, "id long, ts_str string, is_err boolean").select(
            "id", F.to_timestamp("ts_str").alias("ts"), "is_err"
        ).coalesce(1).write.mode("append").parquet(src)

    write([(i, f"2024-01-01 00:00:{i:02d}", i % 3 == 0) for i in range(30)])
    write([(99, "2024-01-01 00:05:00", False)])  # watermark flusher
    stream = (
        spark.readStream.schema("id long, ts timestamp, is_err boolean")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    stats = windowed_stats(stream, "ts", interval="10 seconds",
                           failed_predicate=F.col("is_err"))
    _run_to_memory(stats, "wstats_out", mode="append")
    got = {r.window.start.second: (r.events, r.failed, r.events_per_sec)
           for r in spark.sql("SELECT * FROM wstats_out").collect()}
    assert got[0] == (10, 4, 1.0) and got[10] == (10, 3, 1.0)


@pytest.mark.slow
def test_running_totals_with_state(spark, tmp_path):
    from event_stream_aggr_spark.streaming.stats import running_totals_with_state

    src = str(tmp_path / "state_src")
    spark.createDataFrame(
        [(f"s{i % 2}",) for i in range(6)], "sensor string"
    ).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema("sensor string").parquet(src)
    out = running_totals_with_state(stream, "sensor")
    q = (out.writeStream.format("memory").queryName("rt_out")
         .outputMode("update").start())
    q.processAllAvailable()
    q.stop()
    rows = {r.key: r.total for r in spark.sql("SELECT * FROM rt_out").collect()}
    assert rows == {"s0": 3, "s1": 3}


def test_stream_static_join(spark, tmp_path):
    """J6: streaming fact joined to a static broadcast dimension."""
    src = str(tmp_path / "j6")
    spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30)], "k long, v long"
    ).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema("k long, v long").parquet(src)
    dim = spark.createDataFrame([(1, "one"), (2, "two")], "k long, label string")
    joined = stream.join(F.broadcast(dim), "k", "left")
    _run_to_memory(joined, "j6_out")
    got = {r.k: r.label for r in spark.sql("SELECT * FROM j6_out").collect()}
    assert got == {1: "one", 2: "two", 3: None}


def test_stream_stream_join_with_watermarks(spark, tmp_path):
    """J7: stream-stream inner join with watermarks + time-range bound."""
    left_src = str(tmp_path / "j7l")
    right_src = str(tmp_path / "j7r")
    spark.createDataFrame(
        [(1, "2024-01-01 00:00:10"), (2, "2024-01-01 00:05:00")], "k long, ts_str string"
    ).select("k", F.to_timestamp("ts_str").alias("lts")).coalesce(1).write.parquet(left_src)
    spark.createDataFrame(
        [(1, "2024-01-01 00:00:40"), (2, "2024-01-01 00:30:00")], "k long, ts_str string"
    ).select("k", F.to_timestamp("ts_str").alias("rts")).coalesce(1).write.parquet(right_src)
    l = spark.readStream.schema("k long, lts timestamp").parquet(left_src).withWatermark("lts", "1 minute")
    r = spark.readStream.schema("k long, rts timestamp").parquet(right_src).withWatermark("rts", "1 minute")
    joined = l.join(
        r,
        (l.k == r.k)
        & (r.rts >= l.lts)
        & (r.rts <= l.lts + F.expr("INTERVAL 2 MINUTES")),
    )
    _run_to_memory(joined.select(l.k, "lts", "rts"), "j7_out")
    got = {r.k for r in spark.sql("SELECT * FROM j7_out").collect()}
    assert got == {1}  # k=2's right event is outside the 2-minute bound


def test_foreach_batch_sink_and_available_now_trigger(spark, tmp_path):
    """W6: foreachBatch (custom exactly-once-style sink) + the
    availableNow trigger (bounded catch-up run, the batch-replay mode
    a backfill job uses)."""
    src = str(tmp_path / "fb_src")
    out_dir = str(tmp_path / "fb_out")
    _write_events(spark, src, [make_sensor_event(i, 1) for i in range(4)])
    stream = stream_parquet_dir(spark, src, SENSOR_EVENT_SCHEMA, max_files_per_trigger=1)

    def sink(batch_df, epoch_id):
        # idempotent per-epoch write — the foreachBatch exactly-once recipe
        batch_df.select("key", "msg").write.mode("overwrite").parquet(
            f"{out_dir}/epoch={epoch_id}"
        )

    q = (
        snort_alert_stream(stream)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "fb_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)  # availableNow terminates after catch-up
    assert not q.isActive
    written = spark.read.parquet(f"{out_dir}/epoch=*")
    assert written.count() == 4
    assert written.select("key").distinct().count() == 4


@pytest.mark.slow
def test_running_totals_transform_with_state(spark, tmp_path):
    """W5 on the modern Spark 4 API (typed ValueState + RocksDB).
    Requires google.protobuf for the state protocol — absent in this
    container, so this skips (the applyInPandasWithState variant above
    covers W5 here)."""
    pytest.importorskip("google.protobuf.descriptor")
    from event_stream_aggr_spark.streaming.stats import (
        running_totals_transform_with_state,
    )

    src = str(tmp_path / "tws_src")
    spark.createDataFrame(
        [(f"s{i % 2}",) for i in range(6)], "sensor string"
    ).coalesce(1).write.parquet(src)
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = spark.readStream.schema("sensor string").parquet(src)
        out = running_totals_transform_with_state(stream, "sensor")
        q = (out.writeStream.format("memory").queryName("tws_out")
             .outputMode("update").start())
        q.processAllAvailable()
        q.stop()
        rows = {r.key: r.total for r in spark.sql("SELECT * FROM tws_out").collect()}
        assert rows == {"s0": 3, "s1": 3}
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_streaming_protobuf_decode_pipeline(spark, tmp_path):
    # S1-stand-in → S3 decode → envelope, as one streaming query: raw
    # protobuf VALUE bytes arrive in micro-batches, alerts come out
    from pyspark.sql import types as T

    from event_stream_aggr_spark.plans.snort import with_kafka_envelope
    from event_stream_aggr_spark.sources.files import stream_parquet_dir
    from event_stream_aggr_spark.sources.protobuf_wire import (
        decode_sensor_events_py,
        encode_sensor_event,
    )
    from tests.fixtures import make_sensor_event

    src = str(tmp_path / "pb_stream")
    events = [make_sensor_event(i, n_metrics=2) for i in range(10)]
    schema = T.StructType([T.StructField("value", T.BinaryType(), False)])
    spark.createDataFrame(
        [(bytearray(encode_sensor_event(e)),) for e in events], schema
    ).repartition(4).write.parquet(src)

    stream = stream_parquet_dir(spark, src, schema, max_files_per_trigger=2)
    alerts = with_kafka_envelope(decode_sensor_events_py(stream))
    q = (
        alerts.writeStream.format("memory")
        .queryName("pb_alerts")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.table("pb_alerts").collect()
    assert len(out) == 20  # 10 events x 2 metrics
    assert all(r.key is not None and r.sid >= 1000000 for r in out)


def test_checkpoint_restart_resumes_exactly_once(spark, tmp_path):
    # S6: source progress lives in the checkpoint — a restarted query
    # must process only NEW files, never re-deliver consumed ones
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from event_stream_aggr_spark.sources.files import stream_parquet_dir

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    schema = T.StructType([T.StructField("k", T.LongType(), False)])

    def run_once():
        stream = stream_parquet_dir(spark, src, schema, max_files_per_trigger=1)
        q = (
            stream.writeStream.foreachBatch(
                lambda df, _eid: df.write.mode("append").parquet(out)
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    spark.createDataFrame([(i,) for i in range(5)], schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    run_once()
    spark.createDataFrame([(i,) for i in range(5, 10)], schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    run_once()  # same checkpoint: must pick up ONLY the new file

    got = spark.read.parquet(out)
    assert got.count() == 10                       # nothing lost...
    assert got.select("k").distinct().count() == 10  # ...nothing re-delivered
    assert got.agg(F.sum("k")).collect()[0][0] == sum(range(10))
