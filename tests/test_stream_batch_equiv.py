"""Streaming↔batch equivalence at the data level (the reference's A1
interval-stats parity, app.go:75-110): the same event-time hourly
rollup computed (a) as a batch query and (b) as a multi-micro-batch
file-stream query must produce identical results.

countDistinct is excluded (unsupported in streaming aggregation —
documented trade; q29's approx_count_distinct is the streaming-safe
form); the sum uses DECIMAL so accumulation order cannot perturb
equality."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from event_stream_aggr_spark.sources.files import stream_parquet_dir
from event_stream_aggr_spark.tables import load_table


def _hourly_rollup(df: DataFrame) -> DataFrame:
    return df.groupBy(
        F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss").alias(
            "hour_bucket"
        ),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(38,6)")).alias("total_value"),
    )


def test_stream_batch_equivalence_hourly_rollup(spark, sf_dir, tmp_path):
    src = str(tmp_path / "events_stream")
    load_table(spark, sf_dir, "events").repartition(6).write.parquet(src)

    stored = spark.read.parquet(src)
    batch = {
        (r.hour_bucket, r.event_type): (r.n, r.total_value)
        for r in _hourly_rollup(stored).collect()
    }

    stream = stream_parquet_dir(spark, src, stored.schema, max_files_per_trigger=2)
    q = (
        _hourly_rollup(stream)
        .writeStream.format("memory")
        .queryName("sb_equiv")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r.hour_bucket, r.event_type): (r.n, r.total_value)
        for r in spark.table("sb_equiv").collect()
    }
    assert q.lastProgress["batchId"] >= 1  # really ran >1 micro-batch
    assert streamed == batch and len(batch) > 0


def _daily_features(df: DataFrame) -> DataFrame:
    # the streaming-safe core of qf01: entity-day grain, pivoted
    # conditional counts, DECIMAL value sum (the trailing RANGE window
    # is batch-side post-processing over this far smaller relation)
    return df.groupBy(
        "user_id", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("n_click"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("n_purchase"),
        F.sum(F.col("value").cast("decimal(38,6)")).alias("vdec"),
    )


def test_stream_batch_equivalence_daily_feature_matrix(spark, sf_dir, tmp_path):
    """The feature-store ingestion contract: qf01's entity-day
    aggregation computed over a multi-micro-batch file stream equals
    the batch result exactly — so a streaming feature pipeline and a
    batch backfill produce byte-identical feature rows (counts exact,
    value sums DECIMAL → order-independent)."""
    src = str(tmp_path / "events_feat_stream")
    load_table(spark, sf_dir, "events").repartition(6).write.parquet(src)

    stored = spark.read.parquet(src)
    batch = {
        (r.user_id, r.day): (r.n_click, r.n_purchase, r.vdec)
        for r in _daily_features(stored).collect()
    }

    stream = stream_parquet_dir(spark, src, stored.schema, max_files_per_trigger=2)
    q = (
        _daily_features(stream)
        .writeStream.format("memory")
        .queryName("sb_feat_equiv")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r.user_id, r.day): (r.n_click, r.n_purchase, r.vdec)
        for r in spark.table("sb_feat_equiv").collect()
    }
    assert q.lastProgress["batchId"] >= 1
    assert streamed == batch and len(batch) > 0


def test_stream_batch_equivalence_ewma(spark, sf_dir, tmp_path):
    """q69's streaming twin: the stateful trailing-window EWMA over an
    in-order replay must equal the batch window computation row for
    row (ids, window sizes, AND rounded values)."""
    from event_stream_aggr_spark.plans.relational import q69_ewma_smoothing
    from event_stream_aggr_spark.streaming.stats import ewma_with_state

    src = str(tmp_path / "events_ordered")
    # In-order replay: each file holds a contiguous time slice and the
    # slices are written SEQUENTIALLY (the file source orders by
    # modification time, so a single parallel write would arrive in
    # task-completion order, not time order — the flake this replaces)
    import time

    tsm = "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    events = load_table(spark, sf_dir, "events").withColumn("_tsm", F.expr(tsm))
    cuts = events.selectExpr(
        "percentile(_tsm, array(0.25, 0.5, 0.75)) AS c"
    ).collect()[0].c
    bounds = [float("-inf"), *cuts, float("inf")]
    for lo, hi in zip(bounds, bounds[1:]):
        (
            events.filter((F.col("_tsm") > lo) & (F.col("_tsm") <= hi))
            .drop("_tsm")
            .sortWithinPartitions("ts", "event_id")
            .coalesce(1)
            .write.mode("append")
            .parquet(src)
        )
        time.sleep(0.1)  # tick mtime so arrival order is the slice order
    stored = spark.read.parquet(src)

    # batch side: run q69's registered dataflow over the SAME stored data
    import os

    tmp_sf = str(tmp_path / "sf_view")
    os.makedirs(tmp_sf, exist_ok=True)
    stored.write.mode("overwrite").parquet(f"{tmp_sf}/events.parquet")
    batch = {
        r.event_id: (r.n_window, r.ewma)
        for r in q69_ewma_smoothing(spark, tmp_sf).collect()
    }

    stream = stream_parquet_dir(spark, src, stored.schema, max_files_per_trigger=1)
    q = (
        ewma_with_state(stream)
        .writeStream.format("memory")
        .queryName("ewma_equiv")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    streamed = {
        r.event_id: (r.n_window, r.ewma) for r in spark.table("ewma_equiv").collect()
    }
    assert q.lastProgress["batchId"] >= 1  # genuinely multi-batch
    assert len(streamed) == len(batch) > 0
    mismatches = {
        k: (streamed[k], batch[k]) for k in batch if streamed.get(k) != batch[k]
    }
    assert not mismatches, list(mismatches.items())[:5]


def test_stream_batch_equivalence_incremental_rollup(spark, sf_dir, tmp_path):
    """qi01's streaming story: a foreachBatch sink that MERGES each
    micro-batch's partial rollup into the stored state (never
    re-scanning history) converges to exactly the batch rollup —
    the monoid state makes streaming maintenance and batch backfill
    interchangeable."""
    from event_stream_aggr_spark.operators.incremental import (
        finalize_rollup,
        merge_rollups,
        partial_rollup,
    )

    src = str(tmp_path / "events_ivm_stream")
    state_dir = str(tmp_path / "ivm_state")
    load_table(spark, sf_dir, "events").repartition(6).write.parquet(src)
    stored = spark.read.parquet(src)

    batch = {tuple(r) for r in finalize_rollup(partial_rollup(stored)).collect()}

    n_batches = [0]

    def upsert_state(bdf: DataFrame, batch_id: int) -> None:
        n_batches[0] += 1
        delta = partial_rollup(bdf)
        import os

        if os.path.exists(state_dir):
            prev = bdf.sparkSession.read.parquet(state_dir)
            merged = merge_rollups(prev, delta)
        else:
            merged = delta
        # stage then atomically replace (the CDC-upsert sink pattern)
        staged = merged.collect()
        bdf.sparkSession.createDataFrame(staged, delta.schema).write.mode(
            "overwrite"
        ).parquet(state_dir)

    stream = stream_parquet_dir(spark, src, stored.schema, max_files_per_trigger=2)
    q = (
        stream.writeStream.foreachBatch(upsert_state)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ivm_ckpt"))
        .start()
    )
    q.awaitTermination(120)
    assert n_batches[0] >= 2  # state really merged across micro-batches
    streamed = {
        tuple(r)
        for r in finalize_rollup(spark.read.parquet(state_dir)).collect()
    }
    assert streamed == batch and len(batch) > 0


def test_stream_batch_equivalence_cep(spark, sf_dir, tmp_path):
    """q74's streaming twin: the stateful two-register CEP matcher over
    an in-order replay must emit exactly the batch pattern matches
    (same purchases, same chosen clicks, same gaps)."""
    import os
    import time

    from event_stream_aggr_spark.plans.relational import q74_cep_match
    from event_stream_aggr_spark.streaming.stats import cep_match_with_state

    src = str(tmp_path / "events_cep_ordered")
    tsm = "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    events = load_table(spark, sf_dir, "events").withColumn("_tsm", F.expr(tsm))
    cuts = events.selectExpr(
        "percentile(_tsm, array(0.25, 0.5, 0.75)) AS c"
    ).collect()[0].c
    bounds = [float("-inf"), *cuts, float("inf")]
    for lo, hi in zip(bounds, bounds[1:]):
        (
            events.filter((F.col("_tsm") > lo) & (F.col("_tsm") <= hi))
            .drop("_tsm")
            .sortWithinPartitions("ts", "event_id")
            .coalesce(1)
            .write.mode("append")
            .parquet(src)
        )
        time.sleep(0.1)
    stored = spark.read.parquet(src)

    tmp_sf = str(tmp_path / "sf_view_cep")
    os.makedirs(tmp_sf, exist_ok=True)
    stored.write.mode("overwrite").parquet(f"{tmp_sf}/events.parquet")
    batch = {
        (r.event_id, r.user_id, r.click_ts, r.purchase_ts, r.gap_seconds)
        for r in q74_cep_match(spark, tmp_sf).collect()
    }

    stream = stream_parquet_dir(spark, src, stored.schema, max_files_per_trigger=1)
    stream_tsm = stream.withColumn("tsm", F.expr(tsm))
    q = (
        cep_match_with_state(stream_tsm)
        .writeStream.format("memory")
        .queryName("cep_equiv")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    to_ts = lambda c: F.expr(  # noqa: E731
        f"timestampadd(MICROSECOND, {c}, TIMESTAMP_NTZ '1970-01-01 00:00:00')"
    )
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    streamed = {
        (r.event_id, r.user_id, r.click_ts, r.purchase_ts, r.gap_seconds)
        for r in spark.table("cep_equiv")
        .select(
            "event_id",
            "user_id",
            F.date_format(to_ts("ctsm"), fmt).alias("click_ts"),
            F.date_format(to_ts("ptsm"), fmt).alias("purchase_ts"),
            F.expr("(ptsm - ctsm) div 1000000").alias("gap_seconds"),
        )
        .collect()
    }
    assert q.lastProgress["batchId"] >= 1
    assert streamed == batch and len(batch) > 0


def test_stream_batch_equivalence_throttle(spark, sf_dir, tmp_path):
    """q78's streaming twin: the two-scalar per-key throttle counter
    over an in-order replay tags kept/suppressed exactly as the batch
    rank does (aggregate parity per (signature, hour))."""
    import os
    import time

    from event_stream_aggr_spark.plans.relational import (
        THROTTLE_N,
        q78_alert_throttle,
    )
    from event_stream_aggr_spark.streaming.stats import throttle_with_state

    src = str(tmp_path / "events_throttle_ordered")
    tsm = "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    events = load_table(spark, sf_dir, "events").withColumn("_tsm", F.expr(tsm))
    cuts = events.selectExpr(
        "percentile(_tsm, array(0.25, 0.5, 0.75)) AS c"
    ).collect()[0].c
    bounds = [float("-inf"), *cuts, float("inf")]
    for lo, hi in zip(bounds, bounds[1:]):
        (
            events.filter((F.col("_tsm") > lo) & (F.col("_tsm") <= hi))
            .drop("_tsm")
            .sortWithinPartitions("ts", "event_id")
            .coalesce(1)
            .write.mode("append")
            .parquet(src)
        )
        time.sleep(0.1)
    stored = spark.read.parquet(src)

    tmp_sf = str(tmp_path / "sf_view_throttle")
    os.makedirs(tmp_sf, exist_ok=True)
    stored.write.mode("overwrite").parquet(f"{tmp_sf}/events.parquet")
    batch = {
        (r.event_type, r.hnum): (r.n_alerts, r.n_kept, r.n_suppressed)
        for r in q78_alert_throttle(spark, tmp_sf).collect()
    }

    hnum = "timestampdiff(HOUR, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    stream = (
        stream_parquet_dir(spark, src, stored.schema, max_files_per_trigger=1)
        .where(F.col("event_type") == "error")
        .withColumn("hnum", F.expr(hnum))
    )
    q = (
        throttle_with_state(stream, n=THROTTLE_N)
        .writeStream.format("memory")
        .queryName("throttle_equiv")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r.event_type, r.hnum): (r.n, r.k, r.n - r.k)
        for r in spark.table("throttle_equiv")
        .groupBy("event_type", "hnum")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("kept").cast("long")).alias("k"),
        )
        .collect()
    }
    assert q.lastProgress["batchId"] >= 1
    assert streamed == batch and len(batch) > 0


def test_stream_batch_equivalence_markov_transitions(spark, sf_dir, tmp_path):
    """q80's streaming twin: per-user last-event state emits one
    transition row per arriving event; counting the emitted rows per
    (prev, next) equals the batch lag-window transition counts — so
    the online next-event model trains on exactly the rows a batch
    backfill would produce."""
    import os
    import time

    from event_stream_aggr_spark.plans.relational import q80_markov_transitions
    from event_stream_aggr_spark.streaming.stats import transitions_with_state

    src = str(tmp_path / "events_markov_ordered")
    tsm = "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    events = load_table(spark, sf_dir, "events").withColumn("_tsm", F.expr(tsm))
    cuts = events.selectExpr(
        "percentile(_tsm, array(0.25, 0.5, 0.75)) AS c"
    ).collect()[0].c
    bounds = [float("-inf"), *cuts, float("inf")]
    for lo, hi in zip(bounds, bounds[1:]):
        (
            events.filter((F.col("_tsm") > lo) & (F.col("_tsm") <= hi))
            .drop("_tsm")
            .sortWithinPartitions("ts", "event_id")
            .coalesce(1)
            .write.mode("append")
            .parquet(src)
        )
        time.sleep(0.1)
    stored = spark.read.parquet(src)

    tmp_sf = str(tmp_path / "sf_view_markov")
    os.makedirs(tmp_sf, exist_ok=True)
    stored.write.mode("overwrite").parquet(f"{tmp_sf}/events.parquet")
    batch = {
        (r.prev_type, r.next_type): r.n
        for r in q80_markov_transitions(spark, tmp_sf).collect()
    }

    stream = stream_parquet_dir(
        spark, src, stored.schema, max_files_per_trigger=1
    ).withColumn("tsm", F.expr(tsm))
    q = (
        transitions_with_state(stream)
        .writeStream.format("memory")
        .queryName("markov_equiv")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r.prev_type, r.next_type): r.n
        for r in spark.table("markov_equiv")
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert q.lastProgress["batchId"] >= 1
    assert streamed == batch and len(batch) > 0


def test_stream_batch_equivalence_lsh_index_maintenance(spark, sf_dir, tmp_path):
    """Dedup-index maintenance: the banded-MinHash index built
    incrementally over a multi-micro-batch document stream (per-batch
    signature rows appended — the index is an append-only monoid
    because signatures are per-row deterministic) equals the
    batch-built index row-for-row, and the candidate pairs derived
    from the streamed index equal batch qd04's candidates."""
    from event_stream_aggr_spark.operators.dedup import (
        lsh_candidates,
        minhash_signatures,
    )

    src = str(tmp_path / "docs_lsh_stream")
    docs = load_table(spark, sf_dir, "documents")
    docs.repartition(4).write.parquet(src)
    stored = spark.read.parquet(src)

    batch_index = {
        tuple(r)
        for r in minhash_signatures(stored).collect()
    }
    batch_pairs = {
        (r.doc_a, r.doc_b) for r in lsh_candidates(stored).collect()
    }

    # foreachBatch index maintenance: per micro-batch, compute the
    # arriving docs' signatures (each doc is one row, so the per-doc
    # aggregation is complete within its batch) and APPEND to the
    # stored index — the monoid update a real dedup index runs.
    idx_dir = str(tmp_path / "lsh_index")
    n_batches = [0]

    def update_index(batch_df, batch_id):
        n_batches[0] += 1
        minhash_signatures(batch_df).write.mode("append").parquet(idx_dir)

    stream = stream_parquet_dir(spark, src, stored.schema, max_files_per_trigger=1)
    q = (
        stream.writeStream.foreachBatch(update_index)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed_index = {
        tuple(r) for r in spark.read.parquet(idx_dir).collect()
    }
    assert n_batches[0] >= 2
    assert streamed_index == batch_index and len(batch_index) > 0

    # pairs derived from the streamed (accumulated) index match batch
    streamed_pairs = {
        (r.doc_a, r.doc_b)
        for r in lsh_candidates(
            spark.read.parquet(idx_dir).join(
                stored.select("doc_id", "text"), "doc_id"
            ).select("doc_id", "text")
        ).collect()
    }
    assert streamed_pairs == batch_pairs


def test_stream_batch_equivalence_interval_union(spark, sf_dir, tmp_path):
    """qj02's streaming twin: the per-user open-island state machine
    over an in-order replay must equal the batch gaps-and-islands
    result exactly — islands, interval counts, AND covered seconds."""
    import os
    import time

    from event_stream_aggr_spark.operators.interval import qj02_interval_union
    from event_stream_aggr_spark.streaming.stats import interval_union_with_state

    src = str(tmp_path / "events_ivu")
    tsm = "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    events = load_table(spark, sf_dir, "events").withColumn("tsm", F.expr(tsm))
    cuts = events.selectExpr(
        "percentile(tsm, array(0.25, 0.5, 0.75)) AS c"
    ).collect()[0].c
    bounds = [float("-inf"), *cuts, float("inf")]
    for lo, hi in zip(bounds, bounds[1:]):
        (
            events.filter((F.col("tsm") > lo) & (F.col("tsm") <= hi))
            .select("event_id", "user_id", "tsm", "ts")
            .sortWithinPartitions("tsm", "event_id")
            .coalesce(1)
            .write.mode("append")
            .parquet(src)
        )
        time.sleep(0.1)  # tick mtime so arrival order is the slice order
    stored = spark.read.parquet(src)

    tmp_sf = str(tmp_path / "sf_ivu")
    os.makedirs(tmp_sf, exist_ok=True)
    stored.drop("tsm").write.mode("overwrite").parquet(f"{tmp_sf}/events.parquet")
    batch = {
        r.user_id: (r.n_islands, r.n_intervals, r.covered_sec)
        for r in qj02_interval_union(spark, tmp_sf).collect()
    }

    stream = stream_parquet_dir(
        spark, src, stored.schema, max_files_per_trigger=1
    )
    q = (
        interval_union_with_state(stream.drop("ts"))
        .writeStream.format("memory")
        .queryName("ivu_equiv")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    # n_intervals is monotone per user -> latest totals = max(n_intervals)
    rows = spark.table("ivu_equiv").collect()
    latest = {}
    for r in rows:
        cur = latest.get(r.user_id)
        if cur is None or r.n_intervals > cur[1]:
            latest[r.user_id] = (r.n_islands, r.n_intervals, r.covered_sec)
    assert q.lastProgress["batchId"] >= 1  # genuinely multi-batch
    assert len(latest) == len(batch) > 0
    mismatches = {
        u: (latest[u], batch[u]) for u in batch if latest.get(u) != batch[u]
    }
    assert not mismatches, list(mismatches.items())[:5]


def test_stream_batch_equivalence_rolling_median(spark, sf_dir, tmp_path):
    """q72's streaming twin: the bounded-trailing-window median state
    machine over an in-order replay must equal the batch RANGE-frame
    computation row for row (ids, window sizes, AND rounded values)."""
    import os
    import time

    from event_stream_aggr_spark.plans.relational import q72_rolling_median
    from event_stream_aggr_spark.streaming.stats import rolling_median_with_state

    src = str(tmp_path / "events_med")
    tsm = "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    events = load_table(spark, sf_dir, "events").withColumn("tsm", F.expr(tsm))
    cuts = events.selectExpr(
        "percentile(tsm, array(0.25, 0.5, 0.75)) AS c"
    ).collect()[0].c
    bounds = [float("-inf"), *cuts, float("inf")]
    for lo, hi in zip(bounds, bounds[1:]):
        (
            events.filter((F.col("tsm") > lo) & (F.col("tsm") <= hi))
            .select("event_id", "user_id", "value", "tsm", "ts")
            .sortWithinPartitions("tsm", "event_id")
            .coalesce(1)
            .write.mode("append")
            .parquet(src)
        )
        time.sleep(0.1)
    stored = spark.read.parquet(src)

    tmp_sf = str(tmp_path / "sf_med")
    os.makedirs(tmp_sf, exist_ok=True)
    stored.drop("tsm").write.mode("overwrite").parquet(f"{tmp_sf}/events.parquet")
    batch = {
        r.event_id: (r.n_window, r.rolling_median)
        for r in q72_rolling_median(spark, tmp_sf).collect()
    }

    stream = stream_parquet_dir(
        spark, src, stored.schema, max_files_per_trigger=1
    )
    q = (
        rolling_median_with_state(stream.drop("ts"))
        .writeStream.format("memory")
        .queryName("med_equiv")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    streamed = {
        r.event_id: (r.n_window, r.rolling_median)
        for r in spark.table("med_equiv").collect()
    }
    assert q.lastProgress["batchId"] >= 1
    assert len(streamed) == len(batch) > 0
    mismatches = {
        k: (streamed[k], batch[k]) for k in batch if streamed.get(k) != batch[k]
    }
    assert not mismatches, list(mismatches.items())[:5]


def test_stream_batch_equivalence_sliding_distinct(spark, sf_dir, tmp_path):
    """q73's streaming twin: per sliding window the stateful exact
    user-set + event counter must converge to the batch hourly-grain
    explode computation — counts AND exact distinct users."""
    from event_stream_aggr_spark.plans.relational import q73_sliding_distinct
    from event_stream_aggr_spark.streaming.stats import sliding_distinct_with_state

    src = str(tmp_path / "events_sld")
    tsm = "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    events = load_table(spark, sf_dir, "events").withColumn("tsm", F.expr(tsm))
    # window totals are arrival-order independent (set union + count
    # are commutative), so a plain multi-file replay suffices here
    events.select("event_id", "user_id", "tsm").repartition(4).write.parquet(src)
    stored = spark.read.parquet(src)

    import os

    tmp_sf = str(tmp_path / "sf_sld")
    os.makedirs(tmp_sf, exist_ok=True)
    load_table(spark, sf_dir, "events").write.mode("overwrite").parquet(
        f"{tmp_sf}/events.parquet"
    )
    batch = {
        r.window_start: (r.n_events, r.n_users)
        for r in q73_sliding_distinct(spark, tmp_sf).collect()
    }

    stream = stream_parquet_dir(spark, src, stored.schema, max_files_per_trigger=1)
    q = (
        sliding_distinct_with_state(stream)
        .writeStream.format("memory")
        .queryName("sld_equiv")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    latest = {}
    for r in spark.table("sld_equiv").collect():
        cur = latest.get(r.window_start)
        if cur is None or r.n_events > cur[0]:
            latest[r.window_start] = (r.n_events, r.n_users)
    assert q.lastProgress["batchId"] >= 1
    assert len(latest) == len(batch) > 0
    mismatches = {
        k: (latest[k], batch[k]) for k in batch if latest.get(k) != batch[k]
    }
    assert not mismatches, list(mismatches.items())[:5]


def test_stream_batch_equivalence_count_min_sketch(spark, sf_dir, tmp_path):
    """qh01's streaming twin: a foreachBatch maintainer that builds the
    per-micro-batch count-min counter table and MERGES it cell-wise
    into the stored sketch (operators/sketch.py:cms_merge — the same
    monoid contract as qi01's rollup) converges to EXACTLY the batch
    sketch, cell for cell, and the heavy-hitter estimates read through
    the streamed sketch equal qh01's batch output."""
    import os

    from event_stream_aggr_spark.operators.sketch import (
        cms_build,
        cms_estimate,
        cms_merge,
    )

    src = str(tmp_path / "events_cms_stream")
    state_dir = str(tmp_path / "cms_state")
    events = load_table(spark, sf_dir, "events").select("user_id")
    events.repartition(6).write.parquet(src)
    stored = spark.read.parquet(src)

    batch_cells = {
        (r.row, r.col): r.c for r in cms_build(stored, "user_id").collect()
    }

    from event_stream_aggr_spark.streaming.state_store import (
        merge_state_sink,
        read_state,
    )

    n_batches = [0]
    # the production epoch-gated merge store (chaos-tested for
    # crash-mid-batch replay in test_maintainer_replay_chaos.py)
    sink = merge_state_sink(
        state_dir,
        lambda s, b: cms_build(b, "user_id")
        if s is None
        else cms_merge(s, cms_build(b, "user_id")),
    )

    def upsert_sketch(bdf: DataFrame, batch_id: int) -> None:
        n_batches[0] += 1
        sink(bdf, batch_id)

    stream = stream_parquet_dir(spark, src, stored.schema, max_files_per_trigger=2)
    q = (
        stream.writeStream.foreachBatch(upsert_sketch)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "cms_ckpt"))
        .start()
    )
    q.awaitTermination(120)
    assert n_batches[0] >= 2  # sketch really merged across micro-batches

    streamed = read_state(spark, state_dir)[0]
    streamed_cells = {(r.row, r.col): r.c for r in streamed.collect()}
    assert streamed_cells == batch_cells and len(batch_cells) > 0

    # estimates read through the streamed sketch: never underestimate,
    # and equal the batch-sketch estimates key-for-key
    exact = stored.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_n"))
    top = exact.orderBy(F.desc("exact_n"), "user_id").limit(20)
    est_stream = {
        r.user_id: r.cms_n
        for r in cms_estimate(top.select("user_id"), "user_id", streamed).collect()
    }
    exact_n = {r.user_id: r.exact_n for r in top.collect()}
    assert set(est_stream) == set(exact_n)
    assert all(est_stream[u] >= exact_n[u] for u in exact_n)


def test_stream_batch_equivalence_inverted_index(spark, sf_dir, tmp_path):
    """qt19's streaming story: the inverted index maintained
    incrementally — per micro-batch, build the arriving docs' term-
    grain index and MERGE it into the stored index at term grain
    (operators/text.py:inverted_index_merge; df adds, postings sorted
    union — exact because batches carry disjoint docs) — equals the
    batch-built index term for term, posting for posting. The df
    floor is applied at READ time: a term crossing the floor only
    after later batches must appear in the final view (asserted), so
    the STORE stays unfloored."""
    import os

    from event_stream_aggr_spark.operators.text import (
        INDEX_MIN_DF,
        inverted_index_build,
        inverted_index_merge,
        inverted_index_view,
    )

    src = str(tmp_path / "docs_invidx_stream")
    state_dir = str(tmp_path / "invidx_state")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    docs.repartition(6).write.parquet(src)
    stored = spark.read.parquet(src)

    batch_index = {
        r.term: (r.df, r.postings)
        for r in inverted_index_view(inverted_index_build(stored)).collect()
    }

    from event_stream_aggr_spark.streaming.state_store import (
        merge_state_sink,
        read_state,
    )

    n_batches = [0]
    per_batch_df: dict[str, list[int]] = {}
    # the production epoch-gated merge store (chaos-tested for
    # crash-mid-batch replay in test_maintainer_replay_chaos.py)
    sink = merge_state_sink(
        state_dir,
        lambda s, b: inverted_index_build(b)
        if s is None
        else inverted_index_merge(s, inverted_index_build(b)),
    )

    def upsert_index(bdf: DataFrame, batch_id: int) -> None:
        n_batches[0] += 1
        for r in inverted_index_build(bdf).collect():
            per_batch_df.setdefault(r.term, []).append(r.df)
        sink(bdf, batch_id)

    stream = stream_parquet_dir(spark, src, stored.schema, max_files_per_trigger=2)
    q = (
        stream.writeStream.foreachBatch(upsert_index)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "invidx_ckpt"))
        .start()
    )
    q.awaitTermination(120)
    assert n_batches[0] >= 2  # index really merged across micro-batches

    final = read_state(spark, state_dir)[0]
    streamed_index = {
        r.term: (r.df, r.postings) for r in inverted_index_view(final).collect()
    }
    assert streamed_index == batch_index and len(batch_index) > 0

    # the synthetic corpus has a tiny vocabulary (31 terms, all df >=
    # 15 even per batch), so the floor-crossing scenario can't occur
    # naturally here — prove the unfloored-store property on a
    # hand-built case instead: a term below the floor in EVERY batch
    # must still reach the view once its merged df crosses the floor
    # (a maintainer that floored each delta would lose it for good).
    assert all(min(v) >= INDEX_MIN_DF for v in per_batch_df.values())
    b1 = spark.createDataFrame(
        [(i, "rare common") for i in range(INDEX_MIN_DF - 2)], ["doc_id", "text"]
    )
    b2 = spark.createDataFrame(
        [(100 + i, "rare common") for i in range(INDEX_MIN_DF - 2)],
        ["doc_id", "text"],
    )
    merged2 = inverted_index_merge(
        inverted_index_build(b1), inverted_index_build(b2)
    )
    view2 = {r.term: r.df for r in inverted_index_view(merged2).collect()}
    # each batch alone is sub-floor (floor-2 docs); merged df = 2*(floor-2)
    # >= floor for floor >= 4 — the term must appear, with the SUMMED df
    assert view2.get("rare") == 2 * (INDEX_MIN_DF - 2)
    assert (
        not {
            r.term
            for r in inverted_index_view(inverted_index_build(b1)).collect()
        }
    ), "a single sub-floor batch must be invisible through the view"


def test_stream_batch_equivalence_join_view_maintenance(spark, sf_dir, tmp_path):
    """qi04's streaming story — the bilinear delta-join maintainer with
    BOTH sides arriving incrementally (stream-static covers one-sided;
    this is the general case): orders and lineitems interleave across
    micro-batches as a tagged union; per batch the maintainer emits
    Δo ⋈ L_stored  ∪  O_stored ⋈ Δl  ∪  Δo ⋈ Δl, then appends the
    deltas to the stored bases. History is never re-joined against
    itself, and the accumulated view must equal the batch join row
    for row regardless of arrival interleaving. State (o/l pre-images
    + accumulated view rows) lives in ONE tagged relation inside the
    production epoch-gated merge store — chaos-tested for
    crash-mid-batch replay in test_maintainer_replay_chaos.py."""
    from event_stream_aggr_spark.streaming.state_store import (
        merge_state_sink,
        read_state,
    )

    src = str(tmp_path / "tagged_stream")
    state_dir = str(tmp_path / "jv_state")

    o = load_table(spark, sf_dir, "orders").select(
        F.lit("o").alias("kind"),
        F.col("o_orderkey").alias("k"),
        F.col("o_orderpriority").alias("prio"),
        F.lit(None).cast("int").alias("ln"),
        F.lit(None).cast("double").alias("price"),
        F.lit(None).cast("double").alias("disc"),
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        F.lit("l").alias("kind"),
        F.col("l_orderkey").alias("k"),
        F.lit(None).cast("string").alias("prio"),
        F.col("l_linenumber").alias("ln"),
        F.col("l_extendedprice").alias("price"),
        F.col("l_discount").alias("disc"),
    )
    # interleave both kinds across files so most batches carry a mix
    o.unionAll(li).repartition(6).write.parquet(src)
    stored = spark.read.parquet(src)

    def rows(df):
        # multiset, not set: a maintainer bug that emits a (k, ln) pair
        # twice (e.g. overlapping delta terms double-counting) must fail
        # the equivalence, not collapse silently (round-7 ADVICE).
        from collections import Counter

        return Counter(
            (r.k, r.ln, r.prio, round(r.price * (1 - r.disc), 4)) for r in df.collect()
        )

    oj = load_table(spark, sf_dir, "orders")
    lj = load_table(spark, sf_dir, "lineitem")
    batch_view = rows(
        oj.join(lj, oj["o_orderkey"] == lj["l_orderkey"]).select(
            F.col("l_orderkey").alias("k"),
            F.col("l_linenumber").alias("ln"),
            F.col("o_orderpriority").alias("prio"),
            F.col("l_extendedprice").alias("price"),
            F.col("l_discount").alias("disc"),
        )
    )

    n_batches = [0]

    def tag(df, rel):
        return df.select(F.lit(rel).alias("rel"), "k", "prio", "ln", "price", "disc")

    def step(state: DataFrame | None, bdf: DataFrame) -> DataFrame:
        d_o = bdf.filter(F.col("kind") == "o").select("k", "prio")
        d_l = bdf.filter(F.col("kind") == "l").select("k", "ln", "price", "disc")
        if state is None:
            prev_o, prev_l = d_o.limit(0), d_l.limit(0)
        else:
            prev_o = state.filter(F.col("rel") == "o").select("k", "prio")
            prev_l = state.filter(F.col("rel") == "l").select(
                "k", "ln", "price", "disc"
            )
        delta_view = (
            d_o.join(prev_l, "k")
            .unionByName(prev_o.join(d_l, "k"))
            .unionByName(d_o.join(d_l, "k"))
            .select("k", "prio", "ln", "price", "disc")
        )
        fresh = (
            tag(
                d_o.withColumn("ln", F.lit(None).cast("int"))
                .withColumn("price", F.lit(None).cast("double"))
                .withColumn("disc", F.lit(None).cast("double")),
                "o",
            )
            .unionByName(tag(d_l.withColumn("prio", F.lit(None).cast("string")), "l"))
            .unionByName(tag(delta_view, "v"))
        )
        return fresh if state is None else state.unionByName(fresh)

    sink = merge_state_sink(state_dir, step)

    def maintain(bdf: DataFrame, batch_id: int) -> None:
        n_batches[0] += 1
        sink(bdf, batch_id)

    stream = stream_parquet_dir(spark, src, stored.schema, max_files_per_trigger=2)
    q = (
        stream.writeStream.foreachBatch(maintain)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "jv_ckpt"))
        .start()
    )
    q.awaitTermination(180)
    assert n_batches[0] >= 2  # the bilinear terms really crossed batches

    streamed_view = rows(read_state(spark, state_dir)[0].filter(F.col("rel") == "v"))
    assert streamed_view == batch_view and len(batch_view) > 0


def test_stream_batch_equivalence_kmv_sketch(spark, sf_dir, tmp_path):
    """qh04's streaming twin: a foreachBatch maintainer that builds the
    per-micro-batch KMV sketch of each source's token-hash set and
    MERGES it into the stored sketch (operators/sketch.py:kmv_merge —
    union, dedup, keep k smallest) converges to EXACTLY the batch
    sketch. Exact because the k smallest of a union can only come from
    the k smallest of each side — the merge is lossless for build, the
    same monoid contract the CMS twin above proves cell-wise. Also
    asserts the pure-batch split-fold law on a 3-way split, so the
    streaming result isn't an artifact of the trigger batching."""
    import os

    from event_stream_aggr_spark.operators.sketch import kmv_build, kmv_merge
    from event_stream_aggr_spark.operators.text import tokens

    def hashed_tokens(df: DataFrame) -> DataFrame:
        return (
            df.select(
                "source", F.explode(tokens(F.lower(F.col("text")))).alias("tok")
            )
            .select(
                "source",
                F.conv(F.substring(F.md5("tok"), 1, 7), 16, 10)
                .cast("long")
                .alias("h"),
            )
            .distinct()
        )

    src = str(tmp_path / "docs_kmv_stream")
    state_dir = str(tmp_path / "kmv_state")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    docs.repartition(6).write.parquet(src)
    stored = spark.read.parquet(src)

    batch_sketch = {
        (r.source, r.h) for r in kmv_build(hashed_tokens(stored)).collect()
    }

    # split-fold law: fold of per-part sketches == sketch of the whole
    parts = [
        kmv_build(hashed_tokens(stored.filter(F.col("doc_id") % 3 == i)))
        for i in range(3)
    ]
    folded = parts[0]
    for p in parts[1:]:
        folded = kmv_merge(folded, p)
    assert {(r.source, r.h) for r in folded.collect()} == batch_sketch

    from event_stream_aggr_spark.streaming.state_store import (
        merge_state_sink,
        read_state,
    )

    n_batches = [0]
    # the production epoch-gated merge store (chaos-tested for
    # crash-mid-batch replay in test_maintainer_replay_chaos.py)
    sink = merge_state_sink(
        state_dir,
        lambda s, b: kmv_build(hashed_tokens(b))
        if s is None
        else kmv_merge(s, kmv_build(hashed_tokens(b))),
    )

    def upsert_sketch(bdf: DataFrame, batch_id: int) -> None:
        n_batches[0] += 1
        sink(bdf, batch_id)

    stream = stream_parquet_dir(spark, src, stored.schema, max_files_per_trigger=2)
    q = (
        stream.writeStream.foreachBatch(upsert_sketch)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "kmv_ckpt"))
        .start()
    )
    q.awaitTermination(120)
    assert n_batches[0] >= 2  # sketch really merged across micro-batches

    streamed = {
        (r.source, r.h) for r in read_state(spark, state_dir)[0].collect()
    }
    assert streamed == batch_sketch and len(batch_sketch) > 0


def test_stream_batch_equivalence_quantile_histogram(spark, sf_dir, tmp_path):
    """qi03's streaming story, executed: the micro-bucket histogram is
    a mergeable monoid (counts add cell-wise, like CMS cells), so a
    foreachBatch maintainer that merges each micro-batch's bucket
    histogram into the stored one converges to EXACTLY the batch
    histogram — and p50/p90/p99 read off the streamed histogram equal
    the registered qi03 query's output values. Uses qi03's own
    bucketing constant so a drift in the production derivation breaks
    this twin too."""
    import os

    from event_stream_aggr_spark.operators.incremental import QUANT_BUCKET_DECI
    from event_stream_aggr_spark.plans.registry import load_all

    def bucket_hist(df: DataFrame) -> DataFrame:
        return (
            df.select(
                F.expr(
                    f"cast(floor(value * {QUANT_BUCKET_DECI}) as bigint)"
                ).alias("bucket")
            )
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    src = str(tmp_path / "events_hist_stream")
    state_dir = str(tmp_path / "hist_state")
    events = load_table(spark, sf_dir, "events").select("value")
    events.repartition(6).write.parquet(src)
    stored = spark.read.parquet(src)

    batch_hist = {r.bucket: r.n for r in bucket_hist(stored).collect()}

    n_batches = [0]

    from event_stream_aggr_spark.streaming.state_store import (
        merge_state_sink,
        read_state,
    )

    # the production epoch-gated merge store (chaos-tested for
    # crash-mid-batch replay in test_maintainer_replay_chaos.py)
    sink = merge_state_sink(
        state_dir,
        lambda s, b: bucket_hist(b)
        if s is None
        else s.unionByName(bucket_hist(b))
        .groupBy("bucket")
        .agg(F.sum("n").alias("n")),
    )

    def upsert_hist(bdf: DataFrame, batch_id: int) -> None:
        n_batches[0] += 1
        sink(bdf, batch_id)

    stream = stream_parquet_dir(spark, src, stored.schema, max_files_per_trigger=2)
    q = (
        stream.writeStream.foreachBatch(upsert_hist)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "hist_ckpt"))
        .start()
    )
    q.awaitTermination(120)
    assert n_batches[0] >= 2  # histogram really merged across batches

    streamed = {
        r.bucket: r.n for r in read_state(spark, state_dir)[0].collect()
    }
    assert streamed == batch_hist and len(batch_hist) > 0

    # nearest-rank percentiles read through the streamed histogram
    # must equal the registered query's output (same derivation)
    total = sum(streamed.values())
    def pick(p):
        c = 0
        for b in sorted(streamed):
            c += streamed[b]
            if c * 100 >= total * p:
                return b
        return None

    qi03 = load_all()["qi03_incremental_quantiles"].fn(spark, sf_dir).collect()[0]
    assert qi03.n_mismatched_buckets == 0
    assert (qi03.n_total, qi03.p50_deci, qi03.p90_deci, qi03.p99_deci) == (
        total,
        pick(50),
        pick(90),
        pick(99),
    )


def test_stream_batch_equivalence_scd2_dimension(spark, sf_dir, tmp_path):
    """qv02's streaming story: the SCD2 dimension maintained
    incrementally from the raw event stream through the epoch-gated
    merge store (operators/versioning.py:scd2_state_step — per epoch,
    re-derive gaps-and-islands ONLY for the users in the batch, carry
    the daily grain so late events re-sum exactly) must equal the
    batch qv02 build version-for-version, regardless of how events
    are batched or which days straddle batch boundaries."""
    from event_stream_aggr_spark.operators.versioning import scd2_state_step
    from event_stream_aggr_spark.plans.registry import load_all
    from event_stream_aggr_spark.streaming.state_store import (
        merge_state_sink,
        read_state,
    )

    src = str(tmp_path / "events_scd2_stream")
    state_dir = str(tmp_path / "scd2_state")
    events = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    # repartition WITHOUT day alignment: most batches split days/users
    events.repartition(6).write.parquet(src)
    stored = spark.read.parquet(src)

    def rows(df):
        return {
            (r.user_id, r.version, r.tier, r.valid_from, r.valid_to,
             r.n_days, r.is_current)
            for r in df.collect()
        }

    batch_versions = rows(load_all()["qv02_scd2_dimension"].fn(spark, sf_dir))

    n_batches = [0]
    sink = merge_state_sink(state_dir, scd2_state_step)

    def maintain(bdf: DataFrame, batch_id: int) -> None:
        n_batches[0] += 1
        sink(bdf, batch_id)

    stream = stream_parquet_dir(spark, src, stored.schema, max_files_per_trigger=2)
    q = (
        stream.writeStream.foreachBatch(maintain)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "scd2_ckpt"))
        .start()
    )
    q.awaitTermination(180)
    assert n_batches[0] >= 2  # versions really straddled batches

    final = read_state(spark, state_dir)[0].filter(F.col("rel") == "v").select(
        "user_id", "version", "tier", "valid_from", "valid_to", "n_days",
        "is_current",
    )
    assert rows(final) == batch_versions and len(batch_versions) > 0
