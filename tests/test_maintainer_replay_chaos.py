"""Crash-mid-batch replay chaos for the five additive-monoid streaming
maintainers (round-7 VERDICT ask #4): CMS, KMV, inverted index,
maintained join view, quantile histogram.

Each maintainer runs through streaming/state_store.py's
``merge_state_sink``. The shared harness kills the sink between the
merge write and the pointer commit (the torn-epoch pattern from
test_upsert_sink.py), asserts readers still see the pre-crash state,
replays the epoch (at-least-once redelivery — the reference commits
its consumer offset only after processing, internal/app/app.go:220),
and then REDELIVERS the epoch once more after a successful commit: an
additive merge applied twice would double-count, so the final state
must be byte-identical to the single application AND to the one-shot
batch build over all the data."""

from __future__ import annotations

import os
from collections import Counter

import pytest
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

import event_stream_aggr_spark.streaming.state_store as ss
from event_stream_aggr_spark.streaming.state_store import (
    merge_state_sink,
    read_state,
)
from event_stream_aggr_spark.tables import load_table


def _chaos_replay(spark, tmp_path, monkeypatch, batches, step, canon):
    """Run epochs 0..n-2 cleanly, crash epoch n-1 at the pointer swap,
    verify pre-image visibility, heal by replay, then redeliver the
    committed epoch. Returns canon(final state)."""
    root = str(tmp_path / "state")
    sink = merge_state_sink(root, step)
    last = len(batches) - 1
    for i, b in enumerate(batches[:-1]):
        sink(b, i)
    committed = canon(read_state(spark, root)[0])

    def crash_at_commit(spark_, root_, epoch_):
        raise OSError("simulated kill between merge and commit")

    monkeypatch.setattr(ss, "_commit", crash_at_commit)
    with pytest.raises(OSError, match="simulated kill"):
        sink(batches[last], last)
    monkeypatch.undo()

    # torn epoch: version dir exists, commit markers (and readers) unchanged
    assert os.path.isdir(os.path.join(root, f"v{last}"))
    assert canon(read_state(spark, root)[0]) == committed

    sink(batches[last], last)  # replay heals deterministically
    healed = canon(read_state(spark, root)[0])
    assert healed != committed  # the epoch genuinely changed the state

    sink(batches[last], last)  # post-commit redelivery: must be a no-op
    assert canon(read_state(spark, root)[0]) == healed
    return healed


def _split3(df: DataFrame, key: str) -> list[DataFrame]:
    return [df.filter(F.col(key) % 3 == i) for i in range(3)]


def test_cms_maintainer_replay_chaos(spark, sf_dir, tmp_path, monkeypatch):
    from event_stream_aggr_spark.operators.sketch import cms_build, cms_merge

    events = load_table(spark, sf_dir, "events").select("user_id", "event_id")
    batches = _split3(events, "event_id")

    def step(state, batch):
        delta = cms_build(batch, "user_id")
        return delta if state is None else cms_merge(state, delta)

    def canon(df):
        return {(r.row, r.col): r.c for r in df.collect()}

    healed = _chaos_replay(spark, tmp_path, monkeypatch, batches, step, canon)
    assert healed == canon(cms_build(events, "user_id"))


def test_kmv_maintainer_replay_chaos(spark, sf_dir, tmp_path, monkeypatch):
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

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    batches = _split3(docs, "doc_id")

    def step(state, batch):
        delta = kmv_build(hashed_tokens(batch))
        return delta if state is None else kmv_merge(state, delta)

    def canon(df):
        return {(r.source, r.h) for r in df.collect()}

    healed = _chaos_replay(spark, tmp_path, monkeypatch, batches, step, canon)
    assert healed == canon(kmv_build(hashed_tokens(docs)))


def test_inverted_index_maintainer_replay_chaos(
    spark, sf_dir, tmp_path, monkeypatch
):
    from event_stream_aggr_spark.operators.text import (
        inverted_index_build,
        inverted_index_merge,
        inverted_index_view,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    batches = _split3(docs, "doc_id")

    def step(state, batch):
        delta = inverted_index_build(batch)
        return delta if state is None else inverted_index_merge(state, delta)

    def canon(df):
        return {
            r.term: (r.df, tuple(r.postings))
            for r in inverted_index_view(df).collect()
        }

    healed = _chaos_replay(spark, tmp_path, monkeypatch, batches, step, canon)
    assert healed == canon(inverted_index_build(docs))


def test_join_view_maintainer_replay_chaos(spark, sf_dir, tmp_path, monkeypatch):
    """The bilinear join-view maintainer: state carries the o/l
    pre-images AND the maintained view rows in one tagged relation;
    each epoch appends ΔA⋈B_old ∪ A_old⋈ΔB ∪ ΔA⋈ΔB. A double-applied
    epoch would emit duplicate view ROWS (not just wrong counters), so
    the canon is a multiset (round-7 ADVICE)."""
    o = load_table(spark, sf_dir, "orders").select(
        F.lit("o").alias("kind"),
        F.col("o_orderkey").alias("k"),
        F.col("o_orderpriority").alias("prio"),
        F.lit(None).cast("int").alias("ln"),
        F.lit(None).cast("double").alias("price"),
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        F.lit("l").alias("kind"),
        F.col("l_orderkey").alias("k"),
        F.lit(None).cast("string").alias("prio"),
        F.col("l_linenumber").alias("ln"),
        F.col("l_extendedprice").alias("price"),
    )
    # non-aligned splits so the cross terms carry rows across epochs
    tagged = o.unionAll(li)
    batches = [
        tagged.filter(
            F.when(F.col("kind") == "o", F.col("k") % 3)
            .otherwise((F.col("k") + F.coalesce(F.col("ln"), F.lit(0))) % 3)
            == i
        )
        for i in range(3)
    ]

    def tag(df, rel):
        return df.select(
            F.lit(rel).alias("rel"),
            "k",
            "prio",
            "ln",
            "price",
        )

    def step(state, batch):
        d_o = batch.filter(F.col("kind") == "o").select("k", "prio")
        d_l = batch.filter(F.col("kind") == "l").select("k", "ln", "price")
        if state is None:
            prev_o = d_o.limit(0)
            prev_l = d_l.limit(0)
            kept = None
        else:
            prev_o = state.filter(F.col("rel") == "o").select("k", "prio")
            prev_l = state.filter(F.col("rel") == "l").select(
                "k", "ln", "price"
            )
            kept = state
        new_v = (
            d_o.join(prev_l, "k")
            .unionByName(prev_o.join(d_l, "k"))
            .unionByName(d_o.join(d_l, "k"))
            .select("k", "prio", "ln", "price")
        )
        parts = [
            tag(d_o.withColumn("ln", F.lit(None).cast("int")).withColumn(
                "price", F.lit(None).cast("double")
            ), "o"),
            tag(d_l.withColumn("prio", F.lit(None).cast("string")), "l"),
            tag(new_v, "v"),
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out if kept is None else kept.unionByName(out)

    def canon(df):
        return Counter(
            (r.k, r.ln, r.prio, r.price)
            for r in df.filter(F.col("rel") == "v").collect()
        )

    healed = _chaos_replay(spark, tmp_path, monkeypatch, batches, step, canon)
    oj = load_table(spark, sf_dir, "orders")
    lj = load_table(spark, sf_dir, "lineitem")
    expected = Counter(
        (r.k, r.ln, r.prio, r.price)
        for r in oj.join(lj, oj["o_orderkey"] == lj["l_orderkey"])
        .select(
            F.col("l_orderkey").alias("k"),
            F.col("l_linenumber").alias("ln"),
            F.col("o_orderpriority").alias("prio"),
            F.col("l_extendedprice").alias("price"),
        )
        .collect()
    )
    assert healed == expected and len(expected) > 0


def test_quantile_histogram_maintainer_replay_chaos(
    spark, sf_dir, tmp_path, monkeypatch
):
    from event_stream_aggr_spark.operators.incremental import QUANT_BUCKET_DECI

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

    events = load_table(spark, sf_dir, "events").select("event_id", "value")
    batches = _split3(events, "event_id")

    def step(state, batch):
        delta = bucket_hist(batch)
        if state is None:
            return delta
        return (
            state.unionByName(delta).groupBy("bucket").agg(F.sum("n").alias("n"))
        )

    def canon(df):
        return {r.bucket: r.n for r in df.collect()}

    healed = _chaos_replay(spark, tmp_path, monkeypatch, batches, step, canon)
    assert healed == canon(bucket_hist(events))


def test_scd2_maintainer_replay_chaos(spark, sf_dir, tmp_path, monkeypatch):
    """The SCD2 dimension maintainer (affected-keys recompute over a
    carried daily grain) through the same kill-replay-redeliver
    gauntlet: the final versions table must equal the batch qv02
    build exactly."""
    from event_stream_aggr_spark.operators.versioning import scd2_state_step
    from event_stream_aggr_spark.plans.registry import load_all

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    batches = [
        b.drop("event_id") for b in _split3(events, "event_id")
    ]

    def canon(df):
        return Counter(
            (r.user_id, r.version, r.tier, r.valid_from, r.valid_to,
             r.n_days, r.is_current)
            for r in df.filter(F.col("rel") == "v").collect()
        )

    healed = _chaos_replay(
        spark, tmp_path, monkeypatch, batches, scd2_state_step, canon
    )
    expected = Counter(
        (r.user_id, r.version, r.tier, r.valid_from, r.valid_to,
         r.n_days, r.is_current)
        for r in load_all()["qv02_scd2_dimension"].fn(spark, sf_dir).collect()
    )
    assert healed == expected and len(expected) > 0


def test_merge_store_survives_stream_restart_and_rejects_fresh_checkpoint(
    spark, sf_dir, tmp_path
):
    """The two checkpoint-lifecycle contracts of the merge store,
    exercised through REAL writeStream restarts (not direct sink
    calls):

    1. Same checkpoint, more data: a second availableNow run resumes
       with HIGHER batch ids, so the new files fold in exactly once
       and the state equals the one-shot batch build over everything.
       Vacuum keeps exactly two generations (committed + pre-image).
    2. Fresh checkpoint, same store: batch ids restart at 0, STRICTLY
       BELOW the committed epoch — that can never be a redelivery, so
       the sink must FAIL LOUDLY (round-8 VERDICT ask #7: the gate
       silently swallowing restarted ids would drop real batches; an
       additive store is married to one checkpoint lineage). The
       state must be unchanged after the rejected run."""
    from event_stream_aggr_spark.operators.incremental import QUANT_BUCKET_DECI
    from event_stream_aggr_spark.sources.files import stream_parquet_dir
    from event_stream_aggr_spark.streaming.state_store import (
        merge_state_sink,
        read_state,
    )

    src = str(tmp_path / "events_restart_stream")
    state_dir = str(tmp_path / "restart_state")
    ckpt = str(tmp_path / "restart_ckpt")
    events = load_table(spark, sf_dir, "events").select("event_id", "value")
    part1 = events.filter(F.col("event_id") % 2 == 0).drop("event_id")
    part2 = events.filter(F.col("event_id") % 2 == 1).drop("event_id")

    def bucket_hist(df):
        return (
            df.select(
                F.expr(
                    f"cast(floor(value * {QUANT_BUCKET_DECI}) as bigint)"
                ).alias("bucket")
            )
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    sink = merge_state_sink(
        state_dir,
        lambda s, b: bucket_hist(b)
        if s is None
        else s.unionByName(bucket_hist(b)).groupBy("bucket").agg(
            F.sum("n").alias("n")
        ),
    )

    def run_stream(checkpoint):
        stored = spark.read.parquet(src)
        stream = stream_parquet_dir(
            spark, src, stored.schema, max_files_per_trigger=2
        )
        q = (
            stream.writeStream.foreachBatch(lambda b, i: sink(b, i))
            .trigger(availableNow=True)
            .option("checkpointLocation", checkpoint)
            .start()
        )
        q.awaitTermination(120)

    part1.repartition(4).write.mode("append").parquet(src)
    run_stream(ckpt)
    after_p1, epoch_p1 = read_state(spark, state_dir)
    n_after_p1 = {r.bucket: r.n for r in after_p1.collect()}
    assert n_after_p1 == {
        r.bucket: r.n for r in bucket_hist(part1).collect()
    }

    part2.repartition(4).write.mode("append").parquet(src)
    run_stream(ckpt)  # SAME checkpoint: resumes past the seen files
    after_p2, epoch_p2 = read_state(spark, state_dir)
    assert epoch_p2 > epoch_p1  # genuinely continued the batch-id line
    expected = {
        r.bucket: r.n for r in bucket_hist(part1.unionByName(part2)).collect()
    }
    assert {r.bucket: r.n for r in after_p2.collect()} == expected

    # vacuum: exactly the committed version and its pre-image remain
    versions = sorted(
        int(d[1:])
        for d in os.listdir(state_dir)
        if d.startswith("v") and d[1:].isdigit()
    )
    assert len(versions) == 2 and versions[-1] == epoch_p2

    # fresh checkpoint replays ALL files with batch ids restarting at
    # 0 < committed: the sink must reject the lineage mismatch loudly
    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(StreamingQueryException, match="below[\\s\\S]*committed"):
        run_stream(str(tmp_path / "fresh_ckpt"))
    final, final_epoch = read_state(spark, state_dir)
    assert final_epoch == epoch_p2  # nothing committed
    assert {r.bucket: r.n for r in final.collect()} == expected


def test_store_tolerates_stray_nonconforming_files(spark, tmp_path):
    """Round-9 ADVICE: one stray file whose name starts with the marker
    prefix but has a non-numeric suffix (editor backup, partial copy)
    must not poison committed_epoch/read_state/vacuum permanently."""
    import pyspark.sql.functions as F

    root = str(tmp_path / "stray_state")
    sink = merge_state_sink(
        root,
        lambda state, batch: batch
        if state is None
        else state.unionByName(batch).groupBy("k").agg(
            F.sum("n").alias("n")
        ),
    )
    b0 = spark.createDataFrame([("a", 1), ("b", 2)], "k string, n long")
    sink(b0, 0)
    committed = {r.k: r.n for r in read_state(spark, root)[0].collect()}
    assert committed == {"a": 1, "b": 2}

    # drop stray files the Hadoop listing will see
    (tmp_path / "stray_state" / "_COMMIT_v0.bak").write_text("")
    (tmp_path / "stray_state" / "_COMMIT_vpartial").write_text("")

    assert ss.committed_epoch(spark, root) == 0  # not ValueError
    assert {r.k: r.n for r in read_state(spark, root)[0].collect()} == committed

    # next epoch (merge + vacuum) also survives the stray names
    b1 = spark.createDataFrame([("a", 1)], "k string, n long")
    sink(b1, 1)
    assert ss.committed_epoch(spark, root) == 1
    got = {r.k: r.n for r in read_state(spark, root)[0].collect()}
    assert got == {"a": 2, "b": 2}
