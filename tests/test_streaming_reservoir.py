"""Streaming weighted reservoir (round 15): stream↔batch equivalence
(the top-R-per-stratum monoid law over any micro-batch slicing),
bounded state, torn-epoch chaos, and the availableNow end-to-end run.
Batch twin: qs05's Efraimidis-Spirakis draw (same deterministic keys).
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

import event_stream_aggr_spark.streaming.state_store as ss
from event_stream_aggr_spark.streaming.reservoir import (
    reservoir_merge,
    weighted_reservoir_sink,
)
from event_stream_aggr_spark.streaming.state_store import read_state

SCHEMA = "doc_id long, lang string, n_chars long"

ROWS = [
    (i, lang, chars)
    for i, (lang, chars) in enumerate(
        [
            ("en", 10 + 37 * (k % 11) + k) for k in range(40)
        ]
        + [("de", 5 + 29 * (k % 7) + k) for k in range(25)]
        + [("fr", 1 + 13 * (k % 5) + k) for k in range(12)]
    )
]


def _batches(spark, n_slices: int):
    per = (len(ROWS) + n_slices - 1) // n_slices
    return [
        spark.createDataFrame(ROWS[i * per:(i + 1) * per], SCHEMA)
        for i in range(n_slices)
    ]


def _sorted_rows(df):
    return sorted(
        (r.lang, r.doc_id, r.n_chars, r.es_key) for r in df.collect()
    )


def test_stream_fold_equals_batch_draw_any_slicing(spark, tmp_path):
    full = spark.createDataFrame(ROWS, SCHEMA)
    want = _sorted_rows(reservoir_merge(None, full, r=7))
    for slices in (1, 3, 5):
        root = str(tmp_path / f"res_{slices}")
        sink = weighted_reservoir_sink(root, r=7)
        for e, b in enumerate(_batches(spark, slices)):
            sink(b, e)
        state, epoch = read_state(spark, root)
        assert epoch == slices - 1
        assert _sorted_rows(state) == want
    # bounded state: never more than R rows per stratum, and strata
    # smaller than R keep everything
    per_stratum = {
        r.lang: r.n for r in state.groupBy("lang").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    assert per_stratum == {"en": 7, "de": 7, "fr": 7}


def test_small_stratum_keeps_all_rows(spark, tmp_path):
    root = str(tmp_path / "res")
    sink = weighted_reservoir_sink(root, r=50)
    sink(spark.createDataFrame(ROWS, SCHEMA), 0)
    state, _ = read_state(spark, root)
    per = {
        r.lang: r.n for r in state.groupBy("lang").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    assert per == {"en": 40, "de": 25, "fr": 12}


def test_nonpositive_weights_never_sampled(spark, tmp_path):
    root = str(tmp_path / "res")
    sink = weighted_reservoir_sink(root, r=5)
    sink(
        spark.createDataFrame(
            [(1, "en", 0), (2, "en", -3), (3, "en", 8)], SCHEMA
        ),
        0,
    )
    state, _ = read_state(spark, root)
    assert [r.doc_id for r in state.collect()] == [3]


def test_torn_epoch_and_redelivery(spark, tmp_path, monkeypatch):
    root = str(tmp_path / "res")
    sink = weighted_reservoir_sink(root, r=4)
    b0, b1 = _batches(spark, 2)
    sink(b0, 0)
    pre = _sorted_rows(read_state(spark, root)[0])

    def crash(spark_, root_, epoch_):
        raise OSError("simulated kill between write and commit")

    monkeypatch.setattr(ss, "_commit", crash)
    with pytest.raises(OSError, match="simulated kill"):
        sink(b1, 1)
    monkeypatch.undo()
    # torn epoch: readers still see the pre-image
    assert _sorted_rows(read_state(spark, root)[0]) == pre
    sink(b1, 1)  # replay heals
    healed = _sorted_rows(read_state(spark, root)[0])
    sink(b1, 1)  # post-commit redelivery: no-op (no duplicate ids)
    assert _sorted_rows(read_state(spark, root)[0]) == healed
    full = spark.createDataFrame(ROWS, SCHEMA)
    assert healed == _sorted_rows(reservoir_merge(None, full, r=4))


def test_two_phase_equals_simple_window(spark, tmp_path):
    """two_phase's (partition-id, stratum) pre-top-R is exact by the
    fold law — bit-identical to the simple window, regardless of how
    the input is partitioned; and the sink plumbs the flag through."""
    full = spark.createDataFrame(ROWS, SCHEMA).repartition(7)
    want = _sorted_rows(reservoir_merge(None, full, r=7))
    assert _sorted_rows(
        reservoir_merge(None, full, r=7, two_phase=True)
    ) == want
    root = str(tmp_path / "res2p")
    sink = weighted_reservoir_sink(root, r=7, two_phase=True)
    for e, b in enumerate(_batches(spark, 3)):
        sink(b.repartition(5), e)
    assert _sorted_rows(read_state(spark, root)[0]) == want


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    chars=st.lists(
        st.integers(min_value=-2, max_value=400), min_size=1, max_size=24
    ),
    cut=st.integers(0, 23),
)
def test_any_batching_matches_one_shot_draw(
    spark, tmp_path_factory, chars, cut
):
    """Hypothesis random-cut (the top-k maintainer's discipline): any
    2-slicing of a random corpus — including empty slices, duplicate
    weights, and non-positive weights — folds to the one-shot draw."""
    rows = [
        (i, "en" if c % 2 else "de", c) for i, c in enumerate(chars)
    ]
    i = cut % len(rows)
    root = str(tmp_path_factory.mktemp("res") / "state")
    sink = weighted_reservoir_sink(root, r=3)
    for ep, chunk in enumerate((rows[:i], rows[i:])):
        sink(spark.createDataFrame(chunk, SCHEMA), ep)
    full = spark.createDataFrame(rows, SCHEMA)
    assert _sorted_rows(read_state(spark, root)[0]) == _sorted_rows(
        reservoir_merge(None, full, r=3)
    )


def test_available_now_end_to_end(spark, tmp_path):
    import os

    src = str(tmp_path / "src")
    for i, b in enumerate(_batches(spark, 3)):
        b.repartition(1).write.mode("overwrite").parquet(f"{src}/f{i}")
    root = str(tmp_path / "res")
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/f*")
    )
    q = (
        stream.writeStream.foreachBatch(weighted_reservoir_sink(root, r=7))
        .option("checkpointLocation", os.path.join(str(tmp_path), "_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    full = spark.createDataFrame(ROWS, SCHEMA)
    assert _sorted_rows(read_state(spark, root)[0]) == _sorted_rows(
        reservoir_merge(None, full, r=7)
    )
