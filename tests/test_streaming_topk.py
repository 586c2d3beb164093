"""Streaming top-k maintenance (qi07's stateful twin): exact batch
equivalence under any batching, bounded state, store protocol."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from event_stream_aggr_spark.operators.incremental import TOPK_K, topk_prune
from event_stream_aggr_spark.streaming.state_store import read_state
from event_stream_aggr_spark.streaming.topk import topk_sink

SCHEMA = "o_orderpriority string, o_orderkey long, price double"


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA).withColumn(
        "price", F.col("price").cast("decimal(18,2)")
    )


def _state(spark, root):
    df, _ = read_state(spark, root)
    return sorted(map(tuple, df.collect()))


def test_epoch_fold_equals_one_pass_and_state_is_bounded(spark, tmp_path):
    rows = [("P", i, float((i * 37) % 100)) for i in range(1, 41)]
    rows += [("Q", 100 + i, float((i * 53) % 90)) for i in range(1, 31)]
    root = str(tmp_path / "state")
    sink = topk_sink(root)
    for ep, lo in enumerate(range(0, 70, 10)):
        chunk = rows[lo : lo + 10]
        if chunk:
            sink(_df(spark, chunk), ep)
    folded = _state(spark, root)
    onepass = sorted(
        map(tuple, topk_prune(_df(spark, rows), ["o_orderpriority"]).collect())
    )
    assert folded == onepass
    assert len(folded) == 2 * TOPK_K  # bounded: k rows per group


def test_redelivery_noop_and_stale_checkpoint_raises(spark, tmp_path):
    root = str(tmp_path / "state")
    sink = topk_sink(root)
    sink(_df(spark, [("P", 1, 10.0)]), 0)
    sink(_df(spark, [("P", 2, 20.0)]), 1)
    before = _state(spark, root)
    sink(_df(spark, [("P", 2, 20.0)]), 1)  # redelivery
    assert _state(spark, root) == before
    with pytest.raises(ValueError, match="below"):
        sink(_df(spark, [("P", 9, 99.0)]), 0)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    prices=st.lists(
        st.integers(min_value=0, max_value=50), min_size=1, max_size=20
    ),
    cut=st.integers(0, 19),
)
def test_any_batching_matches_one_pass(spark, tmp_path_factory, prices, cut):
    rows = [("P", i + 1, float(p)) for i, p in enumerate(prices)]
    i = cut % len(rows)
    root = str(tmp_path_factory.mktemp("topk") / "state")
    sink = topk_sink(root)
    for ep, chunk in enumerate((rows[:i], rows[i:])):
        sink(_df(spark, chunk), ep)  # _df handles empty chunks too
    onepass = sorted(
        map(tuple, topk_prune(_df(spark, rows), ["o_orderpriority"]).collect())
    )
    assert _state(spark, root) == onepass
