"""Bloom join-pruning (operators/bloom.py): the no-false-negative
guarantee the technique's safety rests on, and the map-side-only plan
shape that makes it worth running."""

from __future__ import annotations

from pyspark.sql import functions as F

from event_stream_aggr_spark.operators.bloom import bloom_build, bloom_probe
from event_stream_aggr_spark.tables import load_table


def test_bloom_admits_every_true_match(spark, sf_dir):
    # a false NEGATIVE would silently drop join results — assert the
    # filter passes every key actually present in the build set
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    bk = (
        o.where(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_orderkey").alias("k"))
        .distinct()
    )
    probe = li.select(F.col("l_orderkey").alias("k"))
    passed = bloom_probe(probe, "k", bloom_build(bk, "k"))
    true_rows = probe.join(bk, "k", "left_semi").count()
    true_and_passed = passed.join(bk, "k", "left_semi").count()
    assert true_and_passed == true_rows
    # and it actually prunes: fewer rows pass than the full probe
    assert passed.count() < probe.count()


def test_bloom_probe_is_map_side_only(spark, sf_dir):
    # the probe must add ZERO exchanges on the fact side: bitmap words
    # broadcast, the bit test runs where the rows already are
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("k")
    )
    bk = li.limit(100)
    probed = bloom_probe(li, "k", bloom_build(bk, "k"))
    plan = probed._jdf.queryExecution().executedPlan().toString()
    probe_side = plan.split("BroadcastHashJoin", 1)[0]
    assert "Exchange hashpartitioning" not in probe_side
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan
