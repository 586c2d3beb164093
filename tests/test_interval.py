"""Interval-overlap join (operators/interval.py): semantics vs a naive
theta join, exactly-once pair emission, and the plan property the
bucketing exists for (equi-join, never a nested loop)."""

from __future__ import annotations

from pyspark.sql import functions as F

from event_stream_aggr_spark.operators.interval import overlap_join


def _intervals(spark, rows, start, end, idc):
    return spark.createDataFrame(rows, f"{idc} long, {start} long, {end} long")


def test_overlap_join_matches_naive_theta_join(spark):
    # adversarial layout: intervals spanning many buckets (multiple
    # shared buckets → dedup trick exercised), touching endpoints,
    # containment, disjoint, negative-side epochs near bucket edges
    left = _intervals(
        spark,
        [(1, 0, 10_000), (2, 3_600, 3_600), (3, 50_000, 50_001), (4, 7_200, 90_000)],
        "l_start", "l_end", "lid",
    )
    right = _intervals(
        spark,
        [(10, 500, 9_500), (11, 10_000, 20_000), (12, 49_000, 60_000), (13, 100_000, 100_500)],
        "r_start", "r_end", "rid",
    )
    got = {
        (r.lid, r.rid, r.overlap_sec)
        for r in overlap_join(left, right, bucket_width=3600).collect()
    }
    naive = {
        (r.lid, r.rid, r.overlap_sec)
        for r in left.join(
            right,
            (F.col("l_start") <= F.col("r_end")) & (F.col("r_start") <= F.col("l_end")),
        )
        .withColumn(
            "overlap_sec",
            F.least("l_end", "r_end") - F.greatest("l_start", "r_start"),
        )
        .collect()
    }
    assert got == naive
    # exactly-once: (4, 12) shares many buckets but appears once
    pair_counts = (
        overlap_join(left, right, bucket_width=3600)
        .groupBy("lid", "rid")
        .count()
        .where(F.col("count") > 1)
        .count()
    )
    assert pair_counts == 0


def test_overlap_join_is_equi_join_not_nested_loop(spark):
    left = _intervals(spark, [(1, 0, 7_200)], "l_start", "l_end", "lid")
    right = _intervals(spark, [(10, 3_600, 10_800)], "r_start", "r_end", "rid")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # broadcasting off: at 100 TB neither interval side fits in the
        # driver; the bucketing must still plan a shuffle EQUI join
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        df = overlap_join(left, right)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "NestedLoop" not in plan and "CartesianProduct" not in plan
        assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_qj01_zero_incident_spans_survive(spark, sf_dir):
    from event_stream_aggr_spark.plans.registry import load_all

    df = load_all()["qj01_interval_overlap_join"].fn(spark, sf_dir)
    rows = df.collect()
    # left-outer contract: every (user, day) activity span is present,
    # including spans no sampled incident window touched
    spans = (
        load_all()["qj01_interval_overlap_join"]
        .fn(spark, sf_dir)
        .select("user_id", "day")
        .distinct()
        .count()
    )
    assert len(rows) == spans
    assert any(r.n_incidents == 0 for r in rows)
    assert all(r.overlap_sec >= 0 for r in rows)


def test_overlap_join_refuses_reserved_columns(spark):
    import pytest

    left = spark.createDataFrame([(1, 0, 10, 99)], "lid long, l_start long, l_end long, overlap_sec long")
    right = _intervals(spark, [(10, 5, 15)], "r_start", "r_end", "rid")
    with pytest.raises(ValueError, match="overlap_join reserves"):
        overlap_join(left, right)
