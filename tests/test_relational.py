"""Bounds for the sketch-backed relational queries (the registry's only
rows-only entries — HLL++/KLL internals are engine-specific, so the
DuckDB oracle can't hash-match them; these tests supply the missing
correctness evidence by bounding each estimate against its exact
counterpart)."""

from __future__ import annotations

from pyspark.sql import functions as F

from event_stream_aggr_spark.plans.relational import q29_approx_distinct
from event_stream_aggr_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.01"


def test_q29_approx_bounds(spark):
    """approx_count_distinct within HLL++'s default relative error
    (rsd=0.05; measured 2.65% on this data) of the exact distinct
    count, and approx_percentile(0.5) inside the exact [p45, p55]
    value neighborhood — per group."""
    li = load_table(spark, SF_DIR, "lineitem")
    exact = {
        r.l_returnflag: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("exact_parts"),
            F.expr("percentile(l_extendedprice, 0.45)").alias("p45"),
            F.expr("percentile(l_extendedprice, 0.55)").alias("p55"),
        )
        .collect()
    }
    raw = {
        r.l_returnflag: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey").alias("approx_parts"),
            F.expr("approx_percentile(l_extendedprice, 0.5)").alias(
                "approx_median_price"
            ),
        )
        .collect()
    }
    assert len(raw) == len(exact) > 0
    for flag, r in raw.items():
        e = exact[flag]
        rel_err = abs(r.approx_parts - e.exact_parts) / e.exact_parts
        assert rel_err <= 0.05, (
            f"group {flag}: approx {r.approx_parts} vs exact "
            f"{e.exact_parts} (rel_err {rel_err:.4f} > rsd 0.05)"
        )
        assert e.p45 <= r.approx_median_price <= e.p55, (
            f"group {flag}: approx median {r.approx_median_price} "
            f"outside exact [p45={e.p45}, p55={e.p55}]"
        )
    # the registered query emits the same bounds as hashable booleans
    # (plus the exact twin) — all must hold
    for r in q29_approx_distinct(spark, SF_DIR).collect():
        assert r.exact_parts == exact[r.l_returnflag].exact_parts
        assert r.approx_parts_ok and r.approx_median_ok, r


def test_ewma_handchecked(spark):
    import tempfile

    from event_stream_aggr_spark.plans.relational import (
        _EWMA_WEIGHTS,
        q69_ewma_smoothing,
    )

    vals = [10.0, 20.0, 30.0]
    d = spark.createDataFrame(
        [
            (i, f"2024-01-01 00:0{i}:00", 1, "click", v, "{}")
            for i, v in enumerate(vals)
        ],
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    with tempfile.TemporaryDirectory() as tmp:
        d.write.parquet(f"{tmp}/events.parquet")
        got = {r.event_id: r for r in q69_ewma_smoothing(spark, tmp).collect()}

    def expected(rarr):
        num = sum(round(x * _EWMA_WEIGHTS[k] * 1e6) for k, x in enumerate(rarr))
        den = sum(round(_EWMA_WEIGHTS[k] * 1e6) for k in range(len(rarr)))
        return round(num / den, 4)

    assert got[0].ewma == expected([10.0]) == 10.0
    assert got[1].ewma == expected([20.0, 10.0])
    assert got[2].ewma == expected([30.0, 20.0, 10.0])
    assert got[2].n_window == 3
