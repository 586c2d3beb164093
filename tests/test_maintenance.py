"""Round-trip + plan tests for table maintenance (compaction and
partition-pruned layout). These ops must never change query results,
and their value is visible in the physical plan (PartitionFilters) and
the filesystem (file counts)."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from event_stream_aggr_spark.operators.maintenance import (
    compact_parquet,
    write_pruned_layout,
)
from event_stream_aggr_spark.tables import load_table

SF = "/root/testdata/sf0.001"


def _parquet_files(path: str) -> list[str]:
    out = []
    for root, _dirs, files in os.walk(path):
        out += [os.path.join(root, f) for f in files if f.endswith(".parquet")]
    return out


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture()
def tmpdir():
    with tempfile.TemporaryDirectory(prefix="maint-") as d:
        yield d


def test_compaction_merges_small_files_and_preserves_rows(spark, tmpdir):
    src = os.path.join(tmpdir, "fragmented")
    dst = os.path.join(tmpdir, "compact")
    events = load_table(spark, SF, "events")
    # simulate streaming ingest debris: 64 tiny files
    events.repartition(64).write.parquet(src)
    assert len(_parquet_files(src)) == 64
    n_out = compact_parquet(spark, src, dst)
    assert n_out == 1  # sf0.001 events is far under one 128 MiB target
    before = events.agg(
        F.count(F.lit(1)).alias("n"), F.sum("event_id").alias("s")
    ).collect()[0]
    after = (
        spark.read.parquet(dst)
        .agg(F.count(F.lit(1)).alias("n"), F.sum("event_id").alias("s"))
        .collect()[0]
    )
    assert (before.n, before.s) == (after.n, after.s)


def test_compaction_is_shuffle_free(spark, tmpdir):
    src = os.path.join(tmpdir, "frag2")
    load_table(spark, SF, "events").repartition(16).write.parquet(src)
    df = spark.read.parquet(src).coalesce(1)
    assert "Exchange" not in _plan(df)


def test_pruned_layout_partition_filter_skips_directories(spark, tmpdir):
    out = os.path.join(tmpdir, "by_type")
    events = load_table(spark, SF, "events")
    write_pruned_layout(events, out, ["event_type"], ["ts"])
    back = spark.read.parquet(out)
    # results unchanged (modulo column order: partition col moves last)
    n_types = {r.event_type for r in back.select("event_type").distinct().collect()}
    assert n_types == {
        r.event_type for r in events.select("event_type").distinct().collect()
    }
    q = back.filter(F.col("event_type") == "click")
    plan = _plan(q)
    part_filters = plan.split("PartitionFilters:", 1)[1].splitlines()[0]
    assert "event_type" in part_filters
    # directory-level pruning: the scan lists only the click partition
    n_click = q.count()
    n_click_direct = spark.read.parquet(os.path.join(out, "event_type=click")).count()
    assert n_click == n_click_direct > 0


def test_pruned_layout_sorts_within_files(spark, tmpdir):
    out = os.path.join(tmpdir, "sorted")
    events = load_table(spark, SF, "events")
    write_pruned_layout(events, out, ["event_type"], ["ts"])
    one = _parquet_files(out)[0]
    rows = spark.read.parquet(one).select("ts").collect()
    ts = [r.ts for r in rows]
    assert ts == sorted(ts)  # row-group min/max stats are tight
