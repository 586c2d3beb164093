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


def test_zorder_key_known_interleave(spark):
    """Hand-checked Morton values: x=3 (011b), y=5 (101b) interleave to
    z = y0<<0 + x0<<1 + y1<<2 + x1<<3 + y2<<4 + x2<<5 = 1+2+8+16 = 27."""
    from pyspark.sql import functions as F

    from event_stream_aggr_spark.operators.maintenance import zorder_key

    df = spark.createDataFrame(
        [(0, 0), (3, 5), (255, 255), (1, 0), (0, 1)], "x long, y long"
    )
    got = {
        (r.x, r.y): r.z
        for r in df.select(
            "x", "y", zorder_key(F.col("x"), F.col("y")).alias("z")
        ).collect()
    }
    assert got[(0, 0)] == 0
    assert got[(3, 5)] == 27
    assert got[(255, 255)] == 65535
    assert got[(1, 0)] == 2  # x bits land at odd positions
    assert got[(0, 1)] == 1  # y bits land at even positions


def test_zorder_layout_tightens_file_bounding_boxes(spark, sf_dir, tmp_path):
    """The OPTIMIZE ZORDER effect, measured on actual files: after
    zorder_layout, every file's (x, y) bounding box is tight in BOTH
    dimensions (the 16-file split of the 256×256 z-space gives 64×64
    boxes = 1/16 of each axis), while a round-robin layout's boxes
    span essentially the full domain in both. Row content round-trips
    unchanged."""
    from pyspark.sql import functions as F

    from event_stream_aggr_spark.operators.maintenance import zorder_layout
    from event_stream_aggr_spark.tables import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey"
    )
    out = str(tmp_path / "zorder")
    zorder_layout(li, "l_partkey", "l_suppkey", n_files=16).write.parquet(out)

    back = spark.read.parquet(out)
    assert back.count() == li.count()

    boxes = (
        back.select(
            F.input_file_name().alias("f"),
            F.pmod("l_partkey", 256).alias("x"),
            F.pmod("l_suppkey", 256).alias("y"),
        )
        .groupBy("f")
        .agg(
            (F.max("x") - F.min("x")).alias("xs"),
            (F.max("y") - F.min("y")).alias("ys"),
        )
        .collect()
    )
    assert len(boxes) >= 8
    # every file tight in BOTH dims: a 16-way z-range split can span at
    # most 2 adjacent 64x64 tiles per dim (range boundaries mid-tile)
    for b in boxes:
        assert b.xs <= 128 and b.ys <= 128, f"loose bbox: {b}"


def test_zorder_tiles_bounded_32x32(spark, sf_dir):
    """qz01's locality claim, asserted directly: every 1024-cell
    z-tile's bounding box is at most 32×32."""
    from event_stream_aggr_spark.plans.registry import load_all

    rows = load_all()["qz01_zorder_locality"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.x_max - r.x_min <= 31 and r.y_max - r.y_min <= 31


def test_compaction_plan_bins_are_contiguous_and_sized(spark, sf_dir):
    from event_stream_aggr_spark.operators.maintenance import (
        COMPACTION_TARGET_CHARS,
    )
    from event_stream_aggr_spark.plans.registry import load_all

    rows = load_all()["qz02_compaction_plan"].fn(spark, sf_dir).collect()
    assert rows
    by_source = {}
    for r in rows:
        by_source.setdefault(r.source, []).append(r)
    for source, bins in by_source.items():
        bins.sort(key=lambda r: r.bin_id)
        # bin ids dense from 0; id ranges non-overlapping and ordered
        assert [b.bin_id for b in bins] == list(range(len(bins)))
        for a, b in zip(bins, bins[1:]):
            assert a.last_file < b.first_file
        # greedy-by-offset: files are contiguous, so the cumulative
        # size through bin b must reach bin b+1's offset boundary
        # (individual bins can under-fill when a file straddles into
        # their offset range — that's the deterministic rule, not a bug)
        running = 0
        for b in bins[:-1]:
            running += b.bin_chars
            assert running >= (b.bin_id + 1) * COMPACTION_TARGET_CHARS


def test_qz07_zorder_buckets_bound_both_dimensions(spark, sf_dir):
    """The pruning property qz07's output claims: every z-bucket
    (top 4 bits of each 8-bit dimension) bounds BOTH dimensions to a
    span < 16 of 256 — a single-column sort can only do this for one
    dimension. Also pin the plan: the z-key is per-row arithmetic, so
    the only exchange is the final group-grain aggregation."""
    from event_stream_aggr_spark.plans.registry import load_all

    df = load_all()["qz07_zorder_layout"].fn(spark, sf_dir)
    rows = df.collect()
    assert len(rows) > 0
    for r in rows:
        assert 0 <= r.date_span < 16, r
        assert 0 <= r.part_span < 16, r
    plan = df._jdf.queryExecution().executedPlan().toString()
    # two exchanges: the 1-row partkey-domain calibration agg and the
    # <=256-bucket envelope agg — both group-grain, neither data-sized
    assert plan.count("Exchange hashpartitioning") <= 2


def test_qz08_auto_picks_plain_on_uniform_orders(spark, sf_dir):
    """Pin the auto decision on the actual test corpus: TPC-H-uniform
    o_custkey must route to the PLAIN window (the staged form costs
    ~1.7x there) — the driver's oracle is branch-independent, so
    without this pin an accidental always-staged regression would
    stay value-green while silently paying the premium."""
    from event_stream_aggr_spark.operators.skew import running_total_strategy
    from event_stream_aggr_spark.tables import load_table

    o = load_table(spark, sf_dir, "orders")
    assert running_total_strategy(o, "o_custkey") == "plain"


def test_qz09_auto_picks_plain_on_uniform_orders(spark, sf_dir):
    """Pin the auto JOIN decision on the actual test corpus (the qz08
    pattern): TPC-H-uniform o_custkey must route to the PLAIN join —
    qz09's oracle is branch-independent, so without this pin an
    accidental always-salted regression would stay value-green while
    silently paying the replication premium."""
    from pyspark.sql import functions as F

    from event_stream_aggr_spark.operators.skew import join_skew_strategy
    from event_stream_aggr_spark.tables import load_table

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey")
    )
    assert join_skew_strategy(o, "c_custkey") == ("plain", 1)


def test_qz10_skew_gate_fires_and_aqe_credit_takes_it(spark, sf_dir):
    """Pin qz10's reason for existing (r11): on its deliberately hot
    key (60% of orders on custkey 1) the ROW-SKEW GATE FIRES — with
    the backstop pinned off the selector salts — and the armed-AQE
    credit is what flips the decision to plain, which is the branch
    the registered query's executed plan must carry (no salt
    expression). Without the backstop=False assertion this would be
    indistinguishable from the gate never firing (qz09's uniform
    case); without the plan assertion the credit could silently stop
    being taken while the branch-independent oracle stayed green."""
    from pyspark.sql import functions as F

    from event_stream_aggr_spark.operators.skew import join_skew_strategy
    from event_stream_aggr_spark.plans.registry import load_all
    from event_stream_aggr_spark.tables import load_table

    o = load_table(spark, sf_dir, "orders").select(
        F.when(F.col("o_orderkey") % 10 < 6, F.lit(1).cast("long"))
        .otherwise(F.col("o_custkey"))
        .alias("c_custkey")
    )
    choice, salt = join_skew_strategy(o, "c_custkey", aqe_backstop=False)
    assert choice == "salted" and salt >= 2  # the gate fires
    assert join_skew_strategy(o, "c_custkey") == ("plain", 1)  # the credit

    df = load_all()["qz10_aqe_credited_join"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "xxhash64" not in plan  # the registered plan rides plain+AQE


def test_qz11_hrw_movement_bound_and_mod_hash_contrast(spark, sf_dir):
    """qz11's minimal-movement guarantee as an executable invariant:
    on a grow (8 -> 10 shards) a key's old-shard hashes are unchanged,
    so it moves ONLY if a new shard wins its argmax — every surviving
    shard must show n_moved_in == 0, total movement ~= 2/10 of keys.
    The mod-hash contrast (the policy HRW replaces) moves ~7/8."""
    from pyspark.sql import functions as F

    from event_stream_aggr_spark.operators.maintenance import (
        HRW_SHARDS_NEW,
        HRW_SHARDS_OLD,
        hrw_shard,
    )
    from event_stream_aggr_spark.plans.registry import load_all

    rows = load_all()["qz11_consistent_sharding"].fn(spark, sf_dir).collect()
    per = {r.shard: (r.n_keys, r.n_moved_in) for r in rows}
    total = sum(n for n, _ in per.values())
    moved = sum(m for _, m in per.values())
    # surviving shards receive zero movers; added shards receive ALL
    for shard in range(HRW_SHARDS_OLD):
        if shard in per:
            assert per[shard][1] == 0, f"shard {shard} received movers"
    for shard in range(HRW_SHARDS_OLD, HRW_SHARDS_NEW):
        assert per[shard][0] == per[shard][1], "new shard keys must all be movers"
    # movement share ~ added/new (binomial tolerance, 500+ keys)
    frac = moved / total
    assert 0.10 <= frac <= 0.32, frac

    # contrast: mod-hash reassigns the vast majority on the same grow
    from event_stream_aggr_spark.tables import load_table

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    mod_moved = d.filter(
        (F.col("doc_id") % HRW_SHARDS_OLD) != (F.col("doc_id") % HRW_SHARDS_NEW)
    ).count()
    assert mod_moved / total > 2.5 * frac

    # determinism + argmax stability: assignment is a pure expression
    a = d.select(hrw_shard(F.col("doc_id"), HRW_SHARDS_NEW).alias("s"))
    b = d.select(hrw_shard(F.col("doc_id"), HRW_SHARDS_NEW).alias("s"))
    assert a.exceptAll(b).count() == 0
