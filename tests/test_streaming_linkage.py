"""Streaming entity resolution (round 12): link_batch folded over
micro-batches via streaming/linkage.entity_resolution_sink.

Pins the module's stated contract:
1. within a batch, 'match' pairs form entities by connected components
   (the offline qer02 rule) under the min rec_id;
2. cross-batch arrivals link to CANONICAL registry entities; the
   registry grows only by newly founded entities and linked records
   never update it (first-writer-wins);
3. a component containing a registry match adopts the min matched
   entity id (entity-merge signal), and founds nothing new;
4. the documented alias-split: an arrival matching only a
   non-canonical record admitted earlier founds a duplicate entity;
5. redelivery of a committed epoch is a no-op; an epoch id below the
   committed one raises;
6. an end-to-end availableNow stream equals driving the sink by hand.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from event_stream_aggr_spark.streaming.linkage import (
    entity_resolution_sink,
    link_batch,
)
from event_stream_aggr_spark.streaming.state_store import read_append_state

# Match rule (operators/linkage weights): name agreement plus at least
# one of (segment agreement, |balance diff| <= 5.00) clears T_MATCH;
# anything without name agreement cannot.
SCHEMA = "rec_id long, name string, seg string, bal double, nation int"


def _recs(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _assignments(spark, out_dir):
    return {
        r.rec_id: (r.entity_id, r.is_new)
        for r in spark.read.parquet(f"{out_dir}/epoch=*").collect()
    }


def test_within_batch_components_follow_qer02_rule(spark):
    # A~B (name+seg), B~C (name+bal), A!~C → ONE entity under min id,
    # exactly the transitive semantics of the offline qer02
    rows = [
        (10, "N1", "S1", 0.0, 1),
        (11, "N1", "S1", 1000.0, 1),
        (12, "N1", "S2", 1004.0, 1),
        (13, "N1", "S2", 1009.0, 1),  # matches only C — still absorbed
    ]
    out = {
        r.rec_id: (r.entity_id, r.is_new)
        for r in link_batch(_recs(spark, rows), None).collect()
    }
    assert out == {10: (10, True), 11: (10, False), 12: (10, False), 13: (10, False)}


def test_no_match_without_name_agreement(spark):
    rows = [
        (1, "Acme", "AUTO", 100.0, 7),
        (2, "Bolt", "AUTO", 100.0, 7),  # same block, same seg+bal — no name
    ]
    out = {
        r.rec_id: (r.entity_id, r.is_new)
        for r in link_batch(_recs(spark, rows), None).collect()
    }
    assert out == {1: (1, True), 2: (2, True)}


def test_cross_batch_links_to_canonical_and_registry_growth(spark, tmp_path):
    root, out = str(tmp_path / "state"), str(tmp_path / "out")
    sink = entity_resolution_sink(root, out)
    sink(_recs(spark, [(1, "Acme", "AUTO", 100.0, 7)]), 0)
    # arrival matches canonical 1 (name+seg) → linked, registry unchanged
    sink(_recs(spark, [(2, "Acme", "AUTO", 900.0, 7)]), 1)
    # novel arrival → new entity
    sink(_recs(spark, [(3, "Bolt", "RETAIL", 5.0, 3)]), 2)
    assert _assignments(spark, out) == {
        1: (1, True),
        2: (1, False),
        3: (3, True),
    }
    state, committed = read_append_state(spark, root)
    assert committed == 2
    reg = {r.entity_id for r in state.collect()}
    assert reg == {1, 3}  # linked record 2 never entered


def test_component_with_store_match_adopts_store_entity(spark, tmp_path):
    root, out = str(tmp_path / "state"), str(tmp_path / "out")
    sink = entity_resolution_sink(root, out)
    sink(_recs(spark, [(1, "Acme", "AUTO", 100.0, 7)]), 0)
    # 5~6 within batch (name+seg); 5 also matches canonical 1
    # (name+bal) → the WHOLE component adopts entity 1
    sink(
        _recs(
            spark,
            [(5, "Acme", "RETAIL", 102.0, 7), (6, "Acme", "RETAIL", 900.0, 7)],
        ),
        1,
    )
    assert _assignments(spark, out) == {
        1: (1, True),
        5: (1, False),
        6: (1, False),
    }
    state, _ = read_append_state(spark, root)
    assert {r.entity_id for r in state.collect()} == {1}


def test_documented_alias_split(spark, tmp_path):
    # A(1)~B(2) admitted together (B linked, non-canonical). Later C
    # matches B's fields but not A's → C cannot see B in the registry
    # and founds a duplicate entity — the stated first-writer trade.
    root, out = str(tmp_path / "state"), str(tmp_path / "out")
    sink = entity_resolution_sink(root, out)
    sink(
        _recs(
            spark,
            [(1, "N1", "S1", 0.0, 1), (2, "N1", "S1", 1000.0, 1)],
        ),
        0,
    )
    # C: name agrees, seg S2 (disagrees with canonical 1), bal close
    # to B only → would match B, matches nothing canonical
    sink(_recs(spark, [(3, "N1", "S2", 1002.0, 1)]), 1)
    a = _assignments(spark, out)
    assert a[2] == (1, False)
    assert a[3] == (3, True)


def test_redelivery_noop_and_stale_checkpoint_raises(spark, tmp_path):
    root, out = str(tmp_path / "state"), str(tmp_path / "out")
    sink = entity_resolution_sink(root, out)
    sink(_recs(spark, [(1, "Acme", "AUTO", 100.0, 7)]), 0)
    sink(_recs(spark, [(2, "Bolt", "AUTO", 50.0, 7)]), 1)
    state_before = sorted(map(tuple, read_append_state(spark, root)[0].collect()))
    out_before = _assignments(spark, out)

    sink(_recs(spark, [(2, "Bolt", "AUTO", 50.0, 7)]), 1)  # redelivery
    assert sorted(map(tuple, read_append_state(spark, root)[0].collect())) == (
        state_before
    )
    assert _assignments(spark, out) == out_before

    with pytest.raises(ValueError, match="below"):
        sink(_recs(spark, [(9, "Zed", "AUTO", 1.0, 1)]), 0)


def test_end_to_end_stream_matches_hand_driven(spark, tmp_path):
    from event_stream_aggr_spark.sources.files import stream_parquet_dir

    src = str(tmp_path / "src")
    rows = [
        (1, "Acme", "AUTO", 100.0, 7),
        (2, "Acme", "AUTO", 500.0, 7),
        (3, "Bolt", "RETAIL", 5.0, 3),
        (4, "Bolt", "RETAIL", 7.0, 3),
    ]
    _recs(spark, rows).repartition(2).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema

    root, out = str(tmp_path / "state"), str(tmp_path / "out")
    q = (
        stream_parquet_dir(spark, src, schema, max_files_per_trigger=1)
        .writeStream.foreachBatch(entity_resolution_sink(root, out))
        .option("checkpointLocation", os.path.join(str(tmp_path), "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    a = _assignments(spark, out)
    # batch boundaries (file pick order) decide WHICH record of each
    # name group is admitted first and becomes canonical — that's the
    # first-writer-wins contract, so assert the order-INDEPENDENT
    # invariants: each group resolves to exactly ONE entity, owned by
    # one of its own members, with exactly one is_new per group
    for group in ({1, 2}, {3, 4}):
        ents = {a[r][0] for r in group}
        assert len(ents) == 1 and ents <= group
        assert sum(a[r][1] for r in group) == 1
        (canon,) = ents
        assert a[canon] == (canon, True)
    # registry = exactly the two canonicals
    state, _ = read_append_state(spark, root)
    assert {r.entity_id for r in state.collect()} == {
        a[1][0], a[3][0]
    }


def test_purge_metrics_written_per_epoch(spark, tmp_path):
    # Purge observability (round 13): every committed epoch writes one
    # (epoch, store_purged_p1/p2, batch_purged_p1/p2) row OUTSIDE the
    # epoch=* glob, so registry-vs-arrival block purging is visible in
    # the stream exactly as qer03's n_purged_blocks is offline.
    # block_cap=4 keeps the hot block small; the default-cap dataflow
    # is identical (same parameterized plan).
    cap = 4
    root, out = str(tmp_path / "state"), str(tmp_path / "out")
    # blocking="flat" pinned: this test asserts the FLAT purge
    # counters and the flat kernel's recall loss; the default 'auto'
    # would switch these dense epochs to the composed ladders
    sink = entity_resolution_sink(root, out, block_cap=cap, blocking="flat")
    # epoch 0: cold store → store counters forced to 0 by contract
    sink(_recs(spark, [(1, "Acme", "AUTO", 100.0, 7)]), 0)
    m0 = spark.read.parquet(f"{out}/purge_metrics/epoch=0").collect()
    assert [tuple(r) for r in m0] == [(0, 0, 0, 0, 0, "flat")]
    # grow a hot P1 block: cap+1 distinct registry entities all named
    # "Hot" (pairwise non-matching: seg differs and balances are
    # > 5.00 apart AND in distinct balance bands → each founds an
    # entity; the within-batch P1 block product (cap+1)^2 > cap is
    # itself purged, which the batch counter must report)
    hot = [
        (100 + i, "Hot", f"S{i}", 1000.0 * i, 7) for i in range(cap + 1)
    ]
    sink(_recs(spark, hot), 1)
    m1 = spark.read.parquet(f"{out}/purge_metrics/epoch=1").collect()
    assert [tuple(r) for r in m1] == [(1, 0, 0, 1, 0, "flat")]
    state, _ = read_append_state(spark, root)
    assert state.filter(F.col("name") == "Hot").count() == cap + 1
    # one arrival named "Hot" in a balance band no store entity
    # occupies (so P2 cannot rescue the pair): store P1 block product
    # (1 × (cap+1)) exceeds the cap → purged, and the counter says so
    sink(_recs(spark, [(999, "Hot", "S0", 500.0, 7)]), 2)
    m2 = spark.read.parquet(f"{out}/purge_metrics/epoch=2").collect()
    assert [tuple(r) for r in m2] == [(2, 1, 0, 0, 0, "flat")]
    # ... and the purged arrival founded a duplicate entity (the
    # recall loss the counter makes visible)
    a = _assignments(spark, out)
    assert a[999] == (999, True)


def test_metrics_row_writer_replay_overwrites(spark, tmp_path):
    # Round 15: the purge-metrics row lands via a driver-side
    # pyarrow + Hadoop-FileSystem write (_write_metrics_row) instead
    # of a 1-task Spark job. Pins the replaced write's semantics: the
    # schema is byte-identical to the old createDataFrame write, and
    # an epoch REPLAY rewrites the same row (delete + recreate — never
    # a second part file accumulating under the epoch dir).
    from event_stream_aggr_spark.streaming.linkage import _write_metrics_row

    d = str(tmp_path / "purge_metrics" / "epoch=3")
    _write_metrics_row(spark, d, 3, 1, 2, 3, 4, "flat")
    first = spark.read.parquet(d)
    assert [
        (f.name, f.dataType.simpleString()) for f in first.schema.fields
    ] == [
        ("epoch", "bigint"),
        ("store_purged_p1", "bigint"),
        ("store_purged_p2", "bigint"),
        ("batch_purged_p1", "bigint"),
        ("batch_purged_p2", "bigint"),
        ("mode", "string"),
    ]
    assert [tuple(r) for r in first.collect()] == [(3, 1, 2, 3, 4, "flat")]
    # replay of the committed epoch with fresher counters: exactly one
    # row (and one data file) must remain, holding the replay's values
    _write_metrics_row(spark, d, 3, 9, 8, 7, 6, "composed")
    again = spark.read.parquet(d)
    assert [tuple(r) for r in again.collect()] == [(3, 9, 8, 7, 6, "composed")]
    files = [
        p for p in os.listdir(d) if p.endswith(".parquet")
    ]
    assert len(files) == 1


# ---------------------------------------------------------------------------
# blocking="composed" (round 14): qer05's ladders inside the gate
# ---------------------------------------------------------------------------


def test_composed_scored_pairs_agrees_with_report_counts(spark):
    """The pair-producing kernel and the audit report must describe
    the same candidate set: pair count == n_candidates, match count
    == n_match_pairs, and the pairs are genuinely distinct."""
    from event_stream_aggr_spark.operators.linkage import (
        _a_side,
        _twin_side,
        composed_blocking_report,
        composed_scored_pairs,
    )

    sf = "/root/testdata/sf0.001"
    a, b = _a_side(spark, sf), _twin_side(spark, sf)
    pairs = composed_scored_pairs(a, b)
    rep = composed_blocking_report(a, b).first()
    n = pairs.count()
    assert n == rep["n_candidates"]
    assert (
        pairs.filter("decision = 'match'").count() == rep["n_match_pairs"]
    )
    assert pairs.select("a_id", "b_id").distinct().count() == n


def test_composed_blocking_recovers_matches_flat_purging_loses(spark):
    """The production scenario the composition exists for: a dense
    name block (5 same-name records, one true duplicate pair inside)
    over a tight cap. Flat blocking purges BOTH passes wholesale and
    founds 5 entities; composed refinement descends to the exact-
    balance bottom, recovers the duplicate, and founds 4."""
    from event_stream_aggr_spark.streaming.linkage import link_batch

    rows = [
        (1, "Acme Corporation Intl", "AUTO", 100.0, 7),
        (2, "Acme Corporation Intl", "AUTO", 110.0, 7),
        (3, "Acme Corporation Intl", "AUTO", 120.0, 7),
        (4, "Acme Corporation Intl", "AUTO", 100.0, 7),  # dup of 1
        (5, "Acme Corporation Intl", "AUTO", 130.0, 7),
    ]
    recs = spark.createDataFrame(
        rows, "rec_id long, name string, seg string, bal double, nation long"
    )
    flat = {
        r.rec_id: r.entity_id
        for r in link_batch(recs, None, block_cap=4).collect()
    }
    comp = {
        r.rec_id: r.entity_id
        for r in link_batch(
            recs, None, block_cap=4, blocking="composed"
        ).collect()
    }
    # flat: every block (5x5=25 > 4) purged in both passes → 5 entities
    assert flat == {1: 1, 2: 2, 3: 3, 4: 4, 5: 5}
    # composed: pass B descends to exact balance; the 2x2=4 <= 4 block
    # at bal=100 recovers the duplicate
    assert comp == {1: 1, 2: 2, 3: 3, 4: 1, 5: 5}


def test_er_sink_composed_end_to_end(spark, tmp_path):
    """The composed gate under the full epoch protocol: cross-epoch
    registry linking, append folds, redelivery no-op, and the purge
    metrics carrying the per-LADDER counters."""
    from event_stream_aggr_spark.streaming.linkage import (
        entity_resolution_sink,
    )

    schema = "rec_id long, name string, seg string, bal double, nation long"
    e0 = spark.createDataFrame(
        [(1, "alice", "AUTO", 10.0, 3), (2, "bob", "BIKE", 20.0, 4)], schema
    )
    e1 = spark.createDataFrame(
        [(3, "alice", "AUTO", 10.0, 3), (4, "carol", "SHIP", 30.0, 5)],
        schema,
    )
    root, out = str(tmp_path / "reg"), str(tmp_path / "out")
    sink = entity_resolution_sink(root, out, blocking="composed")
    sink(e0, 0)
    sink(e1, 1)
    sink(e1, 1)  # post-commit redelivery: no-op
    state, epoch = read_append_state(spark, root)
    assert epoch == 1
    assert sorted((r.entity_id, r.name) for r in state.collect()) == [
        (1, "alice"),
        (2, "bob"),
        (4, "carol"),
    ]
    by_rec = {
        r.rec_id: (r.entity_id, r.is_new)
        for r in spark.read.parquet(f"{out}/epoch=1").collect()
    }
    assert by_rec[3] == (1, False) and by_rec[4] == (4, True)
    m = spark.read.parquet(f"{out}/purge_metrics/epoch=1").first()
    assert m["epoch"] == 1
    # nothing dense here: both ladders keep everything, zero purged
    assert (
        m["store_purged_p1"] == 0
        and m["store_purged_p2"] == 0
        and m["batch_purged_p1"] == 0
        and m["batch_purged_p2"] == 0
    )


def test_er_sink_rejects_unknown_blocking(spark, tmp_path):
    from event_stream_aggr_spark.streaming.linkage import link_batch

    recs = spark.createDataFrame(
        [(1, "a", "S", 1.0, 1)],
        "rec_id long, name string, seg string, bal double, nation long",
    )
    import pytest

    with pytest.raises(ValueError, match="unknown blocking strategy"):
        link_batch(recs, None, blocking="fancy")


def test_er_sink_rejects_unknown_blocking_at_construction(tmp_path):
    from event_stream_aggr_spark.streaming.linkage import (
        entity_resolution_sink,
    )
    import pytest

    with pytest.raises(ValueError, match="unknown blocking strategy"):
        entity_resolution_sink(str(tmp_path / "s"), str(tmp_path / "o"),
                               blocking="fancy")


def test_er_sink_auto_picks_flat_then_composed(spark, tmp_path):
    """The 'auto' default's crossover, end to end: a sparse epoch runs
    the flat kernel (no block would purge, so flat links identically
    and is cheaper), and a dense epoch — the exact corpus where flat
    purge-cliffs away a true duplicate — switches to the composed
    ladders and recovers it. The per-epoch choice lands in the purge
    metrics' mode column."""
    from event_stream_aggr_spark.streaming.linkage import (
        entity_resolution_sink,
    )

    schema = "rec_id long, name string, seg string, bal double, nation long"
    cap = 4
    root, out = str(tmp_path / "state"), str(tmp_path / "out")
    sink = entity_resolution_sink(root, out, block_cap=cap)  # auto default
    # epoch 0: sparse — distinct names, distinct bands, nothing purges
    e0 = spark.createDataFrame(
        [(1, "alice", "AUTO", 10.0, 3), (2, "bob", "BIKE", 500.0, 4)],
        schema,
    )
    sink(e0, 0)
    m0 = spark.read.parquet(f"{out}/purge_metrics/epoch=0").first()
    assert m0["mode"] == "flat"
    # epoch 1: the flat-loses/composed-links corpus (5 same-name rows,
    # 5x5 > cap purges the name AND band blocks wholesale under flat;
    # the composed balance ladder descends to exact balance and keeps
    # the 2x2 block holding the true duplicate of rec 11)
    e1 = spark.createDataFrame(
        [
            (11, "Acme Corporation Intl", "AUTO", 100.0, 7),
            (12, "Acme Corporation Intl", "AUTO", 110.0, 7),
            (13, "Acme Corporation Intl", "AUTO", 120.0, 7),
            (14, "Acme Corporation Intl", "AUTO", 100.0, 7),  # dup of 11
            (15, "Acme Corporation Intl", "AUTO", 130.0, 7),
        ],
        schema,
    )
    sink(e1, 1)
    m1 = spark.read.parquet(f"{out}/purge_metrics/epoch=1").first()
    assert m1["mode"] == "composed"
    asg = {
        r.rec_id: r.entity_id
        for r in spark.read.parquet(f"{out}/epoch=1").collect()
    }
    assert asg[14] == 11  # the duplicate flat would have dropped


def test_incremental_store_counts_equal_cold_recompute(spark, tmp_path):
    """Round 15 (second half): under 'auto', the probe's registry-side
    block counts fold each epoch's DELTA into a cached frame instead
    of re-scanning the registry. The cache must equal a cold
    block_key_counts of the live registry after founding epochs, a
    linked-only (n_new includes founders here though) and an idle
    epoch."""
    from event_stream_aggr_spark.operators.linkage import (
        block_key_counts,
    )
    from event_stream_aggr_spark.streaming.linkage import (
        _as_b,
        entity_resolution_sink,
    )
    from event_stream_aggr_spark.streaming.state_store import (
        read_append_state,
    )

    schema = "rec_id long, name string, seg string, bal double, nation long"
    root, out = str(tmp_path / "reg"), str(tmp_path / "out")
    sink = entity_resolution_sink(root, out)  # auto default
    sink(
        spark.createDataFrame(
            [(1, "alice", "AUTO", 10.0, 3), (2, "bob", "BIKE", 500.0, 4)],
            schema,
        ),
        0,
    )
    sink(
        spark.createDataFrame(
            [(3, "alice", "AUTO", 10.0, 3), (4, "carol", "SHIP", 30.0, 5)],
            schema,
        ),
        1,
    )
    # idle epoch: links only, founds nothing → cache must just advance
    sink(
        spark.createDataFrame([(5, "alice", "AUTO", 10.0, 3)], schema), 2
    )
    # run one more epoch so epoch-2's lazily-merged cache materializes
    sink(
        spark.createDataFrame([(6, "dave", "MACH", 70.0, 1)], schema), 3
    )
    cache = sink._sc_cache
    assert cache["epoch"] == 3 and cache["df"] is not None
    state, epoch = read_append_state(spark, root)
    assert epoch == 3
    cold = {
        (r["gid"], r["k1"], r["k2n"], r["k2b"]): r["c"]
        for r in block_key_counts(_as_b(state, "entity_id"), "b").collect()
    }
    cached = {
        (r["gid"], r["k1"], r["k2n"], r["k2b"]): r["c"]
        for r in cache["df"].collect()
    }
    assert cached == cold and len(cold) > 0


def test_er_sink_output_and_registry_schema_contract(spark, tmp_path):
    """Consumer-facing schema pins (round 15, after carry_fields): the
    epoch output stays EXACTLY (rec_id, entity_id, is_new) — the wide
    assignments checkpoint must be narrowed before the write — and the
    registry keeps the batch's RAW field types (bal stays double, not
    the scoring projection's decimal cast)."""
    from event_stream_aggr_spark.streaming.linkage import (
        entity_resolution_sink,
    )

    rows = [(1, "alice", "AUTO", 10.25, 3), (2, "bob", "BIKE", 20.5, 4)]
    root, out = str(tmp_path / "reg"), str(tmp_path / "out")
    sink = entity_resolution_sink(root, out)
    sink(_recs(spark, rows), 0)
    written = spark.read.parquet(f"{out}/epoch=0")
    assert written.columns == ["rec_id", "entity_id", "is_new"]
    state, _ = read_append_state(spark, root)
    assert state.columns == ["entity_id", "name", "seg", "bal", "nation"]
    by_type = dict(state.dtypes)
    assert by_type["bal"] == "double" and by_type["nation"] == "int"
    assert sorted((r.entity_id, r.bal) for r in state.collect()) == [
        (1, 10.25),
        (2, 20.5),
    ]
