"""Block-refinement ladder (operators/linkage.refinement_report):
oversized blocks re-block under finer keys; purge only at the bottom.
Pins the qer04 contract on synthetic frames (cap small enough to
drive every level) and the level-engagement trajectory on the real
corpus at sf0.001/sf0.01 (L0-kept -> L1-kept; sf0.1's L2 regime is
covered by the driver/strict oracle check)."""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import functions as F

from event_stream_aggr_spark.operators.linkage import (
    B_ID_OFFSET,
    refinement_report,
)

A_SCHEMA = (
    "a_id long, a_name string, a_seg string, a_bal decimal(12,2), "
    "a_nation int"
)
B_SCHEMA = (
    "b_id long, b_name string, b_seg string, b_bal decimal(13,2), "
    "b_nation int"
)

# 14-char coarse prefix shared by every name below
P = "BlockKeyPrefix"


def _sides(spark, rows):
    a = spark.createDataFrame(
        [(i, n, s, Decimal(str(b)), nat) for (i, n, s, b, nat) in rows],
        A_SCHEMA,
    )
    b = spark.createDataFrame(
        [
            (i + B_ID_OFFSET, n, s, Decimal(str(b_)), nat)
            for (i, n, s, b_, nat) in rows
        ],
        B_SCHEMA,
    )
    return a, b


def test_ladder_keeps_at_level1_and_loses_cross_subkey_pairs(spark):
    rows = [
        (1, P + "x1", "S1", 10.00, 1),
        (2, P + "x2", "S1", 20.00, 1),
        (3, P + "x3", "S2", 30.00, 2),
        (4, P + "x4", "S2", 40.00, 2),
    ]
    a, b = _sides(spark, rows)
    # twin 4 moves nation: its pair disagrees on the L1 sub-key
    b = b.withColumn(
        "b_nation",
        F.when(F.col("b_id") == 4 + B_ID_OFFSET, 9).otherwise(
            F.col("b_nation")
        ),
    )
    # L0 product 4x4 > cap=5 -> descend; L1 blocks (P,1): 2x2 kept,
    # (P,2): 2x1 kept, (P,9): B-only -> no block
    r = refinement_report(a, b, cap=5).collect()[0]
    assert (
        r.n_l0_blocks_kept,
        r.n_l1_blocks_kept,
        r.n_l2_blocks_kept,
        r.n_l3_blocks_kept,
        r.n_purged_blocks,
    ) == (0, 2, 0, 0, 0)
    # candidates: 4 (nation-1 block) + 2 (nation-2 block) = 6;
    # true pairs found = 3 — record 4's twin is the refinement loss
    assert r.n_candidates == 6
    assert r.n_true_found == 3 and r.n_true_missed == 1


def test_ladder_descends_to_bottom_and_purges_true_degeneracy(spark):
    # three records sharing name AND nation AND segment (true
    # full-key degeneracy): every level's product is 9 > 2, including
    # the exact-name bottom -> PURGED there, counted
    rows = [
        (1, P + "same", "S1", 10.00, 1),
        (2, P + "same", "S1", 20.00, 1),
        (3, P + "same", "S1", 30.00, 1),
    ]
    a, b = _sides(spark, rows)
    r = refinement_report(a, b, cap=2).collect()[0]
    assert (
        r.n_l0_blocks_kept,
        r.n_l1_blocks_kept,
        r.n_l2_blocks_kept,
        r.n_l3_blocks_kept,
        r.n_purged_blocks,
    ) == (0, 0, 0, 0, 1)
    assert r.n_candidates == 0 and r.n_true_missed == 3


def test_exact_name_bottom_recovers_distinct_names(spark):
    # DISTINCT names under a shared (prefix, nation, segment) block:
    # L0/L1/L2 products 9 > 2 -> descend; the exact-name bottom
    # separates them into 1x1 blocks -> kept, full recall (this is
    # the recovery the dense-corpus probe measures; contrast the
    # true-degeneracy purge above)
    rows = [
        (1, P + "a", "S1", 10.00, 1),
        (2, P + "b", "S1", 20.00, 1),
        (3, P + "c", "S1", 30.00, 1),
    ]
    a, b = _sides(spark, rows)
    r = refinement_report(a, b, cap=2).collect()[0]
    assert (
        r.n_l0_blocks_kept,
        r.n_l1_blocks_kept,
        r.n_l2_blocks_kept,
        r.n_l3_blocks_kept,
        r.n_purged_blocks,
    ) == (0, 0, 0, 3, 0)
    assert r.n_candidates == 3
    assert r.n_true_found == 3 and r.n_true_missed == 0


def test_ladder_levels_partition_pairs_no_dedup_needed(spark):
    # mixed regime: one small coarse block kept at L0, one oversized
    # block kept at L1 — every candidate pair appears exactly once
    rows = [
        (1, "OtherPrefix14x", "S1", 10.00, 1),   # lone block, L0-kept
        (2, P + "a", "S1", 20.00, 1),
        (3, P + "b", "S2", 30.00, 1),
        (4, P + "c", "S1", 40.00, 2),
    ]
    a, b = _sides(spark, rows)
    r = refinement_report(a, b, cap=4).collect()[0]
    # L0: lone block 1x1 kept; P-block 3x3 > 4 -> L1: (P,1) 2x2 kept,
    # (P,2) 1x1 kept
    assert (r.n_l0_blocks_kept, r.n_l1_blocks_kept) == (1, 2)
    assert r.n_candidates == 1 + 4 + 1
    assert r.n_true_found == 4 and r.n_true_missed == 0


def test_level_trajectory_on_real_corpus(spark):
    from event_stream_aggr_spark.operators.linkage import (
        _a_side,
        _twin_side,
    )

    # sf0.001: the coarse block's product is under the default cap ->
    # kept at L0; sf0.01: over -> refined once, kept at +nation
    r1 = refinement_report(
        _a_side(spark, "/root/testdata/sf0.001"),
        _twin_side(spark, "/root/testdata/sf0.001"),
    ).collect()[0]
    assert (r1.n_l0_blocks_kept, r1.n_l1_blocks_kept) == (1, 0)
    r2 = refinement_report(
        _a_side(spark, "/root/testdata/sf0.01"),
        _twin_side(spark, "/root/testdata/sf0.01"),
    ).collect()[0]
    assert (r2.n_l0_blocks_kept, r2.n_l1_blocks_kept) == (0, 25)


# ---------------------------------------------------------------------------
# qer05: pass-diverse composition (composed_blocking_report)
# ---------------------------------------------------------------------------

from event_stream_aggr_spark.operators.linkage import (  # noqa: E402
    composed_blocking_report,
)


def test_composed_each_corruption_mode_has_a_covering_pass(spark):
    """Pass A (name chain, seg-free) must reach a segment-corrupted
    twin even at its exact-name bottom; pass B (balance chain,
    name-free) must reach a name-corrupted twin. A single qer04-style
    chain finds neither once it descends past the corrupted key."""
    rows = [
        (1, P + "x1", "S1", 10.00, 1),
        (2, P + "x2", "S1", 20.00, 1),  # same balance band as row 1
    ]
    a, b = _sides(spark, rows)
    # twin 1: segment corrupted (name/bal/nation intact)
    # twin 2: name corrupted (seg/bal/nation intact)
    b = b.withColumn(
        "b_seg",
        F.when(F.col("b_id") == 1 + B_ID_OFFSET, "ZZ").otherwise(
            F.col("b_seg")
        ),
    ).withColumn(
        "b_name",
        F.when(
            F.col("b_id") == 2 + B_ID_OFFSET, F.concat(F.lit("X"), "b_name")
        ).otherwise(F.col("b_name")),
    )
    # cap 1 forces every shared-key level to descend: pass A bottoms
    # at exact name (1x1 blocks), pass B at exact balance (1x1)
    r = composed_blocking_report(a, b, cap=1).collect()[0]
    assert r["n_true_found"] == 2 and r["n_true_missed"] == 0
    # the seg-corrupted pair is found at pass A's seg-FREE exact-name
    # bottom; the name-corrupted pair at pass B's name-free exact-
    # balance bottom — neither pass kept anything above its bottom
    assert r["pa_l0_blocks_kept"] == 0 and r["pa_l1_blocks_kept"] == 0
    assert r["pa_l2_blocks_kept"] == 1
    assert (
        r["pb_l0_blocks_kept"] == 0
        and r["pb_l1_blocks_kept"] == 0
        and r["pb_l2_blocks_kept"] == 0
    )
    assert r["pb_l3_blocks_kept"] == 1
    assert r["pa_purged_blocks"] == 0 and r["pb_purged_blocks"] == 0


def test_composed_cross_pass_union_is_distinct(spark):
    """A fully-agreeing twin is reachable through BOTH passes; the
    candidate count must reflect the distinct pair once."""
    rows = [(1, P + "x1", "S1", 10.00, 1)]
    a, b = _sides(spark, rows)
    r = composed_blocking_report(a, b, cap=10_000).collect()[0]
    # one record, one twin: exactly one distinct candidate pair even
    # though pass A L0 and pass B L0 both generate it
    assert r["n_candidates"] == 1
    assert r["n_true_found"] == 1 and r["n_match_pairs"] == 1


def test_composed_per_pass_purges_are_independent(spark):
    """True full-key degeneracy purges at EACH pass's own bottom and
    is counted per pass — and a pair whose block purged in one pass
    can still be found by the other (here: same name+nation+seg but
    distinct balances → pass A's bottom block is degenerate and
    purges under cap 1, while pass B separates the rows at its exact-
    balance bottom and recovers every true pair)."""
    rows = [
        (1, P + "deg", "S1", 10.00, 1),
        (2, P + "deg", "S1", 20.00, 1),
    ]
    a, b = _sides(spark, rows)
    r = composed_blocking_report(a, b, cap=1).collect()[0]
    # pass A: both rows share (k0, nation, nm) → 2x2 block > 1 at the
    # bottom → purged there
    assert r["pa_purged_blocks"] == 1
    # pass B: exact balances are distinct → 1x1 blocks kept at bottom
    assert r["pb_l3_blocks_kept"] == 2 and r["pb_purged_blocks"] == 0
    assert r["n_true_found"] == 2 and r["n_true_missed"] == 0
