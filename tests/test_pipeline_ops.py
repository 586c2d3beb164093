"""Unit + plan-shape tests for the round-2 training-pipeline additions:
n-gram decontamination (qd10), TF-IDF (qt09), sequence packing (qp01),
scalar quantization (qe05), and the correlated-subquery suite
(q49/q50/q51). Value-level correctness is covered by the DuckDB oracle
harness; these tests pin edge-case semantics and the physical-plan
properties the 100 TB design depends on."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from event_stream_aggr_spark.operators.dedup import DECONTAM_NGRAM, ngram_hashes
from event_stream_aggr_spark.operators.packing import pack_assignments
from event_stream_aggr_spark.plans.registry import load_all


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def specs():
    return load_all()


# -- n-gram decontamination -------------------------------------------------


def test_ngram_hashes_short_doc_is_empty(spark):
    # fewer than n tokens must yield an empty array, not a descending
    # sequence() blowup (Spark's sequence(1, 0) descends)
    df = spark.createDataFrame(
        [Row(text=" ".join(["w"] * (DECONTAM_NGRAM - 1)))]
    ).select(F.size(ngram_hashes(F.col("text"))).alias("n"))
    assert df.collect()[0].n == 0


def test_ngram_hashes_count_and_positionality(spark):
    toks = [f"t{i}" for i in range(DECONTAM_NGRAM + 2)]
    df = spark.createDataFrame([Row(text=" ".join(toks))]).select(
        ngram_hashes(F.col("text")).alias("g")
    )
    grams = df.collect()[0].g
    assert len(grams) == 3  # n+2 tokens -> 3 positional n-grams
    assert len(set(grams)) == 3  # distinct positions -> distinct hashes


def test_decontam_eval_stream_broadcasts(spark, sf_dir, specs):
    plan = _plan(specs["qd10_ngram_decontamination"].fn(spark, sf_dir))
    # the eval n-gram set must be the broadcast side: the 13x-sized
    # training n-gram stream never shuffles for the probe
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# -- TF-IDF -----------------------------------------------------------------


def test_tfidf_df_and_corpus_size_broadcast(spark, sf_dir, specs):
    plan = _plan(specs["qt09_tfidf_top_terms"].fn(spark, sf_dir))
    # doc-frequency (vocab-sized) and N (1 row) join map-side
    assert plan.count("BroadcastHashJoin") + plan.count(
        "BroadcastNestedLoopJoin"
    ) >= 2
    assert "SortMergeJoin" not in plan


def test_tfidf_rare_term_outranks_common(spark):
    rows = [
        Row(doc_id=1, text="apple apple banana"),
        Row(doc_id=2, text="banana cherry"),
        Row(doc_id=3, text="banana date"),
    ]
    df = spark.createDataFrame(rows)
    df.createOrReplaceTempView("_tfidf_docs")
    toks = df.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(dfreq, "term")
        .withColumn("tfidf", F.col("tf") * F.log(F.lit(3.0) / F.col("df")))
        .filter(F.col("doc_id") == 2)
        .orderBy(F.col("tfidf").desc())
        .collect()
    )
    # 'banana' appears in all docs -> idf ln(1) = 0; 'cherry' is unique
    assert scored[0].term == "cherry" and scored[-1].tfidf == 0.0


# -- sequence packing -------------------------------------------------------


def test_pack_assignment_boundaries(spark):
    # budget 10; doc sizes 4,4,4 -> offsets 0,4,8 -> packs 0,0,0 within
    # budget semantics (doc starting before the boundary stays in pack 0
    # even if it straddles); next doc starts at 12 -> pack 1
    rows = [
        Row(source="s", doc_id=i, text=" ".join(["w"] * 4)) for i in range(4)
    ]
    placed = pack_assignments(
        spark.createDataFrame(rows), budget=10
    ).select("doc_id", "start_offset", "pack_id")
    got = {r.doc_id: (r.start_offset, r.pack_id) for r in placed.collect()}
    assert got == {0: (0, 0), 1: (4, 0), 2: (8, 0), 3: (12, 1)}


def test_pack_partitions_are_independent(spark):
    rows = [
        Row(source=s, doc_id=i, text=" ".join(["w"] * 7))
        for s in ("a", "b")
        for i in range(3)
    ]
    placed = pack_assignments(spark.createDataFrame(rows), budget=8)
    # each source restarts at offset 0 — no cross-partition coupling
    firsts = (
        placed.filter(F.col("doc_id") == 0)
        .select("source", "start_offset")
        .collect()
    )
    assert all(r.start_offset == 0 for r in firsts) and len(firsts) == 2


def test_packing_window_not_global_sort(spark, sf_dir, specs):
    plan = _plan(specs["qp01_sequence_packing"].fn(spark, sf_dir))
    # the running offset must be partitioned by source (hashpartitioning),
    # never a single global ordering; the plan prints top-down, so the
    # window's input distribution is everything BELOW the Window node
    # (the rangepartitioning above it is the final presentation sort)
    below_window = plan.split("Window", 1)[1]
    assert "hashpartitioning(source" in below_window
    assert "rangepartitioning" not in below_window


# -- scalar quantization ----------------------------------------------------


def test_quantization_codes_cover_full_range(spark, sf_dir, specs):
    rows = specs["qe05_scalar_quantization"].fn(spark, sf_dir).collect()
    assert rows, "no labels"
    # per-dim min maps to code 0; per-dim max maps to 255 by floor(1.0*255)
    assert min(r.min_code for r in rows) == 0
    assert max(r.max_code for r in rows) == 255
    for r in rows:
        assert 0 <= r.mean_abs_err < 1.0


def test_quantization_calibration_broadcasts(spark, sf_dir, specs):
    plan = _plan(specs["qe05_scalar_quantization"].fn(spark, sf_dir))
    # the 64-row per-dim stats join back map-side; the exploded vector
    # stream shuffles only for the final label aggregate
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# -- correlated-subquery suite ---------------------------------------------


def test_q50_semi_anti_never_nested_loop(spark, sf_dir, specs):
    plan = _plan(specs["q50_sole_late_supplier"].fn(spark, sf_dir))
    assert "NestedLoop" not in plan
    assert ("LeftSemi" in plan) and ("LeftAnti" in plan)


def test_q49_threshold_joins_broadcast(spark, sf_dir, specs):
    plan = _plan(specs["q49_small_quantity_revenue"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# -- overlap chunking --------------------------------------------------------


def test_chunking_empty_and_short_docs(spark, specs):
    from pyspark.sql import Row

    from event_stream_aggr_spark.operators.text import (
        CHUNK_SIZE,
        CHUNK_STRIDE,
        tokens,
    )

    rows = [
        Row(doc_id=1, text=""),  # no tokens -> no chunks (not a blowup)
        Row(doc_id=2, text=" ".join(["w"] * 10)),  # < size -> one short chunk
        Row(doc_id=3, text=" ".join([f"w{i}" for i in range(CHUNK_SIZE + 1)])),
    ]
    df = spark.createDataFrame(rows)
    t = tokens(F.col("text"))
    n_full = F.floor(
        F.greatest(F.size(t) - CHUNK_SIZE, F.lit(0)) / F.lit(float(CHUNK_STRIDE))
    )
    has_tail = F.when(
        (F.greatest(F.size(t) - CHUNK_SIZE, F.lit(0)) % CHUNK_STRIDE) > 0, 1
    ).otherwise(0)
    got = (
        df.select("doc_id", t.alias("t"), (n_full + has_tail).alias("last_idx"))
        .filter(F.size("t") > 0)
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(0).cast("long"), F.col("last_idx").cast("long"))
            ).alias("i"),
        )
        .groupBy("doc_id")
        .count()
        .collect()
    )
    counts = {r.doc_id: r["count"] for r in got}
    # doc 1 absent (empty), doc 2 one chunk, doc 3 = 65 tokens -> 2 chunks
    assert counts == {2: 1, 3: 2}


def test_chunks_cover_every_token(spark, sf_dir, specs):
    from event_stream_aggr_spark.operators.text import (
        CHUNK_SIZE,
        CHUNK_STRIDE,
        token_count,
    )
    from event_stream_aggr_spark.tables import load_table

    chunks = specs["qt10_overlap_chunks"].fn(spark, sf_dir)
    per_doc = chunks.groupBy("doc_id").agg(
        F.max("chunk_idx").alias("last_idx"),
        F.sum("n_tokens").alias("sum_chunk_tokens"),
        F.min("n_tokens").alias("min_chunk"),
    )
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", token_count(F.col("text")).alias("n_tok")
    )
    j = per_doc.join(docs, "doc_id").collect()
    for r in j:
        # last chunk reaches the final token: stride*last + chunk len == n_tok
        assert r.last_idx * CHUNK_STRIDE < r.n_tok
        covered = r.last_idx * CHUNK_STRIDE + min(
            CHUNK_SIZE, r.n_tok - r.last_idx * CHUNK_STRIDE
        )
        assert covered == r.n_tok


def test_weighted_sample_is_deterministic_and_weight_skewed(spark, sf_dir):
    from event_stream_aggr_spark.plans.registry import load_all

    fn = load_all()["qs05_weighted_sample"].fn
    a = {(r.lang, r.doc_id) for r in fn(spark, sf_dir).collect()}
    b = {(r.lang, r.doc_id) for r in fn(spark, sf_dir).collect()}
    assert a == b and len(a) > 0  # content-derived draw: run-stable
    # weighting by n_chars must pull the sampled mean above the corpus mean
    from event_stream_aggr_spark.tables import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    corpus_mean = docs.agg(F.avg("n_chars")).first()[0]
    sample_mean = fn(spark, sf_dir).agg(F.avg("n_chars")).first()[0]
    assert sample_mean > corpus_mean


def test_curriculum_phases_and_positions(spark):
    """qs07: phase honors the fixed token bounds; pos is a contiguous
    1..n permutation within each (phase, shard)."""
    from collections import defaultdict

    from event_stream_aggr_spark.operators.sampling import (
        CURRICULUM_BOUNDS,
        qs07_curriculum_shards,
    )
    from tests.conftest import SF_DIR_CORRECTNESS

    rows = qs07_curriculum_shards(spark, SF_DIR_CORRECTNESS).collect()
    b0, b1, b2 = CURRICULUM_BOUNDS
    groups = defaultdict(list)
    for r in rows:
        expected = 0 if r.n_tokens < b0 else 1 if r.n_tokens < b1 else 2 if r.n_tokens < b2 else 3
        assert r.phase == expected
        groups[(r.phase, r.shard)].append(r.pos)
    assert len(groups) > 1
    for poss in groups.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))


def test_audio_segments_overlap_fanout(spark, tmp_path):
    """qm03: 50%-overlap windowing — 40 chars → 1 segment, 60 → 2,
    39 → 0; energies are exact byte sums of each overlapping window."""
    from event_stream_aggr_spark.operators.multimodal import qm03_audio_segments

    rows = [(0, "a" * 40), (1, "b" * 60), (2, "c" * 39)]
    spark.createDataFrame(rows, "doc_id long, text string").withColumn(
        "n_chars", F.length("text")
    ).withColumn("lang", F.lit("en")).withColumn("source", F.lit("t")).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))
    out = qm03_audio_segments(spark, str(tmp_path)).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc.get(0, [])) == 1 and len(by_doc.get(1, [])) == 2
    assert 2 not in by_doc
    assert all(r.energy == 40 * ord("a") for r in by_doc[0])
    assert all(r.energy == 40 * ord("b") and r.peak == ord("b") for r in by_doc[1])


def test_point_in_time_features_never_leak(spark, sf_dir):
    """qf02: every matched feature row is STRICTLY before the label
    day (same-day features would aggregate the label event itself);
    unmatched labels (first-ever-day purchases) surface as NULLs
    rather than being dropped."""
    from event_stream_aggr_spark.plans.registry import load_all

    rows = load_all()["qf02_point_in_time_features"].fn(spark, sf_dir).collect()
    assert rows
    matched = [r for r in rows if r.feat_day is not None]
    assert matched
    for r in matched:
        assert r.feat_day < r.label_day, f"leaked same/future day: {r}"


def test_snapshot_diff_classifies_handbuilt_versions(spark):
    from event_stream_aggr_spark.operators.versioning import snapshot_diff

    a = spark.createDataFrame(
        [(1, "same"), (2, "old"), (3, "gone")], "doc_id long, text string"
    )
    b = spark.createDataFrame(
        [(1, "same"), (2, "new"), (9, "fresh")], "doc_id long, text string"
    )
    got = {
        r.change_type: (r.n_docs, r.id_checksum)
        for r in snapshot_diff(a, b, "doc_id", F.col("text")).collect()
    }
    assert got == {
        "unchanged": (1, 1),
        "changed": (1, 2),
        "removed": (1, 3),
        "added": (1, 9),
    }


def test_qd17_weights_conserve_unit_mass_per_cluster(spark, sf_dir):
    # soft dedup's contract: every duplicate cluster contributes ONE
    # document's worth of weight in total (and singletons weigh 1)
    from pyspark.sql import functions as F

    from event_stream_aggr_spark.plans.registry import load_all

    df = load_all()["qd19_soft_dedup_weights"].fn(spark, sf_dir)
    per_size = (
        df.groupBy("cluster_size")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("weight").alias("w"))
        .collect()
    )
    assert any(r.cluster_size > 1 for r in per_size)  # clusters exist
    for r in per_size:
        # n_docs/cluster_size clusters of this size, each totaling ~1
        expected = r.n_docs / r.cluster_size
        assert abs(float(r.w) - expected) < 1e-3


def test_qv03_purge_never_leaks(spark, sf_dir):
    from pyspark.sql import functions as F

    from event_stream_aggr_spark.plans.registry import load_all

    rows = load_all()["qv03_tombstone_purge"].fn(spark, sf_dir).collect()
    assert sum(r.n_purged for r in rows) > 0
    assert all(r.n_leaked == 0 for r in rows)
