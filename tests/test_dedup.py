"""Dedup operators: MinHash estimates Jaccard; LSH candidates recall
true near-dups; SimHash clusters near-identical docs."""

from __future__ import annotations

from pyspark.sql import functions as F

from event_stream_aggr_spark.operators.dedup import (
    MINHASH_K,
    distinct_tokens,
    minhash_lsh_pairs,
    minhash_signatures,
    simhash_signatures,
)


def _docs(spark):
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    rows = [
        (0, base),
        (1, base + " extra"),                      # near-dup of 0
        (2, base.replace("fox", "cat")),           # near-dup of 0
        (3, "completely different words about spark catalyst tungsten shuffle"),
        (4, "another unrelated text mentioning parquet arrow pandas numpy"),
        (5, base),                                 # exact dup of 0
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _exact_jaccard(spark, docs):
    t = docs.select("doc_id", distinct_tokens(F.col("text")).alias("toks"))
    a = t.select(F.col("doc_id").alias("doc_a"), F.col("toks").alias("ta"))
    b = t.select(F.col("doc_id").alias("doc_b"), F.col("toks").alias("tb"))
    inter = F.size(F.array_intersect("ta", "tb"))
    union = F.size("ta") + F.size("tb") - inter
    return (
        a.crossJoin(b)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", (inter.cast("double") / union).alias("j"))
    )


def test_minhash_estimates_jaccard(spark):
    docs = _docs(spark)
    sigs = {r.doc_id: [r[f"sig_{i}"] for i in range(MINHASH_K)]
            for r in minhash_signatures(docs).collect()}
    jacc = {(r.doc_a, r.doc_b): r.j for r in _exact_jaccard(spark, docs).collect()}
    # exact dup → identical signature
    assert sigs[0] == sigs[5]
    # near-dup signature agreement beats unrelated-pair agreement
    agree = lambda a, b: sum(x == y for x, y in zip(sigs[a], sigs[b])) / MINHASH_K
    assert agree(0, 1) > agree(0, 3)
    assert jacc[(0, 1)] > 0.8 and jacc[(0, 3)] < 0.2


def test_lsh_pairs_find_near_dups_without_cross_join(spark):
    docs = _docs(spark)
    pairs = {(r.doc_a, r.doc_b): r.jaccard
             for r in minhash_lsh_pairs(docs, bands=4, threshold=0.5).collect()}
    assert (0, 5) in pairs and pairs[(0, 5)] == 1.0
    assert (0, 1) in pairs
    # verified Jaccard filter keeps unrelated docs out even if bucketed
    assert (0, 3) not in pairs and (3, 4) not in pairs


def test_simhash_distance_orders_similarity(spark):
    docs = _docs(spark)
    sig = {r.doc_id: r.simhash for r in simhash_signatures(docs).collect()}
    ham = lambda a, b: bin(sig[a] ^ sig[b]).count("1")
    assert ham(0, 5) == 0                 # exact dup
    assert ham(0, 1) < ham(0, 3)          # near-dup closer than unrelated


def test_qd09_word_blocking_recall_vs_exact_baseline(spark):
    """qd09's (brand, word) blocking must not silently drop true
    near-dup pairs: recall vs the exact (unblocked-within-brand)
    Levenshtein baseline at sf0.001, restricted to edit distance 1-3
    (distance 0 trivially collides on every word). The earlier SimHash
    banding measured 0.45 here — this is the regression gate."""
    from pyspark.sql import functions as F

    from event_stream_aggr_spark.operators.dedup import qd09_edit_distance_near_dup
    from event_stream_aggr_spark.tables import load_table

    sf_dir = "/root/testdata/sf0.001"
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_name")
    a = p.select(
        F.col("p_partkey").alias("key_a"), "p_brand", F.col("p_name").alias("name_a")
    )
    b = p.select(
        F.col("p_partkey").alias("key_b"), "p_brand", F.col("p_name").alias("name_b")
    )
    exact = (
        a.join(b, "p_brand")
        .filter(F.col("key_a") < F.col("key_b"))
        .withColumn("d", F.levenshtein("name_a", "name_b"))
        .filter(F.col("d").between(1, 3))
        .select("key_a", "key_b")
        .collect()
    )
    truth = {(r.key_a, r.key_b) for r in exact}
    assert truth, "baseline should find near-dup part names at sf0.001"
    got = {
        (r.key_a, r.key_b)
        for r in qd09_edit_distance_near_dup(spark, sf_dir).filter("edit_dist >= 1").collect()
    }
    recall = len(truth & got) / len(truth)
    assert recall >= 0.99, f"recall {recall:.3f} < 0.99 ({len(truth - got)} pairs missed)"
    # and the blocking is genuinely sub-quadratic: candidates strictly
    # fewer than the full within-brand pair space it replaces
    full_pairs = (
        p.groupBy("p_brand").count().select(F.sum(F.expr("count * (count - 1) / 2"))).first()[0]
    )
    assert len(got) < full_pairs


def test_boilerplate_spans_drop_all_occurrences(spark, tmp_path):
    """qd14 must remove EVERY occurrence of a >=3-doc span (including
    the first), unlike qd12's keep-canonical rule, and leave unique
    spans untouched."""
    import event_stream_aggr_spark.operators.dedup as dd

    boiler = " ".join(f"b{i}" for i in range(dd.SPAN_TOKENS))
    uniq = lambda d: " ".join(f"u{d}_{i}" for i in range(dd.SPAN_TOKENS))
    rows = [
        (0, boiler + " " + uniq(0)),
        (1, boiler + " " + uniq(1)),
        (2, boiler + " " + uniq(2)),
        (3, uniq(3)),
    ]
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))
    out = {r.doc_id: r for r in dd.qd14_boilerplate_spans(spark, str(tmp_path)).collect()}
    for d in (0, 1, 2):
        assert out[d].n_boilerplate == 1 and out[d].clean_text == uniq(d)
    assert out[3].n_boilerplate == 0 and out[3].clean_text == uniq(3)


def test_fuzzy_decontamination_pairs_are_train_x_eval_only(spark):
    """qd15 at sf0.01: every reported pair is (train, eval) across the
    doc_id % 50 split, with verified Jaccard above the floor."""
    from tests.conftest import SF_DIR_CORRECTNESS

    import event_stream_aggr_spark.operators.dedup as dd

    rows = dd.qd15_fuzzy_decontamination(spark, SF_DIR_CORRECTNESS).collect()
    assert rows, "fixture should produce at least one contaminated pair"
    for r in rows:
        assert r.train_id % dd.DECONTAM_EVAL_MOD != 0
        assert r.eval_id % dd.DECONTAM_EVAL_MOD == 0
        assert r.jaccard >= dd.FUZZY_DECONTAM_THRESHOLD


def test_semantic_dedup_keeps_one_exemplar_per_group(spark, sf_dir):
    """qd16: some drops occur at the fixture threshold; every dropped
    vector has a qualifying LOWER-id same-cluster partner (the
    dominance rule), so the minimum id of each duplicate group is
    always kept — one exemplar survives per group."""
    from pyspark.sql import functions as F

    from event_stream_aggr_spark.operators.dedup import SEMDEDUP_TAU
    from event_stream_aggr_spark.operators.similarity import cosine, kmeans_assign
    from event_stream_aggr_spark.plans.registry import load_all
    from event_stream_aggr_spark.tables import load_table

    rows = load_all()["qd16_semantic_dedup"].fn(spark, sf_dir).collect()
    assert len(rows) == 500
    dropped = {r.vec_id for r in rows if not r.kept}
    kept = {r.vec_id for r in rows if r.kept}
    assert dropped and kept

    emb = load_table(spark, sf_dir, "embeddings")
    assign = kmeans_assign(emb).select("vec_id", "code")
    ev = assign.join(emb.select("vec_id", "embedding"), "vec_id")
    a = ev.select("code", F.col("vec_id").alias("va"), F.col("embedding").alias("ea"))
    b = ev.select("code", F.col("vec_id").alias("vb"), F.col("embedding").alias("eb"))
    qual = (
        a.join(b, "code")
        .filter(F.col("va") < F.col("vb"))
        .filter(F.round(cosine(F.col("ea"), F.col("eb")), 6) >= SEMDEDUP_TAU)
        .select("va", "vb")
        .collect()
    )
    partners = {}
    for r in qual:
        partners.setdefault(r.vb, set()).add(r.va)
    assert set(partners) == dropped  # drops are exactly the dominated ids
    for vb, vas in partners.items():
        assert min(vas) < vb


def test_prefix_filter_equals_all_pairs_ground_truth(spark, sf_dir):
    """prefix_filtered_pairs is EXACT: at sf0.001 its output must be
    pair-for-pair identical to the brute-force within-block all-pairs
    join it replaced (the AllPairs/PPJoin losslessness claim, executed
    rather than cited). Run at both registered thresholds (3/5 token
    Jaccard, 9/50 shingle Jaccard)."""
    from pyspark.sql import functions as F

    from event_stream_aggr_spark.operators.dedup import (
        distinct_tokens,
        prefix_filtered_pairs,
    )
    from event_stream_aggr_spark.tables import load_table

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.floor(F.col("n_chars") / 16).cast("long").alias("bucket"),
        distinct_tokens(F.col("text")).alias("toks"),
    )

    def all_pairs(t_num, t_den):
        a = d.select(
            F.col("doc_id").alias("doc_a"), "lang", "bucket",
            F.col("toks").alias("ta"),
        )
        b = d.select(
            F.col("doc_id").alias("doc_b"), "lang", "bucket",
            F.col("toks").alias("tb"),
        )
        inter = F.size(F.array_intersect("ta", "tb"))
        union = F.size("ta") + F.size("tb") - inter
        return (
            a.join(b, ["lang", "bucket"])
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b", (inter.cast("double") / union).alias("j"))
            .filter(F.col("j") >= t_num / t_den)
        )

    for t_num, t_den in ((3, 5), (9, 50)):
        got = {
            (r.doc_a, r.doc_b, round(r.jaccard, 9))
            for r in prefix_filtered_pairs(
                d, "toks", t_num, t_den, ["lang", "bucket"]
            ).collect()
        }
        want = {
            (r.doc_a, r.doc_b, round(r.j, 9))
            for r in all_pairs(t_num, t_den).collect()
        }
        assert got == want and len(want) > 0, (t_num, t_den)
