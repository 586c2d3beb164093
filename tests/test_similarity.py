"""Similarity search: exact cosine correctness + ANN recall vs exact."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from event_stream_aggr_spark.operators.similarity import ann_lsh_topk, cosine, cosine_topk
from event_stream_aggr_spark.tables import load_table


def test_cosine_exact_values(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0, 0.0], [0.0, 1.0, 0.0]), ([1.0, 2.0, 3.0], [1.0, 2.0, 3.0]),
         ([1.0, 1.0, 0.0], [1.0, 0.0, 0.0])],
        "a array<float>, b array<float>",
    )
    got = [r.c for r in df.select(cosine(F.col("a"), F.col("b")).alias("c")).collect()]
    assert got[0] == 0.0
    assert abs(got[1] - 1.0) < 1e-12
    assert abs(got[2] - 1 / math.sqrt(2)) < 1e-12


def test_topk_excludes_self_and_ranks(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe"))
    c = emb.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("ce"))
    rows = cosine_topk(q, c, k=4).collect()
    assert len(rows) == 12
    by_q = {}
    for r in rows:
        assert r.cid != r.qid
        by_q.setdefault(r.qid, []).append((r.rank, r.cos_sim))
    for ranked in by_q.values():
        ranked.sort()
        sims = [s for _, s in ranked]
        assert sims == sorted(sims, reverse=True)


def test_ann_recall_vs_exact(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe"))
    c = emb.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("ce"))
    exact = {(r.qid, r.cid) for r in cosine_topk(q, c, k=5).collect()}
    approx = {
        (r.qid, r.cid)
        for r in ann_lsh_topk(q, c, dim=64, k=5, planes=4, tables=6).collect()
    }
    recall = len(exact & approx) / len(exact)
    # OR-amplified LSH (6 tables x 4 planes): p=0.9-neighbors collide
    # in >=1 table w.p. ~1-(1-0.9^4)^6 ~ 0.9. Measured recall on the
    # deterministic sf0.001 fixture is 0.58 (hashes and data are both
    # content-derived, so the value is exactly reproducible); a drift
    # outside +-0.1 of that means the dataflow changed, not noise —
    # re-measure and update the band deliberately.
    assert 0.48 <= recall <= 0.68, f"LSH recall moved off measured 0.58: {recall}"


def test_embedding_near_dup_lsh_recalls_identical_vectors(spark):
    from event_stream_aggr_spark.operators.similarity import embedding_near_dup_lsh

    # identical vectors always share every bucket → guaranteed candidates
    base = [0.5, -0.25, 0.125, 1.0]
    rows = [
        (0, base),
        (1, base),                              # exact dup of 0
        (2, [x + 0.01 for x in base]),          # near dup of 0
        (3, [-x for x in base]),                # anti-parallel: cos = -1
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {(r.vec_a, r.vec_b): r.cos_sim
           for r in embedding_near_dup_lsh(emb, dim=4, threshold=0.9).collect()}
    assert out[(0, 1)] == 1.0
    assert (0, 2) in out and out[(0, 2)] > 0.99
    assert all(k != (0, 3) and k != (1, 3) for k in out)  # threshold excludes


def test_edit_distance_banding_keeps_identical_names(spark, sf_dir):
    # every exact-duplicate name pair within a brand must survive the
    # (brand, simhash band) banding: identical text → identical simhash
    from event_stream_aggr_spark.plans.registry import load_all

    q = load_all()["qd09_edit_distance_near_dup"]
    got = {(r.key_a, r.key_b) for r in q.fn(spark, sf_dir).collect()}
    from event_stream_aggr_spark.tables import load_table
    from pyspark.sql import functions as F

    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_name")
    a = p.select(F.col("p_partkey").alias("key_a"), "p_brand", F.col("p_name").alias("n"))
    b = p.select(F.col("p_partkey").alias("key_b"), "p_brand", F.col("p_name").alias("n"))
    exact = {
        (r.key_a, r.key_b)
        for r in a.join(b, ["p_brand", "n"]).filter(F.col("key_a") < F.col("key_b")).collect()
    }
    assert exact <= got


def test_ivf_recall_vs_exact(spark, sf_dir):
    from event_stream_aggr_spark.plans.registry import load_all

    specs = load_all()
    exact = {(r.qid, r.cid) for r in specs["qe01_cosine_topk"].fn(spark, sf_dir).collect()}
    ivf = {(r.qid, r.cid) for r in specs["qe04_ivf_topk"].fn(spark, sf_dir).collect()}
    recall = len(exact & ivf) / len(exact)
    # nprobe=2 of 10 cells probes ~20% of the corpus; the synthetic
    # embeddings are only loosely label-clustered at sf0.001. Measured
    # recall on the deterministic fixture is 0.40 (exactly
    # reproducible); outside +-0.1 of that means the dataflow changed —
    # re-measure and update the band deliberately.
    assert 0.3 <= recall <= 0.5, f"IVF recall moved off measured 0.40: {recall}"
    assert len(ivf) == 40  # 8 queries x top-5


def test_pq_adc_recall_vs_exact_l2(spark, sf_dir):
    # PQ approximates L2 distance, so its recall baseline is the exact
    # squared-L2 top-5 (not qe01's cosine ranking)
    from event_stream_aggr_spark.plans.registry import load_all

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe"))
    c = emb.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("ce"))
    sq = F.aggregate(
        F.zip_with("qe", "ce", lambda x, y: (x.cast("double") - y.cast("double"))
                   * (x.cast("double") - y.cast("double"))),
        F.lit(0.0), lambda acc, x: acc + x)
    from pyspark.sql import Window as W
    pairs = (q.crossJoin(c).filter(F.col("qid") != F.col("cid"))
             .select("qid", "cid", sq.alias("d")))
    w = W.partitionBy("qid").orderBy("d", "cid")
    exact = {(r.qid, r.cid)
             for r in pairs.select("*", F.row_number().over(w).alias("rn"))
             .filter(F.col("rn") <= 5).collect()}
    pq = {(r.qid, r.cid)
          for r in load_all()["qe06_pq_topk"].fn(spark, sf_dir).collect()}
    assert len(pq) == 40  # 8 queries x top-5
    recall = len(exact & pq) / len(exact)
    # 16 subspaces x label-derived codewords is a coarse quantizer on
    # loosely-clustered synthetic data. Measured recall on the
    # deterministic fixture is 0.35 (exactly reproducible; random
    # top-5 of ~500 would land ~0.01); outside +-0.1 of that means the
    # dataflow changed — re-measure and update the band deliberately.
    assert 0.25 <= recall <= 0.45, f"PQ recall moved off measured 0.35: {recall}"


def test_rerank_recall_vs_exact(spark):
    """qe07's int8 shortlist must not lose true top-5 neighbors: with a
    4x-k shortlist the exact rerank should recover (nearly) all of the
    exact brute-force top-5. Measured on the deterministic sf0.01
    fixture: recall 1.0 — the int8 grid is fine enough that the true
    top-5 always survive a 20-deep shortlist there. A drop below 0.9
    means the quantizer or the shortlist ordering broke, not noise."""
    from tests.conftest import SF_DIR_CORRECTNESS

    from event_stream_aggr_spark.operators.similarity import qe07_rerank_topk

    emb = load_table(spark, SF_DIR_CORRECTNESS, "embeddings")
    q = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe"))
    c = emb.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("ce"))
    exact = {(r.qid, r.cid) for r in cosine_topk(q, c, k=5).collect()}
    approx = {(r.qid, r.cid) for r in qe07_rerank_topk(spark, SF_DIR_CORRECTNESS).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"rerank recall collapsed: {recall}"


def test_kmeans_assignment_complete_and_label_dominant(spark, sf_dir):
    """qe08: every vector lands in exactly one cluster; label-mean init
    keeps each cluster dominated by its seed label through both Lloyd
    rounds on the deterministic fixture (top_label == cluster for all
    10); purity is measured at 0.268-0.352 (~3x the 0.1 chance floor —
    the synthetic embeddings are weakly label-structured). A drift
    outside the band means the iterative dataflow changed, not noise."""
    from event_stream_aggr_spark.plans.registry import load_all

    rows = load_all()["qe08_kmeans_clusters"].fn(spark, sf_dir).collect()
    assert len(rows) == 10
    assert sum(r.n_vecs for r in rows) == 500
    for r in rows:
        assert r.top_label == r.cluster
        assert 0.2 <= r.top_share <= 0.45, f"purity off band: {r}"
        assert r.avg_dist > 0


def test_cluster_balanced_sample_is_flat_and_disjoint(spark, sf_dir):
    """qs08: exactly BALANCED_PER_CLUSTER draws per cluster (every
    fixture cluster has >= 20 members) and no vector drawn twice."""
    from event_stream_aggr_spark.operators.sampling import BALANCED_PER_CLUSTER
    from event_stream_aggr_spark.plans.registry import load_all

    rows = load_all()["qs08_cluster_balanced_sample"].fn(spark, sf_dir).collect()
    per = {}
    for r in rows:
        per[r.cluster] = per.get(r.cluster, 0) + 1
    assert set(per.values()) == {BALANCED_PER_CLUSTER}
    assert len({r.vec_id for r in rows}) == len(rows)


def test_kmeans_assign_shared_memoizes_and_matches_direct(spark, sf_dir):
    """The shared assignment stage returns ONE materialized DataFrame
    per (session, corpus plan) and is value-identical to the direct
    iterative computation it caches."""
    from event_stream_aggr_spark.operators.similarity import (
        kmeans_assign,
        kmeans_assign_shared,
    )
    from event_stream_aggr_spark.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    a = kmeans_assign_shared(emb)
    b = kmeans_assign_shared(load_table(spark, sf_dir, "embeddings"))
    assert a is b  # memo hit across separately-loaded plans of one corpus
    direct = {r.vec_id: (r.code, r.d_us) for r in kmeans_assign(emb).collect()}
    shared = {r.vec_id: (r.code, r.d_us) for r in a.collect()}
    assert shared == direct


def test_cluster_separation_report_consistency(spark, sf_dir):
    from event_stream_aggr_spark.plans.registry import load_all

    rows = load_all()["qe09_cluster_separation"].fn(spark, sf_dir).collect()
    assert rows
    clusters = {r.cluster for r in rows}
    for r in rows:
        assert r.n_vecs > 0 and r.avg_within >= 0
        assert r.nearest_cluster in clusters and r.nearest_cluster != r.cluster
        assert r.nearest_dist > 0
        if r.avg_within > 0:
            assert abs(r.separation - r.nearest_dist / r.avg_within) < 1e-3


def test_sparse_cosine_topk_contract(spark, sf_dir):
    from event_stream_aggr_spark.operators.similarity import SPARSE_TOP_K
    from event_stream_aggr_spark.plans.registry import load_all

    rows = load_all()["qe10_sparse_cosine_topk"].fn(spark, sf_dir).collect()
    assert rows
    by_doc = {}
    for r in rows:
        assert 0 <= r.cos_sim <= 1.0 + 1e-9
        assert r.neighbor_id != r.doc_id
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc, rs in by_doc.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= SPARSE_TOP_K
        sims = [r.cos_sim for r in rs]
        assert sims == sorted(sims, reverse=True)
    # symmetry of the mirrored pair relation at rank grain: if b is a's
    # neighbor, the (b, a) edge exists with the same similarity
    sim = {(r.doc_id, r.neighbor_id): r.cos_sim for r in rows}
    mutual = [k for k in sim if (k[1], k[0]) in sim]
    for a, b in mutual:
        assert sim[(a, b)] == sim[(b, a)]


def test_mips_norm_augmentation_preserves_order(spark, sf_dir):
    # the Shrivastava-Li reduction behind qe12's scale path: augment
    # items with sqrt(M^2 - |x|^2) (queries with 0) and cosine order
    # over augmented vectors must equal inner-product order over the
    # originals — so cosine-ANN infra (qe03/qe04) serves MIPS unchanged
    import math

    from pyspark.sql import functions as F

    from event_stream_aggr_spark.tables import load_table

    rows = (
        load_table(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") < 40)
        .select("vec_id", "embedding")
        .collect()
    )
    vecs = {r.vec_id: [float(x) for x in r.embedding] for r in rows}
    m2 = max(sum(x * x for x in v) for v in vecs.values())
    q = vecs[0]
    ip_order = sorted(
        (cid for cid in vecs if cid != 0),
        key=lambda cid: (-sum(a * b for a, b in zip(q, vecs[cid])), cid),
    )
    qa = q + [0.0]
    qn = math.sqrt(sum(x * x for x in qa))

    def cos_aug(cid):
        v = vecs[cid]
        aug = v + [math.sqrt(max(m2 - sum(x * x for x in v), 0.0))]
        # |aug| == M for every item, so cosine ranks by raw dot with q
        return sum(a * b for a, b in zip(qa, aug)) / (qn * math.sqrt(m2))

    cos_order = sorted(
        (cid for cid in vecs if cid != 0), key=lambda cid: (-cos_aug(cid), cid)
    )
    assert cos_order == ip_order
