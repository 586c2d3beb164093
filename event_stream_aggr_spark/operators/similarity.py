"""Embedding similarity search (SURVEY.md §2.10 L3).

- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  All vector math is higher-order array functions (zip_with/aggregate)
  on DOUBLE: pure JVM, codegen'd, sequential fold → deterministic.
- ``ann_lsh_topk``: the scale path — random-hyperplane LSH bucketing so
  each query only scores candidates sharing a hash bucket. At 100 TB
  the corpus side is bucketed ONCE (shuffle by bucket) and queries
  broadcast; cost drops from |Q|x|C| to |Q|x|C|/2^planes per probe.

Hyperplanes are derived deterministically from md5, not an RNG, so
results are stable across runs/engines (needed for tests; a production
pipeline would accept seeded randomness here).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from event_stream_aggr_spark.plans.registry import register
from event_stream_aggr_spark.tables import load_table


def dot(a: Column, b: Column) -> Column:
    """Exact double-precision dot product of two float arrays
    (sequential left fold → deterministic accumulation order)."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    q_id: str = "qid",
    c_id: str = "cid",
    q_vec: str = "qe",
    c_vec: str = "ce",
    round_digits: int = 6,
) -> DataFrame:
    """Exact brute-force top-k cosine neighbors per query.

    Norms are hoisted to the row level (one fold per row) instead of
    being recomputed inside every pair (which would triple the
    per-pair work — the dominant cost of a |Q|x|C| scoring pass).
    The query side is broadcast (queries << corpus); ranking happens on
    cosine rounded to ``round_digits`` with the candidate id as
    tiebreak, so ordering is deterministic to the last bit.
    """
    qn = queries.withColumn("_qnorm", norm(F.col(q_vec)))
    cn = corpus.withColumn("_cnorm", norm(F.col(c_vec)))
    pairs = cn.crossJoin(F.broadcast(qn)).filter(F.col(c_id) != F.col(q_id))
    scored = pairs.select(
        q_id,
        c_id,
        F.round(
            dot(F.col(q_vec), F.col(c_vec)) / (F.col("_qnorm") * F.col("_cnorm")),
            round_digits,
        ).alias("cos_sim"),
    )
    w = W.partitionBy(q_id).orderBy(F.col("cos_sim").desc(), F.col(c_id))
    return (
        scored.select("*", F.row_number().over(w).cast("long").alias("rank"))
        .filter(F.col("rank") <= k)
    )


def _hyperplane(dim: int, plane: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane from md5 bytes."""
    import hashlib

    vals = []
    for d in range(dim):
        h = hashlib.md5(f"plane:{plane}:dim:{d}".encode()).hexdigest()
        vals.append(int(h[:8], 16) / float(0xFFFFFFFF) - 0.5)
    return vals


def bucket_structs(vec: str, dim: int, planes: int, tables: int) -> Column:
    """Per-row LSH bucket array: ``tables`` structs of (table id,
    ``planes``-bit sign-of-projection bucket). Pure fold/zip_with
    arithmetic — codegen'd, deterministic."""
    tbls = []
    for t in range(tables):
        bits = []
        for p in range(planes):
            plane = _hyperplane(dim, t * planes + p)
            proj = F.aggregate(
                F.zip_with(
                    F.col(vec),
                    F.array(*[F.lit(v) for v in plane]),
                    lambda x, w_: x.cast("double") * w_,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            bits.append(F.when(proj > 0, F.lit(2**p)).otherwise(F.lit(0)))
        bucket = bits[0]
        for b in bits[1:]:
            bucket = bucket + b
        tbls.append(F.struct(F.lit(t).alias("t"), bucket.cast("long").alias("b")))
    return F.array(*tbls)


def embedding_near_dup_lsh(
    emb: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.35,
    planes: int = 4,
    tables: int = 4,
) -> DataFrame:
    """Embedding near-dup pairs routed through LSH candidates — the
    100 TB dataflow: hash every vector into ``tables`` buckets (narrow
    map), self-equi-join on (table, bucket), dedupe pairs, exact cosine
    only on candidates. Never an all-pairs cross join."""
    b = emb.select(
        F.col(id_col),
        F.col(vec_col),
        F.explode(bucket_structs(vec_col, dim, planes, tables)).alias("tb"),
    )
    cand = (
        b.alias("a")
        .join(b.alias("b"), on="tb")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("vec_a"), F.col(f"b.{id_col}").alias("vec_b")
        )
        .distinct()
    )
    n = emb.select(F.col(id_col), F.col(vec_col), norm(F.col(vec_col)).alias("_n"))
    a_side = n.select(
        F.col(id_col).alias("vec_a"), F.col(vec_col).alias("_ea"), F.col("_n").alias("_na")
    )
    b_side = n.select(
        F.col(id_col).alias("vec_b"), F.col(vec_col).alias("_eb"), F.col("_n").alias("_nb")
    )
    return (
        cand.join(a_side, "vec_a")
        .join(b_side, "vec_b")
        .select(
            "vec_a",
            "vec_b",
            F.round(
                dot(F.col("_ea"), F.col("_eb")) / (F.col("_na") * F.col("_nb")), 6
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def ann_lsh_topk_self(
    emb: DataFrame,
    query_pred: Column,
    dim: int,
    k: int = 5,
    planes: int = 4,
    tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """``ann_lsh_topk`` for the common self-search shape (queries are a
    predicate over the corpus): the corpus is bucketed ONCE and the
    query side is a filter of the bucketed frame, halving both the
    bucketing work and the codegen'd expression size. Result is
    identical to ``ann_lsh_topk(corpus.filter(pred), corpus, ...)``."""
    b = emb.select(
        F.col(id_col),
        F.explode(bucket_structs(vec_col, dim, planes, tables)).alias("tb"),
    )
    qb = b.filter(query_pred).select(F.col(id_col).alias("qid"), "tb")
    cand = (
        b.join(F.broadcast(qb), "tb")
        .filter(F.col(id_col) != F.col("qid"))
        .select("qid", F.col(id_col).alias("cid"))
        .distinct()
    )
    n = emb.select(F.col(id_col), F.col(vec_col), norm(F.col(vec_col)).alias("_n"))
    qn = n.filter(query_pred).select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("_qe"), F.col("_n").alias("_qnorm")
    )
    cn = n.select(
        F.col(id_col).alias("cid"), F.col(vec_col).alias("_ce"), F.col("_n").alias("_cnorm")
    )
    scored = (
        cand.join(F.broadcast(qn), "qid")
        .join(cn, "cid")
        .select(
            "qid",
            "cid",
            F.round(
                dot(F.col("_qe"), F.col("_ce")) / (F.col("_qnorm") * F.col("_cnorm")), 6
            ).alias("cos_sim"),
        )
    )
    w = W.partitionBy("qid").orderBy(F.col("cos_sim").desc(), F.col("cid"))
    return (
        scored.select("*", F.row_number().over(w).cast("long").alias("rank"))
        .filter(F.col("rank") <= k)
    )


def ann_lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    k: int = 5,
    planes: int = 4,
    tables: int = 4,
    q_id: str = "qid",
    c_id: str = "cid",
    q_vec: str = "qe",
    c_vec: str = "ce",
) -> DataFrame:
    """Approximate top-k: sign-of-projection LSH with OR-amplification
    (``tables`` independent hash tables of ``planes`` bits each), then
    exact cosine rerank on the candidate union.

    A pair is a candidate if it collides in ANY table — recall grows as
    1-(1-p^planes)^tables while each table still prunes to |C|/2^planes
    per bucket. The corpus is hashed once (narrow map: explode to
    ``tables`` rows), the join is equi on (table, bucket) — a
    shuffle-hash/broadcast join, never a nested loop. Candidates are
    deduped on (q, c) before the (expensive) exact rerank.
    """
    qb = queries.select(
        q_id, q_vec, F.explode(bucket_structs(q_vec, dim, planes, tables)).alias("tb")
    )
    cb = corpus.select(
        c_id, c_vec, F.explode(bucket_structs(c_vec, dim, planes, tables)).alias("tb")
    )
    cand = (
        cb.join(F.broadcast(qb.select(q_id, "tb")), "tb")
        .filter(F.col(c_id) != F.col(q_id))
        .select(q_id, c_id)
        .distinct()
    )
    qn = queries.withColumn("_qnorm", norm(F.col(q_vec)))
    cn = corpus.withColumn("_cnorm", norm(F.col(c_vec)))
    pairs = cand.join(F.broadcast(qn), q_id).join(cn, c_id)
    scored = pairs.select(
        q_id,
        c_id,
        F.round(
            dot(F.col(q_vec), F.col(c_vec)) / (F.col("_qnorm") * F.col("_cnorm")), 6
        ).alias("cos_sim"),
    )
    w = W.partitionBy(q_id).orderBy(F.col("cos_sim").desc(), F.col(c_id))
    return (
        scored.select("*", F.row_number().over(w).cast("long").alias("rank"))
        .filter(F.col("rank") <= k)
    )


# ---------------------------------------------------------------------------
# Registered oracle-checked queries
# ---------------------------------------------------------------------------


@register(
    "qe01_cosine_topk",
    bench=True,
    tags=("similarity",),
    oracle="""
WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 8),
c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings),
pairs AS (
  SELECT qid, cid,
         (SELECT SUM(a * b) FROM (SELECT unnest(qe)::DOUBLE AS a,
                                         unnest(ce)::DOUBLE AS b)) AS dp,
         (SELECT SUM(a * a) FROM (SELECT unnest(qe)::DOUBLE AS a)) AS nq,
         (SELECT SUM(b * b) FROM (SELECT unnest(ce)::DOUBLE AS b)) AS nc
  FROM c, q WHERE cid <> qid),
scored AS (
  SELECT qid, cid, ROUND(dp / (SQRT(nq) * SQRT(nc)), 6) AS cos_sim FROM pairs),
ranked AS (
  SELECT qid, cid, cos_sim,
         CAST(ROW_NUMBER() OVER (PARTITION BY qid
              ORDER BY cos_sim DESC, cid) AS BIGINT) AS rank
  FROM scored)
SELECT qid, cid, cos_sim, rank FROM ranked WHERE rank <= 5
""",
)
def qe01_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 neighbors for 8 query vectors (L3 baseline)."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    c = emb.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("ce"))
    return cosine_topk(q, c, k=5)


@register(
    "qe02_label_centroid_norms",
    tags=("similarity",),
    oracle="""
WITH dims AS (
  SELECT label, u.pos, u.x::DOUBLE AS x
  FROM embeddings,
       LATERAL (SELECT unnest(embedding) AS x,
                       generate_subscripts(embedding, 1) AS pos) u),
centroid AS (
  SELECT label, pos, ROUND(AVG(x), 6) AS cx FROM dims GROUP BY label, pos)
SELECT CAST(label AS BIGINT) AS label,
       ROUND(SQRT(SUM(cx * cx)), 4) AS centroid_norm
FROM centroid GROUP BY label
""",
)
def qe02_label_centroid_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid norm: posexplode → per-dimension mean →
    vector norm. The explode shuffles (label, pos) partial means, so
    at scale the shuffle is |labels| x dim, not |vectors| x dim."""
    emb = load_table(spark, sf_dir, "embeddings")
    dims = emb.select(
        F.col("label").cast("long").alias("label"),
        F.posexplode("embedding").alias("pos", "x"),
    ).select("label", "pos", F.col("x").cast("double").alias("x"))
    centroid = dims.groupBy("label", "pos").agg(F.round(F.avg("x"), 6).alias("cx"))
    return centroid.groupBy("label").agg(
        F.round(F.sqrt(F.sum(F.col("cx") * F.col("cx"))), 4).alias("centroid_norm")
    )


def lsh_bucket_ctes(dim: int = 64, planes: int = 4, tables: int = 4) -> str:
    """The shared SQL CTE chain recomputing ``bucket_structs`` in
    DuckDB: hyperplane literals (``repr(float)`` round-trips to the
    identical double) → per-(vector, table, plane) projection →
    per-(vector, table) bucket.

    Sign-of-projection is the only unrounded float comparison; the
    projections are O(0.1-1) magnitudes, far from the ~1e-16
    accumulation-order noise, so the bucket bits agree across engines.
    """
    rows = []
    for t in range(tables):
        for p in range(planes):
            w = _hyperplane(dim, t * planes + p)
            rows.extend(f"({t}, {p}, {d}, {w[d]!r})" for d in range(dim))
    plane_values = ",\n  ".join(rows)
    return f"""planes(t, p, d, w) AS (VALUES
  {plane_values}),
vd AS (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS d,
         unnest(embedding)::DOUBLE AS x
  FROM embeddings),
proj AS (
  SELECT vd.vec_id, planes.t, planes.p, SUM(vd.x * planes.w) AS s
  FROM vd JOIN planes ON vd.d = planes.d
  GROUP BY vd.vec_id, planes.t, planes.p),
buck AS (
  SELECT vec_id, t,
         CAST(SUM(CASE WHEN s > 0 THEN CAST(POW(2, p) AS BIGINT) ELSE 0 END)
              AS BIGINT) AS b
  FROM proj GROUP BY vec_id, t)"""


def _ann_oracle(dim: int = 64, k: int = 5, planes: int = 4, tables: int = 4) -> str:
    """SQL mirror of ``ann_lsh_topk``: shared bucket CTEs, candidates
    joined on (table, bucket), exact rerank on candidates as in qe01."""
    return f"""
WITH {lsh_bucket_ctes(dim, planes, tables)},
cand AS (
  SELECT DISTINCT q.vec_id AS qid, c.vec_id AS cid
  FROM buck q JOIN buck c ON q.t = c.t AND q.b = c.b
  WHERE q.vec_id < 8 AND c.vec_id <> q.vec_id),
pairs AS (
  SELECT cand.qid, cand.cid,
         (SELECT SUM(a * b) FROM (SELECT unnest(eq.embedding)::DOUBLE AS a,
                                         unnest(ec.embedding)::DOUBLE AS b)) AS dp,
         (SELECT SUM(a * a) FROM (SELECT unnest(eq.embedding)::DOUBLE AS a)) AS nq,
         (SELECT SUM(b * b) FROM (SELECT unnest(ec.embedding)::DOUBLE AS b)) AS nc
  FROM cand
  JOIN embeddings eq ON cand.qid = eq.vec_id
  JOIN embeddings ec ON cand.cid = ec.vec_id),
ranked AS (
  SELECT qid, cid, ROUND(dp / (SQRT(nq) * SQRT(nc)), 6) AS cos_sim,
         CAST(ROW_NUMBER() OVER (PARTITION BY qid
              ORDER BY ROUND(dp / (SQRT(nq) * SQRT(nc)), 6) DESC, cid) AS BIGINT)
           AS rank
  FROM pairs)
SELECT qid, cid, cos_sim, rank FROM ranked WHERE rank <= {k}
"""


@register("qe03_ann_lsh_topk", bench=True, tags=("similarity", "approx"), oracle=_ann_oracle())
def qe03_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via random-hyperplane LSH (L3 scale path). The hyperplanes
    are deterministic md5 arithmetic, so the oracle replays the exact
    bucketing + candidate join + rerank in SQL — hash-checked.
    tests/test_similarity.py additionally measures recall vs the exact
    baseline. Uses the self-search form (queries ⊂ corpus): the corpus
    is bucketed once and reused for both sides."""
    emb = load_table(spark, sf_dir, "embeddings")
    return ann_lsh_topk_self(emb, F.col("vec_id") < 8, dim=64, k=5, planes=4, tables=4)


IVF_NPROBE = 2


def ivf_assignments(emb: DataFrame, nprobe: int = 1) -> DataFrame:
    """IVF coarse quantization: per-label centroids (the qe02
    computation) as the cell list, every vector assigned to its
    ``nprobe`` nearest cells by squared L2 distance.

    Scale shape: centroids are a |cells|-row broadcast; assignment is a
    narrow map over the corpus (|N| x |cells| distance folds, no
    shuffle of the vectors); only (vec_id, cell) pairs shuffle.
    Distances are sequential-fold doubles rounded to 6 with the cell id
    as tiebreak — the qe01/qe02-proven determinism recipe.
    """
    dims = emb.select(
        F.col("label").cast("long").alias("label"),
        F.posexplode("embedding").alias("pos", "x"),
    ).select("label", "pos", F.col("x").cast("double").alias("x"))
    centroid = dims.groupBy("label", "pos").agg(F.round(F.avg("x"), 6).alias("cx"))
    cent_arr = centroid.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "cx"))), lambda s: s.cx
        ).alias("cvec")
    )
    sq_dist = F.round(
        F.aggregate(
            F.zip_with(
                F.col("embedding"),
                F.col("cvec"),
                lambda x, c: (x.cast("double") - c) * (x.cast("double") - c),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        6,
    )
    scored = (
        emb.select("vec_id", "embedding")
        .crossJoin(F.broadcast(cent_arr))
        .select("vec_id", F.col("label").alias("cell"), sq_dist.alias("d"))
    )
    w = W.partitionBy("vec_id").orderBy("d", "cell")
    return (
        scored.select("*", F.row_number().over(w).alias("rnk"))
        .filter(F.col("rnk") <= nprobe)
        .select("vec_id", "cell", "rnk")
    )


def _ivf_oracle(k: int = 5, nprobe: int = IVF_NPROBE) -> str:
    return f"""
WITH vd AS (
  SELECT vec_id, label, u.pos, u.x::DOUBLE AS x
  FROM embeddings,
       LATERAL (SELECT unnest(embedding) AS x,
                       generate_subscripts(embedding, 1) AS pos) u),
centroid AS (
  SELECT label, pos, ROUND(AVG(x), 6) AS cx FROM vd GROUP BY label, pos),
dist AS (
  SELECT v.vec_id, c.label AS cell,
         ROUND(SUM((v.x - c.cx) * (v.x - c.cx)), 6) AS d
  FROM vd v JOIN centroid c ON v.pos = c.pos
  GROUP BY v.vec_id, c.label),
cells AS (
  SELECT vec_id, cell,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rnk
  FROM dist),
corpus_cell AS (SELECT vec_id AS cid, cell FROM cells WHERE rnk = 1),
query_cells AS (SELECT vec_id AS qid, cell FROM cells
                WHERE rnk <= {nprobe} AND vec_id < 8),
cand AS (
  SELECT DISTINCT q.qid, c.cid
  FROM query_cells q JOIN corpus_cell c USING (cell)
  WHERE c.cid <> q.qid),
pairs AS (
  SELECT cand.qid, cand.cid,
         (SELECT SUM(a * b) FROM (SELECT unnest(eq.embedding)::DOUBLE AS a,
                                         unnest(ec.embedding)::DOUBLE AS b)) AS dp,
         (SELECT SUM(a * a) FROM (SELECT unnest(eq.embedding)::DOUBLE AS a)) AS nq,
         (SELECT SUM(b * b) FROM (SELECT unnest(ec.embedding)::DOUBLE AS b)) AS nc
  FROM cand
  JOIN embeddings eq ON cand.qid = eq.vec_id
  JOIN embeddings ec ON cand.cid = ec.vec_id),
ranked AS (
  SELECT qid, cid, ROUND(dp / (SQRT(nq) * SQRT(nc)), 6) AS cos_sim,
         CAST(ROW_NUMBER() OVER (PARTITION BY qid
              ORDER BY ROUND(dp / (SQRT(nq) * SQRT(nc)), 6) DESC, cid) AS BIGINT)
           AS rank
  FROM pairs)
SELECT qid, cid, cos_sim, rank FROM ranked WHERE rank <= {k}
"""


@register("qe04_ivf_topk", tags=("similarity", "approx"), oracle=_ivf_oracle())
def qe04_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via IVF (L3's second scale path, complementing qe03's LSH):
    per-label centroids as the coarse quantizer, corpus vectors
    assigned to their nearest cell, queries probing the nprobe=2
    nearest cells, exact cosine rerank on cell-collided candidates
    only. The oracle replays centroids, assignment, probing, and rerank
    in SQL — exact-match."""
    emb = load_table(spark, sf_dir, "embeddings")
    # one assignment pass with the FULL-corpus centroids; corpus keeps
    # its nearest cell, queries keep the nprobe nearest
    cells = ivf_assignments(emb, nprobe=IVF_NPROBE)
    corpus_cell = cells.filter(F.col("rnk") == 1).select(
        F.col("vec_id").alias("cid"), "cell"
    )
    query_cells = cells.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("qid"), "cell"
    )
    cand = (
        query_cells.join(corpus_cell, "cell")
        .filter(F.col("cid") != F.col("qid"))
        .select("qid", "cid")
        .distinct()
    )
    n = emb.select("vec_id", "embedding", norm(F.col("embedding")).alias("_n"))
    qn = n.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("_qe"),
                  F.col("_n").alias("_qnorm"))
    cn = n.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("_ce"),
                  F.col("_n").alias("_cnorm"))
    scored = (
        cand.join(F.broadcast(qn), "qid")
        .join(cn, "cid")
        .select(
            "qid",
            "cid",
            F.round(
                dot(F.col("_qe"), F.col("_ce")) / (F.col("_qnorm") * F.col("_cnorm")), 6
            ).alias("cos_sim"),
        )
    )
    w = W.partitionBy("qid").orderBy(F.col("cos_sim").desc(), F.col("cid"))
    return (
        scored.select("*", F.row_number().over(w).cast("long").alias("rank"))
        .filter(F.col("rank") <= 5)
    )


# ---------------------------------------------------------------------------
# Embedding compression: per-dimension scalar quantization
# ---------------------------------------------------------------------------


@register(
    "qe05_scalar_quantization",
    bench=True,
    tags=("similarity",),
    oracle="""
WITH dims AS (
  SELECT vec_id, label, u.pos, u.x::DOUBLE AS x
  FROM embeddings,
       LATERAL (SELECT unnest(embedding) AS x,
                       generate_subscripts(embedding, 1) AS pos) u),
stats AS (
  SELECT pos, MIN(x) AS mn, MAX(x) AS mx FROM dims GROUP BY pos),
coded AS (
  SELECT label,
         CASE WHEN mx = mn THEN 0
              ELSE CAST(FLOOR(((x - mn) / (mx - mn)) * 255) AS BIGINT)
         END AS code,
         x, mn, mx
  FROM dims JOIN stats USING (pos)),
recon AS (
  SELECT label, code,
         CASE WHEN mx = mn THEN 0.0
              ELSE ABS(x - (mn + (code + 0.5) * ((mx - mn) / 256)))
         END AS err
  FROM coded)
SELECT CAST(label AS BIGINT) AS label,
       CAST(COUNT(*) AS BIGINT) AS n_values,
       CAST(MIN(code) AS BIGINT) AS min_code,
       CAST(MAX(code) AS BIGINT) AS max_code,
       ROUND(AVG(err), 6) AS mean_abs_err
FROM recon GROUP BY label ORDER BY label
""",
)
def qe05_scalar_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar quantization of the embedding corpus (L3 storage
    path): per-dimension min/max calibration -> 8-bit codes -> per-label
    reconstruction-error report. This is the 4x compression every
    100 TB vector store applies before ANN serving.

    Scale dataflow: calibration aggregates (pos, min, max) — output is
    dims-sized (64 rows), computed with partial aggregation, then
    BROADCAST back onto the dimension stream, so vectors are encoded in
    a single narrow pass with no vector data shuffled. Determinism: the
    quantizer is floor() over an identically-ordered IEEE expression
    ((x-mn)/(mx-mn))*255 — bit-exact cross-engine; only the error MEAN
    (order-dependent accumulation) is rounded to 6 (the qe02 recipe).
    """
    # round 16: opt OUT of scan parallelization — the encode pass is a
    # single narrow scan whose error-mean accumulation order the 6dp
    # rounding contract depends on; the paired A/B also lost (0.61x)
    emb = load_table(spark, sf_dir, "embeddings", parallelize=False)
    dims = emb.select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("pos0", "xf"),
    ).select(
        "vec_id",
        "label",
        (F.col("pos0") + 1).alias("pos"),
        F.col("xf").cast("double").alias("x"),
    )
    stats = dims.groupBy("pos").agg(
        F.min("x").alias("mn"), F.max("x").alias("mx")
    )
    # mx == mn guard (constant dimension): the quantizer would divide by
    # zero -> NaN -> ANSI cast error; a constant dim carries no
    # information, so code 0 / error 0, mirrored in the oracle CASE
    const_dim = F.col("mx") == F.col("mn")
    coded = dims.join(F.broadcast(stats), "pos").select(
        "label",
        "x",
        "mn",
        "mx",
        F.when(const_dim, F.lit(0).cast("long"))
        .otherwise(
            F.floor(
                ((F.col("x") - F.col("mn")) / (F.col("mx") - F.col("mn"))) * 255
            ).cast("long")
        )
        .alias("code"),
    )
    recon = coded.select(
        "label",
        "code",
        F.when(const_dim, F.lit(0.0))
        .otherwise(
            F.abs(
                F.col("x")
                - (
                    F.col("mn")
                    + (F.col("code") + 0.5)
                    * ((F.col("mx") - F.col("mn")) / 256)
                )
            )
        )
        .alias("err"),
    )
    return (
        recon.groupBy(F.col("label").cast("long").alias("label"))
        .agg(
            F.count(F.lit(1)).alias("n_values"),
            F.min("code").alias("min_code"),
            F.max("code").alias("max_code"),
            F.round(F.avg("err"), 6).alias("mean_abs_err"),
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# Product quantization: subspace codebooks + asymmetric distance (ADC)
# ---------------------------------------------------------------------------

PQ_M = 16  # subspaces (64-d embeddings → 4 dims per subspace)
PQ_SUBDIM = 4
PQ_LLOYD_ITERS = 2  # codebook refinement rounds after label-mean init


def _pq_chain_ctes() -> str:
    # the CTE chain replays the exact Spark dataflow: label-mean init,
    # two Lloyd rounds (empty cells keep their previous codeword), then
    # encode (codes) + the per-query LUT. Each squared term converts to
    # integer micro-units BEFORE the subspace sum (not sum-then-round:
    # a double SUM's accumulation order is unspecified in DuckDB while
    # Spark's zip_with fold is sequential, and FP non-associativity at
    # a rounding boundary could shift d_us by 1µ cross-engine), so
    # every distance, comparison, and the M-term ADC sum are exact
    # integer arithmetic in both engines. Shared verbatim by the qe06
    # (flat PQ) and qe21 (IVF+PQ composite) oracles.
    return f"""vd AS (
  SELECT vec_id, label, CAST((u.pos - 1) // {PQ_SUBDIM} AS BIGINT) AS m,
         u.pos, u.x::DOUBLE AS x
  FROM embeddings,
       LATERAL (SELECT unnest(embedding) AS x,
                       generate_subscripts(embedding, 1) AS pos) u),
cb0 AS (
  SELECT m, CAST(label AS BIGINT) AS code, pos, ROUND(AVG(x), 6) AS cx
  FROM vd GROUP BY m, label, pos),
d1 AS (
  SELECT v.vec_id, v.m, c.code,
         CAST(SUM(CAST(ROUND(((v.x - c.cx) * (v.x - c.cx)) * 1000000) AS BIGINT)) AS BIGINT) AS d_us
  FROM vd v JOIN cb0 c ON v.m = c.m AND v.pos = c.pos
  GROUP BY v.vec_id, v.m, c.code),
a1 AS (
  SELECT vec_id, m, code FROM (
    SELECT vec_id, m, code,
           ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY d_us, code) AS rnk
    FROM d1) t WHERE rnk = 1),
m1 AS (
  SELECT v.m, a.code, v.pos, ROUND(AVG(v.x), 6) AS cx
  FROM vd v JOIN a1 a ON v.vec_id = a.vec_id AND v.m = a.m
  GROUP BY v.m, a.code, v.pos),
cb1 AS (
  SELECT c.m, c.code, c.pos, COALESCE(n.cx, c.cx) AS cx
  FROM cb0 c LEFT JOIN m1 n ON c.m = n.m AND c.code = n.code AND c.pos = n.pos),
d2 AS (
  SELECT v.vec_id, v.m, c.code,
         CAST(SUM(CAST(ROUND(((v.x - c.cx) * (v.x - c.cx)) * 1000000) AS BIGINT)) AS BIGINT) AS d_us
  FROM vd v JOIN cb1 c ON v.m = c.m AND v.pos = c.pos
  GROUP BY v.vec_id, v.m, c.code),
a2 AS (
  SELECT vec_id, m, code FROM (
    SELECT vec_id, m, code,
           ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY d_us, code) AS rnk
    FROM d2) t WHERE rnk = 1),
m2 AS (
  SELECT v.m, a.code, v.pos, ROUND(AVG(v.x), 6) AS cx
  FROM vd v JOIN a2 a ON v.vec_id = a.vec_id AND v.m = a.m
  GROUP BY v.m, a.code, v.pos),
cb2 AS (
  SELECT c.m, c.code, c.pos, COALESCE(n.cx, c.cx) AS cx
  FROM cb1 c LEFT JOIN m2 n ON c.m = n.m AND c.code = n.code AND c.pos = n.pos),
dfin AS (
  SELECT v.vec_id, v.m, c.code,
         CAST(SUM(CAST(ROUND(((v.x - c.cx) * (v.x - c.cx)) * 1000000) AS BIGINT)) AS BIGINT) AS d_us
  FROM vd v JOIN cb2 c ON v.m = c.m AND v.pos = c.pos
  GROUP BY v.vec_id, v.m, c.code),
codes AS (
  SELECT vec_id AS cid, m, code FROM (
    SELECT vec_id, m, code,
           ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY d_us, code) AS rnk
    FROM dfin) t WHERE rnk = 1),
lut AS (SELECT vec_id AS qid, m, code, d_us FROM dfin WHERE vec_id < 8)"""


def _pq_oracle(k: int = 5) -> str:
    return f"""
WITH {_pq_chain_ctes()},
adc AS (
  SELECT l.qid, c.cid, CAST(SUM(l.d_us) AS BIGINT) AS total_us
  FROM codes c JOIN lut l ON c.m = l.m AND c.code = l.code
  WHERE c.cid <> l.qid
  GROUP BY l.qid, c.cid),
ranked AS (
  SELECT qid, cid, CAST(total_us AS DOUBLE) / 1000000 AS adc_dist,
         CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY total_us, cid) AS BIGINT)
           AS rank
  FROM adc)
SELECT qid, cid, adc_dist, rank FROM ranked WHERE rank <= {k}
"""


def _cb_arrays(cb: DataFrame) -> DataFrame:
    """Long-form codebook (m, code, pos, cx) → (m, code, cvec) arrays,
    cvec ordered by global dim position. K×M rows — always broadcast."""
    return cb.groupBy("m", "code").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "cx"))), lambda s: s.cx
        ).alias("cvec")
    )


def _pq_dist(subs: DataFrame, cb: DataFrame) -> DataFrame:
    """(vec_id, m, code, d_us): µ-unit distance of every subvector to
    every codeword of its subspace. The codebook rides a broadcast
    join on m and the distance is a zip_with fold over per-term
    integer micro-units (each squared term quantized BEFORE the sum,
    making the fold order-independent exact integer arithmetic that
    any accumulation order in the DuckDB oracle reproduces) — NO wide
    shuffle: vectors never leave their scan partition for scoring."""
    d_us = F.aggregate(
        F.zip_with(
            F.col("subvec"),
            F.col("cvec"),
            lambda x, c: F.round(((x - c) * (x - c)) * 1000000).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, t: acc + t,
    )
    return (
        subs.join(F.broadcast(_cb_arrays(cb)), "m")
        .select("vec_id", "m", "code", d_us.alias("d_us"))
    )


def _pq_argmin(dist: DataFrame) -> DataFrame:
    """Argmin codeword per (vec_id, m): min over exact-integer
    (d_us, code) structs — one partial-aggregating shuffle, no window
    sort, ties resolved to the lowest code by struct ordering."""
    return (
        dist.groupBy("vec_id", "m")
        .agg(F.min(F.struct("d_us", "code")).alias("mn"))
        .select("vec_id", "m", F.col("mn.code").alias("code"))
    )


def _pq_refine(vd: DataFrame, cb: DataFrame, assign: DataFrame) -> DataFrame:
    """One Lloyd round: recompute codeword means from the assignment;
    cells that lost every member keep their previous coordinates.

    Scale note: the vd⋈assign join is fact-fact (|N|·D vs |N|·M rows)
    — at 100 TB it is CORRECTLY a shuffle join on vec_id, never a
    broadcast; the resulting means relation (codes × D rows, KB-scale)
    is what gets broadcast back onto the previous codebook."""
    means = (
        vd.join(assign, ["vec_id", "m"])
        .groupBy("m", "code", "pos")
        .agg(F.round(F.avg("x"), 6).alias("ncx"))
    )
    return cb.join(F.broadcast(means), ["m", "code", "pos"], "left").select(
        "m", "code", "pos", F.coalesce("ncx", "cx").alias("cx")
    )


def _pq_views(emb: DataFrame) -> tuple[DataFrame, DataFrame]:
    """The two shapes PQ consumes from the embeddings table: ``vd``
    long-form (vec_id, label, m, pos, x) for codebook math and ``subs``
    subvector arrays (vec_id, m, subvec) for distance folds. Both are
    narrow transforms of the scan — no shuffle."""
    vd = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("pos0", "x")
    ).select(
        "vec_id",
        "label",
        (F.col("pos0") / PQ_SUBDIM).cast("long").alias("m"),
        F.col("pos0").alias("pos"),
        F.col("x").cast("double").alias("x"),
    )
    subs = emb.select(
        "vec_id",
        F.explode(F.sequence(F.lit(0), F.lit(PQ_M - 1))).alias("m0"),
        "embedding",
    ).select(
        "vec_id",
        F.col("m0").cast("long").alias("m"),
        F.expr(
            f"transform(slice(embedding, m0 * {PQ_SUBDIM} + 1, {PQ_SUBDIM}),"
            " x -> cast(x as double))"
        ).alias("subvec"),
    )
    return vd, subs


def _pq_init(vd: DataFrame) -> DataFrame:
    """Initial codebook: per-label subvector means (label-mean init)."""
    return vd.groupBy(
        "m", F.col("label").cast("long").alias("code"), "pos"
    ).agg(F.round(F.avg("x"), 6).alias("cx"))


def _pq_score(subs: DataFrame, cb: DataFrame, n_queries: int = 8, k: int = 5) -> DataFrame:
    """Encode + ADC scoring against a (final) codebook: corpus codes
    from the argmin over broadcast codebook distances, per-query LUT
    broadcast onto the codes — every join in this phase has a KB-scale
    build side and MUST be a broadcast at any corpus size (plan-pinned
    in tests/test_plan_shapes.py::test_qe06_pq_scoring_joins_are_broadcast_only)."""
    dfin = _pq_dist(subs, cb).localCheckpoint(eager=False)
    codes = _pq_argmin(dfin).withColumnRenamed("vec_id", "cid")
    lut = dfin.filter(F.col("vec_id") < n_queries).withColumnRenamed("vec_id", "qid")
    adc = (
        codes.join(F.broadcast(lut), ["m", "code"])
        .filter(F.col("cid") != F.col("qid"))
        .groupBy("qid", "cid")
        .agg(F.sum("d_us").alias("total_us"))
    )
    wr = W.partitionBy("qid").orderBy("total_us", "cid")
    return adc.select(
        "qid",
        "cid",
        (F.col("total_us").cast("double") / 1000000).alias("adc_dist"),
        F.row_number().over(wr).cast("long").alias("rank"),
    ).filter(F.col("rank") <= k)


@register("qe06_pq_topk", bench=True, tags=("similarity", "approx"), oracle=_pq_oracle())
def qe06_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via product quantization (L3's memory-compression scale
    path, complementing qe03 LSH and qe04 IVF): the 64-d space splits
    into M=16 4-d subspaces; per-subspace codebooks initialize from
    per-label subvector means and refine through two Lloyd rounds;
    each corpus vector is encoded as 16 code ids (argmin subspace
    distance); queries score candidates with the asymmetric-distance
    (ADC) trick — a broadcast per-query lookup table of
    query↔codeword distances, so scoring a candidate costs M integer
    lookups instead of a 64-d float fold. This is the dataflow that
    lets a 1000-executor cluster hold a 100 TB corpus as |N|×M byte
    codes in memory; recall vs the exact-L2 baseline is asserted in
    tests/test_similarity.py::test_pq_adc_recall_vs_exact_l2.

    Determinism: per-codeword distances round to 6dp then convert to
    exact integer micro-units, so every argmin (ties → lowest code)
    and the M-term ADC totals are order-independent integer sums;
    codebook means round to 6dp each Lloyd round; empty cells inherit
    the previous round's codeword in both engines."""
    emb = load_table(spark, sf_dir, "embeddings")
    _vd, subs = _pq_views(emb)
    return _pq_score(subs, pq_codebook_shared(emb))


def pq_codebook_shared(emb: DataFrame) -> DataFrame:
    """Session-memoized trained PQ codebook (the qe06 Lloyd loop).

    Training is the expensive, inherently-iterative stage (per round:
    distance pass + argmin + mean recomputation — each codebook is
    K×M codewords, ~2.5 KB, localCheckpoint'd so round t+1 never
    replays round t's DAG); encoding + ADC scoring are cheap one-pass
    consumers. Same contract as ``kmeans_assign_shared``: one
    materialized artifact per (application, corpus plan), value-
    identical to recomputation (the oracle replays the identical
    training chain in SQL), with the 100 TB analogue being a persisted
    codebook table per corpus snapshot that encode/serve stages read.
    """
    from event_stream_aggr_spark.operators.stagecache import memoized_stage

    def _train() -> DataFrame:
        vd, subs = _pq_views(emb)
        cb = _pq_init(vd)
        for _ in range(PQ_LLOYD_ITERS):
            assign = _pq_argmin(_pq_dist(subs, cb))
            cb = _pq_refine(vd.drop("label"), cb, assign).localCheckpoint(eager=False)
        return cb

    return memoized_stage("pq_codebook", emb, _train)


RERANK_SHORTLIST = 20  # stage-1 candidates per query (4x the final k)


def _rerank_oracle(k: int = 5, shortlist: int = RERANK_SHORTLIST) -> str:
    return f"""
WITH dims AS (
  SELECT vec_id, u.pos, u.x::DOUBLE AS x
  FROM embeddings,
       LATERAL (SELECT unnest(embedding) AS x,
                       generate_subscripts(embedding, 1) AS pos) u),
stats AS (
  SELECT pos, MIN(x) AS mn, MAX(x) AS mx FROM dims GROUP BY pos),
recon AS (
  SELECT vec_id, pos,
         CASE WHEN mx = mn THEN mn
              ELSE mn + (FLOOR(((x - mn) / (mx - mn)) * 255) + 0.5)
                   * ((mx - mn) / 256)
         END AS rx
  FROM dims JOIN stats USING (pos)),
qd AS (SELECT vec_id AS qid, pos, x AS qx FROM dims WHERE vec_id < 8),
approx AS (
  SELECT qd.qid, r.vec_id AS cid,
         CAST(SUM(CAST(ROUND(qd.qx * r.rx * 1000000) AS BIGINT)) AS BIGINT)
           AS adp_us
  FROM qd JOIN recon r ON qd.pos = r.pos
  WHERE r.vec_id <> qd.qid
  GROUP BY qd.qid, r.vec_id),
short AS (
  SELECT qid, cid FROM (
    SELECT qid, cid,
           ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adp_us DESC, cid)
             AS srank
    FROM approx) t WHERE srank <= {shortlist}),
pairs AS (
  SELECT s.qid, s.cid,
         (SELECT SUM(a * b) FROM (SELECT unnest(eq.embedding)::DOUBLE AS a,
                                         unnest(ec.embedding)::DOUBLE AS b)) AS dp,
         (SELECT SUM(a * a) FROM (SELECT unnest(eq.embedding)::DOUBLE AS a)) AS nq,
         (SELECT SUM(b * b) FROM (SELECT unnest(ec.embedding)::DOUBLE AS b)) AS nc
  FROM short s
  JOIN embeddings eq ON s.qid = eq.vec_id
  JOIN embeddings ec ON s.cid = ec.vec_id),
ranked AS (
  SELECT qid, cid, ROUND(dp / (SQRT(nq) * SQRT(nc)), 6) AS cos_sim,
         CAST(ROW_NUMBER() OVER (PARTITION BY qid
              ORDER BY ROUND(dp / (SQRT(nq) * SQRT(nc)), 6) DESC, cid) AS BIGINT)
           AS rank
  FROM pairs)
SELECT qid, cid, cos_sim, rank FROM ranked WHERE rank <= {k}
"""


@register("qe07_rerank_topk", tags=("similarity", "approx"), oracle=_rerank_oracle())
def qe07_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage retrieval (L3, the serving pattern every production
    vector store uses): stage 1 scores the WHOLE corpus against each
    query with cheap int8-reconstructed dot products (qe05's
    per-dimension min/max quantizer) and keeps a 4k shortlist; stage 2
    reranks only the shortlist with exact full-precision cosine. The
    approximate pass touches compressed bytes; the exact pass touches
    RERANK_SHORTLIST·|Q| vectors instead of |corpus|·|Q|.

    Scale shape (100 TB): calibration is a 64-row aggregate broadcast
    back onto the scan (qe05's dataflow); stage-1 scoring is a narrow
    zip_with fold per (corpus row × broadcast query) with no vector
    shuffle; only (qid, cid, integer score) triples reach the top-k
    exchange. Stage 2's exact scoring joins the shortlist back to the
    corpus by id — shortlist-bounded, broadcastable.

    Determinism: the reconstructed value is a fixed-shape IEEE
    expression (bit-exact cross-engine, qe05's argument) and each
    query·recon term converts to integer micro-units BEFORE the sum
    (qe06's recipe), so stage-1 shortlists are exact integer ranking
    in both engines; stage-2 reranks on 6dp-rounded cosine with cid
    tiebreak (qe01's recipe)."""
    emb = load_table(spark, sf_dir, "embeddings")
    dims = emb.select("vec_id", F.posexplode("embedding").alias("pos0", "xf")).select(
        "vec_id", (F.col("pos0") + 1).alias("pos"), F.col("xf").cast("double").alias("x")
    )
    # per-dim calibration → ONE row of 64 (mn, mx) structs ordered by pos
    stats = (
        dims.groupBy("pos")
        .agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
        .agg(F.array_sort(F.collect_list(F.struct("pos", "mn", "mx"))).alias("mmx"))
    )

    def recon(x: Column, s: Column) -> Column:
        mn, mx = s["mn"], s["mx"]
        return F.when(mx == mn, mn).otherwise(
            mn + (F.floor(((x - mn) / (mx - mn)) * 255) + 0.5) * ((mx - mn) / 256)
        )

    # corpus stays an array the whole way: cast → zip with the broadcast
    # calibration structs → reconstructed int8 approximation, no explode
    corpus = emb.crossJoin(F.broadcast(stats)).select(
        F.col("vec_id").alias("cid"),
        F.zip_with(F.col("embedding").cast("array<double>"), F.col("mmx"), recon).alias(
            "rvec"
        ),
    )
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").cast("array<double>").alias("qvec"),
    )
    adp_us = F.aggregate(
        F.zip_with(
            F.col("qvec"), F.col("rvec"), lambda q, r: F.round(q * r * 1000000).cast("long")
        ),
        F.lit(0).cast("long"),
        lambda acc, t: acc + t,
    )
    approx = (
        corpus.crossJoin(F.broadcast(queries))
        .filter(F.col("cid") != F.col("qid"))
        .select("qid", "cid", adp_us.alias("adp_us"))
    )
    ws = W.partitionBy("qid").orderBy(F.col("adp_us").desc(), F.col("cid"))
    short = (
        approx.select("*", F.row_number().over(ws).alias("srank"))
        .filter(F.col("srank") <= RERANK_SHORTLIST)
        .select("qid", "cid")
    )
    # stage 2: exact cosine on the shortlist only (qe01's math). The
    # broadcast build side is the QUERY vectors only — broadcasting
    # the unfiltered corpus here would ship |corpus| vectors to every
    # executor and break the shortlist-bounded contract at scale.
    eq = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    ec = emb.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("ce"))
    scored = (
        short.join(F.broadcast(eq), "qid")
        .join(ec, "cid")
        .select("qid", "cid", F.round(cosine(F.col("qe"), F.col("ce")), 6).alias("cos_sim"))
    )
    wr = W.partitionBy("qid").orderBy(F.col("cos_sim").desc(), F.col("cid"))
    return scored.select(
        "qid", "cid", "cos_sim", F.row_number().over(wr).cast("long").alias("rank")
    ).filter(F.col("rank") <= 5)


# ---------------------------------------------------------------------------
# Full-vector k-means: corpus topic clustering (curation's workhorse)
# ---------------------------------------------------------------------------

KM_ITERS = 2  # Lloyd rounds after label-mean init (matches PQ_LLOYD_ITERS)


def _km_views(emb: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Full-space twins of ``_pq_views``: one subspace (m = 0) spanning
    all 64 dims, so the PQ distance/argmin/refine machinery runs
    unchanged as ordinary k-means. Both shapes are narrow transforms of
    the scan — no shuffle."""
    vd = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("pos0", "xf")
    ).select(
        "vec_id",
        "label",
        F.lit(0).cast("long").alias("m"),
        F.col("pos0").alias("pos"),
        F.col("xf").cast("double").alias("x"),
    )
    subs = emb.select(
        "vec_id",
        F.lit(0).cast("long").alias("m"),
        F.expr("transform(embedding, x -> cast(x as double))").alias("subvec"),
    )
    return vd, subs


def _km_dist(subs: DataFrame, cb: DataFrame) -> DataFrame:
    """(vec_id, m, code, d_us): µ-unit distance of every vector to
    every centroid. Unlike PQ's subspace join on ``m``, full-vector
    k-means has no selective join key — every vector must score
    against all K centroids — so this is a DELIBERATE broadcast
    product with a K-row (KB-scale) build side, the plan any k-means
    scoring pass has at any corpus size. (Expressing it as a join on
    the constant m=0 would constant-fold to the same
    BroadcastNestedLoopJoin; the explicit crossJoin states the
    intent.) Distance math is _pq_dist's exact-integer fold."""
    d_us = F.aggregate(
        F.zip_with(
            F.col("subvec"),
            F.col("cvec"),
            lambda x, c: F.round(((x - c) * (x - c)) * 1000000).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, t: acc + t,
    )
    return (
        subs.drop("m")
        .crossJoin(F.broadcast(_cb_arrays(cb).drop("m")))
        .select(
            "vec_id",
            F.lit(0).cast("long").alias("m"),
            "code",
            d_us.alias("d_us"),
        )
    )


def kmeans_assign(emb: DataFrame) -> DataFrame:
    """K-means cluster assignment over the embedding column:
    label-mean init, KM_ITERS Lloyd rounds (empty cells keep their
    previous centroid), then the final (vec_id, code, d_us) assignment
    where d_us is the exact integer micro-unit squared distance to the
    winning centroid (ties → lowest code, via struct-min ordering).

    Scale shape (100 TB): the K×D centroid relation (KB-scale)
    broadcasts onto the scan for every distance pass (a deliberate
    K-row broadcast product — see ``_km_dist``); the only wide
    exchanges are the per-round mean recomputation (a
    partial-aggregating groupBy on code) and the vd⋈assign refine
    join, both keyed and AQE-splittable. Vectors never shuffle for
    scoring. ``localCheckpoint`` truncates the iterative lineage so
    round t+1 doesn't replay round t's DAG."""
    vd, subs = _km_views(emb)
    cb = _pq_init(vd)
    for _ in range(KM_ITERS):
        assign = _pq_argmin(_km_dist(subs, cb))
        cb = _pq_refine(vd.drop("label"), cb, assign).localCheckpoint(eager=False)
    dfin = _km_dist(subs, cb)
    return (
        dfin.groupBy("vec_id")
        .agg(F.min(F.struct("d_us", "code")).alias("mn"))
        .select(
            "vec_id",
            F.col("mn.code").alias("code"),
            F.col("mn.d_us").alias("d_us"),
        )
    )


def kmeans_assign_shared(emb: DataFrame) -> DataFrame:
    """Session-memoized, eagerly materialized ``kmeans_assign``.

    qe08 (cluster profiles), qd16 (semantic dedup), qs08
    (cluster-balanced sampling) and qp03 (the composed pipeline) all
    consume the SAME (vec_id, code, d_us) assignment; recomputing the
    2-Lloyd-round iteration per query made it the most expensive stage
    in the r4 bench three times over (~3s each at sf0.1, the top
    entries). The memo keys on (applicationId, semantic hash of the
    analyzed input plan) and hands every consumer one
    localCheckpoint-materialized DataFrame, so within a session the
    assignment is computed once per distinct corpus. The 100 TB
    analogue: persist the assignment table once per corpus snapshot
    and fan every downstream curation stage off it.

    Value-identical to calling ``kmeans_assign`` directly (the memo
    only changes where the blocks come from), so consumers' DuckDB
    oracles replay the same ``km_assign_ctes`` chain either way.
    Memo mechanics live in ``operators.stagecache`` (shared with the
    semantic-drop stage).
    """
    from event_stream_aggr_spark.operators.stagecache import memoized_stage

    return memoized_stage("kmeans_assign", emb, lambda: kmeans_assign(emb))


def km_assign_ctes() -> str:
    """The DuckDB CTE chain replaying ``kmeans_assign`` exactly —
    shared by qe08's profile oracle and qs08's balanced-sample oracle.
    Same determinism recipe as qe06: centroid means round to 6dp per
    round, every squared term converts to integer micro-units BEFORE
    the sum, argmin ties resolve to the lowest code."""
    dist = (
        "CAST(SUM(CAST(ROUND(((v.x - c.cx) * (v.x - c.cx)) * 1000000)"
        " AS BIGINT)) AS BIGINT)"
    )
    return f"""
vd AS (
  SELECT vec_id, label, u.pos, u.x::DOUBLE AS x
  FROM embeddings,
       LATERAL (SELECT unnest(embedding) AS x,
                       generate_subscripts(embedding, 1) AS pos) u),
cb0 AS (
  SELECT CAST(label AS BIGINT) AS code, pos, ROUND(AVG(x), 6) AS cx
  FROM vd GROUP BY label, pos),
d1 AS (
  SELECT v.vec_id, c.code, {dist} AS d_us
  FROM vd v JOIN cb0 c ON v.pos = c.pos
  GROUP BY v.vec_id, c.code),
a1 AS (
  SELECT vec_id, code FROM (
    SELECT vec_id, code,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d_us, code) AS rnk
    FROM d1) t WHERE rnk = 1),
m1 AS (
  SELECT a.code, v.pos, ROUND(AVG(v.x), 6) AS cx
  FROM vd v JOIN a1 a ON v.vec_id = a.vec_id
  GROUP BY a.code, v.pos),
cb1 AS (
  SELECT c.code, c.pos, COALESCE(n.cx, c.cx) AS cx
  FROM cb0 c LEFT JOIN m1 n ON c.code = n.code AND c.pos = n.pos),
d2 AS (
  SELECT v.vec_id, c.code, {dist} AS d_us
  FROM vd v JOIN cb1 c ON v.pos = c.pos
  GROUP BY v.vec_id, c.code),
a2 AS (
  SELECT vec_id, code FROM (
    SELECT vec_id, code,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d_us, code) AS rnk
    FROM d2) t WHERE rnk = 1),
m2 AS (
  SELECT a.code, v.pos, ROUND(AVG(v.x), 6) AS cx
  FROM vd v JOIN a2 a ON v.vec_id = a.vec_id
  GROUP BY a.code, v.pos),
cb2 AS (
  SELECT c.code, c.pos, COALESCE(n.cx, c.cx) AS cx
  FROM cb1 c LEFT JOIN m2 n ON c.code = n.code AND c.pos = n.pos),
dfin AS (
  SELECT v.vec_id, c.code, {dist} AS d_us
  FROM vd v JOIN cb2 c ON v.pos = c.pos
  GROUP BY v.vec_id, c.code),
assign AS (
  SELECT vec_id, code, d_us FROM (
    SELECT vec_id, code, d_us,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d_us, code) AS rnk
    FROM dfin) t WHERE rnk = 1)"""


def km_profile_ctes() -> str:
    """CTE chain ``lab → lc → prof → top`` deriving qe08's per-cluster
    profile from the ``assign`` CTE; shared with qp03's composed
    pipeline oracle."""
    return """lab AS (
  SELECT a.code, a.d_us, CAST(e.label AS BIGINT) AS label
  FROM assign a JOIN embeddings e ON a.vec_id = e.vec_id),
lc AS (
  SELECT code, label, COUNT(*) AS cnt, CAST(SUM(d_us) AS BIGINT) AS sd
  FROM lab GROUP BY code, label),
prof AS (
  SELECT code, CAST(SUM(cnt) AS BIGINT) AS n_vecs,
         CAST(SUM(sd) AS BIGINT) AS sum_d
  FROM lc GROUP BY code),
top AS (
  SELECT code, label AS top_label, cnt AS top_cnt FROM (
    SELECT code, label, cnt,
           ROW_NUMBER() OVER (PARTITION BY code ORDER BY cnt DESC, label) AS rnk
    FROM lc) t WHERE rnk = 1)"""


_KM_PROFILE_SELECT = """
SELECT p.code AS cluster, p.n_vecs, t.top_label,
       ROUND(CAST(t.top_cnt AS DOUBLE) / p.n_vecs, 6) AS top_share,
       ROUND(CAST(p.sum_d AS DOUBLE) / p.n_vecs / 1000000, 6) AS avg_dist
FROM prof p JOIN top t ON p.code = t.code
"""

_KM_PROFILE_ORACLE = f"""
WITH {km_assign_ctes()},
{km_profile_ctes()}
{_KM_PROFILE_SELECT}"""


@register(
    "qe08_kmeans_clusters",
    bench=True,
    tags=("similarity", "clustering"),
    oracle=_KM_PROFILE_ORACLE,
)
def qe08_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus topic clustering via full-vector k-means (the curation
    workhorse behind cluster-balanced mixing, topic pruning, and
    diversity audits): label-mean init, two Lloyd rounds, then a
    per-cluster profile — size, dominant label + its share (cluster
    purity), and mean squared distance to the centroid (cluster
    tightness). Reuses the PQ machinery as the degenerate one-subspace
    case, so the iterative dataflow is tested twice from two angles.

    Determinism: assignment distances are exact integer micro-units
    (qe06's recipe), so SUM(d_us) is order-free; purity/tightness are
    single IEEE divisions of identical integers in both engines,
    rounded to 6dp; dominant-label ties resolve to the lowest label."""
    # round 16: parallelize=False — this load feeds the SHARED k-means
    # assignment memo (kmeans_assign_shared); a repartitioned input both
    # forks the memo key and leaves the tiny checkpointed assignment in
    # 32 partitions, which cost every downstream consumer ~0.3-0.4 s of
    # empty-task stages (paired min-of-5: qe08 0.59x, qp03 0.65x).
    emb = load_table(spark, sf_dir, "embeddings", parallelize=False)
    assign = kmeans_assign_shared(emb)
    lab = assign.join(
        emb.select("vec_id", F.col("label").cast("long").alias("label")), "vec_id"
    )
    lc = lab.groupBy("code", "label").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("d_us").alias("sd")
    )
    prof = lc.groupBy("code").agg(
        F.sum("cnt").alias("n_vecs"),
        F.sum("sd").alias("sum_d"),
        F.max(F.struct(F.col("cnt"), (-F.col("label")).alias("nl"))).alias("top"),
    )
    return prof.select(
        F.col("code").alias("cluster"),
        "n_vecs",
        (-F.col("top.nl")).alias("top_label"),
        F.round(F.col("top.cnt").cast("double") / F.col("n_vecs"), 6).alias(
            "top_share"
        ),
        F.round(
            F.col("sum_d").cast("double") / F.col("n_vecs") / 1000000, 6
        ).alias("avg_dist"),
    )


# ---------------------------------------------------------------------------
# qe09: cluster separation report (silhouette-style diagnostics)
# ---------------------------------------------------------------------------


def _qe09_oracle() -> str:
    dist = (
        "CAST(SUM(CAST(ROUND(((m.x - c.cx) * (m.x - c.cx)) * 1000000)"
        " AS BIGINT)) AS BIGINT)"
    )
    cdist = (
        "CAST(SUM(CAST(ROUND(((a.cx - b.cx) * (a.cx - b.cx)) * 1000000)"
        " AS BIGINT)) AS BIGINT)"
    )
    return f"""
WITH {km_assign_ctes()},
member AS (
  SELECT a.code, v.vec_id, v.pos, v.x
  FROM assign a JOIN vd v ON a.vec_id = v.vec_id),
cent AS (
  SELECT code, pos, ROUND(AVG(x), 6) AS cx FROM member GROUP BY code, pos),
wd AS (
  SELECT m.vec_id, m.code, {dist} AS d_us
  FROM member m JOIN cent c ON m.code = c.code AND m.pos = c.pos
  GROUP BY m.vec_id, m.code),
within AS (
  SELECT code, CAST(COUNT(*) AS BIGINT) AS n_vecs,
         CAST(SUM(d_us) AS BIGINT) AS sum_d
  FROM wd GROUP BY code),
bet AS (
  SELECT a.code AS ca, b.code AS cb, {cdist} AS d
  FROM cent a JOIN cent b ON a.pos = b.pos AND a.code <> b.code
  GROUP BY a.code, b.code),
near AS (
  SELECT ca AS code, cb AS nearest_cluster, d FROM (
    SELECT ca, cb, d,
           ROW_NUMBER() OVER (PARTITION BY ca ORDER BY d, cb) AS rn
    FROM bet) t WHERE rn = 1)
SELECT w.code AS cluster, w.n_vecs,
       ROUND(CAST(w.sum_d AS DOUBLE) / w.n_vecs / 1000000, 6) AS avg_within,
       n.nearest_cluster,
       ROUND(CAST(n.d AS DOUBLE) / 1000000, 6) AS nearest_dist,
       ROUND(CAST(n.d AS DOUBLE) / (CAST(w.sum_d AS DOUBLE) / w.n_vecs), 6)
         AS separation
FROM within w JOIN near n ON w.code = n.code
"""


@register(
    "qe09_cluster_separation",
    tags=("similarity", "clustering", "stats"),
    oracle=_qe09_oracle(),
)
def qe09_cluster_separation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster separation report (the Davies-Bouldin-style diagnostic
    run after clustering, before trusting cluster-balanced sampling or
    semantic dedup): per cluster, its post-assignment centroid's mean
    within-cluster squared distance (tightness), the nearest OTHER
    centroid and its distance, and the separation ratio
    nearest-between / mean-within (higher = cleaner clustering).

    Consumes the SHARED assignment stage (kmeans_assign_shared), so in
    the composed pipeline the Lloyd iteration is not re-paid; centroids
    are recomputed from the final assignment (the standard post-fit
    diagnostic convention — one refine step past cb2).

    Determinism: centroid components round to 6dp; every squared term
    converts to integer micro-units before summation (the km recipe),
    so all ratios divide identical integers.

    Scale shape (100 TB): member = assign⋈vd is the refine join (keyed
    on vec_id, AQE-splittable); centroids are K×D rows — the wd join
    broadcasts them back onto member; the K² centroid-pair product is
    metadata-scale. No vector ever shuffles for the diagnostics."""
    # round 16: parallelize=False — this load feeds the SHARED k-means
    # assignment memo (kmeans_assign_shared); a repartitioned input both
    # forks the memo key and leaves the tiny checkpointed assignment in
    # 32 partitions, which cost every downstream consumer ~0.3-0.4 s of
    # empty-task stages (paired min-of-5: qe08 0.59x, qp03 0.65x).
    emb = load_table(spark, sf_dir, "embeddings", parallelize=False)
    assign = kmeans_assign_shared(emb)
    vd = emb.select("vec_id", F.posexplode("embedding").alias("pos", "xf")).select(
        "vec_id", "pos", F.col("xf").cast("double").alias("x")
    )
    member = assign.select("vec_id", "code").join(vd, "vec_id")
    cent = member.groupBy("code", "pos").agg(F.round(F.avg("x"), 6).alias("cx"))
    sq_us = F.round(
        (F.col("x") - F.col("cx")) * (F.col("x") - F.col("cx")) * 1000000
    ).cast("long")
    wd = (
        member.join(F.broadcast(cent), ["code", "pos"])
        .groupBy("vec_id", "code")
        .agg(F.sum(sq_us).alias("d_us"))
    )
    within = wd.groupBy("code").agg(
        F.count(F.lit(1)).alias("n_vecs"), F.sum("d_us").alias("sum_d")
    )
    ca = cent.select(F.col("code").alias("ca"), "pos", F.col("cx").alias("cxa"))
    cb = cent.select(F.col("code").alias("cb"), "pos", F.col("cx").alias("cxb"))
    csq_us = F.round(
        (F.col("cxa") - F.col("cxb")) * (F.col("cxa") - F.col("cxb")) * 1000000
    ).cast("long")
    bet = (
        ca.join(cb, "pos")
        .filter(F.col("ca") != F.col("cb"))
        .groupBy("ca", "cb")
        .agg(F.sum(csq_us).alias("d"))
    )
    near = bet.groupBy("ca").agg(F.min(F.struct("d", "cb")).alias("mn"))
    return (
        within.join(near, within["code"] == near["ca"])
        .select(
            F.col("code").alias("cluster"),
            "n_vecs",
            F.round(F.col("sum_d").cast("double") / F.col("n_vecs") / 1000000, 6)
              .alias("avg_within"),
            F.col("mn.cb").alias("nearest_cluster"),
            F.round(F.col("mn.d").cast("double") / 1000000, 6).alias("nearest_dist"),
            F.round(
                F.col("mn.d").cast("double")
                / (F.col("sum_d").cast("double") / F.col("n_vecs")),
                6,
            ).alias("separation"),
        )
    )


# ---------------------------------------------------------------------------
# qe10: sparse TF-IDF cosine top-k via rare-term candidate routing
# ---------------------------------------------------------------------------

SPARSE_DF_CAP_FRAC = 0.1  # candidate terms must hit <= 10% of the corpus
SPARSE_TOP_K = 5


def _qe10_oracle() -> str:
    return f"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS term
  FROM documents),
tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks GROUP BY doc_id, term),
dfreq AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),
w AS (
  SELECT tf.doc_id, tf.term,
         CAST(ROUND(ROUND(tf.tf * LN(n.n_docs / dfreq.df), 6) * 1000)
           AS BIGINT) AS wm
  FROM tf JOIN dfreq USING (term) CROSS JOIN n),
norms AS (
  SELECT doc_id, CAST(SUM(wm * wm) AS BIGINT) AS n2 FROM w GROUP BY doc_id),
rare AS (
  SELECT term FROM dfreq CROSS JOIN n
  WHERE df <= {SPARSE_DF_CAP_FRAC} * n.n_docs),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM (SELECT doc_id, term FROM tf WHERE term IN (SELECT term FROM rare)) a
  JOIN (SELECT doc_id, term FROM tf WHERE term IN (SELECT term FROM rare)) b
    ON a.term = b.term AND a.doc_id < b.doc_id),
dots AS (
  SELECT c.doc_a, c.doc_b, CAST(SUM(wa.wm * wb.wm) AS BIGINT) AS dot
  FROM cand c
  JOIN w wa ON wa.doc_id = c.doc_a
  JOIN w wb ON wb.doc_id = c.doc_b AND wb.term = wa.term
  GROUP BY c.doc_a, c.doc_b),
scored AS (
  SELECT d.doc_a, d.doc_b,
         ROUND(d.dot / (SQRT(na.n2) * SQRT(nb.n2)), 6) AS cos_sim
  FROM dots d
  JOIN norms na ON na.doc_id = d.doc_a
  JOIN norms nb ON nb.doc_id = d.doc_b),
mirrored AS (
  SELECT doc_a AS doc_id, doc_b AS neighbor_id, cos_sim FROM scored
  UNION ALL
  SELECT doc_b, doc_a, cos_sim FROM scored)
SELECT doc_id, neighbor_id, cos_sim, rank FROM (
  SELECT doc_id, neighbor_id, cos_sim,
         CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
              ORDER BY cos_sim DESC, neighbor_id) AS BIGINT) AS rank
  FROM mirrored) t
WHERE rank <= {SPARSE_TOP_K}
"""


@register(
    "qe10_sparse_cosine_topk",
    tags=("similarity", "text", "retrieval"),
    oracle=_qe10_oracle(),
)
def qe10_sparse_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse TF-IDF cosine top-k neighbors WITHOUT embeddings (L3's
    lexical half — the retrieval stack qt17/qt19 score and index,
    completed with pairwise similarity): candidate pairs come from
    sharing a RARE term (document frequency ≤ 10% of the corpus — the
    prefix-filter principle: frequent terms don't discriminate, so
    they never generate candidates), then exact sparse cosine over the
    full TF-IDF vectors of just those pairs, top-k per document.

    Scale shape (100 TB): the candidate join is term-keyed and
    df-capped — per-term fan-out is bounded by the cap, so the join is
    sub-quadratic by construction (the same bound that makes qt19's
    posting lists shard-able); frequent-term pairs are EXCLUDED, not
    skew-split, which is the published prefix-filtering trade. Scoring
    joins the weight relation (corpus-token-grain, shuffles once on
    doc) onto candidate-pair grain; norms are doc-grain. No dense
    vectors, no LSH parameters to tune — the lexical alternative when
    recall on rare-vocabulary overlap is what matters.

    Determinism: weights round ln() to 6dp then scale to integer
    milli-units; dots and norms are exact integer sums; the final
    cosine divides identical integers (one IEEE sqrt+div), rounded
    6dp with neighbor_id tiebreaks."""
    from pyspark.sql import Window as W

    from event_stream_aggr_spark.operators.text import tokens

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(tokens(F.lower(F.col("text")))).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = d.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    w = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            F.round(
                F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6)
                * 1000
            )
            .cast("long")
            .alias("wm"),
        )
    )
    norms = w.groupBy("doc_id").agg(F.sum(F.col("wm") * F.col("wm")).alias("n2"))
    rare = (
        dfreq.crossJoin(F.broadcast(n))
        .filter(F.col("df") <= SPARSE_DF_CAP_FRAC * F.col("n_docs"))
        .select("term")
    )
    rare_tf = tf.join(F.broadcast(rare), "term").select("doc_id", "term")
    cand = (
        rare_tf.select("term", F.col("doc_id").alias("doc_a"))
        .join(rare_tf.select("term", F.col("doc_id").alias("doc_b")), "term")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    wa = w.select(F.col("doc_id").alias("doc_a"), "term", F.col("wm").alias("wma"))
    wb = w.select(F.col("doc_id").alias("doc_b"), "term", F.col("wm").alias("wmb"))
    dots = (
        cand.join(wa, "doc_a")
        .join(wb, ["doc_b", "term"])
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.col("wma") * F.col("wmb")).alias("dot"))
    )
    na = norms.select(F.col("doc_id").alias("doc_a"), F.col("n2").alias("n2a"))
    nb = norms.select(F.col("doc_id").alias("doc_b"), F.col("n2").alias("n2b"))
    scored = (
        dots.join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("dot") / (F.sqrt("n2a") * F.sqrt("n2b")), 6
            ).alias("cos_sim"),
        )
    )
    mirrored = scored.select(
        F.col("doc_a").alias("doc_id"),
        F.col("doc_b").alias("neighbor_id"),
        "cos_sim",
    ).unionAll(
        scored.select(
            F.col("doc_b").alias("doc_id"),
            F.col("doc_a").alias("neighbor_id"),
            "cos_sim",
        )
    )
    wrank = W.partitionBy("doc_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        mirrored.select(
            "doc_id",
            "neighbor_id",
            "cos_sim",
            F.row_number().over(wrank).cast("long").alias("rank"),
        )
        .filter(F.col("rank") <= SPARSE_TOP_K)
    )


# ---------------------------------------------------------------------------
# qe11: contrastive training-pair mining (hard positives + hard negatives)
# ---------------------------------------------------------------------------

CONTRASTIVE_QUERY_MOD = 25  # every 25th vector anchors a training pair


@register(
    "qe11_contrastive_pairs",
    tags=("similarity", "training-data"),
    oracle=f"""
WITH q AS (SELECT vec_id AS qid, label AS qlab, embedding AS qe
           FROM embeddings WHERE vec_id % {CONTRASTIVE_QUERY_MOD} = 0),
c AS (SELECT vec_id AS cid, label AS clab, embedding AS ce FROM embeddings),
pairs AS (
  SELECT qid, qlab, cid, clab,
         ROUND((SELECT SUM(a * b) FROM (SELECT unnest(qe)::DOUBLE AS a,
                                               unnest(ce)::DOUBLE AS b))
               / (SQRT((SELECT SUM(a * a)
                        FROM (SELECT unnest(qe)::DOUBLE AS a)))
                  * SQRT((SELECT SUM(b * b)
                          FROM (SELECT unnest(ce)::DOUBLE AS b)))), 6)
           AS cos_sim
  FROM c, q WHERE cid <> qid),
pos AS (SELECT qid, cid, cos_sim,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY cos_sim ASC, cid) AS rn
        FROM pairs WHERE clab = qlab),
neg AS (SELECT qid, cid, cos_sim,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY cos_sim DESC, cid) AS rn
        FROM pairs WHERE clab <> qlab)
SELECT q.qid, CAST(q.qlab AS BIGINT) AS q_label,
       p.cid AS pos_id, p.cos_sim AS pos_sim,
       n.cid AS neg_id, n.cos_sim AS neg_sim
FROM q
JOIN pos p ON p.qid = q.qid AND p.rn = 1
JOIN neg n ON n.qid = q.qid AND n.rn = 1
""",
)
def qe11_contrastive_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-pair mining for metric-learning training data: per
    anchor vector, the HARD positive (same label, LOWEST cosine — the
    in-class example the model most confuses) and the HARD negative
    (different label, HIGHEST cosine — the out-of-class example closest
    to the anchor). The triplet/InfoNCE data-prep step of an embedding
    training pipeline.

    Scale shape: anchors broadcast (a deterministic 1-in-25 sample),
    the corpus streams once through the scoring product with norms
    hoisted per-row; selection is ONE aggregation with min/max over
    (cos, ±cid) structs — no window, no per-anchor shuffle. At corpus
    scale the exact product swaps for candidate generation via qe03
    LSH/qe04 IVF while this selection logic is unchanged; the exact
    form doubles as the recall oracle for those.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") % CONTRASTIVE_QUERY_MOD == 0).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("qlab"),
        F.col("embedding").alias("qe"),
        norm(F.col("embedding")).alias("_qnorm"),
    )
    c = emb.select(
        F.col("vec_id").alias("cid"),
        F.col("label").alias("clab"),
        F.col("embedding").alias("ce"),
        norm(F.col("embedding")).alias("_cnorm"),
    )
    pairs = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("cid") != F.col("qid"))
        .select(
            "qid",
            "qlab",
            "cid",
            "clab",
            F.round(
                dot(F.col("qe"), F.col("ce")) / (F.col("_qnorm") * F.col("_cnorm")), 6
            ).alias("cos_sim"),
        )
    )
    same = F.col("clab") == F.col("qlab")
    picked = pairs.groupBy("qid", "qlab").agg(
        # min struct: lowest cos, then lowest cid — the hard positive
        F.min(F.when(same, F.struct(F.col("cos_sim"), F.col("cid")))).alias("pos"),
        # max struct with negated cid: highest cos, ties -> lowest cid
        F.max(
            F.when(~same, F.struct(F.col("cos_sim"), (-F.col("cid")).alias("ncid")))
        ).alias("neg"),
    )
    return picked.select(
        "qid",
        F.col("qlab").cast("long").alias("q_label"),
        F.col("pos.cid").alias("pos_id"),
        F.col("pos.cos_sim").alias("pos_sim"),
        (-F.col("neg.ncid")).alias("neg_id"),
        F.col("neg.cos_sim").alias("neg_sim"),
    )


# ---------------------------------------------------------------------------
# qe12: maximum-inner-product search (MIPS) top-k
# ---------------------------------------------------------------------------


@register(
    "qe12_mips_topk",
    tags=("similarity",),
    oracle="""
WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
           WHERE vec_id % 60 = 0),
c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings),
pairs AS (
  SELECT qid, cid,
         ROUND((SELECT SUM(a * b) FROM (SELECT unnest(qe)::DOUBLE AS a,
                                               unnest(ce)::DOUBLE AS b)), 6) AS ip
  FROM c, q WHERE cid <> qid),
ranked AS (
  SELECT qid, cid, ip,
         CAST(ROW_NUMBER() OVER (PARTITION BY qid
              ORDER BY ip DESC, cid) AS BIGINT) AS rank
  FROM pairs)
SELECT qid, cid, ip, rank FROM ranked WHERE rank <= 5
""",
)
def qe12_mips_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum-inner-product search (the retrieval scoring for learned
    two-tower embeddings, where vector NORM carries signal — item
    popularity — so cosine's normalization is WRONG): exact
    inner-product top-5 for a 1-in-60 anchor sample.

    Same broadcast-product scan as qe01 minus the norm division. The
    scale path: MIPS reduces to cosine ANN via the norm-augmentation
    transform (Shrivastava & Li 2014 — append sqrt(M² − |x|²) to each
    item, 0 to each query; then cosine order == inner-product order),
    after which qe03's LSH buckets or qe04's IVF cells apply
    unchanged; tests/test_similarity.py::test_mips_norm_augmentation_
    preserves_order asserts the reduction's order-equivalence on the
    real embeddings, so this exact form doubles as that path's recall
    oracle.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") % 60 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    c = emb.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("ce"))
    pairs = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("cid") != F.col("qid"))
        .select(
            "qid",
            "cid",
            F.round(dot(F.col("qe"), F.col("ce")), 6).alias("ip"),
        )
    )
    wr = W.partitionBy("qid").orderBy(F.desc("ip"), "cid")
    return pairs.select(
        "qid", "cid", "ip", F.row_number().over(wr).cast("long").alias("rank")
    ).where(F.col("rank") <= 5)


# ---------------------------------------------------------------------------
# qe13: ANN recall audit as a first-class query (LSH vs exact ground truth)
# ---------------------------------------------------------------------------


def _recall_oracle(k: int = 5) -> str:
    return f"""
WITH {lsh_bucket_ctes()},
cand AS (
  SELECT DISTINCT q.vec_id AS qid, c.vec_id AS cid
  FROM buck q JOIN buck c ON q.t = c.t AND q.b = c.b
  WHERE q.vec_id < 8 AND c.vec_id <> q.vec_id),
ann_pairs AS (
  SELECT cand.qid, cand.cid,
         (SELECT SUM(a * b) FROM (SELECT unnest(eq.embedding)::DOUBLE AS a,
                                         unnest(ec.embedding)::DOUBLE AS b)) AS dp,
         (SELECT SUM(a * a) FROM (SELECT unnest(eq.embedding)::DOUBLE AS a)) AS nq,
         (SELECT SUM(b * b) FROM (SELECT unnest(ec.embedding)::DOUBLE AS b)) AS nc
  FROM cand
  JOIN embeddings eq ON cand.qid = eq.vec_id
  JOIN embeddings ec ON cand.cid = ec.vec_id),
ann_topk AS (
  SELECT qid, cid FROM (
    SELECT qid, cid,
           ROW_NUMBER() OVER (PARTITION BY qid
             ORDER BY ROUND(dp / (SQRT(nq) * SQRT(nc)), 6) DESC, cid) AS rnk
    FROM ann_pairs) WHERE rnk <= {k}),
ex_pairs AS (
  SELECT q.vec_id AS qid, c.vec_id AS cid,
         (SELECT SUM(a * b) FROM (SELECT unnest(q.embedding)::DOUBLE AS a,
                                         unnest(c.embedding)::DOUBLE AS b)) AS dp,
         (SELECT SUM(a * a) FROM (SELECT unnest(q.embedding)::DOUBLE AS a)) AS nq,
         (SELECT SUM(b * b) FROM (SELECT unnest(c.embedding)::DOUBLE AS b)) AS nc
  FROM embeddings c, embeddings q
  WHERE q.vec_id < 8 AND c.vec_id <> q.vec_id),
ex_topk AS (
  SELECT qid, cid FROM (
    SELECT qid, cid,
           ROW_NUMBER() OVER (PARTITION BY qid
             ORDER BY ROUND(dp / (SQRT(nq) * SQRT(nc)), 6) DESC, cid) AS rnk
    FROM ex_pairs) WHERE rnk <= {k})
SELECT e.qid,
       CAST(COUNT(a.cid) AS BIGINT) AS n_hits,
       ROUND(COUNT(a.cid) / {k}.0, 6) AS recall
FROM ex_topk e
LEFT JOIN ann_topk a ON e.qid = a.qid AND e.cid = a.cid
GROUP BY e.qid
"""


@register("qe13_ann_recall_audit", tags=("similarity", "approx", "monitoring"), oracle=_recall_oracle())
def qe13_ann_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the qe03 LSH ANN path against the qe01 exact
    ground truth, per query — the index-quality monitor a serving
    pipeline runs after every index rebuild (dropping recall means
    the hyperplane tables no longer fit the data distribution), here
    promoted from a pytest band (tests/test_similarity.py) to a
    first-class driver-verified query.

    Scale shape: both sides reuse their registered lineages (bucketed
    candidates for ANN; broadcast-anchor exact scan for the small
    ground-truth query set — exact ground truth is only ever computed
    for the audited sample, never the corpus); the audit itself is a
    (qid, cid)-keyed left join of two k-row-per-query relations.
    """
    exact = qe01_cosine_topk(spark, sf_dir).select("qid", "cid")
    ann = qe03_ann_lsh_topk(spark, sf_dir).select(
        "qid", F.col("cid").alias("ann_cid")
    )
    joined = exact.join(
        ann,
        (exact["qid"] == ann["qid"]) & (exact["cid"] == ann["ann_cid"]),
        "left",
    ).select(exact["qid"].alias("qid"), "ann_cid")
    return joined.groupBy("qid").agg(
        F.count("ann_cid").alias("n_hits"),
        F.round(F.count("ann_cid") / 5.0, 6).alias("recall"),
    )


# ---------------------------------------------------------------------------
# qe14: embedding-space drift between snapshots (index-health monitor)
# ---------------------------------------------------------------------------

EMB_DRIFT_EDGE_U = 100_000  # integer micro-unit shift flag (0.1 in L2)


@register(
    "qe14_embedding_drift",
    tags=("similarity", "monitoring", "drift"),
    oracle=f"""
WITH dims AS (
  SELECT label, vec_id % 2 AS half, u.pos, u.x::DOUBLE AS x
  FROM embeddings,
       LATERAL (SELECT unnest(embedding) AS x,
                       generate_subscripts(embedding, 1) AS pos) u),
cent AS (
  SELECT label, half, pos, ROUND(AVG(x), 6) AS cx
  FROM dims GROUP BY label, half, pos),
paired AS (
  SELECT a.label, a.pos, a.cx AS ax, b.cx AS bx
  FROM cent a JOIN cent b
    ON a.label = b.label AND a.pos = b.pos AND a.half = 0 AND b.half = 1),
shift AS (
  SELECT label,
         CAST(SUM(CAST(ROUND((ax - bx) * (ax - bx) * 1000000) AS BIGINT))
              AS BIGINT) AS d2_us
  FROM paired GROUP BY label)
SELECT CAST(label AS BIGINT) AS label, d2_us,
       CAST(d2_us > {EMB_DRIFT_EDGE_U} AS BIGINT) AS drifted
FROM shift
""",
)
def qe14_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space drift between two snapshot halves (vec_id
    parity stands in for model-version A/B): per label, the squared
    L2 shift between the halves' centroids — the vector-index health
    check run after re-embedding a corpus, because a centroid that
    moved means LSH hyperplanes/IVF cells/PQ codebooks trained on the
    old space (qe03/qe04/qe06) are stale and recall will silently
    sag (exactly what qe13 then measures).

    Scale shape: qe02's posexplode-to-(label, half, dim) partial-mean
    reduction — the |vectors|×dim stream shuffles once into
    |labels|·2·dim narrow rows; per-dim squared deltas round to
    integer micro-units before the final sum (qe06's rule) so the
    drift statistic is an exact integer cross-engine.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    dims = emb.select(
        F.col("label").cast("long").alias("label"),
        (F.col("vec_id") % 2).alias("half"),
        F.posexplode("embedding").alias("pos", "x"),
    ).select("label", "half", "pos", F.col("x").cast("double").alias("x"))
    cent = dims.groupBy("label", "half", "pos").agg(
        F.round(F.avg("x"), 6).alias("cx")
    )
    a = cent.where(F.col("half") == 0).select(
        "label", "pos", F.col("cx").alias("ax")
    )
    b = cent.where(F.col("half") == 1).select(
        "label", "pos", F.col("cx").alias("bx")
    )
    shift = (
        a.join(b, ["label", "pos"])
        .select(
            "label",
            F.round((F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx")) * 1_000_000)
            .cast("long")
            .alias("du"),
        )
        .groupBy("label")
        .agg(F.sum("du").cast("long").alias("d2_us"))
    )
    return shift.select(
        "label", "d2_us", (F.col("d2_us") > EMB_DRIFT_EDGE_U).cast("long").alias("drifted")
    )


# ---------------------------------------------------------------------------
# qe15: greedy k-center coreset selection (diverse-subset data pruning)
# ---------------------------------------------------------------------------

KCENTER_K = 5
_KC_SEED_ID = 0  # deterministic seed: the lowest vec_id


def _kc_d2_sql(alias_p: str, alias_c: str) -> str:
    """Integer micro-unit squared L2 distance between two embedding
    columns (per-dim ROUND before the sum — qe06's exactness rule)."""
    return f"""(SELECT CAST(SUM(CAST(ROUND((a - b) * (a - b) * 1000000)
                                 AS BIGINT)) AS BIGINT)
  FROM (SELECT unnest({alias_p}.embedding)::DOUBLE AS a,
               unnest({alias_c}.embedding)::DOUBLE AS b))"""


def _kcenter_oracle(k: int = KCENTER_K) -> str:
    # round r picks argmax over points of min distance to centers 0..r-1
    ctes = [f"c0 AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id = {_KC_SEED_ID})"]
    prev = ["c0"]
    for r in range(1, k):
        mind = "LEAST(" + ", ".join(
            _kc_d2_sql("p", c) for c in prev
        ) + ")" if len(prev) > 1 else _kc_d2_sql("p", prev[0])
        ctes.append(
            f"""c{r} AS (
  SELECT p.vec_id, p.embedding
  FROM embeddings p, {", ".join(prev)}
  WHERE p.vec_id NOT IN ({", ".join(f"{c}.vec_id" for c in prev)})
  ORDER BY {mind} DESC, p.vec_id LIMIT 1)"""
        )
        prev.append(f"c{r}")
    selects = []
    for r, c in enumerate(prev):
        if r == 0:
            md = "CAST(NULL AS BIGINT)"
        else:
            others = prev[:r]
            md = "LEAST(" + ", ".join(
                _kc_d2_sql(c, o) for o in others
            ) + ")" if len(others) > 1 else _kc_d2_sql(c, others[0])
        selects.append(
            f"SELECT CAST({r} AS BIGINT) AS center_rank, {c}.vec_id,"
            f" {md} AS sep_us FROM {', '.join(prev[: r + 1])}"
        )
    return ",\n".join(["WITH " + ctes[0]] + ctes[1:]) + "\n" + "\nUNION ALL\n".join(selects)


@register("qe15_kcenter_coreset", tags=("similarity", "sampling", "iterative"), oracle=_kcenter_oracle())
def qe15_kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center coreset selection — the diverse-subset data-
    pruning recipe (the farthest-point heuristic behind coreset/
    active-learning selection): start from a deterministic seed and
    repeatedly add the point FARTHEST from everything chosen so far,
    giving a 2-approximation of the optimal k-center cover. Output:
    the 5 chosen exemplars with each one's separation from the
    previously chosen set (its min integer-µ squared distance).

    Scale shape: each round is one scan of the corpus against the
    ≤k-row broadcast center set (min-of-k distances map-side, qe06's
    per-dim integer-µ rounding so the argmax is exact), reduced by a
    single max-of-struct aggregate; the driver receives ONE row per
    round (k rows total — bounded like qd08's convergence probe, not
    a data collect). k rounds = k scans; at 100 TB swap the full scan
    for qe04's IVF routing per round — the selection rule is
    unchanged.
    """
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    chosen: list = [
        emb.where(F.col("vec_id") == _KC_SEED_ID).first()
    ]
    out = [(0, _KC_SEED_ID, None)]

    def d2_us(vec: list) -> Column:
        arr = F.array(*[F.lit(float(x)) for x in vec])
        return F.aggregate(
            F.zip_with(
                F.col("embedding").cast("array<double>"),
                arr,
                lambda a, b: F.round((a - b) * (a - b) * 1_000_000).cast("long"),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    for r in range(1, KCENTER_K):
        mind = F.least(*[d2_us(list(c.embedding)) for c in chosen]) if len(chosen) > 1 else d2_us(list(chosen[0].embedding))
        cand = (
            emb.where(~F.col("vec_id").isin([int(c.vec_id) for c in chosen]))
            .select("vec_id", "embedding", mind.alias("mind"))
        )
        best = cand.orderBy(F.desc("mind"), "vec_id").limit(1).first()
        chosen.append(best)
        out.append((r, int(best.vec_id), int(best.mind)))
    return spark.createDataFrame(
        out, "center_rank long, vec_id long, sep_us long"
    )


# ---------------------------------------------------------------------------
# qe16: ANN ranking quality as graded nDCG@5 (beyond set recall)
# ---------------------------------------------------------------------------

NDCG_POOL = 20  # graded relevance pool: exact top-20


def _ndcg_oracle(k: int = 5, pool: int = NDCG_POOL) -> str:
    return f"""
WITH {lsh_bucket_ctes()},
cand AS (
  SELECT DISTINCT q.vec_id AS qid, c.vec_id AS cid
  FROM buck q JOIN buck c ON q.t = c.t AND q.b = c.b
  WHERE q.vec_id < 8 AND c.vec_id <> q.vec_id),
ann_pairs AS (
  SELECT cand.qid, cand.cid,
         (SELECT SUM(a * b) FROM (SELECT unnest(eq.embedding)::DOUBLE AS a,
                                         unnest(ec.embedding)::DOUBLE AS b)) AS dp,
         (SELECT SUM(a * a) FROM (SELECT unnest(eq.embedding)::DOUBLE AS a)) AS nq,
         (SELECT SUM(b * b) FROM (SELECT unnest(ec.embedding)::DOUBLE AS b)) AS nc
  FROM cand
  JOIN embeddings eq ON cand.qid = eq.vec_id
  JOIN embeddings ec ON cand.cid = ec.vec_id),
ann_topk AS (
  SELECT qid, cid, rnk AS pos FROM (
    SELECT qid, cid,
           ROW_NUMBER() OVER (PARTITION BY qid
             ORDER BY ROUND(dp / (SQRT(nq) * SQRT(nc)), 6) DESC, cid) AS rnk
    FROM ann_pairs) WHERE rnk <= {k}),
ex_pairs AS (
  SELECT q.vec_id AS qid, c.vec_id AS cid,
         (SELECT SUM(a * b) FROM (SELECT unnest(q.embedding)::DOUBLE AS a,
                                         unnest(c.embedding)::DOUBLE AS b)) AS dp,
         (SELECT SUM(a * a) FROM (SELECT unnest(q.embedding)::DOUBLE AS a)) AS nq,
         (SELECT SUM(b * b) FROM (SELECT unnest(c.embedding)::DOUBLE AS b)) AS nc
  FROM embeddings c, embeddings q
  WHERE q.vec_id < 8 AND c.vec_id <> q.vec_id),
ex_pool AS (
  SELECT qid, cid, rnk FROM (
    SELECT qid, cid,
           ROW_NUMBER() OVER (PARTITION BY qid
             ORDER BY ROUND(dp / (SQRT(nq) * SQRT(nc)), 6) DESC, cid) AS rnk
    FROM ex_pairs) WHERE rnk <= {pool}),
dcg AS (
  SELECT a.qid,
         CAST(SUM(CAST(ROUND(COALESCE({pool + 1} - e.rnk, 0)
                             / ln(a.pos + 1) * ln(2) * 1000000)
                       AS BIGINT)) AS BIGINT) AS dcg_us
  FROM ann_topk a LEFT JOIN ex_pool e ON a.qid = e.qid AND a.cid = e.cid
  GROUP BY a.qid),
idcg AS (
  SELECT qid,
         CAST(SUM(CAST(ROUND(({pool + 1} - rnk)
                             / ln(rnk + 1) * ln(2) * 1000000)
                       AS BIGINT)) AS BIGINT) AS idcg_us
  FROM ex_pool WHERE rnk <= {k} GROUP BY qid)
SELECT d.qid, d.dcg_us, i.idcg_us,
       ROUND(CAST(d.dcg_us AS DOUBLE) / i.idcg_us, 6) AS ndcg
FROM dcg d JOIN idcg i USING (qid)
"""


@register("qe16_ann_ndcg", tags=("similarity", "approx", "monitoring"), oracle=_ndcg_oracle())
def qe16_ann_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graded ranking quality of the LSH ANN path: nDCG@5 per query
    against the exact cosine ordering — set recall (qe13) treats all
    five neighbors equally; nDCG also penalizes returning the right
    neighbors in the wrong ORDER and partially credits near-misses
    from the exact top-20 pool (gain = 21 − exact_rank, the graded-
    relevance standard).

    Determinism: per-position discounted gains round to integer
    micro-units BEFORE summing (gain/log2(pos+1) — the only float —
    is identical-input/identical-expression in both engines, qa02's
    rule), so DCG and ideal-DCG are exact integers and nDCG is their
    6-dp ratio. Scale shape: both rankings reuse their registered
    lineages; the metric itself is a (qid, cid)-keyed left join of
    k-row-per-query relations plus one fold to query grain.
    """
    ann = qe03_ann_lsh_topk(spark, sf_dir).select(
        "qid", "cid", F.col("rank").alias("pos")
    )
    exact = cosine_topk(
        load_table(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") < 8)
        .select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")),
        load_table(spark, sf_dir, "embeddings").select(
            F.col("vec_id").alias("cid"), F.col("embedding").alias("ce")
        ),
        k=NDCG_POOL,
    ).select("qid", "cid", F.col("rank").alias("ex_rank"))
    ln2 = 0.6931471805599453
    gain = F.coalesce(F.lit(NDCG_POOL + 1) - F.col("ex_rank"), F.lit(0))
    dcg = (
        ann.join(exact, ["qid", "cid"], "left")
        .select(
            "qid",
            F.round(gain / F.log(F.col("pos") + 1) * ln2 * 1_000_000)
            .cast("long")
            .alias("du"),
        )
        .groupBy("qid")
        .agg(F.sum("du").cast("long").alias("dcg_us"))
    )
    idcg = (
        exact.where(F.col("ex_rank") <= 5)
        .select(
            "qid",
            F.round(
                (F.lit(NDCG_POOL + 1) - F.col("ex_rank"))
                / F.log(F.col("ex_rank") + 1)
                * ln2
                * 1_000_000
            )
            .cast("long")
            .alias("du"),
        )
        .groupBy("qid")
        .agg(F.sum("du").cast("long").alias("idcg_us"))
    )
    return dcg.join(idcg, "qid").select(
        "qid",
        "dcg_us",
        "idcg_us",
        F.round(F.col("dcg_us").cast("double") / F.col("idcg_us"), 6).alias("ndcg"),
    )


# ---------------------------------------------------------------------------
# qe17: hybrid-retrieval reciprocal-rank fusion (dense cosine ⊕ MIP)
# ---------------------------------------------------------------------------

RRF_K = 60          # the standard RRF smoothing constant
RRF_CHANNEL_K = 20  # per-channel candidate depth
RRF_OUT_K = 5       # fused results per query
RRF_N_QUERIES = 8


@register(
    "qe17_hybrid_rrf",
    bench=True,
    tags=("similarity", "retrieval"),
    oracle=f"""
WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
           WHERE vec_id < {RRF_N_QUERIES}),
c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings),
pairs AS (
  SELECT qid, cid,
         (SELECT SUM(a * b) FROM (SELECT unnest(qe)::DOUBLE AS a,
                                         unnest(ce)::DOUBLE AS b)) AS dp,
         (SELECT SUM(a * a) FROM (SELECT unnest(qe)::DOUBLE AS a)) AS nq,
         (SELECT SUM(b * b) FROM (SELECT unnest(ce)::DOUBLE AS b)) AS nc
  FROM c, q WHERE cid <> qid),
scored AS (
  SELECT qid, cid,
         ROUND(dp / (SQRT(nq) * SQRT(nc)), 6) AS cos_sim,
         ROUND(dp, 6) AS mip
  FROM pairs),
ranked AS (
  SELECT qid, cid,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos_sim DESC, cid)
           AS cos_rank,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY mip DESC, cid)
           AS mip_rank
  FROM scored),
fused AS (
  SELECT qid, cid,
         CASE WHEN cos_rank <= {RRF_CHANNEL_K} THEN cos_rank ELSE 0 END
           AS cos_rank,
         CASE WHEN mip_rank <= {RRF_CHANNEL_K} THEN mip_rank ELSE 0 END
           AS mip_rank,
         (CASE WHEN cos_rank <= {RRF_CHANNEL_K}
               THEN 1000000 // ({RRF_K} + cos_rank) ELSE 0 END)
         + (CASE WHEN mip_rank <= {RRF_CHANNEL_K}
                 THEN 1000000 // ({RRF_K} + mip_rank) ELSE 0 END) AS rrf_ppm
  FROM ranked),
final AS (
  SELECT qid, cid, cos_rank, mip_rank, rrf_ppm,
         CAST(ROW_NUMBER() OVER (PARTITION BY qid
              ORDER BY rrf_ppm DESC, cid) AS BIGINT) AS rank
  FROM fused WHERE rrf_ppm > 0)
SELECT qid, cid, CAST(cos_rank AS BIGINT) AS cos_rank,
       CAST(mip_rank AS BIGINT) AS mip_rank,
       CAST(rrf_ppm AS BIGINT) AS rrf_ppm, rank
FROM final WHERE rank <= {RRF_OUT_K}
""",
)
def qe17_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid-retrieval rank fusion (L3 serving capstone): two
    retrieval channels — normalized cosine (semantic closeness) and
    raw inner product (norm-weighted relevance, the two-tower scorer
    qe12 serves) — each contribute their top-20, fused per query by
    reciprocal-rank fusion: score = Σ 1/(60 + rank). RRF is the
    standard way production search merges dense + lexical + recency
    channels without calibrating incomparable scores.

    Scale shape (100 TB): both channels share ONE scoring pass over
    the corpus (the dot-product fold is computed once; cosine and MIP
    derive from it), so fusion costs zero extra scans and ZERO joins —
    the two per-channel ranks are two windows over the SAME qid
    partitioning (one Exchange, two sorts), and the fused order is a
    third. In serving, each channel's top-k comes from its own index
    (qe03's LSH / qe04's IVF); fusion stays this same per-qid
    rank-merge, over k·channels rows per query, not the corpus.

    Determinism: channel ranks are integers from 6dp-rounded scores
    with cid tiebreaks; RRF contributions are integer 10⁶ div (60+r);
    the fused order is (rrf_ppm DESC, cid) — bit-exact cross-engine.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < RRF_N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    ).withColumn("_qnorm", norm(F.col("qe")))
    c = emb.select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("ce")
    ).withColumn("_cnorm", norm(F.col("ce")))
    # dp is hoisted through its own projection so the fold runs ONCE
    # per pair — inlining it into both outputs would make Catalyst
    # evaluate the zip_with/aggregate lambda twice (plan-verified:
    # 3 aggregate() occurrences = 2 norms + 1 dot, not 4)
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("cid") != F.col("qid"))
        .select(
            "qid",
            "cid",
            "_qnorm",
            "_cnorm",
            dot(F.col("qe"), F.col("ce")).alias("dp"),
        )
        .select(
            "qid",
            "cid",
            F.round(
                F.col("dp") / (F.col("_qnorm") * F.col("_cnorm")), 6
            ).alias("cos_sim"),
            F.round("dp", 6).alias("mip"),
        )
    )
    wc = W.partitionBy("qid").orderBy(F.desc("cos_sim"), "cid")
    wm = W.partitionBy("qid").orderBy(F.desc("mip"), "cid")
    ranked = scored.select(
        "qid",
        "cid",
        F.row_number().over(wc).alias("cr"),
        F.row_number().over(wm).alias("mr"),
    )
    fused = ranked.select(
        "qid",
        "cid",
        F.when(F.col("cr") <= RRF_CHANNEL_K, F.col("cr"))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("cos_rank"),
        F.when(F.col("mr") <= RRF_CHANNEL_K, F.col("mr"))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("mip_rank"),
        (
            F.when(
                F.col("cr") <= RRF_CHANNEL_K,
                F.expr(f"1000000 div ({RRF_K} + cr)"),
            ).otherwise(F.lit(0))
            + F.when(
                F.col("mr") <= RRF_CHANNEL_K,
                F.expr(f"1000000 div ({RRF_K} + mr)"),
            ).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("rrf_ppm"),
    ).filter(F.col("rrf_ppm") > 0)
    wf = W.partitionBy("qid").orderBy(F.desc("rrf_ppm"), "cid")
    return (
        fused.select(
            "*", F.row_number().over(wf).cast("long").alias("rank")
        )
        .filter(F.col("rank") <= RRF_OUT_K)
    )


# ---------------------------------------------------------------------------
# qe18: cluster↔label confusion matrix with per-label precision/recall/F1
# ---------------------------------------------------------------------------


@register(
    "qe18_cluster_confusion",
    tags=("similarity", "clustering", "eval"),
    oracle=f"""
WITH {km_assign_ctes()},
labeled AS (
  SELECT a.vec_id, a.code, CAST(e.label AS BIGINT) AS label
  FROM assign a JOIN embeddings e ON e.vec_id = a.vec_id),
counts AS (
  SELECT code, label, CAST(COUNT(*) AS BIGINT) AS n
  FROM labeled GROUP BY code, label),
mapping AS (
  SELECT code, label AS pred_label FROM (
    SELECT code, label,
           ROW_NUMBER() OVER (PARTITION BY code ORDER BY n DESC, label) AS rnk
    FROM counts) t WHERE rnk = 1),
joined AS (
  SELECT c.code, c.label, c.n, m.pred_label
  FROM counts c JOIN mapping m ON m.code = c.code),
truth AS (
  SELECT label, CAST(SUM(n) AS BIGINT) AS n_true,
         CAST(SUM(CASE WHEN pred_label = label THEN n ELSE 0 END) AS BIGINT)
           AS tp
  FROM joined GROUP BY label),
pred AS (
  SELECT pred_label AS label, CAST(SUM(n) AS BIGINT) AS n_pred
  FROM joined GROUP BY pred_label),
metrics AS (
  SELECT t.label, t.n_true, COALESCE(p.n_pred, 0) AS n_pred, t.tp,
         CASE WHEN COALESCE(p.n_pred, 0) > 0
              THEN (t.tp * 1000000) // p.n_pred ELSE 0 END AS precision_ppm,
         CASE WHEN t.n_true > 0
              THEN (t.tp * 1000000) // t.n_true ELSE 0 END AS recall_ppm
  FROM truth t LEFT JOIN pred p ON p.label = t.label)
SELECT label, n_true, CAST(n_pred AS BIGINT) AS n_pred, tp,
       CAST(precision_ppm AS BIGINT) AS precision_ppm,
       CAST(recall_ppm AS BIGINT) AS recall_ppm,
       CAST(CASE WHEN precision_ppm + recall_ppm > 0
                 THEN (2 * precision_ppm * recall_ppm)
                      // (precision_ppm + recall_ppm)
                 ELSE 0 END AS BIGINT) AS f1_ppm
FROM metrics
""",
)
def qe18_cluster_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clustering-vs-ground-truth evaluation (the model-eval closure
    of the k-means family): map each cluster to its majority label,
    then report per-label support, mapped-prediction count, true
    positives, and precision/recall/F1 in integer ppm — the confusion
    readout that says WHICH classes the unsupervised structure
    recovers, where qe08's purity says only how much.

    Scale shape (100 TB): consumes the ONE shared materialized
    k-means assignment (kmeans_assign_shared — no recompute), reduces
    it to the K×L confusion relation in one aggregation, and every
    later step (majority argmax, metric folds) runs on that tiny
    relation. Integer cross-multiplied ppm metrics — no float
    division crosses the engine boundary.
    """
    # round 16: parallelize=False — this load feeds the SHARED k-means
    # assignment memo (kmeans_assign_shared); a repartitioned input both
    # forks the memo key and leaves the tiny checkpointed assignment in
    # 32 partitions, which cost every downstream consumer ~0.3-0.4 s of
    # empty-task stages (paired min-of-5: qe08 0.59x, qp03 0.65x).
    emb = load_table(spark, sf_dir, "embeddings", parallelize=False)
    assign = kmeans_assign_shared(emb)
    labeled = assign.join(
        emb.select("vec_id", F.col("label").cast("long").alias("label")),
        "vec_id",
    )
    counts = labeled.groupBy("code", "label").agg(F.count(F.lit(1)).alias("n"))
    mapping = counts.groupBy("code").agg(
        F.min(F.struct((-F.col("n")).alias("neg_n"), F.col("label"))).alias("m")
    ).select("code", F.col("m.label").alias("pred_label"))
    joined = counts.join(F.broadcast(mapping), "code")
    truth = joined.groupBy("label").agg(
        F.sum("n").alias("n_true"),
        F.sum(F.when(F.col("pred_label") == F.col("label"), F.col("n")).otherwise(0))
        .alias("tp"),
    )
    pred = joined.groupBy(F.col("pred_label").alias("label")).agg(
        F.sum("n").alias("n_pred")
    )
    metrics = (
        truth.join(pred, "label", "left")
        .select(
            "label",
            "n_true",
            F.coalesce(F.col("n_pred"), F.lit(0)).cast("long").alias("n_pred"),
            "tp",
        )
        .select(
            "*",
            F.when(
                F.col("n_pred") > 0, F.expr("(tp * 1000000) div n_pred")
            ).otherwise(F.lit(0)).cast("long").alias("precision_ppm"),
            F.when(
                F.col("n_true") > 0, F.expr("(tp * 1000000) div n_true")
            ).otherwise(F.lit(0)).cast("long").alias("recall_ppm"),
        )
    )
    return metrics.select(
        "*",
        F.when(
            F.col("precision_ppm") + F.col("recall_ppm") > 0,
            F.expr(
                "(2 * precision_ppm * recall_ppm)"
                " div (precision_ppm + recall_ppm)"
            ),
        ).otherwise(F.lit(0)).cast("long").alias("f1_ppm"),
    )


# ---------------------------------------------------------------------------
# qr01: hybrid search — sparse BM25 ⊕ dense cosine, RRF-fused (the capstone)
# ---------------------------------------------------------------------------

HYB_QUERY_VEC = 0   # dense query: embedding of vec_id 0 (excluded as a hit)
HYB_CHANNEL_K = 20
HYB_OUT_K = 10


@register(
    "qr01_hybrid_search",
    bench=True,
    tags=("retrieval", "similarity", "text"),
    oracle=f"""
WITH docs AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split(lower(text), ' '), x -> x <> ''))
              AS BIGINT) AS dl,
         list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
  FROM documents WHERE doc_id <> {HYB_QUERY_VEC}),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(dl) AS BIGINT) AS sum_dl
  FROM docs),
tf AS (
  SELECT doc_id, dl, term, CAST(COUNT(*) AS BIGINT) AS tf FROM (
    SELECT doc_id, dl, unnest(toks) AS term FROM docs) u
  WHERE term IN ('join', 'vector', 'stream')
  GROUP BY doc_id, dl, term),
dfreq AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
sparse AS (
  SELECT tf.doc_id,
         CAST(SUM(CAST(ROUND(
           ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1)
           * (tf.tf * CAST(2.2 AS DOUBLE))
           / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * tf.dl
              / (CAST(s.sum_dl AS DOUBLE) / s.n_docs)))
           * 1000000) AS BIGINT)) AS BIGINT) AS score_us
  FROM tf JOIN dfreq d USING (term) CROSS JOIN stats s
  GROUP BY tf.doc_id),
sparse_ranked AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (ORDER BY score_us DESC, doc_id) AS r
  FROM sparse),
qv AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = {HYB_QUERY_VEC}),
dense AS (
  SELECT e.vec_id AS doc_id,
         ROUND((SELECT SUM(a * b) FROM (SELECT unnest(qv.qe)::DOUBLE AS a,
                                               unnest(e.embedding)::DOUBLE AS b))
               / (SQRT((SELECT SUM(a * a) FROM (SELECT unnest(qv.qe)::DOUBLE AS a)))
                  * SQRT((SELECT SUM(b * b)
                          FROM (SELECT unnest(e.embedding)::DOUBLE AS b)))), 6)
           AS cos_sim
  FROM embeddings e CROSS JOIN qv WHERE e.vec_id <> {HYB_QUERY_VEC}),
dense_ranked AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (ORDER BY cos_sim DESC, doc_id) AS r
  FROM dense),
fused AS (
  SELECT COALESCE(s.doc_id, d.doc_id) AS doc_id,
         COALESCE(CASE WHEN s.r <= {HYB_CHANNEL_K} THEN s.r END, 0)
           AS bm25_rank,
         COALESCE(CASE WHEN d.r <= {HYB_CHANNEL_K} THEN d.r END, 0)
           AS dense_rank,
         COALESCE(CASE WHEN s.r <= {HYB_CHANNEL_K}
                       THEN 1000000 // ({RRF_K} + s.r) END, 0)
         + COALESCE(CASE WHEN d.r <= {HYB_CHANNEL_K}
                         THEN 1000000 // ({RRF_K} + d.r) END, 0) AS rrf_ppm
  FROM sparse_ranked s FULL OUTER JOIN dense_ranked d USING (doc_id)),
final AS (
  SELECT doc_id, CAST(bm25_rank AS BIGINT) AS bm25_rank,
         CAST(dense_rank AS BIGINT) AS dense_rank,
         CAST(rrf_ppm AS BIGINT) AS rrf_ppm,
         CAST(ROW_NUMBER() OVER (ORDER BY rrf_ppm DESC, doc_id) AS BIGINT)
           AS rank
  FROM fused WHERE rrf_ppm > 0)
SELECT doc_id, bm25_rank, dense_rank, rrf_ppm, rank
FROM final WHERE rank <= {HYB_OUT_K}
""",
)
def qr01_hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid search end-to-end (the retrieval capstone composing the
    two stacks this engine builds): the SPARSE channel scores
    documents with qt17's Lucene BM25 over the query terms; the DENSE
    channel scores the aligned embeddings (qm05's doc_id = vec_id
    contract) by cosine against a query vector; reciprocal-rank
    fusion merges the two top-20 lists — the architecture behind
    every production "semantic + keyword" search box, with qt19's
    inverted index and qe03's ANN as the stated index-serving forms
    of each channel.

    Determinism: BM25 per-term scores are integer micro-units summed
    per doc (qt17's recipe) and ranked with doc_id tiebreaks; cosine
    rounds to 6dp (qe01's recipe); RRF contributions are integer
    10⁶ div (60+rank) — the fused order compares exact integers.

    Scale shape (100 TB): each channel keeps its own proven shape
    (BM25: query-term filter BEFORE the tf shuffle, KB-scale stat
    broadcasts; dense: one broadcast-query scoring pass). Each
    channel's ranks come from distributed top-K (TakeOrderedAndProject
    — per-partition top-K then a K·partitions driver merge), so the
    only global window ever sees K rows and fusion full-outer-joins
    two K-row lists. Nothing quadratic, no corpus-sized global sort."""
    from event_stream_aggr_spark.operators.text import (
        BM25_B,
        BM25_K1,
        BM25_TERMS,
        tokenized_corpus,
    )

    # the memoized shared tokenize stage (one corpus scan per session
    # across qt17/qr01/qr02); the query-doc exclusion filters the
    # materialized relation — value-identical to filtering before
    docs = tokenized_corpus(spark, sf_dir).filter(
        F.col("doc_id") != HYB_QUERY_VEC
    )
    stats = docs.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    tf = (
        docs.select("doc_id", "dl", F.explode("toks").alias("term"))
        .filter(F.col("term").isin(*BM25_TERMS))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    score_us = F.round(
        F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1)
        * (F.col("tf") * (BM25_K1 + 1))
        / (F.col("tf") + BM25_K1 * (1 - BM25_B + BM25_B * F.col("dl") / avgdl))
        * 1000000
    ).cast("long")
    sparse = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", score_us.alias("su"))
        .groupBy("doc_id")
        .agg(F.sum("su").cast("long").alias("score_us"))
    )
    # distributed top-k BEFORE the rank window: orderBy().limit(K)
    # compiles to TakeOrderedAndProject (per-partition top-K, driver
    # merge of K·partitions candidates) so the global row_number only
    # ever sees K rows — the prior shape ranked the WHOLE corpus-sized
    # score relation through a single-partition window, the classic
    # global-sort bottleneck at scale. Value-identical: docs outside a
    # channel's top-K contributed 0 and were filtered by rrf_ppm > 0.
    sparse_top = sparse.orderBy(F.desc("score_us"), "doc_id").limit(HYB_CHANNEL_K)
    sparse_ranked = sparse_top.select(
        "doc_id",
        F.row_number()
        .over(W.orderBy(F.desc("score_us"), "doc_id"))
        .alias("sr"),
    )
    emb = load_table(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == HYB_QUERY_VEC).select(
        F.col("embedding").alias("qe")
    ).withColumn("_qnorm", norm(F.col("qe")))
    dense = (
        emb.filter(F.col("vec_id") != HYB_QUERY_VEC)
        .select(F.col("vec_id").alias("doc_id"), F.col("embedding").alias("ce"))
        .withColumn("_cnorm", norm(F.col("ce")))
        .crossJoin(F.broadcast(qv))
        .select(
            "doc_id",
            F.round(
                dot(F.col("qe"), F.col("ce"))
                / (F.col("_qnorm") * F.col("_cnorm")),
                6,
            ).alias("cos_sim"),
        )
    )
    dense_top = dense.orderBy(F.desc("cos_sim"), "doc_id").limit(HYB_CHANNEL_K)
    dense_ranked = dense_top.select(
        "doc_id",
        F.row_number()
        .over(W.orderBy(F.desc("cos_sim"), "doc_id"))
        .alias("dr"),
    )
    fused = (
        sparse_ranked.join(dense_ranked, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.coalesce(
                F.when(F.col("sr") <= HYB_CHANNEL_K, F.col("sr")), F.lit(0)
            ).cast("long").alias("bm25_rank"),
            F.coalesce(
                F.when(F.col("dr") <= HYB_CHANNEL_K, F.col("dr")), F.lit(0)
            ).cast("long").alias("dense_rank"),
            (
                F.coalesce(
                    F.when(
                        F.col("sr") <= HYB_CHANNEL_K,
                        F.expr(f"1000000 div ({RRF_K} + sr)"),
                    ),
                    F.lit(0),
                )
                + F.coalesce(
                    F.when(
                        F.col("dr") <= HYB_CHANNEL_K,
                        F.expr(f"1000000 div ({RRF_K} + dr)"),
                    ),
                    F.lit(0),
                )
            ).cast("long").alias("rrf_ppm"),
        )
        .filter(F.col("rrf_ppm") > 0)
    )
    return (
        fused.select(
            "*",
            F.row_number()
            .over(W.orderBy(F.desc("rrf_ppm"), "doc_id"))
            .cast("long")
            .alias("rank"),
        )
        .filter(F.col("rank") <= HYB_OUT_K)
    )


# ---------------------------------------------------------------------------
# qe19: MMR diversified re-ranking (relevance–diversity tradeoff)
# ---------------------------------------------------------------------------

MMR_QID = 0
MMR_POOL = 20
MMR_K = 3
MMR_LAMBDA_PPM = 500_000  # λ = 0.5


def _cos_us_sql(a: str, b: str) -> str:
    """Integer micro-unit cosine between two embedding relations'
    single rows (correlated subquery form, qe15's recipe)."""
    return f"""CAST(ROUND(
  (SELECT SUM(x * y) FROM (SELECT unnest({a}.embedding)::DOUBLE AS x,
                                  unnest({b}.embedding)::DOUBLE AS y))
  / (SQRT((SELECT SUM(x * x) FROM (SELECT unnest({a}.embedding)::DOUBLE AS x)))
     * SQRT((SELECT SUM(y * y) FROM (SELECT unnest({b}.embedding)::DOUBLE AS y))))
  * 1000000) AS BIGINT)"""


def _mmr_oracle() -> str:
    lam = MMR_LAMBDA_PPM
    inv = 1_000_000 - lam
    ctes = [
        f"q AS (SELECT embedding FROM embeddings WHERE vec_id = {MMR_QID})",
        f"""pool AS (
  SELECT p.vec_id, p.embedding, {_cos_us_sql('p', 'q')} AS rel_us
  FROM embeddings p, q WHERE p.vec_id <> {MMR_QID}
  ORDER BY {_cos_us_sql('p', 'q')} DESC, p.vec_id LIMIT {MMR_POOL})""",
        """m0 AS (
  SELECT vec_id, embedding, rel_us FROM pool
  ORDER BY rel_us DESC, vec_id LIMIT 1)""",
    ]
    prev = ["m0"]
    for r in range(1, MMR_K):
        maxsim = (
            "GREATEST(" + ", ".join(_cos_us_sql("p", m) for m in prev) + ")"
            if len(prev) > 1
            else _cos_us_sql("p", prev[0])
        )
        ctes.append(
            f"""m{r} AS (
  SELECT p.vec_id, p.embedding, p.rel_us
  FROM pool p, {", ".join(prev)}
  WHERE p.vec_id NOT IN ({", ".join(f"{m}.vec_id" for m in prev)})
  ORDER BY ({lam} * p.rel_us - {inv} * {maxsim}) // 1000000 DESC, p.vec_id
  LIMIT 1)"""
        )
        prev.append(f"m{r}")
    selects = []
    for r, m in enumerate(prev):
        if r == 0:
            mmr = f"{m}.rel_us"
        else:
            others = prev[:r]
            maxsim = (
                "GREATEST(" + ", ".join(_cos_us_sql(m, o) for o in others) + ")"
                if len(others) > 1
                else _cos_us_sql(m, others[0])
            )
            mmr = f"({lam} * {m}.rel_us - {inv} * {maxsim}) // 1000000"
        selects.append(
            f"SELECT CAST({r} AS BIGINT) AS mmr_rank, {m}.vec_id,"
            f" {m}.rel_us, CAST({mmr} AS BIGINT) AS mmr_us"
            f" FROM {', '.join(prev[: r + 1])}"
        )
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(selects)


@register(
    "qe19_mmr_rerank",
    tags=("similarity", "retrieval", "iterative"),
    oracle=_mmr_oracle(),
)
def qe19_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    1998 — the relevance–diversity tradeoff every RAG/search result
    page applies after retrieval): from the exact top-{MMR_POOL}
    cosine pool of the query, greedily pick {MMR_K} results maximizing
    λ·relevance − (1−λ)·max-similarity-to-already-picked, λ=0.5 — so
    the second and third picks are penalized for redundancy with
    earlier picks. The diversity twin of qe15's k-center (pure
    diversity); MMR keeps the query in the objective.

    Determinism: relevance and pairwise similarities are integer
    micro-unit cosines (ROUND·10⁶); the MMR objective is integer
    cross-multiplied ppm arithmetic with vec_id tiebreaks — the
    argmax chain is bit-exact cross-engine.

    Scale shape (100 TB): the pool comes from the serving index
    (qe03/qe04/qr01's channels — here the exact scorer for a pinned
    ground truth); each MMR round scans the ≤{MMR_POOL}-row pool
    against the ≤{MMR_K}-row broadcast picked set (qe15's bounded
    per-round 1-row driver collect). Reranking cost is O(pool·k) per
    query — independent of corpus size, which is the point."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    qrow = emb.where(F.col("vec_id") == MMR_QID).first()

    def cos_us(vec: list) -> Column:
        arr = F.array(*[F.lit(float(x)) for x in vec])
        arr_norm = float(sum(x * x for x in vec)) ** 0.5
        dp = F.aggregate(
            F.zip_with(
                F.col("embedding").cast("array<double>"),
                arr,
                lambda a, b: a * b,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return F.round(dp / (norm(F.col("embedding")) * F.lit(arr_norm)) * 1_000_000).cast("long")

    pool = (
        emb.where(F.col("vec_id") != MMR_QID)
        .select("vec_id", "embedding", cos_us(list(qrow.embedding)).alias("rel_us"))
        .orderBy(F.desc("rel_us"), "vec_id")
        .limit(MMR_POOL)
        .localCheckpoint(eager=True)
    )
    first = pool.orderBy(F.desc("rel_us"), "vec_id").first()
    picked = [first]
    out = [(0, int(first.vec_id), int(first.rel_us), int(first.rel_us))]
    lam, inv = MMR_LAMBDA_PPM, 1_000_000 - MMR_LAMBDA_PPM
    for r in range(1, MMR_K):
        maxsim = (
            F.greatest(*[cos_us(list(p.embedding)) for p in picked])
            if len(picked) > 1
            else cos_us(list(picked[0].embedding))
        )
        cand = (
            pool.where(~F.col("vec_id").isin([int(p.vec_id) for p in picked]))
            .select("vec_id", "embedding", "rel_us", maxsim.alias("_ms"))
            .select(
                "vec_id",
                "embedding",
                "rel_us",
                F.expr(f"({lam} * rel_us - {inv} * _ms) div 1000000").alias(
                    "mmr_us"
                ),
            )
        )
        best = cand.orderBy(F.desc("mmr_us"), "vec_id").first()
        picked.append(best)
        out.append((r, int(best.vec_id), int(best.rel_us), int(best.mmr_us)))
    return spark.createDataFrame(
        out, "mmr_rank long, vec_id long, rel_us long, mmr_us long"
    )


# ---------------------------------------------------------------------------
# qr02: pseudo-relevance-feedback query expansion (Rocchio/RM-lite)
# ---------------------------------------------------------------------------

PRF_FEEDBACK_DOCS = 5
PRF_EXPANSION_TERMS = 3
PRF_EXP_WEIGHT_PPM = 500_000  # expansion terms count half an original term
PRF_OUT_K = 10


def _prf_bm25_ctes(terms_src: str, prefix: str) -> str:
    """BM25 CTE chain parameterized by a term RELATION (term,
    weight_ppm) instead of a literal list — shared by the base pass
    (original terms, weight 10⁶) and the expanded pass."""
    return f"""{prefix}tf AS (
  SELECT d.doc_id, d.dl, u.term, t.weight_ppm,
         CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, dl, unnest(toks) AS term FROM docs) u
  JOIN docs d USING (doc_id)
  JOIN {terms_src} t ON t.term = u.term
  GROUP BY d.doc_id, d.dl, u.term, t.weight_ppm),
{prefix}df AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM {prefix}tf GROUP BY term),
{prefix}scored AS (
  SELECT f.doc_id,
         CAST(SUM(f.weight_ppm * CAST(ROUND(
           ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1)
           * (f.tf * CAST(2.2 AS DOUBLE))
           / (f.tf + 1.2 * (1 - 0.75 + 0.75 * f.dl
              / (CAST(s.sum_dl AS DOUBLE) / s.n_docs)))
           * 1000000) AS BIGINT) // 1000000) AS BIGINT) AS score_us
  FROM {prefix}tf f JOIN {prefix}df d USING (term) CROSS JOIN stats s
  GROUP BY f.doc_id)"""


@register(
    "qr02_prf_expansion",
    bench=True,
    tags=("retrieval", "text"),
    oracle=f"""
WITH docs AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split(lower(text), ' '), x -> x <> ''))
              AS BIGINT) AS dl,
         list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
  FROM documents),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(dl) AS BIGINT) AS sum_dl FROM docs),
qterms AS (
  SELECT unnest(['join', 'vector', 'stream']) AS term,
         CAST(1000000 AS BIGINT) AS weight_ppm),
{_prf_bm25_ctes('qterms', 'base_')},
fb AS (
  SELECT doc_id FROM base_scored
  ORDER BY score_us DESC, doc_id LIMIT {PRF_FEEDBACK_DOCS}),
corpus_df AS (
  SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df FROM (
    SELECT doc_id, unnest(toks) AS term FROM docs) u GROUP BY term),
cand AS (
  SELECT u.term, CAST(COUNT(*) AS BIGINT) AS tf_fb
  FROM (SELECT doc_id, unnest(toks) AS term FROM docs) u
  JOIN fb USING (doc_id)
  WHERE u.term NOT IN ('join', 'vector', 'stream')
    AND u.term NOT IN ('the', 'a', 'of', 'and', 'to', 'in', 'is')
  GROUP BY u.term),
expansion AS (
  SELECT c.term,
         CAST({PRF_EXP_WEIGHT_PPM} AS BIGINT) AS weight_ppm
  FROM cand c JOIN corpus_df d USING (term) CROSS JOIN stats s
  ORDER BY c.tf_fb * CAST(ROUND(ln((s.n_docs + 1.0) / (d.df + 1.0))
                                * 1000000) AS BIGINT) DESC, c.term
  LIMIT {PRF_EXPANSION_TERMS}),
allterms AS (
  SELECT term, weight_ppm FROM qterms
  UNION ALL SELECT term, weight_ppm FROM expansion),
{_prf_bm25_ctes('allterms', 'exp_')},
base_ranked AS (
  SELECT doc_id, score_us,
         ROW_NUMBER() OVER (ORDER BY score_us DESC, doc_id) AS r
  FROM base_scored),
exp_ranked AS (
  SELECT doc_id, score_us,
         ROW_NUMBER() OVER (ORDER BY score_us DESC, doc_id) AS r
  FROM exp_scored)
SELECT e.doc_id,
       CAST(e.score_us AS BIGINT) AS exp_score_us,
       CAST(COALESCE(b.score_us, 0) AS BIGINT) AS base_score_us,
       CAST(COALESCE(b.r, 0) AS BIGINT) AS base_rank,
       CAST(e.r AS BIGINT) AS new_rank
FROM exp_ranked e LEFT JOIN base_ranked b USING (doc_id)
WHERE e.r <= {PRF_OUT_K}
""",
)
def qr02_prf_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pseudo-relevance-feedback query expansion (Rocchio 1971 / RM
    relevance models — the second classic retrieval pass): run BM25
    for the original query, take the top-{PRF_FEEDBACK_DOCS} docs as
    implicit relevance feedback, mine their {PRF_EXPANSION_TERMS}
    highest tf·idf terms (stopwords and original terms excluded),
    and re-score with the expanded weighted term set (expansion terms
    at half weight) — reporting each final top-{PRF_OUT_K} doc's
    before/after rank so the expansion's effect is auditable.

    Fully relational adaptivity: the expansion terms are a RELATION
    derived from the first pass (no driver-side loop — unlike
    qe15/qe19's per-round argmax, the whole two-pass dataflow is one
    lineage both engines replay). Scoring weights and idf terms are
    integer ppm/µ-units (qt17's recipe), tiebreaks everywhere.

    Scale shape (100 TB): both BM25 passes keep qt17's discipline —
    the token stream joins a tiny BROADCAST term relation before the
    tf shuffle (pass 2's term set is |q|+{PRF_EXPANSION_TERMS} rows);
    feedback-doc term mining joins the {PRF_FEEDBACK_DOCS}-row fb
    relation (broadcast) onto the token stream — the only corpus-wide
    work is the corpus df for candidate idf, shared with the index
    build (qt19)."""
    from event_stream_aggr_spark.operators.text import (
        BM25_B,
        BM25_K1,
        BM25_TERMS,
        STOPWORDS_EN,
        tokenized_corpus,
    )
    from pyspark.sql import Row

    # memoized shared tokenize stage — see tokenized_corpus
    docs = tokenized_corpus(spark, sf_dir)
    stats = docs.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    def bm25_pass(term_rel: DataFrame) -> DataFrame:
        # (an arrays_overlap doc prefilter before this explode was
        # measured and reverted — see qt17: 96% of docs match the
        # query terms at this corpus, so it only added a scan)
        tf = (
            docs.select("doc_id", "dl", F.explode("toks").alias("term"))
            .join(F.broadcast(term_rel), "term")
            .groupBy("doc_id", "dl", "term", "weight_ppm")
            .agg(F.count(F.lit(1)).alias("tf"))
        )
        dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
        avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
        term_us = F.round(
            F.log(
                (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1
            )
            * (F.col("tf") * (BM25_K1 + 1))
            / (
                F.col("tf")
                + BM25_K1 * (1 - BM25_B + BM25_B * F.col("dl") / avgdl)
            )
            * 1000000
        ).cast("long")
        return (
            tf.join(F.broadcast(dfreq), "term")
            .crossJoin(F.broadcast(stats))
            .select(
                "doc_id",
                (F.col("weight_ppm") * term_us).alias("_w"),
            )
            .groupBy("doc_id")
            .agg(F.expr("sum(_w div 1000000)").cast("long").alias("score_us"))
        )

    qterms = spark.createDataFrame(
        [Row(term=t, weight_ppm=1_000_000) for t in BM25_TERMS]
    )
    # PRF is two-pass BY DEFINITION: the first-pass scores are read by
    # the feedback miner, the expansion's lineage, AND the final
    # before/after rank join — materialize them once (the memoized
    # intermediate every real PRF serving stack persists) instead of
    # letting each consumer branch recompute the corpus tf pass.
    from event_stream_aggr_spark.operators.stagecache import memoized_stage

    base = memoized_stage(
        "qr02_base_scores", docs, lambda: bm25_pass(qterms), params=tuple(BM25_TERMS)
    )
    fb = base.orderBy(F.desc("score_us"), "doc_id").limit(PRF_FEEDBACK_DOCS)
    # corpus-level document frequency is a pure derivative of the
    # tokenized corpus — memoized like the corpus itself, so repeated
    # retrieval queries in a session pay the |corpus|-wide
    # explode+distinct once (vocab-sized result, cheap to hold)
    from event_stream_aggr_spark.operators.stagecache import memoized_stage

    corpus_df = memoized_stage(
        "bm25_corpus_term_df",
        docs,
        lambda: (
            docs.select("doc_id", F.explode("toks").alias("term"))
            .distinct()
            .groupBy("term")
            .agg(F.count(F.lit(1)).alias("df"))
        ),
    )
    # join the PRF_FEEDBACK_DOCS-row fb relation onto docs BEFORE the
    # explode — only the feedback documents' tokens ever explode
    # (Catalyst can't push a join through Generate, so ordering it
    # by hand is the difference between 5 docs and the whole corpus)
    cand = (
        docs.join(F.broadcast(fb.select("doc_id")), "doc_id")
        .select(F.explode("toks").alias("term"))
        .filter(~F.col("term").isin(*BM25_TERMS))
        .filter(~F.col("term").isin(*STOPWORDS_EN))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("tf_fb"))
    )
    expansion = (
        cand.join(corpus_df, "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "term",
            (
                F.col("tf_fb")
                * F.round(
                    F.log(
                        (F.col("n_docs") + 1.0) / (F.col("df") + 1.0)
                    )
                    * 1000000
                ).cast("long")
            ).alias("_sc"),
        )
        .orderBy(F.desc("_sc"), "term")
        .limit(PRF_EXPANSION_TERMS)
        .select("term", F.lit(PRF_EXP_WEIGHT_PPM).cast("long").alias("weight_ppm"))
    )
    allterms = qterms.unionAll(expansion)
    exp = bm25_pass(allterms)
    # final top-K: orderBy+limit (TakeOrderedAndProject — per-partition
    # top-K then a K-row merge on the driver, q13's pattern), THEN
    # row_number over the already-K-row relation. The previous shape —
    # a partitionless row_number over the FULL scored corpus, filtered
    # to K afterwards — serialized every scored doc through one task;
    # the round-8 plan lint (plans/lint.py) now forbids exactly that.
    exp_topk = exp.orderBy(F.desc("score_us"), "doc_id").limit(PRF_OUT_K)
    wk = W.orderBy(F.desc("exp_score_us"), "doc_id")  # K rows, bounded
    exp_ranked = exp_topk.select(
        "doc_id", F.col("score_us").alias("exp_score_us")
    ).withColumn("new_rank", F.row_number().over(wk))
    # base_rank of the K winners WITHOUT globally ranking base: rank =
    # 1 + |rows that beat it| under the same (score DESC, doc_id) total
    # order. The K-row side broadcasts; each base row compares against
    # K constants map-side and the count shuffles K groups — O(|base|)
    # work, no single-partition stage, identical to the full
    # row_number for every doc that HAS a base score (docs without one
    # report rank 0, as before).
    # the reference score for ranking is the winner's BASE score (its
    # rank among base is what "before" means); winners absent from
    # base have no base rank and report 0 via the null check below
    kref = F.broadcast(
        exp_topk.select("doc_id")
        .join(base, "doc_id")
        .select(
            F.col("doc_id").alias("k_doc"), F.col("score_us").alias("k_score")
        )
    )
    beats = (
        base.join(
            kref,
            (F.col("score_us") > F.col("k_score"))
            | (
                (F.col("score_us") == F.col("k_score"))
                & (F.col("doc_id") < F.col("k_doc"))
            ),
        )
        .groupBy("k_doc")
        .agg(F.count(F.lit(1)).alias("n_beat"))
    )
    base_scored = base.select(
        "doc_id", F.col("score_us").alias("base_score_us")
    )
    return (
        exp_ranked.join(base_scored, "doc_id", "left")
        .join(
            F.broadcast(beats),
            exp_ranked["doc_id"] == beats["k_doc"],
            "left",
        )
        .select(
            "doc_id",
            "exp_score_us",
            F.coalesce("base_score_us", F.lit(0)).cast("long").alias(
                "base_score_us"
            ),
            F.when(
                F.col("base_score_us").isNull(), F.lit(0)
            )
            .otherwise(F.coalesce("n_beat", F.lit(0)) + 1)
            .cast("long")
            .alias("base_rank"),
            F.col("new_rank").cast("long").alias("new_rank"),
        )
    )


# ---------------------------------------------------------------------------
# qe20: recall@k CURVE of the LSH ANN index (qe13 generalized over k)
# ---------------------------------------------------------------------------

RECALL_CURVE_KS = (1, 5, 10, 20)


def _recall_curve_oracle() -> str:
    kmax = max(RECALL_CURVE_KS)
    k_rows = ", ".join(str(k) for k in RECALL_CURVE_KS)
    return f"""
WITH {lsh_bucket_ctes()},
cand AS (
  SELECT DISTINCT q.vec_id AS qid, c.vec_id AS cid
  FROM buck q JOIN buck c ON q.t = c.t AND q.b = c.b
  WHERE q.vec_id < 8 AND c.vec_id <> q.vec_id),
ann_pairs AS (
  SELECT cand.qid, cand.cid,
         (SELECT SUM(a * b) FROM (SELECT unnest(eq.embedding)::DOUBLE AS a,
                                         unnest(ec.embedding)::DOUBLE AS b)) AS dp,
         (SELECT SUM(a * a) FROM (SELECT unnest(eq.embedding)::DOUBLE AS a)) AS nq,
         (SELECT SUM(b * b) FROM (SELECT unnest(ec.embedding)::DOUBLE AS b)) AS nc
  FROM cand
  JOIN embeddings eq ON cand.qid = eq.vec_id
  JOIN embeddings ec ON cand.cid = ec.vec_id),
ann_ranked AS (
  SELECT qid, cid,
         ROW_NUMBER() OVER (PARTITION BY qid
           ORDER BY ROUND(dp / (SQRT(nq) * SQRT(nc)), 6) DESC, cid) AS rnk
  FROM ann_pairs),
ex_pairs AS (
  SELECT q.vec_id AS qid, c.vec_id AS cid,
         (SELECT SUM(a * b) FROM (SELECT unnest(q.embedding)::DOUBLE AS a,
                                         unnest(c.embedding)::DOUBLE AS b)) AS dp,
         (SELECT SUM(a * a) FROM (SELECT unnest(q.embedding)::DOUBLE AS a)) AS nq,
         (SELECT SUM(b * b) FROM (SELECT unnest(c.embedding)::DOUBLE AS b)) AS nc
  FROM embeddings c, embeddings q
  WHERE q.vec_id < 8 AND c.vec_id <> q.vec_id),
ex_ranked AS (
  SELECT qid, cid,
         ROW_NUMBER() OVER (PARTITION BY qid
           ORDER BY ROUND(dp / (SQRT(nq) * SQRT(nc)), 6) DESC, cid) AS rnk
  FROM ex_pairs),
ks AS (SELECT unnest([{k_rows}]) AS k)
SELECT k.k,
       CAST(SUM(CASE WHEN a.cid IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_hits,
       CAST(SUM(CASE WHEN a.cid IS NOT NULL THEN 1 ELSE 0 END) * 1000000
            // (8 * k.k) AS BIGINT) AS recall_ppm
FROM ks k
JOIN ex_ranked e ON e.rnk <= k.k
LEFT JOIN ann_ranked a ON a.qid = e.qid AND a.cid = e.cid AND a.rnk <= k.k
WHERE e.rnk <= {kmax}
GROUP BY k.k
""".replace("{kmax}", str(kmax))


@register(
    "qe20_recall_curve",
    tags=("similarity", "approx", "monitoring", "eval"),
    oracle=_recall_curve_oracle(),
)
def qe20_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k CURVE of the LSH ANN index (qe13's scalar recall@5
    extended across operating points k = 1, 5, 10, 20 — the serving
    decision is WHERE on this curve to run, and a flat curve means
    the index's candidate pool, not the rerank depth, is the
    bottleneck). One row per k: total hits across the 8 audit queries
    and recall in ppm.

    Determinism: both rankings use 6dp-rounded cosine with cid
    tiebreaks; hits are integer counts; recall is integer
    cross-multiplied (hits·10⁶ div (queries·k)).

    Scale shape (100 TB): ONE ANN ranking and ONE exact ranking are
    computed once (same dataflows as qe13 — bucketed candidates vs
    broadcast-query exact scan over the audit sample), and every k
    reads the SAME two rank relations — the curve costs one small
    |ks|-way fan-out over ≤(8·k_max)-row relations, not |ks|
    re-rankings."""
    emb = load_table(spark, sf_dir, "embeddings")
    kmax = max(RECALL_CURVE_KS)
    ann = ann_lsh_topk_self(
        emb, F.col("vec_id") < 8, dim=64, k=kmax
    ).select("qid", "cid", F.col("rank").alias("ann_rnk"))
    q = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    c = emb.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("ce"))
    exact = cosine_topk(q, c, k=kmax).select(
        "qid", "cid", F.col("rank").alias("ex_rnk")
    )
    ks = F.explode(
        F.array(*[F.lit(k) for k in RECALL_CURVE_KS])
    ).alias("k")
    fan = exact.select("qid", "cid", "ex_rnk", ks)
    joined = fan.join(
        ann, ["qid", "cid"], "left"
    ).filter(F.col("ex_rnk") <= F.col("k"))
    hit = (F.col("ann_rnk").isNotNull()) & (
        F.col("ann_rnk") <= F.col("k")
    )
    return joined.groupBy("k").agg(
        F.sum(hit.cast("int")).cast("long").alias("n_hits"),
        F.expr(
            "sum(case when ann_rnk is not null and ann_rnk <= k"
            " then 1 else 0 end) * 1000000 div (8 * k)"
        )
        .cast("long")
        .alias("recall_ppm"),
    )


# ---------------------------------------------------------------------------
# qe21: IVF+PQ composite index (the FAISS IVFPQ architecture)
# ---------------------------------------------------------------------------


def _ivf_pq_oracle(k: int = 5, nprobe: int = IVF_NPROBE) -> str:
    # the PQ chain (codes + lut) verbatim from qe06's oracle, plus the
    # IVF coarse-quantizer CTEs from qe04's (renamed i* so the two
    # chains coexist), intersected at the ADC step: only cell-collided
    # candidates are ADC-scored.
    return f"""
WITH {_pq_chain_ctes()},
ivd AS (
  SELECT vec_id, label, u.pos, u.x::DOUBLE AS x
  FROM embeddings,
       LATERAL (SELECT unnest(embedding) AS x,
                       generate_subscripts(embedding, 1) AS pos) u),
icentroid AS (
  SELECT label, pos, ROUND(AVG(x), 6) AS cx FROM ivd GROUP BY label, pos),
idist AS (
  SELECT v.vec_id, c.label AS cell,
         ROUND(SUM((v.x - c.cx) * (v.x - c.cx)), 6) AS d
  FROM ivd v JOIN icentroid c ON v.pos = c.pos
  GROUP BY v.vec_id, c.label),
icells AS (
  SELECT vec_id, cell,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rnk
  FROM idist),
corpus_cell AS (SELECT vec_id AS cid, cell FROM icells WHERE rnk = 1),
query_cells AS (SELECT vec_id AS qid, cell FROM icells
                WHERE rnk <= {nprobe} AND vec_id < 8),
cand AS (
  SELECT DISTINCT q.qid, c.cid
  FROM query_cells q JOIN corpus_cell c USING (cell)
  WHERE c.cid <> q.qid),
adc AS (
  SELECT l.qid, c.cid, CAST(SUM(l.d_us) AS BIGINT) AS total_us
  FROM cand JOIN codes c ON cand.cid = c.cid
  JOIN lut l ON cand.qid = l.qid AND c.m = l.m AND c.code = l.code
  GROUP BY l.qid, c.cid),
ranked AS (
  SELECT qid, cid, CAST(total_us AS DOUBLE) / 1000000 AS adc_dist,
         CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY total_us, cid) AS BIGINT)
           AS rank
  FROM adc)
SELECT qid, cid, adc_dist, rank FROM ranked WHERE rank <= {k}
"""


@register("qe21_ivf_pq_topk", bench=True, tags=("similarity", "approx", "scale"), oracle=_ivf_pq_oracle())
def qe21_ivf_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via the IVF+PQ COMPOSITE index (Jégou et al. 2011's IVFADC,
    the FAISS-default architecture qe04 and qe06 each build half of):
    the IVF coarse quantizer prunes the candidate set to vectors
    sharing one of the query's nprobe=2 nearest cells, and PQ's
    asymmetric-distance lookup scores ONLY those survivors — neither
    the full-corpus ADC sweep qe06 pays nor qe04's exact float rerank.

    Scale shape (100 TB): candidate pruning is the qe04 equi-join on
    cell (never all-pairs); scoring joins the pruned (qid, cid) set to
    the |N|·M byte-code relation on cid, then to the broadcast KB-scale
    per-query LUT on (qid, m, code) — the corpus is touched once to
    encode and once to probe, all shuffles are on ids, and the serving
    memory is codes + centroids, not floats. Both trained artifacts
    (IVF centroids, PQ codebook via the session-memoized
    pq_codebook_shared) are reused verbatim from their standalone
    queries, so a composed index build pays each training once.

    Determinism: inherits qe04's 6dp-rounded cell assignment
    (cell-id tiebreak) and qe06's integer-µs ADC (code tiebreak);
    the final rank orders by exact integer total_us with cid
    tiebreak."""
    # round 16: parallelize=False — the composite probe is a chain of
    # small keyed joins over memoized artifacts; the repartitioned scan
    # only multiplied its stage/task count (paired min-of-5: 0.79x)
    emb = load_table(spark, sf_dir, "embeddings", parallelize=False)
    # IVF coarse pruning — same assignment relation as qe04
    cells = ivf_assignments(emb, nprobe=IVF_NPROBE)
    corpus_cell = cells.filter(F.col("rnk") == 1).select(
        F.col("vec_id").alias("cid"), "cell"
    )
    query_cells = cells.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("qid"), "cell"
    )
    cand = (
        query_cells.join(corpus_cell, "cell")
        .filter(F.col("cid") != F.col("qid"))
        .select("qid", "cid")
        .distinct()
    )
    # PQ encode + per-query LUT — same artifacts as qe06
    _vd, subs = _pq_views(emb)
    dfin = _pq_dist(subs, pq_codebook_shared(emb)).localCheckpoint(eager=False)
    codes = _pq_argmin(dfin).withColumnRenamed("vec_id", "cid")
    lut = dfin.filter(F.col("vec_id") < 8).withColumnRenamed("vec_id", "qid")
    adc = (
        cand.join(codes, "cid")
        .join(F.broadcast(lut), ["qid", "m", "code"])
        .groupBy("qid", "cid")
        .agg(F.sum("d_us").alias("total_us"))
    )
    wr = W.partitionBy("qid").orderBy("total_us", "cid")
    return adc.select(
        "qid",
        "cid",
        (F.col("total_us").cast("double") / 1000000).alias("adc_dist"),
        F.row_number().over(wr).cast("long").alias("rank"),
    ).filter(F.col("rank") <= 5)


# ---------------------------------------------------------------------------
# qe22: Matryoshka truncation recall — how much ranking survives a prefix
# ---------------------------------------------------------------------------

MRL_PREFIX_DIM = 16  # truncated prefix length (of 64)


def _mrl_oracle(k: int = 5) -> str:
    def pairs_cte(vec_expr: str) -> str:
        return f"""
  SELECT q.vec_id AS qid, c.vec_id AS cid,
         (SELECT SUM(a * b) FROM (SELECT unnest({vec_expr.replace('VEC', 'q.embedding')})::DOUBLE AS a,
                                         unnest({vec_expr.replace('VEC', 'c.embedding')})::DOUBLE AS b)) AS dp,
         (SELECT SUM(a * a) FROM (SELECT unnest({vec_expr.replace('VEC', 'q.embedding')})::DOUBLE AS a)) AS nq,
         (SELECT SUM(b * b) FROM (SELECT unnest({vec_expr.replace('VEC', 'c.embedding')})::DOUBLE AS b)) AS nc
  FROM embeddings c, embeddings q
  WHERE q.vec_id < 8 AND c.vec_id <> q.vec_id"""

    def topk_cte(src: str) -> str:
        return f"""
  SELECT qid, cid FROM (
    SELECT qid, cid,
           ROW_NUMBER() OVER (PARTITION BY qid
             ORDER BY ROUND(dp / (SQRT(nq) * SQRT(nc)), 6) DESC, cid) AS rnk
    FROM {src}) WHERE rnk <= {k}"""

    return f"""
WITH full_pairs AS ({pairs_cte("VEC")}),
trunc_pairs AS ({pairs_cte(f"VEC[1:{MRL_PREFIX_DIM}]")}),
full_topk AS ({topk_cte("full_pairs")}),
trunc_topk AS ({topk_cte("trunc_pairs")})
SELECT f.qid,
       CAST(COUNT(t.cid) AS BIGINT) AS n_hits,
       ROUND(COUNT(t.cid) / {k}.0, 6) AS recall
FROM full_topk f
LEFT JOIN trunc_topk t ON f.qid = t.qid AND f.cid = t.cid
GROUP BY f.qid
"""


@register(
    "qe22_matryoshka_recall",
    tags=("similarity", "approx", "monitoring"),
    oracle=_mrl_oracle(),
)
def qe22_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka truncation audit (Kusupati et al. 2022, the MRL
    recipe behind adaptive-dimension retrieval): recall@5 of the
    exact top-k computed on the FIRST {MRL_PREFIX_DIM} embedding
    dimensions against the full-dimension ground truth, per query.
    This is the number a serving stack needs before it ships
    truncated vectors to the cheap first-pass tier (prefix cosine at
    1/4 the dims = 1/4 the scan bytes and FLOPs): a prefix that keeps
    recall@5 high lets the expensive full-dim scoring run on a
    shortlist only — the same funnel as qe06's ADC rerank, with
    truncation instead of quantization as the compressor.

    Scale shape: both sides are the qe01 broadcast-anchor exact scan
    (8 query rows broadcast; the corpus is scanned once per side,
    never joined to itself); the audit is a k-row-per-query left
    join. Determinism: cosine rounded to 6dp with cid tiebreak —
    identical ordering rules to every other ranking query here."""
    emb = load_table(spark, sf_dir, "embeddings")
    q_full = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    c_full = emb.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("ce"))
    trunc = F.slice(F.col("embedding"), 1, MRL_PREFIX_DIM)
    q_tr = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("qid"), trunc.alias("qe")
    )
    c_tr = emb.select(F.col("vec_id").alias("cid"), trunc.alias("ce"))
    full_topk = cosine_topk(q_full, c_full, k=5).select("qid", "cid")
    trunc_topk = cosine_topk(q_tr, c_tr, k=5).select(
        "qid", F.col("cid").alias("t_cid")
    )
    joined = full_topk.join(
        trunc_topk,
        (full_topk["qid"] == trunc_topk["qid"])
        & (full_topk["cid"] == trunc_topk["t_cid"]),
        "left",
    ).select(full_topk["qid"].alias("qid"), "t_cid")
    return joined.groupBy("qid").agg(
        F.count("t_cid").alias("n_hits"),
        F.round(F.count("t_cid") / 5.0, 6).alias("recall"),
    )
