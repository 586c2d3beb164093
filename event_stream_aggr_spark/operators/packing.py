"""Sequence packing for training-batch preparation (SURVEY.md §2.10
extension): assign documents to fixed token-budget packs, the step that
turns a curated corpus into trainer-shaped sequences.

The packer is greedy-by-offset: within a partition stream, each doc
starts at the running token offset of everything before it, and lands
in pack ``floor(offset / budget)``. That is the deterministic,
restart-safe packing real pipelines use (docs may straddle a budget
boundary; the trainer's loader splits them — the *assignment* is what
must be reproducible).

Scale design: the running offset is a window sum partitioned by the
corpus partition key (``source`` here; (source, day) or a hash bucket
at 100 TB) — never a single global ordering, which would serialize the
whole corpus through one task. Each partition's window is independent,
so the op scales with partition count; everything is integer arithmetic
and therefore exact cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from event_stream_aggr_spark.operators.text import token_count, tokens
from event_stream_aggr_spark.plans.registry import register
from event_stream_aggr_spark.tables import load_table

#: Tokens per packed training sequence (a toy 512-token context).
PACK_BUDGET = 512


def pack_assignments(
    docs: DataFrame,
    part_col: str = "source",
    order_col: str = "doc_id",
    budget: int = PACK_BUDGET,
) -> DataFrame:
    """Add ``n_tokens``, ``start_offset``, ``pack_id`` to ``docs``."""
    w = (
        W.partitionBy(part_col)
        .orderBy(order_col)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    return (
        docs.withColumn("n_tokens", token_count(F.col("text")))
        .withColumn(
            "start_offset",
            F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("long"),
        )
        .withColumn(
            "pack_id", F.floor(F.col("start_offset") / budget).cast("long")
        )
    )


@register(
    "qp01_sequence_packing",
    bench=True,
    tags=("packing", "text"),
    oracle=f"""
WITH sized AS (
  SELECT source, doc_id,
         CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
              AS BIGINT) AS n_tokens
  FROM documents),
placed AS (
  SELECT source, doc_id, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (
              PARTITION BY source ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS start_offset
  FROM sized)
SELECT source,
       CAST(FLOOR(start_offset / {PACK_BUDGET}.0) AS BIGINT) AS pack_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens,
       MIN(doc_id) AS first_doc,
       MAX(doc_id) AS last_doc
FROM placed
GROUP BY source, pack_id
ORDER BY source, pack_id
""",
)
def qp01_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy token-budget packing of documents into 512-token training
    sequences, summarized per (source, pack)."""
    d = load_table(spark, sf_dir, "documents")
    placed = pack_assignments(d.select("source", "doc_id", "text"))
    return (
        placed.groupBy(
            "source", F.col("pack_id")
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("pack_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("source", "pack_id")
    )


N_PACK_SHARDS = 8


@register(
    "qp02_training_batch_pipeline",
    bench=True,
    tags=("packing", "pipeline", "text"),
    oracle=f"""
WITH gated AS (
  SELECT source, doc_id, text,
         CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
              AS BIGINT) AS n_tokens,
         CAST(length(array_to_string(list_filter(string_split(text, ' '),
              x -> x <> ''), '')) AS BIGINT) AS sum_len
  FROM documents),
kept AS (
  SELECT source, doc_id, n_tokens FROM gated
  WHERE n_tokens BETWEEN 50 AND 100000
    AND sum_len >= 3 * n_tokens AND sum_len <= 10 * n_tokens),
placed AS (
  SELECT source, doc_id, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (
              PARTITION BY source ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS start_offset
  FROM kept),
packs AS (
  SELECT source, CAST(FLOOR(start_offset / {PACK_BUDGET}) AS BIGINT) AS pack_id,
         COUNT(*) AS n_docs,
         CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens
  FROM placed GROUP BY source, CAST(FLOOR(start_offset / {PACK_BUDGET}) AS BIGINT))
SELECT ('0x' || substr(md5(source || ':' || CAST(pack_id AS VARCHAR)), 1, 7))::BIGINT
         % {N_PACK_SHARDS} AS shard,
       source, pack_id, n_docs, pack_tokens,
       ROUND(CAST(pack_tokens AS DOUBLE) / {PACK_BUDGET}, 6) AS fill_rate
FROM packs
""",
)
def qp02_training_batch_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-batch prep in ONE lineage (L6's qd13
    analogue): quality gate → greedy token-budget packing → shard
    assignment. The gate is the zero-shuffle subset of qt14's rules
    (length window + mean-token-length window — both pure array
    expressions that fuse into the scan); packing reuses qp01's
    running-offset window; each finished PACK (not each doc) lands on
    a shard via content-derived md5(source:pack_id), so a pack is
    never split across shard files.

    Scale shape: gate fuses under the scan (no materialization between
    stages); the one wide exchange is qp01's per-source window; the
    pack-grain relation that flows to sharding is |corpus|/budget
    rows. fill_rate exposes the packing efficiency a training loader
    cares about (packs can exceed 1.0 — a boundary-crossing document
    counts in its start pack, the standard greedy contract)."""
    d = load_table(spark, sf_dir, "documents").select("source", "doc_id", "text")
    toked = d.select(
        "source", "doc_id", tokens(F.col("text")).alias("ts")
    ).select(
        "source",
        "doc_id",
        F.size("ts").cast("long").alias("n_tokens"),
        F.length(F.concat_ws("", F.col("ts"))).cast("long").alias("sum_len"),
    )
    kept = toked.filter(
        F.col("n_tokens").between(50, 100000)
        & (F.col("sum_len") >= 3 * F.col("n_tokens"))
        & (F.col("sum_len") <= 10 * F.col("n_tokens"))
    )
    w = (
        W.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    placed = kept.withColumn(
        "start_offset",
        F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("long"),
    ).withColumn(
        "pack_id", F.floor(F.col("start_offset") / PACK_BUDGET).cast("long")
    )
    packs = placed.groupBy("source", "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("pack_tokens"),
    )
    # reuse the one md5-prefix 28-bit hash recipe (sampling._key_hash)
    # so shard assignment stays reproducible across operators
    from event_stream_aggr_spark.operators.sampling import _key_hash

    shard = (
        _key_hash(
            F.concat(
                F.col("source"), F.lit(":"), F.col("pack_id").cast("string")
            )
        )
        % N_PACK_SHARDS
    )
    return packs.select(
        shard.alias("shard"),
        "source",
        "pack_id",
        "n_docs",
        "pack_tokens",
        F.round(F.col("pack_tokens").cast("double") / PACK_BUDGET, 6).alias(
            "fill_rate"
        ),
    )


# ---------------------------------------------------------------------------
# qp03: clustered-curation pipeline — one shared assignment, three consumers
# ---------------------------------------------------------------------------


def _qp03_oracle() -> str:
    from event_stream_aggr_spark.operators.dedup import semdedup_drop_ctes
    from event_stream_aggr_spark.operators.sampling import balanced_sample_ctes
    from event_stream_aggr_spark.operators.similarity import (
        km_assign_ctes,
        km_profile_ctes,
    )

    return f"""
WITH {km_assign_ctes()},
{km_profile_ctes()},
{semdedup_drop_ctes()},
{balanced_sample_ctes()},
dupc AS (
  SELECT a.code AS cluster, CAST(COUNT(*) AS BIGINT) AS n_dropped
  FROM assign a JOIN drops d ON a.vec_id = d.vec_id GROUP BY a.code),
sampc AS (
  SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_sampled
  FROM draws GROUP BY cluster)
SELECT p.code AS cluster, p.n_vecs, t.top_label,
       ROUND(CAST(t.top_cnt AS DOUBLE) / p.n_vecs, 6) AS top_share,
       ROUND(CAST(p.sum_d AS DOUBLE) / p.n_vecs / 1000000, 6) AS avg_dist,
       COALESCE(dc.n_dropped, 0) AS n_dropped,
       COALESCE(sc.n_sampled, 0) AS n_sampled
FROM prof p
JOIN top t ON p.code = t.code
LEFT JOIN dupc dc ON p.code = dc.cluster
LEFT JOIN sampc sc ON p.code = sc.cluster
"""


@register(
    "qp03_clustered_curation_pipeline",
    bench=True,
    tags=("pipeline", "clustering", "dedup", "sampling"),
    oracle=_qp03_oracle(),
)
def qp03_clustered_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed clustered-curation pipeline (the r4 VERDICT's shared-
    stage ask): k-means-assign the corpus ONCE (the materialized
    ``kmeans_assign_shared`` stage), then fan three curation consumers
    off that one artifact — qe08's cluster profile, qd16's semantic-dup
    drop counts, qs08's balanced-sample draw counts — joined at cluster
    grain into one per-cluster curation report.

    Scale shape (100 TB): this is the pipeline form the three
    standalone queries imply — the expensive stage (iterative Lloyd
    assignment over every vector) is computed once and persisted
    (localCheckpoint here; a parquet/Delta assignment table per corpus
    snapshot in production), and every downstream stage consumes it
    without recomputation. The three consumers' own wide work
    (within-cluster pair join, per-cluster window) is unchanged; the
    final report joins are cluster-grain (K rows) — negligible.
    Composes the registered fns directly so the pipeline can never
    drift from the standalone semantics."""
    from event_stream_aggr_spark.operators.dedup import qd16_semantic_dedup
    from event_stream_aggr_spark.operators.sampling import (
        qs08_cluster_balanced_sample,
    )
    from event_stream_aggr_spark.operators.similarity import qe08_kmeans_clusters

    prof = qe08_kmeans_clusters(spark, sf_dir)
    dups = (
        qd16_semantic_dedup(spark, sf_dir)
        .filter(~F.col("kept"))
        .groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n_dropped"))
    )
    samp = (
        qs08_cluster_balanced_sample(spark, sf_dir)
        .groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n_sampled"))
    )
    return (
        prof.join(dups, "cluster", "left")
        .join(samp, "cluster", "left")
        .select(
            "cluster",
            "n_vecs",
            "top_label",
            "top_share",
            "avg_dist",
            F.coalesce("n_dropped", F.lit(0)).cast("long").alias("n_dropped"),
            F.coalesce("n_sampled", F.lit(0)).cast("long").alias("n_sampled"),
        )
    )


# ---------------------------------------------------------------------------
# qp04: length-bucketed batching (padding-efficiency audit)
# ---------------------------------------------------------------------------

LEN_BUCKET_W = 64  # pad-target granularity in tokens


@register(
    "qp04_padding_efficiency",
    tags=("packing", "training-data"),
    oracle=f"""
WITH docs AS (
  SELECT source,
         len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tokens
  FROM documents),
b AS (
  SELECT source, n_tokens,
         CAST(CEIL(n_tokens / {LEN_BUCKET_W}.0) * {LEN_BUCKET_W} AS BIGINT)
           AS pad_target
  FROM docs WHERE n_tokens > 0)
SELECT source, pad_target,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
       CAST(COUNT(*) * pad_target - SUM(n_tokens) AS BIGINT) AS padded_tokens,
       ROUND(CAST(SUM(n_tokens) AS DOUBLE) / (COUNT(*) * pad_target), 6)
         AS efficiency
FROM b GROUP BY source, pad_target
""",
)
def qp04_padding_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batching audit — qp01's packing ALTERNATIVE:
    when sequences must stay whole (SFT, contrastive pairs), the
    trainer pads each batch to its bucket's length; bucketing by
    64-token granularity bounds the waste. Per (source, pad_target):
    doc count, real tokens, padded filler, and packing efficiency —
    the report that decides bucket width (and whether to switch to
    qp01-style packing) before burning accelerator hours.

    Scale shape: bucket id is a map-side expression; ONE hash
    aggregation to (source, bucket) grain; all integer arithmetic.
    """
    d = load_table(spark, sf_dir, "documents")
    nt = token_count(F.col("text"))
    b = d.select(
        "source",
        nt.alias("n_tokens"),
        (F.ceil(nt / LEN_BUCKET_W) * LEN_BUCKET_W).cast("long").alias("pad_target"),
    ).where(F.col("n_tokens") > 0)
    return b.groupBy("source", "pad_target").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("sum_tokens"),
        (F.count(F.lit(1)) * F.first("pad_target") - F.sum("n_tokens")).alias(
            "padded_tokens"
        ),
        F.round(
            F.sum("n_tokens").cast("double")
            / (F.count(F.lit(1)) * F.first("pad_target")),
            6,
        ).alias("efficiency"),
    )


# ---------------------------------------------------------------------------
# qp05: multimodal-aware sequence packing (image token budgets)
# ---------------------------------------------------------------------------

IMG_TOKENS = 64  # placeholder-token cost of one attached image


@register(
    "qp05_multimodal_packing",
    tags=("packing", "multimodal", "training-data"),
    oracle=f"""
WITH sized AS (
  SELECT d.source, d.doc_id,
         CAST(len(list_filter(string_split(d.text, ' '), x -> x <> ''))
              + CASE WHEN e.vec_id IS NOT NULL THEN {IMG_TOKENS} ELSE 0 END
              AS BIGINT) AS cost,
         CAST(CASE WHEN e.vec_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
           AS has_image
  FROM documents d LEFT JOIN embeddings e ON d.doc_id = e.vec_id),
placed AS (
  SELECT source, doc_id, cost, has_image,
         CAST(COALESCE(SUM(cost) OVER (
              PARTITION BY source ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS start_offset
  FROM sized)
SELECT source,
       CAST(FLOOR(start_offset / {PACK_BUDGET}.0) AS BIGINT) AS pack_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(has_image) AS BIGINT) AS n_images,
       CAST(SUM(cost) AS BIGINT) AS pack_tokens,
       MIN(doc_id) AS first_doc
FROM placed
GROUP BY source, pack_id
""",
)
def qp05_multimodal_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for INTERLEAVED image-text training data: a
    document with an aligned image (qm05's doc_id = vec_id alignment)
    costs its text tokens PLUS 64 image-placeholder tokens — the
    budget a vision-language trainer actually consumes — and packs
    land on the combined cost. Per (source, pack): docs, images,
    total tokens.

    Scale shape: qp01's per-partition running-offset window with the
    cost generalized to text + modality terms; the alignment is a
    key equi-join (broadcast at this SF) resolved BEFORE the window,
    so packing itself stays a single partition-local pass. Image
    PAYLOADS never enter the plan — the cost needs only existence
    (the L5 pointer rule).
    """
    d = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), F.lit(1).alias("_img")
    )
    sized = (
        d.select("source", "doc_id", "text")
        .join(F.broadcast(emb), "doc_id", "left")
        .select(
            "source",
            "doc_id",
            (
                token_count(F.col("text"))
                + F.when(F.col("_img").isNotNull(), IMG_TOKENS).otherwise(0)
            ).alias("cost"),
            F.coalesce("_img", F.lit(0)).cast("long").alias("has_image"),
        )
    )
    w = (
        W.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    placed = sized.withColumn(
        "start_offset", F.coalesce(F.sum("cost").over(w), F.lit(0)).cast("long")
    ).withColumn(
        "pack_id", F.floor(F.col("start_offset") / PACK_BUDGET).cast("long")
    )
    return placed.groupBy("source", "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("has_image").cast("long").alias("n_images"),
        F.sum("cost").cast("long").alias("pack_tokens"),
        F.min("doc_id").alias("first_doc"),
    )
