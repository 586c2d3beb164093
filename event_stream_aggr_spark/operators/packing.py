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
