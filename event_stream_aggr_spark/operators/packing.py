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

from event_stream_aggr_spark.operators.text import token_count
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
