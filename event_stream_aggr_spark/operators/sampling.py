"""Sampling operators for training-data pipelines.

At 100 TB you almost never train on everything: pipelines need seeded,
reproducible samples (eval splits, ablations, quality audits) and
stratified sampling to rebalance sources/languages.

- ``seeded_sample``: Bernoulli sample, deterministic for a fixed seed
  AND a fixed partitioning of the input (Spark's sample is seeded
  per-partition — document-stable only if the upstream layout is; for
  layout-independent sampling use ``hash_sample``).
- ``hash_sample``: content-addressed sampling — keep rows whose
  deterministic key hash lands under the rate. Stable across runs,
  engines, partitionings, and cluster sizes; the right default for
  reproducible dataset splits. (md5-derived, same arithmetic as the
  dedup operators.)
- ``stratified_sample``: per-stratum rates via ``sampleBy``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: 2^28 buckets from the first 7 hex digits of md5 (see dedup.token_hash28)
_HASH_SPACE = 16**7


def _key_hash(key: Column) -> Column:
    return F.conv(F.substring(F.md5(key.cast("string")), 1, 7), 16, 10).cast("long")


def hash_sample(df: DataFrame, key_col: str, rate: float) -> Column | DataFrame:
    """Keep rows with hash(key)/2^28 < rate — reproducible anywhere,
    independent of partitioning. Pair with a disjoint band for an
    eval split (e.g. train < 0.9 <= eval)."""
    return df.filter(_key_hash(F.col(key_col)) < int(rate * _HASH_SPACE))


def hash_split(df: DataFrame, key_col: str, train_rate: float) -> tuple[DataFrame, DataFrame]:
    """Disjoint, exhaustive (train, eval) split by content hash."""
    cut = int(train_rate * _HASH_SPACE)
    h = _key_hash(F.col(key_col))
    return df.filter(h < cut), df.filter(h >= cut)


def seeded_sample(df: DataFrame, rate: float, seed: int = 42) -> DataFrame:
    """Bernoulli sample, seeded (per-partition determinism)."""
    return df.sample(withReplacement=False, fraction=rate, seed=seed)


def stratified_sample(
    df: DataFrame, strata_col: str, fractions: dict, seed: int = 42
) -> DataFrame:
    """Per-stratum sampling rates (rebalancing sources/languages)."""
    return df.sampleBy(strata_col, fractions, seed=seed)


# ---------------------------------------------------------------------------
# Registered queries
# ---------------------------------------------------------------------------

from pyspark.sql import SparkSession  # noqa: E402

from event_stream_aggr_spark.plans.registry import register  # noqa: E402
from event_stream_aggr_spark.tables import load_table  # noqa: E402


@register(
    "qs01_hash_sample_split",
    tags=("sampling",),
    oracle=f"""
WITH h AS (
  SELECT doc_id, lang,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT AS hv
  FROM documents)
SELECT lang,
       COUNT(*) FILTER (WHERE hv < {int(0.9 * _HASH_SPACE)}) AS n_train,
       COUNT(*) FILTER (WHERE hv >= {int(0.9 * _HASH_SPACE)}) AS n_eval
FROM h GROUP BY lang
""",
)
def qs01_hash_sample_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-hash 90/10 train/eval split — reproducible across runs,
    engines, and partitionings (the oracle recomputes the identical
    split from the same md5 arithmetic)."""
    d = load_table(spark, sf_dir, "documents")
    train, ev = hash_split(d, "doc_id", 0.9)
    t = train.groupBy("lang").agg(F.count(F.lit(1)).alias("n_train"))
    e = ev.groupBy("lang").agg(F.count(F.lit(1)).alias("n_eval"))
    return (
        t.join(e, "lang", "full")
        .select(
            "lang",
            F.coalesce("n_train", F.lit(0)).alias("n_train"),
            F.coalesce("n_eval", F.lit(0)).alias("n_eval"),
        )
    )
