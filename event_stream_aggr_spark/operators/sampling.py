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


from event_stream_aggr_spark.operators.dedup import (  # noqa: E402
    _cc_ctes,
    _lsh_pairs_ctes,
)


@register(
    "qs02_leakage_safe_split",
    tags=("sampling", "dedup"),
    oracle=f"""
WITH {_lsh_pairs_ctes()},
{_cc_ctes()},
keyed AS (
  SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS group_key
  FROM documents d LEFT JOIN comp c ON c.node = d.doc_id),
flagged AS (
  SELECT doc_id, group_key,
         CASE WHEN ('0x' || substr(md5(CAST(group_key AS VARCHAR)), 1, 7))::BIGINT
                   < {int(0.9 * _HASH_SPACE)} THEN 1 ELSE 0 END AS is_train
  FROM keyed),
docs_agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(is_train) AS BIGINT) AS n_train,
         CAST(COUNT(*) - SUM(is_train) AS BIGINT) AS n_eval
  FROM flagged),
grp AS (
  SELECT group_key, MAX(is_train) AS mx, MIN(is_train) AS mn
  FROM flagged GROUP BY group_key),
grp_agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
         CAST(SUM(CASE WHEN mx <> mn THEN 1 ELSE 0 END) AS BIGINT)
           AS groups_crossing_split
  FROM grp)
SELECT n_docs, n_train, n_eval, n_groups, groups_crossing_split
FROM docs_agg CROSS JOIN grp_agg
""",
)
def qs02_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r15: connected_components fused-convergence rewrite — body
    # touch for hash demotion
    """Leakage-safe train/eval split: near-duplicate documents must land
    in the SAME split, or eval leaks training data. Split by the hash of
    the dedup-cluster representative (qd08's connected components;
    singleton docs are their own group) instead of the doc id.

    The output proves the property in-data: ``groups_crossing_split``
    counts dedup groups with members in both splits — 0 by
    construction, and the oracle recomputes it from the recursive-CTE
    components. The pair generator is the package-default banded
    MinHash LSH (``operators.near_dup_pairs``), never the
    single-attribute-blocked qd02 baseline, so the whole lineage stays
    sub-quadratic. Scale: the split adds ONE broadcast-sized join (the
    component map covers only clustered docs, a tiny fraction of the
    corpus) on top of qd08's iterative components."""
    from event_stream_aggr_spark.operators.cluster import connected_components
    from event_stream_aggr_spark.operators.dedup import minhash_lsh_pairs

    d = load_table(spark, sf_dir, "documents")
    short = d.filter(F.col("n_chars") <= 160)
    pairs = minhash_lsh_pairs(short, bands=2, threshold=0.8).select("doc_a", "doc_b")
    # pair list is distinct over doc_a < doc_b (lsh_candidates) — skip
    # CC's edge dedup Exchange
    comp = connected_components(pairs, pairs_unique=True)
    keyed = d.select("doc_id").join(
        F.broadcast(comp), d["doc_id"] == comp["node"], "left"
    ).select(
        "doc_id", F.coalesce("component", "doc_id").alias("group_key")
    )
    cut = int(0.9 * _HASH_SPACE)
    flagged = keyed.select(
        "doc_id",
        "group_key",
        F.when(_key_hash(F.col("group_key")) < cut, 1).otherwise(0).alias("is_train"),
    )
    docs_agg = flagged.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("is_train").cast("long").alias("n_train"),
        (F.count(F.lit(1)) - F.sum("is_train")).cast("long").alias("n_eval"),
    )
    grp = flagged.groupBy("group_key").agg(
        F.max("is_train").alias("mx"), F.min("is_train").alias("mn")
    )
    grp_agg = grp.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum(F.when(F.col("mx") != F.col("mn"), 1).otherwise(0))
        .cast("long")
        .alias("groups_crossing_split"),
    )
    return docs_agg.crossJoin(grp_agg)


@register(
    "qs03_mixture_rebalance",
    tags=("sampling",),
    oracle=f"""
WITH counts AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents GROUP BY lang),
floor_n AS (SELECT MIN(n_docs) AS n_min FROM counts),
thresholds AS (
  SELECT lang, n_docs,
         CAST(FLOOR((CAST(n_min AS DOUBLE) / n_docs) * {_HASH_SPACE}) AS BIGINT)
           AS cut
  FROM counts CROSS JOIN floor_n),
kept AS (
  SELECT d.lang,
         CASE WHEN ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 7))::BIGINT
                   < t.cut THEN 1 ELSE 0 END AS keep
  FROM documents d JOIN thresholds t USING (lang))
SELECT k.lang, t.n_docs, CAST(SUM(k.keep) AS BIGINT) AS n_kept
FROM kept k JOIN thresholds t USING (lang)
GROUP BY k.lang, t.n_docs
ORDER BY k.lang
""",
)
def qs03_mixture_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture rebalancing: downsample every language to the
    smallest language's size by per-language content-hash thresholds —
    the deterministic version of "balance the domain mix before
    training". Each doc's keep/drop decision depends only on
    (doc_id, its language's threshold), so the sample is reproducible
    across engines, runs, and partitionings.

    Scale: per-language counts are a tiny aggregate broadcast back onto
    the corpus scan — the data itself never shuffles; the keep filter
    is a map-side predicate. The thresholds use floor((n_min/n_s) *
    2^28) — integer-anchored double math, bit-identical cross-engine."""
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    n_min = counts.agg(F.min("n_docs").alias("n_min"))
    thresholds = counts.crossJoin(F.broadcast(n_min)).select(
        "lang",
        "n_docs",
        F.floor(
            (F.col("n_min").cast("double") / F.col("n_docs")) * _HASH_SPACE
        )
        .cast("long")
        .alias("cut"),
    )
    kept = d.join(F.broadcast(thresholds), "lang").select(
        "lang",
        "n_docs",
        F.when(_key_hash(F.col("doc_id")) < F.col("cut"), 1)
        .otherwise(0)
        .alias("keep"),
    )
    return (
        kept.groupBy("lang", "n_docs")
        .agg(F.sum("keep").cast("long").alias("n_kept"))
        .orderBy("lang")
    )


@register(
    "qs04_temperature_mixture",
    tags=("sampling",),
    oracle=f"""
WITH counts AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents GROUP BY lang),
floor_n AS (SELECT MIN(n_docs) AS n_min FROM counts),
thresholds AS (
  SELECT lang, n_docs,
         CAST(FLOOR(sqrt(CAST(n_min AS DOUBLE) / n_docs) * {_HASH_SPACE}) AS BIGINT)
           AS cut
  FROM counts CROSS JOIN floor_n),
kept AS (
  SELECT d.lang,
         CASE WHEN ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 7))::BIGINT
                   < t.cut THEN 1 ELSE 0 END AS keep
  FROM documents d JOIN thresholds t USING (lang))
SELECT k.lang, t.n_docs, CAST(SUM(k.keep) AS BIGINT) AS n_kept
FROM kept k JOIN thresholds t USING (lang)
GROUP BY k.lang, t.n_docs
ORDER BY k.lang
""",
)
def qs04_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixture sampling (alpha = 0.5): keep rate per
    language = sqrt(n_min / n_lang) — the multilingual-training
    compromise between natural frequency (alpha=1) and qs03's full
    equalization (alpha=0). High-resource languages are downsampled
    sub-linearly, so they stay over-represented but no longer dominate.

    Determinism: the cut is floor(sqrt(n_min/n) * 2^28) — one sqrt of
    a ratio of two exact integers, the identical IEEE expression in
    both engines, floored to an integer threshold (the qs03 recipe).
    Scale: identical dataflow to qs03 — a tiny per-language aggregate
    broadcast back onto the scan; the corpus never shuffles."""
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    n_min = counts.agg(F.min("n_docs").alias("n_min"))
    thresholds = counts.crossJoin(F.broadcast(n_min)).select(
        "lang",
        "n_docs",
        F.floor(
            F.sqrt(F.col("n_min").cast("double") / F.col("n_docs")) * _HASH_SPACE
        )
        .cast("long")
        .alias("cut"),
    )
    kept = d.join(F.broadcast(thresholds), "lang").select(
        "lang",
        "n_docs",
        F.when(_key_hash(F.col("doc_id")) < F.col("cut"), 1).otherwise(0).alias("keep"),
    )
    return (
        kept.groupBy("lang", "n_docs")
        .agg(F.sum("keep").cast("long").alias("n_kept"))
        .orderBy("lang")
    )


def weighted_sample_keys(key: Column, weight: Column) -> Column:
    """Efraimidis–Spirakis exponential sort key for weighted sampling
    without replacement: k = -ln(u) / w with u a content-derived
    uniform in (0,1). Taking the n smallest keys draws a weighted
    sample whose inclusion probabilities match successive weighted
    draws — and because u comes from md5(key), the draw is
    deterministic across runs, engines, partitionings, and cluster
    sizes (the same reproducibility contract as ``hash_sample``).

    Cross-engine exactness: ln is the one non-correctly-rounded IEEE
    op here (Java Math.log vs libm log may differ in the last ULP),
    and decimal ROUND semantics differ between engines, so the key is
    NOT round(-ln(u)/w, 6). Instead -ln(u) is quantized to integer
    micro-nats with floor(x*1e6 + 0.5) — plain IEEE multiply/add/floor,
    bit-identical given the same ln — and the key is that integer
    divided by the integer weight: a single correctly-rounded IEEE
    division of identical integers, hence identical bits in Spark and
    DuckDB. Residual risk is ln landing within 1 ULP of a micro-nat
    boundary (~1e-9/row), vs systematic divergence for decimal ROUND."""
    u = (_key_hash(key).cast("double") + 0.5) / _HASH_SPACE
    lnu_us = F.floor(-F.log(u) * F.lit(1000000.0) + F.lit(0.5)).cast("long")
    return lnu_us.cast("double") / weight


@register(
    "qs05_weighted_sample",
    bench=True,
    tags=("sampling",),
    oracle=f"""
WITH keyed AS (
  SELECT doc_id, lang, n_chars,
         CAST(FLOOR(-ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7)) AS BIGINT)
                         + 0.5) / {_HASH_SPACE}) * 1000000.0 + 0.5) AS DOUBLE)
           / n_chars AS es_key
  FROM documents WHERE n_chars > 0),
ranked AS (
  SELECT doc_id, lang, n_chars, es_key,
         row_number() OVER (PARTITION BY lang ORDER BY es_key, doc_id) AS rn
  FROM keyed)
SELECT lang, doc_id, n_chars, es_key
FROM ranked WHERE rn <= 25
""",
)
def qs05_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement (the
    quality-weighted subset draw a curation pipeline runs before
    expensive stages): per language, the 25 documents drawn by
    Efraimidis–Spirakis exponential keys with n_chars as the weight —
    longer documents are proportionally likelier, yet the draw is
    fully reproducible because the uniforms derive from md5(doc_id),
    not an RNG.

    Scale shape: the key is a narrow per-row expression (no shuffle);
    the per-stratum top-k is one exchange on lang + a bounded window —
    at 100 TB with few strata, per-stratum top-k skew is the known
    hazard and the remedy is the two-phase top-k (per-partition
    pre-top-k then merge) that TakeOrderedAndProject applies to the
    global case; documented here, applied when strata are few.
    Keys are integer micro-nats / integer weight (exact cross-engine
    IEEE division — see weighted_sample_keys) with doc_id tiebreak."""
    from pyspark.sql import Window as W

    d = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    keyed = d.select(
        "doc_id",
        "lang",
        "n_chars",
        weighted_sample_keys(F.col("doc_id"), F.col("n_chars")).alias("es_key"),
    )
    w = W.partitionBy("lang").orderBy("es_key", "doc_id")
    return (
        keyed.select("*", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 25)
        .select("lang", "doc_id", "n_chars", "es_key")
    )


# ---------------------------------------------------------------------------
# Deterministic global shuffle + sharding (the "shuffle the corpus and
# write N shards" step before training)
# ---------------------------------------------------------------------------

N_SHARDS = 8


def shard_shuffle(df: DataFrame, key_col: str, n_shards: int = N_SHARDS) -> DataFrame:
    """(row, shard, pos): content-derived shard id + position within
    shard — a full-corpus shuffle with NO randomness and NO global
    sort. shard = md5-hash(key) mod n_shards (narrow, uniform); the
    intra-shard order key is an independent salted md5, so the order
    within a shard is decorrelated from the shard assignment.

    Scale (100 TB): the only wide op is the per-shard window. Choose
    n_shards ≈ corpus / target-shard-bytes (thousands), so one shard =
    one writer task = one output file, and the per-shard sort is the
    task-local sort a `repartition(shard).sortWithinPartitions(order)`
    writer does anyway — never a global orderBy. Re-running with the
    same key space reproduces byte-identical shards on any cluster
    size or input layout."""
    from pyspark.sql import Window as W

    shard = F.pmod(_key_hash(F.col(key_col)), n_shards).cast("long")
    order_key = F.md5(F.concat(F.lit("shuf:"), F.col(key_col).cast("string")))
    w = W.partitionBy("shard").orderBy("order_key", key_col)
    # carry EVERY input column — the docstring's (row, shard, pos)
    # contract; a payload-dropping select here would silently lose the
    # text/metadata of any caller that shards full rows
    return (
        df.select("*", shard.alias("shard"), order_key.alias("order_key"))
        .select("*", F.row_number().over(w).cast("long").alias("pos"))
        .drop("order_key")
    )


@register(
    "qs06_shard_shuffle",
    tags=("sampling", "shuffle"),
    oracle=f"""
WITH keyed AS (
  SELECT doc_id,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT % {N_SHARDS}
           AS shard,
         md5('shuf:' || CAST(doc_id AS VARCHAR)) AS order_key
  FROM documents)
SELECT doc_id, shard,
       CAST(row_number() OVER (PARTITION BY shard ORDER BY order_key, doc_id)
            AS BIGINT) AS pos
FROM keyed
""",
)
def qs06_shard_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-shard shuffle (the step between curation
    and tokenization): every document gets a reproducible (shard, pos)
    — see shard_shuffle for the scale contract. Registered over the
    documents table with doc_id as the content key."""
    d = load_table(spark, sf_dir, "documents")
    return shard_shuffle(d.select("doc_id"), "doc_id")


#: Length-curriculum phase boundaries (token counts): classic
#: short-to-long ordering — phase 0 trains first.
CURRICULUM_BOUNDS = (50, 200, 500)
CURRICULUM_SHARDS_PER_PHASE = 4


@register(
    "qs07_curriculum_shards",
    tags=("sampling", "shuffle"),
    oracle=f"""
WITH keyed AS (
  SELECT doc_id,
         len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tokens,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT
           % {CURRICULUM_SHARDS_PER_PHASE} AS shard,
         md5('cur:' || CAST(doc_id AS VARCHAR)) AS order_key
  FROM documents),
phased AS (
  SELECT doc_id, n_tokens, shard, order_key,
         CASE WHEN n_tokens < {CURRICULUM_BOUNDS[0]} THEN 0
              WHEN n_tokens < {CURRICULUM_BOUNDS[1]} THEN 1
              WHEN n_tokens < {CURRICULUM_BOUNDS[2]} THEN 2
              ELSE 3 END AS phase
  FROM keyed)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, phase, shard,
       CAST(row_number() OVER (PARTITION BY phase, shard
                               ORDER BY order_key, doc_id) AS BIGINT) AS pos
FROM phased
""",
)
def qs07_curriculum_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-curriculum sharding (the short-docs-first training order):
    every document gets (phase, shard, pos) where the phase comes from
    fixed token-count bounds (NOT quantiles — a map-side CASE, no
    global sort or distribution pass), the shard is a content-derived
    hash bucket within the phase, and pos is the salted intra-shard
    order (qs06's decorrelated order key, 'cur:' salt).

    Scale shape (100 TB): phase+shard assignment is narrow; the only
    wide op is the per-(phase, shard) window — with shards sized to
    target file bytes that is exactly the task-local sort of a
    partitioned writer, never a global orderBy. Quantile-based
    curricula need a distribution pass first; fixed bounds are the
    scale-correct choice when the tokenizer's length distribution is
    known (it always is, from qt16's data card)."""
    from pyspark.sql import Window as W

    from event_stream_aggr_spark.operators.text import token_count

    d = load_table(spark, sf_dir, "documents")
    b0, b1, b2 = CURRICULUM_BOUNDS
    # count tokens ONCE behind a projection boundary (rule 19): the
    # phase CASE would otherwise re-split the document per comparison
    counted = d.select(
        "doc_id", token_count(F.col("text")).alias("n_tokens")
    )
    keyed = counted.select(
        "doc_id",
        "n_tokens",
        F.pmod(_key_hash(F.col("doc_id")), CURRICULUM_SHARDS_PER_PHASE)
        .cast("long")
        .alias("shard"),
        F.md5(F.concat(F.lit("cur:"), F.col("doc_id").cast("string"))).alias(
            "order_key"
        ),
        F.when(F.col("n_tokens") < b0, 0)
        .when(F.col("n_tokens") < b1, 1)
        .when(F.col("n_tokens") < b2, 2)
        .otherwise(3)
        .alias("phase"),
    )
    w = W.partitionBy("phase", "shard").orderBy("order_key", "doc_id")
    return keyed.select(
        "doc_id",
        "n_tokens",
        "phase",
        "shard",
        F.row_number().over(w).cast("long").alias("pos"),
    )


# ---------------------------------------------------------------------------
# qs08: cluster-balanced sampling (diversity-aware corpus selection)
# ---------------------------------------------------------------------------

BALANCED_PER_CLUSTER = 20  # draws per k-means cluster


def balanced_sample_ctes() -> str:
    """CTE chain ``keyed → draws`` deriving the balanced draw from the
    ``assign`` CTE; shared with qp03's composed pipeline oracle."""
    return f"""keyed AS (
  SELECT code AS cluster, vec_id,
         md5('bal:' || CAST(vec_id AS VARCHAR)) AS order_key
  FROM assign),
draws AS (
  SELECT cluster, vec_id, draw_rank FROM (
    SELECT cluster, vec_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY cluster
                ORDER BY order_key, vec_id) AS BIGINT) AS draw_rank
    FROM keyed) t
  WHERE draw_rank <= {BALANCED_PER_CLUSTER})"""


def _qs08_oracle() -> str:
    from event_stream_aggr_spark.operators.similarity import km_assign_ctes

    return f"""
WITH {km_assign_ctes()},
{balanced_sample_ctes()}
SELECT cluster, vec_id, draw_rank FROM draws
"""


@register(
    "qs08_cluster_balanced_sample",
    tags=("sampling", "clustering"),
    oracle=_qs08_oracle(),
)
def qs08_cluster_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-balanced sampling: up to BALANCED_PER_CLUSTER draws per
    k-means cluster, ranked by a content-derived (salted-md5) order key
    — the diversity-flattening mix step (equal representation per
    learned topic, not per raw source) used to de-bias pretraining
    mixtures. Composes qe08's assignment with qs06's reproducible
    shuffle-order recipe: the draw is independent of partitioning,
    cluster sizes, and engine.

    Scale shape (100 TB): the assignment is qe08's broadcast-centroid
    dataflow; the balanced draw adds one keyed exchange on cluster id
    (bounded per-cluster state in the window — rank never looks past
    BALANCED_PER_CLUSTER ordered rows with a top-k pushdown)."""
    from pyspark.sql import Window as W

    from event_stream_aggr_spark.operators.similarity import kmeans_assign_shared

    # round 16: parallelize=False — this load feeds the SHARED k-means
    # assignment memo (kmeans_assign_shared); a repartitioned input both
    # forks the memo key and leaves the tiny checkpointed assignment in
    # 32 partitions, which cost every downstream consumer ~0.3-0.4 s of
    # empty-task stages (paired min-of-5: qe08 0.59x, qp03 0.65x).
    emb = load_table(spark, sf_dir, "embeddings", parallelize=False)
    keyed = kmeans_assign_shared(emb).select(
        F.col("code").alias("cluster"),
        "vec_id",
        F.md5(F.concat(F.lit("bal:"), F.col("vec_id").cast("string"))).alias(
            "order_key"
        ),
    )
    w = W.partitionBy("cluster").orderBy("order_key", "vec_id")
    return (
        keyed.select(
            "cluster",
            "vec_id",
            F.row_number().over(w).cast("long").alias("draw_rank"),
        )
        .filter(F.col("draw_rank") <= BALANCED_PER_CLUSTER)
    )


# ---------------------------------------------------------------------------
# qs09: temporal split with embargo (time-series leakage control)
# ---------------------------------------------------------------------------

TEMPORAL_CUT = "2024-01-25 00:00:00"
TEMPORAL_EMBARGO_START = "2024-01-24 00:00:00"  # 1-day gap before the cut


@register(
    "qs09_temporal_split",
    tags=("sampling", "split"),
    oracle=f"""
WITH lab AS (
  SELECT CASE WHEN ts < TIMESTAMP '{TEMPORAL_EMBARGO_START}' THEN 'train'
              WHEN ts < TIMESTAMP '{TEMPORAL_CUT}' THEN 'embargo'
              ELSE 'eval' END AS split,
         event_type, user_id, ts
  FROM events)
SELECT split, event_type, COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS first_ts,
       strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS last_ts
FROM lab GROUP BY split, event_type
""",
)
def qs09_temporal_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal train/eval split with an embargo gap (time-series
    leakage control): rows before the embargo window train, rows after
    the cut evaluate, and the gap between them is EXCLUDED from both —
    the standard guard against boundary leakage through correlated
    near-in-time rows (user sessions spanning the cut, duplicated
    content republished hours apart). Complements qs02's group-wise
    leakage-safe split with the time-axis version.

    Scale shape: one scan, the split label is a narrow CASE on the
    pushed-down timestamp column, and only the tiny per-(split, type)
    aggregate shuffles. TIMESTAMP_NTZ comparisons against literal
    cut points are session-timezone independent."""
    e = load_table(spark, sf_dir, "events")
    cut = F.lit(TEMPORAL_CUT).cast("timestamp_ntz")
    emb0 = F.lit(TEMPORAL_EMBARGO_START).cast("timestamp_ntz")
    lab = e.select(
        F.when(F.col("ts") < emb0, "train")
        .when(F.col("ts") < cut, "embargo")
        .otherwise("eval")
        .alias("split"),
        "event_type",
        "user_id",
        "ts",
    )
    return lab.groupBy("split", "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("first_ts"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("last_ts"),
    )


# ---------------------------------------------------------------------------
# qs10: fractional-epoch source upsampling (mixture epoching)
# ---------------------------------------------------------------------------

MAX_EPOCHS = 3.0  # repeat cap per source


@register(
    "qs10_epoch_expansion",
    tags=("sampling", "mixture"),
    oracle=f"""
WITH counts AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY lang),
tgt AS (SELECT MAX(n) AS max_n FROM counts),
factors AS (
  SELECT lang, LEAST({MAX_EPOCHS}, CAST(max_n AS DOUBLE) / n) AS factor
  FROM counts CROSS JOIN tgt),
perdoc AS (
  SELECT d.doc_id, d.lang,
         CAST(FLOOR(f.factor) AS BIGINT)
         + CASE WHEN ('0x' || substr(md5('ep:' || CAST(d.doc_id AS VARCHAR)), 1, 7))::BIGINT
                     < CAST(FLOOR((f.factor - FLOOR(f.factor)) * {_HASH_SPACE}) AS BIGINT)
                THEN 1 ELSE 0 END AS reps
  FROM documents d JOIN factors f USING (lang))
SELECT doc_id, lang, CAST(epoch AS BIGINT) AS epoch
FROM perdoc, LATERAL (SELECT unnest(generate_series(1, reps)) AS epoch) g
WHERE reps > 0
""",
)
def qs10_epoch_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fractional-epoch source upsampling (the mixture-epoching step of
    pretraining data prep): every source is repeated up to the size of
    the largest source, capped at MAX_EPOCHS — whole epochs replicate
    every document, and the fractional remainder takes a
    content-derived (md5) subset, so e.g. factor 2.3 means each doc
    appears twice and a reproducible 30% appear a third time. Output
    is the expanded (doc_id, lang, epoch) stream a shard writer
    consumes.

    Scale shape: per-stratum counts are a tiny aggregate broadcast
    back onto the unshuffled scan; expansion is a narrow
    explode(sequence(1, reps)) — output volume is the mixture's
    token budget, input is scanned once. The fractional draw compares
    the 28-bit md5 bucket against floor(frac·2^28) — an exact integer
    comparison, reproducible across engines and partitionings (qs01's
    hash-band recipe)."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    counts = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    tgt = counts.agg(F.max("n").alias("max_n"))
    factors = counts.crossJoin(F.broadcast(tgt)).select(
        "lang",
        F.least(
            F.lit(MAX_EPOCHS), F.col("max_n").cast("double") / F.col("n")
        ).alias("factor"),
    )
    frac_cut = F.floor(
        (F.col("factor") - F.floor(F.col("factor"))) * _HASH_SPACE
    ).cast("long")
    reps = (
        F.floor("factor").cast("long")
        + F.when(
            _key_hash(F.concat(F.lit("ep:"), F.col("doc_id").cast("string")))
            < frac_cut,
            1,
        ).otherwise(0)
    )
    perdoc = d.join(F.broadcast(factors), "lang").select(
        "doc_id", "lang", reps.alias("reps")
    )
    return (
        perdoc.filter(F.col("reps") > 0)
        .select(
            "doc_id",
            "lang",
            F.explode(F.sequence(F.lit(1).cast("long"), F.col("reps"))).alias(
                "epoch"
            ),
        )
    )


# ---------------------------------------------------------------------------
# qs11: fixed-budget stratified sample via largest-remainder quotas
# ---------------------------------------------------------------------------

STRATIFIED_BUDGET = 100  # total docs to draw across all strata


@register(
    "qs11_stratified_quota_sample",
    tags=("sampling",),
    oracle=f"""
WITH counts AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents GROUP BY lang),
tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS total FROM counts),
alloc AS (
  SELECT lang, n_docs,
         (n_docs * {STRATIFIED_BUDGET}) // total AS floor_q,
         n_docs * {STRATIFIED_BUDGET} - ((n_docs * {STRATIFIED_BUDGET}) // total)
           * total AS rem
  FROM counts CROSS JOIN tot),
deficit AS (
  SELECT {STRATIFIED_BUDGET} - CAST(SUM(floor_q) AS BIGINT) AS d FROM alloc),
quotas AS (
  SELECT lang, CAST(floor_q + CASE WHEN rnk <= d THEN 1 ELSE 0 END AS BIGINT)
           AS quota
  FROM (SELECT lang, floor_q, rem,
               ROW_NUMBER() OVER (ORDER BY rem DESC, lang) AS rnk
        FROM alloc) a CROSS JOIN deficit),
ranked AS (
  SELECT d.doc_id, d.lang, q.quota,
         CAST(ROW_NUMBER() OVER (PARTITION BY d.lang
              ORDER BY md5('strat:' || CAST(d.doc_id AS VARCHAR)), d.doc_id)
           AS BIGINT) AS draw_rank
  FROM documents d JOIN quotas q USING (lang))
SELECT doc_id, lang, quota, draw_rank FROM ranked WHERE draw_rank <= quota
""",
)
def qs11_stratified_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-budget stratified sampling with largest-remainder (Hamilton)
    quota allocation: draw EXACTLY STRATIFIED_BUDGET documents total,
    each language stratum getting floor(n_s·Q/N) draws plus one of the
    leftover units by descending fractional remainder (ties →
    alphabetical) — the eval-set construction rule when "100 docs,
    proportionally representative" must mean exactly 100, which
    per-stratum rate rounding (qs03's shape) cannot guarantee.

    Determinism: the allocation is pure integer arithmetic (n_s·Q
    integer-divided by N; remainders are integers), and the
    within-stratum draw reuses the content-hash order recipe (qs06) —
    bit-exact cross-engine, partition-independent.

    Scale shape (100 TB): stratum counts are a tiny aggregate; the
    remainder-ranking window runs on the STRATA relation (metadata
    grain — the single-partition window holds K strata, not data);
    quotas broadcast back onto the scan and the per-stratum top-quota
    is the bounded-state rank window (top-k pushdown caps it)."""
    from pyspark.sql import Window as W

    q = STRATIFIED_BUDGET
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    tot = counts.agg(F.sum("n_docs").alias("total"))
    alloc = counts.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        F.expr(f"(n_docs * {q}) div total").alias("floor_q"),
        F.expr(f"n_docs * {q} - ((n_docs * {q}) div total) * total").alias("rem"),
    )
    deficit = alloc.agg((F.lit(q) - F.sum("floor_q")).alias("d"))
    wr = W.orderBy(F.desc("rem"), "lang")  # strata-grain: K rows
    quotas = (
        alloc.select("lang", "floor_q", "rem", F.row_number().over(wr).alias("rnk"))
        .crossJoin(F.broadcast(deficit))
        .select(
            "lang",
            (
                F.col("floor_q")
                + F.when(F.col("rnk") <= F.col("d"), 1).otherwise(0)
            )
            .cast("long")
            .alias("quota"),
        )
    )
    wd = W.partitionBy("lang").orderBy(
        F.md5(F.concat(F.lit("strat:"), F.col("doc_id").cast("string"))), "doc_id"
    )
    return (
        d.join(F.broadcast(quotas), "lang")
        .select(
            "doc_id",
            "lang",
            "quota",
            F.row_number().over(wd).cast("long").alias("draw_rank"),
        )
        .filter(F.col("draw_rank") <= F.col("quota"))
    )


# ---------------------------------------------------------------------------
# qs12: group-aware k-fold assignment (cross-validation splits)
# ---------------------------------------------------------------------------

KFOLD_K = 5


@register(
    "qs12_group_kfold",
    tags=("sampling", "split"),
    oracle=f"""
WITH folds AS (
  SELECT event_id, event_type, user_id,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 7))::BIGINT
           % {KFOLD_K} AS fold
  FROM events),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM folds)
SELECT fold,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_purchase,
       ROUND(CAST(COUNT(*) AS DOUBLE) / MIN(t.n_total), 6) AS frac
FROM folds CROSS JOIN tot t
GROUP BY fold
""",
)
def qs12_group_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-aware k-fold assignment for cross-validation: every event
    lands in fold = hash(user_id) mod 5, so a USER never straddles a
    train/validation boundary (the group-leakage mode qs02 guards for
    a single split, generalized to k folds). The audit rows report
    per-fold volume, group count, and class balance — the checks run
    before trusting CV variance.

    Scale shape: fold assignment is a map-side deterministic hash
    (content-addressed — stable under repartition, replay, and engine,
    the same md5-prefix recipe as qs01); the audit is one hash
    aggregation to k rows. No shuffle of raw events beyond it.
    """
    e = load_table(spark, sf_dir, "events")
    folds = e.select(
        "event_id",
        "event_type",
        "user_id",
        (_key_hash(F.col("user_id")) % KFOLD_K).alias("fold"),
    )
    tot = folds.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        folds.crossJoin(F.broadcast(tot))
        .groupBy("fold")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
                "n_purchase"
            ),
            F.round(F.count(F.lit(1)).cast("double") / F.min("n_total"), 6).alias(
                "frac"
            ),
        )
    )


# ---------------------------------------------------------------------------
# qs13: deterministic negative sampling (two-tower / recsys training data)
# ---------------------------------------------------------------------------

NEG_K = 4  # negatives kept per user
NEG_OVERSAMPLE = 12  # candidate draws before collision/positive filtering
NEG_ITEM_SPACE = 2000  # part key space [0, 2000)


@register(
    "qs13_negative_sampling",
    tags=("sampling", "training-data"),
    oracle=f"""
WITH pos AS (
  SELECT DISTINCT o.o_custkey AS user_id, l.l_partkey AS item_id
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
users AS (SELECT DISTINCT user_id FROM pos),
cand AS (
  SELECT u.user_id, g.i,
         ('0x' || substr(md5('neg:' || CAST(u.user_id AS VARCHAR)
                              || ':' || CAST(g.i AS VARCHAR)), 1, 7))::BIGINT
           % {NEG_ITEM_SPACE} AS item_id
  FROM users u,
       LATERAL (SELECT unnest(generate_series(1, {NEG_OVERSAMPLE})) AS i) g),
neg AS (
  SELECT c.user_id, c.item_id, MIN(c.i) AS first_draw
  FROM cand c
  WHERE NOT EXISTS (SELECT 1 FROM pos p
                    WHERE p.user_id = c.user_id AND p.item_id = c.item_id)
  GROUP BY c.user_id, c.item_id),
ranked AS (
  SELECT user_id, item_id, first_draw,
         CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                 ORDER BY first_draw) AS BIGINT) AS draw_rank
  FROM neg)
SELECT user_id, draw_rank, item_id
FROM ranked WHERE draw_rank <= {NEG_K}
""",
)
def qs13_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling — the data-prep step every
    two-tower/recsys/contrastive trainer needs beside its positives
    (qe11 mines hard negatives from embeddings; this draws the
    UNIFORM negatives): per interacting customer, 4 parts they never
    bought, drawn by content hash so the sample is identical across
    runs, engines, partitionings, and retries. Oversampled 3× then
    filtered, so hash collisions with positives or duplicate draws
    can't starve a user below k except in the (deterministic,
    surviving-draw-count) extreme.

    Scale shape: candidates are |users|·12 narrow rows generated
    map-side from the user list; the positive filter is ONE
    (user, item)-keyed anti-join against the interaction table —
    never a per-draw lookup loop; ranking is a per-user window over
    ≤12 rows. The interaction table itself is touched once for the
    distinct and once for the anti-join probe.
    """
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    pos = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            F.col("o_custkey").alias("user_id"), F.col("l_partkey").alias("item_id")
        )
        .distinct()
    )
    users = pos.select("user_id").distinct()
    cand = users.select(
        "user_id",
        F.explode(F.sequence(F.lit(1), F.lit(NEG_OVERSAMPLE))).alias("i"),
    ).select(
        "user_id",
        "i",
        (
            _key_hash(
                F.concat(
                    F.lit("neg:"),
                    F.col("user_id").cast("string"),
                    F.lit(":"),
                    F.col("i").cast("string"),
                )
            )
            % NEG_ITEM_SPACE
        ).alias("item_id"),
    )
    neg = (
        cand.join(pos, ["user_id", "item_id"], "left_anti")
        .groupBy("user_id", "item_id")
        .agg(F.min("i").alias("first_draw"))
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("first_draw")
    return (
        neg.select(
            "user_id",
            "item_id",
            F.row_number().over(w).cast("long").alias("draw_rank"),
        )
        .where(F.col("draw_rank") <= NEG_K)
        .select("user_id", "draw_rank", "item_id")
    )


# ---------------------------------------------------------------------------
# qs14: DSIR importance RESAMPLING — Gumbel-top-k draw on the qt22 weights
# ---------------------------------------------------------------------------

DSIR_DRAW_K = 50


def _register_dsir_resample_query():
    from event_stream_aggr_spark.operators.text import (
        DSIR_TARGET_LANG,
        DSIR_WEIGHT_CTES,
        dsir_doc_weights,
    )

    @register(
        "qs14_dsir_resample",
        tags=("sampling", "training-data"),
        oracle=f"""
WITH {DSIR_WEIGHT_CTES},
keyed AS (
  SELECT doc_id, lang, n_tokens,
         CAST(wdec * 1000000 AS BIGINT)
         + CAST(FLOOR(-ln(-ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7))
                                    AS BIGINT) + 0.5) / {16**7}))
                      * 1000000.0 + 0.5) AS BIGINT) AS key_us,
         CAST(wdec AS DOUBLE) AS log_weight
  FROM perdoc WHERE lang <> '{DSIR_TARGET_LANG}'),
ranked AS (
  SELECT doc_id, lang, n_tokens, log_weight, key_us,
         ROW_NUMBER() OVER (ORDER BY key_us DESC, doc_id) AS rn
  FROM keyed)
SELECT doc_id, lang, n_tokens, log_weight, key_us
FROM ranked WHERE rn <= {DSIR_DRAW_K}
""",
    )
    def qs14_dsir_resample(spark, sf_dir):
        """DSIR closed end-to-end (the selection qt22 only scores):
        draw {DSIR_DRAW_K} out-of-target documents with probability
        ∝ exp(importance log-ratio) WITHOUT replacement via the
        Gumbel-top-k trick — key = log-weight + Gumbel(0,1) noise,
        take the k largest. The published importance-resampling
        selection step (Xie et al. 2023), with the Gumbel-max
        equivalence (Vieira 2014) replacing an explicit normalized
        draw so no global weight normalization pass is needed.

        Determinism: the per-doc log-weight is qt22's exact
        DECIMAL(18,6) sum → ·10⁶ is an exact integer; the Gumbel
        noise is content-derived (-ln(-ln(u)) with u from md5,
        quantized to integer micro-nats with the qs05 floor recipe);
        the draw key is the SUM OF TWO INTEGERS — ranking and
        tiebreaks (doc_id) are bit-exact cross-engine.

        Scale shape (100 TB): weights come from the shared
        broadcast-calibration dataflow (dsir_doc_weights — two
        vocab-bounded count tables broadcast onto the token stream);
        keying is a map-side expression; the k-cut is
        TakeOrderedAndProject. Nothing new shuffles beyond qt22's own
        aggregation; the draw itself is embarrassingly parallel."""
        d = load_table(spark, sf_dir, "documents")
        perdoc = dsir_doc_weights(d).where(F.col("lang") != DSIR_TARGET_LANG)
        u = (_key_hash(F.col("doc_id")).cast("double") + 0.5) / _HASH_SPACE
        gumbel_us = F.floor(-F.log(-F.log(u)) * 1000000.0 + 0.5).cast("long")
        keyed = perdoc.select(
            "doc_id",
            "lang",
            "n_tokens",
            F.col("wdec").cast("double").alias("log_weight"),
            ((F.col("wdec") * 1000000).cast("long") + gumbel_us).alias("key_us"),
        )
        return keyed.orderBy(F.desc("key_us"), "doc_id").limit(DSIR_DRAW_K)

    return qs14_dsir_resample


_register_dsir_resample_query()


# ---------------------------------------------------------------------------
# qs15: mixture apportionment — largest-remainder token-budget allocation
# ---------------------------------------------------------------------------

MIX_BUDGET_DIV = 2  # global budget = total corpus tokens div 2


@register(
    "qs15_mixture_apportionment",
    tags=("sampling", "training-data", "planner"),
    oracle=f"""
WITH src AS (
  SELECT source,
         CAST(SUM(len(list_filter(string_split(text, ' '), x -> x <> '')))
              AS BIGINT) AS tokens
  FROM documents GROUP BY source),
wt AS (
  SELECT source, tokens,
         CAST(FLOOR(sqrt(CAST(tokens AS DOUBLE))) AS BIGINT) AS w
  FROM src),
tot AS (
  SELECT CAST(SUM(w) AS BIGINT) AS sw,
         CAST(SUM(tokens) AS BIGINT) // {MIX_BUDGET_DIV} AS budget
  FROM wt),
base AS (
  SELECT source, tokens, w,
         CAST((budget * w) // sw AS BIGINT) AS quota_base,
         CAST((budget * w) % sw AS BIGINT) AS remainder,
         budget, sw
  FROM wt, tot),
leftover AS (
  SELECT MIN(budget) - SUM(quota_base) AS extra_seats FROM base),
ranked AS (
  SELECT source, tokens, w, quota_base, remainder,
         ROW_NUMBER() OVER (ORDER BY remainder DESC, source) AS rnk
  FROM base)
SELECT r.source, r.tokens, r.w AS weight, r.quota_base,
       CAST(r.rnk <= l.extra_seats AS BIGINT) AS extra,
       CAST(r.quota_base + CAST(r.rnk <= l.extra_seats AS BIGINT) AS BIGINT)
         AS final_quota
FROM ranked r, leftover l
""",
)
def qs15_mixture_apportionment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pretraining-mixture apportionment: split a global token budget
    (half the corpus here) across sources with weights ∝ √tokens —
    qs04's temperature-0.5 compromise — using LARGEST-REMAINDER
    (Hamilton) rounding so the integer per-source quotas sum EXACTLY
    to the budget: quota = floor(B·w/W) plus one extra token-seat for
    the largest fractional remainders. The planning step before qs05's
    weighted draw executes a mixture: this query decides how much each
    source contributes, deterministically and without float drift
    (naive round() over- or under-shoots the budget; largest-remainder
    is the standard fix, same math as parliamentary seat allocation).

    Determinism: weights are floor(sqrt(integer)) — one
    correctly-rounded IEEE sqrt both engines agree on; quotas and
    remainders are exact integer div/mod; the extra-seat cut is a rank
    over integers with source tiebreak.

    Scale shape (100 TB): the corpus reduces once to per-source token
    counts (map-side combinable); everything else lives on the
    |sources|-row relation — one tiny window, one 1-row broadcast.
    Conservation (Σ final_quota = budget) is structural, and
    tested."""
    d = load_table(spark, sf_dir, "documents")
    src = d.groupBy("source").agg(
        F.sum(
            F.size(F.filter(F.split(F.col("text"), " "), lambda x: x != ""))
        )
        .cast("long")
        .alias("tokens")
    )
    wt = src.select(
        "source",
        "tokens",
        F.floor(F.sqrt(F.col("tokens").cast("double"))).cast("long").alias("w"),
    )
    tot = wt.agg(
        F.sum("w").cast("long").alias("sw"),
        F.expr(f"sum(tokens) div {MIX_BUDGET_DIV}").cast("long").alias("budget"),
    )
    base = wt.crossJoin(F.broadcast(tot)).select(
        "source",
        "tokens",
        "w",
        F.expr("(budget * w) div sw").alias("quota_base"),
        F.expr("(budget * w) % sw").alias("remainder"),
        "budget",
    )
    leftover = base.agg(
        (F.min("budget") - F.sum("quota_base")).alias("extra_seats")
    )
    from pyspark.sql import Window as W

    ranked = base.select(
        "source",
        "tokens",
        "w",
        "quota_base",
        F.row_number()
        .over(W.orderBy(F.desc("remainder"), "source"))
        .alias("rnk"),
    )
    return ranked.crossJoin(F.broadcast(leftover)).select(
        "source",
        "tokens",
        F.col("w").alias("weight"),
        "quota_base",
        (F.col("rnk") <= F.col("extra_seats")).cast("long").alias("extra"),
        (
            F.col("quota_base")
            + (F.col("rnk") <= F.col("extra_seats")).cast("long")
        ).cast("long").alias("final_quota"),
    )


# ---------------------------------------------------------------------------
# qs16: Poisson bootstrap — resampling-free confidence estimation at scale
# ---------------------------------------------------------------------------

#: Inverse-CDF thresholds of Poisson(1) on the 28-bit hash space:
#: floor(P(X <= k) * 16^7) for k = 0..7 (weights capped at 8). Both
#: engines compare hashes against these SAME integer literals.
BOOT_THRESHOLDS = (
    98751885, 197503771, 246879713, 263338361,
    267453023, 268275955, 268413111, 268432704,
)
BOOT_REPLICATES = 3


def _register_poisson_bootstrap_query():
    def weight_sql(rep: int) -> str:
        h = (f"('0x' || substr(md5('boot:{rep}:' ||"
             f" CAST(o_orderkey AS VARCHAR)), 1, 7))::BIGINT")
        terms = " + ".join(
            f"CASE WHEN {h} >= {t} THEN 1 ELSE 0 END" for t in BOOT_THRESHOLDS
        )
        return f"({terms})"

    rep_cols = ", ".join(
        f"""CAST(SUM({weight_sql(r)} * CAST(o_totalprice AS DECIMAL(18,2)))
             AS DOUBLE)
           / SUM({weight_sql(r)}) AS m{r}"""
        for r in range(BOOT_REPLICATES)
    )

    @register(
        "qs16_poisson_bootstrap",
        tags=("sampling", "stats"),
        oracle=f"""
WITH agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
           / COUNT(*) AS mean_price,
         {rep_cols}
  FROM orders)
SELECT n_rows, ROUND(mean_price, 6) AS mean_price,
       ROUND(m0, 6) AS boot0_mean, ROUND(m1, 6) AS boot1_mean,
       ROUND(m2, 6) AS boot2_mean,
       ROUND(GREATEST(m0, m1, m2) - LEAST(m0, m1, m2), 6) AS boot_spread
FROM agg
""",
    )
    def qs16_poisson_bootstrap(spark, sf_dir):
        """Poisson bootstrap (the resampling trick that makes
        bootstrap confidence intervals feasible on distributed data —
        Chamandy et al./Google's "Estimating uncertainty for massive
        data streams"): instead of drawing n rows with replacement
        (impossible without a global pass), each row enters replicate
        r with an independent Poisson(1) weight, giving replicate
        estimates whose spread estimates the sampling variability of
        the statistic — here the mean order price, with
        {BOOT_REPLICATES} replicates and their range.

        Determinism: the Poisson draw is the inverse CDF applied to a
        content-derived md5 uniform — weights count how many of the 8
        precomputed integer thresholds the hash clears, so both
        engines draw the IDENTICAL weight for every (row, replicate);
        weighted sums are exact DECIMAL.

        Scale shape (100 TB): ONE map-side-combinable aggregation
        computes the point estimate and every replicate (weights are
        inline expressions — no data duplication, no 3× fan-out, no
        shuffle beyond the single-row merge); adding replicates adds
        columns, not passes. This is the qi01 monoid again: per-
        partition (Σwx, Σw) pairs merge associatively."""
        from pyspark.sql import functions as F

        from event_stream_aggr_spark.tables import load_table

        o = load_table(spark, sf_dir, "orders")

        def weight(rep: int) -> F.Column:
            h = F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit(f"boot:{rep}:"),
                            F.col("o_orderkey").cast("string"),
                        )
                    ),
                    1,
                    7,
                ),
                16,
                10,
            ).cast("long")
            w = F.lit(0)
            for t in BOOT_THRESHOLDS:
                w = w + F.when(h >= t, 1).otherwise(0)
            return w

        price = F.col("o_totalprice").cast("decimal(18,2)")
        aggs = [
            F.count(F.lit(1)).alias("n_rows"),
            (F.sum(price).cast("double") / F.count(F.lit(1))).alias("mp"),
        ]
        for r in range(BOOT_REPLICATES):
            w = weight(r)
            aggs.append(
                (F.sum(w * price).cast("double") / F.sum(w)).alias(f"m{r}")
            )
        agg = o.agg(*aggs)
        return agg.select(
            "n_rows",
            F.round("mp", 6).alias("mean_price"),
            F.round("m0", 6).alias("boot0_mean"),
            F.round("m1", 6).alias("boot1_mean"),
            F.round("m2", 6).alias("boot2_mean"),
            F.round(
                F.greatest("m0", "m1", "m2") - F.least("m0", "m1", "m2"), 6
            ).alias("boot_spread"),
        )

    return qs16_poisson_bootstrap


_register_poisson_bootstrap_query()


# ---------------------------------------------------------------------------
# qs17: mixture EXECUTION — hash-rate downsampling against qs15's quotas
# ---------------------------------------------------------------------------


@register(
    "qs17_mixture_execution",
    tags=("sampling", "training-data", "pipeline"),
    oracle=f"""
WITH perdoc AS (
  SELECT doc_id, source,
         CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
              AS BIGINT) AS dtok
  FROM documents),
src AS (
  SELECT source, CAST(SUM(dtok) AS BIGINT) AS tokens
  FROM perdoc GROUP BY source),
wt AS (
  SELECT source, tokens,
         CAST(FLOOR(sqrt(CAST(tokens AS DOUBLE))) AS BIGINT) AS w
  FROM src),
tot AS (
  SELECT CAST(SUM(w) AS BIGINT) AS sw,
         CAST(SUM(tokens) AS BIGINT) // {MIX_BUDGET_DIV} AS budget
  FROM wt),
base AS (
  SELECT source, tokens, w,
         CAST((budget * w) // sw AS BIGINT) AS quota_base,
         CAST((budget * w) % sw AS BIGINT) AS remainder,
         budget
  FROM wt, tot),
leftover AS (SELECT MIN(budget) - SUM(quota_base) AS extra FROM base),
quotas AS (
  SELECT source, tokens,
         quota_base + CAST(rnk <= l.extra AS BIGINT) AS final_quota
  FROM (SELECT source, tokens, quota_base,
               ROW_NUMBER() OVER (ORDER BY remainder DESC, source) AS rnk
        FROM base) b, leftover l),
kept AS (
  SELECT p.source,
         CAST(SUM(CASE WHEN CAST(('0x' || substr(md5(CAST(p.doc_id AS VARCHAR)),
                             1, 7))::BIGINT AS HUGEINT) * q.tokens
                        < CAST(q.final_quota AS HUGEINT) * {_HASH_SPACE}
                       THEN p.dtok ELSE 0 END) AS BIGINT) AS kept_tokens
  FROM perdoc p JOIN quotas q USING (source)
  GROUP BY p.source)
SELECT q.source, q.tokens, q.final_quota, k.kept_tokens,
       CAST(CASE WHEN q.final_quota > 0
                 THEN CAST(k.kept_tokens AS HUGEINT) * 1000000 // q.final_quota
                 ELSE 0 END AS BIGINT) AS achievement_ppm
FROM quotas q JOIN kept k USING (source)
""",
)
def qs17_mixture_execution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture EXECUTION (the doing half of qs15's planning): each
    source's Hamilton token quota becomes a deterministic per-doc
    keep rate — doc kept iff md5-hash · source_tokens <
    quota · hash_space, i.e. keep probability = quota/tokens — and
    the achieved kept-token mass is audited against the quota in ppm.
    Together qs15→qs17 are the full pretraining-mixture pipeline:
    apportion a budget, execute it with content-derived sampling
    (reproducible across runs/partitionings/engines), measure the
    miss (documents are token-lumpy, so achievement ≈ 10⁶ ± the
    heavy-doc noise the audit exposes — feeding the next re-plan).

    Scale shape (100 TB): ONE corpus pass to per-doc token counts,
    per-source rollup (map-side), the tiny quota relation broadcast
    back, and the keep decision + achieved-mass fold in the SAME
    second aggregation — two fact passes total, no entity sort,
    integer cross-multiplied thresholds (never float rates)."""
    d = load_table(spark, sf_dir, "documents")
    perdoc = d.select(
        "doc_id",
        "source",
        F.size(F.filter(F.split(F.col("text"), " "), lambda x: x != ""))
        .cast("long")
        .alias("dtok"),
    )
    src = perdoc.groupBy("source").agg(F.sum("dtok").alias("tokens"))
    wt = src.select(
        "source",
        "tokens",
        F.floor(F.sqrt(F.col("tokens").cast("double"))).cast("long").alias("w"),
    )
    tot = wt.agg(
        F.sum("w").cast("long").alias("sw"),
        F.expr(f"sum(tokens) div {MIX_BUDGET_DIV}").cast("long").alias("budget"),
    )
    base = wt.crossJoin(F.broadcast(tot)).select(
        "source",
        "tokens",
        F.expr("(budget * w) div sw").alias("quota_base"),
        F.expr("(budget * w) % sw").alias("remainder"),
        "budget",
    )
    leftover = base.agg(
        (F.min("budget") - F.sum("quota_base")).alias("extra")
    )
    from pyspark.sql import Window as W

    ranked = base.select(
        "source",
        "tokens",
        "quota_base",
        F.row_number()
        .over(W.orderBy(F.desc("remainder"), "source"))
        .alias("rnk"),
    )
    quotas = ranked.crossJoin(F.broadcast(leftover)).select(
        "source",
        "tokens",
        (
            F.col("quota_base")
            + (F.col("rnk") <= F.col("extra")).cast("long")
        ).alias("final_quota"),
    )
    kept = (
        perdoc.join(F.broadcast(quotas), "source")
        .groupBy("source")
        .agg(
            F.sum(
                F.when(
                    # hash·tokens can reach ~2.7e8 · 1e13 ≈ 2.7e21 at
                    # web-corpus scale — past BIGINT. Promote to
                    # DECIMAL(38,0) (DuckDB side: HUGEINT) so the
                    # keep decision stays exact at any corpus size.
                    _key_hash(F.col("doc_id")).cast("decimal(38,0)")
                    * F.col("tokens")
                    < F.col("final_quota").cast("decimal(38,0)") * _HASH_SPACE,
                    F.col("dtok"),
                ).otherwise(0)
            )
            .cast("long")
            .alias("kept_tokens")
        )
    )
    return (
        quotas.join(kept, "source")
        .select(
            "source",
            "tokens",
            "final_quota",
            "kept_tokens",
            F.when(
                F.col("final_quota") > 0,
                # same DECIMAL(38,0)/HUGEINT promotion as the keep
                # decision: kept_tokens·10⁶ ≈ 1e19 at 1e13 tokens/source
                F.expr(
                    "cast(kept_tokens as decimal(38,0)) * 1000000"
                    " div final_quota"
                ),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("achievement_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# qs19: the temperature dial — mixture shares across alpha values
# ---------------------------------------------------------------------------

#: alpha grid; each weight w = tokens^alpha is expressed through the
#: correctly-rounded IEEE ops both engines share: sqrt (and products
#: of sqrts) — never pow(), which is not correctly rounded.
TEMP_ALPHAS = ("0", "0.25", "0.5", "0.75", "1")


def _temp_weight_sql(alpha: str) -> str:
    t = "CAST(tokens AS DOUBLE)"
    return {
        "0": "1.0",
        "0.25": f"sqrt(sqrt({t}))",
        "0.5": f"sqrt({t})",
        "0.75": f"sqrt({t}) * sqrt(sqrt({t}))",
        "1": t,
    }[alpha]


@register(
    "qs19_temperature_sweep",
    tags=("sampling", "training-data", "planner"),
    oracle=f"""
WITH src AS (
  SELECT source,
         CAST(SUM(len(list_filter(string_split(text, ' '), x -> x <> '')))
              AS BIGINT) AS tokens
  FROM documents GROUP BY source),
wq AS (
  SELECT source, tokens,
         {", ".join(
            f"CAST(FLOOR({_temp_weight_sql(a)} * 1000000) AS BIGINT)"
            f" AS w{i}" for i, a in enumerate(TEMP_ALPHAS))}
  FROM src),
tot AS (
  SELECT {", ".join(f"CAST(SUM(w{i}) AS BIGINT) AS t{i}"
                    for i in range(len(TEMP_ALPHAS)))}
  FROM wq)
SELECT source, tokens,
       {", ".join(
          f"CAST(w{i} * 1000000 // t{i} AS BIGINT) AS share_a{a.replace('.', '_')}_ppm"
          for i, a in enumerate(TEMP_ALPHAS))}
FROM wq, tot
""",
)
def qs19_temperature_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The temperature dial: per-source mixture share at every
    alpha ∈ {{0, ¼, ½, ¾, 1}} (weight ∝ tokens^alpha) in one table —
    the decision artifact behind qs03 (alpha=0, equalized), qs04
    (alpha=½) and the natural mix (alpha=1): reading ACROSS a row
    shows how much a small source gains as temperature drops, which
    is how the alpha is actually chosen before qs15 apportions and
    qs17 executes.

    Determinism: tokens^alpha is built ONLY from correctly-rounded
    IEEE ops (sqrt and products of sqrts — pow() is not correctly
    rounded and never appears), quantized to integer micro-units
    BEFORE summing so the normalization is exact integer
    cross-multiplication.

    Scale shape (100 TB): one corpus reduction to per-source token
    counts; the whole sweep then lives on the |sources|-row relation
    with a 1-row total broadcast — alphas add columns, not passes."""
    d = load_table(spark, sf_dir, "documents")
    src = d.groupBy("source").agg(
        F.sum(
            F.size(F.filter(F.split(F.col("text"), " "), lambda x: x != ""))
        )
        .cast("long")
        .alias("tokens")
    )
    t = F.col("tokens").cast("double")
    weights = {
        "0": F.lit(1.0),
        "0.25": F.sqrt(F.sqrt(t)),
        "0.5": F.sqrt(t),
        "0.75": F.sqrt(t) * F.sqrt(F.sqrt(t)),
        "1": t,
    }
    wq = src.select(
        "source",
        "tokens",
        *[
            F.floor(weights[a] * 1_000_000).cast("long").alias(f"w{i}")
            for i, a in enumerate(TEMP_ALPHAS)
        ],
    )
    tot = wq.agg(
        *[
            F.sum(f"w{i}").cast("long").alias(f"t{i}")
            for i in range(len(TEMP_ALPHAS))
        ]
    )
    return wq.crossJoin(F.broadcast(tot)).select(
        "source",
        "tokens",
        *[
            F.expr(f"w{i} * 1000000 div t{i}")
            .cast("long")
            .alias(f"share_a{a.replace('.', '_')}_ppm")
            for i, a in enumerate(TEMP_ALPHAS)
        ],
    )
