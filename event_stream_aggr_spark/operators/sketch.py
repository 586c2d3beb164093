"""Count-min sketch — the fixed-memory frequency estimator that
answers "how often did key X occur" over a stream the way HLL (qi02)
answers "how many distinct keys": d×w integer counters, each key
incrementing one counter per row via d independent hashes; a point
estimate is the MIN over its d counters, which can only ever
OVER-estimate (collisions add, never subtract) — the one-sided error
bound that makes CMS safe for quota/abuse/heavy-hitter gating.

Like operators/bloom.py, the hashes are exact-BIGINT Knuth
multiplicative mixing so the DuckDB oracle rebuilds the IDENTICAL
counter table — the sketch here is deterministic data, not an
engine-private aggregate, which is also what makes it a mergeable
monoid (counters add cell-wise; same IVM contract as qi01).

Sketch size is d·w counters (3×512 here — a few KB broadcast)
regardless of stream length or key cardinality; at 100 TB the sketch
replaces a |users|-sized exact frequency table wherever an
overestimate-bounded answer suffices.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from event_stream_aggr_spark.plans.registry import register
from event_stream_aggr_spark.tables import load_table

CMS_W = 512  # counters per hash row
CMS_D = 3  # hash rows
#: (mul, add) pairs per hash row — Knuth-style mixers, exact in BIGINT.
_CMS_MIX = ((2654435761, 0), (2246822519, 3266489917), (3266489917, 1013904223))
_MOD32 = 1 << 32
TOPN = 20


def _cms_col(key: Column, row: int) -> Column:
    mul, add = _CMS_MIX[row]
    return ((key.cast("long") * mul + add) % _MOD32) % CMS_W


def cms_build(df: DataFrame, key: str) -> DataFrame:
    """The (row, col, c) counter relation — ONE aggregation over the
    d-way exploded key stream; ≤ d·w rows however long the stream."""
    cells = None
    for r in range(CMS_D):
        part = df.select(
            F.lit(r).alias("row"), _cms_col(F.col(key), r).alias("col")
        )
        cells = part if cells is None else cells.unionAll(part)
    return cells.groupBy("row", "col").agg(F.count(F.lit(1)).alias("c"))


def cms_estimate(keys: DataFrame, key: str, cms: DataFrame) -> DataFrame:
    """Point estimates: join each key's d cells against the broadcast
    counter table, take the min — adds ``cms_n`` to ``keys``."""
    probes = None
    for r in range(CMS_D):
        p = keys.select(
            key, F.lit(r).alias("row"), _cms_col(F.col(key), r).alias("col")
        )
        probes = p if probes is None else probes.unionAll(p)
    return (
        probes.join(F.broadcast(cms), ["row", "col"])
        .groupBy(key)
        .agg(F.min("c").alias("cms_n"))
    )


def _cms_oracle() -> str:
    cell = lambda r, k: (  # noqa: E731
        f"(({k} * {_CMS_MIX[r][0]} + {_CMS_MIX[r][1]}) % {_MOD32}) % {CMS_W}"
    )
    cells = "\nUNION ALL\n".join(
        f"SELECT {r} AS row, {cell(r, 'user_id')} AS col FROM events"
        for r in range(CMS_D)
    )
    probes = "\nUNION ALL\n".join(
        f"SELECT user_id, {r} AS row, {cell(r, 'user_id')} AS col FROM top"
        for r in range(CMS_D)
    )
    return f"""
WITH cells AS ({cells}),
cms AS (SELECT row, col, CAST(COUNT(*) AS BIGINT) AS c
        FROM cells GROUP BY row, col),
exact AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS exact_n
          FROM events GROUP BY user_id),
top AS (SELECT user_id, exact_n FROM exact
        ORDER BY exact_n DESC, user_id LIMIT {TOPN}),
probes AS ({probes}),
est AS (SELECT p.user_id, CAST(MIN(cms.c) AS BIGINT) AS cms_n
        FROM probes p JOIN cms USING (row, col) GROUP BY p.user_id)
SELECT t.user_id, t.exact_n, e.cms_n,
       CAST(e.cms_n >= t.exact_n AS BIGINT) AS never_underestimates,
       ROUND(CAST(e.cms_n - t.exact_n AS DOUBLE) / t.exact_n, 6) AS rel_err
FROM top t JOIN est e USING (user_id)
"""


@register("qh01_count_min_heavy_hitters", tags=("approx", "sketch", "scale"), oracle=_cms_oracle())
def qh01_count_min_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min frequency estimates for the top-20 heaviest users,
    against their exact counts: the heavy-hitter/abuse-quota check
    run from a 3×512-counter sketch instead of a full per-key
    frequency table. ``never_underestimates`` is the CMS guarantee
    (must be 1 in every row, in both engines — structural, not
    statistical); rel_err measures the collision overestimate at this
    width.

    Scale shape: the sketch build is ONE hash aggregation over the
    d-way projected stream (map-side combinable — the counter table
    is the monoid, qi01's contract, so per-partition sketches merge
    cell-wise); estimation joins the ≤d·w-row broadcast table. The
    exact side exists only because the audit needs ground truth for
    the sampled heavy keys.
    """
    e = load_table(spark, sf_dir, "events")
    cms = cms_build(e, "user_id")
    exact = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_n"))
    top = exact.orderBy(F.desc("exact_n"), "user_id").limit(TOPN)
    est = cms_estimate(top.select("user_id"), "user_id", cms)
    return top.join(est, "user_id").select(
        "user_id",
        "exact_n",
        "cms_n",
        (F.col("cms_n") >= F.col("exact_n")).cast("long").alias(
            "never_underestimates"
        ),
        F.round(
            (F.col("cms_n") - F.col("exact_n")).cast("double") / F.col("exact_n"), 6
        ).alias("rel_err"),
    )


# ---------------------------------------------------------------------------
# qh02: join-size estimation via CMS inner product (optimizer statistics)
# ---------------------------------------------------------------------------


def _join_size_oracle() -> str:
    cell = lambda r, k: (  # noqa: E731
        f"(({k} * {_CMS_MIX[r][0]} + {_CMS_MIX[r][1]}) % {_MOD32}) % {CMS_W}"
    )
    cells = "\nUNION ALL\n".join(
        f"SELECT {r} AS row, {cell(r, 'user_id')} AS col FROM events"
        for r in range(CMS_D)
    )
    return f"""
WITH cells AS ({cells}),
cms AS (SELECT row, col, CAST(COUNT(*) AS BIGINT) AS c
        FROM cells GROUP BY row, col),
est_rows AS (SELECT row, CAST(SUM(c * c) AS BIGINT) AS est
             FROM cms GROUP BY row),
est AS (SELECT CAST(MIN(est) AS BIGINT) AS cms_estimate FROM est_rows),
exact AS (
  SELECT CAST(SUM(n * n) AS BIGINT) AS exact_join_size
  FROM (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY user_id))
SELECT exact.exact_join_size, est.cms_estimate,
       CAST(est.cms_estimate >= exact.exact_join_size AS BIGINT)
         AS never_underestimates,
       ROUND(CAST(est.cms_estimate - exact.exact_join_size AS DOUBLE)
             / exact.exact_join_size, 6) AS rel_err
FROM exact CROSS JOIN est
"""


@register("qh02_join_size_estimate", tags=("approx", "sketch", "optimizer"), oracle=_join_size_oracle())
def qh02_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-join output-size estimation from sketches — the optimizer
    statistic that decides broadcast-vs-shuffle and flags exploding
    joins BEFORE running them: for R ⋈ S on k, |join| = Σ_k c_R(k)·
    c_S(k) is exactly the inner product of the key-frequency vectors,
    and the CMS inner product (Σ_col cmsR[r]·cmsS[r], minimized over
    the d rows) estimates it one-sidedly from two fixed-size counter
    tables — here for the worst case, the events self-join on user_id.

    Scale shape: the whole estimate reads only the d·w-cell sketch
    (built in one map-side-combinable aggregation, mergeable
    cell-wise across partitions/days — the qi01 monoid again), so
    join planning over 100 TB inputs costs KBs; the exact Σn² side
    exists only as the audit's ground truth. Overestimate-only is
    structural (collisions add cross terms), asserted per run in both
    engines.
    """
    e = load_table(spark, sf_dir, "events")
    cms = cms_build(e, "user_id")
    est = (
        cms.groupBy("row")
        .agg(F.sum(F.col("c") * F.col("c")).alias("est"))
        .agg(F.min("est").cast("long").alias("cms_estimate"))
    )
    exact = (
        e.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.sum(F.col("n") * F.col("n")).cast("long").alias("exact_join_size"))
    )
    return exact.crossJoin(est).select(
        "exact_join_size",
        "cms_estimate",
        (F.col("cms_estimate") >= F.col("exact_join_size")).cast("long").alias(
            "never_underestimates"
        ),
        F.round(
            (F.col("cms_estimate") - F.col("exact_join_size")).cast("double")
            / F.col("exact_join_size"),
            6,
        ).alias("rel_err"),
    )
