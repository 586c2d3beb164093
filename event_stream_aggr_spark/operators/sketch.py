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


def cms_merge(prev: DataFrame, delta: DataFrame) -> DataFrame:
    """Cell-wise sum of two counter relations — the CMS monoid merge.

    Because every cell is an exact count (same deterministic hashes on
    both sides), merging per-partition / per-micro-batch / per-day
    sketches is lossless: merge(build(A), build(B)) == build(A ∪ B)
    cell-for-cell, which is what lets a streaming maintainer keep a
    few-KB sketch current without ever re-scanning history (the same
    monoid contract as qi01's rollup state; reference A1 merges its
    interval stats across windows the same way, app.go:75-110).
    """
    return (
        prev.unionAll(delta).groupBy("row", "col").agg(F.sum("c").alias("c"))
    )


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


# ---------------------------------------------------------------------------
# qh03: AMS (tug-of-war) F2 sketch — unbiased second-moment estimation
# ---------------------------------------------------------------------------

# 64 estimators: a single AMS estimator has Var(S²) ≈ 2·F2² on
# near-uniform frequencies, so the k-mean's relative std is
# sqrt(2/k) — 50% at k=8, 18% at k=64 (measured -17.5% here, right on
# the curve). Production would use median-of-means over tabulation
# hashes; md5 parity keeps the signs 4-wise-independent-grade AND
# exactly replayable in the oracle.
AMS_K = 64


def _ams_sign(key: Column, est: int) -> Column:
    """±1 per (estimator, key) from md5 parity — AMS needs 4-wise
    independent signs for the cross terms to cancel (a linear
    Knuth-mix bit family measurably biased the estimate on sequential
    keys: correlated signs left ~-95% error), and md5, already the
    repo's deterministic-uniform source (qs05's draw keys), delivers
    that while staying exactly replayable in SQL."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"ams:{est}:"), key.cast("string"))), 1, 7
        ),
        16,
        10,
    ).cast("long")
    return (h % 2) * 2 - 1


def _ams_sign_sql(expr: str, est: int) -> str:
    return (
        f"(('0x' || substr(md5('ams:{est}:' || CAST({expr} AS VARCHAR)), 1, 7))"
        f"::BIGINT % 2) * 2 - 1"
    )


@register(
    "qh03_ams_f2_sketch",
    tags=("sketch", "stats"),
    oracle=f"""
WITH sums AS (
  SELECT {", ".join(f"CAST(SUM({_ams_sign_sql('user_id', e)}) AS BIGINT) AS s{e}"
                    for e in range(AMS_K))}
  FROM events),
est AS (
  SELECT ({" + ".join(f"s{e} * s{e}" for e in range(AMS_K))}) // {AMS_K}
           AS f2_estimate
  FROM sums),
exact AS (
  SELECT CAST(SUM(n * n) AS BIGINT) AS f2_exact
  FROM (SELECT COUNT(*) AS n FROM events GROUP BY user_id))
SELECT f2_exact, CAST(f2_estimate AS BIGINT) AS f2_estimate,
       CAST((f2_estimate - f2_exact) * 1000000 // f2_exact AS BIGINT)
         AS rel_err_ppm
FROM exact, est
""",
)
def qh03_ams_f2_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS tug-of-war sketch (Alon–Matias–Szegedy): estimate the
    second frequency moment F2 = Σ f_key² — the self-join size /
    repeat-rate statistic — from {AMS_K} integers of state instead of
    a |keys|-sized exact frequency table. Each estimator keeps one
    running sum of ±1·(row count) with content-derived signs; its
    square is an unbiased F2 estimate, and the mean over estimators
    tightens the variance. Complements qh01/qh02's count-min (point
    frequencies, over-estimate-bounded) with the moment estimate
    (unbiased, two-sided).

    Determinism: signs are md5-parity derived (the qs05 uniform
    source — a Knuth multiplicative mix was tried and abandoned
    because its sign bias skewed the estimate; see _ams_sign), so
    every running sum is an exact integer both engines agree on; the
    estimate is an integer mean of integer squares, the error an
    integer cross-multiplied ppm.

    Scale shape (100 TB): ONE map-side-combinable aggregation with
    {AMS_K} conditional integer sums — no explode, no shuffle beyond
    the {AMS_K}-column partial-agg merge, state O(k) however many keys
    exist (the whole point vs the exact Σn² which needs key grain
    first). The sketch is a mergeable monoid: per-partition sums add,
    the same IVM contract as qi01/CMS."""
    e = load_table(spark, sf_dir, "events")
    sums = e.agg(
        *[
            F.sum(_ams_sign(F.col("user_id"), k)).cast("long").alias(f"s{k}")
            for k in range(AMS_K)
        ]
    )
    sq = " + ".join(f"s{k} * s{k}" for k in range(AMS_K))
    est = sums.select(F.expr(f"({sq}) div {AMS_K}").alias("f2_estimate"))
    exact = (
        e.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.sum(F.col("n") * F.col("n")).cast("long").alias("f2_exact"))
    )
    return exact.crossJoin(F.broadcast(est)).select(
        "f2_exact",
        "f2_estimate",
        F.expr("(f2_estimate - f2_exact) * 1000000 div f2_exact")
        .cast("long")
        .alias("rel_err_ppm"),
    )


# ---------------------------------------------------------------------------
# qh04: KMV (k-minimum-values) sketch — set-operation estimates
# ---------------------------------------------------------------------------

KMV_K = 64


def kmv_build(hashed: DataFrame, by: str = "source", k: int = KMV_K) -> DataFrame:
    """Reduce each group's hash relation to its k smallest values — the
    KMV sketch (Beyer et al. 2007). ``hashed`` must already be distinct
    per (``by``, h): qh04 dedups once upstream, and keeping the
    precondition out of this function keeps the build a single rank
    window with no extra exchange. One shuffle on ``by``, ≤ k rows per
    group out, however large the input."""
    from pyspark.sql import Window as W

    w = W.partitionBy(by).orderBy("h")
    return (
        hashed.select(by, "h")
        .select(by, "h", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= k)
        .select(by, "h")
    )


def kmv_merge(prev: DataFrame, delta: DataFrame, by: str = "source", k: int = KMV_K) -> DataFrame:
    """KMV monoid merge: union the two sketches, dedup the shared hash
    values, keep the k smallest per group. Lossless for distinct-value
    estimation — merge(build(A), build(B)) == build(A ∪ B) because the
    k smallest of a union can only come from the k smallest of each
    side — so per-micro-batch / per-day / per-partition sketches fold
    into the corpus sketch without re-scanning history (the same monoid
    contract as cms_merge / qi01's rollup state). The merge runs on
    ≤ 2k rows per group regardless of corpus size."""
    return kmv_build(prev.unionByName(delta).distinct(), by, k)


@register(
    "qh04_kmv_set_ops",
    tags=("sketch", "dedup", "stats"),
    oracle=f"""
WITH toks AS (
  SELECT DISTINCT source,
         unnest(list_filter(string_split(lower(text), ' '), x -> x <> ''))
           AS tok
  FROM documents),
hashed AS (
  SELECT DISTINCT source,
         ('0x' || substr(md5(tok), 1, 7))::BIGINT AS h
  FROM toks),
sketch AS (
  SELECT source, h FROM (
    SELECT source, h,
           ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS rn
    FROM hashed) t WHERE rn <= {KMV_K}),
exact AS (
  SELECT a.source AS source_a, b.source AS source_b,
         CAST(COUNT(*) AS BIGINT) AS n_inter
  FROM hashed a JOIN hashed b ON a.h = b.h AND a.source < b.source
  GROUP BY 1, 2),
sizes AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM hashed GROUP BY source),
exact_j AS (
  SELECT e.source_a, e.source_b,
         CAST(e.n_inter * 1000000 //
              (sa.n + sb.n - e.n_inter) AS BIGINT) AS exact_jaccard_ppm
  FROM exact e
  JOIN sizes sa ON sa.source = e.source_a
  JOIN sizes sb ON sb.source = e.source_b),
pairs AS (
  SELECT DISTINCT a.source AS source_a, b.source AS source_b
  FROM sketch a, sketch b WHERE a.source < b.source),
merged AS (
  SELECT p.source_a, p.source_b, u.h,
         ROW_NUMBER() OVER (PARTITION BY p.source_a, p.source_b
                            ORDER BY u.h) AS rn
  FROM pairs p JOIN (
    SELECT DISTINCT s1.source, s1.h FROM sketch s1) u
    ON u.source IN (p.source_a, p.source_b)
  QUALIFY ROW_NUMBER() OVER (PARTITION BY p.source_a, p.source_b, u.h
                             ORDER BY u.h) = 1),
topu AS (
  SELECT source_a, source_b, h,
         ROW_NUMBER() OVER (PARTITION BY source_a, source_b ORDER BY h)
           AS urn
  FROM merged),
kmv AS (
  SELECT t.source_a, t.source_b,
         CAST(SUM(CASE WHEN sa.h IS NOT NULL AND sb.h IS NOT NULL
                       THEN 1 ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT)
           AS kmv_jaccard_ppm
  FROM topu t
  LEFT JOIN sketch sa ON sa.source = t.source_a AND sa.h = t.h
  LEFT JOIN sketch sb ON sb.source = t.source_b AND sb.h = t.h
  WHERE t.urn <= {KMV_K}
  GROUP BY t.source_a, t.source_b)
SELECT k.source_a, k.source_b,
       COALESCE(x.exact_jaccard_ppm, 0) AS exact_jaccard_ppm,
       k.kmv_jaccard_ppm,
       ABS(k.kmv_jaccard_ppm - COALESCE(x.exact_jaccard_ppm, 0))
         AS err_ppm
FROM kmv k LEFT JOIN exact_j x USING (source_a, source_b)
""",
)
def qh04_kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) sketch set operations (Beyer et al.
    2007 — the mergeable distinct/Jaccard estimator DataSketches'
    theta sketch generalizes): each source's token set reduces to its
    {KMV_K} smallest md5 values; for every source pair, the Jaccard
    estimate is the matching fraction within the min(k, |union|)
    smallest values of the MERGED sketch (a source with fewer than k
    distinct values keeps its whole set, so small sets degrade
    gracefully to EXACT Jaccard) — reported beside qt25's exact source-overlap
    Jaccard with the absolute error, so the sketch's accuracy is
    measured, not assumed.

    Determinism: hashes are md5 integers (the qs05/qh03 uniform
    source); sketches, merges and estimates are pure integer
    rank/count arithmetic — bit-exact cross-engine.

    Scale shape (100 TB): the exact pairwise overlap (qt25) needs the
    full corpus-dedup'd (source, gram) relation at compare time; KMV
    needs {KMV_K} integers PER SOURCE, mergeable by union-and-truncate
    — the monoid contract (qi01/CMS/AMS) — so cross-corpus overlap
    matrices cost |sources|²·k integers however big the corpora are.
    Sketch build is one rank window per source over the deduped hash
    relation; all pair math runs on the tiny sketch relation."""
    from pyspark.sql import Window as W

    d = load_table(spark, sf_dir, "documents")
    from event_stream_aggr_spark.operators.text import tokens

    hashed = (
        d.select(
            "source", F.explode(tokens(F.lower(F.col("text")))).alias("tok")
        )
        .select(
            "source",
            F.conv(F.substring(F.md5("tok"), 1, 7), 16, 10)
            .cast("long")
            .alias("h"),
        )
        .distinct()
    )
    sketch = kmv_build(hashed, by="source", k=KMV_K)
    sizes = hashed.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    inter = (
        hashed.alias("a")
        .join(
            hashed.alias("b"),
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("source").alias("source_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("source").alias("source_b"), F.col("n").alias("nb"))
    exact_j = (
        inter.join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .select(
            "source_a",
            "source_b",
            F.expr("n_inter * 1000000 div (na + nb - n_inter)").alias(
                "exact_jaccard_ppm"
            ),
        )
    )
    srcs = sketch.select("source").distinct()
    # |sources| is the corpus's source cardinality — tiny next to the
    # data, but only the author knows that, so assert it with the
    # broadcast hint (the r9 nested-loop lint's contract: an unhinted,
    # unbounded cross join is treated as an accident)
    pairs = (
        srcs.select(F.col("source").alias("source_a"))
        .crossJoin(F.broadcast(srcs.select(F.col("source").alias("source_b"))))
        .where(F.col("source_a") < F.col("source_b"))
    )
    ska = sketch.select(F.col("source").alias("source_a"), "h")
    skb = sketch.select(F.col("source").alias("source_b"), "h")
    union_rows = (
        pairs.join(ska, "source_a")
        .select("source_a", "source_b", "h", F.lit(1).alias("in_a"), F.lit(0).alias("in_b"))
        .unionAll(
            pairs.join(skb, "source_b").select(
                "source_a", "source_b", "h", F.lit(0).alias("in_a"), F.lit(1).alias("in_b")
            )
        )
        .groupBy("source_a", "source_b", "h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    w_pair = W.partitionBy("source_a", "source_b").orderBy("h")
    topu = union_rows.select(
        "*", F.row_number().over(w_pair).alias("urn")
    ).filter(F.col("urn") <= KMV_K)
    kmv = topu.groupBy("source_a", "source_b").agg(
        F.expr(
            f"sum(case when in_a = 1 and in_b = 1 then 1 else 0 end)"
            " * 1000000 div count(1)"
        )
        .cast("long")
        .alias("kmv_jaccard_ppm")
    )
    return (
        kmv.join(exact_j, ["source_a", "source_b"], "left")
        .select(
            "source_a",
            "source_b",
            F.coalesce("exact_jaccard_ppm", F.lit(0))
            .cast("long")
            .alias("exact_jaccard_ppm"),
            "kmv_jaccard_ppm",
            F.abs(
                F.col("kmv_jaccard_ppm")
                - F.coalesce(F.col("exact_jaccard_ppm"), F.lit(0))
            )
            .cast("long")
            .alias("err_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# qh05: the CMS merge law as a driver-checked query (IVM contract proof)
# ---------------------------------------------------------------------------


def _cms_merge_law_oracle() -> str:
    cell = lambda r, k: (  # noqa: E731
        f"(({k} * {_CMS_MIX[r][0]} + {_CMS_MIX[r][1]}) % {_MOD32}) % {CMS_W}"
    )

    def cells_over(pred: str) -> str:
        return "\nUNION ALL\n".join(
            f"SELECT {r} AS row, {cell(r, 'user_id')} AS col"
            f" FROM events WHERE {pred}"
            for r in range(CMS_D)
        )

    return f"""
WITH whole_cells AS ({cells_over('TRUE')}),
whole AS (SELECT row, col, CAST(COUNT(*) AS BIGINT) AS c
          FROM whole_cells GROUP BY row, col),
even_cells AS ({cells_over('user_id % 2 = 0')}),
even AS (SELECT row, col, CAST(COUNT(*) AS BIGINT) AS c
         FROM even_cells GROUP BY row, col),
odd_cells AS ({cells_over('user_id % 2 = 1')}),
odd AS (SELECT row, col, CAST(COUNT(*) AS BIGINT) AS c
        FROM odd_cells GROUP BY row, col),
merged AS (
  SELECT row, col, CAST(SUM(c) AS BIGINT) AS c FROM (
    SELECT * FROM even UNION ALL SELECT * FROM odd)
  GROUP BY row, col)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM whole) AS n_cells_whole,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM merged) AS n_cells_merged,
       (SELECT CAST(COUNT(*) AS BIGINT)
        FROM whole w JOIN merged m
          ON w.row = m.row AND w.col = m.col AND w.c = m.c)
         AS n_cells_equal,
       (SELECT CAST(SUM(c) AS BIGINT) FROM whole) AS mass_whole,
       (SELECT CAST(SUM(c) AS BIGINT) FROM merged) AS mass_merged
"""


@register(
    "qh05_cms_merge_law",
    tags=("approx", "sketch", "incremental"),
    oracle=_cms_merge_law_oracle(),
)
def qh05_cms_merge_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CMS mergeability CONTRACT as a first-class verified query
    (the qi01 IVM law applied to the sketch family, and the semantics
    the round-7 streaming maintainer rides): build the sketch over two
    disjoint partitions of the stream (user_id parity — a stand-in for
    per-day / per-micro-batch shards), merge them cell-wise with
    ``cms_merge``, and report merge(build(A), build(B)) == build(A∪B)
    as data — n_cells_equal must equal both cell counts and the masses
    must match, in BOTH engines, making the distributed-merge safety
    argument itself driver-checked rather than pytest-only.

    Scale shape: three map-side-combinable hash aggregations (each ≤
    d·w rows out however long the stream) + a ≤ d·w-row broadcast-size
    equality join — the whole audit's shuffle traffic is bounded by
    the sketch size, not the data. The same law is exercised across
    random batch splits by tests/test_property_cms.py and executed as
    a foreachBatch streaming maintainer in test_stream_batch_equiv."""
    e = load_table(spark, sf_dir, "events")
    whole = cms_build(e, "user_id")
    even = cms_build(e.filter(F.col("user_id") % 2 == 0), "user_id")
    odd = cms_build(e.filter(F.col("user_id") % 2 == 1), "user_id")
    merged = cms_merge(even, odd)
    eq = whole.alias("w").join(
        merged.alias("m"),
        (F.col("w.row") == F.col("m.row"))
        & (F.col("w.col") == F.col("m.col"))
        & (F.col("w.c") == F.col("m.c")),
    )
    return (
        whole.agg(
            F.count(F.lit(1)).alias("n_cells_whole"),
            F.sum("c").cast("long").alias("mass_whole"),
        )
        .crossJoin(
            merged.agg(
                F.count(F.lit(1)).alias("n_cells_merged"),
                F.sum("c").cast("long").alias("mass_merged"),
            )
        )
        .crossJoin(eq.agg(F.count(F.lit(1)).alias("n_cells_equal")))
        .select(
            "n_cells_whole",
            "n_cells_merged",
            "n_cells_equal",
            "mass_whole",
            "mass_merged",
        )
    )


# ---------------------------------------------------------------------------
# qh06: Count-Min under retractions — the sketch is LINEAR
# ---------------------------------------------------------------------------


def _cms_retraction_oracle() -> str:
    cell = lambda r, k: (  # noqa: E731
        f"(({k} * {_CMS_MIX[r][0]} + {_CMS_MIX[r][1]}) % {_MOD32}) % {CMS_W}"
    )
    signed = "\nUNION ALL\n".join(
        f"SELECT {r} AS row, {cell(r, 'o_custkey')} AS col, 1 AS w FROM orders"
        f"\nUNION ALL\n"
        f"SELECT {r} AS row, {cell(r, 'o_custkey')} AS col, -1 AS w "
        f"FROM orders WHERE o_orderstatus = 'F'"
        for r in range(CMS_D)
    )
    probes = "\nUNION ALL\n".join(
        f"SELECT o_custkey, {r} AS row, {cell(r, 'o_custkey')} AS col FROM top"
        for r in range(CMS_D)
    )
    return f"""
WITH cells AS ({signed}),
cms AS (SELECT row, col, CAST(SUM(w) AS BIGINT) AS c
        FROM cells GROUP BY row, col),
exact AS (SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS exact_n
          FROM orders WHERE o_orderstatus <> 'F' GROUP BY o_custkey),
top AS (SELECT o_custkey, exact_n FROM exact
        ORDER BY exact_n DESC, o_custkey LIMIT {TOPN}),
probes AS ({probes}),
est AS (SELECT p.o_custkey, CAST(MIN(cms.c) AS BIGINT) AS cms_n
        FROM probes p JOIN cms USING (row, col) GROUP BY p.o_custkey)
SELECT t.o_custkey, t.exact_n, e.cms_n,
       CAST(e.cms_n >= t.exact_n AS BIGINT) AS never_underestimates,
       ROUND(CAST(e.cms_n - t.exact_n AS DOUBLE) / t.exact_n, 6) AS rel_err
FROM top t JOIN est e USING (o_custkey)
"""


@register(
    "qh06_cms_retraction",
    tags=("approx", "sketch", "cdc", "scale"),
    oracle=_cms_retraction_oracle(),
)
def qh06_cms_retraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min under CDC DELETES — the sketch-path counterpart of
    qi05/qi06's exact signed state, and the capability qi02's HLL
    lacks (HLL cannot delete): CMS is a LINEAR sketch, so a
    retraction is just a negative update. Executed exactly that way —
    the delete stream's counter table is built by the SAME
    ``cms_build`` as the insert stream's and folded in through the
    SAME ``cms_merge`` with its counts negated, no special-cased
    kernel. Per-cell counts stay exact data (deterministic mixers,
    oracle-replayed cell-for-cell), and because every key's NET count
    is non-negative in a CDC feed (you only delete what you
    inserted), each cell remains a sum of non-negative key totals —
    the never-underestimates guarantee survives retraction, asserted
    per row exactly like qh01. (Under arbitrary negative weights that
    guarantee would NOT hold; the CDC precondition is the contract,
    stated here.)

    Scale shape: two map-side-combinable aggregations to ≤ d·w cells
    each (a few KB regardless of stream length), one cell-grain merge,
    and a broadcast probe of the 20 heavy keys — no key-grain shuffle
    anywhere except the exact twin the oracle needs."""
    o = load_table(spark, sf_dir, "orders")
    inserts = o.select(F.col("o_custkey"))
    deletes = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey"))
    ins_cms = cms_build(inserts, "o_custkey")
    del_cms = cms_build(deletes, "o_custkey").withColumn("c", -F.col("c"))
    net = cms_merge(ins_cms, del_cms)
    exact = (
        o.filter(F.col("o_orderstatus") != "F")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("exact_n"))
    )
    top = exact.orderBy(F.desc("exact_n"), "o_custkey").limit(TOPN)
    est = cms_estimate(top.select("o_custkey"), "o_custkey", net)
    return top.join(est, "o_custkey").select(
        "o_custkey",
        "exact_n",
        F.col("cms_n").cast("long").alias("cms_n"),
        (F.col("cms_n") >= F.col("exact_n")).cast("long").alias(
            "never_underestimates"
        ),
        F.round(
            (F.col("cms_n") - F.col("exact_n")).cast("double") / F.col("exact_n"),
            6,
        ).alias("rel_err"),
    )
