"""Feature-engineering operators (SURVEY.md §2.10 extension): the
materialization pass a feature store runs over an event stream to
produce per-entity training feature matrices.

The shape that matters at 100 TB: ONE aggregation to (entity, day)
grain — conditional counts pivot event types into columns map-side, so
the shuffle carries |entities|·|days| narrow rows, never raw events —
then trailing-window features via RANGE frames over the day number
(bounded per-entity state, no self-join; the naive "join the last 7
days" phrasing shuffles the daily relation 7×).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_stream_aggr_spark.plans.registry import register
from event_stream_aggr_spark.tables import load_table

EVENT_TYPES = ("click", "view", "purchase", "signup", "error")
FEATURE_EPOCH = "2024-01-01"
TRAILING_DAYS = 7


@register(
    "qf01_user_feature_matrix",
    bench=True,
    tags=("features", "window", "pivot"),
    oracle=f"""
WITH daily AS (
  SELECT user_id, strftime(ts, '%Y-%m-%d') AS day,
         {" ".join(
            f"CAST(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS n_{t},"
            for t in EVENT_TYPES)}
         SUM(CAST(value AS DECIMAL(18,6))) AS vdec
  FROM events GROUP BY user_id, strftime(ts, '%Y-%m-%d'))
SELECT user_id, day,
       {" ".join(f"n_{t}," for t in EVENT_TYPES)}
       CAST(vdec AS DOUBLE) AS value_day,
       CAST(SUM(vdec) OVER (
         PARTITION BY user_id
         ORDER BY date_diff('day', DATE '{FEATURE_EPOCH}', CAST(day AS DATE))
         RANGE BETWEEN {TRAILING_DAYS - 1} PRECEDING AND CURRENT ROW
       ) AS DOUBLE) AS value_{TRAILING_DAYS}d
FROM daily
""",
)
def qf01_user_feature_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user daily feature matrix (the feature-store
    materialization shape): event-type counts pivoted into columns,
    daily value, and a trailing 7-day value via a RANGE frame — the
    training-feature table a churn/propensity model reads.

    Scale shape: conditional-count pivoting happens INSIDE the one
    (user, day) aggregation (map-side partials carry 5 ints + a
    decimal), so raw events shuffle once to entity-day grain and the
    trailing window runs over that far smaller relation with bounded
    per-user state. A calendar self-join would re-shuffle the daily
    relation per offset; the RANGE frame does it in one pass.

    Determinism: counts are exact ints; value sums accumulate as
    DECIMAL and cast to DOUBLE only on output (registry float rule),
    so the window's partial sums are order-free in both engines.
    TIMESTAMP_NTZ day bucketing is session-timezone independent."""
    from pyspark.sql import Window as W

    e = load_table(spark, sf_dir, "events")
    daily = (
        e.groupBy(
            "user_id", F.date_format("ts", "yyyy-MM-dd").alias("day")
        )
        .agg(
            *[
                F.sum(
                    F.when(F.col("event_type") == t, 1).otherwise(0)
                ).alias(f"n_{t}")
                for t in EVENT_TYPES
            ],
            F.sum(F.col("value").cast("decimal(18,6)")).alias("vdec"),
        )
    )
    day_num = F.datediff(
        F.to_date("day"), F.to_date(F.lit(FEATURE_EPOCH))
    )
    w = (
        W.partitionBy("user_id")
        .orderBy(day_num)
        .rangeBetween(-(TRAILING_DAYS - 1), W.currentRow)
    )
    return daily.select(
        "user_id",
        "day",
        *[f"n_{t}" for t in EVENT_TYPES],
        F.col("vdec").cast("double").alias("value_day"),
        F.sum("vdec").over(w).cast("double").alias(f"value_{TRAILING_DAYS}d"),
    )


_QF01_DAILY_CTE = f"""
daily AS (
  SELECT user_id, strftime(ts, '%Y-%m-%d') AS day,
         SUM(CAST(value AS DECIMAL(18,6))) AS vdec
  FROM events GROUP BY user_id, strftime(ts, '%Y-%m-%d')),
feats AS (
  SELECT user_id, day,
         CAST(SUM(vdec) OVER (
           PARTITION BY user_id
           ORDER BY date_diff('day', DATE '{FEATURE_EPOCH}', CAST(day AS DATE))
           RANGE BETWEEN {TRAILING_DAYS - 1} PRECEDING AND CURRENT ROW
         ) AS DOUBLE) AS value_7d
  FROM daily)"""


@register(
    "qf02_point_in_time_features",
    tags=("features", "asof"),
    oracle=f"""
WITH {_QF01_DAILY_CTE},
labels AS (
  SELECT event_id, user_id, strftime(ts, '%Y-%m-%d') AS label_day
  FROM events WHERE event_type = 'purchase'),
m AS (
  SELECT l.event_id, f.day AS feat_day, f.value_7d,
         ROW_NUMBER() OVER (PARTITION BY l.event_id
                            ORDER BY f.day DESC) AS rn
  FROM labels l
  JOIN feats f ON l.user_id = f.user_id AND f.day < l.label_day)
SELECT l.event_id, l.user_id, l.label_day,
       m.feat_day, m.value_7d AS feat_value_7d
FROM labels l LEFT JOIN (SELECT * FROM m WHERE rn = 1) m USING (event_id)
""",
)
def qf02_point_in_time_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time-correct feature join (the feature store's
    training-set construction): each purchase label joins the LATEST
    feature row STRICTLY BEFORE its own day — same-day features are
    excluded because they aggregate events at-and-after the label
    (future leakage). Labels with no prior feature row keep NULLs
    (left as-of semantics), so the training set's coverage is visible
    rather than silently truncated.

    Built on J5's union + sort-within-partition as-of dataflow
    (operators/asof.py): one shuffle of labels+features on user_id,
    no join explosion. The strict < comes from shifting the label's
    day number by −1 before the inclusive as-of (f ≤ label−1 ⟺
    f < label).

    Determinism: day strings compare chronologically; the as-of pick
    is the max prior day (unique per user-day), and value_7d is the
    DECIMAL-windowed sum cast to DOUBLE — identical in both engines."""
    from event_stream_aggr_spark.operators.asof import asof_join

    e = load_table(spark, sf_dir, "events")
    day = F.date_format("ts", "yyyy-MM-dd")
    feats = (
        qf01_user_feature_matrix(spark, sf_dir)
        .select(
            "user_id",
            "day",
            "value_7d",
            F.datediff(F.to_date("day"), F.to_date(F.lit(FEATURE_EPOCH)))
            .cast("long")
            .alias("fnum"),
        )
    )
    labels = e.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        day.alias("label_day"),
        (
            F.datediff(F.to_date(day), F.to_date(F.lit(FEATURE_EPOCH))) - 1
        )
        .cast("long")
        .alias("lnum"),
    )
    joined = asof_join(
        labels,
        feats,
        on=["user_id"],
        left_ts="lnum",
        right_ts="fnum",
        right_cols=["fnum", "day", "value_7d"],
    )
    return joined.select(
        "event_id",
        "user_id",
        "label_day",
        F.col("day").alias("feat_day"),
        F.col("value_7d").alias("feat_value_7d"),
    )


# ---------------------------------------------------------------------------
# qf03: robust feature scaling (winsorize + min-max normalize)
# ---------------------------------------------------------------------------

WINSOR_LO = 0.05
WINSOR_HI = 0.95


@register(
    "qf03_robust_scaling",
    tags=("features", "normalize"),
    oracle=f"""
WITH ranked AS (
  SELECT event_type, event_id, value,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY value NULLS LAST) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events),
ps AS (
  SELECT event_type,
         MIN(CASE WHEN rn = CEIL({WINSOR_LO} * n) THEN value END) AS p05,
         MIN(CASE WHEN rn = CEIL({WINSOR_HI} * n) THEN value END) AS p95
  FROM ranked GROUP BY event_type)
SELECT e.event_id, e.event_type, e.value, ps.p05, ps.p95,
       CASE WHEN ps.p95 = ps.p05 THEN 0.5
            ELSE ROUND((LEAST(GREATEST(e.value, ps.p05), ps.p95) - ps.p05)
                       / (ps.p95 - ps.p05), 6)
       END AS value_norm
FROM events e JOIN ps ON e.event_type = ps.event_type
""",
)
def qf03_robust_scaling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust feature scaling (the normalization pass before model
    training): per event type, winsorize values at the 5th/95th
    percentile and min-max normalize into [0, 1] — outlier-insensitive
    scaling, the tabular-ML default.

    The percentiles are NEAREST-RANK (the value at row_number =
    ceil(q·n)), not interpolated: rank selection is pure value lookup,
    so both engines pick the identical double where interpolated
    quantiles differ in accumulation arithmetic beyond a few decimals
    (why q39 rounds to 2dp; this operator needs thresholds exact
    because clipping COMPARES against them). Ties in the rank window
    don't matter — equal values make every tie order select the same
    threshold.

    Scale shape: one rank window per type (the per-type sort is the
    honest cost of exact percentiles; swap in approx_percentile when
    ±ε is acceptable — q29's documented trade), then the 5-row
    threshold relation broadcasts back onto the unshuffled scan."""
    from pyspark.sql import Window as W

    e = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    # NULLS LAST pinned explicitly: Spark's default is ASC NULLS FIRST
    # while DuckDB's is NULLS LAST, so an unpinned order would shift rn
    # (hence the p05/p95 thresholds) on any NULL value.
    wv = W.partitionBy("event_type").orderBy(F.col("value").asc_nulls_last())
    wc = W.partitionBy("event_type")
    ranked = e.select(
        "event_type",
        "value",
        F.row_number().over(wv).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n"),
    )
    ps = ranked.groupBy("event_type").agg(
        F.min(
            F.when(
                F.col("rn") == F.ceil(F.lit(WINSOR_LO) * F.col("n")),
                F.col("value"),
            )
        ).alias("p05"),
        F.min(
            F.when(
                F.col("rn") == F.ceil(F.lit(WINSOR_HI) * F.col("n")),
                F.col("value"),
            )
        ).alias("p95"),
    )
    clipped = F.least(F.greatest(F.col("value"), F.col("p05")), F.col("p95"))
    norm = F.when(F.col("p95") == F.col("p05"), F.lit(0.5)).otherwise(
        F.round((clipped - F.col("p05")) / (F.col("p95") - F.col("p05")), 6)
    )
    return e.join(F.broadcast(ps), "event_type").select(
        "event_id",
        "event_type",
        "value",
        "p05",
        "p95",
        norm.alias("value_norm"),
    )


# ---------------------------------------------------------------------------
# qf04: leave-one-out target encoding (categorical feature engineering)
# ---------------------------------------------------------------------------


@register(
    "qf04_loo_target_encoding",
    tags=("features", "encode"),
    oracle="""
WITH g AS (
  SELECT event_type,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_v,
         CAST(COUNT(value) AS BIGINT) AS n_v
  FROM events GROUP BY event_type)
SELECT e.event_id, e.event_type, e.value,
       CASE WHEN e.value IS NULL OR g.n_v <= 1 THEN NULL
            ELSE ROUND(CAST(g.sum_v - CAST(e.value AS DECIMAL(18,2)) AS DOUBLE)
                       / (g.n_v - 1), 6)
       END AS loo_mean
FROM events e JOIN g USING (event_type)
""",
)
def qf04_loo_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding (the categorical-feature encoder
    tabular ML uses when plain mean-encoding would leak each row's own
    target): for every event, the mean value of all OTHER events of
    its type — (group sum − own value) / (group count − 1).

    The naive formulation is a per-row anti-self window or a self-join;
    this is the closed form: ONE group aggregate (map-side combinable)
    broadcast back onto the unshuffled scan, then pure row-local
    arithmetic. Determinism: group sums accumulate as exact DECIMALs
    (the registry recipe) so the subtraction is exact; one IEEE
    division rounded 6dp. Singleton groups and NULL targets encode as
    NULL (no self-leakage fallback)."""
    e = load_table(spark, sf_dir, "events")
    g = e.groupBy("event_type").agg(
        F.sum(F.col("value").cast("decimal(18,2)")).alias("sum_v"),
        F.count("value").alias("n_v"),
    )
    loo = F.when(
        F.col("value").isNull() | (F.col("n_v") <= 1), F.lit(None)
    ).otherwise(
        F.round(
            (F.col("sum_v") - F.col("value").cast("decimal(18,2)")).cast("double")
            / (F.col("n_v") - 1),
            6,
        )
    )
    return e.join(F.broadcast(g), "event_type").select(
        "event_id", "event_type", "value", loo.alias("loo_mean")
    )


# ---------------------------------------------------------------------------
# qf05: feature drift detection (population stability index)
# ---------------------------------------------------------------------------

PSI_REF_LAST_DAY = "2024-01-15"  # reference window A = days <= this
PSI_BUCKETS = 10
PSI_DRIFT_EDGE = 0.1  # the classic "investigate" threshold


@register(
    "qf05_feature_drift_psi",
    tags=("features", "mlops", "drift"),
    oracle=f"""
WITH ev AS (
  SELECT event_type, event_id, value,
         strftime(ts, '%Y-%m-%d') <= '{PSI_REF_LAST_DAY}' AS is_ref
  FROM events),
ref AS (SELECT event_type, event_id, value FROM ev WHERE is_ref),
ranked AS (
  SELECT event_type, value,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY value, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM ref),
cuts AS (
  SELECT event_type, value AS cut
  FROM ranked, LATERAL (SELECT unnest(generate_series(1, {PSI_BUCKETS - 1})) AS i) g
  WHERE rn = CAST(CEIL(i * n / {PSI_BUCKETS}.0) AS BIGINT)),
bucketed AS (
  SELECT e.event_type, e.event_id, e.is_ref,
         CAST(SUM(CASE WHEN e.value > c.cut THEN 1 ELSE 0 END) AS BIGINT) AS b
  FROM ev e JOIN cuts c ON e.event_type = c.event_type
  GROUP BY e.event_type, e.event_id, e.is_ref),
counts AS (
  SELECT event_type, b,
         CAST(SUM(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT) AS ca,
         CAST(SUM(CASE WHEN is_ref THEN 0 ELSE 1 END) AS BIGINT) AS cb
  FROM bucketed GROUP BY event_type, b),
tots AS (
  SELECT event_type,
         CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb
  FROM counts GROUP BY event_type),
terms AS (
  SELECT c.event_type, c.ca, c.cb,
         CAST(ROUND((CAST(c.cb + 1 AS DOUBLE) / (t.nb + {PSI_BUCKETS})
                     - CAST(c.ca + 1 AS DOUBLE) / (t.na + {PSI_BUCKETS}))
                    * ln((CAST(c.cb + 1 AS DOUBLE) / (t.nb + {PSI_BUCKETS}))
                         / (CAST(c.ca + 1 AS DOUBLE) / (t.na + {PSI_BUCKETS}))), 6)
              AS DECIMAL(18,6)) AS term
  FROM counts c JOIN tots t USING (event_type))
SELECT event_type,
       CAST(SUM(ca) AS BIGINT) AS n_ref, CAST(SUM(cb) AS BIGINT) AS n_cur,
       CAST(SUM(term) AS DOUBLE) AS psi,
       CAST(CAST(SUM(term) AS DOUBLE) > {PSI_DRIFT_EDGE} AS BIGINT) AS drifted
FROM terms GROUP BY event_type
""",
)
def qf05_feature_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature drift detection via the Population Stability Index —
    the MLOps monitor that decides whether a serving feature's
    distribution moved enough from the training snapshot to retrain:
    per event type, decile the REFERENCE window's ``value``
    distribution (nearest-rank cutpoints, qf03's bit-exact selection),
    histogram both periods on those fixed buckets, and sum
    (pB−pA)·ln(pB/pA) with add-1 smoothing so empty buckets stay
    finite.

    Scale shape: cutpoints are |types|·9 rows (window rank-selection on
    the reference slice only), broadcast back; bucket assignment is a
    per-row fold over the 9 cutpoints (broadcast equi-join on type +
    conditional count — no range join, no sort of the scored period);
    PSI itself folds 10 bucket rows per type with 6-dp-rounded terms
    summed as exact decimals (registry float rule). The same dataflow
    monitors any scored column; `value` stands in for a model score.
    """
    from pyspark.sql import Window as W

    e = load_table(spark, sf_dir, "events")
    ev = e.select(
        "event_type",
        "event_id",
        "value",
        (F.date_format("ts", "yyyy-MM-dd") <= PSI_REF_LAST_DAY).alias("is_ref"),
    )
    ref = ev.where("is_ref")
    wr = W.partitionBy("event_type").orderBy("value", "event_id")
    ranked = ref.select(
        "event_type",
        "value",
        F.row_number().over(wr).cast("long").alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy("event_type")).alias("n"),
    )
    cuts = (
        ranked.select(
            "event_type",
            "value",
            "rn",
            "n",
            F.explode(F.sequence(F.lit(1), F.lit(PSI_BUCKETS - 1))).alias("i"),
        )
        .where(F.col("rn") == F.ceil(F.col("i") * F.col("n") / PSI_BUCKETS).cast("long"))
        .select("event_type", F.col("value").alias("cut"))
    )
    bucketed = (
        ev.join(F.broadcast(cuts), "event_type")
        .groupBy("event_type", "event_id", "is_ref")
        .agg(F.sum(F.when(F.col("value") > F.col("cut"), 1).otherwise(0)).alias("b"))
    )
    counts = bucketed.groupBy("event_type", "b").agg(
        F.sum(F.when(F.col("is_ref"), 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("is_ref"), 0).otherwise(1)).alias("cb"),
    )
    wt = W.partitionBy("event_type")
    pa = (F.col("ca") + 1).cast("double") / (F.sum("ca").over(wt) + PSI_BUCKETS)
    pb = (F.col("cb") + 1).cast("double") / (F.sum("cb").over(wt) + PSI_BUCKETS)
    terms = counts.select(
        "event_type",
        "ca",
        "cb",
        F.round((pb - pa) * F.log(pb / pa), 6).cast("decimal(18,6)").alias("term"),
    )
    return terms.groupBy("event_type").agg(
        F.sum("ca").alias("n_ref"),
        F.sum("cb").alias("n_cur"),
        F.sum("term").cast("double").alias("psi"),
        (F.sum("term").cast("double") > PSI_DRIFT_EDGE).cast("long").alias("drifted"),
    )


# ---------------------------------------------------------------------------
# qf06: feature correlation matrix (feature-selection diagnostic)
# ---------------------------------------------------------------------------

CORR_FEATURES = tuple(f"n_{t}" for t in EVENT_TYPES)


def _corr_pairs() -> list:
    fs = list(CORR_FEATURES)
    return [(fs[i], fs[j]) for i in range(len(fs)) for j in range(i + 1, len(fs))]


def _corr_oracle() -> str:
    daily_cols = " ".join(
        f"CAST(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS n_{t}," for t in EVENT_TYPES
    ).rstrip(",")
    sums = []
    for f in CORR_FEATURES:
        sums.append(f"CAST(SUM({f}) AS BIGINT) AS s_{f}")
        sums.append(f"CAST(SUM({f} * {f}) AS BIGINT) AS q_{f}")
    for a, b in _corr_pairs():
        sums.append(f"CAST(SUM({a} * {b}) AS BIGINT) AS p_{a}_{b}")
    selects = []
    for a, b in _corr_pairs():
        expr = (
            f"ROUND((n * CAST(p_{a}_{b} AS DOUBLE) - CAST(s_{a} AS DOUBLE) * s_{b})"
            f" / (sqrt(n * CAST(q_{a} AS DOUBLE) - CAST(s_{a} AS DOUBLE) * s_{a})"
            f" * sqrt(n * CAST(q_{b} AS DOUBLE) - CAST(s_{b} AS DOUBLE) * s_{b})), 6)"
        )
        selects.append(
            f"SELECT '{a}' AS feat_a, '{b}' AS feat_b, {expr} AS corr FROM sums"
        )
    union = "\nUNION ALL\n".join(selects)
    return f"""
WITH daily AS (
  SELECT user_id, strftime(ts, '%Y-%m-%d') AS day, {daily_cols}
  FROM events GROUP BY user_id, strftime(ts, '%Y-%m-%d')),
sums AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, {", ".join(sums)} FROM daily)
{union}
"""


@register(
    "qf06_feature_correlation",
    tags=("features", "statistics"),
    oracle=_corr_oracle(),
)
def qf06_feature_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation between the per-(user, day) event-
    count features — the feature-selection diagnostic a training
    pipeline runs before fitting (drop one of each highly-correlated
    pair, sanity-check leakage-suspicious correlations).

    Scale shape: ONE pass — all 20 moment sums (Σx, Σx², Σxy for every
    pair) accumulate in a single map-side-combined aggregation over
    the entity-day relation, and the 10 output rows unfold from that
    1-row moment vector driver-side-free via an inline stack; no
    per-pair scans, no |features|² shuffles. Determinism: every moment
    is an exact BIGINT (integer counts), so the correlation doubles
    come from identical integers through the identical expression in
    both engines (qa02's rule), rounded at 6 dp.
    """
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "user_id", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(
        *[
            F.sum(F.when(F.col("event_type") == t, 1).otherwise(0)).alias(f"n_{t}")
            for t in EVENT_TYPES
        ]
    )
    aggs = [F.count(F.lit(1)).alias("n")]
    for f in CORR_FEATURES:
        aggs.append(F.sum(f).alias(f"s_{f}"))
        aggs.append(F.sum(F.col(f) * F.col(f)).alias(f"q_{f}"))
    for a, b in _corr_pairs():
        aggs.append(F.sum(F.col(a) * F.col(b)).alias(f"p_{a}_{b}"))
    sums = daily.agg(*aggs)
    n = F.col("n").cast("double")
    rows = []
    for a, b in _corr_pairs():
        cov = n * F.col(f"p_{a}_{b}").cast("double") - F.col(f"s_{a}").cast(
            "double"
        ) * F.col(f"s_{b}")
        va = n * F.col(f"q_{a}").cast("double") - F.col(f"s_{a}").cast(
            "double"
        ) * F.col(f"s_{a}")
        vb = n * F.col(f"q_{b}").cast("double") - F.col(f"s_{b}").cast(
            "double"
        ) * F.col(f"s_{b}")
        rows.append(
            F.struct(
                F.lit(a).alias("feat_a"),
                F.lit(b).alias("feat_b"),
                F.round(cov / (F.sqrt(va) * F.sqrt(vb)), 6).alias("corr"),
            )
        )
    return sums.select(
        F.explode(F.array(*rows)).alias("r")
    ).select("r.feat_a", "r.feat_b", "r.corr")


# ---------------------------------------------------------------------------
# qa04-style robust outliers live here with the other statistics ops
# (registered as qf07 to keep the feature-family prefix)
# ---------------------------------------------------------------------------

MAD_K_SCALED = 3  # flag |x - median| > 3 * MAD


@register(
    "qf07_mad_outliers",
    tags=("features", "statistics", "quality"),
    oracle=f"""
WITH ev AS (SELECT event_type, event_id, value FROM events),
r1 AS (
  SELECT event_type, value,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY value, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM ev),
med AS (
  SELECT event_type, value AS median
  FROM r1 WHERE rn = CAST(CEIL(n / 2.0) AS BIGINT)),
dev AS (
  SELECT e.event_type, e.event_id, e.value,
         ABS(e.value - m.median) AS d, m.median
  FROM ev e JOIN med m USING (event_type)),
r2 AS (
  SELECT event_type, d,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY d, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM dev),
mad AS (
  SELECT event_type, d AS mad
  FROM r2 WHERE rn = CAST(CEIL(n / 2.0) AS BIGINT))
SELECT dev.event_type,
       ROUND(MIN(dev.median), 6) AS median,
       ROUND(MIN(mad.mad), 6) AS mad,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN dev.d > {MAD_K_SCALED} * mad.mad
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM dev JOIN mad USING (event_type)
GROUP BY dev.event_type
""",
)
def qf07_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection via median absolute deviation — the
    quality gate that survives the very outliers it hunts (mean/std,
    qa02's tool, breaks down past ~10% contamination; median/MAD has
    a 50% breakdown point): per event type, nearest-rank median, MAD,
    and how many values sit beyond 3·MAD.

    Determinism: both medians are NEAREST-RANK selections (qf03's
    rule — rank ceil(n/2) under (value, event_id) order), never
    interpolated, so the thresholds are actual data values and the
    outlier test compares raw doubles — bit-identical cross-engine.
    Scale shape: two rank-selection passes (each one window over the
    type partition) + one broadcast join of the |types|-row MAD
    table; no sort of the full relation beyond the per-type windows.
    """
    from pyspark.sql import Window as W

    e = load_table(spark, sf_dir, "events").select("event_type", "event_id", "value")

    def nearest_rank_median(df, col, out):
        w = W.partitionBy("event_type").orderBy(col, "event_id")
        r = df.select(
            "event_type",
            F.col(col),
            F.row_number().over(w).cast("long").alias("rn"),
            F.count(F.lit(1)).over(W.partitionBy("event_type")).alias("n"),
        )
        return r.where(
            F.col("rn") == F.ceil(F.col("n") / 2.0).cast("long")
        ).select("event_type", F.col(col).alias(out))

    med = nearest_rank_median(e, "value", "median")
    dev = e.join(F.broadcast(med), "event_type").select(
        "event_type",
        "event_id",
        "value",
        "median",
        F.abs(F.col("value") - F.col("median")).alias("d"),
    )
    mad = nearest_rank_median(dev, "d", "mad")
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.round(F.min("median"), 6).alias("median"),
            F.round(F.min("mad"), 6).alias("mad"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(
                F.when(F.col("d") > MAD_K_SCALED * F.col("mad"), 1).otherwise(0)
            ).alias("n_outliers"),
        )
    )


# ---------------------------------------------------------------------------
# qf08: feature hashing (the hashing trick) + collision audit
# ---------------------------------------------------------------------------

FH_BUCKETS = 256  # 2^8 hashed feature dimensions


@register(
    "qf08_feature_hashing",
    tags=("features", "text", "sketch"),
    oracle=f"""
WITH toks AS (
  SELECT unnest(list_filter(string_split(lower(text), ' '), x -> x <> ''))
           AS tok
  FROM documents),
tc AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS n FROM toks GROUP BY tok),
hashed AS (
  SELECT tok, n,
         ('0x' || substr(md5('fh:' || tok), 1, 7))::BIGINT % {FH_BUCKETS}
           AS bucket,
         (('0x' || substr(md5('fhs:' || tok), 1, 7))::BIGINT % 2) * 2 - 1
           AS sign
  FROM tc)
SELECT bucket,
       CAST(COUNT(*) AS BIGINT) AS n_distinct_tokens,
       CAST(SUM(n) AS BIGINT) AS n_tokens,
       CAST(SUM(sign * n) AS BIGINT) AS signed_sum,
       CAST(SUM(CASE WHEN sign = 1 THEN n ELSE 0 END) AS BIGINT) AS pos_mass
FROM hashed GROUP BY bucket
""",
)
def qf08_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick (Weinberger et al. 2009 — vowpal-wabbit's
    featurizer): project an unbounded vocabulary into {FH_BUCKETS}
    fixed dimensions via bucket = h(token), value accumulated with a
    second sign hash so colliding tokens cancel in expectation instead
    of piling up. Reported per bucket: distinct-token collisions,
    token mass, and the signed sum — the collision/load audit that
    prices the dimensionality choice (buckets with many distinct
    tokens are where the model loses resolution; the qt24 vocab-
    coverage curve is the dictionary-based alternative this replaces).

    Determinism: bucket and sign derive from md5 (the qs05/qh03
    uniform source), masses are exact integers.

    Scale shape (100 TB): the corpus reduces to the vocab-sized token
    count relation FIRST (the same rule-7 reduction as qt18), so
    hashing and the bucket rollup touch |vocab| rows, not the token
    stream; output is ≤{FH_BUCKETS} rows regardless of corpus size.
    Per-document hashed VECTORS (the serving form) are this same
    expression at doc grain — the corpus audit is what's pinned."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(
            F.filter(F.split(F.lower(F.col("text")), " "), lambda x: x != "")
        ).alias("tok")
    )
    tc = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    bucket = (
        F.conv(F.substring(F.md5(F.concat(F.lit("fh:"), F.col("tok"))), 1, 7), 16, 10)
        .cast("long") % FH_BUCKETS
    )
    sign = (
        F.conv(F.substring(F.md5(F.concat(F.lit("fhs:"), F.col("tok"))), 1, 7), 16, 10)
        .cast("long") % 2
    ) * 2 - 1
    hashed = tc.select("tok", "n", bucket.alias("bucket"), sign.alias("sign"))
    return hashed.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_distinct_tokens"),
        F.sum("n").alias("n_tokens"),
        F.sum(F.col("sign") * F.col("n")).cast("long").alias("signed_sum"),
        F.sum(F.when(F.col("sign") == 1, F.col("n")).otherwise(0))
        .cast("long")
        .alias("pos_mass"),
    )


# ---------------------------------------------------------------------------
# qf09: weighted median / weighted quantiles
# ---------------------------------------------------------------------------


@register(
    "qf09_weighted_median",
    tags=("features", "window", "agg"),
    oracle="""
WITH pts AS (
  SELECT l_returnflag,
         CAST(l_extendedprice AS DECIMAL(18,2)) AS price,
         SUM(CAST(l_quantity AS DECIMAL(18,2))) AS w
  FROM lineitem GROUP BY l_returnflag, CAST(l_extendedprice AS DECIMAL(18,2))),
cum AS (
  SELECT l_returnflag, price, w,
         SUM(w) OVER (PARTITION BY l_returnflag ORDER BY price
                      ROWS UNBOUNDED PRECEDING) AS cw,
         SUM(w) OVER (PARTITION BY l_returnflag) AS total
  FROM pts)
SELECT l_returnflag,
       CAST(MIN(CASE WHEN cw * 2 >= total THEN price END) AS DOUBLE)
         AS w_median,
       CAST(MIN(CASE WHEN cw * 10 >= total THEN price END) AS DOUBLE)
         AS w_p10,
       CAST(MIN(CASE WHEN cw * 10 >= total * 9 THEN price END) AS DOUBLE)
         AS w_p90,
       CAST(SUM(w) AS DOUBLE) AS total_weight
FROM cum GROUP BY l_returnflag
""",
)
def qf09_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted quantiles per group — the feature-engineering stat
    percentile_approx cannot express: each lineitem price counts with
    its QUANTITY as mass, and the weighted p10/p50/p90 are the smallest
    prices whose cumulative quantity mass reaches 10/50/90% of the
    group's total. Exact DECIMAL mass end-to-end; the quantile rule is
    the integer-free cross-multiplied form (cw * k >= total * j), so no
    division and no float threshold ever decides a row.

    Scale shape (100 TB): lineitem first collapses to distinct
    (flag, price) grain with a map-side-combinable DECIMAL weight sum —
    the window then runs over the collapsed point set, partitioned by
    group (never a global or row-grain window), and the final fold is
    one more map-side-combinable aggregate. Two shuffles total, both at
    point grain, independent of row count at fixed price cardinality."""
    li = load_table(spark, sf_dir, "lineitem")
    pts = (
        li.groupBy(
            "l_returnflag",
            F.col("l_extendedprice").cast("decimal(18,2)").alias("price"),
        )
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("w"))
    )
    from pyspark.sql import Window as W

    cum = pts.select(
        "l_returnflag",
        "price",
        "w",
        F.sum("w")
        .over(
            W.partitionBy("l_returnflag")
            .orderBy("price")
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        .alias("cw"),
        F.sum("w").over(W.partitionBy("l_returnflag")).alias("total"),
    )
    return cum.groupBy("l_returnflag").agg(
        F.min(F.when(F.col("cw") * 2 >= F.col("total"), F.col("price")))
        .cast("double")
        .alias("w_median"),
        F.min(F.when(F.col("cw") * 10 >= F.col("total"), F.col("price")))
        .cast("double")
        .alias("w_p10"),
        F.min(
            F.when(F.col("cw") * 10 >= F.col("total") * 9, F.col("price"))
        )
        .cast("double")
        .alias("w_p90"),
        F.sum("w").cast("double").alias("total_weight"),
    )
