"""Incremental aggregate maintenance (IVM) — the 100 TB answer to
"refresh the rollup": never re-aggregate history, maintain a MERGEABLE
partial-aggregate state and fold each new ingest partition into it.

The reference keeps exactly this shape in memory for its interval
stats (count/sum/avg merged per completed event, internal/app/
app.go:75-110, reset per interval); here it is generalized to a
persistent table: the state columns are the classic commutative
monoid (count, exact decimal sum, min, max) so that

    state(A ∪ B) = merge(state(A), state(B))

holds exactly, for any partitioning of the input and in any merge
order. Refresh cost is O(|new partition| + |rollup|), independent of
history size — at 100 TB that is the difference between scanning one
day and scanning three years. Non-decomposable aggregates (exact
distinct, exact median) do NOT fit this state; they need either the
full re-scan or a mergeable sketch (HLL / KLL — q29's
approx_count_distinct is the engine's sketch path).

finalize() derives the presentation columns (avg = sum/count) from the
state — derived values are never stored, so merges can't drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_stream_aggr_spark.plans.registry import register
from event_stream_aggr_spark.tables import load_table

#: Rollup grain: event type × hour-of-day. Chosen so every ingest
#: partition (a day of events) touches every group — merges are real,
#: not a disjoint union.
ROLLUP_KEYS = ("event_type", "hour")

#: First day of the "new" ingest partition in the qi01 scenario.
DELTA_CUT_DAY = "2024-01-24"


def partial_rollup(events: DataFrame) -> DataFrame:
    """Aggregate raw events to the mergeable state at ROLLUP_KEYS grain.

    State columns: n (count), vdec (exact DECIMAL(18,6) sum — exact ⇒
    merge-order independent, registry float rule), vmin, vmax.
    """
    return (
        events.select(
            "event_type",
            F.hour("ts").cast("long").alias("hour"),
            F.col("value"),
        )
        .groupBy(*ROLLUP_KEYS)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("vdec"),
            F.min("value").alias("vmin"),
            F.max("value").alias("vmax"),
        )
    )


def merge_rollups(*states: DataFrame) -> DataFrame:
    """Fold any number of partial states into one — the IVM refresh.

    A union + re-aggregation of |rollup|-sized relations: count and
    decimal sums add, min/max combine. No raw events are touched.
    """
    if not states:
        raise ValueError("merge_rollups needs at least one state")
    unioned = states[0]
    for s in states[1:]:
        unioned = unioned.unionByName(s)
    return unioned.groupBy(*ROLLUP_KEYS).agg(
        F.sum("n").alias("n"),
        F.sum("vdec").cast("decimal(18,6)").alias("vdec"),
        F.min("vmin").alias("vmin"),
        F.max("vmax").alias("vmax"),
    )


def finalize_rollup(state: DataFrame) -> DataFrame:
    """Presentation view over the state: derived columns computed at
    read time so stored state stays minimal and merge-exact."""
    return state.select(
        "event_type",
        "hour",
        F.col("n").alias("n_events"),
        F.col("vdec").cast("double").alias("total_value"),
        F.col("vmin").alias("min_value"),
        F.col("vmax").alias("max_value"),
        F.round(F.col("vdec").cast("double") / F.col("n"), 6).alias("avg_value"),
    )


@register(
    "qi01_incremental_rollup",
    bench=True,
    tags=("incremental", "aggregation", "scale"),
    oracle="""
SELECT event_type,
       CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hour,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
       MIN(value) AS min_value,
       MAX(value) AS max_value,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6)
         AS avg_value
FROM events
GROUP BY event_type, EXTRACT(hour FROM ts)
""",
)
def qi01_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained hourly rollup: history (days before
    DELTA_CUT_DAY) is aggregated once into the stored partial state,
    the new ingest partition is aggregated separately, and the
    two states MERGE — count/decimal-sum/min/max are commutative
    monoids, so the merged rollup equals the oracle's full re-scan
    bit-for-bit while only ever re-reading the delta.

    Scale shape: both partials are map-side-combined hash aggregates
    (raw events shuffle once, as |grain| partial rows); the merge
    itself shuffles only 2·|rollup| tiny state rows. At 100 TB the
    base state is a stored table and this query's cost is the delta
    scan — the full-history scan exists here only because the oracle
    must recompute from scratch to prove equality.
    """
    e = load_table(spark, sf_dir, "events")
    day = F.date_format("ts", "yyyy-MM-dd")
    base = partial_rollup(e.where(day < DELTA_CUT_DAY))
    delta = partial_rollup(e.where(day >= DELTA_CUT_DAY))
    return finalize_rollup(merge_rollups(base, delta))


# ---------------------------------------------------------------------------
# qi02: incremental DISTINCT via mergeable HLL sketch state
# ---------------------------------------------------------------------------

SKETCH_REL_ERR = 0.05


@register(
    "qi02_incremental_distinct",
    tags=("incremental", "approx", "scale"),
    oracle=f"""
SELECT event_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
       ABS(CAST(approx_count_distinct(user_id) AS DOUBLE)
           / COUNT(DISTINCT user_id) - 1) <= {SKETCH_REL_ERR} AS sketch_ok
FROM events GROUP BY event_type
""",
)
def qi02_incremental_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The missing piece of qi01's monoid state: COUNT(DISTINCT) is not
    decomposable exactly, but its SKETCH is — per-partition Datasketches
    HLL sketches (`hll_sketch_agg`) are a commutative monoid under
    `hll_union_agg`, so distinct-user state refreshes exactly like
    qi01's sums: sketch the delta, union into the stored sketch, never
    re-scan history. This query computes per-type distinct users from
    the UNION of separately-built base/delta sketches (the IVM path),
    alongside the exact twin.

    Cross-engine contract (q29's pattern): sketch estimates are
    engine-specific, so the hashed columns are the EXACT distinct twin
    plus each engine's own sketch-within-5% boolean; the merged sketch
    still executes in the Spark plan. tests/test_incremental.py
    additionally asserts merge-invariance in-engine: the union of the
    split sketches estimates EXACTLY what one global sketch does.
    """
    e = load_table(spark, sf_dir, "events")
    day = F.date_format("ts", "yyyy-MM-dd")
    base = e.where(day < DELTA_CUT_DAY)
    delta = e.where(day >= DELTA_CUT_DAY)
    sketches = (
        base.groupBy("event_type")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        .unionByName(
            delta.groupBy("event_type").agg(F.hll_sketch_agg("user_id").alias("sk"))
        )
    )
    merged = sketches.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users")
    )
    exact = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    return exact.join(merged, "event_type").select(
        "event_type",
        "exact_users",
        (
            F.abs(F.col("approx_users").cast("double") / F.col("exact_users") - 1)
            <= SKETCH_REL_ERR
        ).alias("sketch_ok"),
    )


# ---------------------------------------------------------------------------
# qi03: incremental QUANTILE maintenance (micro-bucket histograms merge)
# ---------------------------------------------------------------------------

QUANT_CUT_DAY = "2024-01-15"   # delta boundary: base ≤ cut < delta
QUANT_BUCKET_DECI = 10         # bucket = floor(value · 10) → 0.1 resolution


@register(
    "qi03_incremental_quantiles",
    tags=("incremental", "stats", "sketch"),
    oracle=f"""
WITH ev AS (
  SELECT CAST(FLOOR(value * {QUANT_BUCKET_DECI}) AS BIGINT) AS bucket,
         strftime(ts, '%Y-%m-%d') <= '{QUANT_CUT_DAY}' AS is_base
  FROM events),
base_h AS (
  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n FROM ev
  WHERE is_base GROUP BY bucket),
delta_h AS (
  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n FROM ev
  WHERE NOT is_base GROUP BY bucket),
merged AS (
  SELECT bucket, CAST(SUM(n) AS BIGINT) AS n FROM (
    SELECT * FROM base_h UNION ALL SELECT * FROM delta_h)
  GROUP BY bucket),
direct AS (
  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n FROM ev GROUP BY bucket),
consistency AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_mismatched_buckets
  FROM merged m FULL JOIN direct d USING (bucket)
  WHERE m.n IS DISTINCT FROM d.n),
cum AS (
  SELECT bucket, n,
         SUM(n) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS c,
         SUM(n) OVER () AS total
  FROM merged),
pick AS (
  SELECT
    MIN(CASE WHEN c * 100 >= total * 50 THEN bucket END) AS p50_bucket,
    MIN(CASE WHEN c * 100 >= total * 90 THEN bucket END) AS p90_bucket,
    MIN(CASE WHEN c * 100 >= total * 99 THEN bucket END) AS p99_bucket,
    CAST(MIN(total) AS BIGINT) AS n_total
  FROM cum)
SELECT n_total,
       CAST(p50_bucket AS BIGINT) AS p50_deci,
       CAST(p90_bucket AS BIGINT) AS p90_deci,
       CAST(p99_bucket AS BIGINT) AS p99_deci,
       (SELECT n_mismatched_buckets FROM consistency) AS n_mismatched_buckets
FROM pick
""",
)
def qi03_incremental_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental QUANTILE maintenance — the qi01 monoid contract
    extended to percentiles: a fixed-width micro-bucket histogram is
    a mergeable state (counts add cell-wise), so a base histogram and
    a delta-day histogram MERGE into exactly the histogram a full
    re-scan builds — proven in-data (n_mismatched_buckets must be 0)
    — and p50/p90/p99 read off the merged cumulative counts at
    bucket resolution (0.1 value units) without ever sorting events.
    The same maintenance recipe t-digest/KLL serve with probabilistic
    state; the fixed-width form trades memory (domain-bounded bucket
    count) for EXACT determinism (qa04's argument, made incremental).

    Scale shape (100 TB): each refresh aggregates ONLY the delta to
    its bucket relation (map-side combinable) and merges two tiny
    histograms; the percentile extraction is a window over the
    domain-bounded bucket relation. No event-grain state, no re-scan
    of history — the qi01 IVM contract verbatim."""
    e = load_table(spark, sf_dir, "events")
    ev = e.select(
        F.expr(f"cast(floor(value * {QUANT_BUCKET_DECI}) as bigint)").alias(
            "bucket"
        ),
        (F.date_format("ts", "yyyy-MM-dd") <= QUANT_CUT_DAY).alias("is_base"),
    )
    base_h = (
        ev.filter("is_base").groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))
    )
    delta_h = (
        ev.filter(~F.col("is_base"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    merged = (
        base_h.unionAll(delta_h)
        .groupBy("bucket")
        .agg(F.sum("n").alias("n"))
    )
    direct = ev.groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))
    consistency = (
        merged.withColumnRenamed("n", "mn")
        .join(direct.withColumnRenamed("n", "dn"), "bucket", "full_outer")
        .filter(
            ~(F.col("mn").eqNullSafe(F.col("dn")))
        )
        .agg(F.count(F.lit(1)).alias("n_mismatched_buckets"))
    )
    from pyspark.sql import Window as W

    w_cum = W.orderBy("bucket").rowsBetween(W.unboundedPreceding, 0)
    w_all = W.partitionBy()
    cum = merged.select(
        "bucket",
        F.sum("n").over(w_cum).alias("c"),
        F.sum("n").over(w_all).alias("total"),
    )
    pick = cum.agg(
        F.min(
            F.when(F.col("c") * 100 >= F.col("total") * 50, F.col("bucket"))
        ).alias("p50_deci"),
        F.min(
            F.when(F.col("c") * 100 >= F.col("total") * 90, F.col("bucket"))
        ).alias("p90_deci"),
        F.min(
            F.when(F.col("c") * 100 >= F.col("total") * 99, F.col("bucket"))
        ).alias("p99_deci"),
        F.min("total").cast("long").alias("n_total"),
    )
    return pick.crossJoin(F.broadcast(consistency)).select(
        "n_total",
        F.col("p50_deci").cast("long").alias("p50_deci"),
        F.col("p90_deci").cast("long").alias("p90_deci"),
        F.col("p99_deci").cast("long").alias("p99_deci"),
        "n_mismatched_buckets",
    )


# ---------------------------------------------------------------------------
# qi04: incremental JOIN view maintenance (the delta-join algebra)
# ---------------------------------------------------------------------------

#: deterministic ingest split, deliberately NOT FK-aligned across the
#: two tables: every 10th order (by key) is the orders delta, while the
#: lineitem delta is the EVEN line numbers of every order.  An aligned
#: split (both sides by orderkey % 10) would make the cross terms
#: ΔA⋈B_old and A_old⋈ΔB provably empty, so the in-query
#: incremental==recomputed equality could never catch a bug in them
#: (round-7 ADVICE).  With this split all three delta-join terms carry
#: rows and the equality genuinely constrains the bilinear rule.
JOIN_DELTA_MOD = 10
LINE_DELTA_MOD = 2


@register(
    "qi04_incremental_join",
    tags=("incremental", "join", "scale"),
    oracle=f"""
WITH base_o AS (SELECT * FROM orders WHERE o_orderkey % {JOIN_DELTA_MOD} <> 0),
delta_o AS (SELECT * FROM orders WHERE o_orderkey % {JOIN_DELTA_MOD} = 0),
base_l AS (SELECT * FROM lineitem WHERE l_linenumber % {LINE_DELTA_MOD} <> 0),
delta_l AS (SELECT * FROM lineitem WHERE l_linenumber % {LINE_DELTA_MOD} = 0),
proj AS (
  SELECT o.o_orderpriority, l.l_orderkey, l.l_linenumber,
         CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6)) AS rev
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
v_old AS (
  SELECT o.o_orderpriority, l.l_orderkey, l.l_linenumber,
         CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6)) AS rev
  FROM base_o o JOIN base_l l ON o.o_orderkey = l.l_orderkey),
d1 AS (
  SELECT o.o_orderpriority, l.l_orderkey, l.l_linenumber,
         CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6)) AS rev
  FROM delta_o o JOIN base_l l ON o.o_orderkey = l.l_orderkey),
d2 AS (
  SELECT o.o_orderpriority, l.l_orderkey, l.l_linenumber,
         CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6)) AS rev
  FROM base_o o JOIN delta_l l ON o.o_orderkey = l.l_orderkey),
d3 AS (
  SELECT o.o_orderpriority, l.l_orderkey, l.l_linenumber,
         CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6)) AS rev
  FROM delta_o o JOIN delta_l l ON o.o_orderkey = l.l_orderkey),
inc AS (
  SELECT * FROM v_old UNION ALL SELECT * FROM d1
  UNION ALL SELECT * FROM d2 UNION ALL SELECT * FROM d3)
SELECT method, o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(rev) AS DOUBLE) AS revenue
FROM (
  SELECT 'incremental' AS method, * FROM inc
  UNION ALL
  SELECT 'recomputed' AS method, * FROM proj)
GROUP BY method, o_orderpriority
""",
)
def qi04_incremental_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a JOIN view (the delta-join algebra
    qi01-qi03's aggregates sit on top of — DBSP/differential-dataflow's
    bilinear rule): Δ(A ⋈ B) = ΔA ⋈ B_old  ∪  A_old ⋈ ΔB  ∪  ΔA ⋈ ΔB,
    so the maintained view is V_old plus three DELTA-SIDED joins —
    history is never re-joined against itself. The query materializes
    both the incrementally-maintained orders⋈lineitem view and the
    from-scratch recompute, and reports per-priority row counts and
    DECIMAL revenue for BOTH methods side by side: the driver-checked
    result shows the two methods byte-equal per group, in both engines.
    The orders/lineitem deltas are split by NON-aligned predicates
    (orderkey mod vs linenumber parity) so every one of the three
    delta terms is non-empty and the equality actually exercises the
    cross terms — see LINE_DELTA_MOD above.

    Scale shape: every delta term joins a |Δ|-sized side against the
    base (equi-join on the order key — at 100 TB the base is bucketed
    /clustered on that key, so delta terms co-locate and the refresh
    cost is O(|Δ| + matches), never a base×base rescan); the recompute
    branch exists only as the in-query ground truth, exactly like
    qi01's full-scan oracle. The v_old term stands in for the stored
    view a real deployment reads, not recomputes."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    base_o = o.where(F.col("o_orderkey") % JOIN_DELTA_MOD != 0)
    delta_o = o.where(F.col("o_orderkey") % JOIN_DELTA_MOD == 0)
    base_l = li.where(F.col("l_linenumber") % LINE_DELTA_MOD != 0)
    delta_l = li.where(F.col("l_linenumber") % LINE_DELTA_MOD == 0)

    def proj(os: DataFrame, ls: DataFrame) -> DataFrame:
        return (
            os.join(ls, os["o_orderkey"] == ls["l_orderkey"])
            .select(
                "o_orderpriority",
                "l_orderkey",
                "l_linenumber",
                (F.col("l_extendedprice") * (1 - F.col("l_discount")))
                .cast("decimal(18,6)")
                .alias("rev"),
            )
        )

    inc = (
        proj(base_o, base_l)
        .unionAll(proj(delta_o, base_l))
        .unionAll(proj(base_o, delta_l))
        .unionAll(proj(delta_o, delta_l))
    )
    full = proj(o, li)
    both = inc.select(F.lit("incremental").alias("method"), "*").unionAll(
        full.select(F.lit("recomputed").alias("method"), "*")
    )
    return both.groupBy("method", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("rev").cast("double").alias("revenue"),
    )


# ---------------------------------------------------------------------------
# qi05: retraction-safe rollup — IVM under CDC DELETEs
# ---------------------------------------------------------------------------

#: Epochs are order years; a row's retraction arrives one epoch AFTER
#: its insert, so the fold genuinely exercises cross-epoch deletes.
RETRACT_EPOCH_COL = "epoch"


def signed_partial(changes: DataFrame, keys: list[str]) -> DataFrame:
    """Aggregate a batch of SIGNED changes (+1 insert / -1 delete, the
    Flink-changelog / DBSP Z-set convention) to the retraction-safe
    state at ``keys`` grain: ``n`` (signed row multiplicity) and
    ``sdec`` (signed exact DECIMAL sum). Expects columns ``w``
    (±1 long) and ``v`` (DECIMAL(18,2) measure)."""
    return changes.groupBy(*keys).agg(
        F.sum("w").alias("n"),
        F.sum(F.col("w") * F.col("v")).cast("decimal(18,2)").alias("sdec"),
    )


def merge_signed(state: DataFrame, delta: DataFrame, keys: list[str]) -> DataFrame:
    """Fold one epoch's signed partial into the state: a union +
    re-aggregation of |state|-sized relations, identical algebra to
    ``merge_rollups`` but over the SIGNED monoid — counts and sums
    add, negative weights cancel prior inserts. Groups are NOT
    filtered here: a group at n=0 must stay mergeable (a later
    re-insert revives it); zero-groups disappear at ``finalize``
    read time, the only place liveness is a fact."""
    return (
        state.unionByName(delta)
        .groupBy(*keys)
        .agg(
            F.sum("n").alias("n"),
            F.sum("sdec").cast("decimal(18,2)").alias("sdec"),
        )
    )


def finalize_signed(state: DataFrame, keys: list[str]) -> DataFrame:
    """Presentation view: only LIVE groups (n > 0) survive — the part
    the additive qi01 monoid cannot express (a fully-retracted group
    must vanish, not report a stale sum). MIN/MAX are deliberately
    absent from the signed state: they are not retraction-safe (the
    deleted row might BE the min), which is exactly why qi01 keeps
    them and qi05 does not."""
    return state.filter(F.col("n") > 0).select(
        *keys,
        F.col("n").alias("n_live"),
        F.col("sdec").cast("double").alias("total_price"),
    )


@register(
    "qi05_retraction_rollup",
    bench=True,
    tags=("incremental", "cdc", "scale"),
    oracle="""
WITH chg AS (
  SELECT o_orderstatus, o_orderpriority, 1 AS w,
         CAST(o_totalprice AS DECIMAL(18,2)) AS v
  FROM orders
  UNION ALL
  SELECT o_orderstatus, o_orderpriority, -1 AS w,
         CAST(o_totalprice AS DECIMAL(18,2)) AS v
  FROM orders WHERE o_orderstatus = 'F')
SELECT o_orderstatus, o_orderpriority,
       CAST(SUM(w) AS BIGINT) AS n_live,
       CAST(SUM(w * v) AS DOUBLE) AS total_price
FROM chg
GROUP BY o_orderstatus, o_orderpriority
HAVING SUM(w) > 0
""",
)
def qi05_retraction_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVM under DELETES — the capability qi01-qi04's additive monoids
    lack: maintain a grouped rollup from a CDC changelog containing
    retractions, by keeping SIGNED (count, exact-decimal-sum) state
    (a Z-set / Flink-retract-stream in monoid form). The CDC feed is
    derived deterministically from orders: every order INSERTs (+1) in
    its order-year epoch; every 'F' (fulfilled-then-cancelled in this
    scenario) order RETRACTS (-1) one epoch later. The state is folded
    one epoch at a time — deletes land epochs after their inserts, and
    the final state equals the oracle's one-pass signed aggregate
    bit-for-bit. Fully-retracted groups (every 'F' group, since each
    F-insert is eventually cancelled) hit n=0 and vanish at finalize;
    MIN/MAX are deliberately NOT maintained (not retraction-safe — the
    deleted row might be the extremum; re-scan or a deletable sketch
    is the honest answer there).

    Scale shape (100 TB): each epoch aggregates ONLY its delta to
    |grain| signed rows (map-side combinable), and every merge
    shuffles 2·|grain| state rows — refresh cost is O(|Δ| + |rollup|),
    independent of history, exactly qi01's bound but now valid under
    deletes. The changelog is DISK_ONLY-materialized ONCE (in a real
    CDC feed it arrives materialized; here that one checkpoint job
    replaces ~2 parquet scans per epoch), the epoch domain reads off
    the materialized blocks in the same scalar min/max stats pass
    (the qz04 pattern), and the fold is a BOUNDED driver loop over
    it — ~8 iterations, each a tiny block-scan aggregate; no
    growing-lineage hazard at 8 state-sized plans. The final
    generation stays registered (the returned frame reads those
    blocks; GC cleans them when the caller drops it — the
    connected_components discipline)."""
    from event_stream_aggr_spark.operators.lifecycle import disk_checkpoint_lazy

    keys = ["o_orderstatus", "o_orderpriority"]
    o = load_table(spark, sf_dir, "orders").select(
        *keys,
        F.year("o_orderdate").cast("long").alias("yr"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("v"),
    )
    inserts = o.select(
        *keys, F.col("yr").alias(RETRACT_EPOCH_COL), F.lit(1).cast("long").alias("w"), "v"
    )
    deletes = o.filter(F.col("o_orderstatus") == "F").select(
        *keys,
        (F.col("yr") + 1).alias(RETRACT_EPOCH_COL),
        F.lit(-1).cast("long").alias("w"),
        "v",
    )
    changes, _ = disk_checkpoint_lazy(inserts.unionByName(deletes))
    # epoch domain from the data (one scalar agg over the blocks the
    # mark above materializes with this very action): the changelog's
    # epoch column already spans insert years plus the trailing epoch
    # the last year's retractions land in
    b = changes.agg(
        F.min(RETRACT_EPOCH_COL).alias("lo"),
        F.max(RETRACT_EPOCH_COL).alias("hi"),
    ).first()
    lo, hi = int(b.lo), int(b.hi)
    state = None
    for ep in range(lo, hi + 1):
        delta = signed_partial(
            changes.filter(F.col(RETRACT_EPOCH_COL) == ep), keys
        )
        state = delta if state is None else merge_signed(state, delta, keys)
    return finalize_signed(state, keys)


@register(
    "qi06_retraction_distinct",
    tags=("incremental", "cdc", "scale"),
    oracle="""
WITH chg AS (
  SELECT o_orderpriority, o_custkey, 1 AS w FROM orders
  UNION ALL
  SELECT o_orderpriority, o_custkey, -1 AS w
  FROM orders WHERE o_orderstatus = 'F'),
live AS (
  SELECT o_orderpriority, o_custkey
  FROM chg GROUP BY o_orderpriority, o_custkey HAVING SUM(w) > 0)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_distinct_custkeys
FROM live GROUP BY o_orderpriority
""",
)
def qi06_retraction_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact DISTINCT maintained under DELETES — the aggregate qi01's
    module docstring calls non-decomposable, made decomposable the
    classic way: lift the state grain from (group) to (group, value).
    Per-(priority, custkey) SIGNED multiplicities are a mergeable
    Z-set (qi05's monoid — adds commute, deletes cancel), and the
    group's distinct count is simply the number of values with live
    multiplicity > 0, computed at READ time. qi02's HLL sketch cannot
    do this (sketch deletions need the inflate-prone sketch-of-deltas
    trick); the exact lifted state can, at the cost of state
    proportional to |distinct pairs| — the honest trade, stated.
    The CDC feed mirrors qi05: every order inserts its custkey in its
    order-year epoch, every 'F' order retracts it one epoch later; a
    customer stays counted while ANY of its orders is live.

    Scale shape (100 TB): each epoch aggregates its delta to
    |live pairs touched| signed rows (map-side combinable); merges
    shuffle only state rows at (group, value) grain; the read is one
    further map-side-combinable count to |groups| rows. Refresh cost
    O(|delta| + |state|), independent of history — the same bounded
    driver loop over the data-derived year domain as qi05 (one scalar
    min/max agg, ~8 epochs)."""
    keys = ["o_orderpriority", "o_custkey"]
    o = load_table(spark, sf_dir, "orders").select(
        *keys,
        F.year("o_orderdate").cast("long").alias("yr"),
        F.col("o_orderstatus").alias("status"),
    )
    inserts = o.select(
        *keys, F.col("yr").alias(RETRACT_EPOCH_COL), F.lit(1).cast("long").alias("w")
    )
    deletes = o.filter(F.col("status") == "F").select(
        *keys,
        (F.col("yr") + 1).alias(RETRACT_EPOCH_COL),
        F.lit(-1).cast("long").alias("w"),
    )
    changes = inserts.unionByName(deletes)
    b = o.agg(F.min("yr").alias("lo"), F.max("yr").alias("hi")).first()
    state = None
    for ep in range(int(b.lo), int(b.hi) + 2):
        delta = (
            changes.filter(F.col(RETRACT_EPOCH_COL) == ep)
            .groupBy(*keys)
            .agg(F.sum("w").alias("n"))
        )
        if state is None:
            state = delta
        else:
            state = (
                state.unionByName(delta)
                .groupBy(*keys)
                .agg(F.sum("n").alias("n"))
            )
    return (
        state.filter(F.col("n") > 0)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_distinct_custkeys"))
    )


# ---------------------------------------------------------------------------
# qi07: incremental exact top-k maintenance (bounded mergeable state)
# ---------------------------------------------------------------------------

#: qi07 keeps the K highest-priced orders per priority class.
TOPK_K = 3


def topk_prune(state: DataFrame, keys: list[str], k: int = TOPK_K) -> DataFrame:
    """Keep each group's top-k rows by (price desc, o_orderkey asc) —
    the merge operator of the top-k monoid: merge(A, B) =
    prune(A ∪ B). Deterministic (unique tiebreaker), window
    partitioned by group."""
    from pyspark.sql import Window as W

    w = W.partitionBy(*keys).orderBy(
        F.col("price").desc(), F.col("o_orderkey").asc()
    )
    return (
        state.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


@register(
    "qi07_incremental_topk",
    tags=("incremental", "window", "scale"),
    oracle=f"""
WITH ranked AS (
  SELECT o_orderpriority, o_orderkey,
         CAST(o_totalprice AS DECIMAL(18,2)) AS price,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY CAST(o_totalprice AS DECIMAL(18,2)) DESC,
                                     o_orderkey) AS rnk
  FROM orders)
SELECT o_orderpriority, CAST(rnk AS BIGINT) AS rnk, o_orderkey,
       CAST(price AS DOUBLE) AS price
FROM ranked WHERE rnk <= {TOPK_K}
""",
)
def qi07_incremental_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental EXACT top-k maintenance — the leaderboard shape
    (top-priced orders per priority class) kept fresh without ever
    re-ranking history: per-group top-k is a MERGEABLE, BOUNDED state
    (merge(A, B) = prune(A ∪ B); a row outside some prefix's top-k is
    outside every superset's top-k under inserts, so pruning loses
    nothing — the same monotone-prune argument as the streaming
    skyline's frontier). The orders feed folds one order-year epoch at
    a time, exactly qi05's loop but with ORDER-STATISTIC state instead
    of additive sums — together they cover the two IVM state families
    qi01's monoids don't: retractions (qi05/qi06) and ranking (here).
    The final state equals the oracle's one-pass global ROW_NUMBER
    top-k bit-for-bit. Deletes are out of scope by design: top-k is
    NOT retraction-safe (a deleted leader needs history to backfill) —
    the same honest boundary qi05 states for MIN/MAX.

    Scale shape (100 TB): the changelog materializes ONCE (DISK_ONLY,
    shared with the epoch-domain stats pass); each epoch prunes its
    delta to ≤ k·|groups| rows with a PARTITIONED window (map-side the
    moment AQE sees the tiny grain), and every merge re-ranks at most
    2k rows per group — refresh cost O(|Δ| + k·|groups|), independent
    of history."""
    from event_stream_aggr_spark.operators.lifecycle import disk_checkpoint_lazy

    keys = ["o_orderpriority"]
    o = load_table(spark, sf_dir, "orders").select(
        *keys,
        "o_orderkey",
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
        F.year("o_orderdate").cast("long").alias(RETRACT_EPOCH_COL),
    )
    changes, _ = disk_checkpoint_lazy(o)
    b = changes.agg(
        F.min(RETRACT_EPOCH_COL).alias("lo"),
        F.max(RETRACT_EPOCH_COL).alias("hi"),
    ).first()
    state = None
    for ep in range(int(b.lo), int(b.hi) + 1):
        delta = topk_prune(
            changes.filter(F.col(RETRACT_EPOCH_COL) == ep).drop(
                RETRACT_EPOCH_COL
            ),
            keys,
        )
        state = delta if state is None else topk_prune(
            state.unionByName(delta), keys
        )
    from pyspark.sql import Window as W

    w = W.partitionBy(*keys).orderBy(
        F.col("price").desc(), F.col("o_orderkey").asc()
    )
    return state.select(
        *keys,
        F.row_number().over(w).cast("long").alias("rnk"),
        "o_orderkey",
        F.col("price").cast("double").alias("price"),
    )
