"""Interval-overlap join — the missing join class between J4 (band/
range) and J5 (as-of): match every left interval [l_start, l_end] with
every right interval [r_start, r_end] that overlaps it in time, without
a theta join.

The reference engine has no join at all (SURVEY.md §0 — it is a
flattening processor), but its event-correlation use case (which alerts
fired while a maintenance/incident window was open?) is exactly this
operator, and Spark has no builtin for it: the naive phrasing
``l.start <= r.end AND r.start <= l.end`` plans as
BroadcastNestedLoop/Cartesian — O(|L|·|R|) at 100 TB.

The scalable recipe (the same binning dataflow Flink's interval join
and DuckDB's IEJoin replace): discretize time into fixed-width buckets,
explode each interval onto the buckets it covers, equi-join on the
bucket id, and re-check the exact overlap predicate on the collisions.
Each overlapping pair shares >= 1 bucket, so the equi-join finds it;
the pair is EMITTED exactly once by keeping only the first shared
bucket — the bucket containing ``greatest(l_start, r_start)`` — so no
distinct/dedup shuffle is needed afterwards.

Cost: shuffle of (|L|·avg_span/W + |R|·avg_span/W) exploded rows on the
bucket key + the collision re-check. W tunes the classic bin trade-off
(too small → explosion factor, too large → false collisions); cap/split
pathological long intervals at W·k before the explode. The join itself
is a plain equi shuffle join — AQE-skew-splittable when one time bucket
is hot, which is the realistic skew mode (incident storms).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_stream_aggr_spark.plans.registry import register
from event_stream_aggr_spark.tables import load_table

#: Epoch seconds from a TIMESTAMP_NTZ column without consulting the
#: session timezone (tables.py normalizes events.ts to NTZ micros).
_NTZ_EPOCH_S = "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {col})"


def overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str = "l_start",
    l_end: str = "l_end",
    r_start: str = "r_start",
    r_end: str = "r_end",
    bucket_width: int = 3600,
) -> DataFrame:
    """Inner overlap join on integer interval bounds (closed intervals:
    touching endpoints count as overlap, overlap_sec = 0).

    Returns left ++ right columns + ``overlap_sec`` for every
    overlapping (left, right) pair, each pair exactly once. Bounds must
    be integral (epoch seconds); bucket ids use floor division, so
    negative epochs are handled by ``floor``-semantics ``F.floor``.
    """
    # the internal bucket column and the output column would silently
    # clobber same-named inputs — refuse instead (asof_join's contract)
    clash = {"_bucket", "overlap_sec"} & (set(left.columns) | set(right.columns))
    if clash:
        raise ValueError(
            f"overlap_join reserves column names {sorted(clash)}; "
            "rename these input columns before joining"
        )
    w = int(bucket_width)
    lb = F.explode(
        F.sequence(
            F.floor(F.col(l_start) / w).cast("long"),
            F.floor(F.col(l_end) / w).cast("long"),
        )
    ).alias("_bucket")
    rb = F.explode(
        F.sequence(
            F.floor(F.col(r_start) / w).cast("long"),
            F.floor(F.col(r_end) / w).cast("long"),
        )
    ).alias("_bucket")
    le = left.select("*", lb)
    re = right.select("*", rb)
    first_shared = F.floor(F.greatest(F.col(l_start), F.col(r_start)) / w).cast("long")
    return (
        le.join(re, "_bucket")
        .where(
            (F.col(l_start) <= F.col(r_end))
            & (F.col(r_start) <= F.col(l_end))
            & (F.col("_bucket") == first_shared)
        )
        .drop("_bucket")
        .withColumn(
            "overlap_sec",
            F.least(F.col(l_end), F.col(r_end)) - F.greatest(F.col(l_start), F.col(r_start)),
        )
    )


INCIDENT_HALF_WIDTH_S = 1800  # error event -> +/- 30 min incident window
INCIDENT_SAMPLE_MOD = 20  # every 20th error is an incident (deterministic)
OVERLAP_BUCKET_W = 3600


@register(
    "qj01_interval_overlap_join",
    bench=True,
    tags=("join", "interval", "scale"),
    oracle=f"""
WITH ev AS (
  SELECT user_id, event_id, event_type,
         strftime(ts, '%Y-%m-%d') AS day,
         epoch_us(ts) // 1000000 AS sec
  FROM events),
spans AS (
  SELECT user_id, day, MIN(sec) AS s_start, MAX(sec) AS s_end
  FROM ev GROUP BY user_id, day),
inc AS (
  SELECT sec - {INCIDENT_HALF_WIDTH_S} AS i_start,
         sec + {INCIDENT_HALF_WIDTH_S} AS i_end
  FROM ev
  WHERE event_type = 'error' AND event_id % {INCIDENT_SAMPLE_MOD} = 0),
hits AS (
  SELECT s.user_id, s.day,
         CAST(COUNT(*) AS BIGINT) AS n_incidents,
         CAST(SUM(LEAST(s.s_end, i.i_end) - GREATEST(s.s_start, i.i_start))
              AS BIGINT) AS overlap_sec
  FROM spans s JOIN inc i
    ON s.s_start <= i.i_end AND i.i_start <= s.s_end
  GROUP BY s.user_id, s.day)
SELECT s.user_id, s.day,
       s.s_end - s.s_start AS span_sec,
       COALESCE(h.n_incidents, 0) AS n_incidents,
       COALESCE(h.overlap_sec, 0) AS overlap_sec
FROM spans s
LEFT JOIN hits h ON s.user_id = h.user_id AND s.day = h.day
""",
)
def qj01_interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-outer interval-overlap join: per-user daily activity spans
    [first event, last event] vs global incident windows (+/- 30 min
    around a deterministic 1-in-20 sample of error events); per span,
    how many incidents overlapped it and for how many seconds — the
    alert-vs-maintenance-window correlation the reference's IDS
    pipeline feeds (exploded alerts joined to incident intervals).

    Scale shape: buckets of {OVERLAP_BUCKET_W} s bound the explode factor
    (a day span covers <= 25 buckets, an incident <= 2); the only join is
    an equi-join on the bucket id, each overlapping pair emitted exactly
    once at its first shared bucket — no theta join, no post-join
    distinct. The oracle phrases the same semantics as DuckDB's
    inequality join (its optimizer plans IEJoin; Spark would plan
    BroadcastNestedLoop, which is exactly what the bucketing avoids).
    Left-outer semantics come from re-joining the matched aggregate onto
    the span relation (0-incident spans survive). All arithmetic is
    integer epoch seconds — exact in both engines.
    """
    e = load_table(spark, sf_dir, "events")
    sec = F.expr(_NTZ_EPOCH_S.format(col="ts"))
    ev = e.select(
        "user_id",
        "event_id",
        "event_type",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        sec.alias("sec"),
    )
    spans = ev.groupBy("user_id", "day").agg(
        F.min("sec").alias("s_start"), F.max("sec").alias("s_end")
    )
    inc = (
        ev.where((F.col("event_type") == "error") & (F.col("event_id") % INCIDENT_SAMPLE_MOD == 0))
        .select(
            (F.col("sec") - INCIDENT_HALF_WIDTH_S).alias("i_start"),
            (F.col("sec") + INCIDENT_HALF_WIDTH_S).alias("i_end"),
        )
    )
    pairs = overlap_join(
        spans,
        inc,
        l_start="s_start",
        l_end="s_end",
        r_start="i_start",
        r_end="i_end",
        bucket_width=OVERLAP_BUCKET_W,
    )
    hits = pairs.groupBy("user_id", "day").agg(
        F.count(F.lit(1)).alias("n_incidents"),
        F.sum("overlap_sec").alias("overlap_sec"),
    )
    return (
        spans.join(hits, ["user_id", "day"], "left")
        .select(
            "user_id",
            "day",
            (F.col("s_end") - F.col("s_start")).alias("span_sec"),
            F.coalesce("n_incidents", F.lit(0)).alias("n_incidents"),
            F.coalesce("overlap_sec", F.lit(0)).alias("overlap_sec"),
        )
    )


# ---------------------------------------------------------------------------
# qj02: interval union (merge overlapping intervals → islands)
# ---------------------------------------------------------------------------

UNION_HOLD_S = 300  # each event holds a 5-minute activity interval


@register(
    "qj02_interval_union",
    bench=True,
    tags=("interval", "window", "session"),
    oracle=f"""
WITH iv AS (
  SELECT user_id,
         epoch_us(ts) // 1000000 AS s_start,
         epoch_us(ts) // 1000000 + {UNION_HOLD_S} AS s_end,
         event_id
  FROM events),
flagged AS (
  SELECT user_id, s_start, s_end, event_id,
         CASE WHEN s_start > MAX(s_end) OVER (
                PARTITION BY user_id ORDER BY s_start, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              OR MAX(s_end) OVER (
                PARTITION BY user_id ORDER BY s_start, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
              THEN 1 ELSE 0 END AS new_island
  FROM iv),
islands AS (
  SELECT user_id, s_start, s_end,
         SUM(new_island) OVER (PARTITION BY user_id
                               ORDER BY s_start, event_id
                               ROWS UNBOUNDED PRECEDING) AS island
  FROM flagged)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_islands,
       CAST(SUM(n_iv) AS BIGINT) AS n_intervals,
       CAST(SUM(cov) AS BIGINT) AS covered_sec
FROM (
  SELECT user_id, island, COUNT(*) AS n_iv,
         MAX(s_end) - MIN(s_start) AS cov
  FROM islands GROUP BY user_id, island) t
GROUP BY user_id
""",
)
def qj02_interval_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval UNION (merge overlapping intervals into islands) —
    the third leg of the interval algebra beside qj01's overlap JOIN
    and q27's gap sessionization: every event holds a 5-minute
    activity interval; overlapping/touching holds merge, and each
    user reports island count and total covered seconds — the
    "effective active time" metric billing/SLA/utilization queries
    need, where naive per-interval summing double-counts overlap.

    The classic gaps-and-islands dataflow: ONE user-partitioned sort,
    a running MAX(end) over strictly-prior rows flags island starts
    (an interval starting after everything before it ended opens an
    island — this handles contained intervals, which lag(end) alone
    would break on), a running SUM of flags numbers islands, and one
    aggregation per island then per user. Integer epoch seconds
    end-to-end.

    Scale shape (100 TB): exactly one Exchange (user partitioning)
    reused by both windows and the final aggregations — Catalyst
    plans windows then partial aggs without re-shuffling; island
    state never materializes beyond the window frame. The same
    dataflow with (user, day) keys bounds partition width for
    heavy-hitter users."""
    from pyspark.sql import Window as W

    e = load_table(spark, sf_dir, "events")
    s_start = F.expr(
        "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    iv = e.select(
        "user_id",
        s_start.alias("s_start"),
        (s_start + UNION_HOLD_S).alias("s_end"),
        "event_id",
    )
    w_prev = (
        W.partitionBy("user_id")
        .orderBy("s_start", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    prev_max_end = F.max("s_end").over(w_prev)
    flagged = iv.select(
        "user_id",
        "s_start",
        "s_end",
        "event_id",
        F.when(
            prev_max_end.isNull() | (F.col("s_start") > prev_max_end), 1
        )
        .otherwise(0)
        .alias("new_island"),
    )
    # Island numbering MUST use the same unique (s_start, event_id)
    # tiebreaker as the flagging window: with fixed-width holds s_end
    # adds nothing to (s_start, s_end), so a (user, second)-tied pair
    # at an island boundary would otherwise be split nondeterministically
    # across engines/partitionings (round-5 ADVICE).
    w_isl = (
        W.partitionBy("user_id")
        .orderBy("s_start", "event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    islands = flagged.select(
        "user_id",
        "s_start",
        "s_end",
        F.sum("new_island").over(w_isl).alias("island"),
    )
    per_island = islands.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("n_iv"),
        (F.max("s_end") - F.min("s_start")).alias("cov"),
    )
    return per_island.groupBy("user_id").agg(
        F.countDistinct("island").alias("n_islands"),
        F.sum("n_iv").alias("n_intervals"),
        F.sum("cov").cast("long").alias("covered_sec"),
    )


# ---------------------------------------------------------------------------
# qj03: Allen interval-relation histogram (interval-algebra completeness)
# ---------------------------------------------------------------------------

#: Allen (1983) relation classifier over CLOSED integer intervals
#: (ls, le) vs (rs, re), as a CASE precedence chain. The 11 "contact"
#: relations are mutually exclusive for non-degenerate intervals; for
#: point intervals the chain order resolves the ambiguity, and the
#: SAME order runs in both engines so classification is deterministic.
#: before/after (the 2 disjoint relations) are deliberately absent —
#: enumerating them is the |L|·|R| complement of the overlap join.
_ALLEN_CASE = """CASE
  WHEN ls = rs AND le = re THEN 'equals'
  WHEN ls = rs AND le < re THEN 'starts'
  WHEN ls = rs AND le > re THEN 'started_by'
  WHEN le = re AND ls > rs THEN 'finishes'
  WHEN le = re AND ls < rs THEN 'finished_by'
  WHEN ls > rs AND le < re THEN 'during'
  WHEN ls < rs AND le > re THEN 'contains'
  WHEN le = rs THEN 'meets'
  WHEN re = ls THEN 'met_by'
  WHEN ls < rs THEN 'overlaps'
  ELSE 'overlapped_by'
END"""


@register(
    "qj03_allen_relations",
    tags=("join", "interval", "scale"),
    oracle=f"""
WITH ev AS (
  SELECT user_id, event_id, event_type,
         strftime(ts, '%Y-%m-%d') AS day,
         epoch_us(ts) // 1000000 AS sec
  FROM events),
spans AS (
  SELECT user_id, day, MIN(sec) AS ls, MAX(sec) AS le
  FROM ev GROUP BY user_id, day),
inc AS (
  SELECT sec - {INCIDENT_HALF_WIDTH_S} AS rs,
         sec + {INCIDENT_HALF_WIDTH_S} AS re
  FROM ev
  WHERE event_type = 'error' AND event_id % {INCIDENT_SAMPLE_MOD} = 0),
pairs AS (
  SELECT s.ls, s.le, i.rs, i.re
  FROM spans s JOIN inc i ON s.ls <= i.re AND i.rs <= s.le)
SELECT {_ALLEN_CASE} AS relation,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(LEAST(le, re) - GREATEST(ls, rs)) AS BIGINT) AS contact_sec
FROM pairs GROUP BY 1
""",
)
def qj03_allen_relations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Allen's interval algebra over the qj01 interval pair space
    (Allen 1983 — the 13-relation vocabulary every temporal-reasoning
    and interval-join paper builds on): classify every touching
    (span, incident) pair into its Allen relation and report the
    relation histogram with total contact seconds — the temporal-
    forensics profile that tells an operator whether incidents tend
    to fall INSIDE activity spans ('during'/'contains'), clip their
    edges ('overlaps'), or just graze them ('meets'). The 2 disjoint
    relations (before/after) are the enumeration's complement and are
    deliberately not emitted — they would be the |L|·|R| anti-join.

    Scale shape: pair enumeration is qj01's bucketed equi-join
    (overlap_join — never a theta/BNL join; the oracle phrases the
    same predicate for DuckDB's IEJoin); classification is one
    codegen'd CASE over the collided pairs; the result aggregates to
    <= 11 rows. Integer epoch seconds everywhere — exact in both
    engines, with the CASE precedence order identical on both sides
    so point-interval ties classify identically."""
    e = load_table(spark, sf_dir, "events")
    sec = F.expr(_NTZ_EPOCH_S.format(col="ts"))
    ev = e.select(
        "user_id",
        "event_id",
        "event_type",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        sec.alias("sec"),
    )
    spans = ev.groupBy("user_id", "day").agg(
        F.min("sec").alias("ls"), F.max("sec").alias("le")
    )
    inc = ev.where(
        (F.col("event_type") == "error")
        & (F.col("event_id") % INCIDENT_SAMPLE_MOD == 0)
    ).select(
        (F.col("sec") - INCIDENT_HALF_WIDTH_S).alias("rs"),
        (F.col("sec") + INCIDENT_HALF_WIDTH_S).alias("re"),
    )
    pairs = overlap_join(
        spans,
        inc,
        l_start="ls",
        l_end="le",
        r_start="rs",
        r_end="re",
        bucket_width=OVERLAP_BUCKET_W,
    )
    return (
        pairs.select(F.expr(_ALLEN_CASE).alias("relation"), "overlap_sec")
        .groupBy("relation")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum("overlap_sec").cast("long").alias("contact_sec"),
        )
    )


# ---------------------------------------------------------------------------
# qj04: interval stabbing (coverage depth of point events)
# ---------------------------------------------------------------------------


@register(
    "qj04_interval_stabbing",
    tags=("join", "interval", "scale"),
    oracle=f"""
WITH ev AS (
  SELECT event_id, event_type, epoch_us(ts) // 1000000 AS p
  FROM events),
inc AS (
  SELECT p - {INCIDENT_HALF_WIDTH_S} AS i_start,
         p + {INCIDENT_HALF_WIDTH_S} AS i_end
  FROM ev
  WHERE event_type = 'error' AND event_id % {INCIDENT_SAMPLE_MOD} = 0),
hits AS (
  SELECT e.event_id, CAST(COUNT(*) AS BIGINT) AS depth
  FROM ev e JOIN inc i ON i.i_start <= e.p AND e.p <= i.i_end
  GROUP BY e.event_id),
depths AS (
  SELECT ev.event_id, COALESCE(h.depth, 0) AS depth
  FROM ev LEFT JOIN hits h USING (event_id))
SELECT depth, CAST(COUNT(*) AS BIGINT) AS n_events
FROM depths GROUP BY depth
""",
)
def qj04_interval_stabbing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval STABBING — the point-query member of the interval
    family (qj01 joins interval×interval, qj02 unions, qj03 classifies;
    this asks "how many incident windows were ACTIVE at each event
    instant", the was-it-during-an-incident enrichment an IDS pipeline
    stamps on every alert): each event is a degenerate [p, p] interval,
    stabbed through the same bucketed equi-join as qj01 (a point
    explodes to exactly ONE bucket, so the probe side never amplifies),
    and the result aggregates to the coverage-depth histogram —
    n_events at depth 0, 1, 2, … — the concurrency profile that sizes
    an incident-correlation backlog.

    Scale shape: point probes cost one bucket row each (no explode
    factor at all on the |events| side — strictly cheaper than qj01's
    span side); incidents explode to ≤ 2 buckets; the only joins are
    the bucket equi-join and the depth re-join on event_id (0-depth
    events survive via left join + coalesce). Output is ≤ max-depth
    rows. Integer epoch seconds everywhere."""
    e = load_table(spark, sf_dir, "events")
    sec = F.expr(_NTZ_EPOCH_S.format(col="ts"))
    ev = e.select("event_id", "event_type", sec.alias("p"))
    inc = ev.where(
        (F.col("event_type") == "error")
        & (F.col("event_id") % INCIDENT_SAMPLE_MOD == 0)
    ).select(
        (F.col("p") - INCIDENT_HALF_WIDTH_S).alias("i_start"),
        (F.col("p") + INCIDENT_HALF_WIDTH_S).alias("i_end"),
    )
    pts = ev.select("event_id", F.col("p").alias("p_start"), F.col("p").alias("p_end"))
    hits = overlap_join(
        pts,
        inc,
        l_start="p_start",
        l_end="p_end",
        r_start="i_start",
        r_end="i_end",
        bucket_width=OVERLAP_BUCKET_W,
    ).groupBy("event_id").agg(F.count(F.lit(1)).alias("depth"))
    return (
        ev.select("event_id")
        .join(hits, "event_id", "left")
        .select(F.coalesce("depth", F.lit(0)).alias("depth"))
        .groupBy("depth")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
