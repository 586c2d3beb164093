"""Corpus snapshot diff (dataset versioning audit).

Training corpora ship as versioned snapshots; before retraining on
v(N+1) a pipeline audits WHAT changed — added / removed / changed /
unchanged document counts and identity checksums — both to gate
surprise regressions (a 40% "changed" rate between minor versions is a
bug) and to drive incremental recomputation (only changed partitions
re-enter dedup/scoring).

``snapshot_diff`` is the generic operator: one full-outer equi-join on
the document key, change classification from null-sides and a content
comparison, then a metadata-grain rollup. At 100 TB the join is
key-shuffled and AQE-splittable, and the rollup output is 4 rows —
the audit never materializes doc-grain diff output unless asked.

The registered qv01 derives version B from version A deterministically
(content-hash bands: drop 5%, rewrite 10%, clone 5% under shifted ids)
so the oracle can rebuild the identical pair of snapshots in SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from event_stream_aggr_spark.operators.sampling import _HASH_SPACE, _key_hash
from event_stream_aggr_spark.plans.registry import register
from event_stream_aggr_spark.tables import load_table

#: Band edges over the 2^28 hash space (fractions of the corpus).
V_REMOVED_HI = int(0.05 * _HASH_SPACE)   # [0, 5%): dropped in B
V_CHANGED_HI = int(0.15 * _HASH_SPACE)   # [5%, 15%): text rewritten in B
V_CLONED_LO = int(0.95 * _HASH_SPACE)    # [95%, 100%): cloned as new ids
CLONE_ID_OFFSET = 10_000_000


def snapshot_diff(
    a: DataFrame, b: DataFrame, key: str, content: Column
) -> DataFrame:
    """Per-change-type rollup of two snapshots: full-outer join on
    ``key``, classify (added/removed/changed/unchanged) by null-sides
    and the ``content`` expression (applied to each side's columns via
    the ``a_``/``b_`` prefixes), then count + id-checksum per class."""
    ap = a.select(
        F.col(key).alias("a_key"), content.alias("a_content")
    )
    bp = b.select(
        F.col(key).alias("b_key"), content.alias("b_content")
    )
    j = ap.join(bp, ap["a_key"] == bp["b_key"], "full")
    change = (
        F.when(F.col("a_key").isNull(), F.lit("added"))
        .when(F.col("b_key").isNull(), F.lit("removed"))
        .when(F.col("a_content") != F.col("b_content"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        j.select(
            change.alias("change_type"),
            F.coalesce("a_key", "b_key").alias("k"),
        )
        .groupBy("change_type")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("k").cast("long").alias("id_checksum"),
        )
    )


_B_CTE = f"""
h AS (
  SELECT doc_id, text,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT AS hv
  FROM documents),
b AS (
  SELECT doc_id,
         CASE WHEN hv < {V_CHANGED_HI} THEN text || ' [v2]' ELSE text END AS text
  FROM h WHERE hv >= {V_REMOVED_HI}
  UNION ALL
  SELECT doc_id + {CLONE_ID_OFFSET}, text FROM h WHERE hv >= {V_CLONED_LO})"""


@register(
    "qv01_snapshot_diff",
    tags=("versioning", "audit"),
    oracle=f"""
WITH {_B_CTE},
j AS (
  SELECT a.doc_id AS a_key, a.text AS a_text, b.doc_id AS b_key, b.text AS b_text
  FROM documents a FULL OUTER JOIN b ON a.doc_id = b.doc_id)
SELECT CASE WHEN a_key IS NULL THEN 'added'
            WHEN b_key IS NULL THEN 'removed'
            WHEN a_text <> b_text THEN 'changed'
            ELSE 'unchanged' END AS change_type,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(COALESCE(a_key, b_key)) AS BIGINT) AS id_checksum
FROM j GROUP BY 1
""",
)
def qv01_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff audit (see module docstring): version B is derived
    from the documents table deterministically — the [0,5%) hash band
    is dropped, [5%,15%) has its text rewritten, [95%,100%) is cloned
    under shifted ids (the "new documents" of B) — and the diff
    classifies every key across the full-outer join.

    Scale shape: the only wide op is the key-shuffled full-outer join
    (content compare is a row-local expression on the joined row — NOT
    a md5-both-sides pre-aggregation, so the audit also works when
    the content expression projects a subset of columns); output is
    change-type grain."""
    d = load_table(spark, sf_dir, "documents")
    h = _key_hash(F.col("doc_id"))
    base = d.select("doc_id", "text", h.alias("hv"))
    b = (
        base.filter(F.col("hv") >= V_REMOVED_HI)
        .select(
            "doc_id",
            F.when(
                F.col("hv") < V_CHANGED_HI, F.concat("text", F.lit(" [v2]"))
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
        .unionAll(
            base.filter(F.col("hv") >= V_CLONED_LO).select(
                (F.col("doc_id") + CLONE_ID_OFFSET).alias("doc_id"), "text"
            )
        )
    )
    return snapshot_diff(d, b, "doc_id", F.col("text"))


# ---------------------------------------------------------------------------
# qv02: SCD Type-2 dimension build (history tracking)
# ---------------------------------------------------------------------------

#: Activity-tier edges over the exact daily DECIMAL value sum.
TIER_MID_EDGE = 50
TIER_HIGH_EDGE = 200


@register(
    "qv02_scd2_dimension",
    tags=("versioning", "window", "warehouse"),
    oracle=f"""
WITH daily AS (
  SELECT user_id, strftime(ts, '%Y-%m-%d') AS day,
         SUM(CAST(value AS DECIMAL(18,6))) AS vdec
  FROM events GROUP BY user_id, strftime(ts, '%Y-%m-%d')),
tiers AS (
  SELECT user_id, day,
         CASE WHEN vdec < {TIER_MID_EDGE} THEN 'low'
              WHEN vdec < {TIER_HIGH_EDGE} THEN 'mid'
              ELSE 'high' END AS tier
  FROM daily),
runs AS (
  SELECT user_id, day, tier,
         SUM(CASE WHEN prev_tier IS NULL OR prev_tier <> tier
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY day
                 ROWS UNBOUNDED PRECEDING) AS run_id
  FROM (SELECT user_id, day, tier,
               LAG(tier) OVER (PARTITION BY user_id ORDER BY day) AS prev_tier
        FROM tiers)),
versions AS (
  SELECT user_id, CAST(run_id AS BIGINT) AS version, MIN(tier) AS tier,
         MIN(day) AS valid_from, MAX(day) AS valid_to,
         CAST(COUNT(*) AS BIGINT) AS n_days
  FROM runs GROUP BY user_id, run_id)
SELECT user_id, version, tier, valid_from, valid_to, n_days,
       CAST(version = MAX(version) OVER (PARTITION BY user_id) AS BIGINT)
         AS is_current
FROM versions
""",
)
def qv02_scd2_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-Changing-Dimension Type-2 build: collapse each user's
    daily activity-tier history (low/mid/high by exact decimal daily
    spend) into versioned validity intervals — one row per unbroken
    run of the same tier with valid_from/valid_to/is_current. The
    dimension-table history a warehouse keeps so facts can join the
    attribute AS OF their event time (the qf02 point-in-time join is
    the read side of exactly this table).

    Scale shape: gaps-and-islands via LAG + running change-count.
    Two exchanges total (verified on the executed plan): events
    shuffle to (user, day) grain for the daily aggregate, then once
    to user partitions — the LAG/run-id windows, the per-run rollup
    (co-partitioned by user, so no third exchange) and the
    is_current window all run in that one user-partitioned pass with
    bounded per-user state; no self-join phrasing. Tier edges
    compare the exact DECIMAL sum so run boundaries are bit-identical
    across engines (registry float rule).
    """
    from pyspark.sql import Window as W

    e = load_table(spark, sf_dir, "events")
    daily = (
        e.groupBy("user_id", F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(F.sum(F.col("value").cast("decimal(18,6)")).alias("vdec"))
    )
    return scd2_versions(daily)


# ---------------------------------------------------------------------------
# qv03: tombstone purge audit (right-to-be-forgotten compliance)
# ---------------------------------------------------------------------------

TOMBSTONE_MOD = 37  # deterministic deletion-request stand-in


@register(
    "qv03_tombstone_purge",
    tags=("versioning", "compliance"),
    oracle=f"""
WITH tomb AS (SELECT doc_id FROM documents WHERE doc_id % {TOMBSTONE_MOD} = 0),
survivors AS (
  SELECT d.* FROM documents d
  WHERE NOT EXISTS (SELECT 1 FROM tomb t WHERE t.doc_id = d.doc_id))
SELECT s.source,
       CAST(COUNT(*) AS BIGINT) AS n_kept,
       CAST((SELECT COUNT(*) FROM documents d2 WHERE d2.source = s.source)
            - COUNT(*) AS BIGINT) AS n_purged,
       CAST(SUM(CASE WHEN s.doc_id % {TOMBSTONE_MOD} = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_leaked
FROM survivors s GROUP BY s.source
""",
)
def qv03_tombstone_purge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deletion-request (tombstone) purge with compliance audit — the
    right-to-be-forgotten pass every stored corpus re-runs before a
    training snapshot ships: anti-join the corpus against the
    tombstone list, then report per source what was kept, what was
    purged, and — the column that must be ZERO — how many tombstoned
    ids leaked through. Purge and audit ship as one lineage so the
    evidence is computed on the exact output that ships.

    Scale shape: the purge is a LEFT ANTI equi-join (broadcast when
    the tombstone list is small, shuffle+AQE otherwise — never a
    filter against a collected list, which caps at driver memory);
    the audit is one hash aggregation over the survivors. n_leaked
    recomputes membership independently of the join (a second code
    path, so a join bug can't hide its own leak).
    """
    d = load_table(spark, sf_dir, "documents")
    tomb = d.where(F.col("doc_id") % TOMBSTONE_MOD == 0).select("doc_id")
    survivors = d.join(tomb, "doc_id", "left_anti")
    totals = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_total"))
    return (
        survivors.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum(
                F.when(F.col("doc_id") % TOMBSTONE_MOD == 0, 1).otherwise(0)
            ).alias("n_leaked"),
        )
        .join(F.broadcast(totals), "source")
        .select(
            "source",
            "n_kept",
            (F.col("n_total") - F.col("n_kept")).alias("n_purged"),
            "n_leaked",
        )
    )


# ---------------------------------------------------------------------------
# q76: temporal dimension lookup (the SCD2 read side)
# ---------------------------------------------------------------------------


@register(
    "q76_scd2_lookup",
    tags=("versioning", "join", "warehouse"),
    oracle=f"""
WITH daily AS (
  SELECT user_id, strftime(ts, '%Y-%m-%d') AS day,
         SUM(CAST(value AS DECIMAL(18,6))) AS vdec
  FROM events GROUP BY user_id, strftime(ts, '%Y-%m-%d')),
tiers AS (
  SELECT user_id, day,
         CASE WHEN vdec < {TIER_MID_EDGE} THEN 'low'
              WHEN vdec < {TIER_HIGH_EDGE} THEN 'mid'
              ELSE 'high' END AS tier
  FROM daily),
runs AS (
  SELECT user_id, day, tier,
         SUM(CASE WHEN prev_tier IS NULL OR prev_tier <> tier
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY day
                 ROWS UNBOUNDED PRECEDING) AS run_id
  FROM (SELECT user_id, day, tier,
               LAG(tier) OVER (PARTITION BY user_id ORDER BY day) AS prev_tier
        FROM tiers)),
dim AS (
  SELECT user_id, MIN(tier) AS tier,
         MIN(day) AS valid_from, MAX(day) AS valid_to
  FROM runs GROUP BY user_id, run_id),
facts AS (
  SELECT event_id, user_id, strftime(ts, '%Y-%m-%d') AS day
  FROM events WHERE event_type = 'purchase')
SELECT f.event_id, f.user_id, f.day, d.tier
FROM facts f JOIN dim d
  ON f.user_id = d.user_id
 AND f.day BETWEEN d.valid_from AND d.valid_to
""",
)
def q76_scd2_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal dimension lookup — the READ side of qv02's SCD2 build:
    each purchase fact joins the user's activity-tier version that was
    valid ON its day (`day BETWEEN valid_from AND valid_to`), the
    standard warehouse pattern for attributing facts to
    point-in-time dimension state without the leakage of joining
    today's attribute onto yesterday's fact.

    Scale shape: an equi-join on the dimension's natural key (user)
    carrying the validity-range predicate as a residual filter — per
    key the dimension holds a handful of versions, so the residual
    scan is bounded and no interval machinery is needed (when version
    counts per key explode, qj01's bucketed overlap join is the
    stated escalation). Validity intervals come from qv02's exact
    decimal tiering, so every fact matches exactly one version.
    """
    e = load_table(spark, sf_dir, "events")
    dim = (
        qv02_scd2_dimension(spark, sf_dir)
        .select("user_id", "tier", "valid_from", "valid_to")
    )
    facts = e.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.date_format("ts", "yyyy-MM-dd").alias("day")
    )
    return facts.join(
        dim,
        (facts["user_id"] == dim["user_id"])
        & (F.col("day") >= F.col("valid_from"))
        & (F.col("day") <= F.col("valid_to")),
    ).select("event_id", facts["user_id"].alias("user_id"), "day", "tier")


def scd2_versions(daily: "DataFrame") -> "DataFrame":
    """The SCD2 gaps-and-islands core shared by the batch build (qv02)
    and the streaming maintainer (scd2_state_step): (user_id, day,
    vdec DECIMAL) → versioned validity intervals with is_current.
    Two windows in ONE user-partitioned pass — LAG + running
    change-count, then the per-run rollup and the is_current max ride
    the same partitioning."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    tier = (
        F.when(F.col("vdec") < TIER_MID_EDGE, "low")
        .when(F.col("vdec") < TIER_HIGH_EDGE, "mid")
        .otherwise("high")
    )
    wday = W.partitionBy("user_id").orderBy("day")
    runs = (
        daily.select("user_id", "day", tier.alias("tier"))
        .withColumn("prev_tier", F.lag("tier").over(wday))
        .withColumn(
            "run_id",
            F.sum(
                F.when(
                    F.col("prev_tier").isNull() | (F.col("prev_tier") != F.col("tier")), 1
                ).otherwise(0)
            ).over(wday.rowsBetween(W.unboundedPreceding, W.currentRow)),
        )
    )
    versions = runs.groupBy("user_id", F.col("run_id").alias("version")).agg(
        F.min("tier").alias("tier"),
        F.min("day").alias("valid_from"),
        F.max("day").alias("valid_to"),
        F.count(F.lit(1)).alias("n_days"),
    )
    wuser = W.partitionBy("user_id")
    return versions.select(
        "user_id",
        "version",
        "tier",
        "valid_from",
        "valid_to",
        "n_days",
        (F.col("version") == F.max("version").over(wuser)).cast("long").alias("is_current"),
    )


def scd2_state_step(state: "DataFrame | None", batch: "DataFrame") -> "DataFrame":
    """foreachBatch step for streaming/state_store.merge_state_sink:
    maintain the SCD2 dimension incrementally as raw events arrive.

    State is ONE tagged relation: 'd' rows carry the (user, day, vdec)
    daily grain (kept so late events folding into an EXISTING day
    re-sum exactly), 'v' rows carry the published versions table. Each
    epoch recomputes the gaps-and-islands ONLY for the users present
    in the batch — untouched users' d/v rows pass through unchanged.
    That is the 100 TB shape of dimension maintenance: per-epoch cost
    is O(affected keys' history), never a full-dimension rebuild, and
    is_current is a per-user property so partial recomputation is
    exact. Crash/replay safety comes from the store (pre-image reads
    + epoch gate), chaos-tested like the other five maintainers."""
    from pyspark.sql import functions as F

    d_delta = (
        batch.groupBy("user_id", F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(F.sum(F.col("value").cast("decimal(18,6)")).alias("vdec"))
    )
    affected = d_delta.select("user_id").distinct()
    if state is None:
        merged_daily = d_delta
        kept = None
    else:
        d_state = state.filter(F.col("rel") == "d").select(
            "user_id", "day", "vdec"
        )
        touched = d_state.join(F.broadcast(affected), "user_id", "left_semi")
        merged_daily = (
            touched.unionByName(d_delta)
            .groupBy("user_id", "day")
            .agg(F.sum("vdec").alias("vdec"))
        )
        kept = state.join(F.broadcast(affected), "user_id", "left_anti")
    new_versions = scd2_versions(merged_daily)
    fresh = merged_daily.select(
        F.lit("d").alias("rel"),
        "user_id",
        "day",
        "vdec",
        F.lit(None).cast("long").alias("version"),
        F.lit(None).cast("string").alias("tier"),
        F.lit(None).cast("string").alias("valid_from"),
        F.lit(None).cast("string").alias("valid_to"),
        F.lit(None).cast("long").alias("n_days"),
        F.lit(None).cast("long").alias("is_current"),
    ).unionByName(
        new_versions.select(
            F.lit("v").alias("rel"),
            "user_id",
            F.lit(None).cast("string").alias("day"),
            F.lit(None).cast("decimal(18,6)").alias("vdec"),
            "version",
            "tier",
            "valid_from",
            "valid_to",
            "n_days",
            "is_current",
        )
    )
    return fresh if kept is None else kept.unionByName(fresh)


# ---------------------------------------------------------------------------
# qv04: changelog snapshot — CDC upsert WITH deletes (tombstone-retaining)
# ---------------------------------------------------------------------------

#: Deterministic price bump a CDC UPDATE applies in the qv04 scenario
#: (exact DECIMAL addition — engine-portable, unlike a float factor).
CDC_UPDATE_BUMP = "100.00"


@register(
    "qv04_changelog_snapshot",
    tags=("versioning", "cdc", "streaming-twin"),
    oracle=f"""
SELECT o_orderkey,
       CASE WHEN o_orderstatus = 'O' THEN 'U' ELSE 'I' END AS op,
       CAST(CASE WHEN o_orderstatus = 'O'
                 THEN CAST(o_totalprice AS DECIMAL(18,2)) + {CDC_UPDATE_BUMP}
                 ELSE CAST(o_totalprice AS DECIMAL(18,2)) END
            AS DOUBLE) AS val
FROM orders WHERE o_orderstatus <> 'F'
""",
)
def qv04_changelog_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch kernel of ``streaming/changelog.changelog_sink`` — the
    CDC capability q52/qv02's upserts lack: DELETES. A Debezium-style
    change log is derived deterministically from orders (every order
    INSERTs at seq 1; 'O' orders are later UPDATEd to price+100.00 at
    seq 2; 'F' orders are DELETEd at seq 3), folded by the
    tombstone-retaining latest-change-per-key rule, and read through
    ``live_view``: deleted keys are gone, updated keys show the new
    value, untouched keys the original. The oracle computes the same
    end state directly from orders — correct iff latest-wins picked
    the right change per key AND tombstones actually suppress their
    keys. Tombstone retention (vs dropping deleted keys outright) is
    what makes a replayed stale insert unable to resurrect a deleted
    key across epochs — that cross-epoch contract is the streaming
    suite's to pin (tests/test_streaming_changelog.py); retention
    expiry is qv03's purge.

    Scale shape (100 TB): ONE hash shuffle of the change log on the
    key; the per-key window partitions at order_id grain (a handful
    of change rows each, never history-proportional), and the live
    filter is a scan-stage predicate on the result — no second
    shuffle, no window over an unbounded partition."""
    from event_stream_aggr_spark.streaming.changelog import (
        changelog_snapshot,
        live_view,
    )

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    inserts = o.select(
        "o_orderkey",
        F.lit(1).alias("seq"),
        F.lit("I").alias("op"),
        F.col("price").alias("val"),
    )
    updates = o.filter(F.col("o_orderstatus") == "O").select(
        "o_orderkey",
        F.lit(2).alias("seq"),
        F.lit("U").alias("op"),
        (F.col("price") + F.lit(CDC_UPDATE_BUMP).cast("decimal(18,2)"))
        .cast("decimal(18,2)")
        .alias("val"),
    )
    deletes = o.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey",
        F.lit(3).alias("seq"),
        F.lit("D").alias("op"),
        F.col("price").alias("val"),
    )
    changes = inserts.unionByName(updates).unionByName(deletes)
    snap = changelog_snapshot(changes, ["o_orderkey"], ["seq"])
    return live_view(snap).select(
        "o_orderkey", "op", F.col("val").cast("double").alias("val")
    )


# ---------------------------------------------------------------------------
# qv05: bitemporal as-of query (transaction time x valid time)
# ---------------------------------------------------------------------------

#: qv05's two as-of coordinates, inside the orders date domain
#: (1995..2001): "what did the system BELIEVE on TX_ASOF about orders
#: VALID on V_ASOF". Corrections are recorded 30 days after the
#: initial row, validity runs 90 days from the order date, and the
#: md5 band marks which orders ever receive a correction.
BTX_TX_ASOF = "1998-06-15 00:00:00"
BTX_V_ASOF = "1998-06-01 00:00:00"
BTX_CORRECTION_LAG_DAYS = 30
BTX_VALID_DAYS = 90
BTX_BAND_MOD = 3  # keys with md5 % 3 == 0 get a correction
BTX_CORRECTION = "100.00"  # exact-DECIMAL price restatement


def bitemporal_snapshot(
    spark: SparkSession, sf_dir: str, tx_asof: str, v_asof_ts: str
) -> DataFrame:
    """The qv05 kernel with free as-of coordinates: reconstruct what
    the system believed at transaction time ``tx_asof`` about orders
    valid at ``v_asof_ts``. See qv05's docstring for semantics and
    scale shape; tests probe OTHER (tx, v) coordinates than the
    registered pair to pin the bitemporal distinction itself (a
    correction booked after TX must be invisible even though its
    validity covers V)."""
    from pyspark.sql import Window as W

    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        "o_orderkey",
        "o_orderpriority",
        F.col("o_totalprice").cast("decimal(18,2)").alias("price0"),
        "o_orderdate",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("btx:"),
                            F.col("o_orderkey").cast("string"),
                        )
                    ),
                    1,
                    2,
                ),
                16,
                10,
            ).cast("long")
            % BTX_BAND_MOD
            == 0
        ).alias("corrected"),
    )
    # All temporal columns are genuinely timestamp_ntz: the DATE scan
    # column is cast to NTZ BEFORE the interval arithmetic, so the
    # tx/valid_from/valid_to comparisons below involve no session-
    # timezone (LTZ) coercion at all — NTZ end-to-end by construction,
    # not by the UTC session pin.
    ntz_date = F.col("o_orderdate").cast("timestamp_ntz")
    valid_to = F.expr(
        f"timestampadd(DAY, {BTX_VALID_DAYS},"
        " CAST(o_orderdate AS timestamp_ntz))"
    )
    v1 = base.select(
        "o_orderkey",
        "o_orderpriority",
        F.col("price0").alias("price"),
        ntz_date.alias("tx"),
        ntz_date.alias("valid_from"),
        valid_to.alias("valid_to"),
        F.lit(0).alias("is_correction"),
    )
    v2 = base.filter("corrected").select(
        "o_orderkey",
        "o_orderpriority",
        (
            F.col("price0")
            + F.lit(BTX_CORRECTION).cast("decimal(18,2)")
        ).alias("price"),
        F.expr(
            f"timestampadd(DAY, {BTX_CORRECTION_LAG_DAYS},"
            " CAST(o_orderdate AS timestamp_ntz))"
        ).alias("tx"),
        ntz_date.alias("valid_from"),
        valid_to.alias("valid_to"),
        F.lit(1).alias("is_correction"),
    )
    versions = v1.select(*v1.columns).unionByName(
        v2.select(*v1.columns)
    )
    believed = versions.filter(
        F.col("tx") <= F.lit(tx_asof).cast("timestamp_ntz")
    ).withColumn(
        "rn",
        F.row_number().over(
            W.partitionBy("o_orderkey").orderBy(
                F.col("tx").desc(), F.col("is_correction").desc()
            )
        ),
    )
    v_asof = F.lit(v_asof_ts).cast("timestamp_ntz")
    snapshot = believed.filter(
        (F.col("rn") == 1)
        & (F.col("valid_from") <= v_asof)
        & (v_asof < F.col("valid_to"))
    )
    return snapshot.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("is_correction").cast("long").alias("n_corrected"),
        F.sum("price").cast("double").alias("believed_total"),
    )



def _register_bitemporal_query():
    @register(
        "qv05_bitemporal_asof",
        tags=("versioning", "window", "temporal"),
        oracle=f"""
WITH base AS (
  SELECT o_orderkey, o_orderpriority,
         CAST(o_totalprice AS DECIMAL(18,2)) AS price0,
         o_orderdate,
         (('0x' || substr(md5('btx:' || CAST(o_orderkey AS VARCHAR)), 1, 2))
            ::BIGINT % {BTX_BAND_MOD} = 0) AS corrected
  FROM orders),
versions AS (
  SELECT o_orderkey, o_orderpriority, price0 AS price,
         o_orderdate AS tx,
         o_orderdate AS valid_from,
         o_orderdate + INTERVAL {BTX_VALID_DAYS} DAY AS valid_to,
         0 AS is_correction
  FROM base
  UNION ALL
  SELECT o_orderkey, o_orderpriority, price0 + {BTX_CORRECTION},
         o_orderdate + INTERVAL {BTX_CORRECTION_LAG_DAYS} DAY,
         o_orderdate,
         o_orderdate + INTERVAL {BTX_VALID_DAYS} DAY,
         1
  FROM base WHERE corrected),
believed AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey
                               ORDER BY tx DESC, is_correction DESC) AS rn
  FROM versions
  WHERE tx <= TIMESTAMP '{BTX_TX_ASOF}'),
snapshot AS (
  SELECT * FROM believed
  WHERE rn = 1
    AND valid_from <= TIMESTAMP '{BTX_V_ASOF}'
    AND TIMESTAMP '{BTX_V_ASOF}' < valid_to)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(is_correction) AS BIGINT) AS n_corrected,
       CAST(SUM(price) AS DOUBLE) AS believed_total
FROM snapshot GROUP BY o_orderpriority
""",
    )
    def qv05_bitemporal_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Bitemporal as-of query (Snodgrass; the SQL:2011 system-time +
        application-time pairing, and the audit question qv02's single-
        axis SCD2 cannot answer): reconstruct what the system BELIEVED
        at transaction time TX about rows VALID at time V. The
        bitemporal corpus derives deterministically from orders —
        every order books an initial row at its order date (valid 90
        days), an md5-band subset is RESTATED (+100.00 exact DECIMAL)
        30 days later with unchanged validity. The as-of semantics:
        keep versions recorded on or before TX, take the latest
        transaction per key (corrections supersede), then filter to
        rows whose validity interval covers V — so a correction booked
        after TX is invisible even though its VALIDITY covers V, which
        is precisely the bitemporal distinction. Rolled up per order
        priority with the restatement count and the believed total.

        Scale shape (100 TB): version derivation is a per-row
        projection + a band-filtered union (one scan, no join); the
        latest-transaction rule is ONE window partitioned by key
        (never global) over at most 2 rows per key; filters sit under
        the window so transaction-time pruning (tx <= TX, the
        physical analogue of a system-time partition) reaches the
        scan; the rollup is map-side combinable with an exact DECIMAL
        total. Both engines run NTZ timestamp arithmetic
        (timestampadd on the normalized scan — timezone-hostile
        safe)."""
        return bitemporal_snapshot(
            spark, sf_dir, BTX_TX_ASOF, BTX_V_ASOF
        )

    return qv05_bitemporal_asof


_register_bitemporal_query()
