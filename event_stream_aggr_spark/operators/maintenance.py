"""Table-maintenance operators (SURVEY.md §2.1 S7 extension): the
layout work a 100 TB lakehouse runs continuously so the *query* side
stays fast — small-file compaction and partition/sort layout.

Why these live in the engine: at 1000-executor scale the dominant read
costs are (a) file-open overhead from millions of tiny files produced
by streaming ingest, and (b) scanning partitions/row-groups the query
provably doesn't need. Compaction fixes (a); hive-style partitioning +
sort-within-partitions (min/max row-group pruning) fixes (b). Neither
changes query results, so they are covered by round-trip equality
tests (tests/test_maintenance.py) rather than oracle rows.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession

#: Default compaction target — the classic 128 MiB HDFS-block-shaped file.
TARGET_FILE_BYTES = 128 * 1024 * 1024


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def compact_parquet(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    target_file_bytes: int = TARGET_FILE_BYTES,
) -> int:
    """Rewrite a parquet directory into ~``target_file_bytes`` files.

    Returns the output file count. Sizing reads only filesystem
    metadata (no data pass); the rewrite itself is one narrow
    ``coalesce`` job — no shuffle — because compaction must be cheaper
    than the scans it saves. ``coalesce`` (not ``repartition``) is
    deliberate: merging small files needs no redistribution, and a
    shuffle of the whole table would defeat the purpose at 100 TB.
    """
    n_files = max(1, math.ceil(_dir_bytes(in_path) / target_file_bytes))
    df = spark.read.parquet(in_path)
    df.coalesce(n_files).write.mode("overwrite").parquet(out_path)
    return len(
        [
            f
            for f in os.listdir(out_path)
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        ]
    )


def write_pruned_layout(
    df: DataFrame,
    out_path: str,
    partition_cols: list[str],
    sort_cols: list[str],
) -> None:
    """Write ``df`` hive-partitioned by ``partition_cols`` with rows
    sorted by ``sort_cols`` inside each file.

    Partition columns give directory-level pruning (Catalyst's
    PartitionFilters skip whole directories before listing files);
    the within-file sort clusters values so parquet row-group min/max
    statistics prune I/O for range predicates on ``sort_cols``. The
    sort is ``sortWithinPartitions`` — per-task, no global shuffle.
    """
    (
        df.repartition(*[df[c] for c in partition_cols])
        .sortWithinPartitions(*sort_cols)
        .write.mode("overwrite")
        .partitionBy(*partition_cols)
        .parquet(out_path)
    )


# ---------------------------------------------------------------------------
# Z-order layout: multi-dimensional clustering for data skipping
# ---------------------------------------------------------------------------

ZORDER_BITS = 8  # bits per dimension → 16-bit z-values


def zorder_key(x, y, bits: int = ZORDER_BITS):
    """Bit-interleaved Morton key of two bucketized int columns: bit i
    of y lands at position 2i, bit i of x at 2i+1. Exact integer
    arithmetic — engine-portable by construction."""
    from pyspark.sql import functions as F

    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftrightunsigned(y, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(
                F.shiftrightunsigned(x, i).bitwiseAND(F.lit(1)), 2 * i + 1
            )
        )
    return z


def zorder_layout(df: DataFrame, x_col: str, y_col: str, n_files: int) -> DataFrame:
    """Cluster a table by the Morton curve over two columns so each
    output file's (x, y) bounding box is tight in BOTH dimensions —
    the OPTIMIZE ZORDER pattern: min/max row-group stats then prune
    2-D predicates, where a single-column sort only prunes one.

    One range exchange (sampled split points over the z-key), sort
    within partitions, no global sort."""
    from pyspark.sql import functions as F

    mx = F.pmod(F.col(x_col), 1 << ZORDER_BITS)
    my = F.pmod(F.col(y_col), 1 << ZORDER_BITS)
    keyed = df.withColumn("_z", zorder_key(mx, my))
    return (
        keyed.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
    )


_Z_EXPR = (
    "(((y >> 0) & 1) << 0) + (((x >> 0) & 1) << 1) + (((y >> 1) & 1) << 2)"
    " + (((x >> 1) & 1) << 3) + (((y >> 2) & 1) << 4) + (((x >> 2) & 1) << 5)"
    " + (((y >> 3) & 1) << 6) + (((x >> 3) & 1) << 7) + (((y >> 4) & 1) << 8)"
    " + (((x >> 4) & 1) << 9) + (((y >> 5) & 1) << 10) + (((x >> 5) & 1) << 11)"
    " + (((y >> 6) & 1) << 12) + (((x >> 6) & 1) << 13)"
    " + (((y >> 7) & 1) << 14) + (((x >> 7) & 1) << 15)"
)


def _register_zorder_query():
    from pyspark.sql import functions as F

    from event_stream_aggr_spark.plans.registry import register
    from event_stream_aggr_spark.tables import load_table

    @register(
        "qz01_zorder_locality",
        tags=("maintenance", "layout"),
        oracle=f"""
WITH m AS (
  SELECT l_partkey % 256 AS x, l_suppkey % 256 AS y FROM lineitem),
z AS (
  SELECT x, y, CAST({_Z_EXPR} AS BIGINT) AS zv FROM m)
SELECT zv >> 10 AS z_tile, COUNT(*) AS n_rows,
       CAST(MIN(x) AS BIGINT) AS x_min, CAST(MAX(x) AS BIGINT) AS x_max,
       CAST(MIN(y) AS BIGINT) AS y_min, CAST(MAX(y) AS BIGINT) AS y_max
FROM z GROUP BY zv >> 10
""",
    )
    def qz01_zorder_locality(spark, sf_dir):
        """Z-order (Morton-curve) locality audit: bucketize
        (l_partkey, l_suppkey) to 8 bits each, interleave into a
        16-bit z-value, and profile each 1024-cell z-tile. Because a
        tile fixes the high 3 bits of BOTH dimensions, every tile's
        bounding box is at most 32×32 — the property that makes
        OPTIMIZE ZORDER layouts prune 2-D predicates from min/max
        row-group stats where a single-column sort prunes only one.
        ``zorder_layout`` applies the same key as a physical layout
        (range-partition + sort-within-partitions);
        tests/test_maintenance.py checks the file-level effect.

        Exact integer bit arithmetic end-to-end — the oracle runs the
        identical interleave expression."""
        li = load_table(spark, sf_dir, "lineitem")
        m = li.select(
            F.pmod(F.col("l_partkey"), 256).alias("x"),
            F.pmod(F.col("l_suppkey"), 256).alias("y"),
        )
        z = m.select("x", "y", zorder_key(F.col("x"), F.col("y")).alias("zv"))
        return (
            z.groupBy(F.shiftrightunsigned("zv", 10).alias("z_tile"))
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.min("x").alias("x_min"),
                F.max("x").alias("x_max"),
                F.min("y").alias("y_min"),
                F.max("y").alias("y_max"),
            )
        )

    return qz01_zorder_locality


_register_zorder_query()


#: qz02 target "file" size in chars — sized so the synthetic corpus
#: yields several bins per source at test SFs.
COMPACTION_TARGET_CHARS = 1000


def _register_compaction_plan_query():
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from event_stream_aggr_spark.plans.registry import register
    from event_stream_aggr_spark.tables import load_table

    @register(
        "qz02_compaction_plan",
        tags=("maintenance", "layout"),
        oracle=f"""
WITH placed AS (
  SELECT source, doc_id, n_chars,
         COALESCE(SUM(n_chars) OVER (PARTITION BY source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS offset_chars
  FROM documents),
binned AS (
  SELECT source, doc_id, n_chars,
         offset_chars // {COMPACTION_TARGET_CHARS} AS bin_id
  FROM placed)
SELECT source, CAST(bin_id AS BIGINT) AS bin_id,
       CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(SUM(n_chars) AS BIGINT) AS bin_chars,
       CAST(MIN(doc_id) AS BIGINT) AS first_file,
       CAST(MAX(doc_id) AS BIGINT) AS last_file
FROM binned GROUP BY source, bin_id
""",
    )
    def qz02_compaction_plan(spark, sf_dir):
        """Small-file compaction PLANNER (the metadata half of
        ``compact_parquet``): given a file listing — modeled here as
        (source, doc_id, n_chars), i.e. one "file" per document with
        its byte size — assign files to target-sized compaction bins
        with the deterministic greedy-by-offset rule (running size
        before me, integer-divided by the target; qp01's packing
        recipe at file grain) and emit the per-bin manifest a
        compaction executor would consume: file count, total bytes,
        and the contiguous id range.

        Scale rationale: a 100 TB lakehouse plans compaction from the
        FILE LISTING (millions of rows of metadata), never by reading
        data — this whole query is metadata-grain. The running-offset
        window partitions by table partition (``source``), so no
        single global ordering serializes planning; bins are
        contiguous id ranges by construction, which keeps the rewrite
        jobs' reads sequential. Exact integer arithmetic end-to-end."""
        d = load_table(spark, sf_dir, "documents")
        w = (
            W.partitionBy("source")
            .orderBy("doc_id")
            .rowsBetween(W.unboundedPreceding, -1)
        )
        placed = d.select(
            "source",
            "doc_id",
            "n_chars",
            F.coalesce(F.sum("n_chars").over(w), F.lit(0)).alias("offset_chars"),
        )
        binned = placed.withColumn(
            "bin_id",
            F.expr(f"offset_chars div {COMPACTION_TARGET_CHARS}").cast("long"),
        )
        return binned.groupBy("source", "bin_id").agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("n_chars").cast("long").alias("bin_chars"),
            F.min("doc_id").alias("first_file"),
            F.max("doc_id").alias("last_file"),
        )

    return qz02_compaction_plan


_register_compaction_plan_query()


def _register_constraint_audit_query():
    from pyspark.sql import functions as F

    from event_stream_aggr_spark.plans.registry import register
    from event_stream_aggr_spark.tables import load_table

    @register(
        "qa01_constraint_audit",
        tags=("maintenance", "quality"),
        oracle="""
SELECT 'orders_custkey_not_null' AS check_name,
       CAST(COUNT(*) AS BIGINT) AS n_checked,
       CAST(COUNT(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT) AS n_violations
FROM orders
UNION ALL
SELECT 'orders_custkey_fk', CAST(COUNT(*) AS BIGINT),
       CAST(COUNT(*) FILTER (WHERE c.c_custkey IS NULL) AS BIGINT)
FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
UNION ALL
SELECT 'orders_orderkey_unique',
       CAST(COUNT(*) AS BIGINT),
       CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT)
FROM orders
UNION ALL
SELECT 'lineitem_price_positive', CAST(COUNT(*) AS BIGINT),
       CAST(COUNT(*) FILTER (WHERE l_extendedprice <= 0) AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'lineitem_discount_unit_range', CAST(COUNT(*) AS BIGINT),
       CAST(COUNT(*) FILTER (WHERE l_discount < 0 OR l_discount > 1) AS BIGINT)
FROM lineitem
""",
    )
    def qa01_constraint_audit(spark, sf_dir):
        """Data-contract constraint audit (the Deequ/dbt-test shape —
        the validation pass a lakehouse runs on every ingest before
        publishing a snapshot): per named check, rows checked and rows
        violating. Checks cover the contract families: NOT NULL,
        referential integrity (FK orphans via LEFT-join null probe),
        primary-key uniqueness (count − count distinct), value range, and
        unit-interval bounds.

        Scale shape: every check is a single-pass conditional
        aggregate over its table's scan (map-side combinable, exact
        integers); the FK probe is the one join — key-shuffled or
        broadcast by dimension size, and at 100 TB the audit reads
        each fact table ONCE per registered check family, never
        row-materializing violations (a violation SAMPLE is a
        follow-up filter query, deliberately not this rollup)."""
        o = load_table(spark, sf_dir, "orders")
        c = load_table(spark, sf_dir, "customer")
        li = load_table(spark, sf_dir, "lineitem")

        def check(name, df, cond_violation):
            return df.agg(
                F.count(F.lit(1)).alias("n_checked"),
                F.sum(F.when(cond_violation, 1).otherwise(0))
                .cast("long")
                .alias("n_violations"),
            ).select(
                F.lit(name).alias("check_name"), "n_checked", "n_violations"
            )

        fk = o.join(
            c.select(F.col("c_custkey").alias("ck")),
            o["o_custkey"] == F.col("ck"),
            "left",
        )
        pk = o.agg(
            F.count(F.lit(1)).alias("n_checked"),
            (F.count(F.lit(1)) - F.countDistinct("o_orderkey"))
            .cast("long")
            .alias("n_violations"),
        ).select(
            F.lit("orders_orderkey_unique").alias("check_name"),
            "n_checked",
            "n_violations",
        )
        return (
            check("orders_custkey_not_null", o, F.col("o_custkey").isNull())
            .unionAll(check("orders_custkey_fk", fk, F.col("ck").isNull()))
            .unionAll(pk)
            .unionAll(
                check(
                    "lineitem_price_positive", li, F.col("l_extendedprice") <= 0
                )
            )
            .unionAll(
                check(
                    "lineitem_discount_unit_range",
                    li,
                    (F.col("l_discount") < 0) | (F.col("l_discount") > 1),
                )
            )
        )

    return qa01_constraint_audit


_register_constraint_audit_query()


# ---------------------------------------------------------------------------
# qz03: zone-map (min/max) data-skipping audit
# ---------------------------------------------------------------------------

PRUNE_PREDICATE_MIN_VALUE = 350.0  # the audited predicate: value > 350


def _register_pruning_stats_query():
    from pyspark.sql import functions as F

    from event_stream_aggr_spark.plans.registry import register
    from event_stream_aggr_spark.tables import load_table

    @register(
        "qz03_pruning_stats",
        tags=("maintenance", "scale"),
        oracle=f"""
WITH zones AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         MIN(value) AS vmin, MAX(value) AS vmax
  FROM events GROUP BY strftime(ts, '%Y-%m-%d')),
tot AS (
  SELECT CAST(SUM(n_rows) AS BIGINT) AS total_rows,
         CAST(SUM(CASE WHEN vmax > {PRUNE_PREDICATE_MIN_VALUE}
                       THEN n_rows ELSE 0 END) AS BIGINT) AS scanned_rows
  FROM zones)
SELECT z.day, z.n_rows, z.vmin, z.vmax,
       CAST(z.vmax > {PRUNE_PREDICATE_MIN_VALUE} AS BIGINT) AS scanned,
       ROUND(CAST(t.scanned_rows AS DOUBLE) / t.total_rows, 6) AS scan_fraction
FROM zones z CROSS JOIN tot t
""",
    )
    def qz03_pruning_stats(spark, sf_dir):
        """Zone-map data-skipping audit: per day-partition min/max
        statistics over ``value`` (exactly what parquet row-group
        footers / Delta-Iceberg file stats store) and, for the audited
        predicate ``value > 350``, which zones a stats-aware scan
        would skip entirely plus the global fraction of rows it must
        still read.

        This is the maintenance-side complement of qz01's z-order
        locality measure: qz01 *creates* layouts with tight zones,
        this query *measures* how effective the current layout's
        zones are for a predicate — the feedback a 100 TB lakehouse
        uses to decide whether a re-layout (qz01) or compaction
        (qz02) pays for itself.

        Scale shape (100 TB): ONE map-side-combinable hash aggregation
        from corpus rows down to |zones| rows (one per day-partition —
        bounded by the calendar, not the data), then the totals fold
        as a 1-row broadcast crossJoin back onto the zone relation;
        no sort, no fact-side join. min/max of raw doubles are exact
        in both engines (no accumulation), so zone bounds hash-match
        bit-for-bit.
        """
        e = load_table(spark, sf_dir, "events")
        zones = (
            e.select(F.date_format("ts", "yyyy-MM-dd").alias("day"), "value")
            .groupBy("day")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.min("value").alias("vmin"),
                F.max("value").alias("vmax"),
            )
        )
        scanned = F.col("vmax") > PRUNE_PREDICATE_MIN_VALUE
        tot = zones.agg(
            F.sum("n_rows").alias("total_rows"),
            F.sum(F.when(scanned, F.col("n_rows")).otherwise(0)).alias("scanned_rows"),
        )
        return zones.crossJoin(F.broadcast(tot)).select(
            "day",
            "n_rows",
            "vmin",
            "vmax",
            scanned.cast("long").alias("scanned"),
            F.round(
                F.col("scanned_rows").cast("double") / F.col("total_rows"), 6
            ).alias("scan_fraction"),
        )

    return qz03_pruning_stats


_register_pruning_stats_query()


# ---------------------------------------------------------------------------
# qa02: rollup anomaly detection (z-score monitor over daily volumes)
# ---------------------------------------------------------------------------

ANOMALY_Z_EDGE = 2.0


def _register_rollup_anomaly_query():
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from event_stream_aggr_spark.plans.registry import register
    from event_stream_aggr_spark.tables import load_table

    @register(
        "qa02_rollup_anomaly",
        tags=("monitoring", "aggregation"),
        oracle=f"""
WITH daily AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY event_type, strftime(ts, '%Y-%m-%d')),
stats AS (
  SELECT event_type, day, n,
         CAST(SUM(n) OVER (PARTITION BY event_type) AS BIGINT) AS sx,
         CAST(SUM(n * n) OVER (PARTITION BY event_type) AS BIGINT) AS sxx,
         CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS nd
  FROM daily)
SELECT event_type, day, n,
       ROUND((n - CAST(sx AS DOUBLE) / nd)
             / sqrt(CAST(sxx AS DOUBLE) / nd
                    - (CAST(sx AS DOUBLE) / nd) * (CAST(sx AS DOUBLE) / nd)),
             4) AS z,
       CAST(abs((n - CAST(sx AS DOUBLE) / nd)
                / sqrt(CAST(sxx AS DOUBLE) / nd
                       - (CAST(sx AS DOUBLE) / nd) * (CAST(sx AS DOUBLE) / nd)))
            > {ANOMALY_Z_EDGE} AS BIGINT) AS is_anomaly
FROM stats
""",
    )
    def qa02_rollup_anomaly(spark, sf_dir):
        """Volume anomaly monitor over the ingest rollup: per event
        type, z-score each day's event count against that type's own
        daily distribution and flag |z| > 2 — the alert the reference's
        interval-stats loop (app.go:75-110) exists to feed, promoted to
        a per-partition data-quality gate (a day whose volume spikes or
        craters is quarantined before it poisons training mixes).

        Determinism: Σx and Σx² are exact BIGINTs over integer daily
        counts, so mean/variance come from identical integer inputs
        through the IDENTICAL double expression in both engines —
        bit-equal z before the 4-dp round. Scale shape: one hash
        aggregation to (type, day) grain, then per-type windows over
        |days| rows; nothing else shuffles.
        """
        e = load_table(spark, sf_dir, "events")
        daily = (
            e.groupBy("event_type", F.date_format("ts", "yyyy-MM-dd").alias("day"))
            .agg(F.count(F.lit(1)).alias("n"))
        )
        wt = W.partitionBy("event_type")
        sx = F.sum("n").over(wt).cast("double")
        sxx = F.sum(F.col("n") * F.col("n")).over(wt).cast("double")
        nd = F.count(F.lit(1)).over(wt)
        mean = sx / nd
        z = (F.col("n") - mean) / F.sqrt(sxx / nd - mean * mean)
        return daily.select(
            "event_type",
            "day",
            "n",
            F.round(z, 4).alias("z"),
            (F.abs(z) > ANOMALY_Z_EDGE).cast("long").alias("is_anomaly"),
        )

    return qa02_rollup_anomaly


_register_rollup_anomaly_query()


# ---------------------------------------------------------------------------
# qa03: column-profile drift (schema-level monitor between snapshots)
# ---------------------------------------------------------------------------

PROFILE_CUT_DAY = "2024-01-15"
PROFILE_COLS = ("user_id", "event_type", "value", "props")
DISTINCT_DRIFT_PCT = 20  # flag if distinct-count ratio moves > 20%


def _register_profile_drift_query():
    from pyspark.sql import functions as F

    from event_stream_aggr_spark.plans.registry import register
    from event_stream_aggr_spark.tables import load_table

    col_selects = "\nUNION ALL\n".join(
        f"""SELECT '{c}' AS col_name, is_ref,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct
FROM ev GROUP BY is_ref"""
        for c in PROFILE_COLS
    )

    @register(
        "qa03_profile_drift",
        tags=("monitoring", "audit"),
        oracle=f"""
WITH ev AS (
  SELECT user_id, event_type, value, props,
         strftime(ts, '%Y-%m-%d') <= '{PROFILE_CUT_DAY}' AS is_ref
  FROM events),
profiles AS ({col_selects}),
ab AS (
  SELECT col_name,
         MIN(CASE WHEN is_ref THEN n_rows END) AS rows_a,
         MIN(CASE WHEN NOT is_ref THEN n_rows END) AS rows_b,
         MIN(CASE WHEN is_ref THEN n_nulls END) AS nulls_a,
         MIN(CASE WHEN NOT is_ref THEN n_nulls END) AS nulls_b,
         MIN(CASE WHEN is_ref THEN n_distinct END) AS distinct_a,
         MIN(CASE WHEN NOT is_ref THEN n_distinct END) AS distinct_b
  FROM profiles GROUP BY col_name)
SELECT col_name,
       CAST(rows_a AS BIGINT) AS rows_a, CAST(rows_b AS BIGINT) AS rows_b,
       CAST(nulls_a AS BIGINT) AS nulls_a, CAST(nulls_b AS BIGINT) AS nulls_b,
       CAST(distinct_a AS BIGINT) AS distinct_a,
       CAST(distinct_b AS BIGINT) AS distinct_b,
       CAST(ABS(distinct_b * rows_a - distinct_a * rows_b) * 100
            > {DISTINCT_DRIFT_PCT} * distinct_a * rows_b AS BIGINT)
         AS distinct_drifted
FROM ab
""",
    )
    def qa03_profile_drift(spark, sf_dir):
        """Column-profile drift between the reference period and the
        current one — the SCHEMA-level monitor beside qf05's
        value-distribution PSI: per column, row/null/distinct counts
        on both sides and a flag when the row-normalized distinct
        cardinality moved more than 20% (an id column collapsing to
        few values, or an enum exploding, is how upstream breakage
        usually looks before values drift).

        Determinism: the drift test is exact integer
        cross-multiplication (|d_b·r_a − d_a·r_b|·100 > 20·d_a·r_b) —
        no float division crosses the engine boundary. Scale shape:
        one aggregation per profiled column over the pre-split scan
        (column-pruned; COUNT(DISTINCT) per column is the exact form —
        the qi02 HLL sketch is the stated swap once a column's
        cardinality itself is at scale), then a 2·|cols|-row pivot.
        """
        e = load_table(spark, sf_dir, "events")
        ev = e.select(
            *PROFILE_COLS,
            (F.date_format("ts", "yyyy-MM-dd") <= PROFILE_CUT_DAY).alias("is_ref"),
        )
        profiles = None
        for c in PROFILE_COLS:
            p = ev.groupBy("is_ref").agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias("n_nulls"),
                F.countDistinct(c).alias("n_distinct"),
            ).select(F.lit(c).alias("col_name"), "is_ref", "n_rows", "n_nulls", "n_distinct")
            profiles = p if profiles is None else profiles.unionAll(p)
        ab = profiles.groupBy("col_name").agg(
            F.min(F.when(F.col("is_ref"), F.col("n_rows"))).alias("rows_a"),
            F.min(F.when(~F.col("is_ref"), F.col("n_rows"))).alias("rows_b"),
            F.min(F.when(F.col("is_ref"), F.col("n_nulls"))).alias("nulls_a"),
            F.min(F.when(~F.col("is_ref"), F.col("n_nulls"))).alias("nulls_b"),
            F.min(F.when(F.col("is_ref"), F.col("n_distinct"))).alias("distinct_a"),
            F.min(F.when(~F.col("is_ref"), F.col("n_distinct"))).alias("distinct_b"),
        )
        drift = (
            F.abs(
                F.col("distinct_b") * F.col("rows_a")
                - F.col("distinct_a") * F.col("rows_b")
            )
            * 100
            > DISTINCT_DRIFT_PCT * F.col("distinct_a") * F.col("rows_b")
        )
        return ab.select(
            "col_name",
            "rows_a",
            "rows_b",
            "nulls_a",
            "nulls_b",
            "distinct_a",
            "distinct_b",
            drift.cast("long").alias("distinct_drifted"),
        )

    return qa03_profile_drift


_register_profile_drift_query()


# ---------------------------------------------------------------------------
# qa04: exact equi-depth histogram without a global sort
# ---------------------------------------------------------------------------

HIST_BUCKET_WIDTH = 100  # micro-bucket width in price units
HIST_BINS = 10


def _register_equidepth_histogram_query():
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from event_stream_aggr_spark.plans.registry import register
    from event_stream_aggr_spark.tables import load_table

    @register(
        "qa04_equidepth_histogram",
        bench=True,
        tags=("monitoring", "profile"),
        oracle=f"""
WITH mb AS (
  SELECT CAST(FLOOR(l_extendedprice) AS BIGINT) // {HIST_BUCKET_WIDTH} AS bucket,
         CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS s
  FROM lineitem GROUP BY 1),
cum AS (
  SELECT bucket, n, s,
         SUM(n) OVER (ORDER BY bucket
                      ROWS UNBOUNDED PRECEDING) AS cum_n,
         SUM(n) OVER () AS total_n
  FROM mb)
SELECT CAST(((cum_n - n) * {HIST_BINS}) // total_n AS BIGINT) AS bin,
       CAST(SUM(n) AS BIGINT) AS n_rows,
       CAST(MIN(bucket) * {HIST_BUCKET_WIDTH} AS BIGINT) AS lo_bound,
       CAST((MAX(bucket) + 1) * {HIST_BUCKET_WIDTH} AS BIGINT) AS hi_bound,
       CAST(SUM(s) AS DOUBLE) AS sum_price
FROM cum GROUP BY 1
""",
    )
    def qa04_equidepth_histogram(spark, sf_dir):
        """Exact equi-depth (decile) histogram of l_extendedprice —
        the data-profiling / bin-edge computation behind range
        partitioning choices, drift monitors (qf05 needs bins), and
        BI distribution charts — computed WITHOUT a global sort.

        Scale shape (100 TB): ntile()/nearest-rank over the fact table
        would be one giant single-ordering sort-exchange. Instead the
        fact table collapses in ONE map-side-combinable aggregation to
        fixed-width micro-buckets (floor(price) div 100 — ~1k rows at
        any corpus size since the domain, not the row count, bounds
        it), and the equi-depth assignment happens on that tiny
        relation: running count → bin = ((cum−n)·10) div total, i.e.
        the bin of the bucket's FIRST element, so bins are contiguous
        bucket ranges with near-N/10 populations. Bin edges are
        bucket-granular (the documented precision/scan tradeoff; width
        prices the error). All arithmetic is integer or DECIMAL —
        bit-exact cross-engine; the only doubles are derived output.
        """
        # round 16: opt OUT of scan parallelization — the whole query is
        # one map-side-combinable micro-bucket aggregate; the added
        # exchange cost more than the freed cores returned (paired A/B
        # 0.58x with it on)
        li = load_table(spark, sf_dir, "lineitem", parallelize=False)
        mb = (
            li.select(
                F.expr(
                    "cast(floor(l_extendedprice) as bigint)"
                    f" div {HIST_BUCKET_WIDTH}"
                ).alias("bucket"),
                F.col("l_extendedprice").cast("decimal(18,2)").alias("p"),
            )
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("p").alias("s"))
        )
        w_cum = W.orderBy("bucket").rowsBetween(W.unboundedPreceding, 0)
        w_all = W.partitionBy()
        cum = mb.select(
            "bucket",
            "n",
            "s",
            F.sum("n").over(w_cum).alias("cum_n"),
            F.sum("n").over(w_all).alias("total_n"),
        )
        return (
            cum.select(
                F.expr(f"((cum_n - n) * {HIST_BINS}) div total_n").alias("bin"),
                "bucket",
                "n",
                "s",
            )
            .groupBy("bin")
            .agg(
                F.sum("n").alias("n_rows"),
                (F.min("bucket") * HIST_BUCKET_WIDTH)
                .cast("long")
                .alias("lo_bound"),
                ((F.max("bucket") + 1) * HIST_BUCKET_WIDTH)
                .cast("long")
                .alias("hi_bound"),
                F.sum("s").cast("double").alias("sum_price"),
            )
        )

    return qa04_equidepth_histogram


_register_equidepth_histogram_query()


# ---------------------------------------------------------------------------
# qz04: join-key skew planner (salt-factor recommendation)
# ---------------------------------------------------------------------------

SKEW_FLAG_X = 2  # a key is skewed when its count exceeds 2x the mean


def _register_skew_planner_query():
    from pyspark.sql import functions as F

    from event_stream_aggr_spark.plans.registry import register
    from event_stream_aggr_spark.tables import load_table

    @register(
        "qz04_skew_planner",
        tags=("maintenance", "skew", "planner"),
        oracle=f"""
WITH counts AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_rows
  FROM documents GROUP BY source),
tot AS (
  SELECT CAST(SUM(n_rows) AS BIGINT) AS total,
         CAST(COUNT(*) AS BIGINT) AS n_keys
  FROM counts)
SELECT source, n_rows,
       CAST(n_rows * 10000 // total AS BIGINT) AS share_bp,
       CAST(n_rows * n_keys > {SKEW_FLAG_X} * total AS BIGINT) AS skewed,
       CAST(CASE WHEN n_rows * n_keys > {SKEW_FLAG_X} * total
                 THEN (n_rows * n_keys + total - 1) // total
                 ELSE 1 END AS BIGINT) AS salt_factor
FROM counts, tot
""",
    )
    def qz04_skew_planner(spark, sf_dir):
        """Join-key skew planner: per key, the row count, its share in
        basis points, a skew flag (count > {SKEW_FLAG_X}× the mean),
        and the recommended SALT FACTOR = ceil(count / mean) — the
        number of sub-keys `operators/skew.py:salted_join` should
        split that key into so each salted partition carries ~mean
        rows. The metadata-grain planning pass that prices the r4
        zipf stress's AQE split BEFORE the join runs, the way qz02
        plans compaction before rewriting files.

        Determinism: the flag and factor are integer
        cross-multiplications (n·k vs 2·total; ceil as
        (n·k + total − 1) div total) — no division until the derived
        share. Scale shape: ONE map-side-combinable count per key
        (the relation AQE itself builds), a 1-row total broadcast,
        then pure per-row expressions; the planner output is
        key-cardinality-sized, never data-sized."""
        d = load_table(spark, sf_dir, "documents")
        counts = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_rows"))
        tot = counts.agg(
            F.sum("n_rows").alias("total"), F.count(F.lit(1)).alias("n_keys")
        )
        flagged = F.col("n_rows") * F.col("n_keys") > SKEW_FLAG_X * F.col("total")
        return counts.crossJoin(F.broadcast(tot)).select(
            "source",
            "n_rows",
            F.expr("n_rows * 10000 div total").alias("share_bp"),
            flagged.cast("long").alias("skewed"),
            F.when(
                flagged, F.expr("(n_rows * n_keys + total - 1) div total")
            )
            .otherwise(F.lit(1))
            .cast("long")
            .alias("salt_factor"),
        )

    return qz04_skew_planner


_register_skew_planner_query()


# ---------------------------------------------------------------------------
# qa05: approximate functional-dependency profiler
# ---------------------------------------------------------------------------

#: (lhs, rhs) column pairs probed for lhs → rhs determinacy; rhs may be
#: a SQL expression (identical string in both engines).
FD_PAIRS = (
    ("source", "lang"),
    ("lang", "source"),
    ("doc_id", "source"),
    ("source", "n_chars // 1000"),
)


def _register_fd_profiler_query():
    from pyspark.sql import functions as F

    from event_stream_aggr_spark.plans.registry import register
    from event_stream_aggr_spark.tables import load_table

    def branch_sql(lhs: str, rhs: str) -> str:
        # rhs expressions use //, already DuckDB's integer-div spelling
        # (the Spark branch translates // -> div below)
        return f"""
  SELECT '{lhs}' AS lhs, '{rhs}' AS rhs,
         CAST(COUNT(*) AS BIGINT) AS n_groups,
         CAST(SUM(mx) * 1000000 // SUM(tot) AS BIGINT) AS strength_ppm,
         CAST(SUM(mx) = SUM(tot) AS BIGINT) AS exact_fd
  FROM (
    SELECT l, MAX(n) AS mx, SUM(n) AS tot
    FROM (SELECT {lhs} AS l, {rhs} AS r, CAST(COUNT(*) AS BIGINT) AS n
          FROM documents GROUP BY 1, 2)
    GROUP BY l)"""

    oracle = "\nUNION ALL\n".join(branch_sql(l, r) for l, r in FD_PAIRS)

    @register(
        "qa05_fd_profile",
        tags=("monitoring", "profile"),
        oracle=oracle,
    )
    def qa05_fd_profile(spark, sf_dir):
        """Approximate functional-dependency profiler (the schema-
        discovery half of data profiling, Metanome-style): for each
        probed column pair, the strength of lhs → rhs as
        Σ_lhs max_rhs(count) / N in integer ppm — 10⁶ means rhs is
        fully determined by lhs (an exact FD, flagged), lower values
        measure how far the pair is from one. Feeds qa03's drift
        monitor (an FD that WAS exact and degrades is upstream
        breakage) and join-design choices (near-FDs make dimension
        extraction lossless).

        Determinism: counts and the cross-multiplied strength are
        exact integers; the expression-valued rhs uses the same
        integer-div spelling in both engines.

        Scale shape (100 TB): each pair costs ONE map-side-combinable
        (lhs, rhs)-grain aggregation (bounded by the pair's active
        domain, not corpus rows) followed by folds on the lhs-grain
        relation; pairs union at report grain (4 rows). Probing all
        O(cols²) pairs batches the same dataflow per pair — the
        documented sweep a profiler schedules, pruned by qa03's
        per-column cardinalities first."""
        d = load_table(spark, sf_dir, "documents")
        out = None
        for lhs, rhs in FD_PAIRS:
            rs = rhs.replace("//", "div")
            g = (
                d.selectExpr(f"{lhs} AS l", f"{rs} AS r")
                .groupBy("l", "r")
                .agg(F.count(F.lit(1)).alias("n"))
            )
            m = g.groupBy("l").agg(
                F.max("n").alias("mx"), F.sum("n").alias("tot")
            )
            p = m.agg(
                F.lit(lhs).alias("lhs"),
                F.lit(rhs).alias("rhs"),
                F.count(F.lit(1)).alias("n_groups"),
                F.expr("sum(mx) * 1000000 div sum(tot)")
                .cast("long")
                .alias("strength_ppm"),
                (F.sum("mx") == F.sum("tot")).cast("long").alias("exact_fd"),
            )
            out = p if out is None else out.unionAll(p)
        return out

    return qa05_fd_profile


_register_fd_profiler_query()


# ---------------------------------------------------------------------------
# qa07: cumulative-gains (lift) table without sorting the entity relation
# ---------------------------------------------------------------------------

GAINS_BINS = 10
GAINS_BUCKET_CENTS = 100_000  # micro-bucket width: 1000.00 in value units


def _register_gains_table_query():
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from event_stream_aggr_spark.plans.registry import register
    from event_stream_aggr_spark.tables import load_table

    @register(
        "qa07_gains_table",
        tags=("monitoring", "eval"),
        oracle=f"""
WITH users AS (
  SELECT user_id,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents,
         CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS pos
  FROM events GROUP BY user_id),
mb AS (
  SELECT cents // {GAINS_BUCKET_CENTS} AS bucket,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(pos) AS BIGINT) AS np
  FROM users GROUP BY 1),
cum AS (
  SELECT bucket, n, np,
         SUM(n) OVER (ORDER BY bucket DESC ROWS UNBOUNDED PRECEDING) AS cum_n,
         SUM(n) OVER () AS total_n
  FROM mb),
binned AS (
  SELECT CAST(((cum_n - n) * {GAINS_BINS}) // total_n AS BIGINT) AS bin,
         CAST(SUM(n) AS BIGINT) AS n_users,
         CAST(SUM(np) AS BIGINT) AS n_positive
  FROM cum GROUP BY 1)
SELECT bin, n_users, n_positive,
       CAST(SUM(n_positive) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING)
            * 1000000 // SUM(n_positive) OVER () AS BIGINT) AS cum_capture_ppm
FROM binned
""",
    )
    def qa07_gains_table(spark, sf_dir):
        """Cumulative-gains / lift table (the model-eval artifact
        behind "the top 10% of scored users capture X% of
        conversions"): users scored by exact total spend (integer
        cents), cut into {GAINS_BINS} descending-score bins, each
        reporting its user count, positives (users with a purchase),
        and the cumulative capture rate in ppm. bin 0 = highest
        spenders; a useful score shows capture far above the diagonal
        — and the same dataflow evaluates ANY model score plugged in
        as `cents`.

        Scale shape (100 TB): qa04's two-phase recipe pointed at a
        model-eval question — the fact table reduces once to user
        grain, users reduce once to domain-bounded spend
        micro-buckets, and ALL ordering work (the descending
        cumulative count, bin assignment, capture accumulation)
        happens on the bucket/bin relations. No entity-relation sort,
        no fact re-scan. Integer cents → every count, cut and ppm is
        exact cross-engine."""
        e = load_table(spark, sf_dir, "events")
        users = e.groupBy("user_id").agg(
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).cast("long").alias("pos"),
        )
        mb = users.groupBy(
            F.expr(f"cents div {GAINS_BUCKET_CENTS}").alias("bucket")
        ).agg(F.count(F.lit(1)).alias("n"), F.sum("pos").alias("np"))
        w_cum = W.orderBy(F.desc("bucket")).rowsBetween(W.unboundedPreceding, 0)
        w_all = W.partitionBy()
        cum = mb.select(
            "bucket",
            "n",
            "np",
            F.sum("n").over(w_cum).alias("cum_n"),
            F.sum("n").over(w_all).alias("total_n"),
        )
        binned = (
            cum.select(
                F.expr(f"((cum_n - n) * {GAINS_BINS}) div total_n").alias("bin"),
                "n",
                "np",
            )
            .groupBy("bin")
            .agg(
                F.sum("n").alias("n_users"),
                F.sum("np").alias("n_positive"),
            )
        )
        w_bin = W.orderBy("bin").rowsBetween(W.unboundedPreceding, 0)
        return binned.select(
            "bin",
            "n_users",
            "n_positive",
            F.expr(
                f"sum(n_positive) over (order by bin rows between unbounded"
                f" preceding and current row) * 1000000"
            ).alias("_cum"),
            F.sum("n_positive").over(W.partitionBy()).alias("_tot"),
        ).select(
            "bin",
            "n_users",
            "n_positive",
            F.expr("_cum div _tot").cast("long").alias("cum_capture_ppm"),
        )

    return qa07_gains_table


_register_gains_table_query()


# ---------------------------------------------------------------------------
# qz05: salted hot-key join — result invariance, driver-checked
# ---------------------------------------------------------------------------


def _register_salted_join_query():
    from pyspark.sql import functions as F

    from event_stream_aggr_spark.operators.skew import salted_join
    from event_stream_aggr_spark.plans.registry import register
    from event_stream_aggr_spark.tables import load_table

    @register(
        "qz05_salted_hot_join",
        tags=("maintenance", "skew", "scale"),
        oracle="""
SELECT o.o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                     AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
""",
    )
    def qz05_salted_hot_join(spark, sf_dir):
        """The skew mitigation qz04 PLANS, executed and verified: the
        orders⋈lineitem revenue rollup run through
        ``operators/skew.py:salted_join`` (salt=4 — qz04's ceil(count/
        mean) recommendation shape for a ~4× hot key), against a PLAIN
        join oracle. Salting must be result-invariant — the salt only
        routes rows across shuffle partitions — so the driver's
        hash check re-proves, at every sampling, that the mitigation
        path returns byte-identical aggregates to the unmitigated
        join. (bench.py's skew twin measures the balance side of the
        story on the Zipf probe: max/median task time 3.8x -> ~1.5x.)

        Scale shape: the salted equi-join shuffles (key, salt) — the
        hot key spreads over `salt` partitions; the right side
        replicates x salt (dimension-sized, affordable); aggregation
        stays partial+final. DECIMAL line math, DOUBLE only at the
        final cast (q01's recipe), so both engines sum exactly.

        ``salt_cols`` names (l_orderkey, l_linenumber) explicitly
        (round-8 ADVICE): the default — xxhash64 of ALL projected
        columns — would collapse byte-identical (key, rev) duplicates
        of the hot key onto one salt bucket, quietly resurrecting the
        straggler; the line number is the fact table's unique-per-row
        discriminator, so the spread is duplicate-proof AND still
        deterministic (retry/speculation-safe, unlike rand())."""
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey",
            "l_linenumber",
            (F.col("l_extendedprice") * (1 - F.col("l_discount")))
            .cast("decimal(18,6)")
            .alias("rev"),
        )
        o = load_table(spark, sf_dir, "orders").select(
            F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
        )
        joined = salted_join(
            li, o, "l_orderkey", salt=4, salt_cols=["l_orderkey", "l_linenumber"]
        )
        return joined.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("rev").cast("double").alias("revenue"),
        )

    return qz05_salted_hot_join


_register_salted_join_query()


# ---------------------------------------------------------------------------
# qz06: staged running total — the hot-partition WINDOW mitigation
# ---------------------------------------------------------------------------


def _register_staged_running_total_query():
    from pyspark.sql import functions as F

    from event_stream_aggr_spark.plans.registry import register
    from event_stream_aggr_spark.tables import load_table

    @register(
        "qz06_staged_running_total",
        tags=("maintenance", "skew", "window", "scale"),
        oracle="""
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS running_spent
FROM orders
""",
    )
    def qz06_staged_running_total(spark, sf_dir):
        """q10's running total computed the way a Zipf-hot partition
        key demands (the round-8 skew probe's one real victim: the hot
        user's cumulative window serializes its whole history through
        ONE task, 4.5x task imbalance). Two-phase decomposition:

        1. within-day chain: cumulative sum over (custkey, orderdate)
           sub-partitions — the hot key's work parallelizes across its
           days;
        2. day-grain stitch: per-(custkey, day) totals, EXCLUSIVE
           prefix-summed per custkey (a chain of |days| rows, not
           |orders| rows), joined back and added.

        The ORACLE is the plain single-window running total — the
        driver's hash check proves the decomposition is value-exact,
        which it is because accumulation is DECIMAL (association order
        irrelevant; q10's own recipe) and the (date, orderkey) order
        is total. This is the documented mitigation pattern for
        cumulative windows over power-law keys: sub-key on a time
        grain, stitch prefixes at the sub-key grain — the same
        monoid-merge shape qi01 streams with.

        Round-9: routed through ``operators/skew.staged_running_total``
        with ``force='staged'`` — the helper's auto mode (one
        count-per-key stats pass, the qz04 recipe priced against the
        session's parallelism) picks the PLAIN window when no key is
        hot, since the staged form costs ~1.7x on uniform data;
        forcing 'staged' here keeps the decomposition itself under the
        driver's oracle check at every round. Branch selection is
        unit-tested in tests/test_scale_ops.py.

        Scale shape: phase 1's window partitions are (key x day) — at
        100 TB the hottest such partition is one key-day, bounded by
        ingest-per-day, not by history; phase 2 runs at day grain
        (|keys| x |days| rows); the stitch join is group-grain
        broadcastable per day range. No stage sees a partition
        proportional to a key's full history."""
        from event_stream_aggr_spark.operators.skew import staged_running_total

        o = load_table(spark, sf_dir, "orders")
        dec = F.col("o_totalprice").cast("decimal(18,2)")
        staged = staged_running_total(
            o,
            key="o_custkey",
            grain="o_orderdate",
            order=["o_orderkey"],
            value=dec,
            out="running_dec",
            force="staged",
        )
        return staged.select(
            "o_custkey",
            "o_orderkey",
            F.col("running_dec").cast("double").alias("running_spent"),
        )

    return qz06_staged_running_total


_register_staged_running_total_query()


# ---------------------------------------------------------------------------
# qz07: Z-order (Morton) layout — multi-dimension pruning, verified as data
# ---------------------------------------------------------------------------

ZORDER_BITS = 8          # quantization bits per dimension
ZORDER_BUCKET_SHIFT = 8  # bucket = zkey >> 8 → top 4 bits of EACH dim


def _morton_terms(q1: str, q2: str, shift_fn) -> str:
    """Bit-interleave expression: bit i of q1 → position 2i, bit i of
    q2 → 2i+1. ``shift_fn(expr, i)`` renders a right-shift in the
    target dialect; the rest is shared integer arithmetic."""
    terms = []
    for i in range(ZORDER_BITS):
        terms.append(f"(({shift_fn(q1, i)}) & 1) * {1 << (2 * i)}")
        terms.append(f"(({shift_fn(q2, i)}) & 1) * {1 << (2 * i + 1)}")
    return " + ".join(terms)


def _register_zorder_query():
    from pyspark.sql import functions as F

    from event_stream_aggr_spark.plans.registry import register
    from event_stream_aggr_spark.tables import load_table

    duck_z = _morton_terms("q1", "q2", lambda e, i: f"{e} >> {i}")
    spark_z = _morton_terms("q1", "q2", lambda e, i: f"shiftright({e}, {i})")

    @register(
        "qz07_zorder_layout",
        tags=("maintenance", "layout", "scale"),
        oracle=f"""
WITH cal AS (SELECT CAST(MAX(l_partkey) + 1 AS BIGINT) AS pk_dom,
                    MIN(l_shipdate) AS d0,
                    CAST(date_diff('day', MIN(l_shipdate), MAX(l_shipdate))
                         + 1 AS BIGINT) AS d_range
             FROM lineitem),
q AS (
  SELECT CAST(LEAST({(1 << ZORDER_BITS) - 1}, GREATEST(0,
           (date_diff('day', d0, l_shipdate)
            * {1 << ZORDER_BITS}) // d_range)) AS BIGINT) AS q1,
         CAST((l_partkey * {1 << ZORDER_BITS}) // pk_dom AS BIGINT) AS q2
  FROM lineitem, cal),
z AS (SELECT q1, q2, CAST({duck_z} AS BIGINT) AS zkey FROM q)
SELECT CAST(zkey // {1 << ZORDER_BUCKET_SHIFT} AS BIGINT) AS z_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(MIN(q1) AS BIGINT) AS min_date_q,
       CAST(MAX(q1) AS BIGINT) AS max_date_q,
       CAST(MIN(q2) AS BIGINT) AS min_part_q,
       CAST(MAX(q2) AS BIGINT) AS max_part_q,
       CAST(MAX(q1) - MIN(q1) AS BIGINT) AS date_span,
       CAST(MAX(q2) - MIN(q2) AS BIGINT) AS part_span
FROM z GROUP BY z_bucket
""",
    )
    def qz07_zorder_layout(spark, sf_dir):
        """Z-order (Morton) clustering with MONOTONE calibrated
        quantization — the deployable form of what qz01 demonstrates.
        qz01's mod-256 grid proves the curve-locality math (every
        tile's bounding box <= 32x32 in GRID cells) but `pmod` is not
        monotone in the raw column: partkey 255 and 256 land in
        adjacent cells while 1 and 257 share one, so a mod-grid layout
        gives tight stats on the synthetic cell value, NOT on the raw
        column a predicate actually filters. Here both dimensions are
        scaled monotonically over their real domains (BOTH calibrated
        from the data by one broadcast min/max — round-8 ADVICE: the
        date domain was previously a hard-coded base+2600-day window,
        so dates outside it would silently clamp into edge cells and
        erode the span<=16 property if the corpus date range shifted),
        so the per-bucket envelope this query reports translates
        DIRECTLY to raw-column parquet min/max: every z-bucket
        (zkey >> {ZORDER_BUCKET_SHIFT} = top 4 bits of each dim)
        bounds BOTH dimensions to a span <= 16 of 256 grid steps, and
        a scan filtering on EITHER raw column skips ~15/16 of
        z-bucket-ordered files (a single-column sort gives that on
        one dimension and nothing on the other). A unit test pins the
        span bound; the oracle recomputes the same interleave in SQL.

        Scale shape: the z-key is pure per-row integer arithmetic (no
        shuffle); the envelope report is one map-side-combinable agg
        over <= 2^{ZORDER_BITS} buckets. The 100 TB layout job is
        repartitionByRange(zkey) + sortWithinPartitions(zkey) + write
        — range exchange of the data once, the same cost class as any
        re-layout, amortized over every pruned scan after (qz02's
        compaction economics). The partkey grid is calibrated from a
        1-row broadcast max (design rule 11: calibrate small, apply
        broadcast)."""
        li = load_table(spark, sf_dir, "lineitem").select("l_shipdate", "l_partkey")
        cal = li.agg(
            (F.max("l_partkey") + 1).cast("long").alias("pk_dom"),
            F.min("l_shipdate").alias("d0"),
            (F.datediff(F.max("l_shipdate"), F.min("l_shipdate")) + 1)
            .cast("long")
            .alias("d_range"),
        )
        grid = (1 << ZORDER_BITS) - 1
        q = li.crossJoin(F.broadcast(cal)).select(
            F.least(
                F.lit(grid),
                F.greatest(
                    F.lit(0),
                    F.expr(
                        f"(datediff(l_shipdate, d0)"
                        f" * {1 << ZORDER_BITS}) div d_range"
                    ),
                ),
            )
            .cast("long")
            .alias("q1"),
            F.expr(f"(l_partkey * {1 << ZORDER_BITS}) div pk_dom")
            .cast("long")
            .alias("q2"),
        )
        z = q.select("q1", "q2", F.expr(spark_z).cast("long").alias("zkey"))
        return (
            z.groupBy(
                F.expr(f"zkey div {1 << ZORDER_BUCKET_SHIFT}")
                .cast("long")
                .alias("z_bucket")
            )
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.min("q1").cast("long").alias("min_date_q"),
                F.max("q1").cast("long").alias("max_date_q"),
                F.min("q2").cast("long").alias("min_part_q"),
                F.max("q2").cast("long").alias("max_part_q"),
                (F.max("q1") - F.min("q1")).cast("long").alias("date_span"),
                (F.max("q2") - F.min("q2")).cast("long").alias("part_span"),
            )
        )

    return qz07_zorder_layout


_register_zorder_query()


# ---------------------------------------------------------------------------
# qa09: quality-scorer calibration (reliability diagram + ECE terms)
# ---------------------------------------------------------------------------

CALIB_BINS = 10
CALIB_GAIN = 5  # stopword-ratio score gain: ratio * 5, saturating at 1


def _register_calibration_query():
    from pyspark.sql import functions as F

    from event_stream_aggr_spark.plans.registry import register
    from event_stream_aggr_spark.tables import load_table

    @register(
        "qa09_calibration_ece",
        tags=("quality", "monitoring"),
        oracle=f"""
WITH stats AS (
  SELECT doc_id,
         CAST(len(ts) AS BIGINT) AS n_tokens,
         CAST(len(list_filter(ts,
              x -> x IN ('the','a','of','and','to','in','is'))) AS BIGINT)
           AS n_stop
  FROM (SELECT doc_id,
               list_filter(string_split(text, ' '), x -> x <> '') AS ts
        FROM documents)
  WHERE len(ts) > 0),
scored AS (
  SELECT doc_id,
         LEAST(999999, n_stop * {CALIB_GAIN} * 1000000 // n_tokens)
           AS score_ppm,
         CAST((n_tokens BETWEEN 50 AND 100000)
              AND (n_stop * 50 >= 3 * n_tokens) AS BIGINT) AS kept
  FROM stats),
binned AS (
  SELECT LEAST({CALIB_BINS - 1}, score_ppm * {CALIB_BINS} // 1000000)
           AS bin,
         score_ppm, kept
  FROM scored)
SELECT CAST(bin AS BIGINT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(score_ppm) // COUNT(*) AS BIGINT) AS avg_score_ppm,
       CAST(SUM(kept) * 1000000 // COUNT(*) AS BIGINT) AS keep_rate_ppm,
       CAST(ABS(SUM(score_ppm) // COUNT(*)
                - SUM(kept) * 1000000 // COUNT(*)) AS BIGINT) AS gap_ppm,
       CAST(COUNT(*) * ABS(SUM(score_ppm) // COUNT(*)
                - SUM(kept) * 1000000 // COUNT(*)) AS BIGINT)
         AS ece_term
FROM binned GROUP BY bin
""",
    )
    def qa09_calibration_ece(spark, sf_dir):
        """Reliability diagram for a document-quality scorer (the
        calibration audit a curation pipeline runs before trusting a
        filter's scores as probabilities — Guo et al. 2017's ECE,
        relationalized): bucket docs into {CALIB_BINS} equal-width
        score bins and report, per bin, the mean predicted score vs
        the observed keep rate and the |gap|; Σ ece_term / N is the
        expected calibration error. Scorer = saturating stopword-ratio
        heuristic (score ≈ min(1, {CALIB_GAIN}·stop_ratio)); label =
        the length+stopword subset of qt14's Gopher rules. A
        well-calibrated scorer shows avg_score ≈ keep_rate per bin;
        the audit quantifies where it over/under-claims.

        Determinism: everything is integer ppm arithmetic (floor div,
        integer abs) — no float thresholds anywhere, both engines
        byte-equal. Scale shape: one zero-shuffle scan pass computing
        per-doc (n_tokens, n_stop) as array expressions, then a
        {CALIB_BINS}-group map-side-combinable aggregation — the
        audit costs one corpus scan regardless of size."""
        d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        ts = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
        stop = F.filter(
            ts, lambda x: x.isin("the", "a", "of", "and", "to", "in", "is")
        )
        stats = d.select(
            F.size(ts).cast("long").alias("n_tokens"),
            F.size(stop).cast("long").alias("n_stop"),
        ).filter(F.col("n_tokens") > 0)
        scored = stats.select(
            F.least(
                F.lit(999999),
                F.expr(f"n_stop * {CALIB_GAIN} * 1000000 div n_tokens"),
            ).alias("score_ppm"),
            (
                F.col("n_tokens").between(50, 100000)
                & (F.col("n_stop") * 50 >= 3 * F.col("n_tokens"))
            )
            .cast("long")
            .alias("kept"),
        )
        binned = scored.select(
            F.least(
                F.lit(CALIB_BINS - 1),
                F.expr(f"score_ppm * {CALIB_BINS} div 1000000"),
            ).alias("bin"),
            "score_ppm",
            "kept",
        )
        avg_ppm = F.expr("sum(score_ppm) div count(1)")
        rate_ppm = F.expr("sum(kept) * 1000000 div count(1)")
        return binned.groupBy(F.col("bin").cast("long").alias("bin")).agg(
            F.count(F.lit(1)).alias("n_docs"),
            avg_ppm.cast("long").alias("avg_score_ppm"),
            rate_ppm.cast("long").alias("keep_rate_ppm"),
            F.abs(avg_ppm - rate_ppm).cast("long").alias("gap_ppm"),
            (F.count(F.lit(1)) * F.abs(avg_ppm - rate_ppm))
            .cast("long")
            .alias("ece_term"),
        )

    return qa09_calibration_ece


_register_calibration_query()


# ---------------------------------------------------------------------------
# qz08: running total through the AUTO-selecting skew helper
# ---------------------------------------------------------------------------


def _register_auto_running_total_query():
    from pyspark.sql import functions as F

    from event_stream_aggr_spark.plans.registry import register
    from event_stream_aggr_spark.tables import load_table

    @register(
        "qz08_running_total_auto",
        tags=("maintenance", "skew", "window", "scale"),
        oracle="""
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS running_spent
FROM orders
""",
    )
    def qz08_running_total_auto(spark, sf_dir):
        """qz06's running total through the AUTO mode of
        ``operators/skew.staged_running_total`` (round-8 VERDICT ask
        #3's missing piece: nothing SELECTED between the plain window
        and the staged decomposition — the staged form costs ~1.7x on
        uniform data and only wins under hot keys). The helper prices
        the hottest key's share of an average task's row budget with
        one count-per-key aggregate (the qz04 planning recipe applied
        to windows) and picks the branch; on the TPC-H-uniform custkey
        it picks the plain window, on a Zipf-hot key it picks the
        staged form (both branches plan-pinned in
        tests/test_scale_ops.py, the hot-key balance measured by
        bench.py's skew twin). The oracle is branch-INDEPENDENT — the
        plain running total — so every driver sampling re-proves that
        whatever branch the stats chose is value-exact (DECIMAL
        accumulation, total (date, orderkey) order; qz06 pins the
        forced-staged form the same way).

        Scale shape: the stats pass is one map-side-combinable count
        per key reduced to (max, total) — metadata-grain; the chosen
        plan is either ONE window shuffle or qz06's bounded two-phase
        shape. This is the deployable default a 100 TB pipeline
        should call; qz06 stays registered as the always-staged
        regression pin."""
        from event_stream_aggr_spark.operators.skew import staged_running_total

        o = load_table(spark, sf_dir, "orders")
        dec = F.col("o_totalprice").cast("decimal(18,2)")
        auto = staged_running_total(
            o,
            key="o_custkey",
            grain="o_orderdate",
            order=["o_orderkey"],
            value=dec,
            out="running_dec",
        )
        return auto.select(
            "o_custkey",
            "o_orderkey",
            F.col("running_dec").cast("double").alias("running_spent"),
        )

    return qz08_running_total_auto


_register_auto_running_total_query()


# ---------------------------------------------------------------------------
# qz09: equi-join through the AUTO-selecting skew helper
# ---------------------------------------------------------------------------


def _register_auto_skew_join_query():
    from pyspark.sql import functions as F

    from event_stream_aggr_spark.plans.registry import register
    from event_stream_aggr_spark.tables import load_table

    @register(
        "qz09_auto_skew_join",
        tags=("maintenance", "skew", "join", "scale"),
        oracle="""
SELECT c.c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         AS total_price
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
""",
    )
    def qz09_auto_skew_join(spark, sf_dir):
        """The customer⋈orders rollup through
        ``operators/skew.auto_skew_join`` (round-9 VERDICT ask #4:
        qz08 made window-skew mitigation a priced default; joins still
        made the user CHOOSE ``salted_join``). The helper prices the
        hottest probe-side key's share of an average task's row budget
        with one count-per-key aggregate (``join_skew_strategy`` —
        the qz04 recipe again) and picks the branch: on the
        TPC-H-uniform custkey it takes the plain join, and since the
        round-11 re-price (round-10 VERDICT ask #1) a Zipf-hot key
        ALSO stays plain while AQE skew-split is armed for the shape
        and the hot key's estimated bytes fit advisory × parallelism —
        the runtime split restores balance without the salt's
        right-side replication (the bench twin measured plain+AQE at
        1.03 s vs the old salted choice's 1.64 s at equal balance).
        Salting remains the fallback when AQE is off, the shape isn't
        left-splittable, the key outgrows the split budget, or row
        width is unestimable — with the salt count sized to the
        measured excess. Both branches are plan-pinned in
        tests/test_scale_ops.py; the Zipf twin's task balance is
        measured in bench.py's skew block.

        The oracle is branch-INDEPENDENT — the plain join — so every
        driver sampling re-proves that whatever branch the stats chose
        is value-exact (salting only routes rows across shuffle
        partitions; DECIMAL order-total math, DOUBLE at the final
        cast). qz05 stays registered as the always-salted regression
        pin, exactly as qz06 does for the always-staged window.

        Scale shape: the stats pass is metadata-grain (count per key,
        map-side combinable, reduced to two numbers); the chosen plan
        is either one equi-join shuffle or the (key, salt) spread with
        dimension-side replication x salt. This is the deployable
        default a 100 TB pipeline should call at every fact⋈dim
        join whose key distribution is unknown at author time."""
        from event_stream_aggr_spark.operators.skew import auto_skew_join

        o = load_table(spark, sf_dir, "orders").select(
            F.col("o_custkey").alias("c_custkey"),
            F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
        )
        c = load_table(spark, sf_dir, "customer").select(
            "c_custkey", "c_mktsegment"
        )
        joined = auto_skew_join(o, c, "c_custkey")
        return joined.groupBy("c_mktsegment").agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("price").cast("double").alias("total_price"),
        )

    return qz09_auto_skew_join


_register_auto_skew_join_query()


def _register_aqe_credited_join_query():
    from pyspark.sql import functions as F

    from event_stream_aggr_spark.plans.registry import register
    from event_stream_aggr_spark.tables import load_table

    @register(
        "qz10_aqe_credited_join",
        tags=("maintenance", "skew", "join", "scale"),
        oracle="""
SELECT c.c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         AS total_price
FROM (SELECT CASE WHEN o_orderkey % 10 < 6 THEN 1 ELSE o_custkey END
         AS c_custkey,
       o_totalprice
      FROM orders) o
JOIN customer c ON o.c_custkey = c.c_custkey
GROUP BY c.c_mktsegment
""",
    )
    def qz10_aqe_credited_join(spark, sf_dir):
        """qz09's shape with a DELIBERATELY hot probe key — 60% of all
        orders remapped onto custkey 1 (``o_orderkey % 10 < 6``), so
        the selector's row-skew gate FIRES on the driver's own test
        data — driving the round-11 AQE-credit decision
        (``operators/skew.join_skew_strategy``) under the oracle: AQE
        skew-split is armed in every session this runs under, the hot
        key's estimated bytes sit far inside advisory × map-spread
        (parallelism capped by the estimated input-split count —
        round-12 re-price), so auto mode must ride the PLAIN join and
        leave the skew to
        the runtime backstop (the r10 selector would have bought a
        salt here). qz05 remains the always-salted pin and qz09 the
        uniform-key plain pin; this query pins the credit itself.

        The oracle is branch-INDEPENDENT (the plain join), so the
        value check holds whichever branch a session's conf routes to
        — under a conf with AQE disabled the salted fallback produces
        identical rows (salting only routes rows across shuffle
        partitions). DECIMAL order-total math, DOUBLE at the final
        cast, exactly like qz09.

        Scale shape: one count-per-key stats agg (metadata grain) +
        one equi-join shuffle whose oversized partitions AQE splits by
        map-output ranges at runtime — no right-side replication paid.
        """
        from event_stream_aggr_spark.operators.skew import auto_skew_join

        o = load_table(spark, sf_dir, "orders").select(
            F.when(F.col("o_orderkey") % 10 < 6, F.lit(1).cast("long"))
            .otherwise(F.col("o_custkey"))
            .alias("c_custkey"),
            F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
        )
        c = load_table(spark, sf_dir, "customer").select(
            "c_custkey", "c_mktsegment"
        )
        joined = auto_skew_join(o, c, "c_custkey")
        return joined.groupBy("c_mktsegment").agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("price").cast("double").alias("total_price"),
        )

    return qz10_aqe_credited_join


_register_aqe_credited_join_query()


# ---------------------------------------------------------------------------
# qz11: consistent sharding — minimal-movement re-shard (rendezvous/HRW)
# ---------------------------------------------------------------------------

#: Shard counts for the qz11 re-shard scenario: grow 8 → 10. Under
#: HRW only keys whose new argmax IS one of the two added shards move
#: (expected fraction 2/10); mod-hash would reassign ~ (1 - gcd/new)
#: = 7/8 of all keys — the difference between rewriting 20% and 90%
#: of a 100 TB store.
HRW_SHARDS_OLD = 8
HRW_SHARDS_NEW = 10


def hrw_shard(key, n: int):
    """Highest-random-weight (rendezvous) shard for ``key`` among
    shards ``0..n-1``: argmax over per-(key, shard) hashes — the
    classic Thaler/Ravishankar rule. The hash is the engine-portable
    md5-prefix long (60 bits — collision odds ~1e-10 at test scale,
    and a collision only flips a tie-break, never correctness of the
    movement bound): DuckDB replays it verbatim, so shard assignment
    is value-identical across engines. A PER-ROW expression — arrays,
    no explode, no shuffle, no UDF; ``array_position`` takes the
    FIRST max, so ties deterministically break to the smallest shard
    id in both engines."""
    from pyspark.sql import functions as F

    key_s = key.cast("string")
    hs = F.array(
        *[
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(":", key_s, F.lit(str(s)))), 1, 15
                ),
                16,
                10,
            ).cast("long")
            for s in range(n)
        ]
    )
    return (F.array_position(hs, F.array_max(hs)) - 1).cast("long")


def _hrw_oracle(n_old: int = HRW_SHARDS_OLD, n_new: int = HRW_SHARDS_NEW) -> str:
    def arr(n: int) -> str:
        return "[" + ", ".join(
            f"('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':{s}'), 1, 15))::BIGINT"
            for s in range(n)
        ) + "]"

    return f"""
WITH h AS (
  SELECT doc_id, {arr(n_old)} AS h_old, {arr(n_new)} AS h_new
  FROM documents),
s AS (
  SELECT doc_id,
         list_indexof(h_old, list_aggregate(h_old, 'max')) - 1 AS shard_old,
         list_indexof(h_new, list_aggregate(h_new, 'max')) - 1 AS shard_new
  FROM h)
SELECT CAST(shard_new AS BIGINT) AS shard,
       CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(SUM(CASE WHEN shard_old <> shard_new THEN 1 ELSE 0 END) AS BIGINT)
         AS n_moved_in
FROM s GROUP BY shard_new
"""


def _register_consistent_sharding_query():
    from pyspark.sql import functions as F

    from event_stream_aggr_spark.plans.registry import register
    from event_stream_aggr_spark.tables import load_table

    @register(
        "qz11_consistent_sharding",
        tags=("maintenance", "layout", "scale"),
        oracle=_hrw_oracle(),
    )
    def qz11_consistent_sharding(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Minimal-movement re-shard audit (rendezvous hashing): assign
        every document to a shard under the OLD (8) and NEW (10) shard
        counts by highest-random-weight — shard = argmax over
        per-(key, shard) hashes — and report, per new shard, how many
        keys landed there and how many MOVED to get there. The HRW
        guarantee this query turns into checkable data: a key moves on a
        grow ONLY if its new argmax is one of the added shards (its old
        hashes and their order are unchanged), so n_moved_in is 0 for
        every surviving shard and ~|keys|/10 for each of the two new
        ones — against mod-hash's ~7/8 total reshuffle. At 100 TB that
        is the difference between rewriting two shards' worth of data
        and rewriting the store. Same md5-prefix hash in both engines,
        value-identical assignment; ties break to the smallest shard id
        (first-max) in both.

        Scale shape: shard assignment is a PER-ROW array expression
        (no explode, no join, no UDF — whole-stage codegen over the
        scan); the only shuffle is the final 10-group aggregate,
        map-side combined to |shards| rows per task. Re-sharding a real
        store with it co-locates by the same expression via
        repartition(shard) — still one exchange."""
        d = load_table(spark, sf_dir, "documents").select("doc_id")
        s = d.select(
            hrw_shard(F.col("doc_id"), HRW_SHARDS_OLD).alias("shard_old"),
            hrw_shard(F.col("doc_id"), HRW_SHARDS_NEW).alias("shard_new"),
        )
        return (
            s.groupBy(F.col("shard_new").alias("shard"))
            .agg(
                F.count(F.lit(1)).alias("n_keys"),
                F.sum(
                    F.when(F.col("shard_old") != F.col("shard_new"), 1).otherwise(0)
                ).alias("n_moved_in"),
            )
        )

    return qz11_consistent_sharding


_register_consistent_sharding_query()


# ---------------------------------------------------------------------------
# qa10: k-anonymity / l-diversity audit (training-data governance)
# ---------------------------------------------------------------------------

#: Privacy thresholds for the qa10 audit: an equivalence class is
#: re-identifying when fewer than K_ANON customers share its
#: quasi-identifier tuple, and attribute-disclosing when the orders it
#: links to carry fewer than L_DIV distinct sensitive values.
K_ANON = 5
L_DIV = 2


def _register_k_anonymity_query():
    from pyspark.sql import functions as F

    from event_stream_aggr_spark.plans.registry import register
    from event_stream_aggr_spark.tables import load_table

    @register(
        "qa10_k_anonymity",
        tags=("maintenance", "quality", "governance"),
        oracle=f"""
WITH qi AS (
  SELECT c_custkey, c_nationkey, c_mktsegment,
         CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_band
  FROM customer),
k_side AS (
  SELECT c_nationkey, c_mktsegment, bal_band,
         CAST(COUNT(*) AS BIGINT) AS k
  FROM qi GROUP BY c_nationkey, c_mktsegment, bal_band),
l_side AS (
  SELECT q.c_nationkey, q.c_mktsegment, q.bal_band,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(COUNT(DISTINCT o.o_orderpriority) AS BIGINT) AS l
  FROM qi q JOIN orders o ON o.o_custkey = q.c_custkey
  GROUP BY q.c_nationkey, q.c_mktsegment, q.bal_band),
cls AS (
  SELECT k.c_nationkey, k.k,
         COALESCE(l.n_orders, 0) AS n_orders, COALESCE(l.l, 0) AS l
  FROM k_side k LEFT JOIN l_side l
    ON l.c_nationkey = k.c_nationkey
   AND l.c_mktsegment = k.c_mktsegment
   AND l.bal_band = k.bal_band)
SELECT CAST(c_nationkey AS BIGINT) AS nation_key,
       CAST(COUNT(*) AS BIGINT) AS n_classes,
       CAST(SUM(CASE WHEN k < {K_ANON} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_small_classes,
       CAST(SUM(CASE WHEN k < {K_ANON} THEN k ELSE 0 END) AS BIGINT)
         AS n_rows_at_risk,
       CAST(MIN(k) AS BIGINT) AS min_k,
       CAST(SUM(CASE WHEN n_orders > 0 AND l < {L_DIV} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_low_diversity
FROM cls GROUP BY c_nationkey
""",
    )
    def qa10_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
        """k-anonymity / l-diversity audit (Sweeney; Machanavajjhala et
        al.) — the governance gate a training-data pipeline runs before
        publishing user-derived records: group customers into
        equivalence classes by quasi-identifier tuple (nation, market
        segment, account-balance band), measure each class's size k and
        the diversity l of a linked sensitive attribute (distinct order
        priorities reached through the class's customers), and roll up
        per nation how many classes re-identify (k < K_ANON), how many
        rows they expose, and how many classes leak an attribute
        (orders present but fewer than L_DIV distinct values — every
        member provably shares the same sensitive value).

        Scale shape (100 TB): the k side is ONE map-side-combinable
        groupBy over the customer scan (class grain out, never row
        grain); the l side shuffles orders once on its customer key and
        folds straight to class grain; the class-grain LEFT join and
        the per-nation rollup both run on relations bounded by
        |QI classes|, orders of magnitude smaller than either input.
        No distinct-expansion over the fact join (k deliberately comes
        from the customer-only side), no window, no crossJoin."""
        qi = load_table(spark, sf_dir, "customer").select(
            "c_custkey",
            "c_nationkey",
            "c_mktsegment",
            F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bal_band"),
        )
        k_side = qi.groupBy("c_nationkey", "c_mktsegment", "bal_band").agg(
            F.count(F.lit(1)).alias("k")
        )
        o = load_table(spark, sf_dir, "orders").select(
            "o_custkey", "o_orderpriority"
        )
        l_side = (
            qi.join(o, o["o_custkey"] == qi["c_custkey"])
            .groupBy("c_nationkey", "c_mktsegment", "bal_band")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.countDistinct("o_orderpriority").alias("l"),
            )
        )
        cls = k_side.join(
            l_side, ["c_nationkey", "c_mktsegment", "bal_band"], "left"
        ).select(
            "c_nationkey",
            "k",
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.coalesce("l", F.lit(0)).alias("l"),
        )
        return cls.groupBy(
            F.col("c_nationkey").cast("long").alias("nation_key")
        ).agg(
            F.count(F.lit(1)).alias("n_classes"),
            F.sum(F.when(F.col("k") < K_ANON, 1).otherwise(0)).alias(
                "n_small_classes"
            ),
            F.sum(F.when(F.col("k") < K_ANON, F.col("k")).otherwise(0)).alias(
                "n_rows_at_risk"
            ),
            F.min("k").alias("min_k"),
            F.sum(
                F.when(
                    (F.col("n_orders") > 0) & (F.col("l") < L_DIV), 1
                ).otherwise(0)
            ).alias("n_low_diversity"),
        )

    return qa10_k_anonymity


_register_k_anonymity_query()


# ---------------------------------------------------------------------------
# qz12: file-grain bloom-filter data skipping (point lookups)
# ---------------------------------------------------------------------------

#: qz12 layout + bloom geometry. 16 hash-partitioned "files", one
#: 1024-bit bloom per file stored as 32x32-bit BIGINT words, 3
#: md5-derived hash probes per key — every bit DuckDB-replayable.
#: 1024 bits holds ~300 distinct keys/file (sf0.1's load) at a ~20%
#: false-positive rate; production sizing is the same arithmetic at
#: ~10-16 bits per distinct key, chosen per file at write time from
#: the writer's ndv estimate (the bloom is per-file METADATA, so m
#: grows with file cardinality, not with file count).
BLOOM_FILES = 16
BLOOM_BITS = 1024
BLOOM_WORDS = 32
BLOOM_HASHES = 3


def _register_bloom_skipping_query():
    from pyspark.sql import functions as F

    from event_stream_aggr_spark.plans.registry import register
    from event_stream_aggr_spark.tables import load_table

    def _fp_spark(col):
        return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")

    def _idx_spark(fp, j: int):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(":", fp.cast("string"), F.lit(str(j)))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % BLOOM_BITS
        )

    def _fp_sql(expr: str) -> str:
        return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"

    def _idx_sql(fp_expr: str, j: int) -> str:
        return (
            f"(('0x' || substr(md5(CAST({fp_expr} AS VARCHAR) || ':{j}'), 1, 8))"
            f"::BIGINT % {BLOOM_BITS})"
        )

    idx_cols_sql = ", ".join(
        f"{_idx_sql('fp', j)} AS idx{j}" for j in range(BLOOM_HASHES)
    )
    word_aggs_sql = ", ".join(
        "bit_or("
        + " | ".join(
            f"(CASE WHEN idx{j} // 32 = {w} "
            f"THEN (CAST(1 AS BIGINT) << (idx{j} % 32)) "
            f"ELSE CAST(0 AS BIGINT) END)"
            for j in range(BLOOM_HASHES)
        )
        + f") AS w{w}"
        for w in range(BLOOM_WORDS)
    )
    pidx_cols_sql = ", ".join(
        f"{_idx_sql('probe_fp', j)} AS pidx{j}" for j in range(BLOOM_HASHES)
    )
    bloom_hit_sql = " AND ".join(
        f"((words[pidx{j} // 32 + 1]"
        f" & (CAST(1 AS BIGINT) << (pidx{j} % 32))) <> 0)"
        for j in range(BLOOM_HASHES)
    )

    oracle = f"""
WITH d AS (
  SELECT doc_id % {BLOOM_FILES} AS file_id, {_fp_sql("text")} AS fp
  FROM documents),
di AS (
  SELECT file_id, fp, {idx_cols_sql} FROM d),
stats AS (
  SELECT file_id, MIN(fp) AS min_fp, MAX(fp) AS max_fp, {word_aggs_sql}
  FROM di GROUP BY file_id),
probes AS (
  SELECT 'present:' || CAST(doc_id AS VARCHAR) AS probe_label,
         {_fp_sql("text")} AS probe_fp
  FROM documents WHERE doc_id <= 5
  UNION ALL
  SELECT 'absent:' || CAST(range AS VARCHAR),
         {_fp_sql("'absent:' || CAST(range AS VARCHAR)")}
  FROM range(1, 6)),
pi AS (
  SELECT probe_label, probe_fp, {pidx_cols_sql} FROM probes),
pairs AS (
  SELECT p.probe_label, p.probe_fp,
         {", ".join(f"p.pidx{j}" for j in range(BLOOM_HASHES))},
         s.min_fp, s.max_fp,
         [{", ".join(f"s.w{w}" for w in range(BLOOM_WORDS))}] AS words
  FROM stats s CROSS JOIN pi p),
flags AS (
  SELECT probe_label,
         CASE WHEN probe_fp BETWEEN min_fp AND max_fp THEN 1 ELSE 0 END
           AS zone_scan,
         CASE WHEN {bloom_hit_sql} THEN 1 ELSE 0 END AS bloom_scan
  FROM pairs),
truth AS (
  SELECT p.probe_label,
         CAST(COUNT(DISTINCT d.file_id) AS BIGINT) AS n_true_files
  FROM probes p JOIN d ON d.fp = p.probe_fp
  GROUP BY p.probe_label)
SELECT f.probe_label,
       CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(SUM(zone_scan) AS BIGINT) AS n_scan_zonemap,
       CAST(SUM(bloom_scan) AS BIGINT) AS n_scan_bloom,
       COALESCE(ANY_VALUE(t.n_true_files), 0) AS n_true_files
FROM flags f LEFT JOIN truth t ON t.probe_label = f.probe_label
GROUP BY f.probe_label
"""

    @register(
        "qz12_bloom_skipping",
        tags=("maintenance", "layout", "scale"),
        oracle=oracle,
    )
    def qz12_bloom_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
        """File-grain bloom-filter data skipping, audited against zone
        maps (qz03's min/max) for POINT lookups — the workload where
        zone maps fail: the lookup key is a uniform content
        fingerprint, so every file's [min, max] spans the whole domain
        and zone maps prune nothing, while a 1024-bit per-file bloom
        (32x32-bit BIGINT words, 3 md5-derived probes — Parquet's
        column-index bloom in auditable form) prunes almost every file
        for absent keys and all-but-the-true-file(s) (+ the occasional
        false positive) for present ones. Per probe key: files a
        zone-map planner must scan, files a bloom planner must scan,
        and the ground-truth file count.

        Scale shape (100 TB): the bloom build is ONE map-side-
        combinable aggregate over the scan (bit_or is commutative and
        associative; each file collapses to 34 BIGINTs of metadata —
        the same metadata-not-data grain as qz02/qz03, and each row
        computes its 3 hash indexes ONCE in a pre-projection); probe
        evaluation is a |probes| x |files| METADATA cross product with
        the bounded probe side explicitly broadcast (never a data-grain
        nested loop), and the ground-truth check is a broadcast
        equi-join on the fingerprint. m scales with per-file key count
        (writer-side ndv), not with corpus size — at 1000 executors the
        data is read once and the skipping decision costs |files| rows
        of arithmetic."""
        d = load_table(spark, sf_dir, "documents").select(
            (F.col("doc_id") % BLOOM_FILES).alias("file_id"),
            _fp_spark(F.col("text")).alias("fp"),
        )
        di = d.select(
            "file_id",
            "fp",
            *[
                _idx_spark(F.col("fp"), j).alias(f"idx{j}")
                for j in range(BLOOM_HASHES)
            ],
        )

        def _word_expr(w: int) -> str:
            terms = " | ".join(
                f"(case when idx{j} div 32 = {w} "
                f"then shiftleft(cast(1 as bigint), cast(idx{j} % 32 as int)) "
                f"else cast(0 as bigint) end)"
                for j in range(BLOOM_HASHES)
            )
            return f"bit_or({terms})"

        stats = di.groupBy("file_id").agg(
            F.min("fp").alias("min_fp"),
            F.max("fp").alias("max_fp"),
            *[
                F.expr(_word_expr(w)).alias(f"w{w}")
                for w in range(BLOOM_WORDS)
            ],
        )

        present = (
            load_table(spark, sf_dir, "documents")
            .filter(F.col("doc_id") <= 5)
            .select(
                F.concat(
                    F.lit("present:"), F.col("doc_id").cast("string")
                ).alias("probe_label"),
                _fp_spark(F.col("text")).alias("probe_fp"),
            )
        )
        absent = spark.range(1, 6).select(
            F.concat(F.lit("absent:"), F.col("id").cast("string")).alias(
                "probe_label"
            ),
            _fp_spark(
                F.concat(F.lit("absent:"), F.col("id").cast("string"))
            ).alias("probe_fp"),
        )
        probes = present.unionAll(absent)
        pi = probes.select(
            "probe_label",
            "probe_fp",
            *[
                _idx_spark(F.col("probe_fp"), j).alias(f"pidx{j}")
                for j in range(BLOOM_HASHES)
            ],
        )

        pairs = stats.crossJoin(F.broadcast(pi)).withColumn(
            "words", F.array(*[F.col(f"w{w}") for w in range(BLOOM_WORDS)])
        )
        bloom_hit = " and ".join(
            f"((element_at(words, cast(pidx{j} div 32 + 1 as int))"
            f" & shiftleft(cast(1 as bigint), cast(pidx{j} % 32 as int)))"
            f" <> 0)"
            for j in range(BLOOM_HASHES)
        )
        flags = pairs.select(
            "probe_label",
            F.when(
                F.col("probe_fp").between(F.col("min_fp"), F.col("max_fp")), 1
            )
            .otherwise(0)
            .alias("zone_scan"),
            F.when(F.expr(bloom_hit), 1).otherwise(0).alias("bloom_scan"),
        )
        truth = (
            d.join(F.broadcast(probes), d["fp"] == F.col("probe_fp"))
            .groupBy("probe_label")
            .agg(F.countDistinct("file_id").alias("n_true_files"))
        )
        return (
            flags.groupBy("probe_label")
            .agg(
                F.count(F.lit(1)).alias("n_files"),
                F.sum("zone_scan").alias("n_scan_zonemap"),
                F.sum("bloom_scan").alias("n_scan_bloom"),
            )
            .join(truth, "probe_label", "left")
            .select(
                "probe_label",
                "n_files",
                "n_scan_zonemap",
                "n_scan_bloom",
                F.coalesce("n_true_files", F.lit(0)).alias("n_true_files"),
            )
        )

    return qz12_bloom_skipping


_register_bloom_skipping_query()


# ---------------------------------------------------------------------------
# qa11: k-anonymity generalization ladder (minimal coarsening per nation)
# ---------------------------------------------------------------------------


def _register_generalization_ladder_query():
    from pyspark.sql import functions as F

    from event_stream_aggr_spark.plans.registry import register
    from event_stream_aggr_spark.tables import load_table

    @register(
        "qa11_generalization_ladder",
        tags=("maintenance", "quality", "governance"),
        oracle=f"""
WITH l0 AS (
  SELECT c_nationkey AS n, COUNT(*) AS k
  FROM customer
  GROUP BY c_nationkey, c_mktsegment, FLOOR(c_acctbal / 1000)),
l1 AS (
  SELECT c_nationkey AS n, COUNT(*) AS k
  FROM customer GROUP BY c_nationkey, c_mktsegment),
l2 AS (
  SELECT c_nationkey AS n, COUNT(*) AS k
  FROM customer GROUP BY c_nationkey),
lvls AS (
  SELECT n, 0 AS lvl, MIN(k) AS min_k, COUNT(*) AS n_classes
  FROM l0 GROUP BY n
  UNION ALL
  SELECT n, 1, MIN(k), COUNT(*) FROM l1 GROUP BY n
  UNION ALL
  SELECT n, 2, MIN(k), COUNT(*) FROM l2 GROUP BY n),
chosen AS (
  SELECT n, MIN(lvl) AS lvl FROM lvls
  WHERE min_k >= {K_ANON} GROUP BY n)
SELECT CAST(c.n AS BIGINT) AS nation_key,
       CAST(c.lvl AS BIGINT) AS chosen_level,
       CAST(a.min_k AS BIGINT) AS min_k,
       CAST(a.n_classes AS BIGINT) AS n_classes
FROM chosen c JOIN lvls a ON a.n = c.n AND a.lvl = c.lvl
""",
    )
    def qa11_generalization_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
        """k-anonymity generalization ladder (Samarati's minimal-
        generalization search, per nation) — the REMEDIATION step after
        qa10's audit finds re-identifying classes: climb the quasi-
        identifier coarsening lattice — level 0 = (nation, segment,
        balance band), level 1 drops the band, level 2 keeps only
        nation — and report, per nation, the MINIMAL level whose
        smallest equivalence class reaches K_ANON, with that level's
        min class size and class count. Level 2 always satisfies on
        this corpus (every nation holds >= K_ANON customers), so the
        chosen level is well-defined; a nation choosing level 0 needs
        no coarsening at all.

        Scale shape (100 TB): each lattice level is ONE map-side-
        combinable groupBy over the same scan (class grain out), the
        per-nation fold collapses each to |nations| rows, and the
        level selection is an argmin join between two |nations|-sized
        relations. Levels are evaluated in one union'd plan — the scan
        is shared; no window, no crossJoin, nothing row-grain after
        the first aggregate."""
        c = load_table(spark, sf_dir, "customer")

        def level(lvl: int, *qi_cols):
            cls = c.groupBy(
                F.col("c_nationkey").alias("n"), *qi_cols
            ).agg(F.count(F.lit(1)).alias("k"))
            return cls.groupBy("n").agg(
                F.lit(lvl).cast("long").alias("lvl"),
                F.min("k").alias("min_k"),
                F.count(F.lit(1)).alias("n_classes"),
            )

        lvls = (
            level(0, "c_mktsegment", F.floor(F.col("c_acctbal") / 1000))
            .unionByName(level(1, "c_mktsegment"))
            .unionByName(level(2))
            .select("n", "lvl", "min_k", "n_classes")
        )
        chosen = (
            lvls.filter(F.col("min_k") >= K_ANON)
            .groupBy("n")
            .agg(F.min("lvl").alias("lvl"))
        )
        return chosen.join(lvls, ["n", "lvl"]).select(
            F.col("n").cast("long").alias("nation_key"),
            F.col("lvl").alias("chosen_level"),
            "min_k",
            "n_classes",
        )

    return qa11_generalization_ladder


_register_generalization_ladder_query()


# ---------------------------------------------------------------------------
# qa12: t-closeness audit (ordered EMD) — completes the privacy triad
# ---------------------------------------------------------------------------

#: t-closeness threshold (Li, Li & Venkatasubramanian, ICDE 2007): a
#: class violates when its sensitive-value distribution sits further
#: than T from the global one under the ordered earth-mover distance.
#: 1/5 exactly, so the violation test cross-multiplies to integers.
T_CLOSE_NUM = 1
T_CLOSE_DEN = 5

#: The sensitive attribute's ordered domain (order priorities sort
#: lexicographically in priority order); m-1 = 4 prefix terms.
_PRIORITY_PREFIXES = ("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECI")


def _register_t_closeness_query():
    from pyspark.sql import functions as F

    from event_stream_aggr_spark.plans.registry import register
    from event_stream_aggr_spark.tables import load_table

    m1 = len(_PRIORITY_PREFIXES)  # m - 1 = 4
    cum_cols_sql = ",\n         ".join(
        f"CAST(SUM(CASE WHEN o_orderpriority <= '{p}~' THEN 1 ELSE 0 END)"
        f" AS BIGINT) AS cum{i}"
        for i, p in enumerate(_PRIORITY_PREFIXES)
    )
    emd_num_sql = " + ".join(
        f"ABS(c.cum{i} * g.gn - g.gcum{i} * c.n_c)" for i in range(m1)
    )

    @register(
        "qa12_t_closeness",
        tags=("maintenance", "quality", "governance"),
        oracle=f"""
WITH qi AS (
  SELECT c_custkey, c_nationkey, c_mktsegment,
         CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_band
  FROM customer),
linked AS (
  SELECT q.c_nationkey, q.c_mktsegment, q.bal_band, o.o_orderpriority
  FROM qi q JOIN orders o ON o.o_custkey = q.c_custkey),
cls AS (
  SELECT c_nationkey, c_mktsegment, bal_band,
         CAST(COUNT(*) AS BIGINT) AS n_c,
         {cum_cols_sql}
  FROM linked GROUP BY c_nationkey, c_mktsegment, bal_band),
gtot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS gn,
         {cum_cols_sql.replace("AS cum", "AS gcum")}
  FROM linked),
scored AS (
  SELECT c.c_nationkey, c.n_c, g.gn,
         ({emd_num_sql}) AS emd_num
  FROM cls c CROSS JOIN gtot g)
SELECT CAST(c_nationkey AS BIGINT) AS nation_key,
       CAST(COUNT(*) AS BIGINT) AS n_classes,
       CAST(SUM(CASE WHEN emd_num * {T_CLOSE_DEN}
                      > n_c * gn * {m1} * {T_CLOSE_NUM}
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating,
       MAX(CAST(emd_num AS DOUBLE)
           / CAST(n_c * gn * {m1} AS DOUBLE)) AS max_emd
FROM scored GROUP BY c_nationkey
""",
    )
    def qa12_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
        """t-closeness audit (Li et al., ICDE 2007) — the third leg of
        the privacy-governance triad after qa10's k-anonymity /
        l-diversity and qa11's generalization ladder: l-diversity can
        hold while a class's sensitive-value DISTRIBUTION still leaks
        (all-but-one member URGENT says plenty), so each QI class
        (nation, segment, balance band — qa10's grain) is measured
        against the global distribution of linked order priorities
        under the ORDERED earth-mover distance, EMD = (1/(m-1)) *
        sum_i |cumQ_i - cumG_i| over the m=5 ordered priorities.

        Cross-engine determinism: the fixed tiny domain turns each
        cumulative into a conditional COUNT (no window, no missing-
        value holes), EMD stays an exact BIGINT numerator
        (|cumq_i*N - cumg_i*n_c| summed), the t > 1/5 violation test
        cross-multiplies to integers, and the only float is ONE final
        division of identical integers in both engines (the qf09
        discipline).

        Exactness envelope (round-14 ADVICE): every BIGINT product
        here is a class count times the global count — emd_num <=
        (m-1)*n_c*gn and the violation RHS is n_c*gn*(m-1)*t_den, so
        with m-1 = 4 and t_den = 5 the binding constraint is
        20*n_c*gn < 2^63, i.e. max_class_size x total_linked_rows
        < ~4.6e17. That holds for any realistic QI grain (a 100 TB
        orders table is ~7e11 rows; a class would need to hold >65%
        of them to overflow), but a DEGENERATE grain where one class
        approaches the whole table overflows SILENTLY in both engines
        once n_c ~ gn ~ 6.8e8. Deployments auditing a coarser grain
        at that scale should cast the emd terms and the RHS to DOUBLE
        (exact up to 2^53, and EMD is a ratio-scale score there — the
        1-ULP risk moves only borderline t ~ 0.2 classes) or compute
        in DuckDB HUGEINT when the oracle side is the consumer.

        Scale shape (100 TB): one shuffle of orders onto its customer
        key, then everything lives at class grain (|QI classes|, tiny)
        — the class aggregate is map-side combinable with 5 fixed
        conditional sums, the global row broadcasts into a class-grain
        crossJoin, and the nation rollup is a second tiny aggregate.
        No window, no distinct-expansion, no per-row float math."""
        qi = load_table(spark, sf_dir, "customer").select(
            "c_custkey",
            "c_nationkey",
            "c_mktsegment",
            F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bal_band"),
        )
        o = load_table(spark, sf_dir, "orders").select(
            "o_custkey", "o_orderpriority"
        )
        linked = qi.join(o, o["o_custkey"] == qi["c_custkey"]).select(
            "c_nationkey", "c_mktsegment", "bal_band", "o_orderpriority"
        )

        def cums(prefix: str):
            return [
                F.sum(
                    F.when(
                        F.col("o_orderpriority") <= f"{p}~", 1
                    ).otherwise(0)
                ).alias(f"{prefix}{i}")
                for i, p in enumerate(_PRIORITY_PREFIXES)
            ]

        cls = linked.groupBy("c_nationkey", "c_mktsegment", "bal_band").agg(
            F.count(F.lit(1)).alias("n_c"), *cums("cum")
        )
        glob = linked.agg(F.count(F.lit(1)).alias("gn"), *cums("gcum"))
        emd_num = None
        for i in range(m1):
            term = F.abs(
                F.col(f"cum{i}") * F.col("gn")
                - F.col(f"gcum{i}") * F.col("n_c")
            )
            emd_num = term if emd_num is None else emd_num + term
        scored = cls.crossJoin(F.broadcast(glob)).select(
            "c_nationkey", "n_c", "gn", emd_num.alias("emd_num")
        )
        return scored.groupBy(
            F.col("c_nationkey").cast("long").alias("nation_key")
        ).agg(
            F.count(F.lit(1)).alias("n_classes"),
            F.sum(
                F.when(
                    F.col("emd_num") * T_CLOSE_DEN
                    > F.col("n_c") * F.col("gn") * m1 * T_CLOSE_NUM,
                    1,
                ).otherwise(0)
            ).alias("n_violating"),
            F.max(
                F.col("emd_num").cast("double")
                / (F.col("n_c") * F.col("gn") * m1).cast("double")
            ).alias("max_emd"),
        )

    return qa12_t_closeness


_register_t_closeness_query()
