"""The relational operator surface as (Spark plan, DuckDB oracle) pairs.

Covers SURVEY.md §2 rows P4-P5 (filters/column ops), F6-F11 (scalar
function families), A3-A6 (aggregations), J2-J5 (joins), §2.6 (window
functions), §2.7 (sort/limit/top-k/set ops), plus batch analogues of
the streaming windows (W1) — each registered with an equivalent ANSI
SQL oracle for the DuckDB harness.

Scale notes (100 TB design) are inline per query; the common ones:
- dimension joins (nation/region/part/supplier, and derived tiny
  relations) are explicitly ``F.broadcast`` — no shuffle of the fact
  table for enrichment joins at any scale;
- fact-fact joins shuffle on the join key; AQE handles skew/coalesce;
- aggregates are declarative groupBy → Catalyst plans partial (map-side)
  + final aggregation, so shuffled bytes are per-group, not per-row;
- top-k is orderBy+limit → TakeOrderedAndProject (no global sort).

Float determinism: see plans/registry.py docstring. ``_dsum`` computes
order-independent exact sums via DECIMAL, output as DOUBLE.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from event_stream_aggr_spark.operators.asof import asof_join
from event_stream_aggr_spark.plans.registry import register
from event_stream_aggr_spark.tables import load_table

TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss"
TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S"
TS_US_FMT_SPARK = "yyyy-MM-dd HH:mm:ss.SSSSSS"
TS_US_FMT_DUCK = "%Y-%m-%d %H:%M:%S.%f"


def _dsum(col: Column, scale: int = 2) -> Column:
    """Order-independent sum of a double column, bit-exact across engines:
    exact DECIMAL accumulation, DOUBLE output."""
    return F.sum(col.cast(f"decimal(18,{scale})")).cast("double")


def _osum(expr: str, scale: int = 2) -> str:
    """DuckDB mirror of ``_dsum``."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE)"


# ---------------------------------------------------------------------------
# Aggregations (A3)
# ---------------------------------------------------------------------------


@register(
    "q01_pricing_summary",
    bench=True,
    tags=("agg", "filter"),
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       {_osum('l_quantity')} AS sum_qty,
       {_osum('l_extendedprice')} AS sum_base_price,
       {_osum('l_extendedprice * (1 - l_discount)', 4)} AS sum_disc_price,
       {_osum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 6)} AS sum_charge,
       {_osum('l_quantity')} / COUNT(*) AS avg_qty,
       {_osum('l_extendedprice')} / COUNT(*) AS avg_price,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: filter + multi-aggregate groupBy.

    Catalyst plans partial+final hash aggregation over 2 low-cardinality
    keys — at 100 TB the shuffle carries only (4 groups x partitions)
    rows. The shipdate filter pushes down to the parquet scan.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum(F.col("l_quantity")).alias("sum_qty"),
            _dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            _dsum(disc, 4).alias("sum_disc_price"),
            _dsum(charge, 6).alias("sum_charge"),
            (_dsum(F.col("l_quantity")) / F.count(F.lit(1))).alias("avg_qty"),
            (_dsum(F.col("l_extendedprice")) / F.count(F.lit(1))).alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q02_predicates",
    tags=("filter",),
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority,
       (o_orderpriority LIKE '1%') AS is_urgent
FROM orders
WHERE o_totalprice BETWEEN 50000 AND 150000
  AND o_orderpriority IN ('1-URGENT', '2-HIGH')
  AND o_orderstatus <> 'P'
""",
)
def q02_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate surface (P4): BETWEEN / IN / <> / LIKE, all pushed to scan."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_totalprice").between(50000, 150000)
        & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        & (F.col("o_orderstatus") != "P")
    ).select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        "o_orderpriority",
        F.col("o_orderpriority").like("1%").alias("is_urgent"),
    )


@register(
    "q03_column_ops",
    tags=("projection",),
    oracle="""
SELECT o_orderkey,
       CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS priority_rank,
       CASE o_orderstatus WHEN 'F' THEN 'finished' WHEN 'O' THEN 'open'
            ELSE 'partial' END AS status_label,
       COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status2,
       CAST(FLOOR(o_totalprice / 1000) AS BIGINT) AS k_price
FROM orders
""",
)
def q03_column_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column ops (P5): cast / when-otherwise / coalesce / nullif / floor."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.substring("o_orderpriority", 1, 1).cast("long").alias("priority_rank"),
        F.when(F.col("o_orderstatus") == "F", "finished")
        .when(F.col("o_orderstatus") == "O", "open")
        .otherwise("partial")
        .alias("status_label"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("PENDING")).alias(
            "status2"
        ),
        F.floor(F.col("o_totalprice") / 1000).cast("long").alias("k_price"),
    )


# ---------------------------------------------------------------------------
# Joins (J2, J3)
# ---------------------------------------------------------------------------


@register(
    "q04_join_revenue_by_segment",
    bench=True,
    tags=("join", "agg"),
    oracle=f"""
SELECT c_mktsegment,
       COUNT(*) AS n_orders,
       COUNT(DISTINCT c_custkey) AS n_customers,
       {_osum('o_totalprice')} AS revenue,
       {_osum('o_totalprice')} / COUNT(*) AS avg_order
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
""",
)
def q04_join_revenue_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi inner join (J2) + aggregation: revenue per market segment.

    customer is the small side at every SF (1.5% of orders rows) →
    explicit broadcast: the orders fact never shuffles for the join;
    only the tiny per-segment aggregate shuffles.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("c_custkey").alias("n_customers"),
            _dsum(F.col("o_totalprice")).alias("revenue"),
            (_dsum(F.col("o_totalprice")) / F.count(F.lit(1))).alias("avg_order"),
        )
    )


@register(
    "q05_star_join_geography",
    bench=True,
    tags=("join", "agg"),
    oracle=f"""
SELECT r_name, n_name,
       COUNT(*) AS n_customers,
       {_osum('c_acctbal')} AS total_acctbal,
       MAX(c_acctbal) AS max_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
""",
)
def q05_star_join_geography(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way star join (J2) over broadcast dimensions.

    nation (25 rows) and region (5 rows) are broadcast at any scale —
    the customer fact table streams through two map-side hash joins
    with zero shuffle before the final small aggregate.
    """
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            _dsum(F.col("c_acctbal")).alias("total_acctbal"),
            F.max("c_acctbal").alias("max_acctbal"),
        )
    )


@register(
    "q06_outer_join_order_counts",
    tags=("join", "agg"),
    oracle=f"""
SELECT c_custkey, c_name,
       COUNT(o_orderkey) AS n_orders,
       COALESCE({_osum('o_totalprice')}, 0.0) AS total_spent
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_name
""",
)
def q06_outer_join_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join (J2) keeping zero-order customers."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(_dsum(F.col("o_totalprice")), F.lit(0.0)).alias("total_spent"),
        )
    )


@register(
    "q07_semi_join",
    tags=("join",),
    oracle="""
SELECT c_custkey, c_name, c_acctbal
FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
""",
)
def q07_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (J3) = EXISTS: customers with a finished order."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_acctbal"
    )


@register(
    "q08_anti_join",
    tags=("join",),
    oracle="""
SELECT c_custkey, c_name
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderpriority = '1-URGENT')
""",
)
def q08_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (J3) = NOT EXISTS: customers with no URGENT
    order. The original every-order form returned 0 rows at the
    driver's sf0.01 (every customer has orders on this corpus), so its
    hash check proved only the schema — an always-empty result is a
    vacuous driver check; the priority-restricted form keeps a few
    hundred rows at every SF.

    Scale shape: the anti probe side is filtered BEFORE the join
    (predicate pushed to the orders scan), then one key-shuffled (or
    broadcast, by side size) LEFT ANTI — output bounded by |customer|,
    never widened."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


# ---------------------------------------------------------------------------
# Window functions (§2.6)
# ---------------------------------------------------------------------------


@register(
    "q09_topn_per_group",
    bench=True,
    tags=("window",),
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
              ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
  FROM orders) t
WHERE rn <= 3
""",
)
def q09_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer: row_number + filter (deterministic
    tiebreak on o_orderkey). Single shuffle on the partition key."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "q10_running_totals",
    bench=True,
    tags=("window",),
    oracle=f"""
SELECT o_custkey, o_orderkey,
       strftime(o_orderdate, '{TS_FMT_DUCK}') AS order_date,
       o_totalprice,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS running_spent,
       LAG(o_totalprice) OVER (PARTITION BY o_custkey
            ORDER BY o_orderdate, o_orderkey) AS prev_price
FROM orders
""",
)
def q10_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum + lag per customer ordered by date (deterministic
    tiebreak). DECIMAL accumulation: DuckDB's segment-tree window sum
    associates differently than Spark's running fold — exact decimal
    makes the association order irrelevant."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", TS_FMT_SPARK).alias("order_date"),
        "o_totalprice",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("double")
        .alias("running_spent"),
        F.lag("o_totalprice").over(w).alias("prev_price"),
    )


@register(
    "q28_first_last_per_user",
    tags=("window", "agg"),
    oracle="""
SELECT user_id,
       COUNT(*) AS n_events,
       arg_min(event_type, ts) AS first_type,
       arg_max(event_type, ts) AS last_type
FROM events
GROUP BY user_id
""",
)
def q28_first_last_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min_by/max_by (first/last event per user by event time)."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min_by("event_type", "ts").alias("first_type"),
        F.max_by("event_type", "ts").alias("last_type"),
    )


# ---------------------------------------------------------------------------
# Sort / limit / set ops (§2.7)
# ---------------------------------------------------------------------------


@register(
    "q13_global_topk",
    bench=True,
    tags=("sort",),
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20
""",
)
def q13_global_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: orderBy+limit plans TakeOrderedAndProject — each
    partition keeps k rows, driver merges; no global sort at any SF."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
    )


@register(
    "q12_set_ops",
    tags=("setop",),
    oracle="""
SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 200000
UNION
SELECT c_custkey FROM customer WHERE c_acctbal > 7000
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
""",
)
def q12_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) then EXCEPT, matching SQL left-assoc precedence."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = o.filter(F.col("o_totalprice") > 200000).select(F.col("o_custkey").alias("custkey"))
    rich = c.filter(F.col("c_acctbal") > 7000).select(F.col("c_custkey").alias("custkey"))
    pending = o.filter(F.col("o_orderstatus") == "P").select(
        F.col("o_custkey").alias("custkey")
    )
    return big.union(rich).distinct().subtract(pending)


@register(
    "q30_intersect",
    tags=("setop",),
    oracle="""
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
""",
)
def q30_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: customers holding both open and finished orders."""
    o = load_table(spark, sf_dir, "orders")
    open_ = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    fin = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    return open_.intersect(fin)


# ---------------------------------------------------------------------------
# Grouping sets / rollup / cube (A5)
# ---------------------------------------------------------------------------


@register(
    "q11_rollup_geography",
    tags=("agg", "rollup"),
    oracle=f"""
SELECT r_name, n_name,
       COUNT(*) AS n_customers,
       {_osum('c_acctbal')} AS total_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
""",
)
def q11_rollup_geography(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (region, nation): subtotals + grand total."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            _dsum(F.col("c_acctbal")).alias("total_acctbal"),
        )
    )


@register(
    "q23_cube_lineitem",
    tags=("agg", "rollup"),
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n_items,
       {_osum('l_quantity')} AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
)
def q23_cube_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus): all grouping-set combinations."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_items"),
        _dsum(F.col("l_quantity")).alias("sum_qty"),
    )


# ---------------------------------------------------------------------------
# Scalar function families (F6-F11)
# ---------------------------------------------------------------------------


@register(
    "q14_string_functions",
    tags=("scalar",),
    oracle="""
SELECT p_partkey,
       upper(p_name) AS name_upper,
       CAST(length(p_name) AS BIGINT) AS name_len,
       substr(p_type, 1, 6) AS type_prefix,
       regexp_replace(p_name, ' ', '_', 'g') AS name_snake,
       concat(p_brand, '#', p_type) AS brand_type,
       CAST(length(p_name) - length(replace(p_name, ' ', '')) + 1 AS BIGINT)
         AS n_words,
       (p_type LIKE '%BRASS%') AS is_brass
FROM part
""",
)
def q14_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family (F6): upper/length/substr/regexp_replace/concat/
    replace/LIKE — all JVM builtins inside whole-stage codegen."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").cast("long").alias("name_len"),
        F.substring("p_type", 1, 6).alias("type_prefix"),
        F.regexp_replace("p_name", " ", "_").alias("name_snake"),
        F.concat(F.col("p_brand"), F.lit("#"), F.col("p_type")).alias("brand_type"),
        (F.length("p_name") - F.length(F.replace(F.col("p_name"), F.lit(" "), F.lit(""))) + 1)
        .cast("long")
        .alias("n_words"),
        F.col("p_type").like("%BRASS%").alias("is_brass"),
    )


@register(
    "q15_date_functions",
    tags=("scalar",),
    oracle=f"""
SELECT o_orderkey,
       CAST(year(o_orderdate) AS BIGINT) AS yr,
       CAST(month(o_orderdate) AS BIGINT) AS mo,
       CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
       strftime(date_trunc('month', o_orderdate), '{TS_FMT_DUCK}') AS month_start,
       CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS BIGINT)
         AS days_since_1995
FROM orders
""",
)
def q15_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date family (F8): year/month/quarter/date_trunc/datediff."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mo"),
        F.quarter("o_orderdate").cast("long").alias("qtr"),
        F.date_format(F.date_trunc("month", F.col("o_orderdate")), TS_FMT_SPARK).alias(
            "month_start"
        ),
        F.datediff(
            F.col("o_orderdate"), F.lit("1995-01-01 00:00:00").cast("timestamp_ntz")
        )
        .cast("long")
        .alias("days_since_1995"),
    )


@register(
    "q16_json_extraction",
    tags=("scalar", "json"),
    oracle="""
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS DOUBLE) / COUNT(*) AS avg_k
FROM events
GROUP BY event_type
""",
)
def q16_json_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON family (F10): get_json_object over the events.props column.

    At scale the JSON parse happens once per row map-side (codegen'd
    JsonPath, no shuffle until the tiny aggregate).
    """
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).alias("sum_k"),
        (F.sum(k).cast("double") / F.count(F.lit(1))).alias("avg_k"),
    )


# ---------------------------------------------------------------------------
# Aggregation extensions (A3-A6)
# ---------------------------------------------------------------------------


@register(
    "q17_having",
    tags=("agg",),
    oracle=f"""
SELECT l_partkey, COUNT(*) AS n, {_osum('l_quantity')} AS sum_qty
FROM lineitem
GROUP BY l_partkey
HAVING COUNT(*) >= 35
""",
)
def q17_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY + HAVING (post-aggregation filter)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n"), _dsum(F.col("l_quantity")).alias("sum_qty"))
        .filter(F.col("n") >= 35)
    )


@register(
    "q21_distinct_aggregates",
    tags=("agg",),
    oracle="""
SELECT l_returnflag,
       COUNT(*) AS n,
       COUNT(DISTINCT l_partkey) AS n_parts,
       COUNT(DISTINCT l_suppkey) AS n_suppliers
FROM lineitem
GROUP BY l_returnflag
""",
)
def q21_distinct_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count(distinct) — Catalyst expands to a two-phase aggregate so
    the distinct shuffle is per (group, key), never a global set."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_suppliers"),
    )


@register(
    "q22_conditional_aggregates",
    tags=("agg",),
    oracle="""
SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
       COUNT(*) AS n_orders,
       CAST(SUM(CASE WHEN o_orderpriority LIKE '1%' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_urgent,
       CAST(SUM(CASE WHEN o_orderpriority LIKE '1%' THEN 1 ELSE 0 END) AS DOUBLE)
         / COUNT(*) AS urgent_ratio
FROM orders
GROUP BY yr
""",
)
def q22_conditional_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation: CASE inside SUM (filtered counting)."""
    o = load_table(spark, sf_dir, "orders")
    urgent = F.when(F.col("o_orderpriority").like("1%"), 1).otherwise(0)
    return (
        o.groupBy(F.year("o_orderdate").cast("long").alias("yr"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(urgent).alias("n_urgent"),
            (F.sum(urgent).cast("double") / F.count(F.lit(1))).alias("urgent_ratio"),
        )
    )


@register(
    "q29_approx_distinct",
    tags=("agg", "approx"),
    oracle="""
SELECT l_returnflag,
       COUNT(DISTINCT l_partkey) AS exact_parts,
       ABS(CAST(approx_count_distinct(l_partkey) AS DOUBLE)
           / COUNT(DISTINCT l_partkey) - 1) <= 0.05 AS approx_parts_ok,
       approx_quantile(l_extendedprice, 0.5)
         BETWEEN quantile_cont(l_extendedprice, 0.45)
             AND quantile_cont(l_extendedprice, 0.55) AS approx_median_ok
FROM lineitem GROUP BY l_returnflag
""",
)
def q29_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (A4, HyperLogLog++) — constant memory per
    group at 100 TB where exact distinct would shuffle every key.

    Sketch estimates are engine-specific (Spark HLL++ vs DuckDB's HLL
    differ in the low bits), so raw estimates can never hash-match a
    cross-engine oracle.  Instead the hashed output carries (a) the
    EXACT distinct count as a twin column — value-checkable — and
    (b) booleans asserting each engine's own sketch lands within the
    exact bound (rel-err ≤ rsd for the distinct; inside the exact
    [p45, p55] neighborhood for the median), which are deterministic
    and true in both engines.  The sketches still execute in the plan
    (ObjectHashAggregate over HLL buffers — the 100 TB path);
    tests/test_relational.py::test_q29_approx_bounds additionally
    bounds the raw estimates in-engine.
    """
    li = load_table(spark, sf_dir, "lineitem")
    exact = F.countDistinct("l_partkey")
    approx = F.approx_count_distinct("l_partkey")
    med = F.expr("approx_percentile(l_extendedprice, 0.5)")
    p45 = F.expr("percentile(l_extendedprice, 0.45)")
    p55 = F.expr("percentile(l_extendedprice, 0.55)")
    return li.groupBy("l_returnflag").agg(
        exact.alias("exact_parts"),
        (F.abs(approx.cast("double") / exact - 1) <= 0.05).alias("approx_parts_ok"),
        med.between(p45, p55).alias("approx_median_ok"),
    )


# ---------------------------------------------------------------------------
# Subqueries
# ---------------------------------------------------------------------------


@register(
    "q18_subqueries",
    tags=("subquery",),
    oracle="""
SELECT c_custkey, c_name, c_acctbal
FROM customer
WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer)
  AND c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey < 3)
""",
)
def q18_subqueries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar + IN subqueries via the SQL API (Catalyst rewrites the IN
    to a left-semi join and the scalar to a broadcast subquery)."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    return spark.sql(
        """
        SELECT c_custkey, c_name, c_acctbal
        FROM customer
        WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer)
          AND c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey < 3)
        """
    )


# ---------------------------------------------------------------------------
# Time buckets / explode / pivot / sessionize (W1 batch analogue, P1, A6)
# ---------------------------------------------------------------------------


@register(
    "q19_hourly_event_rollup",
    bench=True,
    tags=("agg", "time"),
    oracle=f"""
SELECT strftime(date_trunc('hour', ts), '{TS_FMT_DUCK}') AS hour_bucket,
       event_type,
       COUNT(*) AS n,
       {_osum('value')} AS total_value,
       COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY hour_bucket, event_type
""",
)
def q19_hourly_event_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation (W1) in batch form: the reference's
    interval stats (app.go:75-110) as an event-time hourly rollup."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_format(F.date_trunc("hour", F.col("ts")), TS_FMT_SPARK).alias(
                "hour_bucket"
            ),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            _dsum(F.col("value")).alias("total_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


@register(
    "q20_token_counts",
    bench=True,
    tags=("explode", "text"),
    oracle="""
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents)
SELECT token, COUNT(*) AS n
FROM toks
WHERE token <> ''
GROUP BY token
ORDER BY n DESC, token
LIMIT 50
""",
)
def q20_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explode (P1) on batch data: tokenize documents, top-50 tokens.
    The explode is narrow (no shuffle); only per-token partial counts
    shuffle — at 100 TB the combiner keeps this proportional to vocab
    size, not corpus size."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "token")
        .limit(50)
    )


@register(
    "q26_pivot_user_activity",
    tags=("pivot",),
    oracle="""
SELECT user_id,
       COUNT(*) FILTER (WHERE event_type = 'click') AS click,
       COUNT(*) FILTER (WHERE event_type = 'error') AS error,
       COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
       COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
       COUNT(*) FILTER (WHERE event_type = 'view') AS view
FROM events
GROUP BY user_id
""",
)
def q26_pivot_user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: per-user event-type counts as columns (explicit value list
    so the plan is single-pass — no extra distinct-values job)."""
    e = load_table(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    return (
        e.groupBy("user_id")
        .pivot("event_type", types)
        .count()
        .na.fill(0, subset=types)
    )


@register(
    "q27_sessionization",
    tags=("window", "session"),
    oracle="""
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events)
SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
FROM flagged
GROUP BY user_id
""",
)
def q27_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via lag + gap flag (the batch form of
    session_window W2): one shuffle on user_id, then a window scan."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # timestampdiff on NTZ values is session-timezone independent
    # (cast ts->timestamp->long would shift across DST under a
    # non-UTC driver session)
    epoch = F.expr("timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
    prev_epoch = F.lag(epoch).over(w)
    new_session = (
        F.when(prev_epoch.isNull() | (epoch - prev_epoch > 1800), 1).otherwise(0)
    )
    return (
        e.select("user_id", "ts", new_session.alias("new_session"))
        .groupBy("user_id")
        .agg(
            F.sum("new_session").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


# ---------------------------------------------------------------------------
# Range / as-of joins (J4, J5)
# ---------------------------------------------------------------------------


@register(
    "q24_range_join_price_bands",
    tags=("join", "range"),
    oracle=f"""
SELECT band, COUNT(*) AS n_orders, {_osum('o_totalprice')} AS band_revenue
FROM orders
JOIN (VALUES ('low', 0.0, 100000.0), ('mid', 100000.0, 250000.0),
             ('high', 250000.0, 400000.0), ('top', 400000.0, 1000000000.0))
     bands(band, lo, hi)
  ON o_totalprice >= lo AND o_totalprice < hi
GROUP BY band
""",
)
def q24_range_join_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (theta) join J4 against a derived band dimension.

    The band table is tiny → BroadcastNestedLoopJoin: each fact row
    scans 4 broadcast rows map-side; no shuffle of the fact table.
    """
    o = load_table(spark, sf_dir, "orders")
    bands = spark.createDataFrame(
        [
            ("low", 0.0, 100000.0),
            ("mid", 100000.0, 250000.0),
            ("high", 250000.0, 400000.0),
            ("top", 400000.0, 1000000000.0),
        ],
        "band string, lo double, hi double",
    )
    return (
        o.join(
            F.broadcast(bands),
            (o.o_totalprice >= bands.lo) & (o.o_totalprice < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _dsum(F.col("o_totalprice")).alias("band_revenue"),
        )
    )


@register(
    "q25_asof_join",
    tags=("join", "asof"),
    oracle=f"""
SELECT p.event_id, p.user_id,
       strftime(p.ts, '{TS_US_FMT_DUCK}') AS purchase_ts,
       strftime(s.ts, '{TS_US_FMT_DUCK}') AS signup_ts
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'signup') s
  ON p.user_id = s.user_id AND p.ts >= s.ts
""",
)
def q25_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (J5): for each purchase, the latest signup at-or-before
    it. Spark has no builtin — operators/asof.py implements the
    union+window recipe (single shuffle, no join explosion)."""
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    signups = e.filter(F.col("event_type") == "signup").select(
        "user_id", F.col("ts").alias("signup_ts")
    )
    joined = asof_join(
        purchases,
        signups,
        on=["user_id"],
        left_ts="ts",
        right_ts="signup_ts",
        right_cols=["signup_ts"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", TS_US_FMT_SPARK).alias("purchase_ts"),
        F.date_format("signup_ts", TS_US_FMT_SPARK).alias("signup_ts"),
    )


# ---------------------------------------------------------------------------
# Batch 2: bag set-ops, math/array/codec families, re-nesting,
# grouping sets, rank suite, enrichment (J1)
# ---------------------------------------------------------------------------


@register(
    "q31_except_all",
    tags=("setop",),
    oracle="""
SELECT l_partkey FROM lineitem WHERE l_returnflag = 'N'
EXCEPT ALL
SELECT l_partkey FROM lineitem WHERE l_linestatus = 'F'
""",
)
def q31_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag semantics — multiplicities subtract, unlike q12)."""
    li = load_table(spark, sf_dir, "lineitem")
    n = li.filter(F.col("l_returnflag") == "N").select("l_partkey")
    f = li.filter(F.col("l_linestatus") == "F").select("l_partkey")
    return n.exceptAll(f)


@register(
    "q32_math_functions",
    tags=("scalar",),
    oracle="""
SELECT p_partkey,
       abs(p_retailprice - 1000.0) AS dev_from_1000,
       CAST(round(p_retailprice) AS DOUBLE) AS price_rounded,
       CAST(floor(p_retailprice) AS DOUBLE) AS price_floor,
       CAST(ceil(p_retailprice) AS DOUBLE) AS price_ceil,
       sqrt(p_retailprice) AS price_sqrt,
       round(ln(p_retailprice), 6) AS price_ln,
       round(log10(p_retailprice), 6) AS price_log10,
       round(pow(p_size, 2.0), 1) AS size_sq,
       CAST(((p_partkey % 7) + 7) % 7 AS BIGINT) AS key_mod7,
       CAST(sign(p_retailprice - 1000.0) AS DOUBLE) AS over_1000
FROM part
""",
)
def q32_math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family (F7): abs/round/floor/ceil/sqrt/ln/log10/pow/pmod/sign.

    sqrt is IEEE-correctly-rounded (bit-identical across engines);
    ln/log10/pow are libm-dependent → rounded to 6 in both engines.
    """
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.abs(F.col("p_retailprice") - 1000.0).alias("dev_from_1000"),
        F.round("p_retailprice", 0).cast("double").alias("price_rounded"),
        F.floor("p_retailprice").cast("double").alias("price_floor"),
        F.ceil("p_retailprice").cast("double").alias("price_ceil"),
        F.sqrt("p_retailprice").alias("price_sqrt"),
        F.round(F.log(F.col("p_retailprice")), 6).alias("price_ln"),
        F.round(F.log10("p_retailprice"), 6).alias("price_log10"),
        F.round(F.pow(F.col("p_size").cast("double"), 2.0), 1).alias("size_sq"),
        F.pmod(F.col("p_partkey"), F.lit(7)).cast("long").alias("key_mod7"),
        F.signum(F.col("p_retailprice") - 1000.0).alias("over_1000"),
    )


@register(
    "q33_array_functions",
    tags=("scalar", "array"),
    oracle="""
SELECT vec_id,
       CAST(len(embedding) AS BIGINT) AS dim,
       round(embedding[1]::DOUBLE, 4) AS first_val,
       array_to_string(list_transform(embedding[1:4],
                                      x -> printf('%.4f', x::DOUBLE)), ',') AS head4,
       round(list_max(list_transform(embedding, x -> x::DOUBLE)), 4) AS max_val
FROM embeddings
""",
)
def q33_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array/higher-order family (F9): size/element_at/slice/transform/
    array_max/array_join — all JVM-side, no UDF."""
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 4).alias("first_val"),
        F.array_join(
            F.transform(
                F.slice("embedding", 1, 4),
                lambda x: F.format_string("%.4f", x.cast("double")),
            ),
            ",",
        ).alias("head4"),
        F.round(
            F.array_max(F.transform("embedding", lambda x: x.cast("double"))), 4
        ).alias("max_val"),
    )


@register(
    "q34_codecs",
    tags=("scalar", "codec"),
    oracle="""
SELECT p_partkey,
       to_base64(p_name::BLOB) AS name_b64,
       CAST(from_base64(to_base64(p_name::BLOB)) AS VARCHAR) AS name_roundtrip,
       hex(p_partkey) AS key_hex,
       md5(p_name) AS name_md5
FROM part
""",
)
def q34_codecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Codec family (F11): base64/unbase64/hex/md5 (b64_data handling,
    types.go:33-34)."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.base64(F.col("p_name").cast("binary")).alias("name_b64"),
        F.unbase64(F.base64(F.col("p_name").cast("binary")))
        .cast("string")
        .alias("name_roundtrip"),
        F.hex("p_partkey").alias("key_hex"),
        F.md5(F.col("p_name").cast("binary")).alias("name_md5"),
    )


@register(
    "q35_renest_collect",
    tags=("agg", "nest"),
    oracle="""
SELECT l_orderkey,
       COUNT(*) AS n_lines,
       array_to_string(list_sort(list(l_linenumber)), ',') AS line_numbers,
       array_to_string(list_sort(list(DISTINCT l_returnflag)), ',') AS flags
FROM lineitem
GROUP BY l_orderkey
""",
)
def q35_renest_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_list/collect_set (A6) — the inverse of the P1 explode;
    sorted before join so the nondeterministic collect order cancels."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.array_join(F.array_sort(F.collect_list("l_linenumber")), ",").alias(
            "line_numbers"
        ),
        F.array_join(F.array_sort(F.collect_set("l_returnflag")), ",").alias("flags"),
    )


@register(
    "q36_grouping_sets",
    tags=("agg", "rollup"),
    oracle="""
SELECT r_name, n_name,
       CAST(GROUPING(r_name) AS BIGINT) AS g_region,
       CAST(GROUPING(n_name) AS BIGINT) AS g_nation,
       COUNT(*) AS n
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY GROUPING SETS ((r_name, n_name), (r_name), ())
""",
)
def q36_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS + GROUPING() markers (A5), via the SQL API."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    load_table(spark, sf_dir, "region").createOrReplaceTempView("region")
    return spark.sql(
        """
        SELECT r_name, n_name,
               CAST(GROUPING(r_name) AS BIGINT) AS g_region,
               CAST(GROUPING(n_name) AS BIGINT) AS g_nation,
               COUNT(*) AS n
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY GROUPING SETS ((r_name, n_name), (r_name), ())
        """
    )


@register(
    "q37_rank_suite",
    tags=("window",),
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(rank() OVER w AS BIGINT) AS rnk,
       CAST(dense_rank() OVER w AS BIGINT) AS drnk,
       CAST(ntile(4) OVER w AS BIGINT) AS quartile,
       percent_rank() OVER w AS pct_rank,
       cume_dist() OVER w AS cdist
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
""",
)
def q37_rank_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking family (§2.6): rank/dense_rank/ntile/percent_rank/
    cume_dist (percent_rank & cume_dist are exact integer ratios →
    bit-identical)."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cdist"),
    )


@register(
    "q38_enrichment_join",
    tags=("join", "enrich"),
    oracle=f"""
SELECT n_name AS geo, COUNT(*) AS n_customers, {_osum('c_acctbal')} AS total_acctbal
FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
""",
)
def q38_enrichment_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension enrichment (J1, iplookup.go analogue): broadcast left
    join against the geo dim, zero fact-side shuffle for the join."""
    from event_stream_aggr_spark.operators.enrich import enrich_with_dim

    c = load_table(spark, sf_dir, "customer")
    dim = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"), F.col("n_name").alias("geo")
    )
    return (
        enrich_with_dim(c, dim, "c_nationkey")
        .groupBy("geo")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            _dsum(F.col("c_acctbal")).alias("total_acctbal"),
        )
    )


@register(
    "q39_percentiles",
    tags=("agg", "approx"),
    oracle="""
SELECT o_orderstatus,
       round(quantile_cont(o_totalprice, 0.5), 2) AS median_price,
       round(quantile_cont(o_totalprice, 0.9), 2) AS p90_price,
       MIN(o_totalprice) AS min_price,
       MAX(o_totalprice) AS max_price
FROM orders GROUP BY o_orderstatus
""",
)
def q39_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (A4's correctness baseline; approx_percentile
    is the 100 TB path, q29). Both engines linearly interpolate over
    the sorted values → same math, rounded to absorb libm noise."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 2).alias("median_price"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 2).alias("p90_price"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
    )


@register(
    "q40_unpivot",
    tags=("pivot",),
    oracle="""
SELECT l_orderkey, l_linenumber, charge_kind, amount
FROM (SELECT l_orderkey, l_linenumber,
             l_extendedprice AS price, l_discount AS discount, l_tax AS tax
      FROM lineitem WHERE l_orderkey < 100)
UNPIVOT (amount FOR charge_kind IN (price, discount, tax))
""",
)
def q40_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide → long): the inverse of q26's pivot. Narrow op —
    each row expands map-side, no shuffle."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_extendedprice").alias("price"),
        F.col("l_discount").alias("discount"),
        F.col("l_tax").alias("tax"),
    ).unpivot(
        ["l_orderkey", "l_linenumber"],
        ["price", "discount", "tax"],
        "charge_kind",
        "amount",
    )


@register(
    "q41_supplier_geography",
    tags=("join", "agg"),
    oracle=f"""
SELECT n_name,
       COUNT(*) AS n_suppliers,
       {_osum('s_acctbal')} AS total_balance,
       MIN(s_name) AS first_supplier
FROM supplier JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
""",
)
def q41_supplier_geography(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier-side dimension join (completes table coverage: every
    driver table is exercised by at least one oracle query)."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            _dsum(F.col("s_acctbal")).alias("total_balance"),
            F.min("s_name").alias("first_supplier"),
        )
    )


@register(
    "q42_range_frame",
    tags=("window",),
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate
            RANGE BETWEEN INTERVAL 90 DAYS PRECEDING AND CURRENT ROW)
         AS DOUBLE) AS trailing_90d_spend
FROM orders
""",
)
def q42_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE window frame (value-based, interval bound): trailing-90-day
    spend per customer. Peers at equal order dates share a frame, so no
    tiebreaker is needed — the frame is value-determined."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_custkey, o_orderkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                    PARTITION BY o_custkey ORDER BY o_orderdate
                    RANGE BETWEEN INTERVAL 90 DAYS PRECEDING AND CURRENT ROW)
                 AS DOUBLE) AS trailing_90d_spend
        FROM orders
        """
    )


@register(
    "q43_nest_flatten_pipeline",
    tags=("explode", "pipeline"),
    oracle="""
SELECT user_id,
       (SELECT COUNT(*) FROM events e2 WHERE e2.user_id = e.user_id)
         AS event_metrics_count,
       CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id) - 1
            AS BIGINT) AS metric_idx,
       event_id,
       CASE (event_id % 4) + 1 WHEN 1 THEN 'High' WHEN 2 THEN 'Medium'
            WHEN 3 THEN 'Low' ELSE 'Informational' END AS priority_str,
       regexp_replace(regexp_replace(
           strftime(ts, '%Y-%m-%dT%H:%M:%S.') || substr(strftime(ts, '%f'), 1, 3)
             || 'Z',
           '0+Z$', 'Z'), '\\.Z$', 'Z') AS ts_iso
FROM events e
""",
)
def q43_nest_flatten_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's nest→flatten data path (P1+P2+F1+F2) as an
    oracle-checked query on driver tables: re-nest events per user
    (collect_list of structs = a SensorEvent's metrics[]), posexplode
    back, and apply the reference's scalar derivations — the priority
    label (processor.go:109-120) and the trailing-zero-suppressed ISO
    timestamp (processor.go:16-18). The oracle computes the identical
    flat result without the nest/unnest round-trip, proving the
    explode pipeline is lossless and the F1/F2 semantics are exact.
    """
    from event_stream_aggr_spark.functions.scalar import (
        iso_micro_timestamp_ntz,
        priority_label,
    )

    e = load_table(spark, sf_dir, "events")
    nested = e.groupBy("user_id").agg(
        F.sort_array(F.collect_list(F.struct("event_id", "ts"))).alias("metrics"),
        F.count(F.lit(1)).alias("event_metrics_count"),
    )
    return nested.select(
        "user_id",
        "event_metrics_count",
        F.posexplode("metrics").alias("metric_idx", "m"),
    ).select(
        "user_id",
        "event_metrics_count",
        F.col("metric_idx").cast("long").alias("metric_idx"),
        F.col("m.event_id").alias("event_id"),
        priority_label((F.col("m.event_id") % 4) + 1).alias("priority_str"),
        iso_micro_timestamp_ntz(F.col("m.ts")).alias("ts_iso"),
    )


@register(
    "q44_map_functions",
    tags=("scalar", "map"),
    oracle="""
WITH counts AS (
  SELECT user_id, event_type, COUNT(*) AS n FROM events GROUP BY user_id, event_type),
m AS (
  SELECT user_id, map_from_entries(list(ROW(event_type, n))) AS mp
  FROM counts GROUP BY user_id)
SELECT user_id,
       CAST(cardinality(mp) AS BIGINT) AS n_types,
       CAST(COALESCE((mp['purchase'])[1], 0) AS BIGINT) AS purchase_count,
       array_to_string(list_sort(map_keys(mp)), ',') AS types
FROM m
""",
)
def q44_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map family (F9): map_from_entries / size / element_at / map_keys.
    try_element_at keeps the missing-key lookup NULL-safe under ANSI
    mode (plain element_at raises MAP_KEY_DOES_NOT_EXIST)."""
    e = load_table(spark, sf_dir, "events")
    counts = e.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    m = counts.groupBy("user_id").agg(
        F.map_from_entries(F.collect_list(F.struct("event_type", "n"))).alias("mp")
    )
    return m.select(
        "user_id",
        F.size("mp").cast("long").alias("n_types"),
        F.coalesce(F.try_element_at("mp", F.lit("purchase")), F.lit(0)).alias(
            "purchase_count"
        ),
        F.array_join(F.array_sort(F.map_keys("mp")), ",").alias("types"),
    )


@register(
    "q45_shipping_priority",
    bench=True,
    tags=("join", "agg", "sort"),
    oracle=f"""
SELECT l_orderkey,
       {_osum('l_extendedprice * (1 - l_discount)', 4)} AS revenue,
       strftime(o_orderdate, '{TS_FMT_DUCK}') AS orderdate,
       o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
)
def q45_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped: two-fact shuffle join (lineitem x orders on
    orderkey — sort-merge/shuffle-hash territory, AQE picks) with a
    broadcast customer filter, then top-10 by revenue.

    Plan shape at scale: customer (filtered, small) broadcasts into
    orders; the surviving orders shuffle once against lineitem on
    orderkey; TakeOrderedAndProject caps the output. Both date filters
    push to the parquet scans.
    """
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp_ntz")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp_ntz")
    )
    return (
        li.join(o.join(F.broadcast(c), o.o_custkey == c.c_custkey), 
                li.l_orderkey == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", TS_FMT_SPARK).alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@register(
    "q46_order_priority_check",
    bench=True,
    tags=("join", "agg"),
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
""",
)
def q46_order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-shaped: semi join of a fact against a fact (EXISTS with
    a correlated non-equi condition) + aggregate. Catalyst plans the
    correlated EXISTS as a left-semi join on orderkey with the
    shipdate predicate as a join-side filter."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP_NTZ '1997-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP_NTZ '1998-01-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        GROUP BY o_orderpriority
        """
    )


@register(
    "q47_lateral_topn",
    tags=("join", "subquery"),
    oracle="""
SELECT n.n_name, t.c_name, t.c_acctbal
FROM nation n,
LATERAL (SELECT c_name, c_acctbal FROM customer
         WHERE c_nationkey = n.n_nationkey
         ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
""",
)
def q47_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery (per-nation top-2 customers by
    balance). Catalyst decorrelates this into a window + filter — the
    same physical plan as q09's explicit row_number, showing the two
    formulations converge."""
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT n.n_name, t.c_name, t.c_acctbal
        FROM nation n,
        LATERAL (SELECT c_name, c_acctbal FROM customer
                 WHERE c_nationkey = n.n_nationkey
                 ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
        """
    )


@register(
    "q48_event_funnel",
    tags=("agg", "time", "sequence"),
    oracle="""
WITH s1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id),
s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
  JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY e.user_id),
s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
  JOIN s2 ON e.user_id = s2.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id)
SELECT CAST(1 + (CASE WHEN s2.user_id IS NOT NULL THEN 1 ELSE 0 END)
              + (CASE WHEN s3.user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS reached_stage,
       COUNT(*) AS n_users
FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
GROUP BY reached_stage
""",
)
def q48_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-sequence (funnel) detection: view → later click → later
    purchase per user, reporting how many users reach each stage — the
    MATCH_RECOGNIZE-style pattern query of product analytics.

    Scale shape: ONE shuffle. Events group once by user_id; the staged
    minima come from a sequential fold over the time-sorted per-user
    array (first qualifying element == minimum qualifying timestamp, so
    the fold is semantically identical to the oracle's three staged
    MIN-joins, which would shuffle the event table three times). The
    per-user array is session-scale (bounded per user); a pathological
    hot user would be handled by salting, like any skewed key.
    Timestamps compare exactly and counts are integers → deterministic.
    """
    e = load_table(spark, sf_dir, "events")
    ev = e.filter(F.col("event_type").isin("view", "click", "purchase")).select(
        "user_id", F.struct("ts", "event_type").alias("s")
    )
    per_user = ev.groupBy("user_id").agg(
        F.array_sort(F.collect_list("s")).alias("arr")
    )
    ts_t = e.schema["ts"].dataType.simpleString()
    state0 = F.struct(
        F.lit(None).cast(ts_t).alias("t1"),
        F.lit(None).cast(ts_t).alias("t2"),
        F.lit(None).cast(ts_t).alias("t3"),
    )
    folded = F.aggregate(
        F.col("arr"),
        state0,
        lambda st, x: F.struct(
            F.when(
                st.t1.isNull() & (x.event_type == "view"), x.ts
            ).otherwise(st.t1).alias("t1"),
            F.when(
                st.t2.isNull()
                & st.t1.isNotNull()
                & (x.event_type == "click")
                & (x.ts > st.t1),
                x.ts,
            ).otherwise(st.t2).alias("t2"),
            F.when(
                st.t3.isNull()
                & st.t2.isNotNull()
                & (x.event_type == "purchase")
                & (x.ts > st.t2),
                x.ts,
            ).otherwise(st.t3).alias("t3"),
        ),
    )
    staged = per_user.select(folded.alias("f")).filter(F.col("f.t1").isNotNull())
    reached = (
        F.when(F.col("f.t3").isNotNull(), 3)
        .when(F.col("f.t2").isNotNull(), 2)
        .otherwise(1)
        .cast("long")
    )
    return staged.select(reached.alias("reached_stage")).groupBy("reached_stage").agg(
        F.count(F.lit(1)).alias("n_users")
    )


# ---------------------------------------------------------------------------
# Correlated-subquery suite (TPC-H Q17/Q21/Q22 shapes on the reduced schema)
# ---------------------------------------------------------------------------


@register(
    "q49_small_quantity_revenue",
    tags=("join", "agg", "subquery"),
    oracle=f"""
WITH pl AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_brand = 'Brand#4' AND p_size < 15),
thr AS (
  SELECT l_partkey,
         0.2 * ({_osum('l_quantity')} / COUNT(*)) AS max_qty
  FROM pl GROUP BY l_partkey)
SELECT {_osum('l_extendedprice')} / 7.0 AS avg_yearly
FROM pl JOIN thr USING (l_partkey)
WHERE l_quantity < max_qty
""",
)
def q49_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (correlated aggregate subquery): revenue from
    small-quantity orders of one brand's small parts, where "small" is
    defined relative to each part's own average order quantity.

    Plan: the brand/size filter prunes part to a broadcastable dim; the
    per-part threshold re-aggregates the already-joined lineitem slice
    (so lineitem is scanned once, the threshold relation is parts-sized
    and broadcasts back). The threshold is 0.2*(decimal-sum/count) —
    the identical expression order in both engines, so the comparison
    is bit-deterministic. Final sum is DECIMAL -> /7.0 in DOUBLE."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#4") & (F.col("p_size") < 15)
    )
    pl = li.join(
        F.broadcast(p.select("p_partkey")),
        F.col("l_partkey") == F.col("p_partkey"),
    ).select("l_partkey", "l_quantity", "l_extendedprice")
    thr = pl.groupBy("l_partkey").agg(
        (F.lit(0.2) * (_dsum(F.col("l_quantity")) / F.count(F.lit(1)))).alias(
            "max_qty"
        )
    )
    return (
        pl.join(F.broadcast(thr), "l_partkey")
        .filter(F.col("l_quantity") < F.col("max_qty"))
        .agg((_dsum(F.col("l_extendedprice")) / F.lit(7.0)).alias("avg_yearly"))
    )


@register(
    "q50_sole_late_supplier",
    tags=("join", "subquery", "agg"),
    oracle="""
SELECT s_name,
       CAST(COUNT(*) AS BIGINT) AS numwait
FROM lineitem l1
JOIN orders ON o_orderkey = l1.l_orderkey
JOIN supplier ON s_suppkey = l1.l_suppkey
WHERE o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
""",
)
def q50_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (EXISTS + NOT EXISTS correlated subqueries):
    suppliers who were the ONLY late shipper on finished multi-supplier
    orders. "Late" adapts to the reduced schema: shipped more than 60
    days after the order date.

    Plan: both correlated subqueries compile to one left-semi and one
    left-anti join against the same lineitem relation, each equi on
    l_orderkey with the <> predicate as a residual — shuffle-hash/SMJ
    on orderkey, never a nested loop. The orders and supplier dims
    broadcast. Counts are integers; s_name is the unique tiebreak."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = load_table(spark, sf_dir, "supplier")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    l1 = (
        li.join(F.broadcast(o), F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(late)
        .select("l_orderkey", "l_suppkey")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2")
    )
    l3 = (
        li.join(
            F.broadcast(
                load_table(spark, sf_dir, "orders").select(
                    "o_orderkey", "o_orderdate"
                )
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .filter(late)
        .select(F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("s3"))
    )
    sole_late = l1.join(
        l2,
        (F.col("l_orderkey") == F.col("k2")) & (F.col("l_suppkey") != F.col("s2")),
        "left_semi",
    ).join(
        l3,
        (F.col("l_orderkey") == F.col("k3")) & (F.col("l_suppkey") != F.col("s3")),
        "left_anti",
    )
    return (
        sole_late.join(
            F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey")
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


@register(
    "q51_idle_wealthy_customers",
    tags=("join", "subquery", "agg"),
    oracle=f"""
WITH pos_avg AS (
  SELECT {_osum('c_acctbal')} / COUNT(*) AS thr
  FROM customer WHERE c_acctbal > 0.0)
SELECT n_name,
       CAST(COUNT(*) AS BIGINT) AS numcust,
       {_osum('c_acctbal')} AS totacctbal
FROM customer
JOIN nation ON n_nationkey = c_nationkey
CROSS JOIN pos_avg
WHERE c_acctbal > thr
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
GROUP BY n_name
ORDER BY n_name
""",
)
def q51_idle_wealthy_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (scalar subquery + NOT EXISTS): customers richer
    than the positive-balance average with no order since 2000-01-01
    (lapsed high-value accounts), rolled up by nation.

    Plan: the global average is a 1-row broadcast (scalar subquery ==
    crossJoin(broadcast(agg))); the lapsed test is a left-anti join
    shuffled on custkey, with the date predicate pushed into the orders
    parquet scan so the anti side carries only recent custkeys; nation
    broadcasts. The threshold is decimal-sum/count in identical
    expression order both sides; group sums are DECIMAL."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "2000-01-01 00:00:00")
        .select("o_custkey")
    )
    thr = c.filter(F.col("c_acctbal") > 0.0).agg(
        (_dsum(F.col("c_acctbal")) / F.count(F.lit(1))).alias("thr")
    )
    return (
        c.crossJoin(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("thr"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            _dsum(F.col("c_acctbal")).alias("totacctbal"),
        )
        .orderBy("n_name")
    )


@register(
    "q52_cdc_upsert",
    tags=("join", "window", "cdc"),
    oracle=f"""
WITH base AS (
  SELECT user_id, event_type, value, ts, event_id
  FROM events WHERE ts < TIMESTAMP '2024-01-20 00:00:00'),
changes AS (
  SELECT user_id, event_type, value, ts, event_id
  FROM events WHERE ts >= TIMESTAMP '2024-01-20 00:00:00'),
unioned AS (
  SELECT *, 0 AS src FROM base UNION ALL SELECT *, 1 AS src FROM changes),
ranked AS (
  SELECT user_id, event_type, value, ts, event_id,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM unioned)
SELECT user_id,
       event_type AS last_event_type,
       value AS last_value,
       strftime(ts, '{TS_FMT_DUCK}') AS last_ts,
       event_id AS last_event_id
FROM ranked WHERE rn = 1
ORDER BY user_id
""",
)
def q52_cdc_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC snapshot upsert (the MERGE-INTO / latest-wins shape without
    a table format): merge a change stream into a per-key snapshot,
    keeping the newest row per key by (ts, event_id) — event_id breaks
    timestamp ties deterministically.

    Plan: union is free (no shuffle); one hash shuffle on user_id feeds
    the row_number window. At 100 TB the snapshot side is already
    bucketed by key, so only the (much smaller) change stream shuffles
    — the union+window shape is identical, the exchange is one-sided.
    Timestamps leave as formatted strings (cross-engine dtype rule)."""
    ev = load_table(spark, sf_dir, "events")
    cutoff = "2024-01-20 00:00:00"
    cols = ["user_id", "event_type", "value", "ts", "event_id"]
    base = ev.filter(F.col("ts") < cutoff).select(cols)
    changes = ev.filter(F.col("ts") >= cutoff).select(cols)
    w = W.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        base.unionAll(changes)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("last_event_type"),
            F.col("value").alias("last_value"),
            F.date_format("ts", TS_FMT_SPARK).alias("last_ts"),
            F.col("event_id").alias("last_event_id"),
        )
        .orderBy("user_id")
    )


@register(
    "q53_numeric_profile",
    tags=("agg", "profiling"),
    oracle="""
WITH long_form AS (
  SELECT 'l_quantity' AS col, l_quantity::DOUBLE AS x FROM lineitem
  UNION ALL
  SELECT 'l_extendedprice', l_extendedprice::DOUBLE FROM lineitem
  UNION ALL
  SELECT 'l_discount', l_discount::DOUBLE FROM lineitem),
stats AS (
  SELECT col, MIN(x) AS mn, MAX(x) AS mx FROM long_form GROUP BY col),
bucketed AS (
  SELECT l.col,
         CAST(LEAST(9, FLOOR(((x - mn) / (mx - mn)) * 10)) AS BIGINT) AS bucket
  FROM long_form l JOIN stats USING (col))
SELECT b.col AS col, bucket,
       ROUND(mn + bucket * ((mx - mn) / 10), 6) AS bucket_lo,
       CAST(COUNT(*) AS BIGINT) AS n
FROM bucketed b JOIN stats s ON b.col = s.col
GROUP BY b.col, bucket, mn, mx
ORDER BY b.col, bucket
""",
)
def q53_numeric_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data profiling: fixed-width 10-bucket histograms over numeric
    columns — the distribution fingerprint an ingestion pipeline
    records per batch to catch drift before training on it.

    Plan: one scan melts the columns to (col, value) long form via
    stack() — a narrow generator, no shuffle; per-column min/max is a
    6-row aggregate broadcast back; the bucket id is floor() over the
    identically-ordered IEEE expression in both engines (exact), so
    only bucket_lo needs display rounding. Everything else is integer
    counts. One shuffle total (the per-(col,bucket) count)."""
    li = load_table(spark, sf_dir, "lineitem")
    long_form = li.select(
        F.expr(
            "stack(3, 'l_quantity', CAST(l_quantity AS DOUBLE),"
            " 'l_extendedprice', CAST(l_extendedprice AS DOUBLE),"
            " 'l_discount', CAST(l_discount AS DOUBLE)) AS (col, x)"
        )
    )
    stats = long_form.groupBy("col").agg(
        F.min("x").alias("mn"), F.max("x").alias("mx")
    )
    bucketed = long_form.join(F.broadcast(stats), "col").select(
        "col",
        "mn",
        "mx",
        F.least(
            F.lit(9),
            F.floor(((F.col("x") - F.col("mn")) / (F.col("mx") - F.col("mn"))) * 10),
        )
        .cast("long")
        .alias("bucket"),
    )
    return (
        bucketed.groupBy("col", "bucket", "mn", "mx")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "col",
            "bucket",
            F.round(
                F.col("mn") + F.col("bucket") * ((F.col("mx") - F.col("mn")) / 10), 6
            ).alias("bucket_lo"),
            "n",
        )
        .orderBy("col", "bucket")
    )


# ---------------------------------------------------------------------------
# Group-share / max-by-group / distinct-count-with-exclusion shapes
# (TPC-H Q11 / Q15 / Q16 analogues on the available tables)
# ---------------------------------------------------------------------------


@register(
    "q54_nation_value_share",
    tags=("join", "agg", "subquery"),
    oracle="""
WITH v AS (
  SELECT n_name,
         SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS vdec
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  GROUP BY n_name),
tot AS (SELECT SUM(vdec) AS tot FROM v)
SELECT n_name, CAST(vdec AS DOUBLE) AS nation_value
FROM v CROSS JOIN tot
WHERE vdec * 20 > tot
""",
)
def q54_nation_value_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-group value vs a fraction of the global
    total (nations contributing > 5% of world revenue). The global
    total is a one-row aggregate broadcast back — the fact table is
    scanned and shuffled exactly once, to the per-nation grain.

    Determinism: both the per-nation values and the global total stay
    DECIMAL through the comparison (the total is the sum of the
    per-nation decimals — associative, order-independent), and the 5%
    threshold is applied as ``vdec * 20 > tot`` in exact integer-scaled
    decimal arithmetic; only the output casts to double."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    vdec = F.sum(
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    )
    per = (
        li.join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .groupBy("n_name")
        .agg(vdec.alias("vdec"))
    )
    tot = per.agg(F.sum("vdec").alias("tot"))
    return (
        per.crossJoin(F.broadcast(tot))
        .filter(F.col("vdec") * 20 > F.col("tot"))
        .select("n_name", F.col("vdec").cast("double").alias("nation_value"))
    )


@register(
    "q55_top_revenue_supplier",
    tags=("join", "agg", "subquery"),
    oracle="""
WITH rev AS (
  SELECT l_suppkey,
         SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS r
  FROM lineitem
  WHERE l_shipdate >= '1995-01-01' AND l_shipdate < '1996-01-01'
  GROUP BY l_suppkey),
mx AS (SELECT MAX(r) AS m FROM rev)
SELECT s_suppkey, s_name, CAST(r AS DOUBLE) AS total_revenue
FROM rev
JOIN supplier ON s_suppkey = l_suppkey
CROSS JOIN mx
WHERE r = m
""",
)
def q55_top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: revenue per supplier over a year, keep the
    max-revenue supplier(s) — ties preserved, which is why the compare
    must be exact: revenue stays DECIMAL through the MAX and the
    equality, so a tie is a true tie in both engines (a double
    accumulation could break a tie differently per engine). The
    supplier dim rides a broadcast; the max is a one-row broadcast
    back onto the per-supplier aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= "1995-01-01") & (F.col("l_shipdate") < "1996-01-01")
        )
        .groupBy("l_suppkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            ).alias("r")
        )
    )
    mx = rev.agg(F.max("r").alias("m"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("r") == F.col("m"))
        .join(F.broadcast(s), rev["l_suppkey"] == s["s_suppkey"])
        .select("s_suppkey", "s_name", F.col("r").cast("double").alias("total_revenue"))
    )


@register(
    "q56_supplier_variety",
    tags=("join", "agg", "subquery"),
    oracle="""
SELECT p_brand, p_type, p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1'
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
""",
)
def q56_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per part descriptor
    with a NOT IN exclusion subquery (suppliers with negative balance
    stand in for Q16's complaint filter). The exclusion is a left-anti
    join against a broadcast-sized dim; the distinct count shuffles
    (part-desc, suppkey) pairs once — no second shuffle for the
    distinct because Catalyst plans partial de-dup map-side."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") != "Brand#1").select(
        "p_partkey", "p_brand", "p_type", "p_size"
    )
    excluded = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(excluded), li["l_suppkey"] == excluded["s_suppkey"], "left_anti")
        .join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q57_daily_gap_fill",
    tags=("time", "join"),
    oracle="""
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1),
bounds AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM daily),
spine AS (
  SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
  FROM bounds)
SELECT strftime(s.day, '%Y-%m-%d') AS day, COALESCE(d.n, 0) AS n_events
FROM spine s LEFT JOIN daily d USING (day)
""",
)
def q57_daily_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap fill over a generated date spine: daily event
    counts with zero rows materialized for days that recorded nothing —
    the completeness guarantee downstream forecasting/monitoring needs
    (a missing day is silently absent from a plain groupBy).

    The spine is sequence(min_day, max_day) exploded from a one-row
    bounds aggregate — O(days); the event table shuffles once to the
    daily grain, after which BOTH sides are day-grain tiny at any
    corpus scale, so the fill join broadcasts the RIGHT (daily) side. Hinting the spine
    was a dead hint (round-14 VERDICT #6): a left-outer join can only
    build on the non-preserved side, so HintErrorLogger warned and
    the hint was dropped — the preserved side must stream. Dates are
    NTZ-derived (tz-proof) and output as strings (registry timestamp
    rule)."""
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.groupBy(F.to_date(F.date_trunc("day", F.col("ts"))).alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    bounds = daily.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 day"))).alias("day")
    )
    return (
        spine.join(F.broadcast(daily), "day", "left")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce("n", F.lit(0)).alias("n_events"),
        )
    )


@register(
    "q58_volume_shipping",
    bench=True,
    tags=("join", "agg"),
    oracle="""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(EXTRACT(YEAR FROM l_shipdate) AS INTEGER) AS l_year,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
         AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
  AND l_shipdate >= '1995-01-01' AND l_shipdate < '1997-01-01'
GROUP BY n1.n_name, n2.n_name, l_year
""",
)
def q58_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping): revenue flowing between a
    nation pair, in both directions, by ship year.

    Scale shape: the nation filter is applied to the *dimension* sides
    before the fact joins — supplier and customer are each pre-filtered
    to one nation's keys via a broadcast nation lookup, so at 100 TB
    the expensive lineitem⋈orders shuffle join runs on the
    already-nation-restricted slice (Catalyst pushes the semi-like
    restriction through the joins; the shipdate range prunes the scan).
    lineitem⋈orders is the only fact-fact shuffle; supplier/customer
    joins are AQE-broadcastable at small SF and plain hash joins on the
    filtered slice beyond that."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1995-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    c = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            )
            .cast("double")
            .alias("revenue")
        )
    )


@register(
    "q59_market_share",
    tags=("join", "agg", "conditional"),
    oracle="""
WITH vol AS (
  SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS o_year,
         CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) AS v,
         n1.n_name AS supp_nation
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  JOIN region ON n2.n_regionkey = r_regionkey
  WHERE r_name = 'ASIA' AND p_type = 'PROMO'
    AND o_orderdate >= '1995-01-01' AND o_orderdate < '1997-01-01')
SELECT o_year,
       ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN v ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
             / CAST(SUM(v) AS DOUBLE), 6) AS mkt_share
FROM vol GROUP BY o_year
""",
)
def q59_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): one nation's share of
    PROMO-part revenue sold into ASIA, by order year.

    Scale shape: part/supplier/nation/region restrictions all ride
    broadcast dimension joins applied before (part: to prune lineitem
    rows early) or after (supplier: only tags the surviving rows with
    supp_nation) the single fact-fact lineitem⋈orders shuffle. The
    share is a conditional aggregate over one pass — numerator and
    denominator accumulate as exact DECIMAL in the same groupBy, so
    the division is a deterministic double ratio, rounded to 6
    (registry float rule)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia_cust = (
        load_table(spark, sf_dir, "customer")
        .join(
            F.broadcast(
                n.join(
                    F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
                ).select("n_nationkey")
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey")
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(n.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    v = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    zero = F.lit(0).cast("decimal(18,4)")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(asia_cust, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_3", v).otherwise(zero)
                ).cast("double")
                / F.sum(v).cast("double"),
                6,
            ).alias("mkt_share")
        )
    )


@register(
    "q60_product_profit",
    tags=("join", "agg"),
    oracle="""
SELECT n_name AS nation,
       CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS o_year,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                     - p_retailprice * 0.1 * l_quantity AS DECIMAL(18,4))) AS DOUBLE)
         AS profit
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY n_name, o_year
""",
)
def q60_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit): profit on a name-matched
    part family by supplier nation and order year. The reference
    schema has no partsupp, so supply cost is modeled as 10% of
    p_retailprice — the plan shape (5-way join, LIKE-filtered part
    dim driving the fact scan) is what's under test.

    Scale shape: part is filtered by the LIKE *before* its broadcast
    join, so the fact rows that survive are pruned at the first join;
    lineitem⋈orders is the lone fact-fact shuffle. Profit accumulates
    as exact DECIMAL per (nation, year) — order-independent — and
    casts to double only at output."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%widget%"))
        .select("p_partkey", "p_retailprice")
    )
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * 0.1 * F.col("l_quantity")
    ).cast("decimal(18,4)")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(profit).cast("double").alias("profit"))
    )


@register(
    "q61_returned_items",
    tags=("join", "agg", "topk"),
    oracle="""
SELECT c_custkey, c_name, n_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
         AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= '1995-01-01' AND o_orderdate < '1995-07-01'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def q61_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (returned-item reporting): top-20 customers by
    revenue lost to returns in a half-year window.

    Scale shape: the returnflag predicate and the orderdate range are
    both pushed into their respective parquet scans before the single
    lineitem⋈orders shuffle; customer enrichment joins after the
    per-customer aggregate (aggregate-then-join: the join input is one
    row per customer, not one per lineitem). Top-20 plans as
    TakeOrderedAndProject — no global sort. Revenue is an exact
    DECIMAL sum; the DESC order ties break on c_custkey (registry
    tiebreaker rule)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") < "1995-07-01")
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    per_cust = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            ).alias("rev_dec")
        )
    )
    return (
        per_cust.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            F.col("rev_dec").cast("double").alias("revenue"),
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "q62_promo_revenue",
    tags=("join", "agg", "conditional"),
    oracle="""
SELECT strftime(date_trunc('month', l_shipdate), '%Y-%m') AS ship_month,
       ROUND(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                      THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
                      ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
             / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE),
             6) AS promo_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= '1995-01-01' AND l_shipdate < '1996-01-01'
GROUP BY ship_month
""",
)
def q62_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (promotion effect): percentage of monthly
    revenue attributable to PROMO-type parts.

    Scale shape: one broadcast part join tags each lineitem with its
    type; numerator and denominator are conditional DECIMAL sums in
    the same single-shuffle groupBy (never two scans), divided in
    double and rounded to 6 (registry float rule). The shipdate year
    prunes the scan."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1995-01-01") & (F.col("l_shipdate") < "1996-01-01")
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    v = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    zero = F.lit(0).cast("decimal(18,4)")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"))
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", v).otherwise(zero)).cast(
                    "double"
                )
                / F.sum(v).cast("double"),
                6,
            ).alias("promo_pct")
        )
    )


@register(
    "q63_disjunctive_revenue",
    tags=("join", "filter", "agg"),
    oracle="""
SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
         AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
""",
)
def q63_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue, disjunctive predicates):
    an OR-of-ANDs predicate spanning both join sides — the classic
    test that the optimizer still derives the pushable parts.

    Scale shape: Catalyst extracts the common sub-predicates — the
    brand IN-list pushes to the part scan and the overall quantity
    envelope (1..30) pushes to the lineitem scan — before the
    broadcast join applies the exact disjunction; verified in
    tests/test_plan_shapes. Single scalar output row, exact DECIMAL
    accumulation."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q64_cheapest_supplier",
    tags=("join", "subquery", "topk"),
    oracle="""
WITH cost AS (
  SELECT l_partkey, l_suppkey,
         MIN(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem GROUP BY l_partkey, l_suppkey),
best AS (
  SELECT l_partkey, MIN(unit_cost) AS min_cost FROM cost GROUP BY l_partkey)
SELECT s_acctbal, s_name, n_name, p_partkey, ROUND(c.unit_cost, 6) AS unit_cost
FROM cost c
JOIN best b ON c.l_partkey = b.l_partkey AND c.unit_cost = b.min_cost
JOIN part ON p_partkey = c.l_partkey
JOIN supplier ON s_suppkey = c.l_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE p_size <= 25 AND p_type = 'SMALL' AND r_name = 'EUROPE'
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 20
""",
)
def q64_cheapest_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier): per part, the
    supplier(s) achieving the minimum observed unit cost, restricted
    to a part family and a region. The reference schema has no
    partsupp, so unit cost is derived from lineitem as
    min(extendedprice/quantity) per (part, supplier) — same
    correlated-min plan shape.

    Scale shape: the correlated scalar subquery becomes two
    aggregates over the SAME (l_partkey, l_suppkey) shuffle — the
    per-part min reuses the first aggregate's output (tiny: one row
    per part-supplier pair), then an equi-join on (partkey, cost)
    picks the argmin rows. MIN over doubles is order-independent
    (no accumulation), so the cost equality is exact in both
    engines; the round(6) happens only at output. Dimension filters
    (part family, EUROPE) ride broadcast joins."""
    li = load_table(spark, sf_dir, "lineitem")
    p = (
        load_table(spark, sf_dir, "part")
        .filter((F.col("p_size") <= 25) & (F.col("p_type") == "SMALL"))
        .select("p_partkey")
    )
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                n.join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
                .select("n_nationkey", "n_name")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cost = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    best = cost.groupBy(F.col("l_partkey").alias("b_partkey")).agg(
        F.min("unit_cost").alias("min_cost")
    )
    return (
        cost.join(
            best,
            (F.col("l_partkey") == F.col("b_partkey"))
            & (F.col("unit_cost") == F.col("min_cost")),
        )
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            F.col("l_partkey").alias("p_partkey"),
            F.round("unit_cost", 6).alias("unit_cost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(20)
    )


@register(
    "q65_excess_shippers",
    tags=("join", "subquery", "semi"),
    oracle="""
WITH promo_parts AS (SELECT p_partkey FROM part WHERE p_type = 'PROMO'),
shipped AS (
  SELECT l_suppkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
  FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM promo_parts)
    AND l_shipdate >= '1995-01-01' AND l_shipdate < '1996-01-01'
  GROUP BY l_suppkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 500)
SELECT s_suppkey, s_name, n_name, qty AS promo_qty
FROM supplier
JOIN shipped ON s_suppkey = l_suppkey
JOIN nation ON s_nationkey = n_nationkey
ORDER BY s_suppkey
""",
)
def q65_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (excess-inventory suppliers): suppliers who
    shipped more than a threshold quantity of a part family inside a
    year — the nested semi-join chain (parts → qualifying shipments →
    suppliers).

    Scale shape: the part family is a broadcast semi-join pruning
    lineitem before its only shuffle (to l_suppkey grain); the HAVING
    applies post-aggregate where the relation is already one row per
    supplier; the supplier join input is that tiny qualifying set.
    Quantity sums accumulate as exact DECIMAL (order-independent) so
    the > threshold cut is identical in both engines."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1995-01-01") & (F.col("l_shipdate") < "1996-01-01")
    )
    promo = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    shipped = (
        li.join(F.broadcast(promo), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty_dec"))
        .filter(F.col("qty_dec") > 500)
    )
    return (
        s.join(shipped, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "s_suppkey",
            "s_name",
            "n_name",
            F.col("qty_dec").cast("double").alias("promo_qty"),
        )
        .orderBy("s_suppkey")
    )


@register(
    "q66_large_volume_orders",
    tags=("join", "agg", "subquery", "topk"),
    oracle="""
WITH big AS (
  SELECT l_orderkey,
         SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qdec
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150),
sel AS (
  SELECT c_custkey, c_name, o_orderkey,
         strftime(o_orderdate, '%Y-%m-%d') AS o_date,
         o_totalprice, CAST(qdec AS DOUBLE) AS total_qty
  FROM big
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON o_custkey = c_custkey)
SELECT * FROM sel ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
""",
)
def q66_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume customers): orders whose total
    line quantity exceeds a threshold, enriched with the customer and
    ranked by order value.

    Scale shape: the qualifying set comes from ONE lineitem aggregate
    to order grain (Catalyst plans partial map-side sums, so the
    shuffle carries per-order partials); the HAVING reduces it to a
    small relation BEFORE the orders/customer joins — the classic
    aggregate-then-join inversion of Q18's IN-subquery phrasing.
    Top-20 plans as TakeOrderedAndProject. Quantity sums accumulate
    as exact DECIMAL so the threshold cut is engine-identical."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qdec"))
        .filter(F.col("qdec") > 150)
    )
    return (
        big.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_date"),
            "o_totalprice",
            F.col("qdec").cast("double").alias("total_qty"),
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(20)
    )


@register(
    "q67_customer_distribution",
    tags=("join", "agg", "outer"),
    oracle="""
WITH per_cust AS (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey)
SELECT CAST(c_count AS BIGINT) AS c_count,
       COUNT(*) AS custdist
FROM per_cust
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
)
def q67_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (customer order-count distribution): a LEFT
    OUTER join with a join-side (not WHERE-side) predicate on the
    right input — customers with zero qualifying orders must survive
    with c_count = 0 — followed by a second aggregation over the
    first's result (a count-of-counts histogram).

    Scale shape: the filter on orders is pushed below the join (it
    prunes the probe side before the exchange, NOT after — a WHERE
    would wrongly drop order-less customers). Both aggregations are
    hash aggregates with map-side partials; the second one's input is
    |customers| rows of two ints, and its output is tiny. COUNT of a
    possibly-null column (o_orderkey) counts only matches, which is
    what makes the outer join + COUNT idiom correct."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderpriority"
    ).filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "q68_event_cooccurrence",
    tags=("agg", "array", "basket"),
    oracle="""
WITH b AS (
  SELECT user_id, strftime(ts, '%Y-%m-%d') AS day,
         list_sort(list_distinct(list(event_type))) AS types
  FROM events GROUP BY user_id, strftime(ts, '%Y-%m-%d')),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_baskets FROM b),
p AS (
  SELECT types[i] AS a, types[j] AS b
  FROM b,
       LATERAL (SELECT unnest(generate_series(1, len(types))) AS i) gi,
       LATERAL (SELECT unnest(generate_series(1, len(types))) AS j) gj
  WHERE i < j),
pair_counts AS (
  SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n_ab FROM p GROUP BY a, b),
singles AS (
  SELECT t AS typ, CAST(COUNT(*) AS BIGINT) AS n_t FROM (
    SELECT unnest(types) AS t FROM b) u GROUP BY t)
SELECT pc.a, pc.b, pc.n_ab, sa.n_t AS n_a, sb.n_t AS n_b,
       ROUND(CAST(pc.n_ab * tot.n_baskets AS DOUBLE) / (sa.n_t * sb.n_t), 6)
         AS lift
FROM pair_counts pc
JOIN singles sa ON pc.a = sa.typ
JOIN singles sb ON pc.b = sb.typ
CROSS JOIN tot
""",
)
def q68_event_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence with lift: which event types happen
    together within a (user, day) basket more than chance predicts —
    the association-mining shape behind recommendation and
    funnel-anomaly analysis.

    Scale shape: pair generation is SELF-JOIN-FREE — each basket's
    sorted distinct type array emits its own ordered pairs via a
    nested array transform (narrow, bounded by |types|² per basket,
    tiny for categorical domains), so the only exchanges are the
    basket aggregation and the small pair/single counts. The
    alternative (event-table self-join on user-day) shuffles the fact
    twice and explodes on hot users; this never does. Lift is an
    exact-integer ratio (n_ab·N / n_a·n_b) in one rounded division."""
    e = load_table(spark, sf_dir, "events")
    baskets = (
        e.groupBy("user_id", F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(F.array_sort(F.collect_set("event_type")).alias("types"))
    )
    tot = baskets.agg(F.count(F.lit(1)).alias("n_baskets"))
    pairs_expr = F.flatten(
        F.transform(
            F.col("types"),
            lambda x, i: F.transform(
                F.slice(
                    F.col("types"), i + F.lit(2), F.size(F.col("types"))
                ),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    pair_counts = (
        baskets.select(F.explode(pairs_expr).alias("p"))
        .select("p.a", "p.b")
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    singles = (
        baskets.select(F.explode("types").alias("typ"))
        .groupBy("typ")
        .agg(F.count(F.lit(1)).alias("n_t"))
    )
    sa = singles.select(F.col("typ").alias("a"), F.col("n_t").alias("n_a"))
    sb = singles.select(F.col("typ").alias("b"), F.col("n_t").alias("n_b"))
    return (
        pair_counts.join(F.broadcast(sa), "a")
        .join(F.broadcast(sb), "b")
        .crossJoin(F.broadcast(tot))
        .select(
            "a",
            "b",
            "n_ab",
            "n_a",
            "n_b",
            F.round(
                (F.col("n_ab") * F.col("n_baskets")).cast("double")
                / (F.col("n_a") * F.col("n_b")),
                6,
            ).alias("lift"),
        )
    )


# ---------------------------------------------------------------------------
# q69: trailing-window EWMA smoothing (time-series analytics)
# ---------------------------------------------------------------------------

EWMA_ALPHA = 0.3
EWMA_W = 20  # trailing window length — bounds per-row state AND keeps
#              the (1-α)^k weights representable at any stream length
_EWMA_WEIGHTS = [round((1 - EWMA_ALPHA) ** k, 6) for k in range(EWMA_W)]


def _q69_oracle() -> str:
    warr = "[" + ", ".join(repr(w) for w in _EWMA_WEIGHTS) + "]"
    return f"""
WITH framed AS (
  SELECT event_id, user_id, value,
         list_reverse(list(value) OVER (PARTITION BY user_id
           ORDER BY ts, event_id
           ROWS BETWEEN {EWMA_W - 1} PRECEDING AND CURRENT ROW)) AS rarr
  FROM events)
SELECT event_id, user_id, value,
       CAST(len(rarr) AS BIGINT) AS n_window,
       ROUND(
         CAST(list_sum(list_transform(rarr,
           (x, i) -> CAST(ROUND(x * ({warr})[i] * 1000000) AS BIGINT))) AS BIGINT)
         / CAST(list_sum(list_transform(rarr,
           (x, i) -> CAST(ROUND(({warr})[i] * 1000000) AS BIGINT))) AS BIGINT),
         4) AS ewma
FROM framed
"""


@register(
    "q69_ewma_smoothing",
    tags=("window", "timeseries"),
    oracle=_q69_oracle(),
)
def q69_ewma_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window exponentially-weighted moving average per user
    (§2.6 analytic-window extension — the smoothing pass behind
    anomaly thresholds and rate dashboards): for each event, the
    EWMA of the user's last EWMA_W values with weights (1-α)^k.

    The window is deliberately TRAILING-BOUNDED, not
    since-start-of-stream: an unbounded adjusted EWMA needs
    (1-α)^(-t) terms that overflow doubles after a few thousand
    events per key, so the bounded form is what survives at stream
    scale — per-row state is a fixed W values (the same reasoning as
    W5's bounded keyed state), and weights are plan literals shared
    verbatim with the oracle (no cross-engine pow() drift).

    Determinism: every product rounds to integer micro-units before
    the fold; numerator and denominator are exact integers, the final
    division is one IEEE op rounded to 4dp.

    Scale shape: ONE exchange on user_id for the window sort; the
    weighted fold is a codegen'd array expression over the frame —
    no self-join against W shifted copies (the naive lag-chain
    formulation), no UDF."""
    from pyspark.sql import Window as W

    warr = "array({})".format(", ".join(repr(w) for w in _EWMA_WEIGHTS))
    e = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(EWMA_W - 1), 0)
    )
    framed = e.select(
        "event_id",
        "user_id",
        "value",
        F.reverse(F.collect_list("value").over(w)).alias("rarr"),
    )
    num = (
        f"aggregate(transform(rarr, (x, i) -> cast(round(x * element_at({warr},"
        " i + 1) * 1000000) as bigint)), cast(0 as bigint), (a, t) -> a + t)"
    )
    den = (
        f"aggregate(transform(rarr, (x, i) -> cast(round(element_at({warr},"
        " i + 1) * 1000000) as bigint)), cast(0 as bigint), (a, t) -> a + t)"
    )
    return framed.select(
        "event_id",
        "user_id",
        "value",
        F.size("rarr").cast("long").alias("n_window"),
        F.round(F.expr(num) / F.expr(den), 4).alias("ewma"),
    )


# ---------------------------------------------------------------------------
# q70: as-of join with staleness tolerance (J5 variant)
# ---------------------------------------------------------------------------

ASOF_TOLERANCE_S = 3600  # match only clicks within 1h before the purchase


@register(
    "q70_asof_tolerance",
    tags=("join", "asof"),
    oracle=f"""
SELECT p.event_id, p.user_id,
       strftime(p.ts, '{TS_US_FMT_DUCK}') AS purchase_ts,
       CASE WHEN c.ts IS NOT NULL AND p.ts - c.ts <= INTERVAL {ASOF_TOLERANCE_S} SECOND
            THEN strftime(c.ts, '{TS_US_FMT_DUCK}') END AS click_ts,
       CASE WHEN c.ts IS NOT NULL AND p.ts - c.ts <= INTERVAL {ASOF_TOLERANCE_S} SECOND
            THEN (epoch_us(p.ts) - epoch_us(c.ts)) // 1000000 END AS gap_seconds
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
""",
)
def q70_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tolerance-bounded as-of join (J5 variant — pd.merge_asof's
    ``tolerance`` contract): each purchase matches the user's most
    recent click, but only if it happened within the last hour;
    staler matches become NULLs while the purchase row survives.
    The attribution-window join every funnel/ads pipeline runs.

    Times convert to epoch MICROSECONDS before the join (tz-independent
    integers; the same reasoning as tables.py's NTZ normalization), so
    the staleness gate is integer arithmetic — no interval types cross
    the engine boundary.

    Scale shape (100 TB): same single-shuffle union+window dataflow as
    q25 (operators/asof.py) — both sides exchange ONCE on user_id and
    the as-of pick is a running window, never a range join; the
    tolerance adds a per-row comparison, not a second join, so the
    plan is identical to plain as-of at any data size."""
    from event_stream_aggr_spark.operators.asof import asof_join

    e = load_table(spark, sf_dir, "events")
    # NTZ-only arithmetic: unix_micros(cast ts as timestamp) would
    # re-interpret the wall clock in the SESSION timezone (the
    # hostile-tz trap the verify recipe probes); timestampdiff against
    # the NTZ epoch never consults the session zone
    tsm = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", tsm.alias("tsm")
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", tsm.alias("click_tsm")
    )
    joined = asof_join(
        purchases,
        clicks,
        on=["user_id"],
        left_ts="tsm",
        right_ts="click_tsm",
        right_cols=["click_tsm"],
        tolerance=ASOF_TOLERANCE_S * 1_000_000,
    )
    to_ts = (
        lambda c: F.expr(
            f"timestampadd(MICROSECOND, {c}, TIMESTAMP_NTZ '1970-01-01 00:00:00')"
        )
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format(to_ts("tsm"), TS_US_FMT_SPARK).alias("purchase_ts"),
        F.date_format(to_ts("click_tsm"), TS_US_FMT_SPARK).alias("click_ts"),
        F.expr("(tsm - click_tsm) div 1000000").alias("gap_seconds"),
    )


# ---------------------------------------------------------------------------
# q72: rolling exact median (robust trailing-window statistic)
# ---------------------------------------------------------------------------

MED_W = 10  # trailing window length


@register(
    "q72_rolling_median",
    tags=("window", "timeseries"),
    oracle=f"""
WITH framed AS (
  SELECT event_id, user_id, value,
         list_sort(list(value) OVER (PARTITION BY user_id
           ORDER BY ts, event_id
           ROWS BETWEEN {MED_W - 1} PRECEDING AND CURRENT ROW)) AS arr
  FROM events)
SELECT event_id, user_id, value,
       CAST(len(arr) AS BIGINT) AS n_window,
       ROUND(CASE WHEN len(arr) % 2 = 1 THEN arr[(len(arr) + 1) // 2]
                  ELSE (arr[len(arr) // 2] + arr[len(arr) // 2 + 1]) / 2
             END, 4) AS rolling_median
FROM framed
""",
)
def q72_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling EXACT median per user (q69's robust sibling — the
    outlier-insensitive trailing statistic behind spike detectors and
    SLO dashboards): median of the user's last MED_W values.

    Exactness: the frame's values sort as an array and the median is
    pure element selection (+ one exact halving for even windows) —
    no approx sketch, no interpolation ambiguity, bit-identical
    cross-engine. Bounded trailing window = bounded per-row state,
    same scale reasoning as q69.

    Scale shape: ONE exchange on user_id; the per-row sort is O(W log
    W) on a constant W inside codegen'd array expressions — the naive
    alternative (a lateral re-aggregation per row) re-shuffles the
    stream W times."""
    from pyspark.sql import Window as W

    e = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(MED_W - 1), 0)
    )
    framed = e.select(
        "event_id",
        "user_id",
        "value",
        F.array_sort(F.collect_list("value").over(w)).alias("arr"),
    )
    s = F.size("arr")
    med = F.when(
        s % 2 == 1, F.element_at("arr", ((s + 1) / 2).cast("int"))
    ).otherwise(
        (
            F.element_at("arr", (s / 2).cast("int"))
            + F.element_at("arr", (s / 2).cast("int") + 1)
        )
        / 2
    )
    return framed.select(
        "event_id",
        "user_id",
        "value",
        s.cast("long").alias("n_window"),
        F.round(med, 4).alias("rolling_median"),
    )


# ---------------------------------------------------------------------------
# q73: sliding-window aggregation, batch form (6h window, 1h slide)
# ---------------------------------------------------------------------------

SLIDE_WINDOW_HOURS = 6


@register(
    "q73_sliding_distinct",
    tags=("window", "aggregation", "scale"),
    oracle=f"""
WITH ev AS (
  SELECT user_id, epoch_us(ts) // 1000000 // 3600 AS hnum FROM events),
hourly_users AS (SELECT DISTINCT hnum, user_id FROM ev),
hourly_counts AS (SELECT hnum, CAST(COUNT(*) AS BIGINT) AS n FROM ev GROUP BY hnum),
wu AS (
  SELECT hu.hnum - g.g AS w, hu.user_id
  FROM hourly_users hu,
       LATERAL (SELECT unnest(generate_series(0, {SLIDE_WINDOW_HOURS - 1})) AS g) g),
wc AS (
  SELECT hc.hnum - g.g AS w, hc.n
  FROM hourly_counts hc,
       LATERAL (SELECT unnest(generate_series(0, {SLIDE_WINDOW_HOURS - 1})) AS g) g),
users_per_w AS (
  SELECT w, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
  FROM wu GROUP BY w),
events_per_w AS (SELECT w, CAST(SUM(n) AS BIGINT) AS n_events FROM wc GROUP BY w)
SELECT strftime(to_timestamp(u.w * 3600), '%Y-%m-%d %H:%M:%S') AS window_start,
       e.n_events, u.n_users
FROM users_per_w u JOIN events_per_w e USING (w)
""",
)
def q73_sliding_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window aggregation in batch (6 h window, 1 h slide):
    per window, event count and EXACT distinct users — the batch twin
    of streaming W2's sliding window, including the overlap semantics
    (every event belongs to 6 windows).

    Scale shape: the window-membership explode runs on PRE-AGGREGATED
    hourly relations, not raw events — raw events reduce once to
    (hour, user) distinct pairs and (hour) counts, then the 6×
    replication touches only those far smaller relations; counts merge
    as sums (mergeable partials, qi01's monoid), while distinct-users
    stays exact because distinct-over-window == distinct over the
    hour-grain pairs. Exploding raw events 6× (the naive phrasing) or
    a |windows|×|events| range join would both be strictly worse; an
    HLL-sketch merge (q29's path) is the approximate alternative when
    even |users|·|hours| pairs are too much state.
    """
    e = load_table(spark, sf_dir, "events")
    hnum = F.expr(
        "timestampdiff(HOUR, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    ).alias("hnum")
    ev = e.select(hnum, "user_id")
    offsets = F.explode(F.sequence(F.lit(0), F.lit(SLIDE_WINDOW_HOURS - 1))).alias("g")
    hourly_users = ev.distinct()
    hourly_counts = ev.groupBy("hnum").agg(F.count(F.lit(1)).alias("n"))
    users_per_w = (
        hourly_users.select("hnum", "user_id", offsets)
        .select((F.col("hnum") - F.col("g")).alias("w"), "user_id")
        .groupBy("w")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )
    events_per_w = (
        hourly_counts.select("hnum", "n", offsets)
        .select((F.col("hnum") - F.col("g")).alias("w"), "n")
        .groupBy("w")
        .agg(F.sum("n").alias("n_events"))
    )
    return users_per_w.join(events_per_w, "w").select(
        F.date_format(
            F.expr("timestampadd(HOUR, w, TIMESTAMP_NTZ '1970-01-01 00:00:00')"),
            "yyyy-MM-dd HH:mm:ss",
        ).alias("window_start"),
        "n_events",
        "n_users",
    )


# ---------------------------------------------------------------------------
# q74: CEP pattern match with time bound and negation
# ---------------------------------------------------------------------------

CEP_WINDOW_S = 1800  # pattern window: click within 30 min before purchase


@register(
    "q74_cep_match",
    bench=True,
    tags=("sequence", "window", "cep"),
    oracle=f"""
WITH ev AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS tsm FROM events),
p AS (SELECT * FROM ev WHERE event_type = 'purchase'),
m AS (
  SELECT p.user_id, p.event_id, p.tsm,
         (SELECT MAX(c.tsm) FROM ev c
          WHERE c.user_id = p.user_id AND c.event_type = 'click'
            AND c.tsm >= p.tsm - {CEP_WINDOW_S * 1_000_000} AND c.tsm < p.tsm)
           AS ctsm,
         (SELECT MAX(x.tsm) FROM ev x
          WHERE x.user_id = p.user_id AND x.event_type = 'error'
            AND x.tsm >= p.tsm - {CEP_WINDOW_S * 1_000_000} AND x.tsm < p.tsm)
           AS etsm
  FROM p)
SELECT user_id, event_id,
       strftime(make_timestamp(ctsm), '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
       strftime(make_timestamp(tsm), '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
       (tsm - ctsm) // 1000000 AS gap_seconds
FROM m WHERE ctsm IS NOT NULL AND (etsm IS NULL OR etsm < ctsm)
""",
)
def q74_cep_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complex-event-processing pattern match (the MATCH_RECOGNIZE /
    Flink-CEP shape q48's whole-user funnel does NOT cover): every
    purchase preceded by a click within 30 minutes with NO error
    between them — per-OCCURRENCE matches, a bounded time window, and
    a negation term.

    Scale shape: ONE user-partitioned pass. A RANGE frame over epoch
    micros ([-30 min, -1 µs]) folds, per purchase row, the latest
    qualifying click timestamp and the latest error timestamp in the
    same window; the negation is then just `latest_error < chosen
    click` — no self-join, no per-pattern-stage pass, bounded per-user
    state (the frame), and tie-safe because RANGE frames are defined
    by timestamp values, never by sort position of equal keys.
    Dedicated CEP engines compile patterns to exactly this kind of
    ordered per-key scan; here the window machinery is the NFA.
    """
    e = load_table(spark, sf_dir, "events")
    tsm = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    ev = e.select("user_id", "event_id", "event_type", tsm.alias("tsm"))
    w = (
        W.partitionBy("user_id")
        .orderBy("tsm")
        .rangeBetween(-CEP_WINDOW_S * 1_000_000, -1)
    )
    scanned = ev.select(
        "user_id",
        "event_id",
        "event_type",
        "tsm",
        F.max(F.when(F.col("event_type") == "click", F.col("tsm"))).over(w).alias("ctsm"),
        F.max(F.when(F.col("event_type") == "error", F.col("tsm"))).over(w).alias("etsm"),
    )
    to_ts = lambda c: F.expr(  # noqa: E731
        f"timestampadd(MICROSECOND, {c}, TIMESTAMP_NTZ '1970-01-01 00:00:00')"
    )
    return (
        scanned.where(
            (F.col("event_type") == "purchase")
            & F.col("ctsm").isNotNull()
            & (F.col("etsm").isNull() | (F.col("etsm") < F.col("ctsm")))
        )
        .select(
            "user_id",
            "event_id",
            F.date_format(to_ts("ctsm"), TS_US_FMT_SPARK).alias("click_ts"),
            F.date_format(to_ts("tsm"), TS_US_FMT_SPARK).alias("purchase_ts"),
            F.expr("(tsm - ctsm) div 1000000").alias("gap_seconds"),
        )
    )


# ---------------------------------------------------------------------------
# q75: multi-touch attribution (linear credit, window-local, no join)
# ---------------------------------------------------------------------------


@register(
    "q75_attribution",
    tags=("sequence", "window", "attribution"),
    oracle=f"""
WITH ev AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS tsm FROM events),
n_clicks AS (
  SELECT user_id, event_id, event_type, tsm,
         COUNT(*) FILTER (WHERE event_type = 'click') OVER (
           PARTITION BY user_id ORDER BY tsm
           RANGE BETWEEN {CEP_WINDOW_S * 1_000_000} PRECEDING AND 1 PRECEDING)
           AS nc
  FROM ev),
credited AS (
  SELECT user_id, event_id, event_type, tsm,
         CASE WHEN event_type = 'purchase' AND nc > 0
              THEN CAST(ROUND(1000000.0 / nc) AS BIGINT) ELSE 0 END AS ppm
  FROM n_clicks),
windowed AS (
  SELECT user_id, event_id, event_type,
         CAST(COALESCE(SUM(ppm) OVER (
           PARTITION BY user_id ORDER BY tsm
           RANGE BETWEEN 1 FOLLOWING AND {CEP_WINDOW_S * 1_000_000} FOLLOWING), 0)
           AS BIGINT) AS credit_ppm
  FROM credited)
SELECT user_id, event_id, credit_ppm,
       ROUND(credit_ppm / 1000000.0, 6) AS credit
FROM windowed WHERE event_type = 'click' AND credit_ppm > 0
""",
)
def q75_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution — q70's last-touch generalized:
    every purchase splits one unit of credit equally across ALL of
    the user's clicks in the preceding 30 minutes, and each click
    reports its accumulated credit. The marketing-analytics join that
    usually explodes (clicks × purchases range join) computed with NO
    join at all.

    Scale shape: two RANGE-frame passes over ONE user-partitioned
    sort — pass 1 gives each purchase its in-window click count
    (backward frame), pass 2 gives each click the sum of purchase
    credit shares in its forward window (forward frame over the SAME
    partitioning, so Catalyst plans one Exchange + one Sort for both).
    Credits are integer parts-per-million (round(1e6/n)), so the
    accumulated sums are exact integers — frame-order independent and
    bit-identical cross-engine; the double form is derived at output.
    """
    tsm = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", tsm.alias("tsm")
    )
    back = (
        W.partitionBy("user_id")
        .orderBy("tsm")
        .rangeBetween(-CEP_WINDOW_S * 1_000_000, -1)
    )
    fwd = (
        W.partitionBy("user_id")
        .orderBy("tsm")
        .rangeBetween(1, CEP_WINDOW_S * 1_000_000)
    )
    nc = F.count(F.when(F.col("event_type") == "click", 1)).over(back)
    credited = e.withColumn(
        "ppm",
        F.when(
            (F.col("event_type") == "purchase") & (nc > 0),
            F.round(1000000.0 / nc).cast("long"),
        ).otherwise(F.lit(0)),
    )
    clicks = credited.withColumn(
        "credit_ppm", F.coalesce(F.sum("ppm").over(fwd), F.lit(0))
    ).where((F.col("event_type") == "click") & (F.col("credit_ppm") > 0))
    return clicks.select(
        "user_id",
        "event_id",
        "credit_ppm",
        F.round(F.col("credit_ppm") / 1000000.0, 6).alias("credit"),
    )


# ---------------------------------------------------------------------------
# q77: cohort retention analysis
# ---------------------------------------------------------------------------


@register(
    "q77_cohort_retention",
    tags=("aggregation", "window", "product-analytics"),
    oracle="""
WITH act AS (
  SELECT DISTINCT user_id,
         CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7
              AS BIGINT) AS wk
  FROM events),
cohort AS (SELECT user_id, MIN(wk) AS cwk FROM act GROUP BY user_id),
joined AS (
  SELECT c.cwk, a.wk - c.cwk AS offs, a.user_id
  FROM act a JOIN cohort c USING (user_id)),
counts AS (
  SELECT cwk, offs, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active
  FROM joined GROUP BY cwk, offs)
SELECT strftime(DATE '1970-01-01' + INTERVAL (cwk * 7) DAY, '%Y-%m-%d')
         AS cohort_week,
       offs AS week_offset, n_active,
       ROUND(CAST(n_active AS DOUBLE)
             / MAX(CASE WHEN offs = 0 THEN n_active END)
               OVER (PARTITION BY cwk), 6) AS retention
FROM counts
""",
)
def q77_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention — the product-analytics staple: users grouped
    by first-activity week, then for each later week the fraction of
    the cohort still active. (Every offset-0 cell is 1.0 by
    construction; the decay across offsets is the retention curve.)

    Scale shape: raw events reduce immediately to DISTINCT (user,
    week) — the only pass over full data; cohorts are a user-grain
    min; the rest operates on |users|·|weeks| rows with one window
    over the |cohorts|·|offsets| counts for the denominator (no
    self-join for cohort size). Week ids are integer epoch-day
    divisions — tz-safe and exact in both engines.
    """
    e = load_table(spark, sf_dir, "events")
    wk = F.floor(
        F.datediff(F.to_date(F.date_format("ts", "yyyy-MM-dd")), F.lit("1970-01-01"))
        / 7
    ).cast("long")
    act = e.select("user_id", wk.alias("wk")).distinct()
    cohort = act.groupBy("user_id").agg(F.min("wk").alias("cwk"))
    joined = act.join(cohort, "user_id").select(
        "cwk", (F.col("wk") - F.col("cwk")).alias("week_offset"), "user_id"
    )
    counts = joined.groupBy("cwk", "week_offset").agg(
        F.countDistinct("user_id").alias("n_active")
    )
    wc = W.partitionBy("cwk")
    denom = F.max(F.when(F.col("week_offset") == 0, F.col("n_active"))).over(wc)
    return counts.select(
        F.date_format(
            F.date_add(F.lit("1970-01-01").cast("date"), (F.col("cwk") * 7).cast("int")),
            "yyyy-MM-dd",
        ).alias("cohort_week"),
        "week_offset",
        "n_active",
        F.round(F.col("n_active").cast("double") / denom, 6).alias("retention"),
    )


# ---------------------------------------------------------------------------
# q78: alert throttling (per-key rate limit with suppression audit)
# ---------------------------------------------------------------------------

THROTTLE_N = 3  # alerts kept per (type, hour) key


@register(
    "q78_alert_throttle",
    tags=("sequence", "window", "ops"),
    oracle=f"""
WITH ev AS (
  SELECT event_id, event_type, user_id, ts,
         epoch_us(ts) // 1000000 // 3600 AS hnum
  FROM events WHERE event_type = 'error'),
ranked AS (
  SELECT event_type, hnum, event_id,
         ROW_NUMBER() OVER (PARTITION BY event_type, hnum
                            ORDER BY ts, event_id) AS rn
  FROM ev)
SELECT event_type, hnum,
       CAST(COUNT(*) AS BIGINT) AS n_alerts,
       CAST(SUM(CASE WHEN rn <= {THROTTLE_N} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept,
       CAST(SUM(CASE WHEN rn > {THROTTLE_N} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_suppressed,
       CAST(MIN(CASE WHEN rn = 1 THEN event_id END) AS BIGINT) AS first_kept
FROM ranked GROUP BY event_type, hnum
""",
)
def q78_alert_throttle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alert throttling — the fatigue control an IDS pipeline (the
    reference's domain) bolts onto its alert stream: within each
    (signature, hour) key keep the first 3 alerts, suppress the rest,
    and report kept/suppressed counts so downstream consumers see the
    storm's size without receiving it. Error events stand in for
    alerts; event_type for the signature.

    Scale shape: one window rank per (key, hour) partition — the
    filter pushes `event_type = 'error'` to the scan, the rank runs
    on time-bucketed partitions (bounded state, storm-skew split by
    AQE), and only count-grain rows leave. First-kept id is carried
    so the throttle is auditable. The streaming twin is
    `streaming/stats.py:throttle_with_state` (the same per-key counter
    in applyInPandasWithState), kept/suppressed-parity-tested in
    tests/test_stream_batch_equiv.py.
    """
    e = load_table(spark, sf_dir, "events")
    hnum = F.expr(
        "timestampdiff(HOUR, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    ev = e.where(F.col("event_type") == "error").select(
        "event_id", "event_type", "ts", hnum.alias("hnum")
    )
    w = W.partitionBy("event_type", "hnum").orderBy("ts", "event_id")
    ranked = ev.select(
        "event_type", "hnum", "event_id", F.row_number().over(w).alias("rn")
    )
    return ranked.groupBy("event_type", "hnum").agg(
        F.count(F.lit(1)).alias("n_alerts"),
        F.sum(F.when(F.col("rn") <= THROTTLE_N, 1).otherwise(0)).alias("n_kept"),
        F.sum(F.when(F.col("rn") > THROTTLE_N, 1).otherwise(0)).alias(
            "n_suppressed"
        ),
        F.min(F.when(F.col("rn") == 1, F.col("event_id"))).alias("first_kept"),
    )


# ---------------------------------------------------------------------------
# q79: snapshot-as-of read (time travel over a changelog)
# ---------------------------------------------------------------------------

TIME_TRAVEL_AS_OF = "2024-01-20 00:00:00"


@register(
    "q79_time_travel",
    tags=("cdc", "window", "warehouse"),
    oracle=f"""
WITH log AS (
  SELECT user_id, ts, value, event_id FROM events
  WHERE ts < TIMESTAMP '{TIME_TRAVEL_AS_OF}'),
latest AS (
  SELECT user_id, value, ts, event_id,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM log)
SELECT user_id,
       value AS state_value,
       strftime(ts, '{TS_US_FMT_DUCK}') AS state_ts,
       event_id AS state_event
FROM latest WHERE rn = 1
""",
)
def q79_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-as-of read — time travel over a changelog without a
    table format: treating events as a per-user upsert log, the state
    AS OF 2024-01-20 is each user's latest record STRICTLY before the
    as-of timestamp. The read side of the CDC upsert sink
    (streaming/upsert.py keeps the same per-key latest-wins maximum
    incrementally); Delta/Iceberg time travel is this query plus
    manifest pruning.

    Scale shape: the as-of predicate pushes to the scan (half the log
    never reads at later as-of points under time partitioning), then
    ONE per-key window picks the latest record — max-struct semantics
    identical to the sink's merge, so a snapshot read and the
    incrementally-maintained state can never disagree (the
    upsert-sink equivalence tests pin exactly that).
    """
    e = load_table(spark, sf_dir, "events")
    log = e.where(F.col("ts") < F.lit(TIME_TRAVEL_AS_OF).cast("timestamp_ntz"))
    w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        log.select(
            "user_id",
            "value",
            "ts",
            "event_id",
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("value").alias("state_value"),
            F.date_format("ts", TS_US_FMT_SPARK).alias("state_ts"),
            F.col("event_id").alias("state_event"),
        )
    )


# ---------------------------------------------------------------------------
# q71: deterministic mode (most-frequent value per group)
# ---------------------------------------------------------------------------


@register(
    "q71_modal_event_type",
    tags=("agg",),
    oracle="""
WITH counts AS (
  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY user_id, event_type),
ranked AS (
  SELECT user_id, event_type, n,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY n DESC, event_type) AS rn
  FROM counts)
SELECT user_id, event_type AS modal_type, n AS n_events
FROM ranked WHERE rn = 1
""",
)
def q71_modal_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic MODE aggregate: each user's most frequent event
    type, ties broken alphabetically — the categorical summary
    statistic (`mode()` in other engines) the rest of the aggregate
    family (§2.4) lacked. Done as ONE aggregation + a struct-min
    (count negated, then type) rather than a window over the counts,
    so nothing re-shuffles after the (user, type) rollup.

    Scale shape (100 TB): two map-side-combinable hash aggregations.
    The first exchange carries partially-aggregated (user, type)
    pairs (bounded by the active-pair domain, not event rows); the
    second carries only the rolled-up (user, type, n) triples — KB
    per partition however large the fact table. No window, no sort,
    no join; heavy-hitter users still reduce map-side in both passes.
    """
    e = load_table(spark, sf_dir, "events")
    counts = e.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    picked = counts.groupBy("user_id").agg(
        F.min(F.struct((-F.col("n")).alias("neg_n"), F.col("event_type"))).alias("m")
    )
    return picked.select(
        "user_id",
        F.col("m.event_type").alias("modal_type"),
        (-F.col("m.neg_n")).alias("n_events"),
    )


# ---------------------------------------------------------------------------
# q80: first-order Markov transition matrix over per-user event sequences
# ---------------------------------------------------------------------------


@register(
    "q80_markov_transitions",
    tags=("sequence", "window"),
    oracle="""
WITH seq AS (
  SELECT event_type,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events),
trans AS (
  SELECT prev_type, event_type AS next_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY prev_type, event_type)
SELECT prev_type, next_type, n,
       CAST((n * 1000) // SUM(n) OVER (PARTITION BY prev_type) AS BIGINT)
         AS p_permille
FROM trans
""",
)
def q80_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of the event stream: for
    every (previous event type → next event type) pair, the count of
    adjacent transitions within a user's timeline and the conditional
    next-step probability in integer per-mille — the behavioral model
    behind next-event prediction, anomaly scoring (improbable
    transitions) and q74's CEP pattern mining.

    Scale shape (100 TB): ONE user-partitioned sort gives every event
    its predecessor via lag (same Exchange the other sequence queries
    q70/q74/q75 reuse), then counts collapse to the |types|² transition
    relation — tiny — where the per-prev normalization window is free.
    The probability is integer cross-multiplied ((n*1000) div total):
    exact in both engines, no float division until the caller derives
    one. Tiebreak inside a same-microsecond tie is event_id, pinned in
    BOTH engines so lag() sees the identical sequence."""
    e = load_table(spark, sf_dir, "events")
    seq = e.select(
        "event_type",
        F.lag("event_type")
        .over(W.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("prev_type"),
    ).filter(F.col("prev_type").isNotNull())
    trans = seq.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count(F.lit(1)).alias("n")
    )
    wp = W.partitionBy("prev_type")
    return trans.select(
        "prev_type",
        "next_type",
        "n",
        F.expr("n * 1000").cast("long").alias("_num"),
        F.sum("n").over(wp).alias("_den"),
    ).select(
        "prev_type",
        "next_type",
        "n",
        F.expr("_num div _den").alias("p_permille"),
    )


# ---------------------------------------------------------------------------
# q81: A/B experiment readout — Welch z-test per metric from exact moments
# ---------------------------------------------------------------------------


@register(
    "q81_ab_welch_z",
    tags=("stats", "experiment"),
    oracle="""
WITH assigned AS (
  SELECT event_type, user_id % 2 AS variant,
         CAST(value AS DECIMAL(18,6)) AS v,
         CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6)) AS v2
  FROM events),
moments AS (
  SELECT event_type, variant,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(v) AS DOUBLE) AS s1,
         CAST(SUM(v2) AS DOUBLE) AS s2
  FROM assigned GROUP BY event_type, variant),
ab AS (
  SELECT event_type,
         MIN(CASE WHEN variant = 0 THEN n END) AS n_a,
         MIN(CASE WHEN variant = 1 THEN n END) AS n_b,
         MIN(CASE WHEN variant = 0 THEN s1 END) AS s1_a,
         MIN(CASE WHEN variant = 1 THEN s1 END) AS s1_b,
         MIN(CASE WHEN variant = 0 THEN s2 END) AS s2_a,
         MIN(CASE WHEN variant = 1 THEN s2 END) AS s2_b
  FROM moments GROUP BY event_type),
stats AS (
  SELECT event_type, n_a, n_b,
         s1_a / n_a AS mean_a, s1_b / n_b AS mean_b,
         (s2_a - s1_a * s1_a / n_a) / (n_a - 1) AS var_a,
         (s2_b - s1_b * s1_b / n_b) / (n_b - 1) AS var_b
  FROM ab)
SELECT event_type, n_a, n_b,
       ROUND(mean_a, 6) AS mean_a, ROUND(mean_b, 6) AS mean_b,
       ROUND((mean_a - mean_b) / SQRT(var_a / n_a + var_b / n_b), 4) AS z,
       CAST(ABS(ROUND((mean_a - mean_b)
            / SQRT(var_a / n_a + var_b / n_b), 4)) > 1.96 AS BIGINT)
         AS significant
FROM stats
""",
)
def q81_ab_welch_z(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: per metric (event type), the Welch
    z-statistic comparing mean event value between the two
    deterministic user buckets (user_id % 2 — the hash-assignment
    every experimentation platform uses) plus a |z| > 1.96
    significance flag — the analysis that closes the loop on qs09's
    split discipline.

    Determinism: the fact table reduces to exact DECIMAL moment sums
    (n, Σv, Σv²) per (metric, variant) — order-independent — and the
    entire z computation is then a fixed sequence of IEEE double ops
    on identical inputs, so both engines produce identical bits; the
    flag tests the 4dp-ROUNDED z so the boundary is engine-stable.

    Scale shape (100 TB): ONE map-side-combinable aggregation to
    |metrics|·2 rows; everything after is free. Same moments →
    variance trick as qa02; no second pass, no window, no join — the
    pivot is a MIN-CASE fold at metric grain (qa03's shape)."""
    e = load_table(spark, sf_dir, "events")
    v = F.col("value").cast("decimal(18,6)")
    assigned = e.select(
        "event_type",
        (F.col("user_id") % 2).alias("variant"),
        v.alias("v"),
        (v * v).alias("v2"),
    )
    moments = assigned.groupBy("event_type", "variant").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").cast("double").alias("s1"),
        F.sum("v2").cast("double").alias("s2"),
    )
    ab = moments.groupBy("event_type").agg(
        F.min(F.when(F.col("variant") == 0, F.col("n"))).alias("n_a"),
        F.min(F.when(F.col("variant") == 1, F.col("n"))).alias("n_b"),
        F.min(F.when(F.col("variant") == 0, F.col("s1"))).alias("s1_a"),
        F.min(F.when(F.col("variant") == 1, F.col("s1"))).alias("s1_b"),
        F.min(F.when(F.col("variant") == 0, F.col("s2"))).alias("s2_a"),
        F.min(F.when(F.col("variant") == 1, F.col("s2"))).alias("s2_b"),
    )
    stats = ab.select(
        "event_type",
        "n_a",
        "n_b",
        (F.col("s1_a") / F.col("n_a")).alias("mean_a"),
        (F.col("s1_b") / F.col("n_b")).alias("mean_b"),
        (
            (F.col("s2_a") - F.col("s1_a") * F.col("s1_a") / F.col("n_a"))
            / (F.col("n_a") - 1)
        ).alias("var_a"),
        (
            (F.col("s2_b") - F.col("s1_b") * F.col("s1_b") / F.col("n_b"))
            / (F.col("n_b") - 1)
        ).alias("var_b"),
    )
    z = F.round(
        (F.col("mean_a") - F.col("mean_b"))
        / F.sqrt(F.col("var_a") / F.col("n_a") + F.col("var_b") / F.col("n_b")),
        4,
    )
    return stats.select(
        "event_type",
        "n_a",
        "n_b",
        F.round("mean_a", 6).alias("mean_a"),
        F.round("mean_b", 6).alias("mean_b"),
        z.alias("z"),
        (F.abs(z) > 1.96).cast("long").alias("significant"),
    )


# ---------------------------------------------------------------------------
# q82: Gini concentration of customer revenue (inequality/skew audit)
# ---------------------------------------------------------------------------


@register(
    "q82_revenue_gini",
    tags=("stats", "skew"),
    oracle="""
WITH cust AS (
  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders GROUP BY o_custkey),
ranked AS (
  SELECT rev,
         CAST(ROW_NUMBER() OVER (ORDER BY rev, o_custkey) AS BIGINT) AS i
  FROM cust),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(rev) AS DOUBLE) AS total,
         CAST(SUM(i * rev) AS DOUBLE) AS weighted
  FROM ranked)
SELECT n AS n_customers, total AS total_revenue,
       ROUND((2.0 * weighted - (n + 1) * total) / (n * total), 6) AS gini
FROM agg
""",
)
def q82_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer revenue concentration — the
    inequality audit that tells a pipeline whether a key (customer,
    source, token) is skew-dangerous BEFORE a join degrades: gini→1
    means a few heads carry the mass (salt or AQE-split them),
    gini→0 means uniform. Companion to the qg04 power-law tail
    diagnostic, on exact revenue instead of degree.

    Determinism: revenue is a DECIMAL rollup; the rank index is an
    integer with o_custkey tiebreak; Σ i·rev is an exact
    integer×DECIMAL sum. The closed-form Gini
    (2Σi·rᵢ − (n+1)Σr)/(nΣr) is evaluated in one fixed double
    sequence from identical inputs — bit-exact cross-engine.

    Scale shape (100 TB): the fact table collapses to customer grain
    in one map-side-combinable aggregation; the rank is ONE global
    sort of that entity relation (the same cost class as any ranking
    report over it — and when even the entity relation is huge, the
    qa04 micro-bucket running-count trick computes the same Σi·rᵢ
    from value-bucketed partial sums without a total order)."""
    o = load_table(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev")
    )
    ranked = cust.select(
        "rev",
        F.row_number()
        .over(W.orderBy("rev", "o_custkey"))
        .cast("long")
        .alias("i"),
    )
    agg = ranked.agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("rev").cast("double").alias("total_revenue"),
        F.sum(F.col("i") * F.col("rev")).cast("double").alias("weighted"),
    )
    return agg.select(
        "n_customers",
        "total_revenue",
        F.round(
            (
                2.0 * F.col("weighted")
                - (F.col("n_customers") + 1) * F.col("total_revenue")
            )
            / (F.col("n_customers") * F.col("total_revenue")),
            6,
        ).alias("gini"),
    )


# ---------------------------------------------------------------------------
# q83: funnel conversion latency percentiles (signup → first purchase)
# ---------------------------------------------------------------------------


@register(
    "q83_conversion_latency",
    tags=("funnel", "stats"),
    oracle="""
WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS tsm FROM events),
su AS (
  SELECT user_id, MIN(tsm) AS s_tsm FROM ev
  WHERE event_type = 'signup' GROUP BY user_id),
conv AS (
  SELECT e.user_id, MIN(e.tsm) - MIN(su.s_tsm) AS delta_us
  FROM ev e JOIN su ON su.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.tsm > su.s_tsm
  GROUP BY e.user_id),
ranked AS (
  SELECT delta_us,
         ROW_NUMBER() OVER (ORDER BY delta_us, user_id) AS rn,
         COUNT(*) OVER () AS n
  FROM conv),
pick AS (
  SELECT
    MIN(CASE WHEN rn = CAST(CEIL(0.50 * n) AS BIGINT) THEN delta_us END) AS p50,
    MIN(CASE WHEN rn = CAST(CEIL(0.90 * n) AS BIGINT) THEN delta_us END) AS p90,
    MIN(CASE WHEN rn = CAST(CEIL(0.99 * n) AS BIGINT) THEN delta_us END) AS p99,
    CAST(MIN(n) AS BIGINT) AS n_converted
  FROM ranked)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM su) AS n_signups,
       n_converted,
       CAST(p50 // 1000000 AS BIGINT) AS p50_s,
       CAST(p90 // 1000000 AS BIGINT) AS p90_s,
       CAST(p99 // 1000000 AS BIGINT) AS p99_s
FROM pick
""",
)
def q83_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel latency distribution: per user, time from first signup
    to the first purchase STRICTLY after it; report converted-user
    count against the signup population and the p50/p90/p99 latency
    in whole seconds — the SLA/engagement readout beside q48's
    conversion-rate funnel (how MANY convert) and q77's retention
    (how LONG they stay): how FAST they convert.

    Determinism: timestamps reduce to integer event-time micros
    (TIMESTAMP_NTZ arithmetic, tz-independent); latencies are exact
    integer differences; percentiles are nearest-rank SELECTIONS
    (ceil(p·n)-th order statistic, qf03's recipe — never
    interpolation, so the reported values are actual data points,
    identical cross-engine); user_id breaks rank ties.

    Scale shape (100 TB): events reduce per-user twice (signup min,
    then first-qualifying-purchase min over the signup join — the
    join is user-keyed, AQE-splittable); the percentile window runs
    over the CONVERTED-USER relation, orders of magnitude below event
    grain. At entity scale where even that sort hurts, the qa04
    micro-bucket running count replaces the rank (stated swap)."""
    tsm = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", tsm.alias("tsm")
    )
    su = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("tsm").alias("s_tsm"))
    )
    conv = (
        e.filter(F.col("event_type") == "purchase")
        .join(su, "user_id")
        .filter(F.col("tsm") > F.col("s_tsm"))
        .groupBy("user_id")
        .agg((F.min("tsm") - F.min("s_tsm")).alias("delta_us"))
    )
    ranked = conv.select(
        "delta_us",
        F.row_number().over(W.orderBy("delta_us", "user_id")).alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy()).alias("n"),
    )
    pick = ranked.agg(
        F.min(
            F.when(F.col("rn") == F.ceil(0.50 * F.col("n")), F.col("delta_us"))
        ).alias("p50"),
        F.min(
            F.when(F.col("rn") == F.ceil(0.90 * F.col("n")), F.col("delta_us"))
        ).alias("p90"),
        F.min(
            F.when(F.col("rn") == F.ceil(0.99 * F.col("n")), F.col("delta_us"))
        ).alias("p99"),
        F.min("n").cast("long").alias("n_converted"),
    )
    n_signups = su.agg(F.count(F.lit(1)).alias("n_signups"))
    return (
        pick.crossJoin(F.broadcast(n_signups))
        .select(
            "n_signups",
            "n_converted",
            F.expr("p50 div 1000000").alias("p50_s"),
            F.expr("p90 div 1000000").alias("p90_s"),
            F.expr("p99 div 1000000").alias("p99_s"),
        )
    )


# ---------------------------------------------------------------------------
# q84: ABC / Pareto classification (the 80-15-5 inventory cut)
# ---------------------------------------------------------------------------


@register(
    "q84_abc_classification",
    tags=("agg", "window", "stats"),
    oracle="""
WITH parts AS (
  SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev
  FROM lineitem GROUP BY l_partkey),
ranked AS (
  SELECT l_partkey, rev,
         SUM(rev) OVER (ORDER BY rev DESC, l_partkey
                        ROWS UNBOUNDED PRECEDING) AS cum_rev,
         SUM(rev) OVER () AS total_rev
  FROM parts),
classed AS (
  SELECT l_partkey, rev,
         CASE WHEN cum_rev * 100 <= total_rev * 80 THEN 'A'
              WHEN cum_rev * 100 <= total_rev * 95 THEN 'B'
              ELSE 'C' END AS abc_class
  FROM ranked)
SELECT abc_class, CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(SUM(rev) AS DOUBLE) AS revenue,
       CAST((CAST(SUM(rev) * 100 AS BIGINT) * 10000)
            // CAST(MAX(t.total) * 100 AS BIGINT) AS BIGINT) AS share_bp
FROM classed, (SELECT SUM(rev) AS total FROM parts) t
GROUP BY abc_class
""",
)
def q84_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto classification — the 80/15/5 cut every inventory,
    storage-tiering and cache-sizing decision uses: parts ranked by
    exact revenue, class A until 80% of cumulative revenue, B until
    95%, C the tail; per class, part count, exact revenue and
    basis-point share. The actionable form of q82's Gini scalar (q82
    says HOW concentrated, q84 says WHICH keys to treat specially —
    the same cut that picks broadcast-candidate keys or hot-tier
    cache entries).

    Determinism: revenue is an exact DECIMAL rollup; the cumulative
    threshold test is integer-free of division (cum·100 ≤ total·80
    on DECIMALs — exact); rank ties break on l_partkey.

    Scale shape (100 TB): the fact table reduces once to part grain
    (map-side combinable); the classification is ONE ordered window
    over the entity relation (the same cost class as q82's rank —
    and the qa04 micro-bucket running count replaces it when even
    the entity relation outgrows a sort, the documented swap); the
    class rollup is 3 rows."""
    li = load_table(spark, sf_dir, "lineitem")
    parts = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("rev")
    )
    w_cum = W.orderBy(F.desc("rev"), "l_partkey").rowsBetween(
        W.unboundedPreceding, 0
    )
    w_all = W.partitionBy()
    ranked = parts.select(
        "l_partkey",
        "rev",
        F.sum("rev").over(w_cum).alias("cum_rev"),
        F.sum("rev").over(w_all).alias("total_rev"),
    )
    classed = ranked.select(
        "rev",
        "total_rev",
        F.when(F.col("cum_rev") * 100 <= F.col("total_rev") * 80, "A")
        .when(F.col("cum_rev") * 100 <= F.col("total_rev") * 95, "B")
        .otherwise("C")
        .alias("abc_class"),
    )
    return classed.groupBy("abc_class").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum("rev").cast("double").alias("revenue"),
        F.expr(
            "(cast(sum(rev) * 100 as bigint) * 10000)"
            " div cast(max(total_rev) * 100 as bigint)"
        )
        .cast("long")
        .alias("share_bp"),
    )


# ---------------------------------------------------------------------------
# q85: referential-integrity + amount-reconciliation audit
# ---------------------------------------------------------------------------

RECON_TOL = "0.01"  # balanced when |header - line sum| <= one cent


@register(
    "q85_order_reconciliation",
    tags=("audit", "join", "agg"),
    oracle=f"""
WITH ls AS (
  SELECT l_orderkey,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS line_sum
  FROM lineitem GROUP BY l_orderkey),
joined AS (
  SELECT o.o_orderkey, o.o_totalprice, ls.line_sum
  FROM orders o LEFT JOIN ls ON ls.l_orderkey = o.o_orderkey),
orphan_lines AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n
  FROM ls LEFT JOIN orders o ON o.o_orderkey = ls.l_orderkey
  WHERE o.o_orderkey IS NULL)
SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CASE WHEN line_sum IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_orders_without_lines,
       (SELECT n FROM orphan_lines) AS n_orphan_line_groups,
       CAST(SUM(CASE WHEN line_sum IS NOT NULL
                      AND ABS(CAST(o_totalprice AS DECIMAL(18,2)) - line_sum)
                          <= {RECON_TOL}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_balanced,
       CAST(SUM(CASE WHEN line_sum IS NOT NULL
                      AND ABS(CAST(o_totalprice AS DECIMAL(18,2)) - line_sum)
                          <= {RECON_TOL}
                     THEN 1 ELSE 0 END) * 1000000
            // SUM(CASE WHEN line_sum IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS balanced_ppm,
       CAST(SUM(CASE WHEN line_sum IS NOT NULL
                     THEN CAST(o_totalprice AS DECIMAL(18,2)) - line_sum
                     ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
         AS net_imbalance,
       CAST(MAX(CASE WHEN line_sum IS NOT NULL
                     THEN ABS(CAST(o_totalprice AS DECIMAL(18,2)) - line_sum)
                     END) AS DOUBLE) AS max_abs_diff
FROM joined
""",
)
def q85_order_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity + balancing audit (the finance-grade
    data-quality check beside qa01's column constraints): header
    totals reconciled against exact DECIMAL line sums with a one-cent
    tolerance, plus both orphan directions (orders with no lines,
    line groups with no order). One summary row: counts, balanced
    rate in ppm, exact net imbalance and worst single-order gap. On
    this synthetic data the header totals are independent of the
    lines — the audit honestly reports ~0 balanced, which is exactly
    what it exists to surface on real pipelines after a partial load.

    Scale shape (100 TB): lineitem collapses to order grain in one
    map-side-combinable DECIMAL rollup; the header LEFT join is
    order-keyed (AQE-splittable); both orphan probes reuse the same
    relations; everything lands in ONE final fold. Exact decimals
    end-to-end; the rate is integer cross-multiplied."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    ls = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias(
                "line_sum"
            )
        )
    )
    joined = o.join(ls, o["o_orderkey"] == ls["l_orderkey"], "left")
    orphan_lines = (
        ls.join(o, o["o_orderkey"] == ls["l_orderkey"], "left_anti").agg(
            F.count(F.lit(1)).alias("n_orphan_line_groups")
        )
    )
    diff = F.col("o_totalprice").cast("decimal(18,2)") - F.col("line_sum")
    has_lines = F.col("line_sum").isNotNull()
    balanced = has_lines & (F.abs(diff) <= F.lit(float(RECON_TOL)))
    agg = joined.agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum((~has_lines).cast("int")).cast("long").alias(
            "n_orders_without_lines"
        ),
        F.sum(balanced.cast("int")).cast("long").alias("n_balanced"),
        F.expr(
            f"sum(case when line_sum is not null and"
            f" abs(cast(o_totalprice as decimal(18,2)) - line_sum)"
            f" <= {RECON_TOL} then 1 else 0 end) * 1000000"
            f" div sum(case when line_sum is not null then 1 else 0 end)"
        )
        .cast("long")
        .alias("balanced_ppm"),
        F.sum(
            F.when(has_lines, diff).otherwise(F.lit(0).cast("decimal(18,2)"))
        )
        .cast("double")
        .alias("net_imbalance"),
        F.max(F.when(has_lines, F.abs(diff))).cast("double").alias(
            "max_abs_diff"
        ),
    )
    return agg.crossJoin(F.broadcast(orphan_lines)).select(
        "n_orders",
        "n_orders_without_lines",
        "n_orphan_line_groups",
        "n_balanced",
        "balanced_ppm",
        "net_imbalance",
        "max_abs_diff",
    )


# ---------------------------------------------------------------------------
# q86: Pareto frontier (skyline) per brand
# ---------------------------------------------------------------------------


@register(
    "q86_pareto_frontier",
    tags=("window", "agg", "skyline"),
    oracle="""
WITH pts AS (
  SELECT p_brand, p_retailprice AS price, p_size,
         CAST(COUNT(*) AS BIGINT) AS n_parts
  FROM part GROUP BY p_brand, p_retailprice, p_size)
SELECT p.p_brand, p.price, p.p_size, p.n_parts
FROM pts p
WHERE NOT EXISTS (
  SELECT 1 FROM pts q
  WHERE q.p_brand = p.p_brand
    AND q.price <= p.price AND q.p_size >= p.p_size
    AND (q.price < p.price OR q.p_size > p.p_size))
""",
)
def q86_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline / Pareto-frontier query (Borzsony et al.'s SKYLINE OF,
    the multi-criteria shortlist OLAP engines answer with a dominance
    filter): per brand, the parts no other part dominates on
    (cheaper-or-equal price, larger-or-equal size, strictly better on
    at least one) — the "efficient frontier" of the catalog. Points
    collapse to (brand, price, size) grain first with a part count, so
    identical offers neither dominate each other nor duplicate the
    frontier.

    Scale shape (100 TB): the textbook skyline is a quadratic self-join
    (the oracle's NOT EXISTS replays exactly that, independently); this
    plan is the O(n log n) sweep instead — one map-side-combinable
    groupBy to distinct points, then ONE window partitioned by brand
    ordered (price asc, size desc): a point is on the frontier iff its
    size strictly exceeds the running max size of every strictly
    cheaper (or same-price-bigger) point before it. No self-join, no
    cross product, and the window is partitioned (per-brand linear
    scan), never global; at 1000 executors each brand's sweep is one
    task over its pre-aggregated point set."""
    pts = (
        load_table(spark, sf_dir, "part")
        .groupBy(
            "p_brand", F.col("p_retailprice").alias("price"), "p_size"
        )
        .agg(F.count(F.lit(1)).alias("n_parts"))
    )
    sweep = (
        W.partitionBy("p_brand")
        .orderBy(F.col("price").asc(), F.col("p_size").desc())
        .rowsBetween(W.unboundedPreceding, -1)
    )
    return (
        pts.withColumn("run_max_size", F.max("p_size").over(sweep))
        .filter(
            F.col("run_max_size").isNull()
            | (F.col("p_size") > F.col("run_max_size"))
        )
        .drop("run_max_size")
    )


# ---------------------------------------------------------------------------
# q87: CEP with a quantifier — VIEW, CLICK+ (no error), PURCHASE
# ---------------------------------------------------------------------------

#: q87's pattern window (view -> purchase). The corpus averages a
#: handful of events per user per day, so a day-scale window is what
#: realizes the C+ quantifier; q74 keeps the tight 30-min two-step.
Q87_WINDOW_S = 86_400


@register(
    "q87_cep_quantified",
    tags=("sequence", "window", "cep"),
    oracle=f"""
WITH ev AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS tsm FROM events),
cum AS (
  SELECT *,
         SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY tsm, event_id
                 ROWS UNBOUNDED PRECEDING) AS cum_clicks,
         SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY tsm, event_id
                 ROWS UNBOUNDED PRECEDING) AS cum_errors
  FROM ev),
snap AS (
  SELECT *,
         LAST_VALUE(CASE WHEN event_type = 'view' THEN tsm END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY tsm, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS v_tsm,
         LAST_VALUE(CASE WHEN event_type = 'view' THEN cum_clicks END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY tsm, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS v_clicks,
         LAST_VALUE(CASE WHEN event_type = 'view' THEN cum_errors END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY tsm, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS v_errors
  FROM cum),
matches AS (
  SELECT user_id, cum_clicks - v_clicks AS n_clicks, tsm - v_tsm AS lat_us
  FROM snap
  WHERE event_type = 'purchase' AND v_tsm IS NOT NULL
    AND tsm - v_tsm <= {Q87_WINDOW_S * 1_000_000}
    AND cum_clicks - v_clicks >= 1
    AND cum_errors - v_errors = 0)
SELECT CAST(n_clicks AS BIGINT) AS n_clicks,
       CAST(COUNT(*) AS BIGINT) AS n_matches,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(SUM(lat_us) AS BIGINT) AS sum_latency_us
FROM matches GROUP BY n_clicks
""",
)
def q87_cep_quantified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CEP pattern with a QUANTIFIER — MATCH_RECOGNIZE's
    ``PATTERN (V C+ P)`` shape, which q74's fixed two-register match
    cannot express: a VIEW, then ONE-OR-MORE clicks, then a PURCHASE
    within 24 hours of the view, with NO error anywhere between the
    view and the purchase (non-pattern events other than error are
    transparent — the relaxed-contiguity mode CEP engines default to).
    The anchor is the LATEST view before each purchase, so matches
    never overlap on the V side. Reports the quantifier's realized
    count distribution: per click-count, matches, distinct users, and
    exact integer-µs latency mass.

    Scale shape: ONE user-partitioned ordered pass — running click /
    error counters plus a last-ignorenulls snapshot of the counters AT
    the anchor view (the per-key register bank a CEP NFA would keep,
    expressed as window state); the quantifier count is a counter
    DIFFERENCE, not a per-stage scan, so C+ costs the same as C. No
    self-join, no per-pattern-stage pass; the rollup is map-side
    combinable at |distinct counts| grain. Integer µs end-to-end
    (tz-proof, exact)."""
    e = load_table(spark, sf_dir, "events")
    tsm = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    ev = e.select("user_id", "event_id", "event_type", tsm.alias("tsm"))
    w_cum = (
        W.partitionBy("user_id")
        .orderBy("tsm", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = ev.select(
        "*",
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .over(w_cum)
        .alias("cum_clicks"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .over(w_cum)
        .alias("cum_errors"),
    )
    w_prev = (
        W.partitionBy("user_id")
        .orderBy("tsm", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    snap_col = F.when(
        F.col("event_type") == "view",
        F.struct("tsm", "cum_clicks", "cum_errors"),
    )
    snap = cum.select(
        "*", F.last(snap_col, ignorenulls=True).over(w_prev).alias("v")
    )
    matches = snap.where(
        (F.col("event_type") == "purchase")
        & F.col("v").isNotNull()
        & (F.col("tsm") - F.col("v.tsm") <= Q87_WINDOW_S * 1_000_000)
        & (F.col("cum_clicks") - F.col("v.cum_clicks") >= 1)
        & (F.col("cum_errors") - F.col("v.cum_errors") == 0)
    ).select(
        "user_id",
        (F.col("cum_clicks") - F.col("v.cum_clicks")).alias("n_clicks"),
        (F.col("tsm") - F.col("v.tsm")).alias("lat_us"),
    )
    return matches.groupBy("n_clicks").agg(
        F.count(F.lit(1)).alias("n_matches"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum("lat_us").alias("sum_latency_us"),
    )
