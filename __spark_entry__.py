"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``event_stream_aggr_spark`` package; this
module only adapts the registry to the driver's interface.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the engine's namesake
    event-stream aggregation — JSON enrichment + event-time hourly
    rollup over the events table (the batch form of the reference's
    interval stats, internal/app/app.go:75-110)."""
    from pyspark.sql import functions as F

    from event_stream_aggr_spark.tables import load_table

    e = load_table(spark, "/root/testdata/sf0.001", "events")
    return (
        e.withColumn("k", F.get_json_object("props", "$.k").cast("long"))
        .groupBy(
            F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss").alias(
                "hour_bucket"
            ),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum("k").alias("sum_k"),
        )
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from event_stream_aggr_spark.plans.registry import load_all

    return {name: spec.fn for name, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """Equivalent DuckDB SQL per query (omitted for rows-only checks)."""
    from event_stream_aggr_spark.plans.registry import load_all

    return {
        name: spec.oracle for name, spec in load_all().items() if spec.oracle is not None
    }
