"""Catalog of the driver-generated test tables (see /root/repo/TESTDATA.md).

At 100 TB these would be partitioned/bucketed external tables; the load
helpers keep the access path declarative (``spark.read.parquet``) so
Catalyst gets predicate pushdown, column pruning, and partition pruning
for free — see ARCHITECTURE.md §"Scan path".
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimensions small enough to broadcast at any realistic scale factor.
BROADCAST_TABLES = frozenset({"region", "nation", "supplier", "part"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    if name == "events":
        # events.ts has shipped as either parquet TIMESTAMP(NANOS) (which
        # Spark's converter rejects — readable only as raw long nanos via
        # the legacy conf) or plain TIMESTAMP(MICROS, ntz).  Normalise both
        # encodings to TIMESTAMP_NTZ µs so every downstream query and the
        # DuckDB oracle see identical values regardless of generator
        # vintage.  (Session-level legacy conf, safe to set at runtime.)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        ts_type = df.schema["ts"].dataType.typeName()
        if ts_type == "long":
            # timestampadd on a TIMESTAMP_NTZ epoch is session-timezone
            # independent (timestamp_micros + cast would shift with the
            # driver session's timezone).
            return df.withColumn(
                "ts",
                F.expr(
                    "timestampadd(MICROSECOND, ts div 1000,"
                    " TIMESTAMP_NTZ '1970-01-01 00:00:00')"
                ),
            )
        if ts_type == "timestamp":
            # A direct LTZ->NTZ cast renders the wall clock in the
            # SESSION timezone (spark.sql.session.timeZone) — matching
            # DuckDB's raw-micros read only when the session happens to
            # be UTC.  unix_micros() extracts the tz-independent epoch
            # micros, so this normalization holds under any driver
            # session timezone (the hostile-tz probe in
            # tools/check_correctness.py exercises this).
            return df.withColumn(
                "ts",
                F.expr(
                    "timestampadd(MICROSECOND, unix_micros(ts),"
                    " TIMESTAMP_NTZ '1970-01-01 00:00:00')"
                ),
            )
        return df
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view; returns the DataFrames."""
    out = {}
    for name in TABLE_NAMES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
