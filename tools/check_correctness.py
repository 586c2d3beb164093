"""Local stand-in for the driver's DuckDB-oracle harness.

Runs every registered query on Spark and its oracle on DuckDB at the
given SF dir, then compares row count, dtype-compatible schema, and
order-insensitive values (strict: exact equality after sorting columns
by name and rows by all columns; floats compared bit-exactly, with a
max-abs-diff report when they mismatch).

Usage: python tools/check_correctness.py [--tz ZONE] [sf_dir] [query ...]

``--tz Pacific/Kiritimati`` runs Spark under a hostile session timezone
with driver-like vanilla settings (the driver does NOT use our session
factory) — the probe that catches tz-dependent expressions.
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd


def load_duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)  # None -> 'None', bytes/Decimal -> str
        elif str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"rowcount spark={len(spark_pdf)} duck={len(duck_pdf)}")
    s_cols = sorted(spark_pdf.columns)
    d_cols = sorted(duck_pdf.columns)
    if s_cols != d_cols:
        problems.append(f"columns spark={s_cols} duck={d_cols}")
        return problems
    s_dtypes = [str(spark_pdf[c].dtype) for c in s_cols]
    d_dtypes = [str(duck_pdf[c].dtype) for c in s_cols]
    if s_dtypes != d_dtypes:
        problems.append(f"dtypes spark={list(zip(s_cols, s_dtypes))} duck={list(zip(s_cols, d_dtypes))}")
    if problems:
        return problems
    s = normalize(spark_pdf)
    d = normalize(duck_pdf)
    for c in s.columns:
        sv, dv = s[c], d[c]
        if np.issubdtype(sv.dtype, np.floating):
            eq = (sv.values == dv.values) | (np.isnan(sv.values) & np.isnan(dv.values))
            if not eq.all():
                bad = (~eq).sum()
                with np.errstate(invalid="ignore"):
                    mad = np.nanmax(np.abs(sv.values - dv.values))
                problems.append(f"col {c}: {bad} float mismatches, max_abs_diff={mad:.3e}")
        else:
            eq = sv.values == dv.values
            if not (eq.all() if isinstance(eq, np.ndarray) else eq):
                bad = int((~eq).sum())
                idx = int(np.argmax(~eq))
                problems.append(
                    f"col {c}: {bad} mismatches, first at row {idx}: "
                    f"spark={sv.iloc[idx]!r} duck={dv.iloc[idx]!r}"
                )
    return problems


def main() -> int:
    args = sys.argv[1:]
    tz = None
    if "--tz" in args:  # position-independent: [--tz ZONE] anywhere
        i = args.index("--tz")
        if i + 1 >= len(args):
            print("usage: check_correctness.py [--tz ZONE] [sf_dir] [query ...]", file=sys.stderr)
            return 2
        tz = args[i + 1]
        args = args[:i] + args[i + 2 :]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    from event_stream_aggr_spark.plans.registry import load_all

    specs = load_all()
    unknown = only - set(specs)
    if unknown:
        # a typo'd name silently matching nothing would report
        # "0 pass, 0 fail" and read as success — fail loudly instead
        print(f"unknown queries: {sorted(unknown)}", file=sys.stderr)
        return 2
    if tz:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .appName("check_correctness_hostile_tz")
            .config("spark.sql.session.timeZone", tz)
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("WARN")
    else:
        from event_stream_aggr_spark.session import get_spark

        spark = get_spark(app_name="check_correctness", shuffle_partitions=8)
    con = load_duck(sf_dir)

    n_pass = n_fail = n_rows_only = 0
    for name, spec in sorted(specs.items()):
        if only and name not in only:
            continue
        try:
            sdf = spec.fn(spark, sf_dir).toPandas()
        except Exception:
            print(f"FAIL {name}: SPARK ERROR")
            traceback.print_exc(limit=4)
            n_fail += 1
            continue
        if spec.oracle is None:
            print(f"ROWS {name}: {len(sdf)} rows (no oracle)")
            n_rows_only += 1
            continue
        try:
            ddf = con.execute(spec.oracle).df()
        except Exception:
            print(f"FAIL {name}: DUCKDB ERROR")
            traceback.print_exc(limit=4)
            n_fail += 1
            continue
        problems = compare(name, sdf, ddf)
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(sdf)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
