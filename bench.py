"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "headline_queries_total", "value": <sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <scale factor>}

Execution is forced through the noop sink (full computation, all rows
consumed, no driver collect overhead). A small warmup query runs first
so JVM/codegen startup isn't billed to the first headline query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def infer_sf(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def main() -> None:
    from event_stream_aggr_spark.plans.registry import load_all
    from event_stream_aggr_spark.session import get_spark
    from event_stream_aggr_spark.tables import load_table

    spark = get_spark(app_name="bench")
    specs = load_all()
    headline = [name for name, spec in sorted(specs.items()) if spec.bench]

    # warmup: JVM + codegen + parquet footer caches
    load_table(spark, SF_DIR, "region").count()
    specs[headline[0]].fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()

    timings: dict[str, float] = {}
    for name in headline:
        t0 = time.perf_counter()
        specs[name].fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
        timings[name] = round(time.perf_counter() - t0, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": infer_sf(SF_DIR),
            }
        )
    )


if __name__ == "__main__":
    main()
