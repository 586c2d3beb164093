"""Interleaved same-session A/B for the connected_components
``pairs_unique`` edge-dedup skip (round 15, second half).

Side "dedup" forces the old behavior (pairs_unique=False everywhere)
by wrapping operators.cluster.connected_components; side "skip" runs
the shipped tree. Both sides share the session, the ER gate dataflow,
and the interleave order, so host contention hits both. Prints one
JSON line: per-side er_stream_bench runs, medians, entity/link-count
equality, and start/end calibration canaries.

Usage: python tools/ab_cc_pairs_unique.py [rounds]
"""

from __future__ import annotations

import json
import statistics
import sys


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3

    import bench
    from event_stream_aggr_spark.operators import cluster
    from event_stream_aggr_spark.session import get_spark

    spark = get_spark(app_name="ab_cc_pairs_unique")
    cal0 = bench.calibration_probe(spark)["min_sec"]

    orig = cluster.connected_components

    def forced_dedup(*args, **kw):
        kw["pairs_unique"] = False
        return orig(*args, **kw)

    # warmup (not scored): codegen + parquet caches on both paths
    bench.er_stream_bench(spark)

    res: dict = {"dedup": [], "skip": [], "counts": set()}
    for _ in range(rounds):
        cluster.connected_components = forced_dedup
        try:
            r = bench.er_stream_bench(spark)
        finally:
            cluster.connected_components = orig
        res["dedup"].append(r["records_per_sec"])
        res["counts"].add((r["n_entities"], r["n_linked"]))
        r = bench.er_stream_bench(spark)
        res["skip"].append(r["records_per_sec"])
        res["counts"].add((r["n_entities"], r["n_linked"]))

    cal1 = bench.calibration_probe(spark)["min_sec"]
    out = {
        "dedup_rps": res["dedup"],
        "skip_rps": res["skip"],
        "dedup_median": statistics.median(res["dedup"]),
        "skip_median": statistics.median(res["skip"]),
        "ratio_skip_over_dedup": round(
            statistics.median(res["skip"]) / statistics.median(res["dedup"]), 4
        ),
        "identical_counts": len(res["counts"]) == 1,
        "counts": sorted(res["counts"]),
        "calibration_sec": [cal0, cal1],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
