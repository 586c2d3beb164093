"""One-off 30× probe (round-7 VERDICT ask #6): time the top-5
shuffle-heaviest headline queries at .scale_probe/sf3 (k=30 replicas,
~18M lineitems / 3M events / 150k docs) vs sf0.1, with executor-
reported shuffle/spill bytes, to check the shuffle-bytes growth curve
holds another half-decade past the per-round 10× probe. Results are
recorded in SCALING_AUDIT.md; the sf3 dir is deleted afterwards so the
per-round bench keeps probing at sf1 (bench.upscale_probe picks the
largest dir).

Usage: python tools/run_upscale_30x.py [probe_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PROBE = sys.argv[1] if len(sys.argv) > 1 else os.path.join(HERE, ".scale_probe", "sf3")
BASE = "/root/testdata/sf0.1"
QUERIES = (
    "qt27_rake_keyphrases",
    "qd12_span_dedup",
    "qg07_kcore_peeling",
    "q58_volume_shipping",
    "q01_pricing_summary",
)


def main() -> None:
    import shutil
    import subprocess

    from event_stream_aggr_spark.plans.registry import load_all
    from event_stream_aggr_spark.session import get_spark

    generated = False
    if not os.path.isdir(PROBE):
        # self-contained: synthesize the k=30 probe, and delete it
        # again afterwards so the per-round bench keeps probing at sf1
        # (bench.upscale_probe picks the LARGEST .scale_probe dir)
        print(f"probe dir {PROBE} missing — generating (k=30)...")
        subprocess.run(
            [sys.executable, os.path.join(HERE, "tools", "make_scale_probe.py"),
             "30", PROBE],
            check=True,
        )
        generated = True

    spark = get_spark(
        app_name="upscale_30x",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.retainedStages": "20000"},
    )
    specs = load_all()
    out: dict = {"probe_dir": PROBE, "data_ratio_vs_primary": 30.0, "queries": {}}
    try:
        _probe(spark, specs, out)
    finally:
        # ALWAYS delete a generated probe dir — a crash mid-probe that
        # leaked it would silently re-point every later round's bench
        # at 30x (bench.upscale_probe picks the LARGEST dir)
        if generated:
            shutil.rmtree(PROBE, ignore_errors=True)
            print(f"deleted generated probe dir {PROBE}")


def _probe(spark, specs, out) -> None:
    import bench

    # warmup
    specs[QUERIES[0]].fn(spark, BASE).write.mode("overwrite").format("noop").save()

    for name in QUERIES:
        row: dict = {}
        for label, sf_path in (("primary", BASE), ("probe", PROBE)):
            runs = []
            for i in range(2):
                pre = bench._max_stage_id(spark) if i == 1 else None
                t0 = time.perf_counter()
                specs[name].fn(spark, sf_path).write.mode("overwrite").format(
                    "noop"
                ).save()
                runs.append(time.perf_counter() - t0)
                if i == 1 and pre is not None:
                    m = bench._stage_metrics_since(spark, pre)
                    if m:
                        row[f"{label}_shuffle_write_mb"] = m["shuffle_write_mb"]
                        row[f"{label}_input_mb"] = m["input_mb"]
                        row[f"{label}_spill_disk_mb"] = m["spill_disk_mb"]
                        row[f"{label}_spill_mem_mb"] = m["spill_mem_mb"]
            row[f"{label}_sec"] = round(min(runs), 4)
        row["time_ratio"] = round(row["probe_sec"] / row["primary_sec"], 2)
        if row.get("primary_shuffle_write_mb"):
            row["shuffle_ratio"] = round(
                row["probe_shuffle_write_mb"] / row["primary_shuffle_write_mb"], 2
            )
        out["queries"][name] = row
        print(json.dumps({name: row}))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
