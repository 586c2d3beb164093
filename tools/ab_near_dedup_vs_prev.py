import json, statistics, subprocess, sys, tempfile, shutil, os
sys.path.insert(0, "/root/repo")
import bench
from event_stream_aggr_spark.session import get_spark

here = "/root/repo"
prev = bench._prev_round_commit(here)
wt = tempfile.mkdtemp(prefix="ab_nd_wt_"); shutil.rmtree(wt)
subprocess.run(["git", "worktree", "add", "--detach", wt, prev], cwd=here, check=True, capture_output=True)
try:
    prev_fns, prev_modules = bench._load_registry_from(wt)
    spark = get_spark(app_name="ab_near_dedup")
    cal0 = bench.calibration_probe(spark)["min_sec"]
    bench.near_dedup_stream_bench(spark)  # warmup
    cur, prv = [], []
    def _cur():
        with bench._conf_fence(spark):
            cur.append(bench.near_dedup_stream_bench(spark)["docs_per_sec"])
    def _prev():
        with bench._swapped_modules(prev_modules, wt), bench._conf_fence(spark):
            prv.append(bench.near_dedup_stream_bench(spark)["docs_per_sec"])
    for i in range(4):
        a, b = (_cur, _prev) if i % 2 == 0 else (_prev, _cur)
        a(); b()
    cal1 = bench.calibration_probe(spark)["min_sec"]
    print(json.dumps({
        "cur": cur, "prev": prv,
        "cur_max": max(cur), "prev_max": max(prv),
        "ratio_max": round(max(cur)/max(prv), 4),
        "cur_median": statistics.median(cur), "prev_median": statistics.median(prv),
        "ratio_median": round(statistics.median(cur)/statistics.median(prv), 4),
        "calibration_sec": [cal0, cal1],
    }))
finally:
    subprocess.run(["git", "worktree", "remove", "--force", wt], cwd=here, capture_output=True)
