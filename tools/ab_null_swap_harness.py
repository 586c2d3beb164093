# NULL experiment: both sides identical code (HEAD); side "swapped"
# runs through the worktree/module-swap harness machinery. A gap here
# is harness artifact, not engine code.
import json, statistics, subprocess, sys, tempfile, shutil
sys.path.insert(0, "/root/repo")
import bench
from event_stream_aggr_spark.session import get_spark

here = "/root/repo"
head = subprocess.run(["git", "rev-parse", "HEAD"], cwd=here, capture_output=True, text=True).stdout.strip()
wt = tempfile.mkdtemp(prefix="ab_nd_null_wt_"); shutil.rmtree(wt)
subprocess.run(["git", "worktree", "add", "--detach", wt, head], cwd=here, check=True, capture_output=True)
try:
    prev_fns, prev_modules = bench._load_registry_from(wt)
    spark = get_spark(app_name="ab_nd_null")
    bench.near_dedup_stream_bench(spark)  # warmup
    live, swapped = [], []
    def _live():
        with bench._conf_fence(spark):
            live.append(bench.near_dedup_stream_bench(spark)["docs_per_sec"])
    def _swapped():
        with bench._swapped_modules(prev_modules, wt), bench._conf_fence(spark):
            swapped.append(bench.near_dedup_stream_bench(spark)["docs_per_sec"])
    for i in range(4):
        a, b = (_live, _swapped) if i % 2 == 0 else (_swapped, _live)
        a(); b()
    print(json.dumps({
        "live": live, "swapped": swapped,
        "ratio_median_live_over_swapped": round(
            statistics.median(live)/statistics.median(swapped), 4),
    }))
finally:
    subprocess.run(["git", "worktree", "remove", "--force", wt], cwd=here, capture_output=True)
