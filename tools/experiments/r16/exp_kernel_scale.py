"""r16 k=16 probe for the two Arrow kernels (VERDICT r15 #5): the fused PQ
assign+encode scan (pq_encode_assign_np, covered via sim_pq_ivfadc in the
scale_bench spot tier) and the per-cell pair scorer (brute_force_top_k) —
the one this script times, since no SCALE_QUERIES member exercises it.

Fixture model: the replica tier carries embedding vectors and labels as-is,
so each IVF cell grows k-fold — per-cell pair COMPUTE grows ~k² by fixture
construction (more data in the same cells; the bench deliberately excludes
fixed-vocabulary-growth shapes for this reason). What the probe validates is
the r16 kernel's MEMORY/EMISSION contract at a 16x cell: the (block x c)
score matrix stays capped (~64 MB), emission stays c*(k+ties) — the pre-r16
kernel would have materialized 256x pair rows per cell here — and the run
completes without executor pressure.

Observed while probing: the kernel's exchange carries only ~16 MB at k=16,
so AQE's byte-based coalescing merges ALL cells into ONE post-shuffle
partition — a compute-dense/byte-light stage that the advisory-size
heuristic serializes. Irrelevant at real scale (cells are GBs, far over the
advisory size) and inherent to this 10-fixed-label toy-IVF fixture; the
learned-cell variants use ~sqrt(n) cells. Recorded in OPTIMIZATION_r16.md.

Usage (expects /tmp/mgdp_scale_x16 left behind by tools/scale_bench.py 16):
  MGDP_PROBE_SAMPLES=1 python tools/experiments/r16/exp_kernel_scale.py
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from movie_genre_data_pipeline_spark.session import build_session
from movie_genre_data_pipeline_spark.suite import all_queries

BASE = "/root/testdata/sf0.1"
SCALED = "/tmp/mgdp_scale_x16"

spark = build_session(app_name="exp-kernel-scale-r16")
li = spark.read.parquet(f"{BASE}/lineitem.parquet")
li.groupBy("l_returnflag").count().write.format("noop").mode("overwrite").save()

specs = all_queries()
out = {}
names = (sys.argv[1].split(",") if len(sys.argv) > 1
         else ["sim_topk_ivf", "sim_topk_bruteforce"])
for name in names:
    base_runs, scaled_runs = [], []
    for _ in range(int(os.environ.get("MGDP_PROBE_SAMPLES", "3"))):
        for dirs, runs in ((BASE, base_runs), (SCALED, scaled_runs)):
            t0 = time.time()
            specs[name].fn(spark, dirs).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(round(time.time() - t0, 3))
    out[name] = {
        "base_sec": min(base_runs),
        "scaled_sec": min(scaled_runs),
        "ratio": round(min(scaled_runs) / min(base_runs), 2),
        "base_runs": base_runs,
        "scaled_runs": scaled_runs,
    }
print(json.dumps(out))
