"""r16 quiet-sitting A/B for the two worst r15 driver readings (VERDICT r15
next-round #2): feat_corr_matrix (0.676x, spans the build round's
DECIMAL(38,0) overflow fix) and dedup_minhash_lsh (0.624x, plan unchanged —
suspected host noise).

Runs ONE tree per JVM (argv[1] = repo root), times each query with the bench's
min-of-2-noop-samples shape plus the bench's drift anchor, prints one JSON
line. An orchestrator alternates the current tree and the r14-verdict commit
(3f5118b) in one sitting; divide query ratios by the drift-anchor ratio before
reading them (the r5/r7 lesson).

Usage:
  git worktree add /tmp/wt_r14 3f5118b
  for i in 1 2 3; do
    python tools/experiments/r16/exp_regress_check.py /root/repo
    python tools/experiments/r16/exp_regress_check.py /tmp/wt_r14
  done
"""
import json
import os
import sys
import time

root = sys.argv[1]
sys.path.insert(0, root)

from movie_genre_data_pipeline_spark.session import build_session  # noqa: E402
from movie_genre_data_pipeline_spark.suite import all_queries  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
QUERIES = ["feat_corr_matrix", "dedup_minhash_lsh"]

spark = build_session(app_name="exp-regress-check")
li = spark.read.parquet(f"{SF}/lineitem.parquet")
li.groupBy("l_returnflag").count().write.format("noop").mode("overwrite").save()

specs = all_queries()
out = {"root": root}
for name in QUERIES:
    runs = []
    for _ in range(2):
        t0 = time.time()
        df = specs[name].fn(spark, SF)
        df.write.format("noop").mode("overwrite").save()
        runs.append(round(time.time() - t0, 3))
    out[name] = min(runs)
    out[name + "_samples"] = runs

drift = []
for _ in range(3):
    t0 = time.time()
    (
        spark.range(0, 20_000_000, 1, 32)
        .selectExpr("id % 1000 AS k", "id AS v")
        .groupBy("k")
        .sum("v")
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    drift.append(round(time.time() - t0, 3))
out["drift_best"] = min(drift)
print(json.dumps(out))
