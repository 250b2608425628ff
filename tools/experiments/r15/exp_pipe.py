import sys, time
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/tmp"); sys.path.insert(0, __file__.rsplit("/", 1)[0])
mode = sys.argv[1]
from movie_genre_data_pipeline_spark.session import build_session
spark = build_session(app_name="exp-pipe")
li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
li.groupBy("l_returnflag").count().write.format("noop").mode("overwrite").save()
import exp_pipe_lib as L
L.spark = spark
fn = {"a": L.variant_a, "b": L.variant_b, "c": L.variant_c}[mode]
for i in range(2):
    t0 = time.time()
    df = fn()
    df.write.format("noop").mode("overwrite").save()
    print(f"{mode} sample{i}: {time.time()-t0:.3f}s")
# correctness vs variant a
rows = sorted([tuple(r) for r in fn().collect()])
base = sorted([tuple(r) for r in L.variant_a().collect()])
print("IDENTICAL:", rows == base, rows[:2])
