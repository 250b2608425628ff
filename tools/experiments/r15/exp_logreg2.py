import sys, time
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/tmp"); sys.path.insert(0, __file__.rsplit("/", 1)[0])
mode = sys.argv[1]
from pyspark.sql import functions as F
from movie_genre_data_pipeline_spark.session import build_session
spark = build_session(app_name="exp2")
li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
li.groupBy("l_returnflag").count().write.format("noop").mode("overwrite").save()
import exp_logreg_lib as L
L.spark = spark
fn = L.literal_run if mode == "lit" else L.param_run
for i in range(2):
    t0 = time.time(); fn(); print(f"{mode} sample{i}: {time.time()-t0:.3f}s")
