import sys, time
sys.path.insert(0, "/root/repo")
mode = sys.argv[1]
from pyspark.sql import functions as F
from movie_genre_data_pipeline_spark.session import build_session
from movie_genre_data_pipeline_spark.suite import all_queries
spark = build_session(app_name="exp-warm")
SF = "/root/testdata/sf0.1"
t0 = time.time()
li = spark.read.parquet(f"{SF}/lineitem.parquet")
li.groupBy("l_returnflag").count().write.format("noop").mode("overwrite").save()
if mode == "deep":
    # exercise join + window + sort + explode codegen paths once
    o = spark.read.parquet(f"{SF}/orders.parquet")
    j = li.join(o, li.l_orderkey == o.o_orderkey).groupBy("o_orderstatus").agg(F.sum("l_extendedprice"))
    j.write.format("noop").mode("overwrite").save()
    from pyspark.sql import Window
    w = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
    li.select("l_returnflag","l_extendedprice", F.row_number().over(w).alias("rn")).filter("rn<=3").write.format("noop").mode("overwrite").save()
    li.select(F.explode(F.split(F.col("l_returnflag"), ""))).groupBy("col").count().write.format("noop").mode("overwrite").save()
print(f"warmup: {time.time()-t0:.3f}")
specs = all_queries()
for name in ("flagship_revenue_by_flag_status","tpch_q1","star_join","window_topk_per_group"):
    runs=[]
    for _ in range(2):
        t0=time.time(); specs[name].fn(spark, SF).write.format("noop").mode("overwrite").save()
        runs.append(round(time.time()-t0,3))
    print(name, runs, "min", min(runs))
