import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from movie_genre_data_pipeline_spark.session import build_session
spark = build_session(app_name="exp-er")
li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
li.groupBy("l_returnflag").count().write.format("noop").mode("overwrite").save()
from movie_genre_data_pipeline_spark.suite.entity_queries import (
    _CUST_PERTURB_SQL, ER_PURGE_CAP, blocked_candidate_pairs, score_pairs)
from movie_genre_data_pipeline_spark.suite import load
SF = "/root/testdata/sf0.1"

def build(upto):
    customer = load(spark, SF, "customer")
    def grams(df, text):
        return [
            F.substring(F.col(text), 10, 5).alias("b1"),
            F.substring(F.col(text), 12, 5).alias("b2"),
            F.expr(f"substr({text}, length({text}) - 4)").alias("b3"),
        ]
    listings = customer.select(
        F.col("c_custkey").alias("listing_id"),
        F.col("c_name").alias("true_name"),
        F.expr(_CUST_PERTURB_SQL).alias("listing_text"),
    )
    listings = listings.select("*", *grams(listings, "listing_text"))
    catalog = customer.select(F.col("c_custkey").alias("cat_key"), F.col("c_name").alias("cat_name"))
    catalog = catalog.select("*", *grams(catalog, "cat_name"))
    cand = blocked_candidate_pairs(listings, catalog, "listing_id", "cat_key",
        [("b1","b1"),("b2","b2"),("b3","b3")], max_pair_volume=ER_PURGE_CAP)
    if upto == "cand": return cand
    joined = cand.join(listings.select("listing_id","listing_text","true_name"), "listing_id") \
                 .join(catalog.select("cat_key","cat_name"), "cat_key")
    if upto == "joined": return joined
    scored = score_pairs(joined, "listing_text", "cat_name").withColumn("lev", F.col("lev").cast("bigint"))
    if upto == "scored": return scored
    per_listing = scored.groupBy("listing_id","true_name").agg(
        F.count(F.lit(1)).cast("bigint").alias("__n_cand"),
        F.min(F.struct("lev","cat_name","cat_key")).alias("__best"))
    return per_listing

for rnd in range(3):
    out = []
    for stage in ("cand","joined","scored","full"):
        t0=time.time(); build(stage).write.format("noop").mode("overwrite").save()
        out.append(f"{stage}={time.time()-t0:.3f}")
    print(f"round {rnd}: " + "  ".join(out))
