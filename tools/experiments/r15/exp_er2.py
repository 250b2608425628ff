import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from movie_genre_data_pipeline_spark.session import build_session
spark = build_session(app_name="exp-er2")
li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
li.groupBy("l_returnflag").count().write.format("noop").mode("overwrite").save()
from movie_genre_data_pipeline_spark.suite.entity_queries import (
    _CUST_PERTURB_SQL, ER_PURGE_CAP, blocked_candidate_pairs, score_pairs)
from movie_genre_data_pipeline_spark.suite import load
SF = "/root/testdata/sf0.1"

def melted_pairs(left, right, left_id, right_id, passes, max_pair_volume=None):
    def melt(df, idc, keys):
        sides = []
        for i, k in enumerate(keys):
            sides.append(
                df.filter(F.col(k).isNotNull() & (F.col(k) != "")).select(
                    F.col(idc), F.lit(i).alias("__p"), F.col(k).alias("__bk")
                )
            )
        out = sides[0]
        for s in sides[1:]:
            out = out.unionByName(s)
        return out
    l_side = melt(left, left_id, [lk for lk, _ in passes])
    r_side = melt(right, right_id, [rk for _, rk in passes])
    if max_pair_volume is not None:
        lc = l_side.groupBy("__p", "__bk").agg(F.count("*").alias("__lc"))
        rc = r_side.groupBy("__p", "__bk").agg(F.count("*").alias("__rc"))
        blocked = (
            lc.join(rc, ["__p", "__bk"])
            .filter(F.col("__lc") * F.col("__rc") > max_pair_volume)
            .select("__p", "__bk")
        )
        l_side = l_side.join(blocked, ["__p", "__bk"], "left_anti")
    return l_side.join(r_side, ["__p", "__bk"]).select(left_id, right_id).distinct()

def frames():
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
    return listings, catalog

PASSES = [("b1","b1"),("b2","b2"),("b3","b3")]

def tail(cand, listings, catalog):
    scored = score_pairs(
        cand.join(listings.select("listing_id","listing_text","true_name"), "listing_id")
            .join(catalog.select("cat_key","cat_name"), "cat_key"),
        "listing_text","cat_name").withColumn("lev", F.col("lev").cast("bigint"))
    per_listing = scored.groupBy("listing_id","true_name").agg(
        F.count(F.lit(1)).cast("bigint").alias("__n_cand"),
        F.min(F.struct("lev","cat_name","cat_key")).alias("__best"))
    correct = F.sum(F.when(F.col("__best.cat_name")==F.col("true_name"),1).otherwise(0)).cast("bigint")
    return per_listing.agg(
        F.sum("__n_cand").cast("bigint").alias("n_candidates"),
        F.count("*").cast("bigint").alias("n_listings"),
        correct.alias("n_correct"),
        F.round(correct.cast("double")/F.count("*").cast("double"),6).alias("recall"),
    ).select("n_candidates","n_listings","n_correct","recall")

def variant_a():
    l, c = frames()
    return tail(blocked_candidate_pairs(l, c, "listing_id","cat_key", PASSES, max_pair_volume=ER_PURGE_CAP), l, c)

def variant_b():
    l, c = frames()
    return tail(melted_pairs(l, c, "listing_id","cat_key", PASSES, max_pair_volume=ER_PURGE_CAP), l, c)

print("IDENT:", [tuple(r) for r in variant_a().collect()] == [tuple(r) for r in variant_b().collect()])
for rnd in range(3):
    t0=time.time(); variant_a().write.format("noop").mode("overwrite").save(); ta=time.time()-t0
    t0=time.time(); variant_b().write.format("noop").mode("overwrite").save(); tb=time.time()-t0
    print(f"round {rnd}: per-pass={ta:.3f}  melted={tb:.3f}")

def melted_tagged(left, right, left_id, right_id, passes, max_pair_volume=None):
    def melt(df, idc, keys):
        sides = []
        for i, k in enumerate(keys):
            sides.append(
                df.filter(F.col(k).isNotNull() & (F.col(k) != "")).select(
                    F.col(idc), F.lit(i).alias("__p"), F.col(k).alias("__bk")
                )
            )
        out = sides[0]
        for s in sides[1:]:
            out = out.unionByName(s)
        return out
    l_side = melt(left, left_id, [lk for lk, _ in passes])
    r_side = melt(right, right_id, [rk for _, rk in passes])
    if max_pair_volume is not None:
        tagged = l_side.select("__p", "__bk", F.lit(1).alias("__l")).unionByName(
            r_side.select("__p", "__bk", F.lit(0).alias("__l")))
        blocked = (
            tagged.groupBy("__p", "__bk")
            .agg(F.sum("__l").alias("__lc"), F.sum(1 - F.col("__l")).alias("__rc"))
            .filter(F.col("__lc") * F.col("__rc") > max_pair_volume)
            .select("__p", "__bk")
        )
        l_side = l_side.join(blocked, ["__p", "__bk"], "left_anti")
    return l_side.join(r_side, ["__p", "__bk"]).select(left_id, right_id).distinct()

def variant_c():
    l, c = frames()
    return tail(melted_tagged(l, c, "listing_id","cat_key", PASSES, max_pair_volume=ER_PURGE_CAP), l, c)

print("IDENT C:", [tuple(r) for r in variant_a().collect()] == [tuple(r) for r in variant_c().collect()])
for rnd in range(3):
    t0=time.time(); variant_a().write.format("noop").mode("overwrite").save(); ta=time.time()-t0
    t0=time.time(); variant_b().write.format("noop").mode("overwrite").save(); tb=time.time()-t0
    t0=time.time(); variant_c().write.format("noop").mode("overwrite").save(); tc=time.time()-t0
    print(f"round2 {rnd}: per-pass={ta:.3f}  melted={tb:.3f}  tagged={tc:.3f}")
