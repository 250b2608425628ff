import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from movie_genre_data_pipeline_spark.session import build_session
spark = build_session(app_name="exp-dsir")
li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
li.groupBy("l_returnflag").count().write.format("noop").mode("overwrite").save()
from movie_genre_data_pipeline_spark.functions.sampling import (
    dsir_importance, dsir_term_buckets, dsir_fold_scores)
from movie_genre_data_pipeline_spark.suite import load
SF = "/root/testdata/sf0.1"
B = 256

def dsir_importance_onepass(df, id_col, text_col, target_flag, n_buckets=256):
    b = int(n_buckets)
    terms = dsir_term_buckets(df, id_col, text_col, target_flag, b)
    postings = terms.groupBy("doc_id", "__tgt", "bucket").agg(
        F.count(F.lit(1)).alias("tf"))
    buckets = postings.groupBy("bucket").agg(
        F.sum("tf").alias("raw_c"),
        F.sum(F.when(F.col("__tgt"), F.col("tf")).otherwise(F.lit(0))).alias("tgt_c"),
    )
    scored = dsir_fold_scores(postings, buckets, b)
    return (
        df.select(F.col(id_col).alias("doc_id"))
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0)).cast("bigint").alias("n_tokens"),
            F.coalesce("logw_micro", F.lit(0)).cast("bigint").alias("logw_micro"),
        )
    )

def report(w):
    d = load(spark, SF, "documents")
    return (
        d.select("doc_id", "source").join(w, "doc_id").groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.when(F.col("logw_micro") > 0, F.lit(1)).otherwise(F.lit(0))).cast("bigint").alias("n_selected"),
            F.sum(F.when(F.col("logw_micro") > 0, F.col("logw_micro")).otherwise(F.lit(0))).cast("bigint").alias("s"),
        )
    )

def variant_a():
    d = load(spark, SF, "documents")
    return report(dsir_importance(d, "doc_id", "text", (F.col("lang") == "en"), n_buckets=B))

def variant_b():
    d = load(spark, SF, "documents")
    return report(dsir_importance_onepass(d, "doc_id", "text", (F.col("lang") == "en"), n_buckets=B))

ra = sorted(repr(tuple(r)) for r in variant_a().collect())
rb = sorted(repr(tuple(r)) for r in variant_b().collect())
print("IDENT:", ra == rb)
# also check the raw per-doc frame identity
d = load(spark, SF, "documents")
wa = sorted(repr(tuple(r)) for r in dsir_importance(d, "doc_id", "text", (F.col("lang") == "en"), n_buckets=B).collect())
wb = sorted(repr(tuple(r)) for r in dsir_importance_onepass(d, "doc_id", "text", (F.col("lang") == "en"), n_buckets=B).collect())
print("IDENT per-doc:", wa == wb)
for rnd in range(3):
    t0=time.time(); variant_a().write.format("noop").mode("overwrite").save(); ta=time.time()-t0
    t0=time.time(); variant_b().write.format("noop").mode("overwrite").save(); tb=time.time()-t0
    print(f"round {rnd}: two-pass={ta:.3f}  one-pass={tb:.3f}")
