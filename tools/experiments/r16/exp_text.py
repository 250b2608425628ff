"""r16 A/B: text_tfidf_topk exchange-sharing + text_bm25_topk dl-carry.

Candidate 1 (tfidf): repartition the exploded tokens by `term` BEFORE the
(doc_id, term) tf aggregate. HashPartitioning(term) satisfies the aggregate's
ClusteredDistribution({doc_id, term}) AND the df-window's
ClusteredDistribution({term}), so the aggregate and the window share ONE
exchange (guide §2.4 "two operations keyed the same way") — 3 exchanges -> 2.
Trade-off measured here: the shared exchange carries RAW exploded token rows
(no map-side partial aggregation) vs the current plan's two smaller exchanges.

Candidate 2 (bm25): carry each doc's length through the explode
(groupBy(doc_id, dl, term) — dl is functionally dependent on doc_id), so the
postings⨝lengths join disappears and the corpus is tokenized twice (corpus
stats + postings) instead of three times (stats, join build, postings).

Both candidates are proven BIT-IDENTICAL on the full query output before
timing. Usage: python tools/experiments/r16/exp_text.py [tfidf|bm25|both]
"""
import sys, time

sys.path.insert(0, "/root/repo")
from pyspark.sql import Window
from pyspark.sql import functions as F

from movie_genre_data_pipeline_spark.session import build_session
from movie_genre_data_pipeline_spark.suite import load
from movie_genre_data_pipeline_spark.suite.text_queries import (
    BM25_TERMS,
    bm25_from_counts,
    q_bm25_topk,
    q_tfidf_topk,
)
from movie_genre_data_pipeline_spark.functions.text import alpha_tokens

SF = "/root/testdata/sf0.1"


def tfidf_variant(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(alpha_tokens("text")).alias("term"))
    tf = toks.repartition("term").groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    dfw = F.count(F.lit(1)).over(Window.partitionBy("term"))
    n_docs = d.agg(F.countDistinct("doc_id").alias("n_docs"))
    scored = (
        tf.withColumn("df", dfw)
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            "tf",
            F.round(
                F.col("tf")
                * F.log((F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0))),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "term", "tf", "tfidf", F.col("rnk").cast("int").alias("rnk"))
    )


def bm25_variant(spark, sf_dir):
    # self-contained dl-carry variant (REJECTED on the measured numbers; kept
    # here verbatim so the verdict stays reproducible without a library knob)
    from movie_genre_data_pipeline_spark.suite.text_queries import (
        _BM25_SCORE,
        BM25_TOPK,
    )

    d = load(spark, sf_dir, "documents")
    docs = d.select("doc_id", alpha_tokens("text").alias("__a"))
    dl = docs.select("doc_id", F.size("__a").cast("bigint").alias("dl"))
    tf = (
        docs.select(
            "doc_id",
            F.size("__a").cast("bigint").alias("dl"),
            F.explode("__a").alias("term"),
        )
        .filter(F.col("term").isin(list(BM25_TERMS)))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    dfw = F.count(F.lit(1)).over(Window.partitionBy("term"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("dl").cast("bigint").alias("total"),
    )
    scored = (
        tf.withColumn("df", dfw.cast("bigint"))
        .crossJoin(F.broadcast(stats))
        .selectExpr("doc_id", "term", f"{_BM25_SCORE} AS s_micro")
    )
    agg = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_terms"),
        F.sum("s_micro").cast("bigint").alias("score_micro"),
    )
    top = agg.orderBy(F.col("score_micro").desc(), F.col("doc_id").asc()).limit(
        BM25_TOPK
    )
    w = Window.partitionBy(
        F.nullif(F.col("doc_id"), F.lit(-1)) * F.lit(0)
    ).orderBy(F.col("score_micro").desc(), F.col("doc_id").asc())
    return top.select(
        F.row_number().over(w).cast("int").alias("rnk"),
        "doc_id",
        "n_terms",
        "score_micro",
    )


def rows_of(df):
    return sorted(repr(sorted(r.asDict().items())) for r in df.collect())


def ab(spark, name, cur_fn, var_fn, rounds=3):
    cur = cur_fn(spark, SF)
    var = var_fn(spark, SF)
    assert rows_of(cur) == rows_of(var), f"{name}: VARIANT NOT IDENTICAL"
    print(f"{name}: outputs bit-identical "
          f"({cur.count()} rows); exchanges cur/var:",
          cur._jdf.queryExecution().executedPlan().toString().count("Exchange"),
          var._jdf.queryExecution().executedPlan().toString().count("Exchange"))
    for r in range(rounds):
        for tag, fn in (("cur", cur_fn), ("var", var_fn)):
            t0 = time.time()
            df = fn(spark, SF)
            df.write.format("noop").mode("overwrite").save()
            print(f"{name} round{r} {tag}: {time.time()-t0:.3f}s", flush=True)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    spark = build_session(app_name="exp-text-r16")
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    li.groupBy("l_returnflag").count().write.format("noop").mode("overwrite").save()
    if which in ("tfidf", "both"):
        ab(spark, "tfidf", q_tfidf_topk, tfidf_variant)
    if which in ("bm25", "both"):
        ab(spark, "bm25", q_bm25_topk, bm25_variant)


if __name__ == "__main__":
    main()
