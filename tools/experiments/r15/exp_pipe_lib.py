import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from movie_genre_data_pipeline_spark.suite.curation_queries import (
    BENCH_SOURCES, DECON_K, DECON_THRESHOLD, MIXTURE_WEIGHTS, PIPE_TARGET,
    CHUNK_WINDOW, CHUNK_STRIDE, q_corpus_pipeline,
    gopher_flags, repetition_profile, decontaminate, mixture_resample,
    chunk_documents,
)
from movie_genre_data_pipeline_spark.suite import load
from movie_genre_data_pipeline_spark.functions.dedup import exact_dedup, shingle_rows

spark = None
SF = "/root/testdata/sf0.1"


def variant_a():
    """current implementation"""
    return q_corpus_pipeline(spark, SF)


def _common_kept():
    d = load(spark, SF, "documents")
    bench_pred = F.col("source").isin(*BENCH_SOURCES)
    corpus, bench = d.filter(~bench_pred), d.filter(bench_pred)
    keep_ids = (
        gopher_flags(repetition_profile(corpus, "doc_id", "text"))
        .filter(F.col("keep"))
        .select("doc_id")
    )
    kept = corpus.join(keep_ids, "doc_id")
    kept = exact_dedup(kept, "doc_id", "text").localCheckpoint(eager=False)
    return kept, bench


def _decon_carry(kept, bench):
    bench_sh = (
        shingle_rows(bench, "doc_id", "text", k=DECON_K)
        .select(F.md5("s").alias("sh"))
        .distinct()
        .withColumn("__hit", F.lit(True))
    )
    overlap = (
        shingle_rows(kept, "doc_id", "text", k=DECON_K)
        .select("doc", F.md5("s").alias("sh"))
        .distinct()
        .join(F.broadcast(bench_sh), "sh", "left")
        .groupBy("doc")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("__n_sh"),
            F.count(F.col("__hit")).cast("bigint").alias("__n_cont"),
        )
    )
    return (
        kept.join(overlap, F.col("doc_id") == F.col("doc"), "left")
        .filter(
            ~(
                F.round(
                    F.coalesce(F.col("__n_cont") / F.col("__n_sh"), F.lit(0.0)), 6
                )
                >= F.lit(DECON_THRESHOLD)
            )
        )
        .drop("doc", "__n_sh", "__n_cont")
    )


def _tail(kept):
    kept = mixture_resample(kept, "doc_id", "lang", MIXTURE_WEIGHTS, PIPE_TARGET, salt="mixture")
    ch = chunk_documents(kept, "doc_id", "text", CHUNK_WINDOW, CHUNK_STRIDE, extra_cols=("lang",))
    return ch.groupBy("lang").agg(
        F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
        F.sum("n_chunk_tokens").cast("bigint").alias("n_tokens"),
    )


def variant_b():
    """carry-through decon, NO second barrier"""
    kept, bench = _common_kept()
    return _tail(_decon_carry(kept, bench))


def variant_c():
    """carry-through decon, keep second barrier"""
    kept, bench = _common_kept()
    return _tail(_decon_carry(kept, bench).localCheckpoint(eager=False))
