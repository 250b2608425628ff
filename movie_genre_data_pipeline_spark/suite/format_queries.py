"""Source/sink format round-trips (beyond Parquet): JSONL — the de-facto LLM
training-corpus interchange format — and ORC. Each query writes from the parquet
fixture, reads back through the declared-schema source, and aggregates; the
oracle computes the same aggregate straight from parquet, so a hash match proves
BOTH the sink and the source are faithful (same pattern as `csv_roundtrip`).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movie_genre_data_pipeline_spark.suite import QuerySpec, load


def q_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from movie_genre_data_pipeline_spark.sources.batch import read_jsonl

    d = load(spark, sf_dir, "documents")
    path = f"{tempfile.mkdtemp(prefix='mgdp_jsonl_')}/documents_jsonl"
    d.write.format("json").mode("overwrite").save(path)
    back = read_jsonl(
        spark,
        path,
        "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT",
    )
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("text")).cast("bigint").alias("total_chars"),
        F.md5(
            F.concat_ws("|", F.sort_array(F.collect_list(F.md5("text"))))
        ).alias("corpus_digest"),
    )


Q_JSONL_ROUNDTRIP_ORACLE = """
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(length(text)) AS BIGINT) AS total_chars,
       md5(array_to_string(list_sort(list(md5(text))), '|')) AS corpus_digest
FROM documents GROUP BY lang
"""


def q_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from movie_genre_data_pipeline_spark.sources.batch import read_orc

    c = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal", "c_mktsegment"
    )
    path = f"{tempfile.mkdtemp(prefix='mgdp_orc_')}/customer_orc"
    c.write.format("orc").mode("overwrite").save(path)
    back = read_orc(spark, path)
    return back.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        F.countDistinct("c_nationkey").alias("n_nations"),
    )


Q_ORC_ROUNDTRIP_ORACLE = """
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(c_acctbal), 2) AS total_bal,
       CAST(COUNT(DISTINCT c_nationkey) AS BIGINT) AS n_nations
FROM customer GROUP BY c_mktsegment
"""


QUERIES: dict[str, QuerySpec] = {
    "jsonl_roundtrip": QuerySpec(q_jsonl_roundtrip, Q_JSONL_ROUNDTRIP_ORACLE),
    "orc_roundtrip": QuerySpec(q_orc_roundtrip, Q_ORC_ROUNDTRIP_ORACLE),
}
