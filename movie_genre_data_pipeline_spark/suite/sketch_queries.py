"""Count-Min sketch queries over `documents` (north star: fixed-size frequency
estimation — the heavy-hitter / boilerplate-phrase detector that still works
when the key space is billions of n-grams).

`sketch_cms_heavy_hitters` builds a d×w Count-Min grid over every word 3-gram
occurrence in the corpus, probes the vocabulary back through the grid, and
reports the top phrases by estimated count next to their exact counts — the
overestimate column IS the sketch's documented error, reproduced bit-for-bit
by the oracle (same md5 cell math, same min-of-counters).

Scale shape: the build shuffle is bounded by the grid (d·w cells), not the
16k+ (at sf0.01; billions at 100 TB) distinct grams; the probe is d broadcast
joins; the top-k is a TakeOrderedAndProject, never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movie_genre_data_pipeline_spark.functions.cms import build_cms, cms_estimate
from movie_genre_data_pipeline_spark.functions.dedup import shingle_rows
from movie_genre_data_pipeline_spark.suite import QuerySpec, load
from movie_genre_data_pipeline_spark.suite.text_queries import _TOKS

CMS_W = 1024
CMS_D = 3
GRAM_K = 3
TOP_N = 20


def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    grams = shingle_rows(d, "doc_id", "text", k=GRAM_K).select(
        F.col("s").alias("gram")
    )
    # the (≤ d·w)-row grid is referenced d times by the probe joins; checkpoint
    # so Catalyst doesn't re-derive the corpus scan per reference — persist-the-
    # sketch-once is also exactly the production usage.
    cms = build_cms(grams, "gram", CMS_W, CMS_D).localCheckpoint()
    vocab = grams.groupBy("gram").agg(F.count(F.lit(1)).cast("bigint").alias("n_exact"))
    est = cms_estimate(vocab, "gram", cms, CMS_W, CMS_D)
    return (
        est.select(
            "gram",
            "n_exact",
            F.col("cms_est").cast("bigint").alias("cms_est"),
            (F.col("cms_est") - F.col("n_exact")).cast("bigint").alias("overcount"),
        )
        .orderBy(F.col("cms_est").desc(), F.col("gram").asc())
        .limit(TOP_N)
    )


_CMS_ROWS = ", ".join(f"({r})" for r in range(CMS_D))
_CMS_CELL = (
    "CAST(concat('0x', substring(md5(gram || ':' || r), 1, 12)) AS BIGINT)"
    f" % {CMS_W}"
)
Q_CMS_HEAVY_HITTERS_ORACLE = f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
grams AS (
  SELECT array_to_string(toks[i:i + {GRAM_K - 1}], ' ') AS gram
  FROM (SELECT * FROM toks WHERE len(toks) >= {GRAM_K}) t,
       unnest(generate_series(1, len(toks) - {GRAM_K - 1})) AS g(i)
),
vocab AS (SELECT gram, CAST(COUNT(*) AS BIGINT) AS n_exact FROM grams GROUP BY 1),
cells AS (
  SELECT r, {_CMS_CELL} AS col_idx, SUM(n_exact) AS cnt
  FROM vocab CROSS JOIN (VALUES {_CMS_ROWS}) h(r)
  GROUP BY 1, 2
),
est AS (
  SELECT gram, n_exact, MIN(cnt) AS cms_est
  FROM (SELECT gram, n_exact, r, {_CMS_CELL} AS col_idx
        FROM vocab CROSS JOIN (VALUES {_CMS_ROWS}) h(r)) p
  JOIN cells USING (r, col_idx)
  GROUP BY gram, n_exact
)
SELECT gram, n_exact,
       CAST(cms_est AS BIGINT) AS cms_est,
       CAST(cms_est - n_exact AS BIGINT) AS overcount
FROM est
ORDER BY cms_est DESC, gram ASC
LIMIT {TOP_N}
"""


QUERIES: dict[str, QuerySpec] = {
    "sketch_cms_heavy_hitters": QuerySpec(
        q_cms_heavy_hitters, Q_CMS_HEAVY_HITTERS_ORACLE
    ),
}
