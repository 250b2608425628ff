"""Bit-exactness of the Arrow-batched numpy kernels against their interpreted
expression twins (functions/vectorized.py's contract): same index-order IEEE
folds, same lowest-index tie rule — so swapping one in is a pure physical-plan
change and every oracle stays valid."""

import numpy as np
from pyspark.sql import functions as F

from movie_genre_data_pipeline_spark.functions.kmeans import (
    assign_clusters_two_level,
    kmeans_fit_exact_local,
    quantize_vectors,
)
from movie_genre_data_pipeline_spark.functions.vectorized import (
    assign_cells_two_level_np,
    panel_min_sqdist,
    sqdist_index_fold,
)

SF = "/root/testdata/sf0.001"


def _quantized(spark):
    from movie_genre_data_pipeline_spark.suite import load

    return quantize_vectors(load(spark, SF, "embeddings"), "vec_id", "embedding")


def test_sqdist_index_fold_matches_sequential_python():
    rng = [[float(int(x)) for x in row] for row in
           (np.arange(12).reshape(3, 4) * 7 % 5 - 2)]
    C = [[1.0, -2.0, 0.0, 3.0], [0.5, 0.25, -1.5, 2.0]]
    D = sqdist_index_fold(np.array(rng), np.array(C))
    for r, v in enumerate(rng):
        for c, cv in enumerate(C):
            acc = 0.0
            for a, b in zip(v, cv):
                acc += (a - b) * (a - b)
            assert D[r, c] == acc  # bit-equal, not approx


def test_assign_two_level_np_equals_expression_form(spark):
    q = _quantized(spark).cache()
    cents = kmeans_fit_exact_local(
        [(r["vid"], list(r["vq"])) for r in q.orderBy("vid").limit(64).collect()],
        12,
        3,
    )
    expr = {
        r["vid"]: r["cluster"]
        for r in assign_clusters_two_level(q, "vid", "vq", cents, 2).collect()
    }
    kern = {
        r["vid"]: r["cluster"]
        for r in assign_cells_two_level_np(q, "vid", "vq", cents, 2).collect()
    }
    assert kern == expr


def test_panel_min_sqdist_equals_pair_join_baseline(spark):
    from movie_genre_data_pipeline_spark.suite.similarity_queries import (
        _pq_sqd_col,
    )

    q = _quantized(spark).cache()
    panel = [(r["vid"], list(r["vq"])) for r in q.orderBy("vid").limit(20).collect()]
    kern = {
        r["vid"]: r["d_min"] for r in panel_min_sqdist(q, panel).collect()
    }
    pvids = [v for v, _ in panel]
    a = q.filter(F.col("vid").isin(pvids)).select("vid", F.col("vq").alias("va"))
    b = q.select(F.col("vid").alias("neighbor"), F.col("vq").alias("vb"))
    expr = {
        r["vid"]: r["d_min"]
        for r in a.join(b, F.col("vid") != F.col("neighbor"))
        .select("vid", _pq_sqd_col(F.col("va"), F.col("vb")).alias("d"))
        .groupBy("vid")
        .agg(F.min("d").alias("d_min"))
        .collect()
    }
    assert kern == expr  # exact integral doubles — bit equality


def test_module_imports_without_a_session():
    """Executors import this module when unpickling kernel closures, and they
    never have a SparkSession — so module import must not touch one. (The
    scalar pandas_udfs once declared DDL-string return types, which parse
    through the active session at import: every kernel query crashed
    executor-side with SESSION_OR_CONTEXT_NOT_EXISTS. DataType instances
    keep import session-free; this subprocess has no JVM at all.)"""
    import subprocess
    import sys

    out = subprocess.run(
        [
            sys.executable,
            "-c",
            "import movie_genre_data_pipeline_spark.functions.vectorized as m; "
            "print('imported-ok')",
        ],
        capture_output=True,
        text=True,
        cwd="/root/repo",
    )
    assert out.returncode == 0 and "imported-ok" in out.stdout, out.stderr
