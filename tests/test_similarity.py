"""Similarity-function laws: the JL signed random projection (exactness of
the integer projection and distance-distortion concentration in k)."""

from __future__ import annotations


def test_random_projection_concentration_improves_with_k(spark):
    """JL concentration: the signed projection's distance-distortion spread
    tightens as k grows (k=64 strictly tighter than k=4 on the same pairs),
    and every projection component is the exact signed integer sum."""
    from pyspark.sql import functions as F

    from movie_genre_data_pipeline_spark.functions.kmeans import quantize_vectors
    from movie_genre_data_pipeline_spark.functions.similarity import (
        project_signed,
        sign_matrix,
    )
    from movie_genre_data_pipeline_spark.suite import load

    e = load(spark, "/root/testdata/sf0.001", "embeddings")
    q = quantize_vectors(e, "vec_id", "embedding")

    def spread(k: int) -> float:
        proj = q.select("vid", "vq", project_signed("vq", sign_matrix(k, 64)).alias("pv"))
        a = proj.selectExpr("vid AS avid", "vq AS va", "pv AS pa").filter("avid % 2 = 0")
        b = proj.selectExpr("vid AS bvid", "vq AS vb", "pv AS pb")
        rows = (
            a.join(b, F.expr("avid + 1 = bvid"))
            .selectExpr(
                "aggregate(zip_with(pa, pb, (x, y) -> (x - y) * (x - y)), 0L, (acc, t) -> acc + t) AS dp2",
                "aggregate(zip_with(va, vb, (x, y) -> (x - y) * (x - y)), 0D, (acc, t) -> acc + t) AS do2",
            )
            .selectExpr(f"CAST(dp2 AS DOUBLE) / {k} / do2 AS r")
            .collect()
        )
        rs = [r["r"] for r in rows]
        return max(rs) - min(rs)

    assert spread(64) < spread(4)

    one = q.filter(F.col("vid") == 0).select(
        "vq", project_signed("vq", sign_matrix(2, 64)).alias("pv")
    ).collect()[0]
    signs = sign_matrix(2, 64)
    for j in range(2):
        assert one["pv"][j] == int(sum(s * v for s, v in zip(signs[j], one["vq"])))


def test_rerank_recall_dominates_projected_argmin_same_candidates(spark):
    """The two-stage law, restated for the r9 cell-restricted shortlist:
    within the SAME probed candidate set, exact reranking of the projected
    top-JL_SHORTLIST (which contains the projected argmin) can only fix
    picks, never break them — so rerank recall@1 >= the recall of taking
    the projected argmin directly from those candidates. Both sides are
    computed from one pdist frame through the shared _pq_recall_tail, so
    the comparison isolates exactly the rerank stage."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from movie_genre_data_pipeline_spark.functions.kmeans import (
        kmeans_fit_exact_local,
        probe_cells,
        quantize_vectors,
    )
    from movie_genre_data_pipeline_spark.functions.similarity import (
        project_signed,
        sign_matrix,
    )
    from movie_genre_data_pipeline_spark.functions.vectorized import (
        assign_cells_two_level_np,
    )
    from movie_genre_data_pipeline_spark.suite import load
    from movie_genre_data_pipeline_spark.suite.similarity_queries import (
        DIM,
        IVF_GROUP_ITERS,
        IVF_ITERS,
        JL_K,
        JL_SHORTLIST,
        PQ_NPROBE,
        _collect_train,
        _ivf_nlist,
        _pq_query_panel,
        _pq_recall_tail,
        _pq_sqd_col,
        _pq_tune,
    )

    _pq_tune(spark)
    sf = "/root/testdata/sf0.001"
    e = load(spark, sf, "embeddings")
    q = quantize_vectors(e, "vec_id", "embedding").cache()
    cents = kmeans_fit_exact_local(
        _collect_train(q), _ivf_nlist(q.count()), IVF_ITERS
    )
    cells = assign_cells_two_level_np(
        q, "vid", "vq", cents, IVF_GROUP_ITERS
    ).select("vid", "cluster")
    proj = q.select("vid", project_signed("vq", sign_matrix(JL_K, DIM)).alias("pv"))
    qs = _pq_query_panel(q)
    a = proj.join(qs, "vid").select("vid", F.col("pv").alias("pa"))
    probes = probe_cells(q.join(qs, "vid"), cents, PQ_NPROBE)
    b = proj.join(cells, "vid").select(
        F.col("vid").alias("neighbor"), F.col("pv").alias("pb"), "cluster"
    )
    pdist = (
        probes.join(a, "vid")
        .join(b, "cluster")
        .filter(F.col("vid") != F.col("neighbor"))
        .select(
            "vid",
            "neighbor",
            F.aggregate(
                F.zip_with(F.col("pa"), F.col("pb"), lambda x, y: (x - y) * (x - y)),
                F.lit(0).cast("bigint"),
                lambda acc, t: acc + t,
            ).alias("pd2"),
        )
        .cache()
    )
    # projected-argmin pick within the candidates: feed pdist straight in
    proj_pick = _pq_recall_tail(q, qs, pdist.withColumnRenamed("pd2", "adc"))
    # rerank pick: exact L2 over the projected top-JL_SHORTLIST
    w = Window.partitionBy("vid").orderBy(F.col("pd2").asc(), F.col("neighbor").asc())
    shortlist = (
        pdist.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= JL_SHORTLIST)
        .select("vid", "neighbor")
    )
    qa = q.select("vid", F.col("vq").alias("va"))
    qb = q.select(F.col("vid").alias("neighbor"), F.col("vq").alias("vb"))
    adc = (
        shortlist.join(qa, "vid")
        .join(qb, "neighbor")
        .select("vid", "neighbor", _pq_sqd_col(F.col("va"), F.col("vb")).alias("adc"))
    )
    rerank = _pq_recall_tail(q, qs, adc).collect()[0]
    proj_only = proj_pick.collect()[0]
    assert rerank["n_queries"] == proj_only["n_queries"]
    assert rerank["n_hits"] >= proj_only["n_hits"]


def test_mmr_degenerate_weights_reduce_to_topk(spark):
    """MMR law: with the diversity weight at 0 the greedy marginal score is
    w_rel*d_rel alone, so the selection must equal the plain top-k by
    (d_rel, neighbor) — rank for rank. And with the real 7/3 weights the
    k picks are distinct members of the shortlist."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from movie_genre_data_pipeline_spark.functions.kmeans import quantize_vectors
    from movie_genre_data_pipeline_spark.functions.similarity import mmr_greedy
    from movie_genre_data_pipeline_spark.suite import load

    def sqd(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    e = load(spark, "/root/testdata/sf0.001", "embeddings")
    q = quantize_vectors(e, "vec_id", "embedding")
    qs = q.select("vid").orderBy("vid").limit(10)
    a = q.join(qs, "vid").select("vid", F.col("vq").alias("va"))
    b = q.select(F.col("vid").alias("neighbor"), F.col("vq").alias("vb"))
    cand = a.join(b, F.col("vid") != F.col("neighbor")).select(
        "vid", "neighbor", sqd(F.col("va"), F.col("vb")).alias("d_rel"), "vb"
    )
    w = Window.partitionBy("vid").orderBy(
        F.col("d_rel").asc(), F.col("neighbor").asc()
    )
    short = (
        cand.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= 8)
        .drop("__rn")
        .cache()
    )

    # degenerate weights: selection == top-k by relevance, rank for rank
    got = {
        (r["vid"], r["sel_rank"]): r["neighbor"]
        for r in mmr_greedy(short, 4, 1, 0).collect()
    }
    want = {
        (r["vid"], r["__rn"]): r["neighbor"]
        for r in short.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= 4)
        .collect()
    }
    assert got == want

    # real weights: per query, k distinct picks, all from the shortlist
    rows = mmr_greedy(short, 4, 7, 3).collect()
    members = {(r["vid"], r["neighbor"]) for r in short.collect()}
    by_vid = {}
    for r in rows:
        by_vid.setdefault(r["vid"], []).append(r["neighbor"])
        assert (r["vid"], r["neighbor"]) in members
        if r["sel_rank"] > 1:
            assert r["d_div"] >= 0
    for picks in by_vid.values():
        assert len(picks) == 4 and len(set(picks)) == 4
    short.unpersist()
