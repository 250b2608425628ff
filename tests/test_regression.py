"""Closed-form OLS (functions/regression.py): known-answer recovery, exactness
of the Gram aggregate, and partition-order independence."""

from __future__ import annotations

from movie_genre_data_pipeline_spark.functions.regression import (
    ols_fit_micro,
    ols_gram,
)


def _fit(spark, rows):
    df = spark.createDataFrame(rows, "x1 bigint, x2 bigint, y bigint")
    return {
        r[0]: (r["beta0_micro"], r["beta1_micro"], r["beta2_micro"])
        for r in [ols_fit_micro(df, "x1", "x2", "y").collect()[0]]
    }, ols_fit_micro(df, "x1", "x2", "y").collect()[0]


def test_ols_recovers_exact_plane(spark):
    """Data generated from y = 7 + 3*x1 - 2*x2 with no noise: OLS must
    recover the plane exactly (residuals are zero, so the solve is exact up
    to the shared-expression float evaluation — micro-units round clean)."""
    rows = [
        (x1, x2, 7 + 3 * x1 - 2 * x2)
        for x1 in range(0, 20)
        for x2 in range(0, 5)
    ]
    _, r = _fit(spark, rows)
    assert r["n_rows"] == 100
    assert r["beta0_micro"] == 7_000_000
    assert r["beta1_micro"] == 3_000_000
    assert r["beta2_micro"] == -2_000_000


def test_gram_sums_are_partition_order_independent(spark):
    rows = [(i % 17, i % 5, (i * 31) % 1000) for i in range(500)]
    df1 = spark.createDataFrame(rows, "x1 bigint, x2 bigint, y bigint")
    df2 = df1.repartition(13)
    g1 = ols_gram(df1, "x1", "x2", "y").collect()[0].asDict()
    g2 = ols_gram(df2, "x1", "x2", "y").collect()[0].asDict()
    assert g1 == g2
    # and they equal plain-Python exact sums
    assert g1["s1y"] == sum(a * c for a, _, c in rows)
    assert g1["s12"] == sum(a * b for a, b, _ in rows)


def test_ols_matches_numpy_lstsq(spark):
    """Cross-check against an independent solver on noisy integer data (the
    numerics differ — numpy uses SVD — so compare at solver tolerance, not
    bitwise)."""
    import numpy as np

    rows = [
        (i % 23, (i * 7) % 11, 500 + 13 * (i % 23) - 9 * ((i * 7) % 11) + (i % 3))
        for i in range(1000)
    ]
    _, r = _fit(spark, rows)
    a = np.array([[1.0, x1, x2] for x1, x2, _ in rows])
    b = np.array([float(y) for _, _, y in rows])
    beta = np.linalg.lstsq(a, b, rcond=None)[0]
    for got_micro, want in zip(
        (r["beta0_micro"], r["beta1_micro"], r["beta2_micro"]), beta
    ):
        assert abs(got_micro / 1e6 - want) < 1e-4, (got_micro, want)


def test_fit_quality_perfect_plane(spark):
    """Noise-free data: R^2 must be exactly 1.0 (micro = 1_000_000) and RMSE 0."""
    from movie_genre_data_pipeline_spark.functions.regression import (
        ols_fit_quality,
    )

    rows = [
        (x1, x2, 7 + 3 * x1 - 2 * x2)
        for x1 in range(0, 20)
        for x2 in range(0, 5)
    ]
    df = spark.createDataFrame(rows, "x1 bigint, x2 bigint, y bigint")
    r = ols_fit_quality(df, "x1", "x2", "y").collect()[0]
    assert r["r2_micro"] == 1_000_000
    assert r["rmse_cents"] == 0


def test_ridge_path_shrinks_and_matches_ols_at_zero(spark):
    """λ=0 reproduces the OLS fit bit-for-bit (same Gram, same expressions);
    the coefficient norm is non-increasing along the λ grid (the ridge
    shrinkage law); and at dominating λ the slopes vanish while the
    unpenalized intercept absorbs the mean."""
    from movie_genre_data_pipeline_spark.functions.regression import (
        ridge_path_micro,
    )

    rows = [(i % 23 + 1, (i * 7) % 11, 3 * (i % 23 + 1) + 5 * ((i * 7) % 11) + 40 + (i % 3))
            for i in range(400)]
    df = spark.createDataFrame(rows, "x1 bigint, x2 bigint, y bigint")
    lambdas = (0, 10**3, 10**5, 10**9)
    path = {r["lam"]: r for r in ridge_path_micro(df, "x1", "x2", "y", lambdas).collect()}
    ols = ols_fit_micro(df, "x1", "x2", "y").collect()[0]
    assert (path[0]["beta0_micro"], path[0]["beta1_micro"], path[0]["beta2_micro"]) == (
        ols["beta0_micro"], ols["beta1_micro"], ols["beta2_micro"]
    )
    norms = [
        path[l]["beta1_micro"] ** 2 + path[l]["beta2_micro"] ** 2 for l in lambdas
    ]
    assert norms == sorted(norms, reverse=True)
    assert abs(path[10**9]["beta1_micro"]) < 10**4  # slope ~0 at dominating λ
    mean_y = sum(r[2] for r in rows) / len(rows)
    assert abs(path[10**9]["beta0_micro"] / 1e6 - mean_y) < 2.0


def test_corr_matrix_known_answers(spark):
    """corr(x, x-linear) = ±1e6 exactly; independent alternation ~0; and the
    matrix has exactly k(k-1)/2 rows with lexicographic-pair labels."""
    from movie_genre_data_pipeline_spark.functions.regression import (
        corr_matrix_micro,
    )

    rows = [(i, 3 * i + 7, -2 * i + 100, (-1) ** i) for i in range(200)]
    df = spark.createDataFrame(rows, "a bigint, b bigint, c bigint, e bigint")
    out = {
        (r["col_a"], r["col_b"]): r["corr_micro"]
        for r in corr_matrix_micro(df, ("a", "b", "c", "e")).collect()
    }
    assert len(out) == 6
    assert out[("a", "b")] == 10**6       # exact positive linear
    assert out[("a", "c")] == -(10**6)    # exact negative linear
    assert abs(out[("a", "e")]) < 20_000  # alternating sign ~ independent


def test_logreg_irls_recovers_known_parameters(spark):
    """Labels drawn from a KNOWN logistic channel (md5-uniform < sigmoid of
    the true score) must be recovered by IRLS: the final iteration's micro-
    betas land near the injected truth, accuracy beats the majority class,
    and the trajectory's step sizes shrink (Newton contraction)."""
    from pyspark.sql import functions as F

    from movie_genre_data_pipeline_spark.functions.regression import (
        logreg_irls_micro,
    )

    true_b = (-2_000_000, 30_000, -150_000)
    base = spark.range(4000).select(
        (F.col("id") % 180 + 60).cast("bigint").alias("x1"),
        (F.col("id") % 25).cast("bigint").alias("x2"),
        F.conv(
            F.substring(F.md5(F.concat(F.col("id").cast("string"), F.lit(":t"))), 1, 12),
            16,
            10,
        )
        .cast("bigint")
        .alias("u48"),
    )
    labeled = base.select(
        "x1",
        "x2",
        F.when(
            F.col("u48").cast("double") / F.lit(float(1 << 48))
            < F.lit(1.0)
            / (
                F.lit(1.0)
                + F.exp(
                    -(
                        F.lit(true_b[0])
                        + F.lit(true_b[1]) * F.col("x1")
                        + F.lit(true_b[2]) * F.col("x2")
                    ).cast("double")
                    / F.lit(1e6)
                )
            ),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("y"),
    )
    out = logreg_irls_micro(labeled, "x1", "x2", "y", iters=4).collect()
    assert [r["iter"] for r in out] == [1, 2, 3, 4]
    final = out[-1]
    # recovery: each coefficient within 25% of truth (n=4000 sampling noise)
    for col, truth in zip(("b0_micro", "b1_micro", "b2_micro"), true_b):
        assert abs(final[col] - truth) < abs(truth) * 0.25, (col, final[col], truth)
    # accuracy beats the majority class
    n_pos = labeled.filter(F.col("y") == 1).count()
    majority = max(n_pos, 4000 - n_pos)
    assert final["n_correct"] > majority
    # Newton contraction: step size strictly shrinks after the first update
    steps = [
        sum(
            abs(out[i][c] - out[i - 1][c])
            for c in ("b0_micro", "b1_micro", "b2_micro")
        )
        for i in range(1, len(out))
    ]
    assert steps == sorted(steps, reverse=True), steps


def test_distill_confusion_is_consistent_and_beats_never_select(spark):
    """The distillation readout's confusion matrix must partition the corpus
    (tp+fp+fn+tn == n_docs) and the distilled rule must not be worse than
    the trivial never-select rule on its own training labels."""
    from movie_genre_data_pipeline_spark.suite import all_queries

    sf = "/root/testdata/sf0.001"
    row = all_queries()["curate_classifier_distill"].fn(spark, sf).collect()[0]
    import duckdb

    n_docs = duckdb.sql(
        f"SELECT COUNT(*) FROM '{sf}/documents.parquet'"
    ).fetchone()[0]
    total = row["tp"] + row["fp"] + row["fn"] + row["tn"]
    assert total == n_docs, row
    n_pos = row["tp"] + row["fn"]
    never_select_correct = n_docs - n_pos
    assert row["tp"] + row["tn"] >= never_select_correct, row


def test_grouped_logreg_recovers_per_segment_parameters(spark):
    """Each group's labels come from its OWN channel: the grouped trainer
    must recover monotone-increasing |b1| and |b2| across segment index and
    land each coefficient within 35% of its segment's injected truth."""
    from movie_genre_data_pipeline_spark.suite import all_queries

    rows = sorted(
        all_queries()["feat_logreg_by_segment"]
        .fn(spark, "/root/testdata/sf0.01")
        .collect(),
        key=lambda r: r["segment"],
    )
    assert len(rows) == 5
    for i, r in enumerate(rows, start=1):
        truth1, truth2 = 20000 + 4000 * i, -(100000 + 20000 * i)
        assert abs(r["b1_micro"] - truth1) < abs(truth1) * 0.35, (i, r)
        assert abs(r["b2_micro"] - truth2) < abs(truth2) * 0.35, (i, r)
        assert r["n_correct"] > r["n_rows"] // 2, r
    b1s = [r["b1_micro"] for r in rows]
    b2s = [r["b2_micro"] for r in rows]
    assert b1s == sorted(b1s), b1s
    assert b2s == sorted(b2s, reverse=True), b2s


def test_pca_power_matches_numpy_top_eigenvector(spark):
    """The power-iteration component must align with numpy's exact top
    eigenvector of the same covariance (|cos| >= 0.999), the Rayleigh
    quotient must approximate the top eigenvalue, and the explained ratio
    must be in (0, 1]."""
    import numpy as np
    from pyspark.sql import functions as F

    from movie_genre_data_pipeline_spark.functions.regression import (
        pca_power_top1,
    )

    rng = np.random.default_rng(7)
    base = rng.integers(0, 50, size=(3000, 4))
    base[:, 1] = base[:, 0] * 3 + rng.integers(0, 10, size=3000)  # correlated pair
    rows = [tuple(int(x) for x in r) for r in base]
    df = spark.createDataFrame(rows, "x1 bigint, x2 bigint, x3 bigint, x4 bigint")
    out = pca_power_top1(df, ["x1", "x2", "x3", "x4"], iters=8).collect()[0]
    v = np.array([out[f"v{i}_micro"] for i in range(1, 5)], dtype=float) / 1e6
    arr = base.astype(float)
    cov = np.cov(arr, rowvar=False, bias=True)
    w, vecs = np.linalg.eigh(cov)
    top = vecs[:, -1]
    cos = abs(v @ top) / (np.linalg.norm(v) * np.linalg.norm(top))
    assert cos >= 0.999, (cos, v, top)
    lam = out["lambda_micro"] / 1e6
    assert abs(lam - w[-1]) < w[-1] * 0.01, (lam, w[-1])
    assert 0 < out["explained_ratio"] <= 1
    # residual check: C v ≈ λ v
    resid = np.linalg.norm(cov @ v - lam * v) / np.linalg.norm(cov @ v)
    assert resid < 0.01, resid


def test_pca_deflation_recovers_top_two_eigenvectors(spark):
    """The deflated second component must align with numpy's second
    eigenvector (|cos| >= 0.99), be near-orthogonal to the first, and carry
    lambda2 <= lambda1 with both Rayleigh quotients near numpy's
    eigenvalues."""
    import numpy as np

    from movie_genre_data_pipeline_spark.functions.regression import (
        pca_moments,
        pca_power_deflated,
    )

    rng = np.random.default_rng(7)
    base = rng.integers(0, 50, size=(3000, 4))
    base[:, 1] = base[:, 0] * 3 + rng.integers(0, 10, size=3000)
    base[:, 3] = base[:, 2] * 2 + rng.integers(0, 25, size=3000)  # 2nd structure
    rows = [tuple(int(x) for x in r) for r in base]
    df = spark.createDataFrame(rows, "x1 bigint, x2 bigint, x3 bigint, x4 bigint")
    out = pca_power_deflated(
        pca_moments(df, ["x1", "x2", "x3", "x4"]), iters=8
    ).collect()[0]
    v1 = np.array([out[f"v{i}_micro"] for i in range(1, 5)], dtype=float) / 1e6
    v2 = np.array([out[f"v2{i}_micro"] for i in range(1, 5)], dtype=float) / 1e6
    cov = np.cov(base.astype(float), rowvar=False, bias=True)
    w, vecs = np.linalg.eigh(cov)
    cos1 = abs(v1 @ vecs[:, -1]) / (np.linalg.norm(v1) * np.linalg.norm(vecs[:, -1]))
    cos2 = abs(v2 @ vecs[:, -2]) / (np.linalg.norm(v2) * np.linalg.norm(vecs[:, -2]))
    assert cos1 >= 0.999, (cos1, v1)
    assert cos2 >= 0.99, (cos2, v2)
    ortho = abs(v1 @ v2) / (np.linalg.norm(v1) * np.linalg.norm(v2))
    assert ortho < 0.02, (ortho, v1, v2)
    lam1, lam2 = out["lambda1_micro"] / 1e6, out["lambda2_micro"] / 1e6
    assert lam2 <= lam1
    assert abs(lam1 - w[-1]) < w[-1] * 0.01
    assert abs(lam2 - w[-2]) < w[-2] * 0.02
    assert 0 < out["explained2_ratio"] <= out["explained1_ratio"] <= 1


def test_pca_deflation_survives_spread_eigenvectors(spark):
    """The failure class the r9 review caught: with an L∞-normalized w,
    un-normalized Hotelling deflation (C − λ1·w·wᵀ) leaves a residual
    λ1·(1−‖w‖²) along v1 and the 'second' component converges back to the
    first whenever the top eigenvector is spread (‖w‖₂² ≫ 1). Rotated
    spectra with eigenvalues (10,4,1,0.5) reproduce it; the /(w·w)
    normalization must recover the true second eigenvector anyway."""
    import numpy as np

    from movie_genre_data_pipeline_spark.functions.regression import (
        pca_moments,
        pca_power_deflated,
    )

    rng = np.random.default_rng(11)
    # random rotation -> spread eigenvectors (top component far from axis-aligned)
    A = rng.normal(size=(4, 4))
    Q, _ = np.linalg.qr(A)
    C = Q @ np.diag([10.0, 4.0, 1.0, 0.5]) @ Q.T
    L = np.linalg.cholesky(C)
    X = np.rint(rng.normal(size=(4000, 4)) @ L.T * 10 + 100).astype(int)
    rows = [tuple(int(x) for x in r) for r in X]
    df = spark.createDataFrame(rows, "x1 bigint, x2 bigint, x3 bigint, x4 bigint")
    out = pca_power_deflated(
        pca_moments(df, ["x1", "x2", "x3", "x4"]), iters=12
    ).collect()[0]
    v1 = np.array([out[f"v{i}_micro"] for i in range(1, 5)], dtype=float)
    v2 = np.array([out[f"v2{i}_micro"] for i in range(1, 5)], dtype=float)
    cov = np.cov(X.astype(float), rowvar=False, bias=True)
    w, vecs = np.linalg.eigh(cov)
    cos2 = abs(v2 @ vecs[:, -2]) / (np.linalg.norm(v2) * np.linalg.norm(vecs[:, -2]))
    ortho = abs(v1 @ v2) / (np.linalg.norm(v1) * np.linalg.norm(v2))
    assert cos2 >= 0.98, (cos2, v2, vecs[:, -2])
    assert ortho < 0.05, ortho
    assert out["lambda2_micro"] <= out["lambda1_micro"]
