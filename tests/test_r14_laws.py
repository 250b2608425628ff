"""Law tests for the r14 wave — each query's statistic checked against an
independent reference implementation (numpy / pure python), the suite's
standing discipline for stats members (the OLS/PCA/ACF precedent): the DuckDB
oracle proves CROSS-ENGINE equality, these prove the statistic is the RIGHT
number.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_kaplan_meier_matches_pure_python(spark):
    """Replay the KM estimator in pure python from the same spans and compare
    step-for-step; also pin the survival laws: S is nonincreasing and every
    at-risk count is consistent with the duration multiset."""
    from movie_genre_data_pipeline_spark.suite import load
    from movie_genre_data_pipeline_spark.suite.timeseries_queries import (
        KM_GAP_US,
        KM_H_US,
        km_report_from_spans,
        km_user_spans,
    )

    spans = km_user_spans(load(spark, SF_DIR, "events"))
    rows = spans.collect()
    end_us = max(r["l_us"] for r in rows)
    obs = []  # (dur_h, death)
    for r in rows:
        death = 1 if end_us - r["l_us"] > KM_GAP_US else 0
        dur = (r["l_us"] - r["f_us"]) if death else (end_us - r["f_us"])
        obs.append((dur // KM_H_US, death))

    report = km_report_from_spans(spans).collect()
    assert report, "no death times in the fixture — KM report empty"

    surv = 1.0
    expected = {}
    for t in sorted({d for d, _ in obs}):
        n_risk = sum(1 for d, _ in obs if d >= t)
        n_deaths = sum(e for d, e in obs if d == t)
        if n_deaths >= 1 and n_risk > n_deaths:
            surv *= 1.0 - n_deaths / n_risk
            expected[t] = (n_risk, n_deaths, surv)

    assert [r["dur_h"] for r in report] == sorted(expected)
    prev = float("inf")
    for r in report:
        n_risk, n_deaths, s = expected[r["dur_h"]]
        assert r["n_risk"] == n_risk and r["n_deaths"] == n_deaths
        # micro-nat quantization per step: tolerance 1e-6 per accumulated term
        assert r["surv_micro"] / 1e6 == pytest.approx(s, abs=5e-5)
        assert r["surv_micro"] <= prev, "survival must be nonincreasing"
        prev = r["surv_micro"]


def test_yule_k_matches_direct_formula(spark):
    """K = 1e4·(Σtf²−N)/N² recomputed directly from collected postings."""
    from movie_genre_data_pipeline_spark.suite import load
    from movie_genre_data_pipeline_spark.suite.text_queries import (
        yule_postings,
        yule_report_from_postings,
    )

    postings = yule_postings(load(spark, SF_DIR, "documents"))
    by_lang: dict[str, list[int]] = {}
    for r in postings.collect():
        by_lang.setdefault(r["lang"], []).append(r["tf"])
    got = {r["lang"]: r for r in yule_report_from_postings(postings).collect()}
    assert set(got) == set(by_lang)
    for lang, tfs in by_lang.items():
        n = sum(tfs)
        k = 1e4 * (sum(t * t for t in tfs) - n) / (n * n)
        assert got[lang]["n_types"] == len(tfs)
        assert got[lang]["n_tokens"] == n
        assert got[lang]["yule_k_micro"] / 1e6 == pytest.approx(k, abs=2e-6)
        assert got[lang]["yule_k_micro"] > 0, "natural text repeats tokens"


def test_clustering_coeff_matches_pure_python(spark):
    """Per-node C(v) recomputed from the collected edge set by brute force
    (the node set is nation-grain, so the reference triple loop is cheap)."""
    from movie_genre_data_pipeline_spark.functions.graph import orient_edges
    from movie_genre_data_pipeline_spark.suite.graph_queries import (
        _trade_edges,
        q_graph_clustering_coeff,
    )

    edges = {
        (r["lo"], r["hi"])
        for r in orient_edges(_trade_edges(spark, SF_DIR), "src", "dst").collect()
    }
    adj: dict[str, set[str]] = {}
    for lo, hi in edges:
        adj.setdefault(lo, set()).add(hi)
        adj.setdefault(hi, set()).add(lo)

    got = {r["nation"]: r for r in q_graph_clustering_coeff(spark, SF_DIR).collect()}
    assert set(got) == set(adj)
    for v, nbrs in adj.items():
        deg = len(nbrs)
        tri = sum(
            1
            for a in nbrs
            for b in nbrs
            if a < b and (min(a, b), max(a, b)) in edges
        )
        assert got[v]["degree"] == deg
        assert got[v]["n_tri"] == tri
        c = 2 * tri / (deg * (deg - 1)) if deg >= 2 else 0.0
        assert got[v]["lcc_micro"] / 1e6 == pytest.approx(c, abs=2e-6)
        assert 0 <= got[v]["lcc_micro"] <= 1_000_000


def test_spearman_matches_scipy_formula(spark):
    """rho recomputed with numpy over tie-averaged ranks (the scipy
    definition) from the same collected feature rows."""
    import numpy as np

    from movie_genre_data_pipeline_spark.suite import load
    from movie_genre_data_pipeline_spark.suite.sampling_queries import (
        SPEARMAN_COLS,
        q_feat_spearman_matrix,
    )

    li = load(spark, SF_DIR, "lineitem")
    feats = li.select(
        F.col("l_quantity").cast("bigint").alias("qty"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("price_c"),
        F.round(F.col("l_discount") * 100).cast("bigint").alias("disc_c"),
    ).collect()
    cols = {c: np.array([r[c] for r in feats], dtype=float) for c in SPEARMAN_COLS}

    def avg_rank(x):
        order = np.argsort(x, kind="stable")
        ranks = np.empty(len(x))
        i = 0
        sorted_x = x[order]
        while i < len(x):
            j = i
            while j + 1 < len(x) and sorted_x[j + 1] == sorted_x[i]:
                j += 1
            ranks[order[i : j + 1]] = (i + j) / 2 + 1
            i = j + 1
        return ranks

    ranked = {c: avg_rank(v) for c, v in cols.items()}
    got = {
        (r["col_a"], r["col_b"]): r["corr_micro"]
        for r in q_feat_spearman_matrix(spark, SF_DIR).collect()
    }
    assert len(got) == 3
    for (a, b), micro in got.items():
        rho = np.corrcoef(ranked[a], ranked[b])[0, 1]
        assert micro / 1e6 == pytest.approx(rho, abs=2e-6)
        assert -1_000_000 <= micro <= 1_000_000


def test_mahalanobis_matches_numpy(spark):
    """The χ²₂ bin counts recomputed with numpy's covariance/inverse from the
    same dims; also the distributional law E[d²] = dim = 2 (exact for the
    population-covariance form, any distribution)."""
    import numpy as np

    from movie_genre_data_pipeline_spark.suite import load
    from movie_genre_data_pipeline_spark.suite.sampling_queries import (
        maha_dims,
        q_feat_mahalanobis_screen,
    )

    dims = maha_dims(load(spark, SF_DIR, "orders")).collect()
    x = np.array([[r["x1"], r["x2"]] for r in dims], dtype=float)
    mu = x.mean(axis=0)
    cov = np.cov(x, rowvar=False, bias=True)  # population covariance
    inv = np.linalg.inv(cov)
    d = x - mu
    d2 = np.einsum("ij,jk,ik->i", d, inv, d)
    assert d2.mean() == pytest.approx(2.0, rel=1e-9)

    edges = [0.0, 1.0, 4.0, 9.0, np.inf]
    labels = ["a_d2_lt_1", "b_d2_1_4", "c_d2_4_9", "d_d2_ge_9"]
    # bin on the SAME micro quantization as the engine so boundaries agree
    d2_micro = np.floor(d2 * 1e6 + 0.5)
    expected = {
        lab: int(((d2_micro >= lo * 1e6) & (d2_micro < hi * 1e6)).sum())
        for lab, lo, hi in zip(labels, edges[:-1], edges[1:])
    }
    got = {
        r["d2_bin"]: r["n_rows"]
        for r in q_feat_mahalanobis_screen(spark, SF_DIR).collect()
    }
    assert {k: v for k, v in expected.items() if v} == got


def test_horvitz_thompson_estimator_laws(spark):
    """HT under the deterministic PPS-systematic design: per language the
    estimate lands near the true total (the K=1000-point design covers every
    doc class), and the global identity Σ points == K holds by telescoping."""
    from movie_genre_data_pipeline_spark.suite.sampling_queries import (
        PPS_POINTS,
        q_sample_horvitz_thompson,
        q_sample_pps_systematic,
    )

    rep = q_sample_horvitz_thompson(spark, SF_DIR).collect()
    assert rep
    for r in rep:
        assert r["n_sampled"] >= 1
        # systematic PPS on a size-correlated y: single-sample relative
        # error well inside ±25% at K=1000 points over ~500 docs
        assert abs(r["err_micro"]) < 250_000, r
    pps = q_sample_pps_systematic(spark, SF_DIR).collect()
    assert sum(r["n_points"] for r in pps) == PPS_POINTS


def test_theil_decomposition_identity(spark):
    """The whole point of Theil over Gini: T_total == T_between + Σ (X_g/X)·T_g
    EXACTLY (up to micro rounding of each published term), recomputed from
    the collected facts in pure python; every within term is ≥ 0."""
    from movie_genre_data_pipeline_spark.suite import load
    from movie_genre_data_pipeline_spark.suite.relational_extra import (
        q_ops_theil_decomposition,
        theil_facts,
    )

    facts = {
        r["source"]: r
        for r in theil_facts(load(spark, SF_DIR, "documents")).collect()
    }
    rep = {
        r["source"]: r for r in q_ops_theil_decomposition(spark, SF_DIR).collect()
    }
    assert set(rep) == set(facts)

    n_tot = sum(f["n_g"] for f in facts.values())
    x_tot = sum(f["x_g"] for f in facts.values())
    t_between = 0.0
    t_within_weighted = 0.0
    for s, f in facts.items():
        n_g, x_g, l_g = f["n_g"], f["x_g"], float(f["l_g"])
        tg = l_g / x_g / 1e6 - math.log(x_g / n_g)
        bt = x_g / x_tot * math.log((x_g / x_tot) / (n_g / n_tot))
        assert tg >= -1e-6, "within-group Theil is nonnegative"
        assert rep[s]["theil_within_micro"] / 1e6 == pytest.approx(tg, abs=2e-6)
        assert rep[s]["between_term_micro"] / 1e6 == pytest.approx(bt, abs=2e-6)
        t_between += bt
        t_within_weighted += x_g / x_tot * tg

    # total Theil recomputed from the pooled facts equals the decomposition
    l_tot = sum(float(f["l_g"]) for f in facts.values())
    t_total = l_tot / x_tot / 1e6 - math.log(x_tot / n_tot)
    assert t_total == pytest.approx(t_between + t_within_weighted, abs=1e-9)


def test_isotonic_matches_pure_python_pav(spark):
    """The minimax join must equal the classic pool-adjacent-violators sweep
    (weighted), and the fit must be nondecreasing and mean-preserving."""
    from movie_genre_data_pipeline_spark.suite.sampling_queries import (
        _cal_bins,
        _logreg_scored,
        isotonic_from_bins,
    )

    bins = _cal_bins(_logreg_scored(spark, SF_DIR))
    facts = sorted(
        (r["bin"], r["n_rows"], r["sum_y"]) for r in bins.collect()
    )
    # weighted PAV sweep: blocks of (weight, value-sum) merged while violating
    blocks: list[list[float]] = []  # [n, y]
    for _, n, y in facts:
        blocks.append([n, y])
        while len(blocks) > 1 and (
            blocks[-2][1] / blocks[-2][0] > blocks[-1][1] / blocks[-1][0]
        ):
            n2, y2 = blocks.pop()
            blocks[-1][0] += n2
            blocks[-1][1] += y2
    # expand block rates back over the member bins
    rates = []
    it = iter(facts)
    for n_blk, y_blk in blocks:
        acc = 0
        while acc < n_blk:
            _, n, _ = next(it)
            acc += n
            rates.append(y_blk / n_blk)
    got = sorted(
        (r["bin"], r["n_rows"], r["iso_micro"])
        for r in isotonic_from_bins(bins).collect()
    )
    assert [b for b, _, _ in got] == [b for b, _, _ in facts]
    prev = -1
    total_fit = 0.0
    for (bin_, n, iso), rate in zip(got, rates):
        assert iso / 1e6 == pytest.approx(rate, abs=2e-6), (bin_, iso, rate)
        assert iso >= prev, "isotonic fit must be nondecreasing"
        prev = iso
        total_fit += n * rate
    # mean preservation: sum of fitted rates weighted by bin mass == sum_y
    assert total_fit == pytest.approx(sum(y for _, _, y in facts), rel=1e-9)
