"""Law tests for the r15 experimentation/audit wave — each statistic checked
against an independent reference implementation (pure python / numpy), the
suite's standing discipline for stats members (the OLS/PCA/ACF/KM precedent):
the DuckDB oracle proves CROSS-ENGINE equality, these prove the statistic is
the RIGHT number.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_cuped_theta_and_mean_preservation(spark):
    """Pure-python theta from the raw units must match the published micro
    value, and CUPED's defining law must hold: the n-weighted overall mean of
    the ADJUSTED arm means equals the overall post mean (the global centering
    term makes the adjustment a pure reshuffle between arms)."""
    from movie_genre_data_pipeline_spark.suite import load
    from movie_genre_data_pipeline_spark.suite.experiment_queries import (
        cuped_report_from_units,
        cuped_units_from_orders,
    )

    units_df = cuped_units_from_orders(load(spark, SF_DIR, "orders"))
    units = [(r["pre_cents"], r["post_cents"]) for r in units_df.collect()]
    n = len(units)
    sx = sum(u[0] for u in units)
    sy = sum(u[1] for u in units)
    sxx = sum(u[0] * u[0] for u in units)
    sxy = sum(u[0] * u[1] for u in units)
    theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)

    report = {r["arm"]: r for r in cuped_report_from_units(units_df).collect()}
    assert set(report) == {"treat", "control"}
    got_theta = report["treat"]["theta_micro"]
    assert got_theta == report["control"]["theta_micro"]
    assert abs(got_theta - theta * 1e6) <= 2  # python float vs shared spell

    n_tot = sum(r["n_units"] for r in report.values())
    raw = sum(r["n_units"] * r["mean_post_micro"] for r in report.values())
    adj = sum(r["n_units"] * r["mean_adj_micro"] for r in report.values())
    # each mean is quantized to 1 micro, so the folded means differ by at
    # most 1 micro per arm row
    assert abs(raw - adj) <= 2 * n_tot


def test_cohens_kappa_matches_pure_python(spark):
    """Replay kappa from the four cells in pure python; pin the chance-level
    law (kappa == 0 exactly when po == pe) via the fragment's own rounding."""
    from movie_genre_data_pipeline_spark.suite import load
    from movie_genre_data_pipeline_spark.suite.experiment_queries import (
        kappa_cells_from_documents,
        kappa_report_from_cells,
    )

    cells = kappa_cells_from_documents(load(spark, SF_DIR, "documents"))
    row = kappa_report_from_cells(cells).collect()[0]
    n11, n10, n01, n00 = row["n11"], row["n10"], row["n01"], row["n00"]
    nn = n11 + n10 + n01 + n00
    assert nn == load(spark, SF_DIR, "documents").count()
    po = (n11 + n00) / nn
    pe = ((n11 + n10) * (n11 + n01) + (n00 + n01) * (n00 + n10)) / (nn * nn)
    kappa = (po - pe) / (1 - pe)
    assert abs(row["po_micro"] - po * 1e6) <= 1
    assert abs(row["pe_micro"] - pe * 1e6) <= 1
    assert abs(row["kappa_micro"] - kappa * 1e6) <= 2
    assert -1_000_000 <= row["kappa_micro"] <= 1_000_000


def test_benford_shares_and_telescoping(spark):
    """The baked-in expected shares must telescope to exactly 1 (Σ log10(1 +
    1/d) = log10(10)), observed micro shares must fold to ~1e6, and every
    digit row must be a real first digit."""
    from movie_genre_data_pipeline_spark.suite import load
    from movie_genre_data_pipeline_spark.suite.experiment_queries import (
        BENFORD_P_MICRO,
        benford_digits_from_orders,
        benford_report_from_digits,
    )

    assert abs(sum(BENFORD_P_MICRO.values()) - 1_000_000) <= 5
    rows = benford_report_from_digits(
        benford_digits_from_orders(load(spark, SF_DIR, "orders"))
    ).collect()
    assert {r["digit"] for r in rows} <= set(range(1, 10))
    assert abs(sum(r["p_obs_micro"] for r in rows) - 1_000_000) <= len(rows)
    for r in rows:
        assert r["dev_micro"] == abs(r["p_obs_micro"] - r["p_exp_micro"])
        assert r["p_exp_micro"] == BENFORD_P_MICRO[r["digit"]]


def test_ljung_box_matches_pure_python(spark):
    """Replay Q in pure python from the SAME quantized r_micro definition on
    a small synthetic hourly series with a known strong lag-2 cycle, and pin
    the whiteness ordering law: the cyclic series scores far above a
    constant-rate series (whose every r_k is 0 on a dense spine)."""
    from movie_genre_data_pipeline_spark.suite.timeseries_queries import (
        LJUNG_LAGS,
        ljung_box_from_counts,
    )

    cyc = [(h, 100 + (50 if h % 2 == 0 else -50)) for h in range(200)]
    counts = spark.createDataFrame(cyc, "hour_id bigint, cnt bigint")
    got = ljung_box_from_counts(counts).collect()[0]
    n = len(cyc)
    assert got["n_hours"] == n and got["m_lags"] == len(LJUNG_LAGS)

    xs = [c for _, c in cyc]
    s_terms = 0
    for lag in LJUNG_LAGS:
        x = xs[: n - lag]
        y = xs[lag:]
        m = len(x)
        sx, sy = sum(x), sum(y)
        sxy = sum(a * b for a, b in zip(x, y))
        sxx = sum(a * a for a in x)
        syy = sum(b * b for b in y)
        vx = m * sxx - sx * sx
        vy = m * syy - sy * sy
        if vx > 0 and vy > 0:
            r = (m * sxy - sx * sy) / (math.sqrt(vx) * math.sqrt(vy))
            r_micro = math.floor(r * 1e6 + 0.5)
        else:
            r_micro = 0
        s_terms += math.floor(r_micro * r_micro * 1e6 / (n - lag) + 0.5)
    q_micro = math.floor(n * (n + 2) * s_terms / 1e12 + 0.5)
    assert got["q_micro"] == q_micro

    flat = spark.createDataFrame(
        [(h, 100) for h in range(200)], "hour_id bigint, cnt bigint"
    )
    got_flat = ljung_box_from_counts(flat).collect()[0]
    assert got_flat["q_micro"] == 0  # every variance term is 0 -> r = 0
    assert got["q_micro"] > 100 * 1_000_000  # the cycle is unmissable


def test_wilson_bounds_laws(spark):
    """Replay both bounds in pure python per stratum (same formula order),
    and pin the interval laws: 0 <= lo <= p_hat <= hi <= 1, and the interval
    CONTAINS the point estimate strictly when 0 < s < n."""
    from movie_genre_data_pipeline_spark.suite import load
    from movie_genre_data_pipeline_spark.suite.experiment_queries import (
        wilson_facts_from_documents,
        wilson_report_from_facts,
    )

    facts = wilson_facts_from_documents(load(spark, SF_DIR, "documents"))
    rows = wilson_report_from_facts(facts).collect()
    assert rows
    z = 1.96
    for r in rows:
        n, s = r["n_docs"], r["n_short"]
        p = s / n
        den = 1 + z * z / n
        center = (p + z * z / (2 * n)) / den
        half = z * math.sqrt((p * (1 - p) + z * z / (4 * n)) / n) / den
        assert abs(r["lo_micro"] - math.floor((center - half) * 1e6 + 0.5)) <= 1
        assert abs(r["hi_micro"] - math.floor((center + half) * 1e6 + 0.5)) <= 1
        assert 0 <= r["lo_micro"] <= p * 1e6 + 1
        assert p * 1e6 - 1 <= r["hi_micro"] <= 1_000_000


def test_partial_corr_identities(spark):
    """Two identities: (a) on synthetic data where z is CONSTANT-free and
    uncorrelated with both legs, the partial equals the raw correlation to
    quantization; (b) on the real fixture the published partial matches the
    textbook formula recomputed in python from the three published micros."""
    from movie_genre_data_pipeline_spark.suite import all_queries

    row = (
        all_queries()["feat_partial_corr"].fn(spark, SF_DIR).collect()[0]
    )
    rxy = row["r_xy_micro"] / 1e6
    rxz = row["r_xz_micro"] / 1e6
    ryz = row["r_yz_micro"] / 1e6
    expect = (rxy - rxz * ryz) / (
        math.sqrt(1 - rxz * rxz) * math.sqrt(1 - ryz * ryz)
    )
    assert abs(row["r_partial_micro"] - math.floor(expect * 1e6 + 0.5)) <= 1
    assert -1_000_000 <= row["r_partial_micro"] <= 1_000_000


def test_lorenz_curve_laws(spark):
    """The Lorenz laws: decile populations differ by at most 1 (ANSI NTILE),
    cumulative shares are strictly increasing to exactly 1e6, and the curve
    is CONVEX (per-decile increments nondecreasing — deciles are sorted by
    revenue, so each tenth adds at least as much as the one before)."""
    from movie_genre_data_pipeline_spark.suite import all_queries

    rows = sorted(
        all_queries()["ops_lorenz_deciles"].fn(spark, SF_DIR).collect(),
        key=lambda r: r["decile"],
    )
    assert [r["decile"] for r in rows] == list(range(1, 11))
    counts = [r["n_cust"] for r in rows]
    assert max(counts) - min(counts) <= 1
    shares = [r["cum_share_micro"] for r in rows]
    assert shares == sorted(shares) and shares[-1] == 1_000_000
    incs = [r["decile_cents"] for r in rows]
    assert incs == sorted(incs)  # sorted-by-revenue deciles => convex curve
    total = sum(incs)
    assert rows[-1]["cum_share_micro"] == 1_000_000 and total > 0


def test_raking_matches_pure_python_trajectory(spark):
    """Replay the ENTIRE quantized IPF trajectory in pure python from the
    same cells and compare weight-for-weight (the PageRank trajectory
    discipline), then pin the convergence laws: the LAST-scaled axis
    (sources) hits its uniform target to quantization, and language margins
    land within 1% relative of theirs after three rounds."""
    import math as _m

    from movie_genre_data_pipeline_spark.suite import load
    from movie_genre_data_pipeline_spark.suite.experiment_queries import (
        IPF_ROUNDS,
        raking_cells_from_documents,
        raking_report_from_cells,
    )

    cells_df = raking_cells_from_documents(load(spark, SF_DIR, "documents"))
    cells = {(r["lang"], r["source"]): r["n"] for r in cells_df.collect()}
    nn = sum(cells.values())
    langs = {k[0] for k in cells}
    sources = {k[1] for k in cells}
    tl = _m.floor(nn * 1e6 / len(langs) + 0.5)
    ts = _m.floor(nn * 1e6 / len(sources) + 0.5)
    w = {k: 1_000_000 for k in cells}
    for _ in range(IPF_ROUNDS):
        for axis_idx, target in ((0, tl), (1, ts)):
            tot: dict[str, int] = {}
            for k, n in cells.items():
                tot[k[axis_idx]] = tot.get(k[axis_idx], 0) + n * w[k]
            for k in w:
                cl = tot[k[axis_idx]]
                if cl > 0:
                    w[k] = _m.floor(w[k] * target / cl + 0.5)

    got = {
        (r["lang"], r["source"]): r["w_micro"]
        for r in raking_report_from_cells(cells_df).collect()
    }
    assert got == w  # bit-identical trajectory

    # sources were scaled last: their weighted margins sit on target up to
    # the per-cell half-micro quantization
    for s in sources:
        m = sum(cells[k] * w[k] for k in cells if k[1] == s)
        assert abs(m - ts) <= sum(cells[k] for k in cells if k[1] == s)
    # languages were scaled one half-step earlier: within 1% after 3 rounds
    for lg in langs:
        m = sum(cells[k] * w[k] for k in cells if k[0] == lg)
        assert abs(m - tl) <= 0.01 * tl
