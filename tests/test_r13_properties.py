"""Property-based tests (hypothesis) for the r13 wave's algebraic laws —
random tiny inputs through the REAL report helpers, asserting each
statistic's defining symmetry (the r15/r14 discipline extended to the
evaluation family: rank statistics must be monotone-transform invariant,
label-symmetric statistics must flip exactly, allocation must conserve
the budget)."""

from __future__ import annotations

import pytest

import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# Example budget (r16, VERDICT r15 #1): the sweeps' aggregate runtime
# blew the driver's pytest wall-clock budget at max_examples=6-8. The
# DEFAULT run keeps every law executing but at 1 example (a smoke of
# the sweep); the round-close slow pass re-runs the full sweep with
# MGDP_HYPO_EXAMPLES restored (committed log).
FAST = settings(
    max_examples=int(os.environ.get("MGDP_HYPO_EXAMPLES", "1")),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _labeled(spark, rows):
    return spark.createDataFrame(rows, "y boolean, logw_micro bigint")


@FAST
@given(
    rows=st.lists(
        st.tuples(st.booleans(), st.integers(-10**6, 10**6)),
        min_size=2,
        max_size=30,
    ).filter(
        lambda r: any(y for y, _ in r) and any(not y for y, _ in r)
    )
)
def test_auc_monotone_invariance_and_label_flip(spark, rows):
    """AUC is a rank statistic: an affine score transform leaves the whole
    report bit-identical, and flipping every label complements it
    (auc + auc' = 1e6 up to the two half-up quantizations)."""
    from movie_genre_data_pipeline_spark.suite.sampling_eval_queries import (
        auc_report_from_labeled,
    )

    base = auc_report_from_labeled(_labeled(spark, rows)).collect()[0]
    moved = auc_report_from_labeled(
        _labeled(spark, [(y, 2 * s + 3) for y, s in rows])
    ).collect()[0]
    assert tuple(base) == tuple(moved)

    flip = auc_report_from_labeled(
        _labeled(spark, [(not y, s) for y, s in rows])
    ).collect()[0]
    assert (flip["n_pos"], flip["n_neg"]) == (base["n_neg"], base["n_pos"])
    assert abs(base["auc_micro"] + flip["auc_micro"] - 1_000_000) <= 1


@FAST
@given(
    pos=st.lists(st.integers(1, 1000), min_size=1, max_size=15),
    neg=st.lists(st.integers(-1000, -1), min_size=1, max_size=15),
)
def test_auc_and_ks_saturate_on_perfect_separation(spark, pos, neg):
    """Every positive scored above every negative is AUC = KS = exactly 1."""
    from movie_genre_data_pipeline_spark.suite.sampling_eval_queries import (
        auc_report_from_labeled,
        ks_report_from_labeled,
    )

    rows = [(True, s) for s in pos] + [(False, s) for s in neg]
    assert (
        auc_report_from_labeled(_labeled(spark, rows)).collect()[0]["auc_micro"]
        == 1_000_000
    )
    assert (
        ks_report_from_labeled(_labeled(spark, rows)).collect()[0]["ks_micro"]
        == 1_000_000
    )


@FAST
@given(
    rows=st.lists(
        st.tuples(st.booleans(), st.integers(-10**6, 10**6)),
        min_size=2,
        max_size=30,
    ).filter(
        lambda r: any(y for y, _ in r) and any(not y for y, _ in r)
    )
)
def test_ks_monotone_invariance_and_label_flip(spark, rows):
    """KS is a rank statistic too, and |F_pos - F_neg| is symmetric in the
    classes: both the affine transform and the label flip leave ks_micro
    (and the argmax score for the flip) bit-identical."""
    from movie_genre_data_pipeline_spark.suite.sampling_eval_queries import (
        ks_report_from_labeled,
    )

    base = ks_report_from_labeled(_labeled(spark, rows)).collect()[0]
    moved = ks_report_from_labeled(
        _labeled(spark, [(y, 2 * s + 3) for y, s in rows])
    ).collect()[0]
    assert (base["n_pos"], base["n_neg"], base["n_scores"]) == (
        moved["n_pos"],
        moved["n_neg"],
        moved["n_scores"],
    )
    assert base["ks_micro"] == moved["ks_micro"]
    assert moved["ks_at_score"] == 2 * base["ks_at_score"] + 3

    flip = ks_report_from_labeled(
        _labeled(spark, [(not y, s) for y, s in rows])
    ).collect()[0]
    assert flip["ks_micro"] == base["ks_micro"]
    assert flip["ks_at_score"] == base["ks_at_score"]


@FAST
@given(
    cnts=st.lists(st.integers(0, 500), min_size=3, max_size=20),
)
def test_mann_kendall_reversal_antisymmetry(spark, cnts):
    """Reversing the series negates S and preserves n_pairs and the tie-
    corrected variance; a strictly increasing series hits S = n(n-1)/2."""
    from movie_genre_data_pipeline_spark.suite.timeseries_queries import (
        mann_kendall_from_counts,
    )

    def report(series):
        df = spark.createDataFrame(
            list(enumerate(series)), "day_id bigint, cnt bigint"
        )
        return mann_kendall_from_counts(df).collect()[0]

    fwd = report(cnts)
    rev = report(list(reversed(cnts)))
    assert rev["s_stat"] == -fwd["s_stat"]
    assert (rev["n_days"], rev["n_pairs"], rev["var18"]) == (
        fwd["n_days"],
        fwd["n_pairs"],
        fwd["var18"],
    )

    n = len(cnts)
    inc = report(sorted(set(range(1, n + 1))))
    assert inc["s_stat"] == n * (n - 1) // 2
    assert inc["sen_slope_micro"] > 0


@FAST
@given(
    cents=st.lists(st.integers(1, 10**6), min_size=2, max_size=30),
)
def test_gini_scale_invariance_and_equality_floor(spark, cents):
    """Gini and the top-share ratios are scale-free (x10 all cents is bit-
    identical), and a perfectly equal population has Gini exactly 0."""
    from movie_genre_data_pipeline_spark.suite.relational_extra import (
        gini_from_customer_cents,
    )

    def report(vals):
        df = spark.createDataFrame(
            list(enumerate(vals)), "c bigint, cents bigint"
        )
        return gini_from_customer_cents(df).collect()[0]

    base = report(cents)
    scaled = report([10 * v for v in cents])
    assert scaled["gini_micro"] == base["gini_micro"]
    assert scaled["top1pct_share_micro"] == base["top1pct_share_micro"]
    assert scaled["top10pct_share_micro"] == base["top10pct_share_micro"]
    assert 0 <= base["gini_micro"] < 1_000_000

    equal = report([cents[0]] * len(cents))
    assert equal["gini_micro"] == 0


@FAST
@given(
    row_m=st.lists(st.integers(1, 30), min_size=2, max_size=4),
    col_m=st.lists(st.integers(1, 30), min_size=2, max_size=4),
)
def test_chi2_zero_on_product_tables_and_transpose_invariant(
    spark, row_m, col_m
):
    """An exact independence table (n_xy = a_x * b_y) has chi-squared 0, and
    transposing any contingency table preserves chi2 while swapping the
    level counts."""
    from movie_genre_data_pipeline_spark.suite.sampling_eval_queries import (
        chi2_from_cells,
    )

    prod = [
        (f"r{i}", f"c{j}", a * b)
        for i, a in enumerate(row_m)
        for j, b in enumerate(col_m)
    ]
    df = spark.createDataFrame(prod, "x string, y string, n_xy bigint")
    r = chi2_from_cells(df).collect()[0]
    assert r["chi2_micro"] == 0
    assert r["cramers_v_micro"] == 0
    assert r["dof"] == (len(row_m) - 1) * (len(col_m) - 1)

    skew = [(x, y, n + (1 if x == "r0" and y == "c0" else 0)) for x, y, n in prod]
    a = chi2_from_cells(
        spark.createDataFrame(skew, "x string, y string, n_xy bigint")
    ).collect()[0]
    b = chi2_from_cells(
        spark.createDataFrame(
            [(y, x, n) for x, y, n in skew], "x string, y string, n_xy bigint"
        )
    ).collect()[0]
    assert a["chi2_micro"] == b["chi2_micro"]
    assert (a["r_levels"], a["c_levels"]) == (b["c_levels"], b["r_levels"])


@FAST
@given(
    extra=st.lists(st.integers(1, 10**6), min_size=5, max_size=30),
)
def test_hill_tail_index_is_scale_invariant(spark, extra):
    """The Hill estimator is built from ln(x_i / x_thr) ratios, so scaling
    every length by 10 leaves the index bit-identical and scales only the
    threshold."""
    from movie_genre_data_pipeline_spark.suite.text_queries import (
        HILL_K,
        hill_from_lengths,
    )

    lengths = extra + [i + 1 for i in range(HILL_K + 20)]

    def report(vals):
        df = spark.createDataFrame(
            list(enumerate(vals)), "doc_id bigint, x bigint"
        )
        return hill_from_lengths(df).collect()[0]

    base = report(lengths)
    scaled = report([10 * v for v in lengths])
    assert scaled["hill_micro"] == base["hill_micro"]
    assert scaled["threshold_chars"] == 10 * base["threshold_chars"]
    assert scaled["n_docs"] == base["n_docs"] == len(lengths)


@FAST
@given(
    rows=st.lists(
        st.tuples(st.integers(-10**5, 10**5), st.integers(-10**5, 10**5)),
        min_size=2,
        max_size=30,
    ),
)
@pytest.mark.slow  # r16 driver-budget: heavy member; runs in the -m slow pass
def test_rank_tau_monotone_invariance_and_symmetry(spark, rows):
    """tau-b is a double rank statistic: strictly monotone transforms of
    either score leave the report bit-identical, and swapping the two
    scores preserves tau (concordance is symmetric)."""
    from movie_genre_data_pipeline_spark.suite.sampling_audit_queries import (
        rank_tau_from_scores,
    )

    def report(rws):
        df = spark.createDataFrame(
            [(i, a, b) for i, (a, b) in enumerate(rws)],
            "doc_id bigint, s1 bigint, s2 bigint",
        )
        return rank_tau_from_scores(df).collect()[0]

    base = report(rows)
    moved = report([(3 * a - 1, b**3) for a, b in rows])
    assert tuple(base) == tuple(moved)

    swapped = report([(b, a) for a, b in rows])
    assert swapped["tau_b_micro"] == base["tau_b_micro"]


@FAST
@given(
    vals=st.lists(
        st.tuples(st.integers(0, 10**4), st.integers(-10**6, 10**6)),
        min_size=1,
        max_size=40,
    ),
    shift=st.integers(-10**6, 10**6),
)
def test_cusum_is_shift_invariant_and_scale_equivariant(spark, vals, shift):
    """The CUSUM trajectory folds deviations from the series mean, so adding
    a constant to every value changes nothing, and doubling every value
    exactly doubles the peak without moving it."""
    from movie_genre_data_pipeline_spark.suite.timeseries_queries import (
        cusum_from_base,
    )

    def report(f):
        df = spark.createDataFrame(
            [("a", ts, i, f(v)) for i, (ts, v) in enumerate(vals)],
            "event_type string, ts bigint, event_id bigint, v bigint",
        )
        return cusum_from_base(df).collect()[0]

    base = report(lambda v: v)
    assert tuple(report(lambda v: v + shift)) == tuple(base)

    doubled = report(lambda v: 2 * v)
    assert doubled["cusum_peak"] == 2 * base["cusum_peak"]
    assert doubled["peak_rn"] == base["peak_rn"]


@FAST
@given(
    strata=st.lists(
        st.lists(st.integers(0, 1000), min_size=1, max_size=8),
        min_size=1,
        max_size=5,
    )
)
def test_neyman_allocation_conserves_budget_and_zero_variance_is_unfunded(
    spark, strata
):
    """Largest-remainder apportionment must hand out exactly the budget,
    and a stratum with zero variance (or a single doc) earns weight 0;
    two identical strata differ by at most the one remainder seat."""
    from movie_genre_data_pipeline_spark.suite.sampling_audit_queries import (
        NEYMAN_BUDGET,
        neyman_from_moments,
    )

    groups = strata + [[1, 100, 10000], [1, 100, 10000], [7]]
    facts = [
        (
            f"g{i}",
            len(xs),
            sum(xs),
            sum(x * x for x in xs),
        )
        for i, xs in enumerate(groups)
    ]
    df = spark.createDataFrame(
        facts, "lang string, n_docs bigint, sx bigint, sxx bigint"
    )
    got = {r["lang"]: r for r in neyman_from_moments(df).collect()}
    assert sum(r["alloc"] for r in got.values()) == NEYMAN_BUDGET

    twin_a = got[f"g{len(groups) - 3}"]
    twin_b = got[f"g{len(groups) - 2}"]
    assert twin_a["w_micro"] == twin_b["w_micro"]
    assert abs(twin_a["alloc"] - twin_b["alloc"]) <= 1

    single = got[f"g{len(groups) - 1}"]
    assert single["std_micro"] == 0 and single["w_micro"] == 0
    for i, xs in enumerate(groups):
        if len(xs) > 1 and len(set(xs)) == 1:
            assert got[f"g{i}"]["w_micro"] == 0


@FAST
@given(
    rows=st.lists(
        st.tuples(st.booleans(), st.integers(-10**5, 10**5)),
        min_size=1,
        max_size=40,
    ).filter(lambda r: any(y for y, _ in r))
)
@pytest.mark.slow  # r16 driver-budget: heavy member; runs in the -m slow pass
def test_lift_gains_monotone_invariance_and_endpoint(spark, rows):
    """The gains table is a rank statistic (affine score transform leaves
    it bit-identical), cumulative gains are nondecreasing, and the last
    tile always closes at exactly 100% of rows and positives."""
    from movie_genre_data_pipeline_spark.suite.sampling_audit_queries import (
        lift_gains_from_labeled,
    )

    def table(rws):
        df = spark.createDataFrame(
            [(i, y, s) for i, (y, s) in enumerate(rws)],
            "doc_id bigint, y boolean, s bigint",
        )
        return sorted(
            (tuple(r) for r in lift_gains_from_labeled(df).collect())
        )

    base = table(rows)
    assert base == table([(y, 5 * s - 2) for y, s in rows])

    t_rows = len(rows)
    t_pos = sum(1 for y, _ in rows if y)
    last = base[-1]
    gains = [r[5] for r in base]
    assert gains == sorted(gains), "cumulative gain must be nondecreasing"
    assert last[3] == t_rows and last[4] == t_pos
    assert last[5] == 1_000_000


@FAST
@given(
    sizes=st.lists(
        st.tuples(st.sampled_from(["en", "de", "fr"]), st.integers(1, 10**6)),
        min_size=1,
        max_size=40,
    )
)
def test_pps_systematic_points_are_conserved(spark, sizes):
    """The systematic PPS grid telescopes: however the corpus is sized or
    ordered, the per-language point counts must sum to exactly
    PPS_POINTS, and no language can select more docs than it holds."""
    from movie_genre_data_pipeline_spark.suite.sampling_audit_queries import (
        PPS_POINTS,
        pps_report_from_sizes,
    )

    df = spark.createDataFrame(
        [(i, lang, sz) for i, (lang, sz) in enumerate(sizes)],
        "doc_id bigint, lang string, sz bigint",
    )
    got = pps_report_from_sizes(df).collect()
    assert sum(r["n_points"] for r in got) == PPS_POINTS
    for r in got:
        assert 0 <= r["n_sel_docs"] <= min(r["n_docs"], r["n_points"])
