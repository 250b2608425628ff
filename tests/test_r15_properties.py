"""Property-based tests (hypothesis) for the r15 wave's algebraic laws —
invariances the fixture-anchored law tests can't sweep: each runs a few
random tiny grids/series through the REAL report helpers and asserts the
statistic's defining symmetry.
"""

from __future__ import annotations

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


def _kappa(spark, cells):
    from movie_genre_data_pipeline_spark.suite.experiment_queries import (
        kappa_report_from_cells,
    )

    df = spark.createDataFrame(cells, "flag_a int, flag_b int, cnt bigint")
    return kappa_report_from_cells(df).collect()[0]


@FAST
@given(
    n11=st.integers(1, 500),
    n10=st.integers(0, 500),
    n01=st.integers(0, 500),
    n00=st.integers(1, 500),
)
def test_kappa_symmetry_and_perfect_agreement(spark, n11, n10, n01, n00):
    """Kappa is symmetric in the raters (transposing the confusion table —
    swapping n10/n01 — leaves it unchanged), and a diagonal table is
    perfect agreement (exactly 1e6 when pe < 1)."""
    a = _kappa(spark, [(1, 1, n11), (1, 0, n10), (0, 1, n01), (0, 0, n00)])
    b = _kappa(spark, [(1, 1, n11), (1, 0, n01), (0, 1, n10), (0, 0, n00)])
    assert a["kappa_micro"] == b["kappa_micro"]
    perfect = _kappa(spark, [(1, 1, n11), (0, 0, n00)])
    assert perfect["kappa_micro"] == 1_000_000


@FAST
@given(
    strata=st.lists(
        st.tuples(st.integers(1, 2000), st.integers(0, 2000)),
        min_size=1,
        max_size=4,
    )
)
def test_wilson_interval_laws(spark, strata):
    """For every (n, s <= n): bounds are ordered, inside [0, 1e6], contain
    the point estimate, and WIDEN when the same rate is observed on a
    quarter of the evidence (the defining monotonicity of a CI)."""
    from movie_genre_data_pipeline_spark.suite.experiment_queries import (
        wilson_report_from_facts,
    )

    rows = [
        (f"l{i}", 4 * n, 4 * min(s, n)) for i, (n, s) in enumerate(strata)
    ] + [(f"q{i}", n, min(s, n)) for i, (n, s) in enumerate(strata)]
    df = spark.createDataFrame(rows, "lang string, n bigint, s bigint")
    got = {r["lang"]: r for r in wilson_report_from_facts(df).collect()}
    for i, (n, s) in enumerate(strata):
        s = min(s, n)
        big, small = got[f"l{i}"], got[f"q{i}"]
        for r, nn, ss in ((big, 4 * n, 4 * s), (small, n, s)):
            p_micro = ss * 1_000_000 / nn
            assert 0 <= r["lo_micro"] <= p_micro + 1
            assert p_micro - 1 <= r["hi_micro"] <= 1_000_000
        # same rate, 4x the evidence: the interval strictly tightens
        # (allow 1 micro slack for the half-up quantization on each bound)
        assert big["hi_micro"] - big["lo_micro"] <= (
            small["hi_micro"] - small["lo_micro"] + 2
        )


@FAST
@given(
    counts=st.lists(st.integers(0, 200), min_size=30, max_size=60),
    offset=st.integers(1, 1000),
)
def test_ljung_box_is_shift_invariant(spark, counts, offset):
    """Q is built from Pearson autocorrelations, so adding a constant rate
    to every hour must not move it (the law that distinguishes
    autocorrelation from raw magnitude)."""
    from movie_genre_data_pipeline_spark.suite.timeseries_queries import (
        ljung_box_from_counts,
    )

    base = spark.createDataFrame(
        list(enumerate(counts)), "hour_id bigint, cnt bigint"
    )
    shifted = spark.createDataFrame(
        [(h, c + offset) for h, c in enumerate(counts)],
        "hour_id bigint, cnt bigint",
    )
    q0 = ljung_box_from_counts(base).collect()[0]
    q1 = ljung_box_from_counts(shifted).collect()[0]
    assert q0["q_micro"] == q1["q_micro"]
    assert q0["n_hours"] == q1["n_hours"] == len(counts)


@FAST
@given(
    cents=st.lists(st.integers(1, 10**9), min_size=1, max_size=40),
)
def test_benford_digit_is_scale_invariant_under_power_of_ten(spark, cents):
    """The first significant digit is invariant under x10 — the property
    that makes Benford's law unit-free (dollars vs cents can't change the
    screen's verdict)."""
    from movie_genre_data_pipeline_spark.suite.experiment_queries import (
        benford_report_from_digits,
        _BENFORD_DIGIT,
    )
    from pyspark.sql import functions as F

    def digits(vals):
        df = spark.createDataFrame([(v,) for v in vals], "cents bigint")
        d = df.selectExpr(f"{_BENFORD_DIGIT} AS digit").groupBy("digit").agg(
            F.count(F.lit(1)).cast("bigint").alias("cnt")
        )
        return {
            (r["digit"], r["n_obs"]): (r["p_obs_micro"], r["dev_micro"])
            for r in benford_report_from_digits(d).collect()
        }

    assert digits(cents) == digits([10 * v for v in cents])


@FAST
@given(
    grid=st.lists(
        st.tuples(
            st.sampled_from(["en", "de", "fr"]),
            st.sampled_from(["s0", "s1", "s2", "s3"]),
            st.integers(1, 400),
        ),
        min_size=2,
        max_size=12,
        unique_by=lambda t: (t[0], t[1]),
    )
)
def test_raking_weights_positive_and_last_axis_on_target(spark, grid):
    """On ANY random grid (structural zeros included, where a
    doubly-uniform table may not even exist and IPF converges to the
    KL-closest fit instead): every weight stays strictly positive, the
    quantized trajectory is bit-identical to a pure-python replay, and the
    LAST-scaled axis (sources) sits on its uniform target up to the
    per-cell half-micro quantization — the one margin property a finite
    IPF run guarantees unconditionally."""
    import math as _m

    from movie_genre_data_pipeline_spark.suite.experiment_queries import (
        IPF_ROUNDS,
        raking_report_from_cells,
    )

    df = spark.createDataFrame(grid, "lang string, source string, n bigint")
    rows = raking_report_from_cells(df).collect()
    assert all(r["w_micro"] > 0 for r in rows)

    cells = {(lg, s): n for lg, s, n in grid}
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
                if tot[k[axis_idx]] > 0:
                    w[k] = _m.floor(w[k] * target / tot[k[axis_idx]] + 0.5)
    got = {(r["lang"], r["source"]): r["w_micro"] for r in rows}
    assert got == w  # bit-identical trajectory on arbitrary grids

    for s in sources:
        m = sum(cells[k] * w[k] for k in cells if k[1] == s)
        slack = sum(cells[k] for k in cells if k[1] == s)
        assert abs(m - ts) <= slack


@FAST
@given(
    units=st.lists(
        st.tuples(st.integers(0, 10**6), st.integers(0, 10**6)),
        min_size=4,
        max_size=30,
    ),
    shift=st.integers(1, 10**5),
)
def test_cuped_theta_shift_invariant_and_adjustment_vanishes(
    spark, units, shift
):
    """theta = cov(pre, post)/var(pre) is invariant under shifting every
    POST value by a constant, and when pre is CONSTANT (zero variance) the
    guard must fall back to the raw means exactly."""
    from movie_genre_data_pipeline_spark.suite.experiment_queries import (
        cuped_report_from_units,
    )

    def report(rows):
        df = spark.createDataFrame(
            [(i, a, b) for i, (a, b) in enumerate(rows)],
            "c bigint, pre_cents bigint, post_cents bigint",
        )
        return {r["arm"]: r for r in cuped_report_from_units(df).collect()}

    r0 = report(units)
    r1 = report([(a, b + shift) for a, b in units])
    for arm in r0:
        assert r0[arm]["theta_micro"] == r1[arm]["theta_micro"]

    const = report([(7, b) for _, b in units])
    for arm, r in const.items():
        assert r["theta_micro"] == 0
        assert r["mean_adj_micro"] == r["mean_post_micro"]
