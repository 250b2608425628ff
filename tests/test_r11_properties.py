"""Property-based tests (hypothesis) for the earlier text/sampling waves'
algebraic laws (r11-era helpers) — random tiny inputs through the REAL
report helpers: order statistics stay ordered, dispersion vanishes on
deterministic corpora, and log-log fits are scale-equivariant."""

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


@FAST
@given(
    reps=st.lists(
        st.tuples(st.integers(1, 10**6), st.integers(0, 10**9)),
        min_size=32,
        max_size=32,
    ),
    const_kq=st.integers(0, 10**9),
    n_docs=st.integers(1, 10**4),
    sum_q=st.integers(0, 10**9),
)
def test_bootstrap_ci_is_ordered_and_collapses_on_constant_replicates(
    spark, reps, const_kq, n_docs, sum_q
):
    """The percentile CI is an order statistic (lo <= hi on any replicate
    set), and when every replicate resolves to the same weighted mean the
    interval collapses to that point exactly."""
    from movie_genre_data_pipeline_spark.suite.sampling_eval_queries import (
        BOOT_B,
        bootstrap_ci_from_facts,
    )

    assert len(reps) == BOOT_B

    def report(rows):
        df = spark.createDataFrame(
            rows,
            "lang string, r bigint, n_docs bigint, sum_q bigint,"
            " sum_k bigint, sum_kq bigint",
        )
        return {r["lang"]: r for r in bootstrap_ci_from_facts(df).collect()}

    ragged = [
        ("rag", r, n_docs, sum_q, k, kq) for r, (k, kq) in enumerate(reps)
    ]
    const = [
        ("const", r, n_docs, sum_q, 1000, const_kq) for r in range(BOOT_B)
    ]
    got = report(ragged + const)

    rag = got["rag"]
    assert rag["n_replicates"] == BOOT_B
    assert rag["ci_lo_micro"] <= rag["ci_hi_micro"]

    c = got["const"]
    m = (const_kq * 2 + 1000) // 2000  # FLOOR(kq/1000 + 0.5) half-up
    assert c["ci_lo_micro"] == c["ci_hi_micro"] == m


@FAST
@given(
    counts=st.lists(st.integers(1, 10**6), min_size=3, max_size=20, unique=True),
)
def test_zipf_fit_is_scale_equivariant(spark, counts):
    """Scaling every count by 10 is a vertical shift on the log-log plane:
    the fitted slope must not move (beyond the per-point half-micro ln
    jitter) and the intercept must shift by ln(10)."""
    import math

    from movie_genre_data_pipeline_spark.suite.text_queries import (
        zipf_fit_from_counts,
    )

    def fit(vals):
        df = spark.createDataFrame(
            [(f"t{i}", c) for i, c in enumerate(vals)], "term string, cnt bigint"
        )
        return zipf_fit_from_counts(df).collect()[0]

    base = fit(counts)
    scaled = fit([10 * c for c in counts])
    assert base["n_ranks"] == scaled["n_ranks"] == len(counts)
    assert abs(scaled["slope_micro"] - base["slope_micro"]) <= 5
    assert (
        abs(
            scaled["intercept_micro"]
            - base["intercept_micro"]
            - round(math.log(10) * 1e6)
        )
        <= 25
    )


@FAST
@given(
    n_docs=st.integers(2, 200),
    terms=st.lists(
        st.lists(st.integers(1, 20), min_size=1, max_size=30),
        min_size=1,
        max_size=5,
    ),
)
def test_burstiness_fano_nonnegative_and_zero_on_uniform_presence(
    spark, n_docs, terms
):
    """The Fano factor is a variance ratio: never negative on any
    consistent fact set, and exactly 0 (at mean exactly 1) for a term
    occurring once in every document."""
    from pyspark.sql import functions as F

    from movie_genre_data_pipeline_spark.suite.text_queries import (
        burstiness_report_from_facts,
    )

    facts = [("uniform", n_docs, n_docs, n_docs)]
    for i, xs in enumerate(terms):
        xs = xs[:n_docs]  # at most one count per doc
        facts.append(
            (f"t{i}", len(xs), sum(xs), sum(x * x for x in xs))
        )
    df = spark.createDataFrame(
        facts, "term string, df bigint, sum_x bigint, sum_x2 bigint"
    )
    nd = df.sparkSession.createDataFrame([(n_docs,)], "n_docs bigint").agg(
        F.max("n_docs").cast("bigint").alias("n_docs")
    )
    got = {r["term"]: r for r in burstiness_report_from_facts(df, nd).collect()}

    u = got["uniform"]
    assert u["fano_micro"] == 0
    assert u["mean_micro"] == 1_000_000
    for r in got.values():
        assert r["fano_micro"] >= 0
        assert r["n_occurrences"] >= r["df"]
