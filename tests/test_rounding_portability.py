"""Rounding-portability pins (VERDICT r06 #1/#2/#7).

All three r6 driver-red queries shared one defect class: publishing a ROUNDed
double that is NOT derived from exact integers. Two engines then round
differently in two distinct ways:

1. half-way decimals — ×1.1 of a 2-dp money value creates 3-dp .xx5 cases
   where Spark (exact-BigDecimal HALF_UP on the binary expansion) and DuckDB
   (scaled-float rounding) disagree by one cent;
2. sub-ulp scales — ROUND(d, 4) on a double of magnitude ~1e12 (ulp ≈ 1.2e-4)
   asks for a grid finer than the representation; the engines pick adjacent
   doubles.

The fix pattern is pinned here mechanically:
- the integer-cent reprice ((cents·11 + 5) DIV 10) is bit-equal between Spark
  and DuckDB on an adversarial sweep of half-way amounts, and equals exact
  decimal arithmetic (Python `decimal` ground truth);
- a registry lint rejects any oracle that ROUNDs a product with an
  odd-numerator decimal multiplier at a scale too fine for the product's
  decimals (the exact shape that shipped r6's three reds).
"""

from __future__ import annotations

import re
from decimal import ROUND_HALF_UP, Decimal

import duckdb
import pytest

# 2-dp amounts whose ×1.1 lands exactly on a 3-dp half (cents ending in 5
# after ×11), plus magnitude extremes; the r6 failures were exactly this shape
# (e.g. 50221.545 → Spark 50221.54, DuckDB 50221.55).
ADVERSARIAL_AMOUNTS = [
    c / 100.0
    for c in range(5, 20_000_005, 98_765)  # cents*11 % 10 == 5 when c % 10 == 5
    if (c * 11) % 10 == 5
] + [0.05, 0.15, 455_000.45, 50_221.45, 999_999.95]


def _spark_reprice(spark, amounts: list[float]) -> list[float]:
    df = spark.createDataFrame([(a,) for a in amounts], "amt double")
    return [
        r["r"]
        for r in df.selectExpr(
            "CAST((CAST(ROUND(amt * 100) AS BIGINT) * 11 + 5) DIV 10 AS DOUBLE)"
            " / 100.0 AS r"
        ).collect()
    ]


def _duckdb_reprice(amounts: list[float]) -> list[float]:
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join(f"({a!r})" for a in amounts)
        + ") v(amt)"
    )
    return [
        r[0]
        for r in con.sql(
            "SELECT CAST((CAST(ROUND(amt * 100) AS BIGINT) * 11 + 5) // 10"
            " AS DOUBLE) / 100.0 FROM t"
        ).fetchall()
    ]


def test_integer_cent_reprice_is_engine_portable(spark):
    """The gold-IVM reprice must be bit-identical in Spark and DuckDB on
    half-way adversaries, and equal exact decimal ×1.1 HALF_UP."""
    amounts = ADVERSARIAL_AMOUNTS
    got_spark = _spark_reprice(spark, amounts)
    got_duck = _duckdb_reprice(amounts)
    assert got_spark == got_duck
    for a, r in zip(amounts, got_spark):
        want = float(
            (Decimal(str(a)) * Decimal("1.1")).quantize(
                Decimal("0.01"), rounding=ROUND_HALF_UP
            )
        )
        assert r == want, (a, r, want)


def test_float_reprice_class_is_actually_divergent():
    """Documents WHY the rule exists: the naive ROUND(amt*1.1, 2) disagrees
    with exact decimal HALF_UP somewhere on the sweep in at least one engine
    (r6 measured 12/1142 driver rows off by one cent). If this ever starts
    passing everywhere, the lint below is still the contract — this test just
    records the hazard is real, so it asserts on the ground truth comparison,
    not on a specific engine's direction."""
    con = duckdb.connect()
    diverged = 0
    for a in ADVERSARIAL_AMOUNTS:
        got = con.sql(f"SELECT ROUND({a!r} * 1.1, 2)").fetchone()[0]
        want = float(
            (Decimal(str(a)) * Decimal("1.1")).quantize(
                Decimal("0.01"), rounding=ROUND_HALF_UP
            )
        )
        if got != want:
            diverged += 1
    # the adversarial sweep is BUILT from half-way cases; a scaled-float
    # rounder cannot hit exact decimal HALF_UP on all of them
    assert diverged > 0


# -- registry lint: the r6 failure shape cannot re-enter an oracle ----------------------

# ROUND(<expr>, <scale>) with a one-level-nested expr
_ROUND = re.compile(r"ROUND\s*\(([^()]*(?:\([^()]*\)[^()]*)*),\s*(\d+)\s*\)", re.I)
# a decimal-literal multiplication inside the rounded expression
_MUL = re.compile(r"\*\s*(\d*\.\d+)")


def _unsafe_rounds(sql: str) -> list[str]:
    """ROUND(x * m, d) is flagged when m = p/10^q has ODD p (creates exact
    half-way cases from 2-dp money inputs) and d < 2 + q (the round actually
    discards the half-way digit). Even p (e.g. 0.4) can't produce .xx5;
    d >= 2+q (e.g. tpch_q11's ROUND(x*2.5, 6)) never rounds the product."""
    bad = []
    for m in _ROUND.finditer(sql):
        expr, scale = m.group(1), int(m.group(2))
        for lit in _MUL.findall(expr):
            q = len(lit.split(".")[1].rstrip("0"))
            p = int(Decimal(lit).scaleb(q))
            if p % 2 == 1 and scale < 2 + q:
                bad.append(f"ROUND({expr.strip()}, {scale})")
    return bad


def test_no_oracle_rounds_an_odd_decimal_product():
    from movie_genre_data_pipeline_spark.suite import all_queries

    offenders = {
        name: bad
        for name, spec in all_queries().items()
        if spec.oracle and (bad := _unsafe_rounds(spec.oracle))
    }
    assert not offenders, (
        "oracles ROUND a product with an odd-numerator decimal multiplier at "
        "a scale that discards half-way digits — derive the value from exact "
        f"integers instead (r6 failure class): {offenders}"
    )


def test_published_round_not_finer_than_ulp():
    """The sim_centroid_representatives class: any oracle that ROUNDs at
    scale>=1 a quantity built from KMEANS_SCALE-quantized squared distances
    (magnitude ~1e12, ulp ~1.2e-4) would publish a sub-ulp grid. The suite's
    rule: quantized-distance publications are integers. Pin the one current
    publication site."""
    from movie_genre_data_pipeline_spark.suite.similarity_queries import (
        Q_CENTROID_REPS_ORACLE,
    )

    assert "CAST(ROUND(d, 0) AS BIGINT)" in Q_CENTROID_REPS_ORACLE
    assert not re.search(r"ROUND\s*\(\s*d\s*,\s*[1-9]", Q_CENTROID_REPS_ORACLE)


@pytest.fixture(scope="module")
def spark():
    import sys

    sys.path.insert(0, "/root/repo")
    from movie_genre_data_pipeline_spark.session import build_session

    return build_session(app_name="test-rounding-portability")
