"""Declarative data-quality expectations — the Delta Live Tables
`@dlt.expect_*` / dbt-test surface as plain DataFrame operators.

The reference's quarantine flow hard-codes ONE rule (negative runtime —
operations/operations.py:96-109, `generate_clean_and_quarantine_dataframes`);
production pipelines carry dozens of rules with per-rule dispositions. This
module generalizes: an expectation is (name, predicate, action) with
dlt-matching actions — 'warn' (keep row, count violation), 'drop' (route row
out), 'fail' (abort the run if any violation).

Scale shape: ALL rules evaluate in ONE pass — each rule is a boolean column,
the report is a single hash aggregate of conditional counts (map-side
combined), and routing is one filter on the conjunction of 'drop' rules. No
per-rule scans; k rules cost k codegen'd boolean exprs, not k jobs. The
`fail` check is an aggregate-scalar decision (one driver boolean), evaluated
with the same single report aggregate.
"""

from __future__ import annotations

from collections.abc import Sequence
from typing import NamedTuple

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_ACTIONS = ("warn", "drop", "fail")
# Rule names are interpolated into the stack() SQL string and the __p_/__f_
# column aliases — restrict to identifier characters so a quote/space/backtick
# can't break the generated expression or mangle the report.
_IDENT = re.compile(r"^[A-Za-z0-9_]+$")


class Expectation(NamedTuple):
    name: str
    predicate: Column | str  # True == row passes
    action: str = "warn"


def _pred(e: Expectation) -> Column:
    p = F.expr(e.predicate) if isinstance(e.predicate, str) else e.predicate
    # NULL predicate results count as violations (dlt semantics)
    return F.coalesce(p, F.lit(False))


def check_expectations(
    df: DataFrame, expectations: Sequence[Expectation]
) -> DataFrame:
    """The quality report: one row per rule —
    (rule_name, action, n_pass, n_fail, fail_rate) — from a SINGLE aggregate
    over one scan (2k conditional counts, map-side combined)."""
    if not expectations:
        raise ValueError("expectations must be non-empty")
    for e in expectations:
        if e.action not in _ACTIONS:
            raise ValueError(f"unknown action {e.action!r} for rule {e.name!r}")
        if not _IDENT.match(e.name):
            raise ValueError(
                f"rule name {e.name!r} must match [A-Za-z0-9_]+ (it is "
                "interpolated into generated SQL and column aliases)"
            )
    aggs = []
    for e in expectations:
        p = _pred(e)
        aggs.append(
            F.sum(F.when(p, 1).otherwise(0)).cast("bigint").alias(f"__p_{e.name}")
        )
        aggs.append(
            F.sum(F.when(p, 0).otherwise(1)).cast("bigint").alias(f"__f_{e.name}")
        )
    wide = df.agg(*aggs)
    # unpivot the single wide row into per-rule rows — stack() is one
    # projection over the 1-row aggregate, not another scan
    stack_args = ", ".join(
        f"'{e.name}', '{e.action}', __p_{e.name}, __f_{e.name}"
        for e in expectations
    )
    long = wide.select(
        F.expr(
            f"stack({len(expectations)}, {stack_args}) "
            "AS (rule_name, action, n_pass, n_fail)"
        )
    )
    return long.select(
        "rule_name",
        "action",
        "n_pass",
        "n_fail",
        F.round(
            F.try_divide(F.col("n_fail"), F.col("n_pass") + F.col("n_fail")), 6
        ).alias("fail_rate"),
    )


def enforce_expectations(
    df: DataFrame, expectations: Sequence[Expectation]
) -> tuple[DataFrame, DataFrame]:
    """(kept, dropped): route rows by the conjunction of 'drop'-action rules —
    one filter each way, same single-pass rule evaluation. 'warn' rules don't
    gate rows; 'fail' rules are a report-time decision (`assert_expectations`)."""
    drop_rules = [e for e in expectations if e.action == "drop"]
    if not drop_rules:
        return df, df.limit(0)
    cond = _pred(drop_rules[0])
    for e in drop_rules[1:]:
        cond = cond & _pred(e)
    return df.filter(cond), df.filter(~cond)


def assert_expectations(report: DataFrame) -> None:
    """Abort (raise ValueError) if any 'fail'-action rule has violations —
    the dlt expect_or_fail semantics, decided on the aggregate report."""
    bad = (
        report.filter((F.col("action") == "fail") & (F.col("n_fail") > 0))
        .select("rule_name", "n_fail")
        .collect()
    )
    if bad:
        detail = ", ".join(f"{r['rule_name']}({r['n_fail']})" for r in bad)
        raise ValueError(f"failed expectations: {detail}")


def histogram_drift(
    old: DataFrame,
    new: DataFrame,
    value_col: str,
    lo: float,
    width: float,
    n_bins: int,
) -> DataFrame:
    """Distribution-drift report between two snapshots of a numeric column:
    one row per fixed uniform bin with both sides' counts/proportions and the
    per-bin contributions of three drift statistics —

    - tvd_term: |p_old − p_new| / 2 (total variation distance),
    - chi2_term: (p_new − p_old)² / p_old (Pearson χ², NULL where the
      reference bin is empty — the standard exclusion),
    - ks_cum: |CDF_old − CDF_new| at the bin's upper edge (the binned
      Kolmogorov–Smirnov statistic is the max over rows).

    Deliberately NO PSI: PSI's ln() is a transcendental whose last-ulp value
    is libm-implementation-specific, which breaks bit-reproducibility across
    engines; TVD/χ²/KS carry the same drift signal in rational arithmetic
    (integer counts → one division each), so every output digit is
    reproducible. Bin edges are FIXED (caller-supplied), not data-derived —
    the production pattern is edges frozen from a reference period, so the
    report is one scan per snapshot (two hash aggregates on ≤n_bins keys)
    with no quantile pass.

    Values below `lo` clamp into bin 0 and values beyond the top edge into
    bin n_bins−1, so proportions always sum to 1 on both sides.
    """
    if n_bins < 2 or width <= 0:
        raise ValueError(f"need n_bins >= 2 and width > 0, got {n_bins}, {width}")
    o = bin_counts(old, value_col, lo, width, n_bins, "n_old")
    n = bin_counts(new, value_col, lo, width, n_bins, "n_new")
    return drift_from_counts(o, n)


def bin_counts(
    df: DataFrame, value_col: str, lo: float, width: float, n_bins: int, out: str
) -> DataFrame:
    """(bin_idx, <out>): clamped uniform-bin histogram counts — the additive
    form both the batch report and the streaming per-batch fold aggregate."""
    b = F.least(
        F.lit(n_bins - 1),
        F.greatest(
            F.lit(0),
            F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width)).cast("int"),
        ),
    )
    return df.select(b.alias("bin_idx")).groupBy("bin_idx").agg(
        F.count(F.lit(1)).alias(out)
    )


def drift_from_counts(o: DataFrame, n: DataFrame) -> DataFrame:
    """The report core over pre-binned counts (bin_idx, n_old) x (bin_idx,
    n_new) — counts are additive, so a streaming consumer folds per-batch
    deltas and hands the folded ledger straight here: stream == batch by
    construction, no row reconstruction."""
    from pyspark.sql import Window

    z = F.lit(0).cast("bigint")
    j = (
        o.join(n, "bin_idx", "full_outer")
        .select(
            "bin_idx",
            F.coalesce("n_old", z).alias("n_old"),
            F.coalesce("n_new", z).alias("n_new"),
        )
    )
    tot = j.agg(
        F.sum("n_old").alias("__to"), F.sum("n_new").alias("__tn")
    )
    w = Window.orderBy("bin_idx").rowsBetween(Window.unboundedPreceding, 0)
    # try_divide: an EMPTY side has no distribution — its proportions (and
    # every stat derived from them) surface as NULL rather than a
    # divide-by-zero failure under ANSI mode. "No data" is a report state,
    # not a crash.
    p_old = F.try_divide(F.col("n_old"), F.col("__to"))
    p_new = F.try_divide(F.col("n_new"), F.col("__tn"))
    return (
        j.crossJoin(F.broadcast(tot))
        .withColumn("__po", p_old)
        .withColumn("__pn", p_new)
        .select(
            "bin_idx",
            "n_old",
            "n_new",
            F.round("__po", 6).alias("p_old"),
            F.round("__pn", 6).alias("p_new"),
            F.round(F.abs(F.col("__po") - F.col("__pn")) / 2, 6).alias("tvd_term"),
            F.round(
                F.when(
                    F.col("__po") > 0,
                    F.pow(F.col("__pn") - F.col("__po"), 2) / F.col("__po"),
                ),
                6,
            ).alias("chi2_term"),
            F.round(
                F.abs(F.sum("__po").over(w) - F.sum("__pn").over(w)), 6
            ).alias("ks_cum"),
        )
        .orderBy("bin_idx")
    )
