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
