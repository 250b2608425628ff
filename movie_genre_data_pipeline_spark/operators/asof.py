"""As-of (most-recent-prior) join — a time-series operator Spark's DataFrame API
lacks natively, built as a composition of built-in ops (no UDF, no range cross
join).

Scale design: the naive plan is a range join (left × right filtered on
right_ts <= left_ts, then argmax) — O(n·m) within each key and a Catalyst
non-equi join, which at 100 TB is the bottleneck. This implementation instead
UNIONS the two sides and takes `last(value, ignorenulls=true)` over a
(key, time)-ordered window: exactly ONE shuffle on the key, linear work,
AQE-skew-splittable — the standard log-structured as-of shape. DuckDB's
ASOF JOIN (the correctness oracle) implements identical semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right_ts <= left_ts`` sharing the join key(s); left rows with no prior
    right row get nulls (ASOF LEFT JOIN semantics).

    Returns all left columns plus ``<right_ts><suffix>`` and each requested
    right column as ``<col><suffix>``. At equal timestamps the right row is
    visible to the left row (inclusive, matching DuckDB ``ON l.ts >= r.ts``).
    """
    keys = [on] if isinstance(on, str) else list(on)
    right_cols = right_cols or [
        c for c in right.columns if c not in keys and c != right_ts
    ]

    carried = [right_ts] + right_cols
    l_tagged = left.select(
        *keys,
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in left.columns if c not in keys],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in carried],
    )
    r_tagged = right.select(
        *keys,
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in keys],
        *[F.col(c).alias(f"__r_{c}") for c in carried],
    )
    unioned = l_tagged.unionByName(r_tagged)

    # right rows (__side=0) sort before left rows at the same __t → inclusive
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__t").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "*",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__f_{c}")
            for c in carried
        ],
    )
    out_cols = (
        [F.col(k) for k in keys]
        + [F.col("__t").alias(left_ts)]
        + [F.col(c) for c in left.columns if c not in keys and c != left_ts]
        + [F.col(f"__f_{c}").alias(f"{c}{suffix}") for c in carried]
    )
    return filled.filter(F.col("__side") == 1).select(*out_cols)
