"""Distributed equi-width histogram quantiles as pure DataFrame operations —
the fourth sketch: fixed-size QUANTILE estimation at any row cardinality.

Family slot (see SCALE.md §9e): cms=frequency, hll=cardinality,
kmv=resemblance, THIS=distribution shape. Spark's `percentile` is exact but
sort-based (a per-group sort of every value); `approx_percentile` (KLL-ish) is
an opaque per-query aggregate. A counting histogram is the mergeable,
persistable middle ground operations teams actually run at 100 TB:

- Build: one scan computes each value's bin (clamped floor((v-lo)/width) —
  pure codegen arithmetic) + one partial-aggregated count groupBy. Map-side
  combine caps each task's shuffle output at n_bins rows per group, so shuffle
  volume is O(groups × bins), independent of row count. Histograms merge by
  cell-wise addition (union + re-sum) — across partitions, days, datasets.
- Estimate: NumPy-style linear interpolation inside the bin where the
  cumulative count crosses q·n. Error is bounded by one bin width — an
  EXPLICIT knob (bins × range), unlike rank-error sketches whose value error
  depends on the data.
- The lo/hi range is part of the sketch's declared contract (out-of-range
  values clamp into the edge bins and distort them); pick it from domain
  knowledge or a prior min/max scan, and widen bins rather than silently
  dropping tails.

Portability discipline: bin assignment and interpolation are plain IEEE
double arithmetic on identical operands (no transcendentals), so a SQL oracle
rebuilds the IDENTICAL histogram and reproduces the estimates — and their
error vs. the exact percentile — bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def build_histogram(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Equi-width counting histogram: (*group_cols, bin bigint, cnt bigint),
    at most n_bins rows per group. NULL values are dropped; values outside
    [lo, hi) clamp into the edge bins (documented contract)."""
    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")
    if not hi > lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi})")
    width = (hi - lo) / n_bins
    raw_bin = F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width))
    bin_ = F.least(F.lit(n_bins - 1), F.greatest(F.lit(0), raw_bin)).cast("bigint")
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(*group_cols, bin_.alias("bin"))
        .groupBy(*group_cols, "bin")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def histogram_quantiles(
    hist: DataFrame,
    qs: Sequence[float],
    lo: float,
    hi: float,
    n_bins: int,
    group_cols: Sequence[str] = (),
    out_prefix: str = "hq",
    decimals: int = 6,
) -> DataFrame:
    """Per-group quantile estimates from a `build_histogram` output: for each
    q, linear interpolation at rank q·n inside the crossing bin —
    est = lo + (bin + (q·n − cum_before)/cnt) · width. Output columns
    ``n`` (bigint) and ``{out_prefix}{q*100:g}`` per q, rounded.

    Cost: one window + one aggregation over histogram-sized data
    (groups × bins rows) — the raw values are never touched again."""
    if not qs:
        raise ValueError("qs must be non-empty")
    if any(not 0.0 < q <= 1.0 for q in qs):
        raise ValueError(f"quantiles must be in (0, 1], got {qs}")
    width = (hi - lo) / n_bins
    w = Window.partitionBy(*group_cols).orderBy(F.col("bin").asc())
    cum = F.sum("cnt").over(w)
    rows = hist.withColumn("__cum", cum).withColumn(
        "__cum_prev", F.col("__cum") - F.col("cnt")
    )
    totals = rows.groupBy(*group_cols).agg(F.max("__cum").alias("__n"))
    if group_cols:
        joined = rows.join(F.broadcast(totals), list(group_cols))
    else:
        joined = rows.crossJoin(F.broadcast(totals))
    aggs = []
    for q in qs:
        target = F.lit(float(q)) * F.col("__n")
        est = F.lit(lo) + (
            F.col("bin") + (target - F.col("__cum_prev")) / F.col("cnt")
        ) * F.lit(width)
        name = f"{out_prefix}{q * 100:g}"
        # exactly ONE bin satisfies cum_prev < target <= cum (histogram rows
        # all have cnt > 0); the bound on cum_prev matters — a later bin's
        # extrapolation (negative in-bin fraction) could otherwise undercut
        # the crossing bin's estimate and win the min()
        crossing = (F.col("__cum") >= target) & (F.col("__cum_prev") < target)
        aggs.append(
            F.round(F.min(F.when(crossing, est)), decimals).alias(name)
        )
    return joined.groupBy(*group_cols).agg(
        F.max("__n").cast("bigint").alias("n"), *aggs
    )
