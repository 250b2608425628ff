"""Distributed Count-Min sketch as pure DataFrame operations — fixed-size
frequency estimation for heavy-hitter / token-count queries at corpus scale.

Why this exists (same scale argument as `bloom.py`): an exact token histogram
over a 100 TB corpus shuffles one row per DISTINCT key — fine for 10^5 words,
disqualifying for 10^9+ n-grams/URLs/user-ids. A Count-Min sketch aggregates any
key cardinality into a fixed d×w grid of counters with a one-sided error bound
(estimates never undercount; overcount ≤ 2N/w with probability 1-2^-d):

- Build: one explode (d cells per occurrence) + one partial-aggregated
  `count`/`sum` groupBy keyed by (row, col). Map-side combine collapses each
  task's contribution to at most d·w rows before the shuffle, so shuffle volume
  is O(d·w), INDEPENDENT of key cardinality — the property that makes the
  sketch mergeable across partitions, days, and datasets (cell-wise addition).
- Probe: d broadcast-hash left joins (the grid is tiny by construction) + a
  `least()` across the d counters — the probed frame is scanned once, never
  shuffled.
- The overestimate is an explicit part of the contract; callers that need exact
  counts for the flagged heavy hitters follow with an exact count of that small
  subset — the same two-phase discipline as Bloom-then-verify and LSH-then-verify.

Portability discipline: cell columns come from the 48-bit prefix of
md5(key ":" row) — deterministic and engine-reproducible, so a SQL oracle
rebuilds the IDENTICAL grid and reproduces even the collision overestimates
bit-for-bit. Spark's own CountMinSketch (DataFrameStatFunctions.countMinSketch)
is a driver-materialized JVM object; this sketch IS a DataFrame — persistable
as parquet, mergeable by unioning grids and re-summing cells.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _cell(key: Column, row: int, width: int) -> Column:
    """Column index of `key` in sketch row `row`: 48-bit md5 prefix mod width
    (identical construction to bloom._position so oracles share the idiom)."""
    h48 = F.conv(
        F.substring(F.md5(F.concat_ws(":", key, F.lit(str(row)))), 1, 12), 16, 10
    ).cast("bigint")
    return h48 % F.lit(width)


def build_cms(
    items: DataFrame,
    item_col: str,
    width: int = 1024,
    depth: int = 3,
    weight_col: str | None = None,
) -> DataFrame:
    """Aggregate an item stream (one row per occurrence, or weighted rows via
    `weight_col`) into a d×w Count-Min grid: DataFrame of
    (row_idx bigint, col_idx bigint, cnt bigint), at most depth*width rows.

    One explode (depth cells per row) + one partial-aggregated sum — shuffle
    volume bounded by the grid size, not the item cardinality."""
    if width < 1 or depth < 1:
        raise ValueError(f"width and depth must be >= 1, got {width}x{depth}")
    key = F.col(item_col)
    w = F.col(weight_col).cast("bigint") if weight_col else F.lit(1).cast("bigint")
    cells = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(r).cast("bigint").alias("row_idx"),
                    _cell(key, r, width).alias("col_idx"),
                )
                for r in range(depth)
            ]
        )
    ).alias("__cell")
    grid = (
        items.select(cells, w.alias("__w"))
        .groupBy(
            F.col("__cell.row_idx").alias("row_idx"),
            F.col("__cell.col_idx").alias("col_idx"),
        )
        .agg(F.sum("__w").alias("cnt"))
    )
    # Stamp build params into the schema (zero runtime cost, survives parquet)
    # so a probe with mismatched width/depth raises instead of returning
    # plausible nonsense — same contract as bloom_probe.
    return grid.withColumn(
        "cnt", F.col("cnt").alias("cnt", metadata={"width": width, "depth": depth})
    )


def cms_estimate(
    df: DataFrame,
    item_col: str,
    cms: DataFrame,
    width: int = 1024,
    depth: int = 3,
    out_col: str = "cms_est",
) -> DataFrame:
    """Add `out_col` (bigint): the Count-Min estimate of `item_col`'s total
    occurrence count — min over the d counters the item hashes to. Never
    undercounts; overcounts by hash collisions at the documented bound.

    depth broadcast-hash left joins against the tiny grid: the probed frame is
    scanned once and never shuffled. A missing cell row means zero."""
    if width < 1 or depth < 1:
        raise ValueError(f"width and depth must be >= 1, got {width}x{depth}")
    try:
        meta = cms.schema["cnt"].metadata or {}
    except KeyError:
        meta = {}
    built = (meta.get("width"), meta.get("depth"))
    if built != (None, None) and built != (width, depth):
        raise ValueError(
            f"count-min grid was built with width={built[0]}, depth={built[1]} "
            f"but probed with width={width}, depth={depth} — a mismatched probe "
            "returns wrong estimates"
        )
    key = F.col(item_col)
    out = df
    generated: set[str] = set()
    counters: list[Column] = []
    for r in range(depth):
        ccol = f"__cms_col{r}", f"__cms_cnt{r}"
        generated.update(ccol)
        b = F.broadcast(
            cms.filter(F.col("row_idx") == r).select(
                F.col("col_idx").alias(ccol[0]), F.col("cnt").alias(ccol[1])
            )
        )
        out = out.join(b, _cell(key, r, width) == F.col(ccol[0]), "left")
        counters.append(F.coalesce(F.col(ccol[1]), F.lit(0)).cast("bigint"))
    keep = [c for c in out.columns if c not in generated]
    est = F.least(*counters) if len(counters) > 1 else counters[0]
    return out.select(*keep, est.alias(out_col))
