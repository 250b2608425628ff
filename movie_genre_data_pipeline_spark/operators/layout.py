"""Multi-dimensional data layout: Morton (Z-order) clustering for data skipping.

Why: at 100 TB, the dominant cost of a selective query is the scan, and the
dominant lever on the scan is file/row-group pruning from parquet min/max
statistics. Sorting by ONE column gives perfect pruning on that column and none
on any other; interleaving the bits of two (or more) columns gives bounded
min/max ranges on EVERY interleaved column in every file — the layout Delta's
OPTIMIZE ZORDER BY and Iceberg's sort-order rewrite produce. This module
implements the same idea with nothing but built-in column expressions:

- `zvalue(x, y)` — textbook Morton encoding via the mask-shift "bit spreading"
  chain (Sean Anderson's Bit Twiddling Hacks; public domain), entirely in
  fixed-shift bitwise expressions → whole-stage codegen, no UDFs.
- Inputs are first scaled onto a 2^bits integer grid with *integer-exact*
  affine ranking ((v - min) * (2^bits - 1)) div (max - min) — exact in any
  engine, so an external SQL oracle reproduces the z-values bit-for-bit.
- `write_zordered` — repartitionByRange on the z-value (one range-partitioning
  shuffle with sampled bounds — Spark's scalable sort machinery, no driver
  materialization) + sortWithinPartitions, so each output file covers a
  disjoint z-range ⇒ tight per-file min/max on both dimensions.

Scale notes: the only shuffle is the range partitioning itself — the exact
shuffle a global sort would pay, reused as the layout. Min/max normalization
stats are a single partial-aggregated scan reduced to 4 scalars (broadcast back
as literals, same pattern as k-means centroids). Skew in z-space is handled by
repartitionByRange's reservoir sampling of bounds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (shift, mask) chain spreading the low 16 bits of a bigint so bit i lands at
# position 2i. Masks in decimal so the identical constants can be pasted into an
# engine-neutral SQL oracle.
_SPREAD_STEPS: tuple[tuple[int, int], ...] = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def spread_bits16(c: Column) -> Column:
    """Spread a value in [0, 2^16) so bit i moves to bit 2i (zeros between)."""
    x = c.cast("bigint").bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD_STEPS:
        x = x.bitwiseOR(F.shiftleft(x, shift)).bitwiseAND(F.lit(mask))
    return x


def zvalue(x: Column, y: Column) -> Column:
    """Morton-interleave two grid coordinates in [0, 2^16): x takes the even
    bits, y the odd bits. Monotone locality: nearby (x, y) ⇒ nearby z."""
    return spread_bits16(x).bitwiseOR(F.shiftleft(spread_bits16(y), 1))


# (c - min) * (2^16 - 1) must stay inside BIGINT: ranges above 2^47 would
# overflow the numerator, so they are rejected at runtime (raise_error), not
# silently wrapped. Nanosecond-epoch timestamps exceed this — bucket them to
# micro/milliseconds (or rebase to the column min) before z-ordering.
MAX_GRID_RANGE = 1 << 47


def scale_to_grid(c: Column, cmin: Column, cmax: Column, bits: int = 16) -> Column:
    """Affine-rank a value onto the integer grid [0, 2^bits) given its column
    min/max. Integer-exact: ((c-min)*(2^bits-1)) div (max-min) with TRUE integer
    division (SQL `div`, not `/` — Spark's `/` is double division, exact only
    while the numerator ≤ 2^53) — no floating rounding anywhere, so any engine
    gets the identical grid cell. Degenerate (min == max) maps everything to
    cell 0; ranges wider than MAX_GRID_RANGE raise rather than overflow."""
    num = (c.cast("bigint") - cmin.cast("bigint")) * F.lit((1 << bits) - 1)
    den = (cmax.cast("bigint") - cmin.cast("bigint"))
    return (
        F.when(
            den > F.lit(MAX_GRID_RANGE),
            F.raise_error(
                F.lit(
                    "scale_to_grid: column range exceeds 2^47 — the grid "
                    "numerator would overflow BIGINT; rebase or coarsen the "
                    "column first"
                )
            ),
        )
        .when(den <= 0, F.lit(0).cast("bigint"))
        .otherwise(F.call_function("div", num, den))
    )


def with_zvalue(
    df: DataFrame, x_col: str, y_col: str, out_col: str = "z", bits: int = 16
) -> DataFrame:
    """Append the Morton z-value of (x_col, y_col), min/max-scaled to the grid.

    The normalization stats are one aggregate scan reduced to 4 scalars and
    joined back via a broadcast of a single row — Catalyst turns the join into
    a broadcast nested-loop over 1 row (free), and every downstream expression
    stays in codegen."""
    stats = df.agg(
        F.min(x_col).alias("__xmin"),
        F.max(x_col).alias("__xmax"),
        F.min(y_col).alias("__ymin"),
        F.max(y_col).alias("__ymax"),
    )
    gx = scale_to_grid(
        F.col(x_col), F.col("__xmin"), F.col("__xmax"), bits
    )
    gy = scale_to_grid(
        F.col(y_col), F.col("__ymin"), F.col("__ymax"), bits
    )
    return (
        df.crossJoin(F.broadcast(stats))
        .withColumn(out_col, zvalue(gx, gy))
        .drop("__xmin", "__xmax", "__ymin", "__ymax")
    )


def write_zordered(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    num_files: int = 64,
    bits: int = 16,
) -> None:
    """Write df as parquet clustered by the z-order of (x_col, y_col): range
    partition on z (sampled bounds — the global-sort shuffle, nothing more),
    sort within each partition, drop the helper column. Each output file covers
    a disjoint z-range, so parquet min/max stats on BOTH columns are tight and
    selective scans prune most files."""
    z = with_zvalue(df, x_col, y_col, out_col="__z", bits=bits)
    (
        z.repartitionByRange(num_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
