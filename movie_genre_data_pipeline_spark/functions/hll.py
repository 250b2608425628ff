"""Distributed HyperLogLog as pure DataFrame operations — fixed-size distinct
counting per group at corpus scale.

Why this exists (completes the sketch family next to `cms.py` / `bloom.py`):
an exact COUNT(DISTINCT key) over a 100 TB corpus shuffles one row per distinct
key per group — disqualifying for billions of users/URLs/n-grams. HyperLogLog
(Flajolet et al. 2007) aggregates any key cardinality into m = 2^p registers of
~6 bits each with a ~1.04/sqrt(m) relative error:

- Build: one scan computes (bucket, rho) per row — bucket from the top p bits of
  a 48-bit md5 prefix, rho = leading-zero run length of the remaining bits + 1 —
  then one partial-aggregated `max` groupBy keyed by (group, bucket). Map-side
  combine collapses each task's contribution to at most m rows per group before
  the shuffle, so shuffle volume is O(groups * m), INDEPENDENT of key
  cardinality. The register table is mergeable by unioning and re-maxing —
  across partitions, days, and datasets — which Spark's own
  `approx_count_distinct` (an opaque per-query HLL++ aggregate) does not expose
  as data.
- Estimate: harmonic mean of the registers (the 2^-rho sum is carried as the
  EXACT integer sum of 2^(rho_max - rho), so the only floating-point step is one
  final division), with the standard linear-counting correction for the small
  range (E <= 2.5m and empty registers present).

Portability discipline: the hash is the 48-bit prefix of md5(key) — the same
idiom as cms._cell / bloom._position — so a SQL oracle rebuilds the IDENTICAL
register table and reproduces the estimate bit-for-bit, including the sketch's
documented error vs. the exact count.

Reference parity note: the reference has no sketches (its only aggregate is
COUNT — see SURVEY.md §2.5); this is north-star extension surface, cited as
such in SURVEY.md §2.10.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HASH_BITS = 48  # md5 12-hex-char prefix; conv() is exact well past 48 bits


def hll_alpha(m: int) -> float:
    """Bias-correction constant for m >= 128 registers (Flajolet et al. §4)."""
    return 0.7213 / (1.0 + 1.079 / m)


def hll_registers(
    df: DataFrame,
    key_col: str,
    group_cols: Sequence[str] = (),
    p: int = 8,
) -> DataFrame:
    """Aggregate keys into an HLL register table: one row per (group, bucket)
    with the max rank rho — at most 2^p rows per group, any key cardinality.

    Empty buckets are NOT materialized (rho is implicitly 0); `hll_estimate`
    accounts for them from the bucket count. Merge register tables from
    different partitions/datasets by union + groupBy(max) — same cell-wise
    discipline as `cms.build_cms` grids.
    """
    if not 4 <= p <= 16:
        raise ValueError(f"p must be in [4, 16], got {p}")
    rest_bits = HASH_BITS - p
    h48 = F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 12), 16, 10
    ).cast("bigint")
    bucket = F.shiftright(h48, rest_bits)
    rest = h48.bitwiseAND(F.lit((1 << rest_bits) - 1))
    # rho = (#leading zeros in the rest_bits-wide field) + 1
    #     = rest_bits + 1 - bitlength(rest);  rest == 0 -> rest_bits + 1.
    # bitlength via base-2 string conv keeps it integer-exact and portable
    # (the oracle uses format('{:b}', rest) — same digit count).
    bitlen = F.length(F.conv(rest.cast("string"), 10, 2))
    rho = (
        F.when(rest == 0, F.lit(rest_bits + 1))
        .otherwise(F.lit(rest_bits + 1) - bitlen)
        .cast("int")
    )
    return (
        df.select(*group_cols, bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate(
    registers: DataFrame,
    group_cols: Sequence[str] = (),
    p: int = 8,
) -> DataFrame:
    """Collapse a register table into one row per group:

    - ``n_zero``     (bigint) — empty registers (m minus materialized buckets),
    - ``register_sum`` (bigint) — EXACT integer sum over all m buckets of
      2^(rest_bits + 1 - rho) (empty buckets contribute 2^(rest_bits+1)); this
      is the harmonic-mean denominator scaled by 2^(rest_bits+1), kept integral
      so engines can't disagree on accumulation order,
    - ``hll_est``    (double) — alpha_m * m^2 * 2^(rest_bits+1) / register_sum,
      replaced by linear counting m*ln(m/V) when E <= 2.5m and V > 0, rounded
      to 2 decimals.

    The shuffle is the groupBy over (group, bucket) rows — O(groups * m).
    """
    if not 4 <= p <= 16:
        raise ValueError(f"p must be in [4, 16], got {p}")
    m = 1 << p
    rest_bits = HASH_BITS - p
    scale = rest_bits + 1  # rho ranges over [1, scale]; empty bucket rho = 0
    # 2^(scale - rho) is exact in double for scale <= 45, and the per-group sum
    # m * 2^scale stays far inside bigint.
    term = F.pow(F.lit(2.0), F.lit(scale) - F.col("rho")).cast("bigint")
    per_group = registers.groupBy(*group_cols).agg(
        F.sum(term).alias("_filled_sum"),
        F.count(F.lit(1)).alias("_n_buckets"),
    )
    n_zero = (F.lit(m) - F.col("_n_buckets")).cast("bigint")
    register_sum = (
        F.col("_filled_sum") + n_zero * F.lit(1 << scale).cast("bigint")
    ).cast("bigint")
    alpha_num = hll_alpha(m) * m * m * float(1 << scale)
    raw = F.lit(alpha_num) / F.col("register_sum")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (F.col("n_zero") > 0),
        F.round(F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("n_zero")), 2),
    ).otherwise(F.round(raw, 2))
    return (
        per_group.select(
            *group_cols,
            n_zero.alias("n_zero"),
            register_sum.alias("register_sum"),
        )
        .withColumn("hll_est", est)
    )
