"""Distributed KMV (k-minimum-values / bottom-k) sketch as pure DataFrame
operations — fixed-size set summaries that support the one estimate HLL cannot:
SET INTERSECTION (overlap / Jaccard) between groups, without ever shuffling the
full sets against each other.

Completes the sketch family (Bar-Yossef et al. 2002; Beyer et al. 2007):
- `cms.py`   — frequency  ("how often does this key occur")
- `hll.py`   — cardinality ("how many distinct keys")
- `kmv.py`   — resemblance ("how much do two key sets overlap")

A KMV sketch of a set is its k smallest hash values. Because the same key
hashes identically everywhere, the k smallest of a UNION are computable from
the two sketches alone, and the fraction of those that lie in both sketches is
an unbiased Jaccard estimator (the classic MinHash argument, one k-sized sample
instead of k independent permutations). Cardinality falls out as
(k-1) * H / h_k (h_k = the k-th smallest hash, H = hash-space size).

Scale shape:
- Build: distinct(group, hash) then one per-group bottom-k window — a single
  shuffle on the group key; the output is ≤ k rows per group regardless of set
  cardinality, persistable as parquet and mergeable (union two sketches, keep
  the k smallest — same cell-wise discipline as cms grids / hll registers).
- Pairwise estimates run entirely on sketches: |groups|² · k rows at worst.
  Estimating the overlap of every pair of 100 TB corpora never touches the
  corpora again — the property that makes "which sources duplicate which"
  tractable as a dashboard query instead of an O(n²) dedup join.

Portability discipline: hashes are the 48-bit md5 prefix (the cms/bloom/hll
idiom), bottom-k is a plain window, and the only floating-point steps are two
exact-operand IEEE divisions — so a SQL oracle reproduces sketch, estimates,
and even the estimation ERROR bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

HASH_SPACE = float(1 << 48)


def kmv_sketch(
    df: DataFrame,
    key_col: str,
    group_cols: Sequence[str],
    k: int = 256,
) -> DataFrame:
    """Bottom-k sketch per group: the k smallest distinct 48-bit key hashes —
    DataFrame of (*group_cols, h48 bigint), ≤ k rows per group."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    h48 = F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 12), 16, 10
    ).cast("bigint")
    hashed = df.select(*group_cols, h48.alias("h48")).distinct()
    w = Window.partitionBy(*group_cols).orderBy(F.col("h48").asc())
    return (
        hashed.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def kmv_pair_estimates(
    sketch: DataFrame,
    group_col: str,
    k: int = 256,
) -> DataFrame:
    """All-pairs overlap estimates from a `kmv_sketch` output alone.

    For each group pair (a < b), combine the two sketches, keep the k smallest
    distinct hashes of the union, and within those count the hashes present in
    BOTH sketches (k_common):

    - ``jaccard_est``  = k_common / min(k, |union sketch|)
    - ``union_est``    = (k-1) * 2^48 / h_k  (exact |union| when it has < k
      hashes — the sketch IS the set then)
    - ``inter_est``    = jaccard_est * union_est

    Runs on sketch-sized data only: the heaviest step shuffles
    |groups|² · k rows. Estimates are deterministic: the two divisions have
    exactly-representable operands ((k-1)·2^48 carries 8+ trailing zero bits;
    hashes are < 2^48), so IEEE rounding is identical on every engine."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    g = group_col
    # r15: fold each group's sketch into ONE sorted array row (≤ k hashes —
    # bounded by construction), so the all-pairs combine is a broadcast
    # self-join of |groups| rows doing array math, instead of the previous
    # shape that referenced the sketch subtree three times (groups + both
    # pair sides) and windowed the pairwise union — at sf0.1 that one query
    # planned 32 Exchanges. Estimates are unchanged bit-for-bit: the k
    # smallest distinct hashes of the union are a slice of the sorted
    # array_union, k_common counts kept hashes present in BOTH sketches
    # (== the max(in_a)·max(in_b) sum), h_k is the slice's last element,
    # and the two divisions keep their exact operands.
    per_group = sketch.groupBy(g).agg(
        F.array_sort(F.collect_list("h48")).alias("hs")
    )
    a = per_group.select(F.col(g).alias("ga"), F.col("hs").alias("ha"))
    b = per_group.select(F.col(g).alias("gb"), F.col("hs").alias("hb"))
    pairs = a.join(F.broadcast(b), F.col("ga") < F.col("gb"))
    kept = F.slice(F.array_sort(F.array_union("ha", "hb")), 1, k)
    agg = pairs.select(
        "ga",
        "gb",
        F.size(
            F.array_intersect(F.array_intersect(kept, F.col("ha")), F.col("hb"))
        )
        .cast("bigint")
        .alias("k_common"),
        F.element_at(kept, F.size(kept)).alias("h_k"),
        F.size(kept).cast("bigint").alias("n_kept"),
    )
    union_est = F.when(
        F.col("n_kept") < k, F.col("n_kept").cast("double")
    ).otherwise(F.lit(float(k - 1) * HASH_SPACE) / F.col("h_k"))
    jaccard_est = F.col("k_common").cast("double") / F.col("n_kept")
    return agg.select(
        "ga",
        "gb",
        "k_common",
        F.round(jaccard_est, 4).alias("jaccard_est"),
        F.round(union_est, 2).alias("union_est"),
        F.round(jaccard_est * union_est, 2).alias("inter_est"),
    )
