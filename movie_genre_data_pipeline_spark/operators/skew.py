"""Skew mitigation: salted two-stage aggregation.

AQE's skew-join splitting handles skewed JOINS automatically (session.py), but a
skewed AGGREGATION key (a handful of giant groups — e.g. 3 return-flag values
over a 100 TB lineitem) still funnels each hot group through one reducer in a
single-stage plan. Salting splits every group across `n_salts` reducers in
stage 1 (partial merge on (key, salt)), then merges the partials in stage 2 —
the second shuffle carries only n_groups × n_salts rows, which is ~free.

Only decomposable aggregates (sum/count/min/max, and avg = sum/count) can be
salted this way; the helper exposes exactly those. Results are salt-invariant by
algebra, so the salt can be anything uniform — we use a seeded `rand` (cheap, no
extra column dependencies).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage skew-resistant aggregate of `value_col` per `keys`:
    (n_rows, total, minimum, maximum, mean) — identical to the single-stage
    groupBy by algebra, but hot groups fan out over `n_salts` stage-1 reducers.
    """
    salted = df.withColumn(
        "__salt", F.floor(F.rand(seed=42) * n_salts).cast("int")
    )
    partial = salted.groupBy(*keys, "__salt").agg(
        F.count(F.lit(1)).alias("__n"),
        F.count(value_col).alias("__nv"),  # non-null count: avg() ignores NULLs
        F.sum(value_col).alias("__sum"),
        F.min(value_col).alias("__min"),
        F.max(value_col).alias("__max"),
    )
    return partial.groupBy(*keys).agg(
        F.sum("__n").alias("n_rows"),
        F.sum("__sum").alias("total"),
        F.min("__min").alias("minimum"),
        F.max("__max").alias("maximum"),
        # sum/non-null-count == single-stage avg() even with NULLs in value_col
        (F.sum("__sum") / F.sum("__nv")).alias("mean"),
    )


def detect_hot_keys(df: DataFrame, key_col: str, min_count: int) -> list:
    """Key values occurring >= min_count times — the whale list `salted_join`'s
    `hot_keys` mode wants.

    One count aggregation (map-side combine: the shuffle carries one row per
    task × distinct-key-in-task, which is exactly cheap in the skewed case
    this exists for), then a driver-side collect that is SAFE BY ARITHMETIC:
    at most n_rows / min_count keys can clear the threshold, so a meaningful
    threshold (say 10M rows at 100 TB) bounds the list at thousands of values
    regardless of key cardinality. For repeated use, persist the result next
    to the table instead of re-detecting per query."""
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    rows = (
        df.groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") >= min_count)
        .select(key_col)
        .collect()
    )
    return [r[0] for r in rows]


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 16,
    hot_keys: list | None = None,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: fan the big side's rows over `n_salts`
    sub-partitions per key and replicate the small side's rows once per salt,
    joining on (key, salt) — so a hot key's rows spread across n_salts reducers
    instead of funneling through one.

    When to reach for this instead of AQE: AQE's runtime skew-join splitting
    (enabled in session.py) already fixes most skewed sort-merge joins, but it
    can't help (a) streaming joins (AQE is disabled in stateful workloads),
    (b) the first shuffle of a freshly-read stage where no runtime stats exist
    yet, or (c) engines/pipelines that must pin a deterministic physical plan.
    Salting is the static-plan answer; results are salt-invariant by algebra.

    `hot_keys` (optional): salt ONLY these key values (the usual case — a
    handful of whales identified by a prior count or a sketch like
    functions/cms.py heavy-hitters); other keys keep salt 0 and the small side
    is NOT replicated for them, so the replication cost is
    |small ∩ hot| × n_salts rows, not |small| × n_salts. With hot_keys=None
    every key is salted (fine when the small side is dimension-sized).

    Only inner and left joins are supported: replicating the small side would
    duplicate its unmatched rows under right/full semantics."""
    if n_salts < 1:
        raise ValueError(f"n_salts must be >= 1, got {n_salts}")
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports inner/left, got {how!r} — a replicated "
            "right side would duplicate unmatched rows under right/full joins"
        )
    hot_big = F.lit(True) if hot_keys is None else F.col(on).isin(hot_keys)
    # Salt derives deterministically from FULL row content (hash of every
    # column, pmod n_salts) rather than F.rand: rows of one hot key still
    # spread across salts (their non-key columns differ), but the plan and
    # every intermediate dataset are now reproducible run-to-run and
    # layout-to-layout — the "pinned deterministic physical plan" this
    # operator exists for (non-deterministic exprs also inhibit some
    # optimizer rewrites). Identical full-row duplicates share a salt, which
    # only matters if one hot key's rows are ALSO byte-identical copies.
    big_salted = big.withColumn(
        "__salt",
        F.when(
            hot_big,
            F.pmod(F.hash(*[F.col(c) for c in big.columns]), F.lit(n_salts)).cast(
                "int"
            ),
        ).otherwise(F.lit(0)),
    )
    small_salted = small.withColumn(
        "__salt",
        F.explode(
            F.when(
                F.lit(True) if hot_keys is None else F.col(on).isin(hot_keys),
                F.sequence(F.lit(0), F.lit(n_salts - 1)),
            ).otherwise(F.array(F.lit(0)))
        ),
    )
    return big_salted.join(small_salted, [on, "__salt"], how).drop("__salt")


def skew_report(df: DataFrame, key_col: str, top_k: int = 10) -> DataFrame:
    """(rank, <key>, n_rows, share, skew_factor): the top-k heaviest join-key
    values with their row share, plus the key distribution's skew factor
    (max key count / mean key count) repeated on every row — the
    observability report that DECIDES whether a join needs `salted_join` and
    feeds `detect_hot_keys`' threshold. One count aggregate (map-side
    combined) + a top-k; the summary is a broadcast of one row."""
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("n_rows"))
    stats = counts.agg(
        F.sum("n_rows").alias("__total"),
        F.max("n_rows").alias("__max"),
        F.avg("n_rows").alias("__mean"),
    )
    from pyspark.sql import Window

    # top-k via orderBy+limit -> TakeOrderedAndProject, then rank the <= k
    # survivors — never a row_number window over ALL distinct keys (a 100 TB
    # fact's key count is itself fact-sized; same fix as bm25_from_counts).
    # The k-row rank window's partition key is nullif(n_rows,-1)*0: constant
    # in value but non-foldable (n_rows is a non-null count, so a bare
    # n_rows*0 — let alone F.lit(0) — would constant-fold back into an
    # unpartitioned WindowExec).
    order = [F.col("n_rows").desc(), F.col(key_col).asc()]
    w = Window.partitionBy(
        F.nullif(F.col("n_rows"), F.lit(-1)) * F.lit(0)
    ).orderBy(*order)
    top = (
        counts.orderBy(*order)
        .limit(top_k)
        .withColumn("rank", F.row_number().over(w))
    )
    return (
        top.crossJoin(F.broadcast(stats))
        .select(
            "rank",
            key_col,
            "n_rows",
            F.round(F.col("n_rows") / F.col("__total"), 6).alias("share"),
            F.round(F.col("__max") / F.col("__mean"), 4).alias("skew_factor"),
        )
        .orderBy("rank")
    )
