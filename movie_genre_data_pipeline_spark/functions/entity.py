"""Entity resolution: multi-pass blocking, fuzzy pair scoring, best-match pick.

The reference pipeline ingests a movie catalog whose genre labels arrive dirty
(empty strings repaired by ``fix_genres``, reference: Movie_notebook/
Silver_update.py); the general form of that problem at corpus scale is entity
resolution — re-linking records whose join keys are mangled (typos, truncation,
re-keying) to a canonical catalog. Naive ER is an O(n·m) cross join of string
comparisons; the standard scale discipline is the same one the dedup family
already uses for near-dup detection (functions/dedup.py MinHash bands): compare
only within BLOCKS.

Shape at 100 TB:

- ``blocked_candidate_pairs`` generates (left_id, right_id) candidates as a
  UNION of equi-joins, one per blocking pass. Each pass is a plain shuffle
  join on its blocking key — no cross join anywhere — and the union is
  DISTINCT-reduced on the id pair only (two narrow columns) before any
  expensive scoring runs. Multi-pass blocking (e.g. first-token AND last-token
  keys) is the standard recall hedge: a single key misses records whose
  perturbation hit that key; the union catches any record at least one pass
  agrees on. Candidate volume is sum over blocks of |L_b|·|R_b| — bounded by
  blocking-key selectivity, which the caller chooses; the skew report
  (operators/skew.py) is the tool for checking a proposed key's heavy blocks
  before running the join.
- ``score_pairs`` computes similarity entirely JVM-side: ``F.levenshtein``
  (codegen'd dynamic-program, no Python) plus a length-normalized ratio.
- ``best_match`` is one window (partition by left id) — the same
  row_number-over-key shape as dedup keep-best.

All arithmetic is integral (levenshtein) or a single rounded division, so a SQL
oracle replays it bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def blocked_candidate_pairs(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    passes: list[tuple[str, str]],
    max_pair_volume: int | None = None,
) -> DataFrame:
    """Candidate (left_id, right_id) pairs: union of one equi-join per blocking
    pass, DISTINCT on the id pair.

    ``passes`` is a list of (left_key_col, right_key_col). Rows with a NULL or
    empty blocking key are skipped for that pass (they would otherwise form a
    giant degenerate block).

    ``max_pair_volume`` enables BLOCK PURGING — the ER-literature defense
    against stop-word-like keys: any block whose candidate volume
    |L_b| · |R_b| exceeds the cap is dropped from that pass entirely (an
    over-populated block is both the scale hazard and the least informative —
    membership in it says almost nothing). This is the same discipline as the
    `max_df` stop-fingerprint cap in winnowing dedup (functions/dedup.py).
    The purge is applied as an ANTI-join on the VIOLATING keys (r10): the
    violator set is bounded by total_volume/cap — a handful of stop-word
    keys at any scale — where the ALLOWED set this replaces grows with key
    cardinality (a unique-per-entity pass has n allowed keys; force-
    broadcasting that was the r9 scale-bench straggler's cost). No broadcast
    hint: AQE broadcasts the violator side when runtime stats confirm it is
    small.
    """
    if not passes:
        raise ValueError("at least one blocking pass is required")
    out: DataFrame | None = None
    for lk, rk in passes:
        l_side = left.filter(F.col(lk).isNotNull() & (F.col(lk) != "")).select(
            F.col(left_id), F.col(lk).alias("__bk")
        )
        r_side = right.filter(F.col(rk).isNotNull() & (F.col(rk) != "")).select(
            F.col(right_id), F.col(rk).alias("__bk")
        )
        if max_pair_volume is not None:
            lc = l_side.groupBy("__bk").agg(F.count("*").alias("__lc"))
            rc = r_side.groupBy("__bk").agg(F.count("*").alias("__rc"))
            blocked = (
                lc.join(rc, "__bk")
                .filter(F.col("__lc") * F.col("__rc") > max_pair_volume)
                .select("__bk")
            )
            # left-only / right-only keys never produce pairs in the inner
            # join below, so anti-joining only the violators is equivalent
            # to the allow-list — without materializing a key-cardinality-
            # sized allowed set
            l_side = l_side.join(blocked, "__bk", "left_anti")
        pairs = l_side.join(r_side, "__bk").select(left_id, right_id)
        out = pairs if out is None else out.unionByName(pairs)
    return out.distinct()


def score_pairs(
    pairs: DataFrame,
    left_text: str,
    right_text: str,
    lev_col: str = "lev",
    sim_col: str = "sim",
) -> DataFrame:
    """Attach edit distance and a length-normalized similarity in [0, 1].

    sim = round(1 - lev / greatest(len(l), len(r)), 6) — 1.0 for identical
    strings, 0.0 for completely disjoint ones. Pure JVM expressions.
    """
    lev = F.levenshtein(F.col(left_text), F.col(right_text))
    longest = F.greatest(F.length(left_text), F.length(right_text))
    return pairs.withColumn(lev_col, lev).withColumn(
        sim_col,
        F.round(F.lit(1.0) - F.col(lev_col) / longest.cast("double"), 6),
    )


def best_match(scored: DataFrame, group_col: str, order_cols: list) -> DataFrame:
    """Keep the single best-scored candidate per left record.

    ``order_cols`` must establish a TOTAL order within each group (tiebreak on
    a unique key last) or the pick is nondeterministic — same contract as
    dedup keep-best (functions/dedup.py).
    """
    w = Window.partitionBy(group_col).orderBy(*order_cols)
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def sorted_neighborhood_pairs(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    left_key: str,
    right_key: str,
    window: int,
) -> DataFrame:
    """Sorted-neighborhood candidate generation (Hernández/Stolfo): merge both
    datasets into one stream ordered by the sort key, and pair cross-dataset
    records whose positions differ by < ``window``.

    The complement to token blocking: it needs no shared token at all — only
    that the mangled string still SORTS near its original — so it catches
    suffix-level noise that destroys every token key. (Its blind spot is the
    mirror image: a leading-character edit teleports the record in sort order.
    The two generators are unioned in practice, like blocking passes.)

    Plan shape: the rank assignment is operators/ranking.ranged_row_number —
    a range-partitioned sort with partition-local row numbers plus broadcast
    cumulative offsets, bit-identical to the global-window form (the sort key
    (__sk, __side, __id) is a total order) but with no single-task stage
    (VERDICT r9 #4; the unpartitioned row_number this replaces was the plan's
    100x bottleneck). The neighborhood join is NOT a band join: each left row
    explodes to its 3 adjacent rank buckets (bucket width = window, so
    |Δrn| < window implies bucket ids differ by ≤ 1) and equi-joins the right
    side's bucket id — 3 narrow rows per record, never a nested loop;
    candidate volume is ≤ 2·window per record.
    """
    if window < 1:
        raise ValueError("window must be >= 1")
    l_rows = left.select(
        F.col(left_id).alias("__id"), F.col(left_key).alias("__sk"),
        F.lit(0).alias("__side"),
    )
    r_rows = right.select(
        F.col(right_id).alias("__id"), F.col(right_key).alias("__sk"),
        F.lit(1).alias("__side"),
    )
    from movie_genre_data_pipeline_spark.operators.ranking import (
        ranged_row_number,
    )

    ranked = ranged_row_number(
        l_rows.unionByName(r_rows), ["__sk", "__side", "__id"], "__rn"
    ).withColumn(
        "__g", F.floor((F.col("__rn") - 1) / F.lit(window)).cast("bigint")
    )
    lhs = ranked.filter(F.col("__side") == 0).select(
        F.col("__id").alias(left_id),
        F.col("__rn").alias("__lrn"),
        F.explode(
            F.array(F.col("__g") - 1, F.col("__g"), F.col("__g") + 1)
        ).alias("__g"),
    )
    rhs = ranked.filter(F.col("__side") == 1).select(
        F.col("__id").alias(right_id),
        F.col("__rn").alias("__rrn"),
        "__g",
    )
    return (
        lhs.join(rhs, "__g")
        .filter(F.abs(F.col("__lrn") - F.col("__rrn")) < window)
        .select(left_id, right_id)
    )
