"""Gold-layer star mart — the medallion stage the reference DESCRIBES but never
builds (its README sketches Bronze/Silver/Gold; the pipeline stops at three
Silver tables — /root/reference/README.md:10-15, SURVEY.md §0).

This module completes the story: `movie_silver` (fact, one row per movie with a
`Genres_Id` array) × `genres_silver` (dimension) → one aggregated mart row per
genre. The plan is the canonical star rollup:

- explode the genre-id array (one fact row per (movie, genre) membership),
- broadcast the genre dimension (genre dims are tiny — tens of rows — so the
  join is shuffle-free on the fact side at any fact scale),
- one hash aggregate on (genre_id, genre_name) with map-side partial
  aggregation.

At 100 TB the only shuffle is the final aggregate on ~|genres| keys; the
explode and broadcast-hash-join pipeline inside one stage over the fact scan.

Semantics notes (documented, pinned by tests):
- Movies with an empty/NULL `Genres_Id` array don't appear (the mart covers
  genre memberships; `explode` drops them by design).
- Genre ids absent from the dimension are dropped by the inner join (the dim
  is the mart's foreign-key contract).
- `avg_runtime` averages non-NULL runtimes (SQL AVG semantics); the int sum
  is exact, so the quotient is bit-stable across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Additive per-genre state for incremental maintenance. Money is kept in
# INTEGER CENTS (bigint) so applying signed deltas is EXACT — float sums would
# drift from a from-scratch rebuild by accumulation order, turning "IVM equals
# recompute" into an approximation. Runtime keeps (sum, non-null count) so the
# finalized avg reproduces SQL AVG's null semantics.
STATE_COLS = (
    "n_movies",
    "revenue_cents",
    "budget_cents",
    "runtime_sum",
    "runtime_n",
)


def _cents(col):
    return F.round(F.col(col) * 100).cast("bigint")


def build_genre_revenue_state(
    movie_silver: DataFrame,
    genres_silver: DataFrame,
    genre_array_col: str = "Genres_Id",
) -> DataFrame:
    """Additive per-genre state (STATE_COLS) — the maintainable form of the
    mart. Same explode + broadcast-dim plan as the mart, but sums are kept in
    integer cents / integer runtime so signed CDC deltas apply exactly."""
    exploded = movie_silver.select(
        _cents("Revenue").alias("__rev_c"),
        _cents("Budget").alias("__bud_c"),
        F.col("RunTime"),
        F.explode(genre_array_col).alias("genre_id"),
    )
    dim = F.broadcast(
        genres_silver.select(
            F.col("Id").alias("genre_id"), F.col("name").alias("genre_name")
        )
    )
    return (
        exploded.join(dim, "genre_id")
        .groupBy("genre_id", "genre_name")
        .agg(
            F.count(F.lit(1)).alias("n_movies"),
            F.sum("__rev_c").alias("revenue_cents"),
            F.sum("__bud_c").alias("budget_cents"),
            F.sum(F.col("RunTime").cast("bigint")).alias("runtime_sum"),
            F.count("RunTime").alias("runtime_n"),
        )
    )


def finalize_genre_revenue(state: DataFrame) -> DataFrame:
    """State → the published mart schema (same columns as
    build_genre_revenue_mart): cents back to 2-decimal money, avg over
    non-NULL runtimes, genres with no remaining movies dropped."""
    return (
        state.filter(F.col("n_movies") > 0)
        .select(
            "genre_id",
            "genre_name",
            "n_movies",
            F.round(F.col("revenue_cents") / 100.0, 2).alias("total_revenue"),
            F.round(F.col("budget_cents") / 100.0, 2).alias("total_budget"),
            F.round(
                F.col("runtime_sum").cast("double") / F.col("runtime_n"), 4
            ).alias("avg_runtime"),
        )
        .orderBy("genre_id")
    )


def apply_genre_revenue_delta(
    state: DataFrame, changes: DataFrame, genres_silver: DataFrame
) -> DataFrame:
    """Incremental view maintenance: fold a CDC change feed
    (operators.cdc.snapshot_diff output over movie rows, compare_cols =
    [Revenue, Budget, RunTime, Genres_Id]) into the additive state WITHOUT
    touching unchanged movies. Deleted and updated rows retract their OLD
    contribution (sign -1 over the old genre array); inserted and updated rows
    add their NEW contribution (sign +1). Because the state is integral, the
    maintained state equals a from-scratch rebuild BIT-FOR-BIT — the IVM
    contract float sums cannot give. At 100 TB the change feed is
    days-of-churn-sized, so this plan touches |changes| rows + |genres| state
    rows instead of the full fact history."""
    changed = changes.filter(F.col("change_type") != "unchanged")
    old_side = changed.filter(
        F.col("change_type").isin("deleted", "updated")
    ).select(
        F.lit(-1).alias("__sign"),
        F.round(F.col("old_Revenue") * 100).cast("bigint").alias("__rev_c"),
        F.round(F.col("old_Budget") * 100).cast("bigint").alias("__bud_c"),
        F.col("old_RunTime").alias("RunTime"),
        F.explode("old_Genres_Id").alias("genre_id"),
    )
    new_side = changed.filter(
        F.col("change_type").isin("inserted", "updated")
    ).select(
        F.lit(1).alias("__sign"),
        F.round(F.col("new_Revenue") * 100).cast("bigint").alias("__rev_c"),
        F.round(F.col("new_Budget") * 100).cast("bigint").alias("__bud_c"),
        F.col("new_RunTime").alias("RunTime"),
        F.explode("new_Genres_Id").alias("genre_id"),
    )
    dim = F.broadcast(
        genres_silver.select(
            F.col("Id").alias("genre_id"), F.col("name").alias("genre_name")
        )
    )
    delta = (
        old_side.unionByName(new_side)
        .join(dim, "genre_id")
        .groupBy("genre_id", "genre_name")
        .agg(
            F.sum("__sign").alias("d_n"),
            F.sum(F.col("__sign") * F.col("__rev_c")).alias("d_rev"),
            F.sum(F.col("__sign") * F.col("__bud_c")).alias("d_bud"),
            F.sum(
                F.col("__sign") * F.coalesce(F.col("RunTime").cast("bigint"), F.lit(0))
            ).alias("d_rt"),
            F.sum(
                F.when(F.col("RunTime").isNotNull(), F.col("__sign")).otherwise(0)
            ).alias("d_rtn"),
        )
    )
    # r15: state + delta merge as UNION → one hash re-aggregate instead of a
    # full-outer join — integer sums are associative, so summing the two
    # contribution rows per genre equals the coalesce-add over the joined
    # row bit-for-bit (either side may be absent → one-row sum), and the
    # plan drops the join's two sort+exchange legs (full outer cannot
    # broadcast) for one |genres|-keyed exchange.
    s = state.select("genre_id", "genre_name", *STATE_COLS)
    d = delta.select(
        "genre_id",
        "genre_name",
        F.col("d_n").alias("n_movies"),
        F.col("d_rev").alias("revenue_cents"),
        F.col("d_bud").alias("budget_cents"),
        F.col("d_rt").alias("runtime_sum"),
        F.col("d_rtn").alias("runtime_n"),
    )
    return (
        s.unionByName(d)
        .groupBy("genre_id", "genre_name")
        # NULL edge (r15 ADVICE): when a column is NULL on the ONLY
        # contributing side (delta-only key with an all-NULL measure, or a
        # state row whose runtime_sum is NULL from all-NULL runtimes),
        # SUM over the union would publish NULL where the old
        # full_outer+coalesce merge published 0 — coalesce the aggregate
        # back to 0 so the union form keeps the join form's semantics on
        # every input, not just the fixtures.
        .agg(*[F.coalesce(F.sum(c), F.lit(0).cast("bigint")).alias(c) for c in STATE_COLS])
    )


def build_genre_revenue_mart(
    movie_silver: DataFrame,
    genres_silver: DataFrame,
    genre_array_col: str = "Genres_Id",
) -> DataFrame:
    """(genre_id, genre_name, n_movies, total_revenue, total_budget,
    avg_runtime) — one row per genre, ordered by genre_id."""
    exploded = movie_silver.select(
        F.col("Revenue"),
        F.col("Budget"),
        F.col("RunTime"),
        F.explode(genre_array_col).alias("genre_id"),
    )
    dim = F.broadcast(
        genres_silver.select(
            F.col("Id").alias("genre_id"), F.col("name").alias("genre_name")
        )
    )
    return (
        exploded.join(dim, "genre_id")
        .groupBy("genre_id", "genre_name")
        .agg(
            F.count(F.lit(1)).alias("n_movies"),
            F.round(F.sum("Revenue"), 2).alias("total_revenue"),
            F.round(F.sum("Budget"), 2).alias("total_budget"),
            F.round(F.avg("RunTime"), 4).alias("avg_runtime"),
        )
        .orderBy("genre_id")
    )


# ---------------------------------------------------------------------------
# Second star mart (r8): language revenue — the OTHER foreign key the
# reference's star sketch names (README.md:10-15 draws movie→language next to
# movie→genre; SURVEY.md §2.9 notes `Language_Id` exists only to enable this
# join). Unlike genres, the FK is SCALAR (one language per movie), so the
# rollup has no explode — a plain broadcast-dim hash join + one aggregate on
# ~|languages| keys: the cheapest possible star shape at any fact scale.
#
# The reference's language dimension is DEGENERATE (§8.3 quirk 3: every
# language row gets Id=1, and movies carry Language_Id=1, so the join fans
# every movie out to every language). Both modes are first-class here:
# `build_language_revenue_mart` takes whatever dim it is given — a fixed dim
# (unique ids) produces the real mart; the parity dim reproduces the
# reference's fanout, made visible as identical per-language totals. The
# medallion gold stage materializes the parity form (its silver tables ARE
# the reference's), and the suite oracles both.
# ---------------------------------------------------------------------------


def build_language_revenue_state(
    movie_silver: DataFrame,
    language_silver: DataFrame,
    fk_col: str = "Language_Id",
) -> DataFrame:
    """Additive per-language state (STATE_COLS) — same integral-sum contract
    as the genre state, minus the explode (scalar FK)."""
    fact = movie_silver.select(
        _cents("Revenue").alias("__rev_c"),
        _cents("Budget").alias("__bud_c"),
        F.col("RunTime"),
        F.col(fk_col).alias("language_id"),
    )
    dim = F.broadcast(
        language_silver.select(
            F.col("Id").alias("language_id"),
            F.col("OriginalLanguage").alias("language"),
        )
    )
    return (
        fact.join(dim, "language_id")
        .groupBy("language_id", "language")
        .agg(
            F.count(F.lit(1)).alias("n_movies"),
            F.sum("__rev_c").alias("revenue_cents"),
            F.sum("__bud_c").alias("budget_cents"),
            F.sum(F.col("RunTime").cast("bigint")).alias("runtime_sum"),
            F.count("RunTime").alias("runtime_n"),
        )
    )


def finalize_language_revenue(state: DataFrame) -> DataFrame:
    """State → published mart schema (cents to 2-decimal money, avg over
    non-NULL runtimes, languages with no remaining movies dropped)."""
    return (
        state.filter(F.col("n_movies") > 0)
        .select(
            "language_id",
            "language",
            "n_movies",
            F.round(F.col("revenue_cents") / 100.0, 2).alias("total_revenue"),
            F.round(F.col("budget_cents") / 100.0, 2).alias("total_budget"),
            F.round(
                F.col("runtime_sum").cast("double") / F.col("runtime_n"), 4
            ).alias("avg_runtime"),
        )
        .orderBy("language_id", "language")
    )


def apply_language_revenue_delta(
    state: DataFrame,
    changes: DataFrame,
    language_silver: DataFrame,
) -> DataFrame:
    """Fold a CDC change feed (snapshot_diff over movie rows, compare_cols =
    [Revenue, Budget, RunTime, Language_Id]) into the additive language state
    — the same retire(-old)/insert(+new) signed-delta plan as the genre IVM,
    with the scalar FK in place of the exploded array. Integral state ⇒ the
    maintained mart equals a from-scratch rebuild bit-for-bit."""
    changed = changes.filter(F.col("change_type") != "unchanged")
    old_side = changed.filter(
        F.col("change_type").isin("deleted", "updated")
    ).select(
        F.lit(-1).alias("__sign"),
        F.round(F.col("old_Revenue") * 100).cast("bigint").alias("__rev_c"),
        F.round(F.col("old_Budget") * 100).cast("bigint").alias("__bud_c"),
        F.col("old_RunTime").alias("RunTime"),
        F.col("old_Language_Id").alias("language_id"),
    )
    new_side = changed.filter(
        F.col("change_type").isin("inserted", "updated")
    ).select(
        F.lit(1).alias("__sign"),
        F.round(F.col("new_Revenue") * 100).cast("bigint").alias("__rev_c"),
        F.round(F.col("new_Budget") * 100).cast("bigint").alias("__bud_c"),
        F.col("new_RunTime").alias("RunTime"),
        F.col("new_Language_Id").alias("language_id"),
    )
    dim = F.broadcast(
        language_silver.select(
            F.col("Id").alias("language_id"),
            F.col("OriginalLanguage").alias("language"),
        )
    )
    delta = (
        old_side.unionByName(new_side)
        .join(dim, "language_id")
        .groupBy("language_id", "language")
        .agg(
            F.sum("__sign").alias("d_n"),
            F.sum(F.col("__sign") * F.col("__rev_c")).alias("d_rev"),
            F.sum(F.col("__sign") * F.col("__bud_c")).alias("d_bud"),
            F.sum(
                F.col("__sign") * F.coalesce(F.col("RunTime").cast("bigint"), F.lit(0))
            ).alias("d_rt"),
            F.sum(
                F.when(F.col("RunTime").isNotNull(), F.col("__sign")).otherwise(0)
            ).alias("d_rtn"),
        )
    )
    # r15: union + one hash re-aggregate in place of the full-outer join —
    # see apply_genre_revenue_delta (integer sums make the two forms
    # bit-identical; the join's sort+exchange legs disappear).
    s = state.select("language_id", "language", *STATE_COLS)
    d = delta.select(
        "language_id",
        "language",
        F.col("d_n").alias("n_movies"),
        F.col("d_rev").alias("revenue_cents"),
        F.col("d_bud").alias("budget_cents"),
        F.col("d_rt").alias("runtime_sum"),
        F.col("d_rtn").alias("runtime_n"),
    )
    return (
        s.unionByName(d)
        .groupBy("language_id", "language")
        # NULL edge (r15 ADVICE): when a column is NULL on the ONLY
        # contributing side (delta-only key with an all-NULL measure, or a
        # state row whose runtime_sum is NULL from all-NULL runtimes),
        # SUM over the union would publish NULL where the old
        # full_outer+coalesce merge published 0 — coalesce the aggregate
        # back to 0 so the union form keeps the join form's semantics on
        # every input, not just the fixtures.
        .agg(*[F.coalesce(F.sum(c), F.lit(0).cast("bigint")).alias(c) for c in STATE_COLS])
    )


def build_language_revenue_mart(
    movie_silver: DataFrame,
    language_silver: DataFrame,
    fk_col: str = "Language_Id",
) -> DataFrame:
    """(language_id, language, n_movies, total_revenue, total_budget,
    avg_runtime) — one row per dimension row. With a FIXED dim (unique ids)
    this is the real per-language mart; with the reference's degenerate dim
    (all Id=1) every language row aggregates every movie — §8.3 parity,
    reproduced rather than silently corrected."""
    fact = movie_silver.select(
        "Revenue", "Budget", "RunTime", F.col(fk_col).alias("language_id")
    )
    dim = F.broadcast(
        language_silver.select(
            F.col("Id").alias("language_id"),
            F.col("OriginalLanguage").alias("language"),
        )
    )
    return (
        fact.join(dim, "language_id")
        .groupBy("language_id", "language")
        .agg(
            F.count(F.lit(1)).alias("n_movies"),
            F.round(F.sum("Revenue"), 2).alias("total_revenue"),
            F.round(F.sum("Budget"), 2).alias("total_budget"),
            F.round(F.avg("RunTime"), 4).alias("avg_runtime"),
        )
        .orderBy("language_id", "language")
    )
