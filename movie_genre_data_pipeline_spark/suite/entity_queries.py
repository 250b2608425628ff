"""Entity-resolution queries (functions/entity.py): multi-pass blocked matching
of mangled records back to a canonical catalog, plus the oracled accuracy law.

The fixture re-keys the part catalog the way dirty feeds mangle names: even
part keys lose their final character (truncation), odd keys lose their first
(leading-junk strip). Each listing must be re-linked to the catalog by string
similarity alone. Blocking is two-pass — first token AND last token — because
either perturbation can destroy one key but never both: truncation mangles the
last token (its block key survives only via the first token), a leading strip
mangles the first. The union of the two equi-joins restores candidate recall
without any cross join.

Determinism: levenshtein is integral, the similarity ratio is one rounded
division, ties break on (lev, cat_name, cat_key) — a total order — so the
DuckDB oracle reproduces every match and the recall figure exactly.

Scale shape: candidate volume is Σ_blocks |L_b|·|R_b|. In this synthetic
fixture the token vocabulary is FIXED, so unpurged blocks grow linearly with
the catalog and candidates quadratically. Since r8 every production-facing
configuration here carries the cap: er_union_recall runs its token passes
under ``max_pair_volume`` block purging (a block that outgrows the cap is
dropped and coverage falls back to the other pass + the Θ(n·window)
sorted-neighborhood generator, with the coverage loss published as
oracle-checked ``n_candidates``/``recall`` columns), and er_purged_recall
shows the full discipline — high-cardinality composite keys checked with
ops_skew_report plus the same purge for the keys that are degenerate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movie_genre_data_pipeline_spark.functions.entity import (
    best_match,
    blocked_candidate_pairs,
    score_pairs,
)
from movie_genre_data_pipeline_spark.suite import QuerySpec, load

_FIRST_TOKEN = r"^\S+"
_LAST_TOKEN = r"\S+$"

_PERTURB_SQL = """CASE WHEN p_partkey % 2 = 0
       THEN substr(p_name, 1, length(p_name) - 1)
       ELSE substr(p_name, 2) END"""

_BEST_CTE = f"""listings AS (
  SELECT p_partkey AS listing_id, p_name AS true_name,
         {_PERTURB_SQL} AS listing_text
  FROM part
), lk AS (
  SELECT listing_id, listing_text, true_name,
         regexp_extract(listing_text, '{_FIRST_TOKEN}') AS b1,
         regexp_extract(listing_text, '{_LAST_TOKEN}') AS b2
  FROM listings
), ck AS (
  SELECT p_partkey AS cat_key, p_name AS cat_name,
         regexp_extract(p_name, '{_FIRST_TOKEN}') AS b1,
         regexp_extract(p_name, '{_LAST_TOKEN}') AS b2
  FROM part
), cand AS (
  SELECT DISTINCT listing_id, cat_key FROM (
    SELECT l.listing_id, c.cat_key FROM lk l JOIN ck c ON l.b1 = c.b1
      WHERE l.b1 <> ''
    UNION ALL
    SELECT l.listing_id, c.cat_key FROM lk l JOIN ck c ON l.b2 = c.b2
      WHERE l.b2 <> ''
  )
), scored AS (
  SELECT cd.listing_id, l.listing_text, l.true_name, cd.cat_key, c.cat_name,
         CAST(levenshtein(l.listing_text, c.cat_name) AS BIGINT) AS lev,
         ROUND(1.0 - levenshtein(l.listing_text, c.cat_name)
               / CAST(GREATEST(length(l.listing_text), length(c.cat_name)) AS DOUBLE),
               6) AS sim
  FROM cand cd
  JOIN lk l USING (listing_id)
  JOIN ck c USING (cat_key)
), best AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY listing_id
                               ORDER BY lev ASC, cat_name ASC, cat_key ASC) AS rn
  FROM scored
)"""


def _best_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    listings = part.select(
        F.col("p_partkey").alias("listing_id"),
        F.col("p_name").alias("true_name"),
        F.expr(_PERTURB_SQL).alias("listing_text"),
    ).select(
        "*",
        F.regexp_extract("listing_text", _FIRST_TOKEN, 0).alias("lb1"),
        F.regexp_extract("listing_text", _LAST_TOKEN, 0).alias("lb2"),
    )
    catalog = part.select(
        F.col("p_partkey").alias("cat_key"),
        F.col("p_name").alias("cat_name"),
    ).select(
        "*",
        F.regexp_extract("cat_name", _FIRST_TOKEN, 0).alias("cb1"),
        F.regexp_extract("cat_name", _LAST_TOKEN, 0).alias("cb2"),
    )
    cand = blocked_candidate_pairs(
        listings, catalog, "listing_id", "cat_key", [("lb1", "cb1"), ("lb2", "cb2")]
    )
    scored = score_pairs(
        cand.join(listings.select("listing_id", "listing_text", "true_name"), "listing_id")
        .join(catalog.select("cat_key", "cat_name"), "cat_key"),
        "listing_text",
        "cat_name",
    ).withColumn("lev", F.col("lev").cast("bigint"))
    return best_match(
        scored, "listing_id", [F.col("lev").asc(), F.col("cat_name").asc(), F.col("cat_key").asc()]
    )


def q_er_blocked_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One resolved row per listing: the catalog entity it re-links to."""
    return _best_matches(spark, sf_dir).select(
        "listing_id",
        "listing_text",
        F.col("cat_key").alias("matched_key"),
        F.col("cat_name").alias("matched_name"),
        "lev",
        "sim",
    )


Q_ER_BLOCKED_MATCHES_ORACLE = f"""
WITH {_BEST_CTE}
SELECT listing_id, listing_text, cat_key AS matched_key, cat_name AS matched_name,
       lev, sim
FROM best WHERE rn = 1
"""


def q_er_match_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The accuracy law: fraction of listings whose best match recovers the
    original name (name-level truth — distinct parts legitimately share a
    name, so key-level identity is not the contract)."""
    best = _best_matches(spark, sf_dir)
    correct = F.sum(
        F.when(F.col("cat_name") == F.col("true_name"), 1).otherwise(0)
    ).cast("bigint")
    return best.agg(
        F.count("*").cast("bigint").alias("n_listings"),
        correct.alias("n_correct"),
        F.round(
            correct.cast("double") / F.count("*").cast("double"), 6
        ).alias("recall"),
    )


Q_ER_MATCH_RECALL_ORACLE = f"""
WITH {_BEST_CTE}
SELECT CAST(COUNT(*) AS BIGINT) AS n_listings,
       CAST(SUM(CASE WHEN cat_name = true_name THEN 1 ELSE 0 END) AS BIGINT)
         AS n_correct,
       ROUND(CAST(SUM(CASE WHEN cat_name = true_name THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS recall
FROM best WHERE rn = 1
"""


QUERIES: dict[str, QuerySpec] = {
    "er_blocked_matches": QuerySpec(q_er_blocked_matches, Q_ER_BLOCKED_MATCHES_ORACLE),
    "er_match_recall": QuerySpec(q_er_match_recall, Q_ER_MATCH_RECALL_ORACLE),
}


SN_WINDOW = 8

_SN_BEST_CTE = f"""listings AS (
  SELECT p_partkey AS listing_id, p_name AS true_name,
         {_PERTURB_SQL} AS listing_text
  FROM part
), u AS (
  SELECT listing_id AS uid, listing_text AS sk, 0 AS side FROM listings
  UNION ALL
  SELECT p_partkey, p_name, 1 FROM part
), ranked AS (
  SELECT uid, side, ROW_NUMBER() OVER (ORDER BY sk, side, uid) AS rn FROM u
), g AS (
  SELECT uid, side, rn,
         CAST(FLOOR((rn - 1) / {SN_WINDOW}) AS BIGINT) AS grp
  FROM ranked
), lex AS (
  SELECT uid AS listing_id, rn AS lrn, grp + d.d AS grp
  FROM g CROSS JOIN (VALUES (-1), (0), (1)) AS d(d)
  WHERE side = 0
), rr AS (
  SELECT uid AS cat_key, rn AS rrn, grp FROM g WHERE side = 1
), cand AS (
  SELECT lex.listing_id, rr.cat_key
  FROM lex JOIN rr ON rr.grp = lex.grp
  WHERE ABS(lex.lrn - rr.rrn) < {SN_WINDOW}
), scored AS (
  SELECT c.listing_id, l.listing_text, l.true_name, c.cat_key,
         p.p_name AS cat_name,
         CAST(levenshtein(l.listing_text, p.p_name) AS BIGINT) AS lev,
         ROUND(1.0 - levenshtein(l.listing_text, p.p_name)
               / CAST(GREATEST(length(l.listing_text), length(p.p_name)) AS DOUBLE),
               6) AS sim
  FROM cand c
  JOIN listings l USING (listing_id)
  JOIN part p ON p.p_partkey = c.cat_key
), best AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY listing_id
                               ORDER BY lev ASC, cat_name ASC, cat_key ASC) AS rn
  FROM scored
)"""


def q_er_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood candidate generation instead of token blocking:
    pair listings with catalog rows within SN_WINDOW positions of the merged
    sort order, then score and pick as before. On this fixture it finds the
    truncation class (still sorts adjacent) but not the leading-strip class
    (teleported in sort order) — recall below the multi-pass blocked matcher,
    pinned in tests/test_entity.py; real deployments union both generators."""
    from movie_genre_data_pipeline_spark.functions.entity import (
        sorted_neighborhood_pairs,
    )

    part = load(spark, sf_dir, "part")
    listings = part.select(
        F.col("p_partkey").alias("listing_id"),
        F.col("p_name").alias("true_name"),
        F.expr(_PERTURB_SQL).alias("listing_text"),
    )
    catalog = part.select(
        F.col("p_partkey").alias("cat_key"), F.col("p_name").alias("cat_name")
    )
    cand = sorted_neighborhood_pairs(
        listings,
        catalog,
        "listing_id",
        "cat_key",
        "listing_text",
        "cat_name",
        SN_WINDOW,
    )
    scored = score_pairs(
        cand.join(listings.select("listing_id", "listing_text"), "listing_id")
        .join(catalog, "cat_key"),
        "listing_text",
        "cat_name",
    ).withColumn("lev", F.col("lev").cast("bigint"))
    return best_match(
        scored,
        "listing_id",
        [F.col("lev").asc(), F.col("cat_name").asc(), F.col("cat_key").asc()],
    ).select(
        "listing_id",
        "listing_text",
        F.col("cat_key").alias("matched_key"),
        F.col("cat_name").alias("matched_name"),
        "lev",
        "sim",
    )


Q_ER_SORTED_NEIGHBORHOOD_ORACLE = f"""
WITH {_SN_BEST_CTE}
SELECT listing_id, listing_text, cat_key AS matched_key, cat_name AS matched_name,
       lev, sim
FROM best WHERE rn = 1
"""


QUERIES["er_sorted_neighborhood"] = QuerySpec(
    q_er_sorted_neighborhood, Q_ER_SORTED_NEIGHBORHOOD_ORACLE
)


ER_PURGE_CAP = 20_000

# The union configuration's cap. The part-name fixture has only EIGHT distinct
# first/last tokens, so per-block volume is (n/8)²: ~625 at sf0.001, ~62k at
# sf0.01, ~6.3M at sf0.1. 200k is chosen between the last two so BOTH purge
# states are oracle-exercised across the test SFs: at the correctness-gate SFs
# (≤0.01) no block is purged and the union-dominance recall law holds intact;
# at bench scale (0.1) every token block trips the cap and cost falls to the
# Θ(n·window) sorted-neighborhood generator — 31.7 s → ~2.5 s — with the
# coverage loss published in the n_candidates/recall columns.
ER_UNION_PURGE_CAP = 200_000


def _purged_pass_sql(key: str, cap: int = ER_PURGE_CAP) -> str:
    """One purged blocking pass: equi-join restricted to keys whose
    |L_b|·|R_b| stays under the cap (same rule as blocked_candidate_pairs).
    References CTEs named ``lk``/``ck`` that both expose ``{key}``."""
    return f"""SELECT l.listing_id, c.cat_key FROM lk l
      JOIN (SELECT l2.{key} FROM
              (SELECT {key}, count(*) AS c FROM lk WHERE {key} <> '' GROUP BY 1) l2
            JOIN (SELECT {key}, count(*) AS c FROM ck WHERE {key} <> '' GROUP BY 1) r2
              USING ({key})
            WHERE l2.c * r2.c <= {cap}) a USING ({key})
      JOIN ck c USING ({key})"""


def q_er_union_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production configuration: PURGED token blocking ∪ sorted-neighborhood
    candidates, scored and picked as one, publishing the candidate volume the
    way er_purged_recall does.

    r8 (VERDICT r7 #3): the token passes carry ``max_pair_volume`` block
    purging. This fixture's token vocabulary is FIXED (~92 words), so unpurged
    block volume grows n²/92 — at sf0.1 the unpurged union spent 31.7 s
    measuring fixture entropy, ~6× the next most expensive suite path. With the
    cap, a block that outgrows ER_PURGE_CAP is dropped from its pass and
    recall falls back to the OTHER pass + the Θ(n·window) sorted-neighborhood
    generator — the published ``n_candidates``/``recall`` columns make that
    trade oracle-visible instead of silent. At the correctness-gate SFs
    (≤0.01) no block reaches the cap, so the dominance law
    (tests/test_entity.py) is unchanged; the purge binds at bench scale where
    the quadratic term lived."""
    from movie_genre_data_pipeline_spark.functions.entity import (
        sorted_neighborhood_pairs,
    )

    part = load(spark, sf_dir, "part")
    listings = part.select(
        F.col("p_partkey").alias("listing_id"),
        F.col("p_name").alias("true_name"),
        F.expr(_PERTURB_SQL).alias("listing_text"),
    ).select(
        "*",
        F.regexp_extract("listing_text", _FIRST_TOKEN, 0).alias("lb1"),
        F.regexp_extract("listing_text", _LAST_TOKEN, 0).alias("lb2"),
    )
    catalog = part.select(
        F.col("p_partkey").alias("cat_key"), F.col("p_name").alias("cat_name")
    ).select(
        "*",
        F.regexp_extract("cat_name", _FIRST_TOKEN, 0).alias("cb1"),
        F.regexp_extract("cat_name", _LAST_TOKEN, 0).alias("cb2"),
    )
    blocked = blocked_candidate_pairs(
        listings,
        catalog,
        "listing_id",
        "cat_key",
        [("lb1", "cb1"), ("lb2", "cb2")],
        max_pair_volume=ER_UNION_PURGE_CAP,
    )
    sn = sorted_neighborhood_pairs(
        listings, catalog, "listing_id", "cat_key",
        "listing_text", "cat_name", SN_WINDOW,
    )
    # r15: the published candidate volume and the best-match pick now come
    # from ONE per-listing aggregate over the scored pairs (each cand row
    # survives the two key joins exactly once, so SUM of per-listing counts
    # IS |cand|; min(struct(lev, cat_name, cat_key)) is the same
    # lexicographic (lev ASC, cat_name ASC, cat_key ASC) first row the
    # row_number window picked). One consumer tree → the r10 double-compute
    # barrier (localCheckpoint, ~1s of synchronous planning per call) and
    # the window sort both disappear, and the pick partial-aggregates
    # map-side instead of shuffling every candidate row.
    cand = blocked.unionByName(sn).distinct()
    scored = score_pairs(
        cand.join(
            listings.select("listing_id", "listing_text", "true_name"),
            "listing_id",
        ).join(catalog.select("cat_key", "cat_name"), "cat_key"),
        "listing_text",
        "cat_name",
    ).withColumn("lev", F.col("lev").cast("bigint"))
    per_listing = scored.groupBy("listing_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("__n_cand"),
        F.min(F.struct("lev", "cat_name", "cat_key")).alias("__best"),
    )
    # TRUE recall: denominator is every input listing, not just the covered
    # ones — when the purge binds, a listing with zero surviving candidates
    # joins to NULL after the LEFT join and counts as a miss instead of
    # silently leaving the denominator.
    outcome = listings.select("listing_id", "true_name").join(
        per_listing.select(
            "listing_id", F.col("__best.cat_name").alias("cat_name"), "__n_cand"
        ),
        "listing_id",
        "left",
    )
    correct = F.sum(
        F.when(F.col("cat_name") == F.col("true_name"), 1).otherwise(0)
    ).cast("bigint")
    return outcome.agg(
        F.sum(F.coalesce(F.col("__n_cand"), F.lit(0)))
        .cast("bigint")
        .alias("n_candidates"),
        F.count("*").cast("bigint").alias("n_listings"),
        correct.alias("n_correct"),
        F.round(
            correct.cast("double") / F.count("*").cast("double"), 6
        ).alias("recall"),
    ).select("n_candidates", "n_listings", "n_correct", "recall")


Q_ER_UNION_RECALL_ORACLE = f"""
WITH listings AS (
  SELECT p_partkey AS listing_id, p_name AS true_name,
         {_PERTURB_SQL} AS listing_text
  FROM part
), lk AS (
  SELECT listing_id, listing_text, true_name,
         regexp_extract(listing_text, '{_FIRST_TOKEN}') AS b1,
         regexp_extract(listing_text, '{_LAST_TOKEN}') AS b2
  FROM listings
), ck AS (
  SELECT p_partkey AS cat_key, p_name AS cat_name,
         regexp_extract(p_name, '{_FIRST_TOKEN}') AS b1,
         regexp_extract(p_name, '{_LAST_TOKEN}') AS b2
  FROM part
), cand_blocked AS (
  {_purged_pass_sql("b1", ER_UNION_PURGE_CAP)}
  UNION ALL
  {_purged_pass_sql("b2", ER_UNION_PURGE_CAP)}
), u AS (
  SELECT listing_id AS uid, listing_text AS sk, 0 AS side FROM listings
  UNION ALL
  SELECT p_partkey, p_name, 1 FROM part
), ranked AS (
  SELECT uid, side, ROW_NUMBER() OVER (ORDER BY sk, side, uid) AS rn FROM u
), g AS (
  SELECT uid, side, rn,
         CAST(FLOOR((rn - 1) / {SN_WINDOW}) AS BIGINT) AS grp
  FROM ranked
), lex AS (
  SELECT uid AS listing_id, rn AS lrn, grp + d.d AS grp
  FROM g CROSS JOIN (VALUES (-1), (0), (1)) AS d(d)
  WHERE side = 0
), rr AS (
  SELECT uid AS cat_key, rn AS rrn, grp FROM g WHERE side = 1
), cand_sn AS (
  SELECT lex.listing_id, rr.cat_key
  FROM lex JOIN rr ON rr.grp = lex.grp
  WHERE ABS(lex.lrn - rr.rrn) < {SN_WINDOW}
), cand AS (
  SELECT DISTINCT listing_id, cat_key FROM (
    SELECT listing_id, cat_key FROM cand_blocked
    UNION ALL
    SELECT listing_id, cat_key FROM cand_sn
  )
), scored AS (
  SELECT cd.listing_id, l.listing_text, l.true_name, cd.cat_key, c.cat_name,
         CAST(levenshtein(l.listing_text, c.cat_name) AS BIGINT) AS lev
  FROM cand cd
  JOIN lk l USING (listing_id)
  JOIN ck c USING (cat_key)
), best AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY listing_id
                               ORDER BY lev ASC, cat_name ASC, cat_key ASC) AS rn
  FROM scored
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM cand) AS n_candidates,
       CAST(COUNT(*) AS BIGINT) AS n_listings,
       CAST(SUM(CASE WHEN b.cat_name = l.true_name THEN 1 ELSE 0 END) AS BIGINT)
         AS n_correct,
       ROUND(CAST(SUM(CASE WHEN b.cat_name = l.true_name THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS recall
FROM listings l
LEFT JOIN (SELECT listing_id, cat_name FROM best WHERE rn = 1) b
  USING (listing_id)
"""


QUERIES["er_union_recall"] = QuerySpec(q_er_union_recall, Q_ER_UNION_RECALL_ORACLE)


# ---------------------------------------------------------------------------
# er_purged_recall: the SCALE-SAFE production configuration. The part-name
# fixture above has a fixed 64-name vocabulary, so its blocks grow ~n²/64 and
# the unpurged er_union_recall measures fixture entropy at large SF (its
# docstring + SCALE_BENCH document that). This query is the configuration a
# 100 TB deployment actually runs: HIGH-CARDINALITY positional blocking keys
# over an open entity space (customer names — cardinality grows with n) plus
# ``max_pair_volume`` block purging for the keys that ARE degenerate.
#
# Fixture: customer listings mangled two ways (even keys lose the 'u' of the
# "Customer#" prefix; odd keys lose the first digit). Three digit-gram passes:
#   b1 = digits 1-5  — DEGENERATE (dense keys ⇒ "00000…" for nearly all rows;
#        its block volume is ~(n/2)² at every SF, so the 20 000 cap PURGES it
#        at every test scale — the purge path is oracle-exercised, not dead).
#   b2 = digits 3-7  — constant block volume (≤100 rows share d3..d7 whatever
#        n is, because the two trailing digits vary) — the scale-correct key;
#        covers the even (prefix-mangled) class.
#   b3 = last 5 chars — unique per entity; covers the odd (digit-strip) class.
# Candidate volume is therefore Θ(n) — empirically 1 640 / 16 490 / 164 990 at
# sf0.001/0.01/0.1, exactly ~11·n — and the published n_candidates column makes
# that bound part of the oracle-checked contract. Recall is 1.0: each mangled
# name's true catalog row is its UNIQUE lev-1 neighbour (one insertion restores
# it; any other catalog name is ≥2 edits away), unlike last-char truncation
# where a numeric alias ties at lev 1.
# ---------------------------------------------------------------------------

_CUST_PERTURB_SQL = """CASE WHEN c_custkey % 2 = 0
       THEN substr(c_name, 1, 1) || substr(c_name, 3)
       ELSE substr(c_name, 1, 9) || substr(c_name, 11) END"""


def q_er_purged_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Block-purged high-cardinality ER: digit-gram passes + max_pair_volume,
    publishing the candidate volume alongside the accuracy law."""
    customer = load(spark, sf_dir, "customer")

    def grams(df: DataFrame, text: str) -> list:
        return [
            F.substring(F.col(text), 10, 5).alias("b1"),
            F.substring(F.col(text), 12, 5).alias("b2"),
            F.expr(f"substr({text}, length({text}) - 4)").alias("b3"),
        ]

    listings = customer.select(
        F.col("c_custkey").alias("listing_id"),
        F.col("c_name").alias("true_name"),
        F.expr(_CUST_PERTURB_SQL).alias("listing_text"),
    )
    listings = listings.select("*", *grams(listings, "listing_text"))
    catalog = customer.select(
        F.col("c_custkey").alias("cat_key"), F.col("c_name").alias("cat_name")
    )
    catalog = catalog.select("*", *grams(catalog, "cat_name"))
    # r15: volume + best pick from ONE per-listing aggregate over the scored
    # pairs (see q_er_union_recall) — the r10 double-compute barrier and the
    # row_number window are gone; the blocking subtree has exactly one
    # consumer. n_listings here stays the COVERED-listings count (this
    # query's published law), so the final fold aggregates per_listing
    # directly with no join back to the listings frame.
    cand = blocked_candidate_pairs(
        listings,
        catalog,
        "listing_id",
        "cat_key",
        [("b1", "b1"), ("b2", "b2"), ("b3", "b3")],
        max_pair_volume=ER_PURGE_CAP,
    )
    scored = score_pairs(
        cand.join(
            listings.select("listing_id", "listing_text", "true_name"),
            "listing_id",
        ).join(catalog.select("cat_key", "cat_name"), "cat_key"),
        "listing_text",
        "cat_name",
    ).withColumn("lev", F.col("lev").cast("bigint"))
    per_listing = scored.groupBy("listing_id", "true_name").agg(
        F.count(F.lit(1)).cast("bigint").alias("__n_cand"),
        F.min(F.struct("lev", "cat_name", "cat_key")).alias("__best"),
    )
    correct = F.sum(
        F.when(F.col("__best.cat_name") == F.col("true_name"), 1).otherwise(0)
    ).cast("bigint")
    return per_listing.agg(
        F.sum("__n_cand").cast("bigint").alias("n_candidates"),
        F.count("*").cast("bigint").alias("n_listings"),
        correct.alias("n_correct"),
        F.round(
            correct.cast("double") / F.count("*").cast("double"), 6
        ).alias("recall"),
    ).select("n_candidates", "n_listings", "n_correct", "recall")


Q_ER_PURGED_RECALL_ORACLE = f"""
WITH listings AS (
  SELECT c_custkey AS listing_id, c_name AS true_name,
         {_CUST_PERTURB_SQL} AS listing_text
  FROM customer
), lk AS (
  SELECT listing_id, listing_text, true_name,
         substr(listing_text, 10, 5) AS b1,
         substr(listing_text, 12, 5) AS b2,
         substr(listing_text, length(listing_text) - 4) AS b3
  FROM listings
), ck AS (
  SELECT c_custkey AS cat_key, c_name AS cat_name,
         substr(c_name, 10, 5) AS b1,
         substr(c_name, 12, 5) AS b2,
         substr(c_name, length(c_name) - 4) AS b3
  FROM customer
), cand AS (
  SELECT DISTINCT listing_id, cat_key FROM (
    {_purged_pass_sql("b1")}
    UNION ALL
    {_purged_pass_sql("b2")}
    UNION ALL
    {_purged_pass_sql("b3")}
  )
), scored AS (
  SELECT cd.listing_id, l.true_name, c.cat_name, cd.cat_key,
         CAST(levenshtein(l.listing_text, c.cat_name) AS BIGINT) AS lev
  FROM cand cd JOIN lk l USING (listing_id) JOIN ck c USING (cat_key)
), best AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY listing_id
                               ORDER BY lev ASC, cat_name ASC, cat_key ASC) AS rn
  FROM scored
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM cand) AS n_candidates,
       CAST(COUNT(*) AS BIGINT) AS n_listings,
       CAST(SUM(CASE WHEN cat_name = true_name THEN 1 ELSE 0 END) AS BIGINT)
         AS n_correct,
       ROUND(CAST(SUM(CASE WHEN cat_name = true_name THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS recall
FROM best WHERE rn = 1
"""


QUERIES["er_purged_recall"] = QuerySpec(q_er_purged_recall, Q_ER_PURGED_RECALL_ORACLE)
