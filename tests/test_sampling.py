"""Deterministic sampling (functions/sampling.py): membership must be a pure
function of the row key — invariant under repartitioning, which seed-based
df.sample() does NOT guarantee."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from movie_genre_data_pipeline_spark.functions.sampling import (
    assign_split,
    hex_threshold,
    pack_token_budget,
    stratified_sample,
)

SF_DIR = "/root/testdata/sf0.001"


def test_hex_threshold_edges():
    assert hex_threshold(0.0) == "0" * 32
    assert hex_threshold(1.0) == "g"  # sorts after every hex digest
    t = hex_threshold(0.5)
    assert len(t) == 32 and t.startswith("8")
    with pytest.raises(ValueError):
        hex_threshold(1.5)


def test_stratified_sample_invariant_under_repartition(spark):
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    frac = {"en": 0.5, "de": 0.8, "fr": 0.25, "es": 0.6, "zh": 1.0}
    ids1 = {r[0] for r in stratified_sample(d, "doc_id", "lang", frac).select("doc_id").collect()}
    ids2 = {
        r[0]
        for r in stratified_sample(d.repartition(13, "lang"), "doc_id", "lang", frac)
        .select("doc_id")
        .collect()
    }
    assert ids1 == ids2 and 0 < len(ids1) < d.count()
    # zh has fraction 1.0: every zh doc kept
    zh_total = d.filter(F.col("lang") == "zh").count()
    zh_kept = (
        stratified_sample(d, "doc_id", "lang", frac)
        .filter(F.col("lang") == "zh")
        .count()
    )
    assert zh_kept == zh_total


def test_assign_split_total_and_stability(spark):
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    labeled = d.withColumn("split", assign_split("doc_id"))
    counts = {r["split"]: r["n"] for r in labeled.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == d.count()  # every row gets exactly one split
    assert set(counts) <= {"train", "val", "test"}
    assert counts["train"] > counts.get("val", 0)  # 80/10/10 shape
    # independent salts: the sample decision and split decision are uncorrelated
    relabeled = d.repartition(7).withColumn("split", assign_split("doc_id"))
    assert (
        labeled.select("doc_id", "split")
        .exceptAll(relabeled.select("doc_id", "split"))
        .count()
        == 0
    )


def test_pack_token_budget_chunks_bounded(spark):
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    from movie_genre_data_pipeline_spark.functions.text import token_count

    packed = pack_token_budget(d, "doc_id", token_count("text"), "lang", 500)
    stats = packed.groupBy("lang", "chunk_id").agg(
        F.sum("n_tokens").alias("tok"), F.max("n_tokens").alias("mx")
    )
    # every chunk except possibly where a single doc exceeds the budget starts
    # below budget + its last doc's size; chunk ids are dense from 0
    first = stats.groupBy("lang").agg(F.min("chunk_id").alias("m")).collect()
    assert all(r["m"] == 0 for r in first)
    # a chunk's tokens never exceed budget + one document (the straddler)
    bad = stats.filter(F.col("tok") > 500 + F.col("mx")).count()
    assert bad == 0


def test_priority_sample_weighted_and_repartition_invariant(spark):
    from movie_genre_data_pipeline_spark.functions.sampling import priority_sample

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    k = 10
    a = priority_sample(d, "doc_id", "n_chars", k, strata_col="lang")
    b = priority_sample(d.repartition(13), "doc_id", "n_chars", k, strata_col="lang")
    rows_a = sorted((r["lang"], r["doc_id"]) for r in a.collect())
    rows_b = sorted((r["lang"], r["doc_id"]) for r in b.collect())
    assert rows_a == rows_b
    # exactly min(k, n_lang) rows per stratum
    per = {r["lang"]: r["n"] for r in a.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    totals = {r["lang"]: r["n"] for r in d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert per == {lang: min(k, n) for lang, n in totals.items()}
    # weighting works: the sample's mean doc length must exceed the corpus mean
    # (weights = n_chars; a uniform sample would match it in expectation)
    mean_sample = a.agg(F.avg("n_chars")).collect()[0][0]
    mean_all = d.agg(F.avg("n_chars")).collect()[0][0]
    assert mean_sample > mean_all
    with pytest.raises(ValueError):
        priority_sample(d, "doc_id", "n_chars", 0)


# -- temperature mixture (r5) -----------------------------------------------------------
def test_temperature_resample_lifts_low_resource(spark):
    from pyspark.sql import functions as F

    from movie_genre_data_pipeline_spark.functions.sampling import temperature_resample

    rows = [(i, "big" if i < 900 else "small") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    kept = temperature_resample(df, "doc_id", "lang", target_total=400)
    counts = {r["lang"]: r["n"] for r in kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    # alpha=0.5: shares prop. to sqrt(n) -> big keeps ~30/sqrt(9)... the KEPT
    # FRACTION of the small stratum must exceed the big stratum's
    assert counts["small"] / 100 > counts["big"] / 900
    # deterministic: identical on re-run
    again = {r["lang"]: r["n"] for r in temperature_resample(df, "doc_id", "lang", 400)
             .groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts == again
    # empty input yields empty output, not an error
    assert temperature_resample(df.limit(0), "doc_id", "lang", 400).count() == 0


def test_group_split_never_leaks_a_group_across_folds(spark):
    """The leakage law: every customer's orders share ONE fold under the
    group-keyed assignment, while the row-keyed assignment (same machinery,
    keyed on the order) demonstrably splits some customer — the difference
    IS the operator's reason to exist."""
    from pyspark.sql import functions as F

    from movie_genre_data_pipeline_spark.functions.sampling import assign_split
    from movie_genre_data_pipeline_spark.suite import load

    o = load(spark, "/root/testdata/sf0.001", "orders")
    by_group = o.select("o_custkey", assign_split("o_custkey"))
    spans = (
        by_group.groupBy("o_custkey")
        .agg(F.count_distinct("split").alias("k"))
        .filter(F.col("k") > 1)
        .count()
    )
    assert spans == 0
    by_row = o.select("o_custkey", assign_split("o_orderkey"))
    leaky = (
        by_row.groupBy("o_custkey")
        .agg(F.count_distinct("split").alias("k"))
        .filter(F.col("k") > 1)
        .count()
    )
    assert leaky > 0


def test_kcenter_radius_certificate_is_monotone(spark):
    """Gonzalez law: radius_t (the covering radius of the first t-1 centers,
    emitted with pick t) never increases — min-distances only shrink as the
    selected set grows, and the arg-max point is removed each round. Centers
    are distinct and radii positive."""
    from movie_genre_data_pipeline_spark.suite import all_queries

    rows = sorted(
        all_queries()["sample_kcenter_coreset"]
        .fn(spark, "/root/testdata/sf0.001")
        .collect(),
        key=lambda r: r["sel_rank"],
    )
    assert [r["sel_rank"] for r in rows] == list(range(1, len(rows) + 1))
    centers = [r["center"] for r in rows]
    assert len(set(centers)) == len(centers)
    radii = [r["radius"] for r in rows[1:]]
    assert all(r > 0 for r in radii)
    assert all(a >= b for a, b in zip(radii, radii[1:]))


def test_dsir_target_equals_raw_gives_zero_weights(spark):
    """When the target filter selects EVERY document the two bucket models are
    identical, so every log-ratio — and therefore every document's importance
    weight — is exactly zero (integer micro-nats, no float residue)."""
    from movie_genre_data_pipeline_spark.functions.sampling import dsir_importance

    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "beta beta delta"), (3, "")],
        "doc_id bigint, text string",
    )
    out = dsir_importance(df, "doc_id", "text", F.lit(True), n_buckets=16).collect()
    assert len(out) == 3
    assert all(r["logw_micro"] == 0 for r in out)
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[3]["n_tokens"] == 0  # token-less doc present, scored 0


def test_dsir_prefers_target_vocabulary(spark):
    """Docs made of target-corpus tokens score positive; docs made of tokens
    the target never uses score negative — the DSIR selection direction."""
    from movie_genre_data_pipeline_spark.functions.sampling import dsir_importance

    rows = [
        # target docs (flag True) use 'good'/'fine'; raw-only docs use 'spam'
        (1, "good fine good fine", True),
        (2, "good good fine fine", True),
        (3, "spam spam spam spam", False),
        (4, "good fine good good", False),  # target-like but unflagged
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, is_t boolean")
    w = {
        r["doc_id"]: r["logw_micro"]
        for r in dsir_importance(
            df, "doc_id", "text", F.col("is_t"), n_buckets=64
        ).collect()
    }
    # On a micro-corpus add-1 smoothing shifts every absolute weight down
    # (the target total is smaller, so empty-bucket mass dilutes it more);
    # the smoothing-robust DSIR laws are ORDERINGS and content-dependence:
    assert w[1] == w[2], "same token multiset ⇒ identical weight"
    assert w[3] < min(w[1], w[2], w[4]), "raw-only vocabulary scores lowest"
    assert w[4] > w[3], "selection follows CONTENT, not the flag"


def test_dsir_repartition_invariant(spark):
    """Integer micro-nat folds make the weights independent of partitioning."""
    from movie_genre_data_pipeline_spark.functions.sampling import dsir_importance

    rows = [(i, f"tok{i % 7} tok{i % 3} common word") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    flag = F.col("doc_id") % 2 == 0
    a = sorted(
        dsir_importance(df.repartition(1), "doc_id", "text", flag).collect()
    )
    b = sorted(
        dsir_importance(df.repartition(13), "doc_id", "text", flag).collect()
    )
    assert a == b


def test_source_ablation_guards_source_cardinality(spark):
    """VERDICT r13 #4: leave-one-source-out is |sources|+1 postings passes —
    linear in |sources| — so past ABLATION_MAX_SOURCES it must hard-error
    (coarsen the key or opt in explicitly), the brute_force_top_k precedent."""
    import pytest as _pytest

    from movie_genre_data_pipeline_spark.suite.sampling_queries import (
        auc_source_ablation_from_parts,
    )

    n_src = 40  # > ABLATION_MAX_SOURCES (32)
    docs = spark.createDataFrame(
        [(i, i % 2 == 0, f"s{i % n_src}") for i in range(n_src * 2)],
        "doc_id bigint, y boolean, source string",
    )
    cells = spark.createDataFrame(
        [(f"s{i}", i % 8, 3, 1) for i in range(n_src)],
        "source string, bucket bigint, raw_c bigint, tgt_c bigint",
    )
    tf = spark.createDataFrame(
        [(i, i % 8, 2) for i in range(n_src * 2)],
        "doc_id bigint, bucket bigint, tf bigint",
    )
    with _pytest.raises(ValueError, match="linear in .sources."):
        auc_source_ablation_from_parts(docs, cells, tf)

    # the explicitly budgeted opt-in still runs (and ablates every source)
    out = auc_source_ablation_from_parts(docs, cells, tf, allow_many_sources=True)
    assert out.count() == n_src + 1
