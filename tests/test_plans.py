"""Physical-plan shape regression tests: the scale properties SCALE.md claims
(pushdown, pruning, broadcasts, no nested-loop range joins) must survive code
changes, not just hold the day they were checked. explain() needs analysis only
— these are fast."""

from __future__ import annotations

import io

import pytest
from contextlib import redirect_stdout

from movie_genre_data_pipeline_spark.suite import all_queries

SF_DIR = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = all_queries()[name].fn(spark, SF_DIR)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_tpch_q1_pushdown_and_pruning(spark):
    plan = _plan(spark, "tpch_q1")
    # filter reaches the parquet scan
    assert "LessThanOrEqual(l_shipdate" in plan, plan
    # column pruning: lineitem has 16 columns, the query needs 7
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert read_schema.count(",") == 6, read_schema  # 7 of 16 lineitem columns
    # map-side combine before the single exchange
    assert "partial_sum" in plan, plan


def test_star_join_broadcasts_dims(spark):
    plan = _plan(spark, "star_join")
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "SortMergeJoin" not in plan or "BroadcastHashJoin" in plan


def test_asof_join_has_no_join_node(spark):
    # union+window formulation: there must be NO join operator of any kind
    plan = _plan(spark, "asof_join")
    assert "Join" not in plan, plan
    assert "Window" in plan, plan


def test_interval_join_no_nested_loop(spark):
    plan = _plan(spark, "interval_join")
    assert "NestedLoop" not in plan, plan
    assert "Generate explode" in plan or "Generate" in plan, plan


def test_quarantine_filter_pushed(spark):
    plan = _plan(spark, "quarantine_clean")
    assert "PushedFilters" in plan and "l_quantity" in plan, plan


def test_tpch_q6_all_filters_pushed(spark):
    """Q6 is the minimal-IO shape: every predicate must reach the parquet reader
    and the plan must contain exactly one scan, no join, no extra shuffle."""
    plan = _plan(spark, "tpch_q6")
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l][0]
    for frag in ("l_shipdate", "l_discount", "l_quantity"):
        assert frag in pushed, pushed
    assert len([l for l in plan.splitlines() if "ReadSchema" in l]) == 1, plan
    assert "Join" not in plan, plan
    assert "partial_sum" in plan, plan  # map-side combine


def test_tpch_q5_broadcasts_constant_dims_no_cartesian(spark):
    """nation/region are hint-broadcast (constant size at any SF); the
    cross-constraint c_nationkey = s_nationkey must ride an equi-join — no
    nested-loop/cartesian anywhere."""
    plan = _plan(spark, "tpch_q5")
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan
    assert plan.count("BroadcastHashJoin") >= 2, plan
    # date range reaches the orders scan
    assert "GreaterThanOrEqual(o_orderdate" in plan, plan


def test_tpch_q17_copartitioned_self_join(spark):
    """The decorrelated threshold join keys both sides on l_partkey — it must be
    an equi-join (SMJ or broadcast after AQE), never nested-loop, and the brand
    filter must be pushed to the part scan on both branches."""
    plan = _plan(spark, "tpch_q17")
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan
    assert plan.count("EqualTo(p_brand,Brand#23)") == 2, plan


@pytest.mark.slow  # r16 driver-budget: heavy member; runs in the -m slow pass
def test_partition_pruning_on_p_ingestdate(spark, tmp_path):
    """The medallion p_* partition convention must actually prune: a filtered
    scan of a date-partitioned table reads only matching partitions."""
    from pyspark.sql import functions as F

    ev = all_queries()["lit_enrich"].fn(spark, SF_DIR).limit(0)  # warm import
    src = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey", "o_totalprice", F.to_date("o_orderdate").alias("p_date")
    )
    path = str(tmp_path / "part_orders")
    src.write.partitionBy("p_date").parquet(path)
    one_day = src.select(F.max("p_date")).collect()[0][0]

    df = spark.read.parquet(path).filter(F.col("p_date") == F.lit(one_day))
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    part_filters = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert part_filters and "p_date" in part_filters[0], plan


def test_tpch_q4_semi_join_with_residual(spark):
    """The EXISTS becomes ONE semi-join carrying the equi key plus the non-equi
    residual — no duplicate-producing inner join + distinct, no nested loop."""
    plan = _plan(spark, "tpch_q4")
    assert "LeftSemi" in plan, plan
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan
    # date range reaches the orders scan
    assert "GreaterThanOrEqual(o_orderdate" in plan, plan


def test_tpch_q19_broadcast_and_residual_disjunction(spark):
    """part is hint-broadcast; the OR-of-ANDs is a residual on the joined row
    (never a nested-loop join), and lineitem's scan reads only needed columns."""
    plan = _plan(spark, "tpch_q19")
    assert "BroadcastHashJoin" in plan, plan
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan
    read_schemas = [l for l in plan.splitlines() if "ReadSchema" in l]
    li_schema = [l for l in read_schemas if "l_partkey" in l][0]
    assert "l_extendedprice" in li_schema and "l_shipdate" not in li_schema, li_schema


def test_tpch_q22_scalar_broadcast_no_cartesian_blowup(spark):
    """The scalar-average threshold rides a broadcast nested loop over ONE row
    (that is the correct plan for an uncorrelated scalar), and the big-side
    anti join is a hash/sort join on the key, never a nested loop."""
    plan = _plan(spark, "tpch_q22")
    assert "LeftAnti" in plan, plan
    # the >300000 prefilter reaches the orders scan before the anti join
    assert "GreaterThan(o_totalprice,300000" in plan, plan


def test_grouping_sets_single_expand_single_shuffle(spark):
    """GROUPING SETS compiles to one Expand + one aggregate exchange — one scan
    total for all four groupings, not a union of four scans."""
    plan = _plan(spark, "grouping_sets")
    assert "Expand" in plan, plan
    assert len([l for l in plan.splitlines() if "ReadSchema" in l]) == 1, plan


def test_tpch_q15_single_fact_scan(spark):
    """The scalar-max comparison rides a window over the aggregated view —
    lineitem must appear exactly once in the plan (the subquery form would
    scan it twice)."""
    plan = _plan(spark, "tpch_q15")
    li_scans = [
        l for l in plan.splitlines() if "ReadSchema" in l and "l_suppkey" in l
    ]
    assert len(li_scans) == 1, plan
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan


def test_tpch_q21_single_pass_decorrelation(spark):
    """Q21's EXISTS / NOT EXISTS double correlation is ONE per-order aggregate:
    lineitem appears exactly once, no correlated re-scan, no nested loop."""
    plan = _plan(spark, "tpch_q21")
    li_scans = [
        l for l in plan.splitlines() if "ReadSchema" in l and "l_returnflag" in l
    ]
    assert len(li_scans) == 1, plan
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan


def test_tpch_q8_broadcasts_dims_no_cartesian(spark):
    """Deepest reference-class join (6 tables, nation used twice): all three
    constant-size dims broadcast, the two fact-fact joins shuffle on keys,
    and nothing degenerates into a nested loop."""
    plan = _plan(spark, "tpch_q8")
    assert plan.count("BroadcastHashJoin") >= 3, plan
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan
    assert "GreaterThanOrEqual(o_orderdate" in plan, plan


def test_tpch_q2_groupwise_min_no_join_back(spark):
    """The min-struct aggregate carries the payload columns out of the min, so
    there is no second join back to suppliers and the part/nation/region dims
    are broadcast. Exactly one supplier scan, no nested loop."""
    plan = _plan(spark, "tpch_q2")
    s_scans = [l for l in plan.splitlines() if "ReadSchema" in l and "s_acctbal" in l]
    assert len(s_scans) == 1, plan
    assert plan.count("BroadcastHashJoin") >= 3, plan
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan


def test_tpch_q20_single_aggregate_decorrelation(spark):
    """The correlated quantity comparison is ONE per-(supplier, part) aggregate
    computing both sums — lineitem scanned exactly once, PROMO filter pushed to
    the broadcast part scan."""
    plan = _plan(spark, "tpch_q20")
    li_scans = [l for l in plan.splitlines() if "ReadSchema" in l and "l_shipdate" in l]
    assert len(li_scans) == 1, plan
    assert "EqualTo(p_type,PROMO)" in plan, plan
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan


def test_topk_orders_take_ordered_no_global_sort(spark):
    """VERDICT r01 #6: a global orderBy().limit(k) must plan as
    TakeOrderedAndProject (per-partition top-k + single merge of k·P rows), NOT
    a full range-partitioned sort — the difference between shuffling k rows per
    partition and shuffling the whole table at 100 TB."""
    plan = _plan(spark, "topk_orders")
    assert "TakeOrderedAndProject" in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan


# -- r2 curation family -------------------------------------------------------------
def test_decontaminate_broadcasts_benchmark(spark):
    """The benchmark shingle set is tiny next to the corpus: the probe MUST be a
    broadcast-hash join (an SMJ here would shuffle the full corpus's shingles)."""
    plan = _plan(spark, "curate_decontaminate")
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan.split("BroadcastHashJoin")[0], plan


def test_chunking_is_shuffle_free(spark):
    """Chunking is a per-row explode: no exchange anywhere in the plan."""
    plan = _plan(spark, "curate_chunk_documents")
    assert "Exchange" not in plan, plan
    assert "Generate" in plan, plan  # the position explode


def test_quantize_is_shuffle_free(spark):
    plan = _plan(spark, "sim_quantize_int8")
    assert "Exchange" not in plan, plan


def test_mixture_resample_broadcasts_rates(spark):
    """Rates are |strata| rows: must broadcast back onto the scan; the only
    exchange feeds the tiny count aggregation, never the corpus side."""
    plan = _plan(spark, "sample_mixture_rebalance")
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_media_block_chunks_shuffle_free(spark):
    plan = _plan(spark, "media_block_chunks")
    assert "Exchange" not in plan, plan


def test_corpus_pipeline_stage_barriers_hold(spark):
    """The composed pipeline materializes stage boundaries (localCheckpoint):
    its final plan must not re-derive upstream stages — no parquet scans of
    documents (only checkpointed RDD scans) and single-digit exchanges.
    Regression guard for the 14-scan/80-exchange plan Catalyst builds without
    the barriers."""
    plan = _plan(spark, "curate_corpus_pipeline")
    assert "documents.parquet" not in plan, plan
    assert plan.count("Exchange") <= 10, plan


# -- r5 operators -----------------------------------------------------------------------
def test_dedup_semantic_pairs_are_equi_joined(spark):
    """SemDeDup's candidate pairs must come from a hash-partitioned equi-join
    on the learned cluster — never a nested-loop cross product. The ONE
    permissible nested-loop is the single-row broadcast centroid-matrix
    attach (kmeans.with_centroid_matrix, r7): constant broadcast data, not a
    pair generator — every NestedLoop in the plan must be that attach."""
    plan = _plan(spark, "dedup_semantic")
    assert "CartesianProduct" not in plan, plan
    if "NestedLoop" in plan:
        assert plan.count("BroadcastNestedLoopJoin") <= plan.count("__cm"), plan
    assert "Join" in plan, plan


def test_fuzzy_decontam_band_key_equi_join(spark):
    """Cross-dataset LSH candidates join on band_key (one equi-shuffle), and
    the shingle-intersection stage is equi-joined too — no cross joins."""
    plan = _plan(spark, "curate_fuzzy_decontaminate")
    assert "NestedLoop" not in plan, plan
    assert "band_key" in plan, plan


def test_pq_encode_is_pure_projection(spark):
    """Encoding the corpus to PQ codes must not shuffle: codebooks are plan
    literals, the encode is a projection over the scan."""
    from movie_genre_data_pipeline_spark.functions.kmeans import quantize_vectors
    from movie_genre_data_pipeline_spark.functions.pq import pq_encode, pq_train_exact

    spark_df = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = quantize_vectors(spark_df, "vec_id", "embedding").cache()
    books = pq_train_exact(q, 64, 4, 8, iterations=1)
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        pq_encode(q, books).explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan, plan


def test_retention_cohort_sizes_broadcast(spark):
    plan = _plan(spark, "ts_retention_cohorts")
    assert "BroadcastHashJoin" in plan, plan
    assert "NestedLoop" not in plan, plan


def test_anomaly_zscore_single_series_exchange(spark):
    """The rolling stats and the z-score must evaluate in one window pass over
    the (event_type)-partitioned series — no per-stat re-shuffle."""
    plan = _plan(spark, "ts_anomaly_zscore")
    assert "RunningWindowFunction" in plan or "Window" in plan, plan
    # dense spine build + one window partitioning on the series key; the frame
    # stats (count/sum/sum2) must share a single Window node
    assert plan.count("Window") <= 2, plan


def test_gold_mart_broadcast_and_single_agg_exchange(spark):
    """The star-mart contract: the genre dim joins as a broadcast (no shuffle
    on the exploded fact side for the join) and the only exchange is the final
    per-genre hash aggregate with a map-side partial."""
    plan = _plan(spark, "gold_genre_revenue")
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "partial_count" in plan or "partial_sum" in plan, plan


def test_gold_ivm_delta_side_broadcasts_dim(spark):
    """IVM must not sort-merge the churn-sized delta against the tiny dim."""
    plan = _plan(spark, "gold_genre_revenue_ivm")
    assert "BroadcastHashJoin" in plan, plan


def test_pit_join_never_nested_loop(spark):
    """The point-in-time join must stay an equi-join + filter; a non-equi
    range-join formulation would degrade to BroadcastNestedLoopJoin."""
    plan = _plan(spark, "merge_scd2_pit_join")
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_drift_report_joins_are_bounded(spark):
    """Drift report: the only nested-loop is the 1-row totals scalar
    broadcast; every other join runs on n_bins-sized frames."""
    plan = _plan(spark, "dq_drift_report")
    # Both nested-loop sites are n_bins-bounded by construction: the 1-row
    # totals scalar broadcast, and (when Catalyst picks it over SMJ) the
    # full-outer merge of the two <=n_bins-row count frames. What must never
    # appear is a nested loop against a SNAPSHOT-sized input — pinned by the
    # structural fact that every join in this plan is post-aggregation.
    tree = plan.split("===")[0]
    assert tree.count("BroadcastNestedLoopJoin") <= 2, plan
    assert "CartesianProduct" not in plan, plan
    # the two snapshot scans feed hash aggregates before any join
    assert tree.count("HashAggregate") >= 4, plan


def test_er_candidates_are_equi_joined_never_cartesian(spark):
    # both blocking passes must plan as hash/sort-merge EQUI joins on the
    # block key — a cross/nested-loop product would be the O(n·m) ER naive
    plan = _plan(spark, "er_blocked_matches")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_mining_pairs_join_on_basket_key(spark):
    # the pair generator must be an equi self-join on the basket id (bounded
    # per-basket output), and the part dim attribution must broadcast
    plan = _plan(spark, "mine_brand_pairs")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan  # lineitem × part dim


def test_mining_rules_broadcast_single_item_supports(spark):
    # vocabulary-sized support tables join broadcast — the fact-sized pair
    # stream must not shuffle against them
    plan = _plan(spark, "mine_brand_rules")
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "CartesianProduct" not in plan, plan


def test_compaction_plan_windows_per_partition_value(spark):
    # the running sum must be partitioned (parallel across partition values),
    # never a single global-order window task
    plan = _plan(spark, "ops_compaction_plan")
    assert "Window" in plan, plan
    # formatted plans render the spec as windowspecdefinition(source#N, ...)
    assert "windowspecdefinition(source#" in plan, plan


def test_keyness_broadcasts_totals_over_single_fact_stage(spark):
    # the fact-sized tokenize+explode aggregate is materialized ONCE behind
    # the localCheckpoint barrier (no parquet scan may survive into the final
    # plan — the totals would otherwise re-tokenize the corpus three times);
    # totals come back as broadcasts (2 hash joins + the one-row N nested loop)
    import re

    plan = _plan(spark, "text_source_keyness")
    assert "CartesianProduct" not in plan, plan
    assert len([l for l in plan.splitlines() if "ReadSchema" in l]) == 0, plan
    assert "ExistingRDD" in plan, plan
    # count operator DETAIL headers "(N) <Op>" — the tree section renders each
    # node a second time
    assert len(re.findall(r"\(\d+\) BroadcastHashJoin", plan)) >= 2, plan
    assert len(re.findall(r"\(\d+\) BroadcastNestedLoopJoin", plan)) <= 1, plan


def test_ab_report_is_single_scan(spark):
    # per-user conditional count + one conditional aggregate — the events
    # table must be scanned exactly once and nothing joins
    plan = _plan(spark, "ab_experiment_report")
    assert len([l for l in plan.splitlines() if "ReadSchema" in l]) == 1, plan
    assert "Join" not in plan, plan


def test_ols_gram_is_single_shuffle(spark):
    """The OLS fits must reduce the fact scan in ONE map-side-combined hash
    aggregate: exactly one exchange for the grouped fit (on the segment key),
    one for the global fit (the single-partition final combine), and the
    Cramer solve is a projection — no join, no extra shuffle."""
    import re

    for name in ("feat_ols_normal_eq", "feat_ols_by_segment"):
        plan = _plan(spark, name)
        # formatted output lists each node once in the tree and once in the
        # details section — count distinct exchange NODE ids
        node_ids = set(re.findall(r"\((\d+)\) Exchange", plan))
        assert len(node_ids) == 1, (name, plan)
        assert "HashAggregate" in plan, (name, plan)
        assert "partial_sum" in plan, (name, plan)  # map-side combine
        assert "Join" not in plan, (name, plan)


def test_ridge_and_corr_stay_single_aggregate(spark):
    """The ridge path and the correlation matrix must keep the OLS plan
    contract: the fact scan reduces in ONE map-side-combined aggregate
    (one exchange — the single-partition final combine), the λ explode /
    pair stack are projections over that row, and nothing joins."""
    import re

    for name in ("feat_ridge_path", "feat_corr_matrix"):
        plan = _plan(spark, name)
        node_ids = set(re.findall(r"\((\d+)\) Exchange", plan))
        assert len(node_ids) == 1, (name, plan)
        assert "partial_sum" in plan, (name, plan)
        assert "Join" not in plan, (name, plan)


def test_er_purged_candidates_broadcast_allowlists_never_cartesian(spark):
    """The purge allow-lists are vocabulary-sized and must BROADCAST into the
    candidate equi-joins; the only nested-loop is the one-row candidate-count
    scalar attach."""
    plan = _plan(spark, "er_purged_recall")
    assert "CartesianProduct" not in plan, plan
    assert plan.count("BroadcastNestedLoopJoin") <= 2, plan  # 1-row scalar ×(tree+details)
    assert "BroadcastHashJoin" in plan, plan


def test_join_view_ivm_broadcasts_deltas(spark):
    """All three change feeds are churn-sized and must broadcast: the
    survivors path is one broadcast anti-join + one broadcast left join over
    the view, never a shuffled join on the delta side."""
    plan = _plan(spark, "cdc_join_ivm")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_two_level_assignment_is_shuffle_free(spark):
    """The hierarchical corpus assignment (r8) must stay a single projection
    stage: group centers and per-group cell tables ride as ONE broadcast row
    (BroadcastNestedLoopJoin on a 1-row carrier), never an Exchange on the
    corpus side."""
    from movie_genre_data_pipeline_spark.functions.kmeans import (
        assign_clusters_two_level,
        kmeans_fit_exact_local,
        quantize_vectors,
    )

    df = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = quantize_vectors(df, "vec_id", "embedding").cache()
    rows = [(r["vid"], r["vq"]) for r in q.orderBy("vid").limit(64).collect()]
    cents = kmeans_fit_exact_local(rows, 8, 2)
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        assign_clusters_two_level(q, "vid", "vq", cents).explain("formatted")
    plan = buf.getvalue()
    # the 1-row carrier arrives via BroadcastExchange (data movement of a few
    # KB, not a repartition of the corpus); any SHUFFLE exchange is the bug
    for shuffle in ("Exchange hashpartitioning", "Exchange rangepartitioning",
                    "Exchange SinglePartition"):
        assert shuffle not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan


def test_language_mart_broadcast_and_single_agg(spark):
    """Second star mart (r8): the language dim joins as a broadcast and the
    only shuffle is the final ~|languages|-key aggregate with a map-side
    partial — the scalar-FK twin of the genre-mart pin."""
    plan = _plan(spark, "gold_language_revenue")
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "partial_count" in plan or "partial_sum" in plan, plan


def test_er_union_purged_never_cartesian(spark):
    """The purged union configuration (r8): token-pass allow-lists broadcast,
    candidates stay equi-joined, and the only nested-loop is the 1-row
    candidate-count scalar attach."""
    plan = _plan(spark, "er_union_recall")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_dsir_model_broadcasts_and_no_cartesian(spark):
    """DSIR (r8): the ≤256-row log-ratio table must arrive by broadcast into
    the (doc, bucket) aggregate; the totals attach is the one permissible
    1-row broadcast nested loop; the corpus is never pair-joined."""
    plan = _plan(spark, "sample_importance_select")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_duplicate_spans_no_pairwise_join(spark):
    """Span dedup (r8): duplication is decided by a window over the gram-hash
    partitioning — there must be NO join between gram tables (the pairwise
    formulation that quadratically explodes), only the final left join of
    the per-doc report onto the doc base."""
    plan = _plan(spark, "dedup_duplicate_spans")
    assert "CartesianProduct" not in plan, plan
    assert "NestedLoop" not in plan, plan
    # exactly one physical join node: the report → base attach (formatted
    # explain prints each node twice — tree + detail — so count node headers)
    import re

    n_joins = len(
        re.findall(r"\(\d+\) (?:SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin)", plan)
    )
    assert n_joins == 1, plan
    assert "Window" in plan, plan


def test_logreg_gram_is_single_partial_aggregate(spark):
    """IRLS (r8): each step's weighted Gram must be ONE map-side-combined
    aggregate over the feature scan — no join, no window; only d²+d numbers
    cross the wire."""
    from pyspark.sql import functions as F

    from movie_genre_data_pipeline_spark.functions.regression import (
        logreg_irls_micro,
    )

    feats = spark.range(100).select(
        (F.col("id") % 7).alias("x1"),
        (F.col("id") % 3).alias("x2"),
        (F.col("id") % 2).alias("y"),
    )
    out = logreg_irls_micro(feats, "x1", "x2", "y", iters=1)
    # the returned trajectory is a small local frame; pin the per-step plan
    # by replaying the step's aggregate shape directly instead
    import io
    from contextlib import redirect_stdout

    scored = feats.select(
        "x1", "x2", "y", F.lit(0).alias("z_micro")
    ).withColumn("mu_micro", F.expr(
        "LEAST(999999, GREATEST(1, CAST(ROUND((1.0 / (1.0 + exp(-(CAST(z_micro"
        " AS DOUBLE) / 1000000.0)))) * 1000000.0, 0) AS BIGINT)))"
    ))
    g = scored.select(
        "x1", "x2",
        F.expr("mu_micro * (1000000 - mu_micro)").alias("w"),
        F.expr("y * 1000000 - mu_micro").alias("r"),
    ).agg(F.sum(F.col("w").cast("decimal(38,0)")).alias("ni"))
    buf = io.StringIO()
    with redirect_stdout(buf):
        g.explain("formatted")
    plan = buf.getvalue()
    assert "partial_sum" in plan, plan
    assert "Join" not in plan and "Window" not in plan, plan
    assert out.count() == 1


def test_trainset_funnel_stage_barrier_holds(spark):
    """The funnel's scored frame is checkpointed: the final plan must read
    checkpointed rows, not re-derive the scoring tables (16 parquet scans
    without the barrier), and keep single-digit exchanges."""
    import re

    plan = _plan(spark, "curate_trainset_funnel")
    assert "documents.parquet" not in plan, plan
    assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 4, plan


def test_lateral_topk_decorrelates_to_group_limit(spark):
    """The correlated LATERAL top-2 must decorrelate into a per-key
    WindowGroupLimit (rank-pushdown top-k, no global sort, no nested-loop
    per-row re-execution of the subquery)."""
    plan = _plan(spark, "lateral_join_topk")
    assert "WindowGroupLimit" in plan, plan
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan, plan


def test_variant_and_xml_are_single_scan_single_agg(spark):
    """Semi-structured round-trips are scan-local projections + one
    map-side-combined aggregate — no join, no window, one scan."""
    for name in ("variant_functions", "xml_functions"):
        plan = _plan(spark, name)
        assert "Join" not in plan and "Window" not in plan, (name, plan)
        assert len([l for l in plan.splitlines() if "ReadSchema" in l]) == 1, name
        assert "partial_count" in plan or "partial_sum" in plan, (name, plan)


def test_reachability_runs_native_recursion(spark):
    """The recursive CTE must compile to Catalyst's native UnionLoop (no
    driver-side iteration, no cartesian), with the recursion bounded."""
    plan = _plan(spark, "graph_reachability")
    assert "UnionLoop" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_r15_fanout_readouts_scan_once(spark):
    """The r15 wave's fan-out pinning regression (the ACF precedent): a
    dimension-sized aggregate that feeds multiple consumers (global fold +
    output join) must be localCheckpoint-pinned, so the corpus scan behind
    it appears ZERO times in the readout plan (it ran once, inside the
    checkpoint) instead of once per consumer."""
    for name in ("ab_cuped_adjustment", "ops_benford_screen", "ops_lorenz_deciles"):
        plan = _plan(spark, name)
        assert plan.count("Scan parquet") == 0, (name, plan)


def test_raking_iterations_stay_grid_sized(spark):
    """The IPF readout must be a pure projection over the PINNED grid
    fixed point (every half-step's fold + broadcast join ran inside its own
    checkpoint segment): no parquet scan, no sort-merge join, and the plan
    input is the checkpointed grid RDD — so nothing in the readout can ever
    shuffle wider than the |langs|x|sources| grid."""
    plan = _plan(spark, "sample_raking_ipf")
    assert "Scan parquet" not in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "Scan ExistingRDD" in plan, plan


def test_wilson_and_kappa_prune_columns(spark):
    """The per-stratum CI and the confusion census must read exactly the
    columns they price: (lang, n_chars) and (text, n_chars) respectively —
    a scan reading all five documents columns is the class of regression
    pruning exists to catch."""
    plan = _plan(spark, "sample_wilson_ci")
    read = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "lang" in read and "n_chars" in read and "text" not in read, read
    plan = _plan(spark, "feat_cohens_kappa")
    read = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "text" in read and "n_chars" in read and "lang" not in read, read
