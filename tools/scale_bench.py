"""Scale-tier evidence for the 100 TB design claims (VERDICT r05 #6).

Generates a k-times larger synthetic tier from the sf0.1 fixtures by
REPLICA-SHIFTING (not duplicating) each table the five scale-marketed query
paths read, then times each query at both tiers and records the scaling
ratio. Near-linear ratios are the first empirical support for the "bucketed /
salted / sketched plans survive scale-up" story; super-linear ratios flag a
plan whose shuffle or candidate set grows faster than its input.

Replica discipline — each replica r in 1..k-1 must preserve the BASE tier's
within-replica workload character while staying disjoint across replicas:
- documents: doc ids offset; every word gets a replica suffix, so shingle
  sets are identical in structure within a replica but share nothing across
  replicas (plain duplication would hand MinHash-LSH k-1 artificial near-dups
  per doc and quadratically inflate candidate pairs — a different workload).
- embeddings: ids offset; vectors carried as-is (density scales uniformly,
  the realistic outcome of more data in the same embedding space).
- events: event/user ids offset — HLL cardinality grows k-fold.
- customer/orders and lineitem/supplier: join keys offset consistently on
  BOTH sides, so per-key fanout, skew shape, and SCD2 version-chain lengths
  match the base tier exactly; only the key count scales.

Usage: python tools/scale_bench.py [k] [base_sf_dir] [out_json] [q1,q2,...]
Writes one JSON blob (default SCALE_BENCH.json at the repo root). The
optional 4th arg restricts the run to a comma-separated subset of
SCALE_QUERIES — the k=16 spot tier (VERDICT r11 #7) times only the three
scale-marketed paths there, since generating 16x sf0.1 for all 23 would
dominate the round's wall-clock without adding signal.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SCALE_QUERIES = [
    "dedup_minhash_lsh",
    "sim_pq_ivfadc",
    "sketch_hll_distinct",
    "merge_scd2",
    "skew_salted_join",
    # r6 second wave: basket mining — baskets scale k-fold against a FIXED
    # brand vocabulary (the realistic growth mode), so pair volume must scale
    # ~linearly with the fact side
    "mine_brand_pairs",
    # r7 (verdict r6 #8): the untested growth paths — ER candidate-generation
    # joins over a k-fold entity table, the corpus-reduction keyness tables,
    # and the gold IVM's full-outer snapshot diff
    "er_union_recall",
    "text_source_keyness",
    "gold_genre_revenue_ivm",
    # r7: the scale-safe ER configuration (high-cardinality digit-gram keys +
    # block purging, customer entity space grows with n) — the near-linear
    # counterpart to er_union_recall's documented fixed-vocabulary growth
    "er_purged_recall",
    # r7: join-view IVM (deltas and view both grow with the fact side — work
    # must stay ∝ n) and the JL shortlist+rerank search (panel·n k-dim scan
    # + panel·S d-dim rerank — linear in n by construction)
    "cdc_join_ivm",
    "sim_topk_rerank",
    # r8 (verdict r7 #5): the regression family markets "ONE map-side-combined
    # aggregate into a d²-sized Gram" as its scale story — measure it. Ratios
    # should be ~flat-to-linear: the shuffle is d²-sized regardless of n.
    "feat_ols_normal_eq",
    "feat_corr_matrix",
    "feat_ridge_path",
    # r8 second wave: the DSIR selection (bucket-sized model + one doc-keyed
    # shuffle — must stay linear), the span-dedup report (gram explode +
    # hash-keyed occurrence window + island merge — linear, no pairwise
    # joins; replica word-suffixing keeps cross-replica grams disjoint so
    # duplicated-span volume scales with the corpus, not quadratically),
    # and the IRLS classifier (iters × the Gram scan — the flattest law
    # here since only d²+d numbers ever leave the executors)
    "sample_importance_select",
    "dedup_duplicate_spans",
    "feat_logreg_recovery",
    # r8 third wave: the composed funnel (its cost law is the max of its
    # stages — spans + DSIR, both measured linear above) and power-iteration
    # PCA (one d²-bounded moment pass; iterations are scan-free, so the
    # ratio should be the flattest on the roster)
    "curate_trainset_funnel",
    "feat_pca_power",
    # r9 (verdict r8 #5): the second gold mart's IVM — scalar-FK signed-delta
    # fold; its genre sibling measures 0.87, prove the language mart matches
    "gold_language_revenue_ivm",
    # r11: range search — probed-cell equi-join + ONE Arrow-batched exact
    # count scan (Q·n, counts fold additively); must stay linear like the
    # rerank sibling. (sim_ivf_recall_at_k is deliberately NOT here: its
    # exact baseline is the guarded O(n²) evaluation pass — quadratic by
    # design on the bounded fixture, meaningless as a scale law.)
    "sim_range_search",
    # r11: the diversity readout over the unigram fold — one token explode +
    # term-keyed aggregate + a 1-row reduction; the flattest text path
    "text_unigram_entropy",
    # r12: the new operator families' scale laws — the per-doc-count explode
    # behind the Fano report (linear in tokens), the 32x map-side replicate
    # fan-out behind the Poisson bootstrap (linear, no global resample), and
    # the Mann-Whitney prefix sum (distinct-score-sized, range-partitioned —
    # must stay linear-or-flatter in docs)
    "text_burstiness",
    "sample_bootstrap_ci",
    "feat_auc_report",
    # r13: the evaluation family's new members — the double prefix sum
    # behind average precision, the integer-cross-product KS max (both must
    # track the AUC row's law), and the x32 replicate fan-out + single
    # ranged prefix behind the bootstrap AUC CI (must stay ~linear like its
    # sample_bootstrap_ci sibling)
    "feat_pr_auc_report",
    "feat_ks_report",
    "feat_auc_bootstrap_ci",
    # late r13: the decile-gains ntile + 10-row prefix (must track the AUC
    # row's law), the ranged customer-rank Gini (linear in customers), the
    # calendar-grain Mann-Kendall (flat-to-linear: the pairwise fan-out is
    # days², fixed, while the fact fold is linear), the grid-bounded χ²
    # (flattest: |X|·|Y| cells regardless of n), the Gram-shape Neyman
    # moments (flat like the OLS family), the top-k Hill rank (linear), and
    # the double-ntile tau grid (linear scans, 100-cell fold)
    "feat_lift_gains",
    "ops_gini_concentration",
    "ts_mann_kendall",
    "feat_chi2_independence",
    "sample_neyman_allocation",
    "text_hill_tail_index",
    "feat_rank_tau",
    # late r13 second wave: the |sources|-bounded ablation fan-out (must
    # stay ~linear — |sources| is a dimension), the candidate-bounded
    # MinHash calibration (co-shingle verification semi-joined to LSH
    # candidates — the volume the docstring promises is candidate-, not
    # corpus-, shaped), the Arrow bincount histogram (linear kernel, ≤256
    # cells out per batch), the per-language ARI moments (the ESS shape),
    # and the recursive-CTE harmonic centrality (grain-bounded recursion:
    # the edge list is dimension-sized however large the fact side grows)
    "feat_auc_source_ablation",
    "dedup_minhash_calibration",
    "media_byte_histogram",
    "text_readability_ari",
    "graph_harmonic_centrality",
    # r15 (VERDICT r14 #4): the r14 wave's scale-marketed paths — the
    # Kaplan-Meier spans fold + ranged-ranking prefix sums (user-grain MIN/
    # MAX facts, duration-grain readout — linear in users), the Theil
    # decomposition (|sources|-grain three-fact fold — the flattest shape,
    # like the Gram family), and isotonic calibration (score-decile-grain
    # PAV via a few-hundred-combination join — grain-bounded like the χ²
    # grid, must read ~flat)
    "ts_kaplan_meier",
    "ops_theil_decomposition",
    "feat_isotonic_calibration",
    # r15 wave: the CUPED customer-grain moment fold (must read ~linear in
    # customers), the Ljung-Box calendar-grain ladder (the ACF's flat
    # shape), the Lorenz ranged-ntile deciles (linear in customers like the
    # Gini sibling), and the IPF raking grid fixed point (flattest: the
    # grid is |langs|x|sources| regardless of n)
    "ab_cuped_adjustment",
    "ts_ljung_box",
    "ops_lorenz_deciles",
    "sample_raking_ipf",
]

# per-table (id columns to offset, text columns to word-suffix)
TABLES: dict[str, tuple[list[str], list[str]]] = {
    "documents": (["doc_id"], ["text"]),
    "embeddings": (["vec_id"], []),
    "events": (["event_id", "user_id"], []),
    # c_name is REGENERATED from the offset key (see REGEN_TEXT), not
    # word-suffixed: the ER blocking keys are digit grams (substr 10..16 of
    # the name), and an end-of-string suffix leaves the digit prefix space
    # k-fold DENSER instead of open — r10's 1.58 k=4 ratio on
    # er_purged_recall was exactly that artifact (candidate volume grew
    # 18.7x under 4x rows because replicas repeated the base digit space).
    # dbgen itself names customers 'Customer#%09d', so regeneration is the
    # faithful larger-SF fixture, keeping block cardinality growing with n.
    "customer": (["c_custkey"], []),
    "orders": (["o_orderkey", "o_custkey"], []),
    "lineitem": (["l_orderkey", "l_suppkey"], []),
    "supplier": (["s_suppkey"], []),
    # part replicates as the ER entity table (k-fold listings with disjoint
    # word-suffixed names — the `\S+` blocking keys never collide across
    # replicas). mine_brand_pairs keeps its fixed-catalog character anyway:
    # p_brand is NOT suffixed (fixed vocabulary) and lineitem.l_partkey is
    # not offset, so baskets attribute against replica-0 parts exactly as
    # they attributed against the verbatim copy before.
    "part": (["p_partkey"], ["p_name"]),
}

# text columns rebuilt from the (already offset) id column — the dbgen
# naming rule, so replica entities are NEW entities end-to-end, digit grams
# included. Applied to every replica (replica 0's value is identical by
# construction: base c_name IS 'Customer#%09d' of the base key).
REGEN_TEXT: dict[str, dict[str, str]] = {
    "customer": {"c_name": "format_string('Customer#%09d', c_custkey)"},
}

# copied into the scaled tier VERBATIM: dimension catalogs whose realistic
# scaling mode is "unchanged while the fact side grows" (the gold IVM's
# genre dim is nation: genre ids are %25 mappings, unchanged under k-fold
# order keys)
VERBATIM_TABLES = ["nation", "region"]


def _replicate(
    spark: SparkSession, base_dir: str, out_dir: str, table: str, k: int
) -> None:
    from movie_genre_data_pipeline_spark.sources.batch import read_parquet

    id_cols, text_cols = TABLES[table]
    df = read_parquet(spark, f"{base_dir}/{table}.parquet")
    # one shared offset stride per table keeps FK pairs (customer/orders,
    # lineitem/supplier) consistent: both sides use the same max+1 per column
    strides = {
        c: df.agg(F.max(c)).collect()[0][0] + 1 for c in id_cols
    }
    parts = []
    for r in range(k):
        rep = df
        for c in id_cols:
            rep = rep.withColumn(c, F.col(c) + F.lit(r * strides[c]))
        for c, expr in REGEN_TEXT.get(table, {}).items():
            if r == 0:
                # replica 0 must BE the base tier: if the fixture ever stops
                # being dbgen-format ('Customer#%09d'), regeneration would
                # silently rewrite the base workload and the base-vs-scaled
                # comparison loses its identity baseline (ADVICE r11) — fail
                # loudly instead.
                n_diff = rep.filter(
                    ~F.expr(expr).eqNullSafe(F.col(c))
                ).count()
                if n_diff:
                    raise AssertionError(
                        f"{table}.{c}: REGEN_TEXT rule does not reproduce "
                        f"the base fixture ({n_diff} rows differ) — fixture "
                        "is not dbgen-format; update REGEN_TEXT"
                    )
                continue
            rep = rep.withColumn(c, F.expr(expr))
        for c in text_cols:
            if r > 0:  # replica 0 is the base text verbatim
                rep = rep.withColumn(
                    c,
                    F.array_join(
                        F.transform(
                            F.split(F.col(c), " "),
                            lambda w: F.concat(w, F.lit(f"·{r}")),
                        ),
                        " ",
                    ),
                )
        parts.append(rep)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(f"{out_dir}/{table}.parquet")


def _time_query(fn, spark: SparkSession, sf_dir: str) -> float:
    t0 = time.time()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 3)


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    base_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out_json = (
        sys.argv[3]
        if len(sys.argv) > 3
        else str(Path(__file__).resolve().parent.parent / "SCALE_BENCH.json")
    )
    scaled_dir = os.path.join("/tmp", f"mgdp_scale_x{k}")
    run_queries = SCALE_QUERIES
    if len(sys.argv) > 4:
        subset = sys.argv[4].split(",")
        unknown = sorted(set(subset) - set(SCALE_QUERIES))
        if unknown:
            raise SystemExit(f"not in SCALE_QUERIES: {unknown}")
        run_queries = subset

    from movie_genre_data_pipeline_spark.session import build_session
    from movie_genre_data_pipeline_spark.suite import all_queries

    spark = build_session(app_name="mgdp-scale-bench")
    specs = all_queries()

    shutil.rmtree(scaled_dir, ignore_errors=True)
    t0 = time.time()
    for table in TABLES:
        _replicate(spark, base_dir, scaled_dir, table, k)
    for table in VERBATIM_TABLES:
        src = Path(base_dir) / f"{table}.parquet"
        dst = Path(scaled_dir) / f"{table}.parquet"
        if src.is_dir():
            shutil.copytree(src, dst)
        else:
            shutil.copyfile(src, dst)
    gen_sec = round(time.time() - t0, 3)

    # warmup (JVM/codegen) before any timed run
    spark.read.parquet(f"{base_dir}/lineitem.parquet").groupBy(
        "l_returnflag"
    ).count().write.format("noop").mode("overwrite").save()

    # Drift control (VERDICT r9 #3 — bench.py got this in r9, the scale tier
    # didn't): a FIXED workload that never touches repo code or fixture
    # files. Each query's base/scaled pair is timed back-to-back, so the
    # RATIO is largely drift-immune within a run — the anchor's job is the
    # CROSS-ROUND comparison: divide round-over-round ratio movement by the
    # host's own movement before declaring a straggler real.
    def _drift_run() -> float:
        t0 = time.time()
        (
            spark.range(0, 20_000_000, 1, 32)
            .selectExpr("id % 1000 AS k", "id AS v")
            .groupBy("k")
            .sum("v")
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        return round(time.time() - t0, 3)

    drift_runs = [_drift_run() for _ in range(3)]
    drift_best = min(drift_runs)

    # Sampling discipline (r10): the anchor runs showed the host swinging
    # >2x between ADJACENT identical runs, which at best-of-2 moved
    # unchanged-code queries +-0.3 in k=4 ratio round-over-round. Three
    # samples per tier, INTERLEAVED base/scaled so a load spike lands on
    # both tiers of a pair instead of inflating one side's whole window;
    # raw samples are published so a reader can judge the noise floor
    # (sub-second queries' ratios are fixed-overhead + noise dominated —
    # the absolute times and the plan pins are the real signal there).
    results = {}
    for name in run_queries:
        fn = specs[name].fn
        base_runs, scaled_runs = [], []
        for _ in range(3):
            base_runs.append(_time_query(fn, spark, base_dir))
            scaled_runs.append(_time_query(fn, spark, scaled_dir))
        base, scaled = min(base_runs), min(scaled_runs)
        results[name] = {
            "base_sec": base,
            "scaled_sec": scaled,
            "ratio": round(scaled / base, 2) if base else None,
            "base_runs": base_runs,
            "scaled_runs": scaled_runs,
        }

    blob = {
        "metric": "scale_ratio",
        "k": k,
        "base": base_dir,
        "gen_sec": gen_sec,
        "queries": results,
        "drift_control": {
            "workload": "range20M-mod1000-hashagg",
            "runs": drift_runs,
            "best": drift_best,
        },
        "note": (
            "ratio ~= k means linear scaling; the paths are the "
            "scale-marketed bucketed/salted/sketched plans (VERDICT r05 #6) "
            "plus the r6 basket-mining fact-side growth"
        ),
    }
    # Spot tiers (VERDICT r11 #7): a subset run at a non-default k merges
    # under blob["spot_tiers"]["k{k}"] instead of replacing the full-roster
    # k=4 blob — the main section stays the one-quiet-run coherent dataset,
    # and the spot tier documents the super-linearity check at larger k
    # (no vs_prev: spot tiers are one-off probes, not round-over-round
    # anchors).
    if run_queries is not SCALE_QUERIES:
        # A subset run NEVER writes the main blob (r12 advice: with the file
        # absent it used to fall through and publish a partial roster as the
        # full dataset). Missing file → a spot_tiers-only skeleton; an
        # existing same-k tier is MERGED per-query (newest run wins per name)
        # so two subset probes at the same k accumulate instead of silently
        # overwriting each other.
        existing = {}
        if Path(out_json).exists():
            with open(out_json) as f:
                existing = json.load(f)
        tier = existing.setdefault("spot_tiers", {}).setdefault(
            f"k{k}", {"k": k, "queries": {}}
        )
        tier["queries"].update(results)
        tier["gen_sec"] = gen_sec
        tier["drift_control"] = blob["drift_control"]
        with open(out_json, "w") as f:
            json.dump(existing, f, indent=2)
        print(json.dumps(tier))
        return
    # a full-roster run replaces the main blob but must CARRY the standing
    # spot tiers (they are one-off probes at other k values, not superseded
    # by a k=4 refresh — dropping them silently erases the k16 evidence)
    if Path(out_json).exists():
        try:
            with open(out_json) as f:
                prev_blob = json.load(f)
            if "spot_tiers" in prev_blob:
                blob["spot_tiers"] = prev_blob["spot_tiers"]
        except (json.JSONDecodeError, OSError):
            pass
    # cross-round view: ratio deltas plus drift-normalized wall-time ratios
    # against the previous COMMITTED SCALE_BENCH.json (same contract as
    # BENCH_DETAIL's vs_prev): a uniform host slowdown reads as ~1.0
    # normalized for every query instead of masquerading as lost scaling.
    # The baseline comes from git HEAD, not the on-disk file (shared helper —
    # tools/bench_common.py; see its docstring for the r10 rationale).
    from tools.bench_common import committed_baseline

    rel = Path(out_json).resolve()
    repo_root = Path(__file__).resolve().parent.parent
    try:
        relpath = str(rel.relative_to(repo_root))
    except ValueError:
        relpath = str(rel)
    prev_text = committed_baseline(repo_root, relpath)
    if prev_text:
        try:
            prev = json.loads(prev_text)
            prev_q = prev.get("queries", {})
            prev_drift = prev.get("drift_control", {}).get("best")
            vs_prev: dict = {
                "ratio_delta": {
                    n: round(r["ratio"] - prev_q[n]["ratio"], 2)
                    for n, r in results.items()
                    if n in prev_q and prev_q[n].get("ratio")
                }
            }
            if prev_drift and prev.get("k") == k:
                drift_ratio = drift_best / prev_drift
                vs_prev["drift_ratio"] = round(drift_ratio, 3)
                vs_prev["normalized_time_ratios"] = {
                    n: {
                        "base": round(
                            (r["base_sec"] / prev_q[n]["base_sec"]) / drift_ratio, 3
                        ),
                        "scaled": round(
                            (r["scaled_sec"] / prev_q[n]["scaled_sec"])
                            / drift_ratio,
                            3,
                        ),
                    }
                    for n, r in results.items()
                    if n in prev_q
                    and prev_q[n].get("base_sec")
                    and prev_q[n].get("scaled_sec")
                }
            blob["vs_prev"] = vs_prev
        except (json.JSONDecodeError, OSError, KeyError, ZeroDivisionError):
            pass
    with open(out_json, "w") as f:
        json.dump(blob, f, indent=2)
    print(json.dumps(blob))


if __name__ == "__main__":
    main()
