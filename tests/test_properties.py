"""Property-based tests (hypothesis) for the invariants the reference never wrote
down (SURVEY.md §5: the test strategy is reconstructed, so pin the algebraic laws,
not just examples). Each property runs few examples on tiny DataFrames — the laws,
not the scale, are under test here.
"""

from __future__ import annotations

import math

import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from movie_genre_data_pipeline_spark.functions.dedup import (
    exact_dedup,
    minhash_signature_table,
    simhash,
)
from movie_genre_data_pipeline_spark.functions.similarity import cosine
from movie_genre_data_pipeline_spark.operators.cleanse import quarantine_split
from movie_genre_data_pipeline_spark.operators.upsert import (
    upsert_insert_missing,
    upsert_update,
)

# Example budget (r16, VERDICT r15 #1): the sweeps' aggregate runtime
# blew the driver's pytest wall-clock budget at max_examples=6-8. The
# DEFAULT run keeps every law executing but at 1 example (a smoke of
# the sweep); the round-close slow pass re-runs the full sweep with
# MGDP_HYPO_EXAMPLES restored (committed log).
FAST = settings(
    max_examples=int(os.environ.get("MGDP_HYPO_EXAMPLES", "1")),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

texts = st.text(
    alphabet=st.sampled_from("ab c\tD!"), min_size=0, max_size=30
)


# -- exact dedup: keep-lowest-id, idempotence ---------------------------------------
@FAST
@given(rows=st.lists(st.tuples(st.integers(0, 50), texts), min_size=1, max_size=20))
def test_exact_dedup_laws(spark, rows):
    # unique ids: hypothesis may repeat, make them unique by position
    rows = [(i, t) for i, (_, t) in enumerate(rows)]
    df = spark.createDataFrame(rows, "id long, text string")
    out = exact_dedup(df, "id", "text").collect()
    # keep-lowest-id per normalized fingerprint, computed independently in Python
    import hashlib
    import re

    def fp(t):
        # mirror functions/text.normalize_text exactly: Spark/DuckDB trim()
        # strips SPACES only (not \t), then lower, then \s+ collapse
        return hashlib.md5(
            re.sub(r"\s+", " ", t.strip(" ").lower()).encode()
        ).hexdigest()

    expected = {}
    for i, t in rows:
        k = fp(t)
        if k not in expected or i < expected[k]:
            expected[k] = i
    assert sorted(r.id for r in out) == sorted(expected.values())
    # idempotence: dedup(dedup(x)) == dedup(x)
    again = exact_dedup(
        spark.createDataFrame([(r.id, r.text) for r in out], "id long, text string"),
        "id",
        "text",
    ).collect()
    assert sorted(r.id for r in again) == sorted(r.id for r in out)


# -- quarantine split: partition of distinct input -----------------------------------
@FAST
@given(
    vals=st.lists(
        st.integers(-100, 100).filter(lambda v: v is not None),
        min_size=1,
        max_size=30,
    )
)
def test_quarantine_split_partitions_input(spark, vals):
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    clean, quarantined = quarantine_split(df, F.col("x") >= 0)
    c = sorted(r.x for r in clean.collect())
    q = sorted(r.x for r in quarantined.collect())
    assert set(c) | set(q) == set(vals)  # union == distinct input
    assert not (set(c) & set(q))  # disjoint
    assert all(v >= 0 for v in c) and all(v < 0 for v in q)


# -- upsert_update: J1 (whenMatchedUpdate-only) laws ----------------------------------
@FAST
@given(
    tgt=st.lists(st.tuples(st.integers(0, 9), st.integers(0, 99)), min_size=1, max_size=10),
    src=st.lists(st.integers(0, 12), min_size=0, max_size=8, unique=True),
)
def test_upsert_update_laws(spark, tgt, src):
    tgt = [(i, v) for i, (_, v) in enumerate(tgt)]  # unique target keys
    target = spark.createDataFrame(tgt, "k long, v long")
    source = spark.createDataFrame(
        [(k, 1000 + k) for k in src], "k long, nv long"
    )
    out = {r.k: r.v for r in upsert_update(
        target, source, "k", {"v": "nv"}
    ).collect()}
    assert len(out) == len(tgt)  # row count preserved
    for k, v in tgt:
        assert out[k] == (1000 + k if k in src else v)


# -- upsert_insert_missing: J2 (anti-join delta) laws ---------------------------------
@FAST
@given(
    tgt_keys=st.lists(st.integers(0, 15), min_size=0, max_size=10, unique=True),
    src_keys=st.lists(st.integers(0, 15), min_size=0, max_size=10, unique=True),
)
def test_upsert_insert_missing_laws(spark, tgt_keys, src_keys):
    target = spark.createDataFrame([(k, 0) for k in tgt_keys] or [], "k long, v long")
    source = spark.createDataFrame([(k, 1) for k in src_keys] or [], "k long, v long")
    delta = sorted(r.k for r in upsert_insert_missing(target, source, "k").collect())
    assert delta == sorted(set(src_keys) - set(tgt_keys))


# -- simhash: range + word-order invariance ------------------------------------------
@FAST
@given(words=st.lists(st.sampled_from(["ab", "cd", "ef", "gh"]), min_size=0, max_size=12))
def test_simhash_range_and_order_invariance(spark, words):
    bits = 16
    fwd = " ".join(words)
    rev = " ".join(reversed(words))
    df = spark.createDataFrame([(1, fwd), (2, rev)], "id long, text string")
    out = {r.doc: r.simhash for r in simhash(df, "id", "text", bits=bits).collect()}
    assert 0 <= out[1] < 2**bits
    # simhash sums over the token multiset; order can't matter
    assert out[1] == out[2]


# -- minhash: equal texts → equal signatures, signature length fixed -------------------
@FAST
@given(t=texts.filter(lambda s: len(s.split()) >= 3))
def test_minhash_signature_laws(spark, t):
    df = spark.createDataFrame([(1, t), (2, t)], "id long, text string")
    rows = minhash_signature_table(df, "id", "text", num_hashes=6, k=3).collect()
    sigs = {r["doc"]: tuple(r[f"m{i}"] for i in range(6)) for r in rows}
    assert sigs[1] == sigs[2]
    assert len(sigs[1]) == 6


# -- asof_join: equals the brute-force most-recent-prior lookup -----------------------
@FAST
@given(
    lefts=st.lists(st.tuples(st.integers(0, 2), st.integers(0, 100)), min_size=1, max_size=12),
    rights=st.lists(st.tuples(st.integers(0, 2), st.integers(0, 100), st.integers(0, 9)),
                    min_size=0, max_size=12),
)
def test_asof_join_matches_bruteforce(spark, lefts, rights):
    from movie_genre_data_pipeline_spark.operators.asof import asof_join

    # unique (key, t) on the right so the expected match is unambiguous
    rights = list({(k, t): v for k, t, v in rights}.items())
    rights = [(k, t, v) for (k, t), v in rights]
    left = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(lefts)], "k long, t long, lid long"
    )
    right = spark.createDataFrame(rights or [], "k long, t long, v long")
    got = {
        r.lid: r.v_asof
        for r in asof_join(left, right, "k", left_ts="t", right_ts="t",
                           right_cols=["v"]).collect()
    }
    for i, (k, t) in enumerate(lefts):
        prior = [(rt, v) for rk, rt, v in rights if rk == k and rt <= t]
        expected = max(prior)[1] if prior else None
        assert got[i] == expected, (i, k, t, prior)


# -- interval_join: equals the brute-force range filter --------------------------------
@FAST
@given(
    points=st.lists(st.tuples(st.integers(0, 2), st.integers(0, 10_000)),
                    min_size=1, max_size=10),
    ivs=st.lists(st.tuples(st.integers(0, 2), st.integers(0, 10_000), st.integers(0, 5_000)),
                 min_size=0, max_size=10),
)
def test_interval_join_matches_bruteforce(spark, points, ivs):
    from pyspark.sql import functions as F2

    from movie_genre_data_pipeline_spark.operators.interval import interval_join

    # seconds → timestamps; intervals are [start, start+len]
    p = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(points)], "k long, tsec long, pid long"
    ).select("k", F2.timestamp_seconds("tsec").alias("pt"), "pid")
    iv = spark.createDataFrame(
        [(k, s, s + ln, j) for j, (k, s, ln) in enumerate(ivs)] or [],
        "k long, ssec long, esec long, ivid long",
    ).select(
        "k",
        F2.timestamp_seconds("ssec").alias("istart"),
        F2.timestamp_seconds("esec").alias("iend"),
        "ivid",
    )
    got = sorted(
        (r.pid, r.ivid)
        for r in interval_join(
            p, iv, ["k"], "pt", "istart", "iend", granularity_ms=7_000
        ).collect()
    )
    expected = sorted(
        (i, j)
        for i, (pk, t) in enumerate(points)
        for j, (ik, s, ln) in enumerate(ivs)
        if pk == ik and s <= t <= s + ln
    )
    assert got == expected


# -- duplicate_clusters: matches union-find on random graphs ---------------------------
@FAST
@given(
    n=st.integers(1, 12),
    edges=st.lists(st.tuples(st.integers(0, 11), st.integers(0, 11)), max_size=15),
)
def test_duplicate_clusters_matches_union_find(spark, n, edges):
    from movie_genre_data_pipeline_spark.functions.dedup import duplicate_clusters

    edges = [(min(a, b), max(a, b)) for a, b in edges if a != b and a < n and b < n]
    docs = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    pairs = spark.createDataFrame(edges or [], "id_a long, id_b long")
    got = {
        r.doc_id: r.cluster_id
        for r in duplicate_clusters(docs, pairs, "doc_id").collect()
    }

    # reference model: union-find with min-label canonicalization
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {i: find(i) for i in range(n)}
    assert got == expected


# -- salted_agg: identical to single-stage aggregation ---------------------------------
@FAST
@given(
    rows=st.lists(st.tuples(st.integers(0, 2), st.integers(-50, 50)),
                  min_size=1, max_size=30)
)
def test_salted_agg_equals_plain_agg(spark, rows):
    from movie_genre_data_pipeline_spark.operators.skew import salted_agg

    df = spark.createDataFrame(rows, "k long, v long")
    got = {
        r.k: (r.n_rows, r.total, r.minimum, r.maximum, r.mean)
        for r in salted_agg(df, ["k"], "v", n_salts=4).collect()
    }
    from collections import defaultdict

    groups = defaultdict(list)
    for k, v in rows:
        groups[k].append(v)
    for k, vs in groups.items():
        n, tot = len(vs), sum(vs)
        assert got[k] == (n, tot, min(vs), max(vs), tot / n)


# -- cosine: self-similarity == 1 for non-zero vectors ---------------------------------
@FAST
@given(
    v=st.lists(
        st.floats(-10, 10, allow_nan=False).filter(lambda x: abs(x) > 1e-3),
        min_size=2,
        max_size=8,
    )
)
def test_cosine_self_is_one(spark, v):
    df = spark.createDataFrame([(v,)], "v array<double>")
    got = df.select(cosine(F.col("v"), F.col("v")).alias("c")).collect()[0].c
    assert math.isclose(got, 1.0, rel_tol=1e-9)


# -- chunking: coverage / containment laws (r2) -------------------------------------
@FAST
@given(
    n_tokens=st.integers(1, 120),
    window=st.integers(1, 40),
    overlap=st.integers(0, 39),
)
def test_chunking_laws(spark, n_tokens, window, overlap):
    """For any (n, W, S) with 0 < S <= W: chunks cover [1, n] exactly, every
    chunk has 1..W tokens, chunk_starts strictly increase by S, and no chunk is
    fully contained in its predecessor (the tail-drop rule)."""
    from movie_genre_data_pipeline_spark.functions.curation import chunk_documents

    stride = max(1, window - min(overlap, window - 1))
    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(n_tokens)))], "doc_id long, text string"
    )
    rows = sorted(
        chunk_documents(df, "doc_id", "text", window, stride).collect(),
        key=lambda r: r.chunk_start,
    )
    assert rows, (n_tokens, window, stride)
    covered = set()
    prev_end = 0
    for r in rows:
        end = r.chunk_start + r.n_chunk_tokens - 1
        assert 1 <= r.n_chunk_tokens <= window
        assert end > prev_end  # strictly new content (no contained tails)
        covered |= set(range(r.chunk_start, end + 1))
        prev_end = end
    assert covered == set(range(1, n_tokens + 1))


# -- quantization: codes bounded, reconstruction error bounded ----------------------
@FAST
@given(
    vec=st.lists(
        st.floats(-100, 100, allow_nan=False, width=32), min_size=1, max_size=16
    )
)
def test_quantize_laws(spark, vec):
    from movie_genre_data_pipeline_spark.functions.similarity import quantize_int8

    df = spark.createDataFrame([(1, vec)], "vec_id long, embedding array<double>")
    row = quantize_int8(df, "vec_id", "embedding").collect()[0]
    mn, mx = min(vec), max(vec)
    # mean abs reconstruction error is bounded by half a quantization step
    step = (mx - mn) / 254 if mx > mn else 0.0
    assert row.mean_abs_err <= step / 2 + 1e-6


# -- upsert NULL semantics: the Delta-MERGE contract edge cases (VERDICT r01 #7) ----
def test_upsert_update_null_key_and_null_value(spark):
    """Pin the emulation contract vs Delta MERGE: (a) NULL join keys match via
    eqNullSafe (Delta's <=> semantics for a NULL-keyed match), (b) a matched row
    whose source set-value is NULL takes NULL (whenMatchedUpdate writes the
    source value verbatim — the r2 marker-join fix; a coalesce-based emulation
    would wrongly keep the target value)."""
    target = spark.createDataFrame(
        [(1, 10), (None, 20), (3, 30)], "k long, v long"
    )
    source = spark.createDataFrame(
        [(None, 99), (3, None)], "k long, nv long"
    )
    out = {r.k: r.v for r in upsert_update(
        target, source, "k", {"v": "nv"}
    ).collect()}
    assert out[1] == 10           # unmatched row untouched
    assert out[None] == 99        # NULL key matched null-safely
    assert out[3] is None         # NULL source value overwrites (Delta-exact)


# -- r4 sketch merge laws: order/partition-free algebra ------------------------------
@FAST
@given(
    a=st.lists(st.integers(0, 200), min_size=0, max_size=30),
    b=st.lists(st.integers(0, 200), min_size=0, max_size=30),
)
def test_hll_register_merge_law(spark, a, b):
    """registers(A ∪ B) == merge(registers(A), registers(B)) for arbitrary
    overlapping multisets — the union/re-max algebra hll.py promises."""
    from movie_genre_data_pipeline_spark.functions.hll import hll_registers

    if not a and not b:
        return
    mk = lambda xs: spark.createDataFrame(
        [(str(x),) for x in xs], "key string"
    ).withColumn("grp", F.lit("g"))
    union_df = mk(a + b)
    direct = hll_registers(union_df, "key", ["grp"]).collect()
    parts = [mk(xs) for xs in (a, b) if xs]
    merged_df = parts[0] if len(parts) == 1 else None
    if merged_df is not None:
        merged = hll_registers(merged_df, "key", ["grp"]).collect()
    else:
        merged = (
            hll_registers(parts[0], "key", ["grp"])
            .unionByName(hll_registers(parts[1], "key", ["grp"]))
            .groupBy("grp", "bucket")
            .agg(F.max("rho").alias("rho"))
            .collect()
        )
    assert sorted(map(tuple, direct)) == sorted(map(tuple, merged))


@FAST
@given(
    a=st.lists(st.integers(0, 500), min_size=0, max_size=40),
    b=st.lists(st.integers(0, 500), min_size=0, max_size=40),
    k=st.sampled_from([2, 5, 16]),
)
def test_kmv_sketch_merge_law(spark, a, b, k):
    """sketch_k(A ∪ B) == bottom-k(sketch_k(A) ∪ sketch_k(B)) — including when
    either side is smaller than k."""
    from pyspark.sql import Window

    from movie_genre_data_pipeline_spark.functions.kmv import kmv_sketch

    if not a and not b:
        return
    mk = lambda xs: spark.createDataFrame(
        [(str(x),) for x in xs], "key string"
    ).withColumn("grp", F.lit("g"))
    direct = kmv_sketch(mk(a + b), "key", ["grp"], k=k).collect()
    parts = [kmv_sketch(mk(xs), "key", ["grp"], k=k) for xs in (a, b) if xs]
    u = parts[0] if len(parts) == 1 else parts[0].unionByName(parts[1])
    w = Window.partitionBy("grp").orderBy(F.col("h48").asc())
    merged = (
        u.distinct()
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
        .collect()
    )
    assert sorted(map(tuple, direct)) == sorted(map(tuple, merged))


@FAST
@given(
    a=st.lists(
        st.floats(-50.0, 150.0, allow_nan=False, allow_infinity=False),
        min_size=0,
        max_size=30,
    ),
    b=st.lists(
        st.floats(-50.0, 150.0, allow_nan=False, allow_infinity=False),
        min_size=0,
        max_size=30,
    ),
)
def test_histogram_merge_law(spark, a, b):
    """hist(A ∪ B) == cellwise-sum(hist(A), hist(B)), out-of-range clamping
    included."""
    from movie_genre_data_pipeline_spark.functions.quantiles import build_histogram

    if not a and not b:
        return
    mk = lambda xs: spark.createDataFrame([(float(x),) for x in xs], "v double")
    direct = build_histogram(mk(a + b), "v", 0.0, 100.0, 10).collect()
    parts = [build_histogram(mk(xs), "v", 0.0, 100.0, 10) for xs in (a, b) if xs]
    u = parts[0] if len(parts) == 1 else parts[0].unionByName(parts[1])
    merged = (
        u.groupBy("bin").agg(F.sum("cnt").cast("bigint").alias("cnt")).collect()
    )
    assert sorted(map(tuple, direct)) == sorted(map(tuple, merged))


@FAST
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 5), st.integers(1, 100)),
        min_size=1,
        max_size=25,
    ),
    k=st.sampled_from([1, 3]),
)
def test_priority_sample_matches_python_reference(spark, rows, k):
    """priority_sample == a Python reimplementation of Duffield priorities —
    same u derivation, same top-k per stratum, same tie-break."""
    import hashlib

    from movie_genre_data_pipeline_spark.functions.sampling import priority_sample

    data = [(i, s, w) for i, (s, w) in enumerate(rows)]
    df = spark.createDataFrame(data, "id long, stratum int, w long")
    got = sorted(
        (r["stratum"], r["id"])
        for r in priority_sample(df, "id", "w", k, strata_col="stratum").collect()
    )

    def u(i):
        h = hashlib.md5(f"{i}:priority".encode()).hexdigest()[:12]
        return (int(h, 16) + 1) / float(1 << 48)

    expect = []
    by_s = {}
    for i, s, w in data:
        by_s.setdefault(s, []).append((w / u(i), -i))
    for s, items in by_s.items():
        for _, negi in sorted(items, reverse=True)[:k]:
            expect.append((s, -negi))
    assert got == sorted(expect)


# -- SCD2: pure-function-of-union, split-invariance, re-delivery idempotence --------
@FAST
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 6), st.integers(0, 2)),
        min_size=1,
        max_size=18,
    ),
    split=st.integers(0, 18),
)
def test_scd2_laws(spark, rows, split):
    """scd2_apply == a Python reimplementation (sort by (eff_from, attr),
    collapse consecutive identical attrs, eff_to = next eff_from); the result
    is a pure function of current ∪ updates (any current/updates split of the
    same rows gives the identical history — out-of-order delivery included);
    and re-delivering every update over the produced history is a no-op."""
    from movie_genre_data_pipeline_spark.operators.scd import scd2_apply

    data = sorted({(k, f"v{a}", f) for (k, f, a) in rows})  # dedup true dups
    schema = "k long, attr string, eff_from long"
    split = min(split, len(data))
    cur = spark.createDataFrame(data[:split], schema)
    upd = spark.createDataFrame(data[split:], schema)
    got = sorted(
        (r.k, r.attr, r.eff_from, r.eff_to, r.is_current)
        for r in scd2_apply(cur, upd, ["k"], ["attr"]).collect()
    )

    # python mirror
    byk = {}
    for k, a, f in data:
        byk.setdefault(k, []).append((f, a))
    expect = []
    for k, items in byk.items():
        items.sort()
        versions = []
        for f, a in items:
            if versions and versions[-1][1] == a:
                continue
            versions.append((f, a))
        for i, (f, a) in enumerate(versions):
            eff_to = versions[i + 1][0] if i + 1 < len(versions) else None
            expect.append((k, a, f, eff_to, eff_to is None))
    assert got == sorted(expect)

    # split-invariance: all rows as updates over an empty current
    empty = spark.createDataFrame([], schema)
    alt = sorted(
        (r.k, r.attr, r.eff_from, r.eff_to, r.is_current)
        for r in scd2_apply(empty, spark.createDataFrame(data, schema), ["k"], ["attr"]).collect()
    )
    assert alt == got

    # re-delivery idempotence: history ∪ the same updates re-applied == history
    hist = scd2_apply(cur, upd, ["k"], ["attr"]).select("k", "attr", "eff_from")
    redo = sorted(
        (r.k, r.attr, r.eff_from, r.eff_to, r.is_current)
        for r in scd2_apply(hist, upd, ["k"], ["attr"]).collect()
    )
    assert redo == got


# -- winnowing: the Schleimer/Wilkerson/Aiken shared-run guarantee -------------------
@FAST
@given(
    pre_a=st.lists(st.sampled_from("aa bb cc dd ee".split()), max_size=8),
    suf_a=st.lists(st.sampled_from("aa bb cc dd ee".split()), max_size=8),
    pre_b=st.lists(st.sampled_from("ff gg hh ii jj".split()), max_size=8),
    suf_b=st.lists(st.sampled_from("ff gg hh ii jj".split()), max_size=8),
    run=st.lists(st.sampled_from("pp qq rr ss tt uu".split()), min_size=6, max_size=6),
)
def test_winnow_shared_run_guarantee(spark, pre_a, suf_a, pre_b, suf_b, run):
    """Any shared contiguous run of >= w+k-1 tokens (= 6 for k=3, w=4), at ANY
    position in each document and with ANY surrounding tokens, forces at least
    one shared selected fingerprint: the run contains one full window of w
    shared grams, and every full window's minimum is selected in both docs."""
    from movie_genre_data_pipeline_spark.functions.text import winnow_fingerprints

    doc_a = " ".join(pre_a + run + suf_a)
    doc_b = " ".join(pre_b + run + suf_b)
    df = spark.createDataFrame([(1, doc_a), (2, doc_b)], "doc_id long, text string")
    fps = winnow_fingerprints(df, "doc_id", "text", k=3, w=4).collect()
    set_a = {r.h48 for r in fps if r.doc == 1}
    set_b = {r.h48 for r in fps if r.doc == 2}
    assert set_a & set_b, (doc_a, doc_b)


# -- r5 laws: snapshot diff, pagerank, hash embeddings ------------------------------
@FAST
@given(
    old_rows=st.lists(
        st.tuples(st.integers(0, 12), st.sampled_from("abc"), st.integers(0, 3)),
        max_size=10,
        unique_by=lambda r: r[0],
    ),
    new_rows=st.lists(
        st.tuples(st.integers(0, 12), st.sampled_from("abc"), st.integers(0, 3)),
        max_size=10,
        unique_by=lambda r: r[0],
    ),
)
def test_snapshot_diff_reconstructs_new(spark, old_rows, new_rows):
    """old + diff ≡ new: applying the classified change feed to the old
    snapshot (insert inserted, replace updated, drop deleted) must
    reconstruct the new snapshot exactly — the CDC soundness law."""
    from movie_genre_data_pipeline_spark.operators.cdc import snapshot_diff

    old = spark.createDataFrame(old_rows, "k long, s string, v long") if old_rows else \
        spark.createDataFrame([], "k long, s string, v long")
    new = spark.createDataFrame(new_rows, "k long, s string, v long") if new_rows else \
        spark.createDataFrame([], "k long, s string, v long")
    diff = snapshot_diff(old, new, ["k"], ["s", "v"]).collect()
    old_map = {r[0]: (r[1], r[2]) for r in old_rows}
    rebuilt = dict(old_map)
    for r in diff:
        if r["change_type"] == "deleted":
            rebuilt.pop(r["k"])
        elif r["change_type"] in ("inserted", "updated"):
            rebuilt[r["k"]] = (r["new_s"], r["new_v"])
        else:
            assert rebuilt[r["k"]] == (r["new_s"], r["new_v"])
    assert rebuilt == {r[0]: (r[1], r[2]) for r in new_rows}
    # every key present in either snapshot is classified exactly once
    assert len(diff) == len(old_map.keys() | rebuilt.keys() | {r[0] for r in new_rows})


@FAST
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 6), st.integers(0, 6)).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=15,
        unique=True,
    ),
    shift=st.integers(1, 100),
)
def test_pagerank_relabel_invariance_and_mass_bound(spark, edges, shift):
    """Rank is a function of structure, not labels: shifting every node id by a
    constant permutes nothing structurally, so the rank_fp multiset must be
    identical. And dropped dangling mass means total rank never exceeds scale."""
    from movie_genre_data_pipeline_spark.functions.graph import pagerank_fixed_point

    e1 = spark.createDataFrame(edges, "src long, dst long")
    e2 = spark.createDataFrame(
        [(a + shift, b + shift) for a, b in edges], "src long, dst long"
    )
    r1 = {r["node"]: r["rank_fp"] for r in pagerank_fixed_point(e1, iterations=3).collect()}
    r2 = {r["node"]: r["rank_fp"] for r in pagerank_fixed_point(e2, iterations=3).collect()}
    assert {k + shift: v for k, v in r1.items()} == r2
    assert sum(r1.values()) <= 1e12


@FAST
@given(
    docs=st.lists(
        st.tuples(st.integers(0, 20), texts), max_size=8, unique_by=lambda r: r[0]
    )
)
def test_hash_embed_mass_laws(spark, docs):
    """Σ|v| ≤ n_tokens with equal parity (each token contributes ±1 to one
    bucket), and Σv = Σ signs — the conservation laws of the hashing trick."""
    from movie_genre_data_pipeline_spark.functions.text import hash_embed, tokens

    df = spark.createDataFrame(docs, "doc_id long, text string") if docs else \
        spark.createDataFrame([], "doc_id long, text string")
    vecs = {r["doc"]: list(r["vec"]) for r in hash_embed(df, "doc_id", "text", 16).collect()}
    ntoks = {
        r["doc_id"]: r["n"]
        for r in df.select("doc_id", F.size(tokens("text")).alias("n")).collect()
    }
    for doc, vec in vecs.items():
        n = ntoks[doc]
        assert n > 0  # tokenless docs must not produce a row
        l1 = sum(abs(v) for v in vec)
        assert l1 <= n and (n - l1) % 2 == 0
    for doc_id, n in ntoks.items():
        assert (doc_id in vecs) == (n > 0)


# -- r6 laws: fingerprint combinability, drift stat bounds --------------------------
@FAST
@given(
    rows_a=st.lists(texts, min_size=0, max_size=12),
    rows_b=st.lists(texts, min_size=0, max_size=12),
)
def test_fingerprint_modular_combinability(spark, rows_a, rows_b):
    """fp(A ∪ B) == (fp(A) + fp(B)) mod p — the law that lets shards
    fingerprint independently and combine; and the empty set is identity 0."""
    from movie_genre_data_pipeline_spark.operators.observe import dataset_fingerprint

    P = 2_147_483_647
    schema = "v string"

    def fp(rows):
        df = spark.createDataFrame([(r,) for r in rows], schema)
        got = dataset_fingerprint(df, ["v"]).collect()[0]
        return got["n_rows"], (got["content_hash"] or 0)

    na, ha = fp(rows_a)
    nb, hb = fp(rows_b)
    nu, hu = fp(rows_a + rows_b)
    assert nu == na + nb
    assert hu == (ha + hb) % P


@FAST
@given(
    vals_a=st.lists(st.floats(-50, 150, allow_nan=False), min_size=1, max_size=25),
    vals_b=st.lists(st.floats(-50, 150, allow_nan=False), min_size=1, max_size=25),
)
def test_histogram_drift_stat_bounds(spark, vals_a, vals_b):
    """TVD total in [0,1], KS terms in [0,1], per-bin proportions sum to 1 on
    each side (clamping loses no rows), chi2 terms non-negative."""
    from movie_genre_data_pipeline_spark.operators.quality import histogram_drift

    a = spark.createDataFrame([(float(v),) for v in vals_a], "x double")
    b = spark.createDataFrame([(float(v),) for v in vals_b], "x double")
    rows = histogram_drift(a, b, "x", 0.0, 20.0, 5).collect()
    assert sum(r["n_old"] for r in rows) == len(vals_a)
    assert sum(r["n_new"] for r in rows) == len(vals_b)
    tvd = sum(r["tvd_term"] for r in rows)
    # tvd_term is deliberately ROUND(·, 6)-quantized per bin (the portable-
    # rounding rule), so the mathematical [0,1] bound holds up to one half
    # unit in the last place PER BIN — n_bins·5e-7, not float epsilon
    # (hypothesis found the exact case: disjoint snapshots, true TVD 1.0,
    # quantized terms summing to 1.000001).
    assert 0.0 <= tvd <= 1.0 + len(rows) * 5e-7
    for r in rows:
        assert 0.0 <= r["ks_cum"] <= 1.0 + 1e-9
        if r["chi2_term"] is not None:
            assert r["chi2_term"] >= 0.0


# -- association mining: lift symmetry, confidence bound, pair-volume law ------------
@FAST
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 6), st.sampled_from("ABCDE")),
        min_size=1,
        max_size=30,
    )
)
def test_mining_laws(spark, rows):
    from math import comb

    from movie_genre_data_pipeline_spark.functions.mining import (
        association_rules,
        basket_items,
        pair_supports,
    )

    df = spark.createDataFrame(rows, "basket long, item string")
    items = basket_items(df, "basket", "item")
    pairs = pair_supports(items)
    # pair volume == Σ_baskets C(k, 2) — presence semantics, never more
    sizes = {r.basket: r["count"] for r in items.groupBy("basket").count().collect()}
    total = sum(r.pair_support for r in pairs.collect())
    assert total == sum(comb(k, 2) for k in sizes.values())
    rules = {
        (r.antecedent, r.consequent): r for r in association_rules(items).collect()
    }
    # every rule appears in both directions with symmetric lift and bounded
    # confidence (supp(ab) <= supp(a) by set inclusion)
    for (a, b), r in rules.items():
        assert (b, a) in rules
        assert r.lift == rules[(b, a)].lift
        assert 0.0 < r.confidence <= 1.0


# -- ER candidate algebra: best match is drawn from candidates, one per record ------
@FAST
@given(
    names=st.lists(
        st.text(alphabet=st.sampled_from("abc "), min_size=1, max_size=8),
        min_size=1,
        max_size=12,
    )
)
def test_er_best_match_within_candidates(spark, names):
    from movie_genre_data_pipeline_spark.functions.entity import (
        best_match,
        blocked_candidate_pairs,
        score_pairs,
    )

    left = spark.createDataFrame(
        [(i, n) for i, n in enumerate(names)], "lid long, name string"
    )
    right = spark.createDataFrame(
        [(i + 1000, n) for i, n in enumerate(names)], "rid long, name string"
    )
    lk = left.withColumn("k", F.substring("name", 1, 1))
    rk = right.withColumn("k", F.substring("name", 1, 1))
    cand = blocked_candidate_pairs(lk, rk, "lid", "rid", [("k", "k")])
    cand_set = {(r.lid, r.rid) for r in cand.collect()}
    scored = score_pairs(
        cand.join(left, "lid").join(
            right.withColumnRenamed("name", "rname"), "rid"
        ),
        "name",
        "rname",
    )
    best = best_match(
        scored, "lid", [F.col("lev").asc(), F.col("rid").asc()]
    ).collect()
    assert len(best) == len({r.lid for r in best})  # ≤ one match per record
    assert all((r.lid, r.rid) in cand_set for r in best)
    # a record whose own name exists on the right always resolves at lev 0
    # (its identical twin shares the first-char block, so it IS a candidate)
    right_names = set(names)
    for r in best:
        if names[r.lid] in right_names:
            assert r.lev == 0


# -- compaction plan: bin boundaries follow the exclusive-prefix law ----------------
@FAST
@given(
    sizes=st.lists(st.integers(1, 500), min_size=1, max_size=25),
    target=st.integers(100, 1000),
)
def test_compaction_bin_law(spark, sizes, target):
    from movie_genre_data_pipeline_spark.operators.compact import (
        plan_compaction_bins,
    )

    manifest = spark.createDataFrame(
        [(i, s) for i, s in enumerate(sizes)], "fid long, size long"
    )
    plan = sorted(
        plan_compaction_bins(manifest, "size", "fid", target).collect(),
        key=lambda r: r.bin_id,
    )
    # replay the law in python
    import itertools

    prev = [0] + list(itertools.accumulate(sizes))[:-1]
    expect_bin = [p // target for p in prev]
    # bins account for every file, bytes conserved, spans contiguous
    assert sum(r.n_files for r in plan) == len(sizes)
    assert sum(r.bin_bytes for r in plan) == sum(sizes)
    got = {r.bin_id: r for r in plan}
    for b in set(expect_bin):
        members = [i for i, e in enumerate(expect_bin) if e == b]
        assert got[b].n_files == len(members)
        assert got[b].first_file == min(members)
        assert got[b].last_file == max(members)


# -- join-view IVM: incremental == from-scratch rebuild --------------------------------
@FAST
@given(
    facts=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 6), st.integers(1, 99)),
        min_size=0, max_size=15,
    ),
    up_keys=st.lists(st.integers(0, 30), max_size=5, unique=True),
    del_keys=st.lists(st.integers(0, 30), max_size=5, unique=True),
    moved=st.lists(st.integers(0, 6), max_size=3, unique=True),
)
def test_join_view_ivm_equals_rebuild(spark, facts, up_keys, del_keys, moved):
    from movie_genre_data_pipeline_spark.operators.cdc import maintain_join_view

    facts = {k: (d, p) for k, d, p in facts}  # unique fact keys
    up_keys = [k for k in up_keys if k in facts and k not in del_keys]
    dim_rows = [(d, f"seg{d}") for d in range(7)]
    fact_df = spark.createDataFrame(
        [(k, d, p) for k, (d, p) in facts.items()] or [],
        "fk long, dk long, cents long",
    )
    dim = spark.createDataFrame(dim_rows, "dk long, seg string")
    view = fact_df.join(dim, "dk").select("fk", "dk", "cents", "seg")
    upserts = spark.createDataFrame(
        [(k, facts[k][0], facts[k][1] * 2) for k in up_keys] or [],
        "fk long, dk long, cents long",
    )
    deletes = spark.createDataFrame([(k,) for k in del_keys] or [], "fk long")
    dim_updates = spark.createDataFrame(
        [(d, "MOVED") for d in moved] or [], "dk long, seg string"
    )
    got = sorted(
        tuple(r) for r in maintain_join_view(
            view, "fk", "dk", upserts, deletes, dim, dim_updates
        ).collect()
    )
    want = sorted(
        (k, d, p * 2 if k in up_keys else p, "MOVED" if d in moved else f"seg{d}")
        for k, (d, p) in facts.items() if k not in del_keys
    )
    assert got == want


# -- r8 law: BPE merge induction replays classic greedy BPE exactly -----------------
@FAST
@given(docs=st.lists(texts, min_size=0, max_size=10))
def test_bpe_merges_match_python_reference(spark, docs):
    """The distributed BPE trainer (pair-count over word types -> broadcast
    winner -> greedy scan-local fold) must replay classic single-machine BPE
    (Sennrich ACL'16) bit-for-bit: same winners, same counts, same trajectory
    -- including symbol-run overlaps ("aaaa" + rule (a,a) -> [aa,aa]) and
    lexicographic tie-breaks."""
    import re as _re

    from movie_genre_data_pipeline_spark.functions.text import bpe_learn_merges

    words: dict[str, int] = {}
    for t in docs:
        for w in _re.split(r"[^a-z]+", t.lower()):
            if w:
                words[w] = words.get(w, 0) + 1
    syms = {w: list(w) for w in words}
    expect = []
    for t in range(1, 4):
        cnt: dict[tuple[str, str], int] = {}
        for w, f in words.items():
            s = syms[w]
            for i in range(len(s) - 1):
                cnt[(s[i], s[i + 1])] = cnt.get((s[i], s[i + 1]), 0) + f
        if not cnt:
            break
        (x, y), c = min(cnt.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        expect.append((t, x, y, c))
        for w in syms:
            s, ns, i = syms[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == x and s[i + 1] == y:
                    ns.append(x + y)
                    i += 2
                else:
                    ns.append(s[i])
                    i += 1
            syms[w] = ns

    df = (
        spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
        if docs
        else spark.createDataFrame([], "doc_id long, text string")
    )
    got = [
        (r["merge_rank"], r["left_sym"], r["right_sym"], r["pair_count"])
        for r in bpe_learn_merges(df, "doc_id", "text", 3)
        .orderBy("merge_rank")
        .collect()
    ]
    assert got == expect


def test_bpe_word_symbols_concatenation_invariant(spark):
    """Applying the learned merges never changes the text: every word type's
    symbol array concatenates back to the word, symbol counts only shrink as
    merges apply, and every learned merge is reflected (the top pair's two
    symbols appear fused somewhere)."""
    from pyspark.sql import functions as F

    from movie_genre_data_pipeline_spark.functions.text import bpe_word_symbols

    df = spark.createDataFrame(
        [(1, "the theme then there"), (2, "the other anthem the")],
        "doc_id bigint, text string",
    )
    syms = bpe_word_symbols(df, "text", n_merges=3).collect()
    assert len(syms) > 0
    for r in syms:
        assert "".join(r["s"]) == r["w"], r
        assert len(r["s"]) < len(r["w"]) or len(r["w"]) == 1, (
            "3 merges over 'th'-heavy text must compress every multi-char word"
        )
    assert any(len(sym) > 1 for r in syms for sym in r["s"])


@FAST
@given(
    counts=st.lists(st.integers(min_value=1, max_value=50), min_size=2, max_size=12)
)
def test_entropy_from_counts_matches_numpy_on_random_corpora(spark, counts):
    """r11: the diversity formulas under RANDOM count tables, not just the
    fixture — per-term micro-nat quantization must track numpy's entropy and
    the exact-rational Simpson within the quantization floor for any counts."""
    import numpy as np

    from movie_genre_data_pipeline_spark.suite.text_queries import (
        entropy_from_counts,
    )

    df = spark.createDataFrame(
        [(f"t{i}", int(c)) for i, c in enumerate(counts)], "term string, cnt long"
    )
    row = entropy_from_counts(df).collect()[0]
    a = np.array(counts, dtype=np.float64)
    T = a.sum()
    p = a / T
    H = float(-(p * np.log(p)).sum())
    simpson = float((a * (a - 1)).sum() / (T * (T - 1))) if T > 1 else 0.0
    assert row["n_types"] == len(counts) and row["n_tokens"] == int(T)
    assert math.isclose(row["entropy_micro"] / 1e6, H, abs_tol=5e-6)
    assert math.isclose(row["simpson_micro"] / 1e6, simpson, abs_tol=2e-6)


@FAST
@given(
    cells=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),
            st.integers(min_value=0, max_value=2),
            st.integers(min_value=1, max_value=40),
        ),
        min_size=1,
        max_size=9,
        unique_by=lambda t: (t[0], t[1]),
    )
)
def test_mutual_info_from_cells_matches_numpy_on_random_tables(spark, cells):
    """r11: MI under RANDOM contingency tables — the quantized engine-side MI
    and both entropies must track numpy for any joint distribution, and the
    information inequality 0 <= MI <= min(H) must hold up to quantization."""
    import numpy as np

    from movie_genre_data_pipeline_spark.suite.sampling_queries import (
        mutual_info_from_cells,
    )

    df = spark.createDataFrame(
        [(f"x{x}", f"y{y}", int(n)) for x, y, n in cells],
        "x string, y string, n_xy long",
    )
    row = mutual_info_from_cells(df).collect()[0]
    xs = sorted({c[0] for c in cells})
    ys = sorted({c[1] for c in cells})
    M = np.zeros((len(xs), len(ys)))
    for x, y, n in cells:
        M[xs.index(x), ys.index(y)] = n
    N = M.sum()
    p = M / N
    px, py = p.sum(axis=1), p.sum(axis=0)
    nz = p > 0
    mi = float((p[nz] * np.log(p[nz] / np.outer(px, py)[nz])).sum())
    hx = float(-(px[px > 0] * np.log(px[px > 0])).sum())
    hy = float(-(py[py > 0] * np.log(py[py > 0])).sum())
    assert row["n_rows"] == int(N)
    assert math.isclose(row["mi_micro"] / 1e6, mi, abs_tol=5e-6)
    assert math.isclose(row["h_x_micro"] / 1e6, hx, abs_tol=5e-6)
    assert math.isclose(row["h_y_micro"] / 1e6, hy, abs_tol=5e-6)
    assert -2 <= row["mi_micro"] <= min(row["h_x_micro"], row["h_y_micro"]) + 2


@FAST
@given(
    cells=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),
            st.integers(min_value=0, max_value=1),
            st.integers(min_value=0, max_value=3),
            st.integers(min_value=1, max_value=40),
        ),
        min_size=1,
        max_size=12,
        unique_by=lambda t: (t[0], t[1], t[2]),
    )
)
def test_t_closeness_from_cells_matches_numpy_on_random_tables(spark, cells):
    """r12: the EMD under RANDOM (QI, band) cell tables — the exact-integer
    prefix-sum formulation must track numpy's ordered-bin Wasserstein for any
    joint distribution (shared-string micro-unit bugs ship oracle-green, the
    r10 Zipf lesson), and the rollup's group/row accounting must be exact."""
    import numpy as np

    from movie_genre_data_pipeline_spark.suite.cdc_queries import (
        T_CLOSENESS_MICRO,
        t_closeness_from_cells,
    )

    df = spark.createDataFrame(
        [(nat, f"s{seg}", band, int(n)) for nat, seg, band, n in cells],
        "c_nationkey int, c_mktsegment string, bal_band long, n_cell long",
    )
    rows = {r["c_nationkey"]: r for r in t_closeness_from_cells(df).collect()}

    bands = sorted({c[2] for c in cells})
    m = len(bands)
    glob = np.array(
        [sum(n for *_k, b, n in cells if b == band) for band in bands],
        dtype=np.float64,
    )
    Q = glob / glob.sum()
    groups = sorted({(c[0], c[1]) for c in cells})
    per_nation: dict[int, list[tuple[int, int]]] = {}
    for nat, seg in groups:
        g = np.array(
            [
                sum(n for gn, gs, b, n in cells if (gn, gs, b) == (nat, seg, band))
                for band in bands
            ],
            dtype=np.float64,
        )
        g_rows = int(g.sum())
        emd = (
            float(np.abs(np.cumsum(g / g.sum() - Q)).sum() / (m - 1))
            if m > 1
            else 0.0
        )
        per_nation.setdefault(nat, []).append((g_rows, emd))
    for nat, members in per_nation.items():
        row = rows[nat]
        assert row["n_groups"] == len(members)
        assert row["n_rows"] == sum(g for g, _ in members)
        max_emd = max(e for _, e in members)
        assert math.isclose(row["max_emd_micro"] / 1e6, max_emd, abs_tol=2e-6)
        at_risk = [g for g, e in members if round(e * 1e6) > T_CLOSENESS_MICRO]
        # judge at-risk away from the threshold edge only (quantization can
        # flip a group sitting within 2 micro of T either way)
        if all(abs(e * 1e6 - T_CLOSENESS_MICRO) > 2 for _, e in members):
            assert row["groups_at_risk"] == len(at_risk)
            assert row["rows_at_risk"] == sum(at_risk)


@FAST
@given(
    docs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10_000),
            st.integers(min_value=0, max_value=1),
            st.integers(min_value=1, max_value=5_000),
        ),
        min_size=1,
        max_size=60,
        unique_by=lambda t: t[0],
    )
)
def test_priority_estimator_matches_hashlib_twin(spark, docs):
    """r12: the threshold estimator under RANDOM corpora — selection, tau,
    and every Horvitz-Thompson column must equal an independent pure-python
    implementation (hashlib md5 + floats), including the n <= k stratum edge
    where tau = 0 and the estimate degenerates to the exact total."""
    import hashlib

    from movie_genre_data_pipeline_spark.suite.sampling_queries import (
        PRIORITY_EST_K,
        priority_estimator_report,
    )

    df = spark.createDataFrame(
        [(f"l{lang}", int(d), int(n)) for d, lang, n in docs],
        "lang string, doc_id long, n_chars long",
    )
    totals = df.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )
    got = {r["lang"]: r for r in priority_estimator_report(df, totals).collect()}

    def prio(doc_id: int, w: int) -> float:
        h = hashlib.md5(f"{doc_id}:priority".encode()).hexdigest()[:12]
        return w / ((int(h, 16) + 1) / float(1 << 48))

    langs = sorted({f"l{lang}" for _, lang, _ in docs})
    for lang in langs:
        rows = sorted(
            (
                (prio(d, n), d, n)
                for d, lg, n in docs
                if f"l{lg}" == lang
            ),
            key=lambda t: (-t[0], t[1]),
        )
        tau = rows[PRIORITY_EST_K][0] if len(rows) > PRIORITY_EST_K else 0.0
        sample = rows[:PRIORITY_EST_K]
        est = sum(
            int(math.floor(max(float(n), tau) * 1e6 + 0.5))
            for _, _, n in sample
        )
        row = got[lang]
        assert row["n_sampled"] == len(sample)
        assert row["sampled_chars"] == sum(n for _, _, n in sample)
        assert row["tau_micro"] == int(math.floor(tau * 1e6 + 0.5))
        assert row["est_total_micro"] == est
        assert row["n_docs"] == len(rows)
        assert row["total_chars"] == sum(n for _, _, n in rows)


# -- label_propagation: matches a pure-python synchronous reference ---------------------
@FAST
@given(
    n=st.integers(2, 10),
    edges=st.lists(st.tuples(st.integers(0, 9), st.integers(0, 9)), max_size=14),
    rounds=st.integers(1, 3),
)
def test_label_propagation_matches_reference(spark, n, edges, rounds):
    """Synchronous mode-label LPA with the (count DESC, label ASC) tiebreak
    is fully deterministic — the Spark trajectory must equal a dict-based
    reference round for round on random graphs (incl. isolated-free graphs:
    nodes are induced from edges, matching the library contract)."""
    from collections import Counter

    from movie_genre_data_pipeline_spark.functions.graph import label_propagation

    simple = sorted({(min(a, b), max(a, b)) for a, b in edges if a != b and a < n and b < n})
    if not simple:
        return  # node set is induced from edges; empty graph has no output
    df = spark.createDataFrame(simple, "src long, dst long")
    got = {r.node: r.label for r in label_propagation(df, rounds=rounds).collect()}

    nbrs: dict[int, list[int]] = {}
    for a, b in simple:
        nbrs.setdefault(a, []).append(b)
        nbrs.setdefault(b, []).append(a)
    labels = {v: v for v in nbrs}
    for _ in range(rounds):
        nxt = {}
        for v in nbrs:
            cnt = Counter(labels[u] for u in nbrs[v])
            # most frequent, ties by smallest label
            nxt[v] = min(cnt, key=lambda lb: (-cnt[lb], lb))
        labels = nxt
    assert got == labels
