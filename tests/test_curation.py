"""Property tests for the corpus-curation operators (functions/curation.py,
sampling.mixture_resample, similarity.quantize_int8): chunk coverage/overlap
algebra, decontamination self-consistency, redaction determinism, mixture-rate
caps, and quantization error bounds.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from movie_genre_data_pipeline_spark.functions.curation import (
    chunk_documents,
    decontaminate,
    gopher_flags,
    pii_counts,
    redact_pii,
    repetition_profile,
)
from movie_genre_data_pipeline_spark.functions.sampling import mixture_resample
from movie_genre_data_pipeline_spark.functions.similarity import quantize_int8


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# -- chunking ---------------------------------------------------------------------
def test_chunks_cover_every_token_exactly(spark):
    """Every token position of every doc is inside >= 1 chunk; consecutive
    chunks overlap by exactly window-stride (except a shorter final chunk)."""
    docs = _docs(
        spark,
        [
            (1, " ".join(f"t{i}" for i in range(100))),  # multi-chunk
            (2, " ".join(f"t{i}" for i in range(33))),  # boundary: n = W+1
            (3, " ".join(f"t{i}" for i in range(30))),  # tail inside chunk 1
            (4, "solo"),  # single token
        ],
    )
    ch = chunk_documents(docs, "doc_id", "text", window=32, stride=24).collect()
    by_doc: dict[int, list] = {}
    for r in ch:
        by_doc.setdefault(r.doc_id, []).append(r)
    n_tokens = {1: 100, 2: 33, 3: 30, 4: 1}
    for doc, rows in by_doc.items():
        rows.sort(key=lambda r: r.chunk_start)
        covered = set()
        for r in rows:
            covered |= set(range(r.chunk_start, r.chunk_start + r.n_chunk_tokens))
            assert len(r.chunk_text.split(" ")) == r.n_chunk_tokens
        assert covered == set(range(1, n_tokens[doc] + 1)), doc
    # doc 3: second chunk would be fully contained -> dropped
    assert len(by_doc[3]) == 1
    # doc 2: needs a second chunk for token 33
    assert len(by_doc[2]) == 2


def test_chunk_ids_are_dense_and_start_derived(spark):
    docs = _docs(spark, [(1, " ".join(f"t{i}" for i in range(80)))])
    ch = chunk_documents(docs, "doc_id", "text", window=32, stride=24).collect()
    for r in ch:
        assert r.chunk_id == (r.chunk_start - 1) // 24


# -- decontamination --------------------------------------------------------------
def test_decontaminate_flags_exact_copy_and_spares_disjoint(spark):
    text_a = " ".join(f"w{i}" for i in range(20))
    text_b = " ".join(f"x{i}" for i in range(20))
    corpus = _docs(spark, [(1, text_a), (2, text_b), (3, "too short")])
    bench = _docs(spark, [(100, text_a)])
    out = {
        r.doc_id: r
        for r in decontaminate(corpus, bench, "doc_id", "text", k=5).collect()
    }
    assert out[1].contamination == 1.0 and out[1].contaminated
    assert out[2].contamination == 0.0 and not out[2].contaminated
    # < k tokens: no shingles, reported clean with zero counts
    assert out[3].n_shingles == 0 and not out[3].contaminated


def test_decontaminate_partial_overlap_fraction(spark):
    # corpus doc = 10 tokens (6 5-shingles); first 5 tokens shared with bench
    shared = "a b c d e"
    corpus = _docs(spark, [(1, shared + " f g h i j")])
    bench = _docs(spark, [(100, shared)])
    row = decontaminate(corpus, bench, "doc_id", "text", k=5).collect()[0]
    assert row.n_shingles == 6 and row.n_contaminated == 1
    assert row.contamination == round(1 / 6, 6)


# -- redaction --------------------------------------------------------------------
def test_redaction_counts_and_replaces_all_pii(spark):
    docs = _docs(
        spark,
        [(1, "mail a.b@x.co or c@y.org call 555-1234 ip 10.0.0.1 clean words")],
    )
    counts = pii_counts("text")
    row = docs.select(
        *[c.alias(k) for k, c in counts.items()],
        redact_pii("text").alias("red"),
    ).collect()[0]
    assert (row.email, row.phone, row.ipv4) == (2, 1, 1)
    assert row.red == "mail [PII] or [PII] call [PII] ip [PII] clean words"


# -- gopher flags ------------------------------------------------------------------
def test_gopher_flags_reject_repetitive_and_short(spark):
    good = " ".join(f"word{i}" for i in range(30))
    docs = _docs(
        spark,
        [
            (1, good),
            (2, "spam " * 40),  # one token repeated -> ttr/top-frac fail
            (3, "tiny doc"),  # below min token count
        ],
    )
    out = {
        r.doc_id: r for r in gopher_flags(repetition_profile(docs, "doc_id", "text")).collect()
    }
    assert out[1].keep
    assert not out[2].ok_ttr and not out[2].ok_top_token and not out[2].keep
    assert not out[3].ok_length and not out[3].keep


# -- mixture resample --------------------------------------------------------------
def test_mixture_resample_caps_and_repartition_invariance(spark):
    rows = [(i, "big" if i < 400 else "small") for i in range(450)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    weights = {"big": 0.5, "small": 0.5}
    kept = mixture_resample(df, "doc_id", "lang", weights, target_total=100)
    counts = {r.lang: r.n for r in kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    # small stratum: rate = min(1, 50/50) = 1 -> kept whole
    assert counts["small"] == 50
    # big stratum: rate 50/400 = 0.125 -> expect ~50, loose bounds
    assert 20 <= counts["big"] <= 90
    ids = sorted(r.doc_id for r in kept.collect())
    ids_repart = sorted(
        r.doc_id
        for r in mixture_resample(
            df.repartition(7, "doc_id"), "doc_id", "lang", weights, target_total=100
        ).collect()
    )
    assert ids == ids_repart
    # stratum absent from weights is dropped entirely
    none_kept = mixture_resample(df, "doc_id", "lang", {"small": 1.0}, 100)
    assert none_kept.filter(F.col("lang") == "big").count() == 0


# -- quantization ------------------------------------------------------------------
def test_quantize_error_bounded_by_half_step(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 1.0, 0.25, 0.7]), (2, [3.0, 3.0, 3.0])],  # constant vector
        "vec_id long, embedding array<double>",
    )
    out = {r.vec_id: r for r in quantize_int8(df, "vec_id", "embedding").collect()}
    # max abs error of min-max quantization is scale/2 = (mx-mn)/254/2
    assert out[1].mean_abs_err <= (1.0 - 0.0) / 254 / 2 + 1e-9
    assert out[2].mean_abs_err == 0.0 and out[2].v_min == 3.0


# -- incremental dedup --------------------------------------------------------------
def test_incremental_dedup_drops_seen_and_within_batch_dups(spark):
    from movie_genre_data_pipeline_spark.functions.dedup import incremental_dedup

    history = _docs(spark, [(1, "seen before"), (2, "also seen")])
    batch = _docs(
        spark,
        [
            (10, "seen  BEFORE "),  # dup of history doc 1 after normalization
            (11, "brand new"),
            (12, "brand new"),  # within-batch dup -> keep lowest id only
            (13, "another fresh"),
        ],
    )
    kept = sorted(
        r.doc_id
        for r in incremental_dedup(batch, history, "doc_id", "text").collect()
    )
    assert kept == [11, 13]
    # ledger path: history carries materialized fingerprints, no text column
    from movie_genre_data_pipeline_spark.functions.text import fingerprint

    ledger = history.select(fingerprint("text").alias("fp"))
    kept_via_ledger = sorted(
        r.doc_id
        for r in incremental_dedup(
            batch, ledger, "doc_id", "text", history_fp_col="fp"
        ).collect()
    )
    assert kept_via_ledger == kept


# -- unigram surprisal --------------------------------------------------------------
def test_unigram_surprisal_ranks_rare_tokens_higher(spark):
    from movie_genre_data_pipeline_spark.functions.text import unigram_surprisal

    docs = _docs(
        spark,
        [(1, "common common common common"), (2, "common rareword"), (3, "common common")],
    )
    out = {r.doc_id: r for r in unigram_surprisal(docs, "doc_id", "text").collect()}
    # doc 2 contains the corpus's only rare token -> strictly higher surprisal
    assert out[2].avg_surprisal > out[1].avg_surprisal
    assert out[1].n_tokens == 4


def test_winnow_guarantee_shared_run_shares_fingerprint(spark):
    """Schleimer et al. guarantee: docs sharing a token run of length
    >= w+k-1 (here 6) share at least one selected fingerprint."""
    from pyspark.sql import Row

    from movie_genre_data_pipeline_spark.functions.text import winnow_fingerprints

    shared = "alpha beta gamma delta epsilon zeta"  # 6 tokens = w+k-1
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text=f"one two three {shared} four five"),
            Row(doc_id=2, text=f"{shared} completely different tail here"),
            Row(doc_id=3, text="nothing in common with the others at all"),
        ]
    )
    fps = winnow_fingerprints(df, "doc_id", "text", k=3, w=4)
    sets = {
        r["doc"]: {x["h48"] for x in rows}
        for r, rows in [
            (r, [x for x in fps.collect() if x["doc"] == r["doc"]])
            for r in fps.select("doc").distinct().collect()
        ]
    }
    assert sets[1] & sets[2], "shared 6-token run must share a fingerprint"
    assert not (sets[1] & sets[3])
    # short doc (< w grams but >= k tokens): exactly its global-min fingerprint
    short = spark.createDataFrame([Row(doc_id=9, text="just three tokens")])
    got = winnow_fingerprints(short, "doc_id", "text", k=3, w=4).collect()
    assert len(got) == 1
    # sub-k doc: no grams, no fingerprints
    tiny = spark.createDataFrame([Row(doc_id=8, text="two words")])
    assert winnow_fingerprints(tiny, "doc_id", "text", k=3, w=4).count() == 0


def test_winnow_overlap_pairs(spark):
    """The MOSS-index consumer: a shared >= w+k-1 token run pairs two docs;
    unrelated docs never pair; max_df drops boilerplate fingerprints."""
    from pyspark.sql import Row

    from movie_genre_data_pipeline_spark.functions.dedup import winnow_overlap_pairs

    shared = "alpha beta gamma delta epsilon zeta eta theta"
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text=f"one two three {shared} four five six seven"),
            Row(doc_id=2, text=f"{shared} completely different tail here now"),
            Row(doc_id=3, text="nothing in common with the others at all today"),
        ]
    )
    pairs = winnow_overlap_pairs(df, "doc_id", "text", k=3, w=4, min_shared=1)
    got = {(r.id_a, r.id_b): r for r in pairs.collect()}
    assert (1, 2) in got
    assert all(3 not in pair for pair in got)
    r = got[(1, 2)]
    assert r.n_shared >= 1 and 0.0 < r.share_ratio <= 1.0

    # a fingerprint present in EVERY doc is boilerplate: max_df=1 kills all pairs
    boiler = spark.createDataFrame(
        [Row(doc_id=i, text=f"{shared} unique{i} tail{i} words{i}") for i in range(4)]
    )
    assert (
        winnow_overlap_pairs(boiler, "doc_id", "text", k=3, w=4, max_df=1).count() == 0
    )


# -- perceptual hash (functions/multimodal.py, r5) --------------------------------------
def test_phash_laws(spark):
    from pyspark.sql import functions as F

    from movie_genre_data_pipeline_spark.functions.multimodal import (
        phash_fingerprints,
        phash_near_dup_pairs,
    )

    rows = [
        (1, b"a" * 100),
        (2, b"a" * 100),            # identical -> hamming 0
        (3, b"a" * 99 + b"z"),      # tail perturbation -> small hamming
        (4, bytes(range(64)) * 4),  # monotone ramp -> different gradient
        (5, None),                  # null payload -> phash 0, still a row
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    fps = {r["media_id"]: r["phash"] for r in phash_fingerprints(df).collect()}
    assert fps[1] == fps[2] and fps[5] == 0
    assert fps[1] != fps[4]
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in phash_near_dup_pairs(df.transform(phash_fingerprints)).collect()
    }
    assert pairs[(1, 2)] == 0
    # pigeonhole guard: threshold must stay below the band count
    import pytest as _pytest

    with _pytest.raises(ValueError):
        phash_near_dup_pairs(phash_fingerprints(df), max_hamming=4, bands=4)
    # tiling guard: bands=5 covers only 60 of the 63 fingerprint bits — pairs
    # differing only in the uncovered high bits would be silently missed
    with _pytest.raises(ValueError, match="covers only"):
        phash_near_dup_pairs(phash_fingerprints(df), max_hamming=3, bands=5)


# -- bigram surprisal ---------------------------------------------------------------
def test_bigram_surprisal_counts_and_backoff_on_micro_corpus(spark):
    """Hand-checkable corpus: doc 1 = 'a b a b' has bigrams (a,b)x2 + (b,a);
    doc 2 = 'a c'. Corpus bigram counts: (a,b)=2 (modeled), (b,a)=1 and
    (a,c)=1 (singletons -> stupid backoff to 0.4*unigram). Expected per-doc
    surprisal follows from ln(2/3), ln(0.4*2/6), ln(0.4*1/6) through the
    micro-nat quantization."""
    import math

    from movie_genre_data_pipeline_spark.functions.text import bigram_surprisal

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a c"), (3, "x")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in bigram_surprisal(docs, "doc_id", "text").collect()}

    # doc 3 has a single token -> no bigrams -> absent
    assert set(out) == {1, 2}
    assert out[1].n_bigrams == 3 and out[2].n_bigrams == 1

    def micronat(p: float) -> int:
        return int(math.floor(math.log(p) * 1e6 + 0.5))

    # unigrams: a=3, b=2, c=1, x=1 -> total 7
    s_ab = micronat(2 / 3)            # modeled: c(a,b)/c(a,.) = 2/3
    s_ba = micronat(0.4 * (3 / 7))    # backoff to 0.4 * p(a)
    s_ac = micronat(0.4 * (1 / 7))    # backoff to 0.4 * p(c)
    assert abs(out[1].avg_surprisal - round(-(2 * s_ab + s_ba) / 1e6 / 3, 6)) < 2e-6
    assert abs(out[2].avg_surprisal - round(-s_ac / 1e6, 6)) < 2e-6
    assert abs(out[1].pct_backoff - round(1 / 3, 6)) < 1e-9
    assert out[2].pct_backoff == 1.0


def test_duplicate_spans_detects_and_merges_shared_runs(spark):
    """A run of >= 2L-1 shared tokens is always detected; overlapping marked
    windows merge into ONE maximal span whose exact token length is
    reported; unique docs and short docs report zeros."""
    from movie_genre_data_pipeline_spark.functions.dedup import duplicate_spans

    L = 4
    shared = " ".join(f"s{i}" for i in range(9))  # 9 shared tokens >= 2L-1
    rows = [
        (1, f"a1 a2 a3 {shared} a4 a5"),
        (2, f"b1 b2 {shared} b3 b4 b5 b6"),
        (3, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10"),  # unique
        (4, "d1 d2"),  # shorter than L
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r["doc_id"]: r for r in duplicate_spans(df, "doc_id", "text", l=L).collect()}
    assert len(out) == 4
    # the shared 9-token run is one merged island covering exactly 9 tokens
    for d in (1, 2):
        assert out[d]["n_dup_spans"] == 1, out[d]
        assert out[d]["dup_tokens"] == 9, out[d]
    assert out[3]["n_dup_spans"] == 0 and out[3]["dup_tokens"] == 0
    assert out[4]["n_dup_spans"] == 0 and out[4]["n_tokens"] == 2
    assert abs(out[1]["dup_fraction"] - round(9 / 14, 6)) < 1e-12


def test_duplicate_spans_within_doc_repeat_counts(spark):
    """A window repeated WITHIN one document is duplication too (Lee et al.
    count self-repeats); two disjoint repeats give two islands."""
    from movie_genre_data_pipeline_spark.functions.dedup import duplicate_spans

    run = "r1 r2 r3 r4"
    df = spark.createDataFrame(
        [(1, f"{run} x1 x2 x3 x4 x5 {run}")], "doc_id bigint, text string"
    )
    out = duplicate_spans(df, "doc_id", "text", l=4).collect()[0]
    assert out["n_dup_spans"] == 2
    assert out["dup_tokens"] == 8


def test_trainset_funnel_is_monotone_and_splits_partition(spark):
    """Funnel law: docs and tokens are non-increasing through stages 1-4,
    every stage binds on the fixture (strictly cuts something), and the
    three split rows exactly partition the stage-4 survivors."""
    from movie_genre_data_pipeline_spark.suite import all_queries

    rows = {
        r["stage_rank"]: r
        for r in all_queries()["curate_trainset_funnel"]
        .fn(spark, "/root/testdata/sf0.001")
        .collect()
    }
    assert set(rows) == {1, 2, 3, 4, 5, 6, 7}
    for a, b in ((1, 2), (2, 3), (3, 4)):
        assert rows[a]["docs"] > rows[b]["docs"], (a, b)
        assert rows[a]["tokens"] >= rows[b]["tokens"]
    assert sum(rows[i]["docs"] for i in (5, 6, 7)) == rows[4]["docs"]
    assert sum(rows[i]["tokens"] for i in (5, 6, 7)) == rows[4]["tokens"]
    for i in (5, 6, 7):
        # chunk count consistent with the token budget (2000/chunk)
        assert rows[i]["chunks"] >= max(1, rows[i]["tokens"] // 2000) or rows[i]["docs"] == 0
