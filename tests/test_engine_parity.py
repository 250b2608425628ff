"""Cross-engine tokenizer/fingerprint parity on HOSTILE whitespace.

The driver generates its own documents table, which (unlike the local testdata)
can contain exotic whitespace. Java regex \\s includes \\x0B (vertical tab);
DuckDB's RE2 \\s does not — a `\\s`-spelled tokenizer silently diverges between
the engine and its oracle on such text (this cost `sample_stratified_split` its
driver-green row in round 2). functions/text.py now spells the whitespace class
explicitly on both sides; this test pins that parity on a corpus built to break
it: vertical tabs, form feeds, CRLF, leading/trailing whitespace of every kind,
NBSP (which is NOT whitespace in either engine), empty and whitespace-only text.
"""

from __future__ import annotations

import math

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from movie_genre_data_pipeline_spark.suite import all_queries

# Every whitespace-divergence trap we know: each row is (text, lang, source).
_HOSTILE = [
    ("hello\x0bworld and the", "en", "web"),  # vtab INSIDE — the r2 killer
    ("\x0bder und die das", "de", "web"),  # leading vtab
    ("le la forme\x0c", "fr", "books"),  # trailing form feed
    ("el\tlos\tlas\tes", "es", "books"),  # tabs as separators
    ("  the quick brown fox  ", "en", "web"),  # leading/trailing spaces
    ("line1\r\nline2\rline3\nline4", "en", "code"),  # CR/LF/CRLF soup
    ("", "zh", "web"),  # empty text
    ("   ", "zh", "web"),  # spaces only
    ("\t\n\x0b\x0c\r", "en", "code"),  # every class member, nothing else
    ("non breaking space", "en", "web"),  # NBSP is NOT whitespace
    ("dup one\ttwo", "en", "web"),  # same fingerprint as the next row
    ("dup one two", "en", "web"),  # (whitespace-collapsed twins)
    ("the and of to is in that it " * 8, "en", "wiki"),  # clean baseline doc
    ("mixed 123 tokens!! with, punct; and\x0bvtab", "en", "wiki"),
    # r9: MIXED CASE + digits — the [^a-z]-class tokenizers (BM25, bigram LM)
    # must lowercase IDENTICALLY in both engines; an oracle spelled with the
    # whitespace class silently diverges on exactly this text (caught in the
    # r9 review: the BM25 oracle and two streaming-twin ledgers did)
    ("The Quick BROWN Fox JUMPED over 42 Lazy DOGS", "en", "wiki"),
    ("SPARK Merge STREAM vector Spark2 sPaRk-merge", "en", "code"),
    ("Der GROSSE Baum und DIE kleine Blume", "de", "books"),
    # r10 (ADVICE r9, medium): the MAX-doc_id row tokenizes to EMPTY under
    # the lowercase-alpha class — n_ids = MAX(doc_id)+1 must still count it
    # (the Heaps bucket function divides by n_ids, so a ledger that only
    # records token-bearing docs shifts EVERY bucket boundary). KEEP LAST.
    ("1234 5678 90 !!! ??? ... 42", "zh", "web"),
]

# documents-only suite queries exercising tokens()/fingerprint()/BPE and the
# md5 sampling thresholds — the full surface the whitespace class feeds.
_QUERIES = [
    "text_token_stats",
    "text_quality_scores",
    "text_lang_id_hist",
    "text_fingerprint_stats",
    "sample_stratified_split",
    "pack_token_budget",
    "dedup_exact",
    "curate_gopher_flags",
    "curate_chunk_documents",
    # r9 additions over documents: the lowercase-alpha tokenizer family (BM25,
    # bigram LM, the perplexity filter), the whitespace span family (scrub),
    # the one-signature LSH tuning table, and the blob shard audit
    "text_bm25_topk",
    "text_bigram_surprisal",
    "curate_surprisal_filter",
    "curate_span_scrub",
    "dedup_duplicate_spans",
    "dedup_lsh_tuning",
    # r11: the asymmetric containment verdict (whitespace shingles)
    "dedup_containment",
    "media_shard_balance",
    # r10: the Heaps'-law curve, batch AND streaming twin — the stream ledger
    # must derive n_ids from ALL documents (the corpus's max-id row above
    # tokenizes to empty on purpose; ADVICE r9 medium)
    "text_heaps_vocab_growth",
    "stream_heaps_vocab_growth",
    # r10: RRF hybrid retrieval (BM25 + query-likelihood over the same
    # postings) — both rankers tokenize with the lowercase-alpha class
    "text_rrf_fusion",
    "stream_rrf_fusion",
    # r10: the Zipf rank-frequency fit (batch + ledger twin)
    "text_zipf_fit",
    "stream_zipf_fit",
    # r11: the diversity report over the same unigram counts (batch + twin)
    "text_unigram_entropy",
    "stream_unigram_entropy",
    # r11: the source-pair mixing diagnostic (lowercase-alpha class),
    # batch + ledger twin
    "text_js_divergence",
    "stream_js_divergence",
]


@pytest.fixture(scope="module")
def hostile_dir(tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("hostile_sf")
    rows = [
        {"doc_id": i + 1, "text": t, "lang": lang, "source": src,
         "n_chars": len(t)}
        for i, (t, lang, src) in enumerate(_HOSTILE)
    ]
    table = pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [("doc_id", pa.int64()), ("text", pa.string()), ("lang", pa.string()),
             ("source", pa.string()), ("n_chars", pa.int64())]
        ),
    )
    pq.write_table(table, str(d / "documents.parquet"))
    return str(d)


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        return None if math.isnan(v) else round(v, 9)
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(_norm(x) for x in v)
    try:
        import pandas as pd

        if pd.isna(v):
            return None
    except (TypeError, ValueError):
        pass
    return v


def _rows(df) -> list[tuple]:
    df = df.reindex(sorted(df.columns), axis=1)
    return sorted(
        (tuple(_norm(v) for v in t) for t in df.itertuples(index=False)), key=repr
    )


@pytest.mark.parametrize("name", _QUERIES)
def test_hostile_whitespace_parity(spark, hostile_dir, name):
    spec = all_queries()[name]
    sdf = spec.fn(spark, hostile_dir).toPandas()
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{hostile_dir}/documents.parquet'"
    )
    odf = con.sql(spec.oracle).df()
    assert len(sdf) == len(odf), f"{name}: rows {len(sdf)} vs {len(odf)}"
    assert sorted(map(str.lower, sdf.columns)) == sorted(map(str.lower, odf.columns))
    for i, (sr, orow) in enumerate(zip(_rows(sdf), _rows(odf))):
        assert sr == orow, f"{name}: first diff at sorted row {i}: {sr} != {orow}"


def test_zipf_fit_matches_numpy_polyfit(spark):
    """Law test vs an independent implementation: shared-string math bugs
    stay oracle-GREEN (both engines run the same wrong formula) — the r10
    Zipf fit had two unit bugs (missing x1e6 on the slope, a spurious /1e6
    on the intercept) that only this class of test can catch. Fit the same
    top-K rank/frequency points with numpy.polyfit and require agreement
    to ~1e-3 (the micro-nat quantization floor)."""
    import math

    import numpy as np

    from movie_genre_data_pipeline_spark.suite.text_queries import ZIPF_TOPN

    sf = "/root/testdata/sf0.001"
    row = all_queries()["text_zipf_fit"].fn(spark, sf).collect()[0]
    con = duckdb.connect()
    pts = con.sql(
        f"""WITH counts AS (
              SELECT t AS term, COUNT(*) AS cnt
              FROM '{sf}/documents.parquet',
                   UNNEST(list_filter(regexp_split_to_array(lower(text),
                          '[^a-z]+'), x -> x != '')) AS u(t)
              GROUP BY 1),
            top AS (SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, term)
                      AS rnk FROM counts QUALIFY rnk <= {ZIPF_TOPN})
            SELECT rnk, cnt FROM top ORDER BY rnk"""
    ).fetchall()
    x = np.log([r for r, _ in pts])
    y = np.log([c for _, c in pts])
    slope, intercept = np.polyfit(x, y, 1)
    assert math.isclose(row["slope_micro"] / 1e6, slope, abs_tol=2e-3), (
        row["slope_micro"] / 1e6,
        slope,
    )
    assert math.isclose(row["intercept_micro"] / 1e6, intercept, abs_tol=2e-3), (
        row["intercept_micro"] / 1e6,
        intercept,
    )
    assert row["n_ranks"] == ZIPF_TOPN


def test_unigram_entropy_matches_numpy(spark):
    """Law test vs an independent implementation (the r10 Zipf lesson —
    shared-string micro-unit bugs ship oracle-green): recompute Shannon
    entropy and the Simpson index from the raw counts with numpy and require
    agreement to the micro quantization floor."""
    import math

    import numpy as np

    sf = "/root/testdata/sf0.001"
    row = all_queries()["text_unigram_entropy"].fn(spark, sf).collect()[0]
    con = duckdb.connect()
    cnts = np.array(
        [
            c
            for (c,) in con.sql(
                f"""SELECT COUNT(*) FROM '{sf}/documents.parquet',
                UNNEST(list_filter(regexp_split_to_array(lower(text),
                       '[^a-z]+'), x -> x != '')) AS u(t)
                GROUP BY t"""
            ).fetchall()
        ],
        dtype=np.float64,
    )
    T = cnts.sum()
    p = cnts / T
    H = float(-(p * np.log(p)).sum())
    simpson = float((cnts * (cnts - 1)).sum() / (T * (T - 1)))
    assert row["n_types"] == len(cnts)
    assert row["n_tokens"] == int(T)
    # per-term ln quantization adds <= 0.5 micro-nat weighted error plus the
    # two final roundings — 5 micro is generous
    assert math.isclose(row["entropy_micro"] / 1e6, H, abs_tol=5e-6), (
        row["entropy_micro"] / 1e6,
        H,
    )
    assert math.isclose(row["simpson_micro"] / 1e6, simpson, abs_tol=2e-6), (
        row["simpson_micro"] / 1e6,
        simpson,
    )


def test_mutual_info_matches_numpy(spark):
    """Law test vs an independent implementation: recompute MI and both
    marginal entropies from the raw contingency table with numpy and require
    agreement to the micro quantization floor (shared-string micro-unit bugs
    ship oracle-green)."""
    import math

    import numpy as np

    sf = "/root/testdata/sf0.001"
    row = all_queries()["feat_mutual_info"].fn(spark, sf).collect()[0]
    con = duckdb.connect()
    cells = con.sql(
        f"""SELECT o_orderpriority, o_orderstatus, COUNT(*)
        FROM '{sf}/orders.parquet' GROUP BY 1, 2"""
    ).fetchall()
    xs = sorted({c[0] for c in cells})
    ys = sorted({c[1] for c in cells})
    M = np.zeros((len(xs), len(ys)))
    for x, y, n in cells:
        M[xs.index(x), ys.index(y)] = n
    N = M.sum()
    p = M / N
    px = p.sum(axis=1)
    py = p.sum(axis=0)
    nz = p > 0
    mi = float((p[nz] * np.log(p[nz] / np.outer(px, py)[nz])).sum())
    hx = float(-(px * np.log(px)).sum())
    hy = float(-(py * np.log(py)).sum())
    assert row["n_rows"] == int(N)
    assert math.isclose(row["mi_micro"] / 1e6, mi, abs_tol=5e-6), (
        row["mi_micro"] / 1e6,
        mi,
    )
    assert math.isclose(row["h_x_micro"] / 1e6, hx, abs_tol=5e-6)
    assert math.isclose(row["h_y_micro"] / 1e6, hy, abs_tol=5e-6)
    # information inequality: 0 <= MI <= min(H(X), H(Y)) (up to quantization)
    assert -2 <= row["mi_micro"] <= min(row["h_x_micro"], row["h_y_micro"]) + 2


def test_js_divergence_matches_numpy(spark):
    """Law test vs an independent implementation: recompute every source
    pair's JS divergence from the raw counts with numpy and require
    agreement to the micro quantization floor, plus the 0 <= JS <= ln 2
    bound and symmetry-by-construction (each unordered pair appears once)."""
    import math

    import numpy as np

    sf = "/root/testdata/sf0.001"
    rows = all_queries()["text_js_divergence"].fn(spark, sf).collect()
    con = duckdb.connect()
    raw = con.sql(
        f"""SELECT source, t, COUNT(*) FROM '{sf}/documents.parquet',
        UNNEST(list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
               x -> x != '')) AS u(t)
        GROUP BY 1, 2"""
    ).fetchall()
    by_src: dict = {}
    for s, t, c in raw:
        by_src.setdefault(s, {})[t] = c

    def js(ca, cb):
        terms = sorted(set(ca) | set(cb))
        a = np.array([ca.get(t, 0) for t in terms], dtype=np.float64)
        b = np.array([cb.get(t, 0) for t in terms], dtype=np.float64)
        p, q = a / a.sum(), b / b.sum()
        m = (p + q) / 2
        pa = p > 0
        qb = q > 0
        return float(
            0.5 * (p[pa] * np.log(p[pa] / m[pa])).sum()
            + 0.5 * (q[qb] * np.log(q[qb] / m[qb])).sum()
        )

    seen = set()
    for r in rows:
        key = (r["source_a"], r["source_b"])
        assert key not in seen and r["source_a"] < r["source_b"]
        seen.add(key)
        expect = js(by_src[r["source_a"]], by_src[r["source_b"]])
        assert math.isclose(r["js_micro"] / 1e6, expect, abs_tol=5e-6), (
            key,
            r["js_micro"] / 1e6,
            expect,
        )
        assert -2 <= r["js_micro"] <= round(math.log(2) * 1e6) + 2
    n_src = len(by_src)
    assert len(rows) == n_src * (n_src - 1) // 2


def test_woe_iv_matches_numpy(spark):
    """Law test vs an independent implementation (the r10 Zipf lesson —
    shared-string micro-unit bugs ship oracle-green): recompute the smoothed
    WoE extremes and the IV fold from the raw contingency with numpy floats
    and require agreement to the quantization floor (shares quantize to
    1e-6 each before the IV product, so the fold tolerance is
    n_bins·share_err·|woe| plus the final rounding)."""
    import numpy as np

    sf = "/root/testdata/sf0.001"
    rows = {
        r["feature"]: r
        for r in all_queries()["feat_woe_iv"].fn(spark, sf).collect()
    }
    con = duckdb.connect()
    feats = {
        "order_priority": "o_orderpriority",
        "order_year": "CAST(year(o_orderdate) AS VARCHAR)",
        "order_month": "CAST(month(o_orderdate) AS VARCHAR)",
        "cust_mod10": "CAST(o_custkey % 10 AS VARCHAR)",
        "price_band": (
            "CAST(CAST(FLOOR(CAST(o_totalprice AS DOUBLE)"
            " / CAST(50000 AS DOUBLE)) AS BIGINT) AS VARCHAR)"
        ),
    }
    assert set(rows) == set(feats)
    for name, expr in feats.items():
        cells = con.sql(
            f"""SELECT {expr} AS x,
                   SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END),
                   SUM(CASE WHEN o_orderstatus = 'F' THEN 0 ELSE 1 END)
            FROM '{sf}/orders.parquet' GROUP BY 1"""
        ).fetchall()
        npos = np.array([c[1] for c in cells], dtype=np.float64)
        nneg = np.array([c[2] for c in cells], dtype=np.float64)
        B, P, N = len(cells), npos.sum(), nneg.sum()
        woe = np.log(
            ((2 * npos + 1) * (2 * N + B)) / ((2 * nneg + 1) * (2 * P + B))
        )
        iv = float(((npos / P - nneg / N) * woe).sum())
        r = rows[name]
        assert r["n_bins"] == B and r["n_pos"] == int(P) and r["n_neg"] == int(N)
        assert math.isclose(r["woe_min_micro"] / 1e6, float(woe.min()), abs_tol=2e-6)
        assert math.isclose(r["woe_max_micro"] / 1e6, float(woe.max()), abs_tol=2e-6)
        tol = B * 2e-6 * float(np.abs(woe).max()) + 2e-6
        assert math.isclose(r["iv_micro"] / 1e6, iv, abs_tol=tol), (
            name, r["iv_micro"] / 1e6, iv, tol,
        )
        # IV is nonnegative by construction up to quantization (each term is
        # (p−q)·ln of a monotone-in-(p/q) ratio, smoothing aside)
        assert r["iv_micro"] >= -len(feats)


def test_burstiness_matches_numpy(spark):
    """Law test: recompute every published Fano factor from the raw per-doc
    count vectors (zeros included) with numpy var(ddof=1)/mean and require
    agreement to the quantization floor; pin the rank cut against the
    independently-sorted frequency table."""
    import numpy as np

    sf = "/root/testdata/sf0.001"
    rows = all_queries()["text_burstiness"].fn(spark, sf).collect()
    con = duckdb.connect()
    per_doc = con.sql(
        f"""SELECT t, doc_id, COUNT(*) AS x
        FROM '{sf}/documents.parquet',
             UNNEST(list_filter(regexp_split_to_array(lower(text),
                    '[^a-z]+'), x -> x != '')) AS u(t)
        GROUP BY 1, 2"""
    ).fetchall()
    (D,) = con.sql(f"SELECT COUNT(*) FROM '{sf}/documents.parquet'").fetchone()
    by_term: dict[str, list[int]] = {}
    for t, _doc, x in per_doc:
        by_term.setdefault(t, []).append(x)
    ranked = sorted(by_term.items(), key=lambda kv: (-sum(kv[1]), kv[0]))
    assert [r["term"] for r in rows] == [t for t, _ in ranked[: len(rows)]]
    for r in rows:
        xs = np.zeros(D, dtype=np.float64)
        vals = by_term[r["term"]]
        xs[: len(vals)] = vals  # zeros for the D-df absent docs
        fano = float(xs.var(ddof=1) / xs.mean())
        assert r["df"] == len(vals)
        assert r["n_occurrences"] == int(xs.sum())
        assert math.isclose(r["fano_micro"] / 1e6, fano, abs_tol=2e-6), (
            r["term"], r["fano_micro"] / 1e6, fano,
        )


def test_acf_lags_matches_numpy_and_periodicity_law(spark):
    """Two laws for the ACF ladder: (1) the fixture report equals numpy's
    Pearson r on independently-rebuilt dense hourly pairs at every lag;
    (2) a synthetic exactly-24-periodic series prints r_micro(24) =
    r_micro(48) = 1e6 exactly (x_{t+24} == x_t makes Pearson r exactly 1)."""
    import numpy as np

    from movie_genre_data_pipeline_spark.suite.timeseries_queries import (
        ACF_LAGS,
        acf_report_from_counts,
    )

    sf = "/root/testdata/sf0.001"
    rows = {
        r["lag_hours"]: r
        for r in all_queries()["ts_acf_lags"].fn(spark, sf).collect()
    }
    con = duckdb.connect()
    pairs = con.sql(
        f"""SELECT CAST(epoch_us(ts) AS BIGINT) // 3600000000 AS h,
               COUNT(*) AS c
        FROM '{sf}/events.parquet' GROUP BY 1 ORDER BY 1"""
    ).fetchall()
    h0, h1 = pairs[0][0], pairs[-1][0]
    dense = np.zeros(h1 - h0 + 1, dtype=np.float64)
    for h, c in pairs:
        dense[h - h0] = c
    for lag in ACF_LAGS:
        x, y = dense[:-lag], dense[lag:]
        r_np = float(np.corrcoef(x, y)[0, 1])
        r = rows[lag]
        assert r["n_pairs"] == len(x)
        assert math.isclose(r["r_micro"] / 1e6, r_np, abs_tol=2e-6), (
            lag, r["r_micro"] / 1e6, r_np,
        )

    periodic = spark.createDataFrame(
        [(h, 10 + (h % 24)) for h in range(24 * 5)], "hour_id bigint, cnt bigint"
    )
    out = {
        r["lag_hours"]: r["r_micro"]
        for r in acf_report_from_counts(periodic).collect()
    }
    assert out[24] == 1_000_000 and out[48] == 1_000_000
    assert out[12] < 0  # the anti-phase half-period is negative


def test_ess_report_matches_numpy(spark):
    """Law test: recompute Kish ESS per language from the independently-
    collected per-doc quality weights with numpy and require agreement to
    the quantization floor; pin ESS <= n (Cauchy-Schwarz) and the
    equal-weights edge (any language whose weights are all equal must print
    ESS == n exactly)."""
    import numpy as np

    sf = "/root/testdata/sf0.001"
    rows = {
        r["lang"]: r
        for r in all_queries()["sample_ess_report"].fn(spark, sf).collect()
    }
    quality = {
        r["doc_id"]: r["quality"]
        for r in all_queries()["text_quality_scores"].fn(spark, sf).collect()
    }
    con = duckdb.connect()
    langs = con.sql(
        f"SELECT doc_id, lang FROM '{sf}/documents.parquet'"
    ).fetchall()
    by_lang: dict[str, list[int]] = {}
    for doc_id, lang in langs:
        by_lang.setdefault(lang, []).append(round(quality[doc_id] * 1e6))
    assert set(rows) == set(by_lang)
    for lang, ws in by_lang.items():
        w = np.array(ws, dtype=np.float64)
        ess = float(w.sum() ** 2 / (w * w).sum()) if (w * w).sum() else 0.0
        r = rows[lang]
        assert r["n_docs"] == len(ws)
        assert r["sum_w_micro"] == int(w.sum())
        assert math.isclose(r["ess_micro"] / 1e6, ess, abs_tol=2e-6), (
            lang, r["ess_micro"] / 1e6, ess,
        )
        assert r["ess_micro"] <= r["n_docs"] * 1_000_000 + 1  # ESS <= n
        if len(set(ws)) == 1 and ws[0] > 0:
            assert r["ess_micro"] == r["n_docs"] * 1_000_000


def test_auc_report_matches_numpy(spark):
    """Law test: recompute the Mann-Whitney AUC from the independently-
    collected (score, label) pairs with the numpy rank identity
    (AUC = (R_pos − P(P+1)/2) / (P·N) over average ranks) and require
    agreement to the quantization floor; pin the blind-scorer edge
    (constant scores must print exactly 0.5) via the report core."""
    import numpy as np

    sf = "/root/testdata/sf0.001"
    row = all_queries()["feat_auc_report"].fn(spark, sf).collect()[0]

    from movie_genre_data_pipeline_spark.functions.sampling import dsir_importance
    from movie_genre_data_pipeline_spark.suite import load

    d = load(spark, sf, "documents")
    from pyspark.sql import functions as F

    w = dsir_importance(d, "doc_id", "text", (F.col("lang") == "en"))
    pairs = (
        d.select("doc_id", (F.col("lang") == "en").alias("y"))
        .join(w, "doc_id")
        .select("y", "logw_micro")
        .collect()
    )
    s = np.array([p["logw_micro"] for p in pairs], dtype=np.float64)
    y = np.array([p["y"] for p in pairs], dtype=bool)
    order = np.argsort(s, kind="stable")
    ranks = np.empty(len(s), dtype=np.float64)
    # average ranks for ties
    sorted_s = s[order]
    i = 0
    pos = 1.0
    while i < len(s):
        j = i
        while j < len(s) and sorted_s[j] == sorted_s[i]:
            j += 1
        ranks[order[i:j]] = (pos + (pos + (j - i) - 1)) / 2.0
        pos += j - i
        i = j
    P, N = int(y.sum()), int((~y).sum())
    auc = float((ranks[y].sum() - P * (P + 1) / 2.0) / (P * N))
    assert row["n_pos"] == P and row["n_neg"] == N
    assert math.isclose(row["auc_micro"] / 1e6, auc, abs_tol=2e-6), (
        row["auc_micro"] / 1e6, auc,
    )
    assert row["gini_micro"] == row["auc_micro"] * 2 - 1_000_000


def _labeled_pairs(spark, sf):
    import numpy as np

    from movie_genre_data_pipeline_spark.functions.sampling import dsir_importance
    from movie_genre_data_pipeline_spark.suite import load
    from pyspark.sql import functions as F

    d = load(spark, sf, "documents")
    w = dsir_importance(d, "doc_id", "text", (F.col("lang") == "en"))
    pairs = (
        d.select("doc_id", (F.col("lang") == "en").alias("y"))
        .join(w, "doc_id")
        .select("y", "logw_micro")
        .collect()
    )
    s = np.array([p["logw_micro"] for p in pairs], dtype=np.int64)
    y = np.array([p["y"] for p in pairs], dtype=bool)
    return s, y


def test_pr_auc_report_matches_numpy(spark):
    """Law test: recompute step-wise average precision from the
    independently-collected (score, label) pairs — distinct scores
    descending, ties grouped, AP = Σ ΔR·P — and require agreement to the
    quantization floor; pin the two closed-form edges via the report core:
    a constant scorer prints AP == prevalence EXACTLY (one group, term =
    P/(P+N)) and a perfect separator prints AP == 1."""
    import numpy as np

    sf = "/root/testdata/sf0.001"
    row = all_queries()["feat_pr_auc_report"].fn(spark, sf).collect()[0]
    s, y = _labeled_pairs(spark, sf)
    P, N = int(y.sum()), int((~y).sum())
    ap = 0.0
    tp = 0
    seen = 0
    for v in np.unique(s)[::-1]:
        mask = s == v
        cp = int((y & mask).sum())
        seen += int(mask.sum())
        tp += cp
        if cp:
            ap += cp * (tp / seen)
    ap /= P
    assert row["n_pos"] == P and row["n_neg"] == N
    assert math.isclose(row["ap_micro"] / 1e6, ap, abs_tol=2e-6), (
        row["ap_micro"] / 1e6,
        ap,
    )
    assert row["prevalence_micro"] == round(P * 1e6 / (P + N))

    from movie_genre_data_pipeline_spark.suite.sampling_queries import (
        pr_auc_report_from_labeled,
    )

    const = spark.createDataFrame(
        [(True, 0)] * 3 + [(False, 0)] * 7, "y boolean, logw_micro bigint"
    )
    r = pr_auc_report_from_labeled(const).collect()[0]
    assert r["ap_micro"] == r["prevalence_micro"] == 300000
    perfect = spark.createDataFrame(
        [(True, 10), (True, 9), (False, 2), (False, 1)],
        "y boolean, logw_micro bigint",
    )
    assert pr_auc_report_from_labeled(perfect).collect()[0]["ap_micro"] == 1_000_000


def test_ks_report_matches_numpy(spark):
    """Law test: recompute KS = max |F_pos − F_neg| (and its MIN-score
    argmax) from the independently-collected pairs and require exact
    agreement — KS has NO per-term quantization, so the tolerance is one
    final-divide ULP; pin the edges via the report core: a constant scorer
    prints 0 and a perfect separator prints exactly 1e6 at the top negative
    score."""
    import numpy as np

    sf = "/root/testdata/sf0.001"
    row = all_queries()["feat_ks_report"].fn(spark, sf).collect()[0]
    s, y = _labeled_pairs(spark, sf)
    P, N = int(y.sum()), int((~y).sum())
    uniq = np.unique(s)  # ascending
    cp = np.cumsum([(y & (s == v)).sum() for v in uniq]).astype(np.int64)
    cn = np.cumsum([((~y) & (s == v)).sum() for v in uniq]).astype(np.int64)
    nums = np.abs(cp * N - cn * P)
    k = int(np.argmax(nums))  # first max == MIN(s) tie-break
    assert row["n_pos"] == P and row["n_neg"] == N
    assert row["ks_micro"] == round(float(nums[k]) * 1e6 / (P * N) + 0.0) or (
        math.isclose(row["ks_micro"] / 1e6, nums[k] / (P * N), abs_tol=1e-6)
    )
    assert row["ks_at_score"] == int(uniq[k])

    from movie_genre_data_pipeline_spark.suite.sampling_queries import (
        ks_report_from_labeled,
    )

    const = spark.createDataFrame(
        [(True, 0)] * 3 + [(False, 0)] * 7, "y boolean, logw_micro bigint"
    )
    assert ks_report_from_labeled(const).collect()[0]["ks_micro"] == 0
    perfect = spark.createDataFrame(
        [(True, 10), (True, 9), (False, 2), (False, 1)],
        "y boolean, logw_micro bigint",
    )
    r = ks_report_from_labeled(perfect).collect()[0]
    assert r["ks_micro"] == 1_000_000 and r["ks_at_score"] == 2


def test_auc_bootstrap_ci_matches_hashlib_replicas(spark):
    """Law test: recompute all 32 replicate AUCs in pure python — hashlib
    md5 replicate weights through the same Poisson(1) CDF thresholds, the
    grouped Mann-Whitney identity per replicate — and require the published
    band ends EXACTLY (integer arithmetic + one double divide, bit-replicable
    in python floats); the point estimate must equal feat_auc_report's."""
    import hashlib
    import math as m

    from movie_genre_data_pipeline_spark.suite.sampling_queries import (
        BOOT_B,
        _POISSON1_CDF,
    )

    sf = "/root/testdata/sf0.001"
    row = all_queries()["feat_auc_bootstrap_ci"].fn(spark, sf).collect()[0]
    plain = all_queries()["feat_auc_report"].fn(spark, sf).collect()[0]
    assert row["auc_micro"] == plain["auc_micro"]
    assert row["n_pos"] == plain["n_pos"] and row["n_neg"] == plain["n_neg"]
    assert row["n_replicates"] == BOOT_B

    s, y = _labeled_pairs(spark, sf)
    # doc ids travel with the pairs only implicitly — re-collect with ids
    from movie_genre_data_pipeline_spark.functions.sampling import dsir_importance
    from movie_genre_data_pipeline_spark.suite import load
    from pyspark.sql import functions as F

    d = load(spark, sf, "documents")
    w = dsir_importance(d, "doc_id", "text", (F.col("lang") == "en"))
    rows = (
        d.select("doc_id", (F.col("lang") == "en").alias("y"))
        .join(w, "doc_id")
        .select("doc_id", "y", "logw_micro")
        .collect()
    )
    thresholds = [float(t) for t in _POISSON1_CDF]

    def poisson_k(doc_id: int, r: int) -> int:
        u = (
            int(
                hashlib.md5(f"{doc_id}:aucboot:{r}".encode()).hexdigest()[:12], 16
            )
            / 281474976710656.0
        )
        for k, t in enumerate(thresholds):
            if u < t:
                return k
        return 7

    aucs = []
    for r in range(BOOT_B):
        groups: dict[int, list[int]] = {}
        for rec in rows:
            k = poisson_k(rec["doc_id"], r)
            g = groups.setdefault(rec["logw_micro"], [0, 0])
            g[0 if rec["y"] else 1] += k
        P = sum(g[0] for g in groups.values())
        N = sum(g[1] for g in groups.values())
        u2 = 0
        cum_neg = 0
        for sv in sorted(groups):
            cp, cn = groups[sv]
            u2 += cp * (2 * cum_neg + cn)
            cum_neg += cn
        if P > 0 and N > 0:
            aucs.append(int(m.floor(float(u2) * 1e6 / (2.0 * P * N) + 0.5)))
        else:
            aucs.append(0)
    aucs.sort()
    assert row["ci_lo_micro"] == aucs[1], (row["ci_lo_micro"], aucs[:3])
    assert row["ci_hi_micro"] == aucs[BOOT_B - 2], (
        row["ci_hi_micro"],
        aucs[-3:],
    )
    assert row["ci_lo_micro"] <= row["ci_hi_micro"]


def test_auc_cv_folds_partition_the_corpus(spark):
    """Law test: the five out-of-fold reports must PARTITION the corpus —
    folds 0..4 each present, Σ(n_pos) == corpus positives, Σ(n_pos+n_neg)
    == corpus size — and the resubstitution AUC must be computed on the
    same label split (cross-checked against feat_auc_report's row)."""
    sf = "/root/testdata/sf0.001"
    rows = {r["fold"]: r for r in all_queries()["feat_auc_cv"].fn(spark, sf).collect()}
    assert sorted(rows) == [0, 1, 2, 3, 4]
    plain = all_queries()["feat_auc_report"].fn(spark, sf).collect()[0]
    assert sum(r["n_pos"] for r in rows.values()) == plain["n_pos"]
    assert sum(r["n_pos"] + r["n_neg"] for r in rows.values()) == (
        plain["n_pos"] + plain["n_neg"]
    )


def test_dp_release_matches_hashlib_and_mechanism_shape(spark):
    """Law test: replay every cell's Laplace draw in pure python (hashlib
    md5 u, math.log inverse CDF, the same micro quantization) and require
    the published noise and released counts EXACTLY; then check the
    mechanism's shape on the draws — both signs occur, mean |noise| within
    a loose band of the scale b = 1/eps = 2, and clamping never produces a
    negative release."""
    import hashlib
    import math as m

    sf = "/root/testdata/sf0.001"
    rows = all_queries()["ops_dp_release"].fn(spark, sf).collect()

    from movie_genre_data_pipeline_spark.suite import load
    from pyspark.sql import functions as F

    c = load(spark, sf, "customer")
    true_n = {
        (r["c_nationkey"], r["c_mktsegment"]): r["n"]
        for r in c.groupBy(
            F.col("c_nationkey").cast("bigint").alias("c_nationkey"),
            "c_mktsegment",
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .collect()
    }
    assert len(rows) == len(true_n) > 20
    noises = []
    for r in rows:
        key = f"{r['c_nationkey']}:{r['c_mktsegment']}:dp"
        h48 = int(hashlib.md5(key.encode()).hexdigest()[:12], 16)
        u = (h48 + 0.5) / 281474976710656.0
        sign = 1.0 if u > 0.5 else (-1.0 if u < 0.5 else 0.0)
        noise = -2.0 * sign * m.log(1.0 - 2.0 * abs(u - 0.5))
        noise_micro = int(m.floor(noise * 1e6 + 0.5))
        assert r["noise_micro"] == noise_micro, (key, r["noise_micro"], noise_micro)
        n = true_n[(r["c_nationkey"], r["c_mktsegment"])]
        released = max(0, int(m.floor(n + noise_micro / 1e6 + 0.5)))
        assert r["released_n"] == released
        assert r["released_n"] >= 0
        assert r["epsilon_micro"] == 500_000
        noises.append(noise)
    assert any(x > 0 for x in noises) and any(x < 0 for x in noises)
    mean_abs = sum(abs(x) for x in noises) / len(noises)
    # E|Laplace(b)| = b = 2; ~125 cells → a loose 3x band either side
    assert 0.7 < mean_abs < 6.0, mean_abs


def test_calibration_report_matches_numpy(spark):
    """Law test: rebuild the scored rows independently (the same IRLS betas
    the trajectory query publishes, numpy sigmoid), recompute every bin's
    mean prediction and observed rate, and require agreement to the
    quantization floor; pin the ECE roll-up (weighted |gap|) and the
    bin-edge containment (every row's prediction lies in its bin)."""
    import numpy as np

    sf = "/root/testdata/sf0.001"
    rows = {
        r["bin"]: r
        for r in all_queries()["feat_calibration_report"].fn(spark, sf).collect()
    }
    traj = {
        r["iter"]: r
        for r in all_queries()["feat_logreg_recovery"].fn(spark, sf).collect()
    }
    b = traj[max(traj)]
    con = duckdb.connect()
    feats = con.sql(
        f"""SELECT CAST(o_orderkey % 180 + 60 AS BIGINT),
               CAST(o_custkey % 25 AS BIGINT),
               CAST(concat('0x', substring(md5(o_orderkey || ':logreg'), 1, 12))
                 AS BIGINT)
        FROM '{sf}/orders.parquet'"""
    ).fetchall()
    x1 = np.array([f[0] for f in feats], dtype=np.float64)
    x2 = np.array([f[1] for f in feats], dtype=np.float64)
    u = np.array([f[2] for f in feats], dtype=np.float64) / 281474976710656.0
    zt = (-2_000_000 + 30_000 * x1 - 150_000 * x2) / 1e6
    y = (u < 1.0 / (1.0 + np.exp(-zt))).astype(np.float64)
    z = (b["b0_micro"] + b["b1_micro"] * x1 + b["b2_micro"] * x2) / 1e6
    mu = np.clip(np.round(1e6 / (1.0 + np.exp(-z))), 1, 999_999)
    bins = (mu // 100_000).astype(int)
    n_total, ece = 0, 0.0
    for bi in sorted(set(bins)):
        m = bins == bi
        r = rows[bi]
        assert r["n_rows"] == int(m.sum())
        assert math.isclose(
            r["avg_pred_micro"] / 1e6, float(mu[m].mean()) / 1e6, abs_tol=2e-6
        )
        assert math.isclose(
            r["obs_rate_micro"] / 1e6, float(y[m].mean()), abs_tol=2e-6
        )
        # bin containment: the mean prediction lies inside the decile
        assert bi * 100_000 <= r["avg_pred_micro"] <= (bi + 1) * 100_000
        n_total += r["n_rows"]
        ece += r["n_rows"] * abs(r["gap_micro"]) / 1e6
    assert set(rows) == set(int(b_) for b_ in set(bins))
    ece /= n_total
    # the channel's labels come FROM the same sigmoid family, so the fitted
    # model must be reasonably calibrated — ECE under 10 points
    assert ece < 0.10, ece


def test_bootstrap_ci_matches_hashlib_replicas(spark):
    """Law test: re-draw every Poisson replicate weight independently with
    hashlib + the embedded CDF literals, recompute all 32 replicate means
    and the order-statistic CI in pure Python, and require exact integer
    agreement; pin the statistical sanity (lo <= point mean <= hi for every
    language on this fixture)."""
    import hashlib

    from movie_genre_data_pipeline_spark.suite.sampling_queries import (
        BOOT_B,
        _POISSON1_CDF,
    )

    sf = "/root/testdata/sf0.001"
    rows = {
        r["lang"]: r
        for r in all_queries()["sample_bootstrap_ci"].fn(spark, sf).collect()
    }
    quality = {
        r["doc_id"]: round(r["quality"] * 1e6)
        for r in all_queries()["text_quality_scores"].fn(spark, sf).collect()
    }
    con = duckdb.connect()
    langs = con.sql(
        f"SELECT doc_id, lang FROM '{sf}/documents.parquet'"
    ).fetchall()
    cdf = [float(t) for t in _POISSON1_CDF]

    def draw_k(doc_id: int, r: int) -> int:
        u = (
            int(hashlib.md5(f"{doc_id}:boot:{r}".encode()).hexdigest()[:12], 16)
            / 281474976710656.0
        )
        for k, t in enumerate(cdf):
            if u < t:
                return k
        return 7

    by_lang: dict[str, list[int]] = {}
    for doc_id, lang in langs:
        by_lang.setdefault(lang, []).append(doc_id)
    for lang, ids in by_lang.items():
        means = []
        for r in range(BOOT_B):
            sk = skq = 0
            for doc_id in ids:
                k = draw_k(doc_id, r)
                sk += k
                skq += k * quality[doc_id]
            means.append(int(skq / sk + 0.5) if sk > 0 else 0)
        means.sort()
        row = rows[lang]
        assert row["n_docs"] == len(ids)
        assert row["n_replicates"] == BOOT_B
        assert row["ci_lo_micro"] == means[1], (lang, row["ci_lo_micro"], means[1])
        assert row["ci_hi_micro"] == means[BOOT_B - 2]
        point = int(sum(quality[d] for d in ids) / len(ids) + 0.5)
        assert row["mean_micro"] == point
        assert row["ci_lo_micro"] <= point <= row["ci_hi_micro"]


def test_brier_decomposition_matches_numpy_and_murphy_identity(spark):
    """Law test: rebuild the scored rows independently (numpy sigmoid under
    the published final betas), recompute the raw Brier score and every
    Murphy component from scratch, and require agreement to the quantization
    floor; then pin the Murphy identity itself — brier = reliability −
    resolution + uncertainty + within_bin − 2·within_cov (the generalized
    form with raw, non-constant within-bin predictions) — to the
    stacked-rounding tolerance of its independent micro quantizations."""
    import numpy as np

    sf = "/root/testdata/sf0.001"
    row = all_queries()["feat_brier_decomposition"].fn(spark, sf).collect()[0]
    traj = {
        r["iter"]: r
        for r in all_queries()["feat_logreg_recovery"].fn(spark, sf).collect()
    }
    b = traj[max(traj)]
    con = duckdb.connect()
    feats = con.sql(
        f"""SELECT CAST(o_orderkey % 180 + 60 AS BIGINT),
               CAST(o_custkey % 25 AS BIGINT),
               CAST(concat('0x', substring(md5(o_orderkey || ':logreg'), 1, 12))
                 AS BIGINT)
        FROM '{sf}/orders.parquet'"""
    ).fetchall()
    x1 = np.array([f[0] for f in feats], dtype=np.float64)
    x2 = np.array([f[1] for f in feats], dtype=np.float64)
    u = np.array([f[2] for f in feats], dtype=np.float64) / 281474976710656.0
    zt = (-2_000_000 + 30_000 * x1 - 150_000 * x2) / 1e6
    y = (u < 1.0 / (1.0 + np.exp(-zt))).astype(np.float64)
    z = (b["b0_micro"] + b["b1_micro"] * x1 + b["b2_micro"] * x2) / 1e6
    mu = np.clip(np.round(1e6 / (1.0 + np.exp(-z))), 1, 999_999)
    p = mu / 1e6
    n = len(y)
    assert row["n_rows"] == n
    ybar = y.mean()
    assert math.isclose(row["ybar_micro"] / 1e6, ybar, abs_tol=2e-6)
    brier = float(((p - y) ** 2).mean())
    assert math.isclose(row["brier_micro"] / 1e6, brier, abs_tol=2e-6)
    assert math.isclose(
        row["unc_micro"] / 1e6, ybar * (1 - ybar), abs_tol=3e-6
    )
    bins = (mu // 100_000).astype(int)
    rel = res = wb = wc = 0.0
    for bi in sorted(set(bins)):
        m = bins == bi
        rel += m.sum() * float((p[m].mean() - y[m].mean()) ** 2)
        res += m.sum() * float((y[m].mean() - ybar) ** 2)
        wb += float(((p[m] - p[m].mean()) ** 2).sum())
        wc += float(((p[m] - p[m].mean()) * (y[m] - y[m].mean())).sum())
    assert math.isclose(row["reliability_micro"] / 1e6, rel / n, abs_tol=3e-6)
    assert math.isclose(row["resolution_micro"] / 1e6, res / n, abs_tol=3e-6)
    assert math.isclose(row["within_bin_micro"] / 1e6, wb / n, abs_tol=3e-6)
    assert math.isclose(row["within_cov_micro"] / 1e6, wc / n, abs_tol=3e-6)
    # the generalized Murphy identity, on the published integers
    lhs = row["brier_micro"]
    rhs = (
        row["reliability_micro"]
        - row["resolution_micro"]
        + row["unc_micro"]
        + row["within_bin_micro"]
        - 2 * row["within_cov_micro"]
    )
    assert abs(lhs - rhs) <= 12, (lhs, rhs)
    # a useful classifier resolves more than it miscalibrates
    assert row["resolution_micro"] > 0


def test_gini_concentration_matches_numpy(spark):
    """Law test: rebuild the per-customer cent totals independently in
    DuckDB, recompute the Gini rank identity and both top shares in numpy,
    and require agreement to the quantization floor; pin the range laws
    (0 <= G < 1, top10 share >= top1 share >= its population floor)."""
    import numpy as np

    sf = "/root/testdata/sf0.001"
    row = all_queries()["ops_gini_concentration"].fn(spark, sf).collect()[0]
    con = duckdb.connect()
    cents = np.array(
        [
            r[0]
            for r in con.sql(
                f"""SELECT CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                       AS BIGINT)
                FROM '{sf}/orders.parquet' GROUP BY o_custkey"""
            ).fetchall()
        ],
        dtype=np.int64,
    )
    x = np.sort(cents)
    n, t = len(x), int(x.sum())
    assert row["n_customers"] == n and row["total_cents"] == t
    i = np.arange(1, n + 1, dtype=np.float64)
    gini = (2.0 * float((i * x).sum()) - (n + 1) * t) / (n * t)
    assert math.isclose(row["gini_micro"] / 1e6, gini, abs_tol=2e-6)
    k1, k10 = max(1, n // 100), n // 10
    top1 = float(x[n - k1 :].sum()) / t
    top10 = float(x[n - k10 :].sum()) / t if k10 else 0.0
    assert math.isclose(row["top1pct_share_micro"] / 1e6, top1, abs_tol=2e-6)
    assert math.isclose(row["top10pct_share_micro"] / 1e6, top10, abs_tol=2e-6)
    assert 0 <= row["gini_micro"] < 1_000_000
    assert row["top10pct_share_micro"] >= row["top1pct_share_micro"]
    # the top 10% cannot hold less than 10% of a nonnegative distribution
    assert row["top10pct_share_micro"] >= 100_000 - 1


def test_mann_kendall_matches_numpy(spark):
    """Law test: rebuild the dense daily series independently in DuckDB,
    recompute S, the tie-corrected variance, the continuity-corrected z, and
    the Theil-Sen lower-median slope in pure numpy, and require agreement to
    the quantization floor; pin the pair-count identity and the sign law
    (z and the Sen slope agree in sign when both are nonzero)."""
    import numpy as np

    sf = "/root/testdata/sf0.001"
    row = all_queries()["ts_mann_kendall"].fn(spark, sf).collect()[0]
    con = duckdb.connect()
    day_counts = dict(
        con.sql(
            f"""SELECT CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS d,
                   COUNT(*)
            FROM '{sf}/events.parquet' GROUP BY 1"""
        ).fetchall()
    )
    lo, hi = min(day_counts), max(day_counts)
    x = np.array([day_counts.get(d, 0) for d in range(lo, hi + 1)], dtype=np.int64)
    n = len(x)
    assert row["n_days"] == n
    assert row["n_pairs"] == n * (n - 1) // 2
    s = 0
    slopes = []
    for i in range(n):
        for j in range(i + 1, n):
            s += int(np.sign(x[j] - x[i]))
            slopes.append(
                math.floor((int(x[j]) - int(x[i])) * 1e6 / (j - i) + 0.5)
            )
    assert row["s_stat"] == s
    _, t = np.unique(x, return_counts=True)
    var18 = n * (n - 1) * (2 * n + 5) - int((t * (t - 1) * (2 * t + 5)).sum())
    assert row["var18"] == var18
    var = var18 / 18.0
    z = (s - 1) / math.sqrt(var) if s > 0 else (s + 1) / math.sqrt(var) if s < 0 else 0.0
    assert math.isclose(row["z_micro"] / 1e6, z, abs_tol=2e-6)
    slopes.sort()
    assert row["sen_slope_micro"] == slopes[(len(slopes) + 1) // 2 - 1]
    if row["z_micro"] != 0 and row["sen_slope_micro"] != 0:
        assert (row["z_micro"] > 0) == (row["sen_slope_micro"] > 0)


def test_chi2_independence_matches_numpy(spark):
    """Law test: rebuild the lang×source contingency independently in
    DuckDB, recompute χ² (zero cells included) and Cramér's V in numpy, and
    require agreement to the quantization floor; pin the grid identity
    (n_cells = |X|·|Y|) and the V range law (0 <= V <= 1)."""
    import numpy as np

    sf = "/root/testdata/sf0.001"
    row = all_queries()["feat_chi2_independence"].fn(spark, sf).collect()[0]
    con = duckdb.connect()
    obs = con.sql(
        f"""SELECT lang, source, COUNT(*)
        FROM '{sf}/documents.parquet' GROUP BY 1, 2"""
    ).fetchall()
    langs = sorted({r[0] for r in obs})
    srcs = sorted({r[1] for r in obs})
    o = np.zeros((len(langs), len(srcs)), dtype=np.int64)
    for lang, src, n in obs:
        o[langs.index(lang), srcs.index(src)] = n
    n = int(o.sum())
    r_tot, c_tot = o.sum(axis=1), o.sum(axis=0)
    e = np.outer(r_tot, c_tot) / n
    chi2 = float(((o - e) ** 2 / e).sum())
    assert row["n_rows"] == n
    assert row["n_cells"] == len(langs) * len(srcs)
    assert row["r_levels"] == len(langs) and row["c_levels"] == len(srcs)
    assert row["dof"] == (len(langs) - 1) * (len(srcs) - 1)
    # per-cell micro quantization: ±0.5µ per grid cell
    assert abs(row["chi2_micro"] / 1e6 - chi2) <= len(langs) * len(srcs) * 5e-7 + 1e-6
    v = math.sqrt(chi2 / (n * (min(len(langs), len(srcs)) - 1)))
    assert math.isclose(row["cramers_v_micro"] / 1e6, v, abs_tol=3e-6)
    assert 0 <= row["cramers_v_micro"] <= 1_000_000


def test_degree_assortativity_matches_numpy(spark):
    """Law test: rebuild the distinct supplier-customer edge list in DuckDB,
    recompute the across-edges degree correlation in numpy, and require
    agreement to the quantization floor; pin the range law (|r| <= 1) and
    the moment identities (n_edges = Σ deg on either side)."""
    import numpy as np

    sf = "/root/testdata/sf0.001"
    row = (
        all_queries()["graph_degree_assortativity"].fn(spark, sf).collect()[0]
    )
    con = duckdb.connect()
    edges = con.sql(
        f"""SELECT DISTINCT CAST(l.l_suppkey AS BIGINT),
               CAST(o.o_custkey AS BIGINT)
        FROM '{sf}/lineitem.parquet' l
        JOIN '{sf}/orders.parquet' o ON o.o_orderkey = l.l_orderkey"""
    ).fetchall()
    from collections import Counter

    sdeg = Counter(e[0] for e in edges)
    cdeg = Counter(e[1] for e in edges)
    x = np.array([sdeg[e[0]] for e in edges], dtype=np.float64)
    y = np.array([cdeg[e[1]] for e in edges], dtype=np.float64)
    assert row["n_edges"] == len(edges)
    assert row["n_suppliers"] == len(sdeg)
    assert row["n_customers"] == len(cdeg)
    r = float(np.corrcoef(x, y)[0, 1])
    assert math.isclose(row["assortativity_micro"] / 1e6, r, abs_tol=2e-6)
    assert -1_000_000 <= row["assortativity_micro"] <= 1_000_000


def test_conformal_threshold_matches_numpy_and_coverage_law(spark):
    """Law test: rebuild the nonconformity scores independently (numpy
    sigmoid under the published final betas), recompute the split-conformal
    order statistic and the test coverage in pure Python, and require exact
    integer agreement; then pin the conformal guarantee itself — measured
    test coverage within sampling slack of the 1−α target (the whole point
    of the wrapper), and the rank/threshold consistency laws."""
    import numpy as np

    sf = "/root/testdata/sf0.001"
    row = (
        all_queries()["feat_conformal_threshold"].fn(spark, sf).collect()[0]
    )
    traj = {
        r["iter"]: r
        for r in all_queries()["feat_logreg_recovery"].fn(spark, sf).collect()
    }
    b = traj[max(traj)]
    con = duckdb.connect()
    feats = con.sql(
        f"""SELECT CAST(o_orderkey AS BIGINT),
               CAST(o_orderkey % 180 + 60 AS BIGINT),
               CAST(o_custkey % 25 AS BIGINT),
               CAST(concat('0x', substring(md5(o_orderkey || ':logreg'), 1, 12))
                 AS BIGINT)
        FROM '{sf}/orders.parquet'"""
    ).fetchall()
    k = np.array([f[0] for f in feats], dtype=np.int64)
    x1 = np.array([f[1] for f in feats], dtype=np.float64)
    x2 = np.array([f[2] for f in feats], dtype=np.float64)
    u = np.array([f[3] for f in feats], dtype=np.float64) / 281474976710656.0
    zt = (-2_000_000 + 30_000 * x1 - 150_000 * x2) / 1e6
    y = (u < 1.0 / (1.0 + np.exp(-zt))).astype(np.int64)
    z = (b["b0_micro"] + b["b1_micro"] * x1 + b["b2_micro"] * x2) / 1e6
    mu = np.clip(np.round(1e6 / (1.0 + np.exp(-z))), 1, 999_999).astype(np.int64)
    r = np.abs(1_000_000 * y - mu)
    cal_mask = k % 2 == 0
    cal = sorted(zip(r[cal_mask].tolist(), k[cal_mask].tolist()))
    n_cal = len(cal)
    assert row["n_cal"] == n_cal
    q_rank = (9 * (n_cal + 1) + 9) // 10
    assert row["q_rank"] == q_rank
    q = cal[q_rank - 1][0]
    assert row["q_micro"] == q
    test_r = r[~cal_mask]
    assert row["n_test"] == len(test_r)
    covered = int((test_r <= q).sum())
    assert row["n_covered"] == covered
    assert row["coverage_micro"] == math.floor(
        covered * 1e6 / len(test_r) + 0.5
    )
    # the conformal guarantee: coverage ~ 1−α, within binomial slack
    slack = 4.0 * math.sqrt(0.1 * 0.9 / len(test_r))
    assert row["coverage_micro"] / 1e6 >= 0.9 - slack, (
        row["coverage_micro"],
        slack,
    )
    assert 0 <= row["q_micro"] <= 1_000_000


def test_neyman_allocation_matches_numpy_and_sums_to_budget(spark):
    """Law test: rebuild the per-language n_chars moments independently in
    DuckDB, recompute S_h, the Neyman weights, and the Hamilton
    apportionment in pure Python, and require exact integer agreement; pin
    the budget identity (Σ alloc == n, the point of largest-remainder) and
    the proportionality law (allocations ordered like the weights, up to
    the one-seat remainder)."""
    import numpy as np

    sf = "/root/testdata/sf0.001"
    rows = {
        r["lang"]: r
        for r in all_queries()["sample_neyman_allocation"].fn(spark, sf).collect()
    }
    con = duckdb.connect()
    facts = con.sql(
        f"""SELECT lang, COUNT(*), SUM(n_chars),
               SUM(CAST(n_chars AS HUGEINT) * n_chars)
        FROM '{sf}/documents.parquet' GROUP BY 1"""
    ).fetchall()
    budget = 1000
    w = {}
    for lang, n, sx, sxx in facts:
        if n > 1:
            var = (n * float(sxx) - float(sx) ** 2) / (n * (n - 1))
            std_micro = math.floor(math.sqrt(var) * 1e6 + 0.5)
        else:
            std_micro = 0
        assert rows[lang]["n_docs"] == n
        assert rows[lang]["std_micro"] == std_micro
        w[lang] = n * std_micro
    tw = sum(w.values())
    base = {l: (budget * wl) // tw for l, wl in w.items()}
    rem = {l: (budget * wl) % tw for l, wl in w.items()}
    seats = budget - sum(base.values())
    order = sorted(w, key=lambda l: (-rem[l], l))
    alloc = {
        l: base[l] + (1 if i < seats else 0) for i, l in enumerate(order)
    }
    for lang in w:
        assert rows[lang]["w_micro"] == w[lang]
        assert rows[lang]["alloc"] == alloc[lang], lang
    assert sum(r["alloc"] for r in rows.values()) == budget
    # proportionality: a strictly heavier stratum never gets 2+ fewer seats
    for a in w:
        for b in w:
            if w[a] > w[b]:
                assert rows[a]["alloc"] >= rows[b]["alloc"] - 1


def test_hill_tail_index_matches_numpy(spark):
    """Law test: rebuild the length ranking independently in DuckDB,
    recompute the Hill estimator and its alpha in numpy, and require
    agreement to the quantization floor; pin the positivity laws (every
    log-ratio term >= 0, alpha > 0) and the threshold identity."""
    import numpy as np

    sf = "/root/testdata/sf0.001"
    row = all_queries()["text_hill_tail_index"].fn(spark, sf).collect()[0]
    con = duckdb.connect()
    x = np.array(
        [
            r[0]
            for r in con.sql(
                f"SELECT n_chars FROM '{sf}/documents.parquet'"
            ).fetchall()
        ],
        dtype=np.int64,
    )
    xs = np.sort(x)[::-1]
    k = 200
    thr = int(xs[k])
    assert row["n_docs"] == len(x)
    assert row["k"] == k
    assert row["threshold_chars"] == thr
    terms = [
        math.floor(math.log(int(v) / thr) * 1e6 + 0.5) for v in xs[:k]
    ]
    assert all(t >= 0 for t in terms)
    hill = math.floor(sum(terms) / k + 0.5)
    assert row["hill_micro"] == hill
    assert row["alpha_micro"] == math.floor(1e12 / hill + 0.5)
    h_float = float(np.log(xs[:k].astype(np.float64) / thr).mean())
    assert math.isclose(row["hill_micro"] / 1e6, h_float, abs_tol=2e-6)
    assert row["alpha_micro"] > 0


def test_rank_tau_matches_pure_python(spark):
    """Law test: rebuild both decile assignments independently (DuckDB DSIR
    scores + quality scores, NTILE replayed in pure Python), recompute
    concordant/discordant/tie masses from the contingency cells, and require
    exact integer agreement on n/cells and quantization-floor agreement on
    tau; pin the range law |tau_b| <= 1 and the grid bound n_cells <= 100."""
    sf = "/root/testdata/sf0.001"
    row = all_queries()["feat_rank_tau"].fn(spark, sf).collect()[0]
    from movie_genre_data_pipeline_spark.suite.sampling_queries import (
        _dsir_w_ctes,
    )
    from movie_genre_data_pipeline_spark.suite.text_queries import (
        Q_QUALITY_SCORES_ORACLE,
    )

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    pairs = con.sql(
        f"""WITH {_dsir_w_ctes()},
        q AS ({Q_QUALITY_SCORES_ORACLE})
        SELECT w.doc_id, w.logw_micro,
               CAST(ROUND(q.quality * 1000000.0) AS BIGINT)
        FROM w JOIN q ON q.doc_id = w.doc_id"""
    ).fetchall()

    def ntile(keyed, tiles=10):
        order = sorted(keyed)
        n = len(order)
        base, rem = n // tiles, n % tiles
        out = {}
        pos = 0
        for t in range(1, tiles + 1):
            size = base + (1 if t <= rem else 0)
            for _, doc in order[pos : pos + size]:
                out[doc] = t
            pos += size
        return out

    bx = ntile([(p[1], p[0]) for p in pairs])
    by = ntile([(p[2], p[0]) for p in pairs])
    from collections import Counter

    cells = Counter((bx[p[0]], by[p[0]]) for p in pairs)
    assert row["n_docs"] == len(pairs)
    assert row["n_cells"] == len(cells)
    assert row["n_cells"] <= 100
    conc = disc = 0
    items = list(cells.items())
    for (x1, y1), n1 in items:
        for (x2, y2), n2 in items:
            if x2 > x1 and y2 > y1:
                conc += n1 * n2
            elif x2 > x1 and y2 < y1:
                disc += n1 * n2
    n = len(pairs)
    n0 = n * (n - 1) // 2
    tx = sum(
        v * (v - 1) // 2 for v in Counter(bx.values()).values()
    )
    ty = sum(
        v * (v - 1) // 2 for v in Counter(by.values()).values()
    )
    tau = (conc - disc) / math.sqrt((n0 - tx) * (n0 - ty))
    assert math.isclose(row["tau_b_micro"] / 1e6, tau, abs_tol=2e-6)
    assert -1_000_000 <= row["tau_b_micro"] <= 1_000_000
    # the grid-rho companion: count-weighted Pearson of the decile indices
    import numpy as np

    bxv = np.array([bx[p[0]] for p in pairs], dtype=np.float64)
    byv = np.array([by[p[0]] for p in pairs], dtype=np.float64)
    rho = float(np.corrcoef(bxv, byv)[0, 1])
    assert math.isclose(row["grid_rho_micro"] / 1e6, rho, abs_tol=2e-6)
    assert -1_000_000 <= row["grid_rho_micro"] <= 1_000_000
    # the two rank correlations must agree in sign on a real association
    if abs(row["tau_b_micro"]) > 50_000:
        assert (row["tau_b_micro"] > 0) == (row["grid_rho_micro"] > 0)


def test_minhash_calibration_is_unbiased_in_the_mean(spark):
    """Law test (Broder's theorem, empirically): over the LSH candidate
    pairs, the MinHash estimate matches/H is an unbiased estimator of the
    exact Jaccard — so the PAIR-WEIGHTED global bias must sit within a few
    standard errors of zero (var <= J(1-J)/H per pair, H = 12), and every
    published bin must satisfy the bin-edge containment law (the mean claim
    lies inside its decile)."""
    sf = "/root/testdata/sf0.001"
    rows = (
        all_queries()["dedup_minhash_calibration"].fn(spark, sf).collect()
    )
    n = sum(r["n_pairs"] for r in rows)
    assert n > 0
    global_bias = (
        sum(r["n_pairs"] * r["bias_micro"] for r in rows) / n / 1e6
    )
    # per-pair std <= sqrt(0.25/12) ~ 0.144; allow 4 standard errors
    se = 0.144 / math.sqrt(n)
    assert abs(global_bias) <= 4 * se + 1e-5, (global_bias, se, n)
    for r in rows:
        lo, hi = r["bin"] * 100_000, (r["bin"] + 1) * 100_000
        if r["bin"] == 9:
            hi = 1_000_001
        assert lo <= r["mean_est_micro"] < hi + 1, r
        assert 0 <= r["mean_true_micro"] <= 1_000_000


def test_srm_check_matches_hashlib(spark):
    """Law test: re-assign every user's arm independently with hashlib and
    the embedded 50% threshold, recompute the two-arm goodness-of-fit χ²
    and |z| in pure Python, and require exact integer agreement; pin the
    collapse identity χ² = (n_t − n_c)²/N and the verdict consistency law
    (the flag IS the threshold compare — on a small fixture population a
    fair split legitimately flags ~5% of the time, so the verdict itself
    is not a law; rough balance is)."""
    import hashlib

    sf = "/root/testdata/sf0.001"
    row = all_queries()["ab_srm_check"].fn(spark, sf).collect()[0]
    from movie_genre_data_pipeline_spark.functions.sampling import hex_threshold

    t50 = hex_threshold(0.5)
    con = duckdb.connect()
    users = [
        r[0]
        for r in con.sql(
            f"SELECT DISTINCT user_id FROM '{sf}/events.parquet'"
        ).fetchall()
    ]
    n_t = sum(
        1
        for u in users
        if hashlib.md5(f"{u}:ab".encode()).hexdigest() < t50
    )
    n_c = len(users) - n_t
    assert row["n_users"] == len(users)
    assert row["n_c"] == n_c and row["n_t"] == n_t
    chi2 = math.floor((n_t - n_c) ** 2 * 1e6 / len(users) + 0.5)
    assert row["chi2_micro"] == chi2
    assert row["z_micro"] == math.floor(
        math.sqrt(chi2 / 1e6) * 1e6 + 0.5
    )
    assert row["srm_flag"] == (chi2 > 3_841_459)
    # rough-balance sanity only where the LLN has any grip (sf0.001 has
    # just 15 distinct users — a 3/12 split there is unremarkable)
    if len(users) >= 200:
        assert min(n_c, n_t) >= 0.3 * len(users), (n_c, n_t)


def test_readability_ari_matches_pure_python(spark):
    """Law test: recompute every document's ARI from scratch with the same
    count definitions (whitespace tokens, summed token lengths, [.!?]
    characters floored at 1) in pure Python, and require exact integer
    agreement on every per-language row; pin the hard-share identity."""
    sf = "/root/testdata/sf0.001"
    rows = {
        r["lang"]: r
        for r in all_queries()["text_readability_ari"].fn(spark, sf).collect()
    }
    con = duckdb.connect()
    docs = con.sql(
        f"SELECT lang, text FROM '{sf}/documents.parquet'"
    ).fetchall()
    from collections import defaultdict

    agg = defaultdict(lambda: [0, 0, 0])  # n, sum_ari, n_hard
    for lang, text in docs:
        toks = [t for t in __import__("re").split(r"[ \t\n\r\f\v]+", text) if t]
        w = len(toks)
        if w == 0:
            continue
        c = sum(len(t) for t in toks)
        s = max(1, sum(1 for ch in text if ch in ".!?"))
        ari = math.floor((4.71 * c / w + 0.5 * w / s - 21.43) * 1e6 + 0.5)
        agg[lang][0] += 1
        agg[lang][1] += ari
        agg[lang][2] += 1 if ari >= 14_000_000 else 0
    assert set(rows) == set(agg)
    for lang, (n, sum_ari, n_hard) in agg.items():
        r = rows[lang]
        assert r["n_docs"] == n
        assert r["mean_ari_micro"] == math.floor(sum_ari / n + 0.5)
        assert r["n_hard"] == n_hard
        assert r["hard_share_micro"] == math.floor(n_hard * 1e6 / n + 0.5)


def test_harmonic_centrality_matches_pure_python_bfs(spark):
    """Law test: rebuild the nation trade edge list in DuckDB, run a plain
    BFS per source in pure Python (hop cap 3, matching the recursion), and
    require exact integer agreement on reach counts and harmonic sums; pin
    the range law (harmonic <= 1e6 * (|nodes|-1)) and the reachability
    consistency (n_reached matches the BFS frontier size)."""
    sf = "/root/testdata/sf0.001"
    rows = {
        r["nation"]: r
        for r in all_queries()["graph_harmonic_centrality"].fn(spark, sf).collect()
    }
    con = duckdb.connect()
    edges = con.sql(
        f"""SELECT DISTINCT ns.n_name, nc.n_name
        FROM '{sf}/lineitem.parquet' l
        JOIN '{sf}/supplier.parquet' s ON s.s_suppkey = l.l_suppkey
        JOIN '{sf}/orders.parquet' o ON o.o_orderkey = l.l_orderkey
        JOIN '{sf}/customer.parquet' c ON c.c_custkey = o.o_custkey
        JOIN '{sf}/nation.parquet' ns ON ns.n_nationkey = s.s_nationkey
        JOIN '{sf}/nation.parquet' nc ON nc.n_nationkey = c.c_nationkey
        WHERE ns.n_name <> nc.n_name"""
    ).fetchall()
    from collections import defaultdict

    adj = defaultdict(set)
    nodes = set()
    for a, b in edges:
        adj[a].add(b)
        nodes.update((a, b))
    assert set(rows) == nodes
    for s in nodes:
        dist = {s: 0}
        frontier = [s]
        for hop in range(1, 4):
            nxt = []
            for u in frontier:
                for v in adj[u]:
                    if v not in dist:
                        dist[v] = hop
                        nxt.append(v)
            frontier = nxt
        reached = [d for d in dist.values() if d > 0]
        h = sum(math.floor(1e6 / d + 0.5) for d in reached)
        assert rows[s]["n_reached"] == len(reached), s
        assert rows[s]["harmonic_micro"] == h, s
        assert rows[s]["harmonic_micro"] <= 1_000_000 * (len(nodes) - 1)


def test_auc_source_ablation_partitions_and_delta_laws(spark):
    """Law test: the '__full__' sentinel row evaluates the whole corpus
    (n_pos + n_neg == |docs|) under the un-ablated model and must equal
    feat_auc_report's point estimate on the same fixture; every ablated
    row excludes exactly its source's docs (n_pos + n_neg == |docs| −
    |source|); delta_micro is exactly base − ablated; and the full row's
    delta is 0."""
    sf = "/root/testdata/sf0.001"
    rows = {
        r["ablated_source"]: r
        for r in all_queries()["feat_auc_source_ablation"].fn(spark, sf).collect()
    }
    auc_full = (
        all_queries()["feat_auc_report"].fn(spark, sf).collect()[0]["auc_micro"]
    )
    con = duckdb.connect()
    sizes = dict(
        con.sql(
            f"SELECT source, COUNT(*) FROM '{sf}/documents.parquet' GROUP BY 1"
        ).fetchall()
    )
    n_docs = sum(sizes.values())
    full = rows["__full__"]
    assert full["n_pos"] + full["n_neg"] == n_docs
    assert full["auc_micro"] == auc_full
    assert full["delta_micro"] == 0
    assert set(rows) == set(sizes) | {"__full__"}
    for src, n in sizes.items():
        r = rows[src]
        assert r["n_pos"] + r["n_neg"] == n_docs - n, src
        assert r["delta_micro"] == full["auc_micro"] - r["auc_micro"], src


def test_pq_distortion_matches_numpy(spark):
    """Law test: retrain the codebooks independently (pq_train_local on the
    same 512-row sample), recompute every vector's per-subspace quantization
    error in numpy, and require exact integer agreement on the quantized
    sums and maxima; pin the geometry law (m rows, every mse <= its
    subspace max) and the nonnegativity of every error."""
    import numpy as np

    sf = "/root/testdata/sf0.001"
    rows = {
        r["subspace"]: r
        for r in all_queries()["sim_pq_distortion"].fn(spark, sf).collect()
    }
    con = duckdb.connect()
    vecs = con.sql(
        f"""SELECT vec_id,
               list_transform(embedding::DOUBLE[], x -> round(x * 1000000.0))
        FROM '{sf}/embeddings.parquet' ORDER BY vec_id"""
    ).fetchall()
    from movie_genre_data_pipeline_spark.functions.pq import pq_train_local
    from movie_genre_data_pipeline_spark.suite.similarity_queries import (
        DIM,
        IVF_TRAIN,
        PQ_ITERS,
        PQ_K,
        PQ_M,
    )

    train = [(v[0], list(v[1])) for v in vecs[:IVF_TRAIN]]
    books = pq_train_local(train, DIM, PQ_M, PQ_K, PQ_ITERS)
    dsub = DIM // PQ_M
    x = np.array([v[1] for v in vecs], dtype=np.float64)
    assert set(rows) == set(range(PQ_M))
    for j in range(PQ_M):
        sub = x[:, j * dsub : (j + 1) * dsub]
        cents = np.array(books[j], dtype=np.float64)
        d = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        e = np.floor(d.min(axis=1) + 0.5).astype(np.int64)
        r = rows[j]
        assert r["n_vectors"] == len(vecs)
        assert r["mse"] == math.floor(int(e.sum()) / len(vecs) + 0.5), j
        assert r["max_sqerr"] == int(e.max()), j
        assert 0 <= r["mse"] <= r["max_sqerr"]


def test_pps_systematic_matches_pure_python_and_telescopes(spark):
    """Law test: replay the systematic walk in pure Python (doc_id order,
    exclusive prefix sums, integer point arithmetic) and require exact
    per-language agreement; pin the telescoping identity Σ points == n
    (the design's defining property) and the PPS monotonicity sanity
    (selected docs can never outnumber selection points)."""
    sf = "/root/testdata/sf0.001"
    rows = {
        r["lang"]: r
        for r in all_queries()["sample_pps_systematic"].fn(spark, sf).collect()
    }
    con = duckdb.connect()
    docs = con.sql(
        f"""SELECT doc_id, lang, CAST(n_chars AS BIGINT)
        FROM '{sf}/documents.parquet' ORDER BY doc_id"""
    ).fetchall()
    n = 1000
    t = sum(d[2] for d in docs)
    from collections import defaultdict

    agg = defaultdict(lambda: [0, 0, 0, 0])
    cum = 0
    total_points = 0
    for _, lang, sz in docs:
        pts = ((cum + sz) * n) // t - (cum * n) // t
        cum += sz
        total_points += pts
        a = agg[lang]
        a[0] += 1
        a[1] += sz
        a[2] += pts
        a[3] += 1 if pts >= 1 else 0
    assert total_points == n
    assert set(rows) == set(agg)
    for lang, (nd, tsz, np_, nsel) in agg.items():
        r = rows[lang]
        assert (r["n_docs"], r["total_size"], r["n_points"], r["n_sel_docs"]) == (
            nd,
            tsz,
            np_,
            nsel,
        ), lang
        assert r["n_sel_docs"] <= r["n_points"]
    assert sum(r["n_points"] for r in rows.values()) == n


def test_hll_set_algebra_laws(spark):
    """Law test: the union estimate must be monotone (>= each side's
    estimate — register max can only raise registers), the I-E intersection
    must equal est_a + est_b − est_union exactly (on the published
    2-decimal numbers), the exact columns must satisfy inclusion-exclusion
    as an identity, and every estimate must sit within the sketch's
    documented error band of its exact truth (~1.04/√256 ≈ 6.5%; allow 4σ
    on the fixture's small populations)."""
    sf = "/root/testdata/sf0.001"
    r = all_queries()["sketch_hll_set_algebra"].fn(spark, sf).collect()[0]
    assert r["exact_a"] + r["exact_b"] - r["exact_union"] == r["exact_intersect"]
    assert r["est_union"] >= r["est_a"] - 1e-9
    assert r["est_union"] >= r["est_b"] - 1e-9
    assert math.isclose(
        r["est_intersect"], r["est_a"] + r["est_b"] - r["est_union"], abs_tol=0.011
    )
    for est, exact in (
        (r["est_a"], r["exact_a"]),
        (r["est_b"], r["exact_b"]),
        (r["est_union"], r["exact_union"]),
    ):
        assert abs(est - exact) <= max(5.0, 0.26 * exact), (est, exact)
