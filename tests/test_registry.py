"""Registry-order contract: the driver's correctness gate samples the first 50
entries of ``queries()``, so declaration order is load-bearing (VERDICT r01 #1).

No SparkSession needed — these pin pure-Python registry invariants.
"""

import pytest

from movie_genre_data_pipeline_spark.suite import (
    DRIVER_WINDOW,
    NEXT_ROUND_POOL,
    all_queries,
)


def test_driver_window_is_first_50():
    names = list(all_queries())
    assert len(DRIVER_WINDOW) == 50
    assert names[:50] == list(DRIVER_WINDOW)


def test_driver_window_all_oracled():
    q = all_queries()
    unoracled = [n for n in DRIVER_WINDOW if q[n].oracle is None]
    assert unoracled == []


def test_rows_only_queries_sorted_last():
    q = all_queries()
    names = list(q)
    first_rows_only = next(
        (i for i, n in enumerate(names) if q[n].oracle is None), len(names)
    )
    # every entry after the first rows-only query is also rows-only
    assert all(q[n].oracle is None for n in names[first_rows_only:])
    assert first_rows_only >= 50


def test_documented_query_counts_match_registry():
    """README/COVERAGE advertise the registry size; both rounds 4 and 5 shipped
    stale counts, so pin the documented numbers to ``all_queries()`` — this
    test fails the moment the docs and the registry diverge (VERDICT r05 #3)."""
    import re
    from pathlib import Path

    q = all_queries()
    total, oracled = len(q), sum(1 for s in q.values() if s.oracle is not None)
    root = Path(__file__).resolve().parent.parent

    readme = (root / "README.md").read_text()
    m = re.search(r"(\d+) named queries.*?\((\d+) oracle-checked", readme, re.S)
    assert m, "README.md no longer states the query counts"
    assert (int(m.group(1)), int(m.group(2))) == (total, oracled), (
        f"README claims {m.group(1)}/{m.group(2)}, registry has {total}/{oracled}"
    )

    coverage = (root / "COVERAGE.md").read_text()
    m = re.search(r"(\d+) queries total; (\d+) oracle-checked", coverage)
    assert m, "COVERAGE.md no longer states the query counts"
    assert (int(m.group(1)), int(m.group(2))) == (total, oracled), (
        f"COVERAGE claims {m.group(1)}/{m.group(2)}, registry has {total}/{oracled}"
    )


def test_rotation_pool_matches_computed_debt():
    """The r8 window comment said '23 r8 additions have no driver record' when
    the truth was 24 (it dropped sample_split_audit) — a hand-maintained count
    that drifted from the registry. Pin the rotation bookkeeping to the
    COMPUTED debt instead: every registry query that has never appeared in any
    CORRECTNESS_r0N.json must be seated in DRIVER_WINDOW now, or explicitly
    queued in NEXT_ROUND_POOL — and NEXT_ROUND_POOL must contain exactly that
    leftover, nothing stale (VERDICT r08 #8)."""
    import json
    from pathlib import Path

    root = Path(__file__).resolve().parent.parent
    recorded: set[str] = set()
    for f in sorted(root.glob("CORRECTNESS_r*.json")):
        recorded.update(json.loads(f.read_text()).keys())
    assert recorded, "no CORRECTNESS_r0N.json found next to the repo root"

    never_checked = {n for n in all_queries() if n not in recorded}
    leftover = never_checked - set(DRIVER_WINDOW)
    assert leftover == set(NEXT_ROUND_POOL), (
        f"never-driver-checked queries not seated in DRIVER_WINDOW and not "
        f"(exactly) queued in NEXT_ROUND_POOL: missing={sorted(leftover - set(NEXT_ROUND_POOL))}, "
        f"stale_pool_entries={sorted(set(NEXT_ROUND_POOL) - leftover)}"
    )


def test_rotation_pool_is_bounded():
    """VERDICT r13 #2: the r13 pool grew to 36 of 50 window slots — one more
    round at that velocity and never-driver-checked debt compounds across
    rounds for the first time. Cap the pool at 14 (the window slack left
    after the r14 pool-drain + rule-(b) seats): new queries must be seated
    in DRIVER_WINDOW immediately, and a wave bigger than the slack has to
    wait for the next round's additions instead of queueing unchecked."""
    assert len(NEXT_ROUND_POOL) <= 14, (
        f"NEXT_ROUND_POOL holds {len(NEXT_ROUND_POOL)} queries (> 14): "
        "throttle new-query velocity — seat additions in DRIVER_WINDOW "
        "immediately or defer them to the next round"
    )


def test_driver_window_samples_every_family():
    # r8: floor relaxed from >=2 to >=1 — the debt-clearing rotation packs 45
    # of 50 slots with fixed-reds + never-driver-checked entries (VERDICT r7
    # #1), leaving 5 canary slots spread one-per-headline-family.
    prefixes = {
        "dedup_": 0,
        "sim_": 0,
        "text_": 0,
        "media_": 0,
        "stream_": 0,
        "tpch_": 0,
    }
    for name in DRIVER_WINDOW:
        for p in prefixes:
            if name.startswith(p):
                prefixes[p] += 1
    assert all(v >= 1 for v in prefixes.values()), prefixes


def test_changed_queries_are_reseated():
    """VERDICT r9 #5: a query whose implementation fingerprint (transitive
    function sources + reachable constants + oracle SQL, suite/_seating.py)
    differs from its last-seated manifest entry must hold a slot in the
    current DRIVER_WINDOW (or be queued in NEXT_ROUND_POOL) — a changed plan
    needs a fresh driver record even when the oracle is unchanged."""
    from movie_genre_data_pipeline_spark.suite import _seating

    stale = _seating.stale_queries()
    seated = set(DRIVER_WINDOW) | set(NEXT_ROUND_POOL)
    unseated = sorted(set(stale) - seated)
    assert unseated == [], (
        f"edited since their last seating but not re-seated: {unseated} "
        f"(rotate them into DRIVER_WINDOW, then run tools/update_seating.py)"
    )


def test_seating_detects_a_synthetic_edit(monkeypatch):
    """The contract must actually fire: perturb one un-seated query's manifest
    fingerprint (equivalent to editing its implementation without re-seating)
    and assert the checker reports exactly that query as stale."""
    from movie_genre_data_pipeline_spark.suite import _seating

    manifest = _seating.load_manifest()
    seated = set(DRIVER_WINDOW) | set(NEXT_ROUND_POOL)
    victim = next(n for n in sorted(manifest) if n not in seated)
    forged = dict(manifest)
    forged[victim] = "0" * 64
    monkeypatch.setattr(_seating, "load_manifest", lambda: forged)
    assert victim in _seating.stale_queries()


def test_bench_headline_set_is_pinned_to_detail():
    """VERDICT r9 #8: the bench headline list grew every round, which makes
    cross-round totals apples-to-oranges and inflates wall-noise
    sensitivity. bench.py's HEADLINE is the single pinned definition; every
    name must exist in the registry, and the committed BENCH_DETAIL.json
    must cover exactly that set — adding a headline query without re-running
    bench.py (or editing the detail file by hand) fails here."""
    import json
    import sys
    from pathlib import Path

    root = Path(__file__).resolve().parent.parent
    sys.path.insert(0, str(root))
    try:
        import bench
    finally:
        sys.path.remove(str(root))

    q = all_queries()
    missing = [n for n in bench.HEADLINE if n not in q]
    assert missing == [], f"HEADLINE names not in the registry: {missing}"

    detail = json.loads((root / "BENCH_DETAIL.json").read_text())
    assert sorted(detail["queries"]) == sorted(bench.HEADLINE), (
        "BENCH_DETAIL.json and bench.HEADLINE diverged — re-run bench.py "
        "after any headline change"
    )


@pytest.mark.slow  # r16 driver-budget: heavy member; runs in the -m slow pass
def test_fingerprints_ignore_runtime_module_state():
    """The full r10 pytest run flipped all 231 unseated fingerprints because
    shipping's _zip_path/_shipped cache (set the first time any query runs)
    leaked into the name map. Fingerprints are source-derived now: mutate
    exactly those globals and assert no fingerprint moves."""
    import movie_genre_data_pipeline_spark.shipping as sh
    from movie_genre_data_pipeline_spark.suite import _seating

    before = _seating.live_fingerprints()
    old_zip, old_shipped = sh._zip_path, set(sh._shipped)
    try:
        sh._zip_path = "/tmp/fake_runtime_state.zip"
        sh._shipped.add(("app-synthetic", 1))
        if hasattr(_seating, "_NAME_MAP"):
            del _seating._NAME_MAP  # force a rebuild under the mutated state
        after = _seating.live_fingerprints()
    finally:
        sh._zip_path, sh._shipped = old_zip, old_shipped
        if hasattr(_seating, "_NAME_MAP"):
            del _seating._NAME_MAP
    assert before == after
