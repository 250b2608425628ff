"""Slowly-Changing-Dimension Type 2 — MERGE with validity intervals, as one
windowed pass over plain DataFrames (SURVEY.md §2.6 extension).

The reference's bronze `status` state machine (new → loaded|quarantined →
loaded; operations/operations.py:112-129, Batch_notebook/main.py:58) is SCD
Type 1: each MERGE overwrites the attribute and the history is gone. The
standard warehouse pattern the reference's Silver dimensions would need next is
Type 2 — keep every version with an [eff_from, eff_to) validity interval and an
`is_current` flag. Delta implements this as a multi-clause MERGE that updates
the old version's eff_to and inserts the new one; without Delta (and more
Spark-idiomatically) the whole history is a WINDOW computation, not a
row-by-row merge:

    union(current versions, updates) per key, ordered by eff_from
      → drop no-op updates (attrs unchanged vs. the previous version — lag())
      → eff_to = lead(eff_from); is_current = eff_to IS NULL

Scale shape: ONE shuffle on the dimension key; both window functions share the
same partitioning+ordering, so Catalyst evaluates them in a single Window node
chain without a second exchange. No joins, no driver-side state, no rewrite of
untouched keys' history beyond the scan — at 100 TB the dimension is tiny next
to facts, and even a billion-key dimension is one hash partition pass.

Determinism contract (drives the DuckDB oracle): ordering is
(eff_from, *attrs) so equal-timestamp edge cases resolve identically on every
engine; attribute comparison is null-safe struct equality, so NULL→value and
value→NULL transitions are real versions while NULL→NULL is a no-op.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_apply(
    current: DataFrame,
    updates: DataFrame,
    key_cols: Sequence[str],
    attr_cols: Sequence[str],
    eff_from_col: str = "eff_from",
) -> DataFrame:
    """Build the full Type-2 version history from `current` (the existing
    dimension: one or more versions per key) and `updates` (the change stream),
    both carrying `key_cols + attr_cols + eff_from_col`.

    Returns key_cols + attr_cols + eff_from + eff_to + is_current:
    half-open validity [eff_from, eff_to), eff_to NULL on the live version.

    - New keys appearing only in `updates` start their history there.
    - Keys without updates keep their current version(s) untouched.
    - Consecutive versions with identical attrs collapse to the earlier one
      (a re-delivered unchanged record must not close and reopen a version —
      the idempotence a MERGE-based SCD2 needs retry logic for).
    - Out-of-order updates (eff_from before an existing version) splice into
      history by timestamp — the windowed formulation re-derives every
      interval, which is exactly the "recompute from bitemporal log" fallback
      Delta users reach for when late data corrupts a merge-maintained SCD2.

    Rows with equal (key, eff_from) are ordered by attrs for determinism;
    callers should dedup true duplicates upstream (cf. upsert._check_unique).
    """
    keys = list(key_cols)
    attrs = list(attr_cols)
    if not keys or not attrs:
        raise ValueError("key_cols and attr_cols must be non-empty")
    cols = [*keys, *attrs, eff_from_col]
    u = current.select(*cols).unionByName(updates.select(*cols))
    order = [F.col(eff_from_col).asc(), *[F.col(a).asc_nulls_first() for a in attrs]]
    w = Window.partitionBy(*keys).orderBy(*order)
    attr_struct = F.struct(*[F.col(a) for a in attrs])
    versions = (
        u.withColumn("__prev_attrs", F.lag(attr_struct).over(w))
        .filter(
            F.col("__prev_attrs").isNull()
            | ~attr_struct.eqNullSafe(F.col("__prev_attrs"))
        )
        .drop("__prev_attrs")
    )
    out = versions.withColumn(
        "eff_to", F.lead(F.col(eff_from_col)).over(w)
    )
    return out.withColumn("is_current", F.col("eff_to").isNull())


def scd2_apply_incremental(
    history: DataFrame,
    updates: DataFrame,
    key_cols: Sequence[str],
    attr_cols: Sequence[str],
    eff_from_col: str = "eff_from",
) -> DataFrame:
    """Incremental Type-2 maintenance: rebuild history ONLY for keys present in
    `updates`; untouched keys' rows pass through byte-identical.

    `history` is an existing full SCD2 table (an `scd2_apply` output:
    key_cols + attr_cols + eff_from + eff_to + is_current). Because every
    key's interval chain in `scd2_apply` derives solely from that key's own
    rows (the window is partitioned by key), recomputing the touched partition
    and passing the rest through is EXACTLY equal to the full-batch
    `scd2_apply` over all keys — the law `tests/test_scd.py` pins and the
    `merge_scd2_incremental` suite query proves against the batch oracle —
    PROVIDED batches are eff_from-monotone per key (each batch's updates are
    not strictly older than an already-applied update of the same key, the
    normal watermark contract). Under arbitrary delivery order the collapsed
    history can have dropped a no-op version that a later, OLDER update would
    have turned into a real attribute flip — unrecoverable from `history`
    alone (counterexample pinned in tests/test_scd.py). For any-order
    exactness rebuild from the event log: `scd2_apply_incremental_log`.

    Scale shape: the nightly reality at 100 TB — a billion-key dimension where
    a batch touches thousands of keys. Two key-joins against the (tiny) touched
    key set (semi + anti; Spark broadcasts it automatically) and the windowed
    rebuild runs over |touched| keys' rows only, not the dimension.
    """
    keys = list(key_cols)
    attrs = list(attr_cols)
    out_cols = [*keys, *attrs, eff_from_col, "eff_to", "is_current"]
    touched = updates.select(*keys).distinct()
    untouched = history.join(touched, keys, "left_anti").select(*out_cols)
    touched_hist = history.join(touched, keys, "left_semi")
    rebuilt = scd2_apply(
        touched_hist.select(*keys, *attrs, eff_from_col),
        updates,
        keys,
        attrs,
        eff_from_col,
    ).select(*out_cols)
    return untouched.unionByName(rebuilt)


def scd2_apply_incremental_log(
    history: DataFrame,
    log: DataFrame,
    updates: DataFrame,
    key_cols: Sequence[str],
    attr_cols: Sequence[str],
    eff_from_col: str = "eff_from",
) -> DataFrame:
    """Incremental Type-2 maintenance that is exact under ANY delivery order.

    `scd2_apply_incremental` rebuilds touched keys from the COLLAPSED history,
    which is only exact when batches are eff_from-monotone per key: a no-op
    version dropped by the collapse is unrecoverable, so an update that later
    splices strictly BEFORE it cannot restore the attribute flip the batch
    derivation would show (counterexample pinned in tests/test_scd.py).

    This variant rebuilds touched keys from `log` — the append-only version-
    EVENT log (each key's seed row + every update ever delivered, `updates`
    included by the caller's append) — which retains exactly the information
    collapse discards. The log is the bitemporal source of truth; `history` is
    its incrementally-maintained materialized view. Same cost shape: two joins
    against the broadcast-sized touched key set; the window runs over touched
    keys' LOG rows (per-key event counts, not the dimension).
    """
    keys = list(key_cols)
    attrs = list(attr_cols)
    out_cols = [*keys, *attrs, eff_from_col, "eff_to", "is_current"]
    touched = updates.select(*keys).distinct()
    untouched = history.join(touched, keys, "left_anti").select(*out_cols)
    log_touched = log.join(touched, keys, "left_semi").select(
        *keys, *attrs, eff_from_col
    )
    rebuilt = scd2_apply(
        log_touched, updates.select(*keys, *attrs, eff_from_col).limit(0),
        keys, attrs, eff_from_col,
    ).select(*out_cols)
    return untouched.unionByName(rebuilt)


def scd2_point_in_time_join(
    facts: DataFrame,
    history: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    eff_from_col: str = "eff_from",
    eff_to_col: str = "eff_to",
) -> DataFrame:
    """Enrich each fact row with the dimension version that was valid AT the
    fact's timestamp — the consumer side of SCD2 (every "revenue by customer
    tier at time of purchase" query). Versions are [eff_from, eff_to)
    half-open, eff_to NULL = current, so exactly one version matches any
    timestamp at or after the key's first eff_from.

    Plan shape: an EQUI-join on the key with the interval predicate as a
    post-join filter — NOT a range join. The shuffle is the ordinary key
    shuffle (bucket/co-partition both sides to make it exchange-free), and
    per-fact fanout is bounded by that key's version count (typically a
    handful), never the history size. This is the standard scalable
    point-in-time shape; a true non-equi range join would degrade to
    broadcast-nested-loop.
    """
    keys = list(key_cols)
    j = facts.join(history, keys)
    ts = F.col(ts_col).cast("timestamp")
    return j.filter(
        (F.col(eff_from_col) <= ts)
        & (F.col(eff_to_col).isNull() | (ts < F.col(eff_to_col)))
    )
