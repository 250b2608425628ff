"""Change-data-capture and data-lifecycle operators: snapshot diffing (the
change feed a table format would hand you, derived from plain snapshots) and
key-cascade purging (right-to-be-forgotten deletion propagation).

Why: without Delta/Iceberg (none in this env — SURVEY §7 scope), CDC between
two materialized snapshots is a JOIN problem, and privacy deletion is an
ANTI-JOIN problem — both pure DataFrame plans.

Scale shape:
- `snapshot_diff` is ONE full-outer join on the key (the unavoidable shuffle;
  co-partition/bucket both snapshots on the key to make it exchange-free) plus
  a null-safe struct comparison — no window, no collect. Output is
  change-rows-only if filtered, which is what downstream incremental consumers
  (e.g. scd2_apply_incremental's update batch) want.
- `purge_keys` is one left-anti join per fact table against the broadcast-
  sized tombstone set; chains (orders → lineitem) resolve by semi-joining the
  child's foreign key through the purged parent keys. Nothing rewrites rows
  that survive; at 100 TB this is a partition-preserving filter-write.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str],
) -> DataFrame:
    """(key_cols..., change_type, old_<c>, new_<c>...): one row per key present
    in either snapshot, classified as 'inserted' / 'deleted' / 'updated' /
    'unchanged'. Comparison is null-safe struct equality over `compare_cols`
    (NULL→value and value→NULL are real updates, NULL→NULL is not)."""
    keys = list(key_cols)
    comps = list(compare_cols)
    if not keys or not comps:
        raise ValueError("key_cols and compare_cols must be non-empty")
    o = old.select(
        *keys,
        F.lit(True).alias("__in_old"),
        *[F.col(c).alias(f"old_{c}") for c in comps],
    )
    n = new.select(
        *keys,
        F.lit(True).alias("__in_new"),
        *[F.col(c).alias(f"new_{c}") for c in comps],
    )
    j = o.join(n, keys, "full_outer")
    old_struct = F.struct(*[F.col(f"old_{c}") for c in comps])
    new_struct = F.struct(*[F.col(f"new_{c}") for c in comps])
    change = (
        F.when(F.col("__in_old").isNull(), F.lit("inserted"))
        .when(F.col("__in_new").isNull(), F.lit("deleted"))
        .when(old_struct.eqNullSafe(new_struct), F.lit("unchanged"))
        .otherwise(F.lit("updated"))
    )
    return j.select(
        *keys,
        change.alias("change_type"),
        *[F.col(f"old_{c}") for c in comps],
        *[F.col(f"new_{c}") for c in comps],
    )


def maintain_join_view(
    view: DataFrame,
    fact_key: str,
    dim_key: str,
    fact_upserts: DataFrame,
    fact_deletes: DataFrame,
    dim: DataFrame,
    dim_updates: DataFrame,
) -> DataFrame:
    """Incrementally maintain a materialized fact⋈dim join view from change
    feeds on BOTH sides — the delta-join rule (ΔV = ΔF⋈D' ∪ F_surviving⋈ΔD)
    made operational:

    1. retire stale fact rows: anti-join `view` against the upserted ∪
       deleted fact keys (upserts retire-then-reinsert, so an update is
       never patched in place and column drift cannot accumulate);
    2. re-derive the upserted facts against the CURRENT dimension (dim with
       `dim_updates` applied) — fact deltas must see the new dim or a row
       whose fact AND dim both changed would resurrect the old attributes;
    3. apply the dim delta to the SURVIVORS: broadcast left join on the dim
       key, every column carried by `dim_updates` overwrites via coalesce.

    The result equals a from-scratch F'⋈D' rebuild row-for-row (the suite
    oracle recomputes; equality is the law) while touching churn-sized
    deltas: both delta frames broadcast, the survivors path is one anti-join
    + one broadcast join over the view — no second fact-table scan.

    Contracts: `view` columns = fact columns ∪ dim attribute columns;
    `fact_upserts` carries the fact columns; `dim`/`dim_updates` carry
    `dim_key` + the dim attributes (updates may carry a subset)."""
    up_cols = [c for c in dim_updates.columns if c != dim_key]
    retired_keys = fact_upserts.select(fact_key).unionByName(
        fact_deletes.select(fact_key)
    )
    survivors = view.join(F.broadcast(retired_keys), fact_key, "left_anti")
    renamed = dim_updates.select(
        dim_key, *[F.col(c).alias(f"__new_{c}") for c in up_cols]
    )
    survivors = survivors.join(F.broadcast(renamed), dim_key, "left").select(
        *[
            F.coalesce(F.col(f"__new_{c}"), F.col(c)).alias(c)
            if c in up_cols
            else F.col(c)
            for c in view.columns
        ]
    )
    dim_current = dim.join(F.broadcast(renamed), dim_key, "left").select(
        dim_key,
        *[
            F.coalesce(F.col(f"__new_{c}"), F.col(c)).alias(c)
            if c in up_cols
            else F.col(c)
            for c in dim.columns
            if c != dim_key
        ],
    )
    dim_cols = [c for c in view.columns if c not in fact_upserts.columns]
    reinserted = fact_upserts.join(
        dim_current.select(dim_key, *[c for c in dim_cols if c != dim_key]),
        dim_key,
    ).select(*view.columns)
    return survivors.unionByName(reinserted)


def purge_keys(
    df: DataFrame, tombstones: DataFrame, key_cols: Sequence[str]
) -> tuple[DataFrame, DataFrame]:
    """(kept, purged): split `df` by membership of its key in `tombstones`
    (which carries the same key column names). kept = left-anti, purged =
    left-semi — two scans of the same join, both broadcastable when the
    tombstone set is deletion-request-sized."""
    keys = list(key_cols)
    kept = df.join(tombstones.select(*keys), keys, "left_anti")
    purged = df.join(tombstones.select(*keys), keys, "left_semi")
    return kept, purged
