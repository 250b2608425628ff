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
