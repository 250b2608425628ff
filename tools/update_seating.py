"""Rewrite seating_manifest.json entries after a DRIVER_WINDOW rotation.

Usage:
  python tools/update_seating.py              # update seated queries only
  python tools/update_seating.py --all        # (re)baseline every query
  python tools/update_seating.py --report     # print stale (changed) queries

Default mode updates fingerprints ONLY for names currently in DRIVER_WINDOW +
NEXT_ROUND_POOL — an edited query that is NOT seated keeps its stale manifest
entry, so tests/test_registry.py keeps failing until it gets a driver slot
(the point of the contract). `--all` exists for initial baselining or for a
deliberate amnesty (never use it to silence the test without re-seating).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    from movie_genre_data_pipeline_spark.suite import (
        DRIVER_WINDOW,
        NEXT_ROUND_POOL,
    )
    from movie_genre_data_pipeline_spark.suite._seating import (
        MANIFEST_PATH,
        live_fingerprints,
        load_manifest,
        stale_queries,
    )

    if "--report" in sys.argv:
        stale = stale_queries()
        seated = set(DRIVER_WINDOW) | set(NEXT_ROUND_POOL)
        for name in sorted(stale):
            mark = "seated" if name in seated else "NOT SEATED"
            print(f"{mark:>10}  {name}")
        print(f"{len(stale)} stale fingerprints")
        return

    live = live_fingerprints()
    manifest = load_manifest()
    if "--all" in sys.argv:
        names = list(live)
    else:
        names = [n for n in (*DRIVER_WINDOW, *NEXT_ROUND_POOL) if n in live]
    for n in names:
        manifest[n] = live[n]
    # drop entries for queries that left the registry
    manifest = {n: fp for n, fp in manifest.items() if n in live}
    MANIFEST_PATH.write_text(json.dumps(manifest, indent=0, sort_keys=True) + "\n")
    print(f"updated {len(names)} entries ({len(manifest)} total)")


if __name__ == "__main__":
    main()
