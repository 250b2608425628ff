"""Shared bench plumbing: the committed-baseline reader used by both bench.py
and tools/scale_bench.py (ADVICE r10 — the two inline copies had already
drifted in their exception tuples).

The baseline for any cross-round comparison is the artifact at git HEAD, not
whatever run last landed on disk: re-running a bench within a round must not
silently rebase vs_prev onto a discarded intermediate run (the r10 review
caught exactly that in a pending artifact). Outside a git checkout the
on-disk file is the best available fallback.
"""

from __future__ import annotations

import subprocess
from pathlib import Path


def committed_baseline(repo_root: Path, relpath: str) -> str | None:
    """Text of `relpath` (repo-root-relative, e.g. 'BENCH_DETAIL.json') as of
    git HEAD; falls back to the working-tree file when git is unavailable or
    the path has no committed version. None when neither exists."""
    try:
        return subprocess.run(
            ["git", "-C", str(repo_root), "show", f"HEAD:{relpath}"],
            capture_output=True,
            text=True,
            check=True,
        ).stdout
    except (subprocess.CalledProcessError, ValueError, OSError):
        on_disk = repo_root / relpath
        if on_disk.exists():
            return on_disk.read_text()
        return None
