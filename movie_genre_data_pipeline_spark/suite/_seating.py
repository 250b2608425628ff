"""Per-query implementation fingerprints — the re-seating contract.

VERDICT r9 #5: a query whose IMPLEMENTATION changed since its last green
driver record must be re-seated in the current DRIVER_WINDOW (a changed plan
needs a fresh driver check even when the oracle is unchanged; r9 re-seated
the rewritten ANN queries by hand and the class of "edited but never
re-checked" was otherwise unguarded).

The fingerprint of a query is a sha256 over:
- the source text of its query function, plus TRANSITIVELY every function
  defined in this package that is reachable by name from its code objects
  (co_names, recursing into nested code consts — foreachBatch closures,
  comprehensions), so an edit to a shared helper (bm25_from_counts,
  alpha_tokens, ranged_row_number ...) flips every query built on it;
- stable reprs of reachable module-level constants (thresholds, SQL
  fragments, lexicons), so tuning a knob also flips the fingerprint;
- the query's oracle SQL.

Name resolution is by bare name across ALL package modules (suite style is
function-local imports, which never appear in __globals__), which is
deliberately OVER-inclusive: a name collision can only pull in extra source
text and force a spurious re-seat — never miss a real change.

`seating_manifest.json` records each query's fingerprint as of its last
seating. tests/test_registry.py compares live fingerprints against it and
fails when a changed query is absent from DRIVER_WINDOW + NEXT_ROUND_POOL;
tools/update_seating.py rewrites manifest entries for currently-seated
queries after a rotation.
"""

from __future__ import annotations

import hashlib
import importlib
import inspect
import json
import pkgutil
import re
import types
from pathlib import Path

_PKG = "movie_genre_data_pipeline_spark"
MANIFEST_PATH = Path(__file__).resolve().parent / "seating_manifest.json"

_SIMPLE = (str, bytes, int, float, bool, type(None))


def _stable_repr(v, depth: int = 0) -> str | None:
    """repr for plain data only; None when the value (or any element) could
    embed a memory address or other run-dependent state."""
    if depth > 4:
        return None
    if isinstance(v, _SIMPLE):
        return repr(v)
    if isinstance(v, (tuple, list, frozenset, set)):
        parts = [_stable_repr(x, depth + 1) for x in (sorted(v, key=repr) if isinstance(v, (set, frozenset)) else v)]
        if any(p is None for p in parts):
            return None
        return f"{type(v).__name__}({', '.join(parts)})"
    if isinstance(v, dict):
        parts = []
        for k in sorted(v, key=repr):
            kr, vr = _stable_repr(k, depth + 1), _stable_repr(v[k], depth + 1)
            if kr is None or vr is None:
                return None
            parts.append(f"{kr}: {vr}")
        return "{" + ", ".join(parts) + "}"
    return None


def _package_name_map() -> dict[str, list[tuple[str, str]]]:
    """name -> [(module, source-or-repr)] over every module-level function
    and plain-data constant in the package (cached per process)."""
    global _NAME_MAP
    try:
        return _NAME_MAP
    except NameError:
        pass
    pkg = importlib.import_module(_PKG)
    out: dict[str, list[tuple[str, str]]] = {}
    for info in pkgutil.walk_packages(pkg.__path__, prefix=f"{_PKG}."):
        try:
            mod = importlib.import_module(info.name)
        except Exception:  # pragma: no cover - optional deps
            continue
        for name, obj in vars(mod).items():
            if name.startswith("__"):
                continue
            if isinstance(obj, types.FunctionType) and obj.__module__ == info.name:
                try:
                    out.setdefault(name, []).append((info.name, inspect.getsource(obj)))
                except OSError:  # pragma: no cover
                    pass
            elif isinstance(obj, _SIMPLE + (tuple, list, dict, frozenset, set)):
                rep = _stable_repr(obj)
                if rep is not None and not re.search(r"0x[0-9a-f]{6,}", rep):
                    out.setdefault(name, []).append((info.name, f"const:{rep}"))
    _NAME_MAP = out
    return out


def _code_names(code) -> set[str]:
    names = set(code.co_names)
    for c in code.co_consts:
        if isinstance(c, types.CodeType):
            names |= _code_names(c)
    return names


def query_fingerprint(fn, oracle: str | None) -> str:
    """sha256 fingerprint of a query's implementation (see module doc)."""
    name_map = _package_name_map()
    pieces: dict[str, str] = {"__oracle__": oracle or ""}
    frontier: list[types.FunctionType] = [fn]
    seen: set[str] = set()
    while frontier:
        f = frontier.pop()
        key = f"{f.__module__}.{f.__qualname__}"
        if key in seen:
            continue
        seen.add(key)
        try:
            pieces[key] = inspect.getsource(f)
        except OSError:  # pragma: no cover
            continue
        for n in sorted(_code_names(f.__code__)):
            for mod, payload in name_map.get(n, []):
                if payload.startswith("const:"):
                    pieces[f"{mod}:{n}"] = payload
                else:
                    g = importlib.import_module(mod)
                    cand = getattr(g, n, None)
                    if isinstance(cand, types.FunctionType):
                        frontier.append(cand)
    h = hashlib.sha256()
    for key in sorted(pieces):
        h.update(key.encode())
        h.update(b"\x00")
        h.update(pieces[key].encode())
        h.update(b"\x01")
    return h.hexdigest()


def live_fingerprints() -> dict[str, str]:
    from movie_genre_data_pipeline_spark.suite import all_queries

    return {
        name: query_fingerprint(spec.fn, spec.oracle)
        for name, spec in all_queries().items()
    }


def load_manifest() -> dict[str, str]:
    if not MANIFEST_PATH.exists():
        return {}
    return json.loads(MANIFEST_PATH.read_text())


def stale_queries() -> list[str]:
    """Registry queries whose live fingerprint differs from the manifest
    (or that the manifest has never seen)."""
    manifest = load_manifest()
    return [
        name
        for name, fp in live_fingerprints().items()
        if manifest.get(name) != fp
    ]
