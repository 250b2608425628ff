"""Local mirror of the driver's t2 correctness gate: run every suite query on Spark
and its oracle on DuckDB over the same parquet tables, compare row count, sorted
column names, and values (rows sorted, NaN-safe, exact for non-floats, 1e-9-relative
for floats). Stricter than the driver's order-insensitive value hash — if this
passes, the hash should too.

Usage: python tools/verify_local.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    rows = []
    for tup in df.itertuples(index=False):
        rows.append(tuple(_norm_val(v) for v in tup))
    rows.sort(key=repr)
    return rows


def _norm_val(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return v
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(_norm_val(x) for x in v)
    try:
        if pd.isna(v):
            return None
    except (TypeError, ValueError):
        pass
    return v


def values_match(a, b) -> bool:
    if type(a) is type(b) is float:
        return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)
    if isinstance(a, float) and isinstance(b, (int, float)):
        return math.isclose(a, float(b), rel_tol=1e-9, abs_tol=1e-9)
    if isinstance(b, float) and isinstance(a, (int, float)):
        return math.isclose(float(a), b, rel_tol=1e-9, abs_tol=1e-9)
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(values_match(x, y) for x, y in zip(a, b))
    return a == b


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--vanilla"]
    vanilla = "--vanilla" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    from movie_genre_data_pipeline_spark.suite import all_queries

    if vanilla:
        # simulate the external driver: a bare SparkSession with NO engine
        # configs — queries must self-configure anything they depend on
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.master("local[8]").getOrCreate()
    else:
        from movie_genre_data_pipeline_spark.session import build_session

        spark = build_session(app_name="verify-local")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = all_queries()
    failures = []
    for name, spec in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = spec.fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if spec.oracle is None:
            print(f"skip  {name}: rows-only ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            if len(sdf) == 0:
                print(f"      WARNING: 0 rows")
            continue
        try:
            odf = con.sql(spec.oracle).df()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        ok = True
        if len(sdf) != len(odf):
            ok = False
            print(f"FAIL  {name}: rows spark={len(sdf)} oracle={len(odf)}")
        elif sorted(map(str.lower, sdf.columns)) != sorted(map(str.lower, odf.columns)):
            ok = False
            print(f"FAIL  {name}: cols spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
        else:
            odf.columns = [c for c in odf.columns]
            srows, orows = normalize(sdf), normalize(odf)
            for i, (sr, orr) in enumerate(zip(srows, orows)):
                if not values_match(sr, orr):
                    ok = False
                    print(f"FAIL  {name}: first diff at sorted row {i}:\n  spark : {sr}\n  oracle: {orr}")
                    break
        if ok:
            print(f"ok    {name} ({len(sdf)} rows, {time.time()-t0:.1f}s)")
        else:
            failures.append(name)

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
