"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over the
same parquet tables, compare row count / columns / order-insensitive
values. Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from go_streams_spark.session import get_spark
    from go_streams_spark.plans import release_tracked
    import __spark_entry__ as entry_mod

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql(sf_dir)
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
            release_tracked()
        except Exception as e:
            release_tracked()
            failures.append(name)
            print(f"FAIL  {name}: spark error {type(e).__name__}: {e}")
            continue
        if name not in oracles:
            print(f"SKIP  {name}: no oracle (rows-only) — {len(sdf)} rows")
            continue
        try:
            ddf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error {e}")
            continue
        s, d = normalize(sdf), normalize(ddf)
        if list(s.columns) != list(d.columns):
            failures.append(name)
            print(f"FAIL  {name}: columns spark={list(s.columns)} duckdb={list(d.columns)}")
            continue
        if len(s) != len(d):
            failures.append(name)
            print(f"FAIL  {name}: rows spark={len(s)} duckdb={len(d)}")
            continue
        mismatch = None
        for c in s.columns:
            a, b = s[c], d[c]
            if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
                ok = ((a.astype(float) - b.astype(float)).abs() < 1e-9) | (a.isna() & b.isna())
            else:
                ok = (a.astype(str) == b.astype(str))
            if not ok.all():
                i = (~ok).idxmax()
                mismatch = (c, a[i], b[i], int((~ok).sum()))
                break
        if mismatch:
            failures.append(name)
            c, av, bv, n = mismatch
            print(f"FAIL  {name}: col {c} differs in {n} rows; e.g. spark={av!r} duckdb={bv!r}")
        else:
            print(f"OK    {name}: {len(s)} rows x {len(s.columns)} cols")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
