"""Local replica of the driver's correctness gate: run each queries() entry
on Spark and its oracle_sql() on DuckDB over the same sf dir; compare
row-count, schema (column names), and order-insensitive values.

Usage: python tools/selfcheck.py [sf_dir] [entry ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(6)
        elif np.issubdtype(df[c].dtype, np.integer) or str(df[c].dtype).startswith("Int"):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from awesome_spark_search.session import get_spark

    spark = get_spark("selfcheck", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            results[name] = f"SPARK ERROR: {type(e).__name__}: {str(e)[:300]}"
            continue
        if name not in oracles:
            results[name] = f"rows-only ({len(sdf)} rows)"
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            results[name] = f"ORACLE ERROR: {type(e).__name__}: {str(e)[:300]}"
            continue
        s, d = canon(sdf), canon(odf)
        if list(s.columns) != list(d.columns):
            results[name] = f"SCHEMA MISMATCH: spark={list(s.columns)} oracle={list(d.columns)}"
        elif len(s) != len(d):
            results[name] = f"ROWCOUNT MISMATCH: spark={len(s)} oracle={len(d)}"
        elif not s.equals(d):
            neq = (s != d) & ~(s.isna() & d.isna())
            bad_rows = neq.any(axis=1)
            diff = pd.concat(
                [s[bad_rows].head(3).add_prefix("s_"), d[bad_rows].head(3).add_prefix("o_")],
                axis=1,
            )
            results[name] = f"VALUE MISMATCH ({int(bad_rows.sum())} rows):\n{diff.to_string()}"
        else:
            results[name] = f"OK ({len(s)} rows)"
        print(f"[{name}] {results[name].splitlines()[0]}", flush=True)

    print("\n==== SUMMARY ====")
    n_ok = sum(1 for v in results.values() if v.startswith(("OK", "rows-only")))
    for name, v in results.items():
        status = v.splitlines()[0]
        print(f"{'PASS' if v.startswith(('OK', 'rows-only')) else 'FAIL':4} {name}: {status}")
    print(f"{n_ok}/{len(results)} pass")
    failed = {k: v for k, v in results.items() if not v.startswith(("OK", "rows-only"))}
    if failed:
        print("\n==== DETAILS ====")
        for k, v in failed.items():
            print(f"\n--- {k} ---\n{v}")
    sys.exit(0 if not failed else 1)


if __name__ == "__main__":
    main()
