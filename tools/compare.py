#!/usr/bin/env python3
"""Dev-loop stand-in for the driver's correctness gate: run each
oracle_sql.json query in DuckDB over the sf parquet tables and compare
against the Spark parquet dumps (column-name-sorted, exact values).
Usage: compare.py <sfdir> <outdir> [query ...]
"""
import json, sys, math
import duckdb
import pyarrow.parquet as pq
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"create view {t} as select * from read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    fails = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            exp = con.execute(sql).df()
        except Exception as e:
            print(f"{name}: ORACLE SQL ERROR: {e}")
            fails += 1
            continue
        try:
            got = pq.read_table(f"{outdir}/{name}").to_pandas()
        except Exception as e:
            print(f"{name}: SPARK OUTPUT MISSING: {e}")
            fails += 1
            continue
        exp = exp.reindex(sorted(exp.columns), axis=1)
        got = got.reindex(sorted(got.columns), axis=1)
        if list(exp.columns) != list(got.columns):
            print(f"{name}: SCHEMA MISMATCH exp={list(exp.columns)} got={list(got.columns)}")
            fails += 1
            continue
        if len(exp) != len(got):
            print(f"{name}: ROWCOUNT exp={len(exp)} got={len(got)}")
            fails += 1
            continue
        bad = []
        for c in exp.columns:
            e, g = exp[c], got[c]
            if e.dtype.kind == 'f' or g.dtype.kind == 'f':
                e = e.astype('float64'); g = g.astype('float64')
                neq = ~((e.isna() & g.isna()) | (e == g))
            else:
                neq = ~((e.isna() & g.isna()) | (e.astype(object) == g.astype(object)))
            n = int(neq.sum())
            if n:
                i = neq.idxmax()
                bad.append(f"{c}: {n} diffs, first@{i}: exp={e[i]!r} got={g[i]!r}")
        if bad:
            print(f"{name}: VALUE MISMATCH\n  " + "\n  ".join(bad))
            fails += 1
        else:
            print(f"{name}: OK ({len(exp)} rows, {len(exp.columns)} cols)")
    sys.exit(1 if fails else 0)

if __name__ == "__main__":
    main()
