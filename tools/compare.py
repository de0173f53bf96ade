#!/usr/bin/env python3
"""Dev-loop stand-in for the driver's correctness gate: run each
oracle_sql.json query in DuckDB over the sf parquet tables and compare
against the Spark parquet dumps (column-name-sorted, exact values).
Usage: compare.py [--bitexact] <sfdir> <outdir> [query ...]

--bitexact compares float columns at the IEEE BIT level (uint64 view)
instead of `==`, mirroring the driver's hash gate: `==` says
-0.0 == +0.0, but the driver's value hash does not — the r19 red rows
(stream_perm_entropy, real_ts_anomaly) were exactly this class, green
here and red at the gate. NaNs compare equal regardless of payload
(both engines emit the canonical quiet NaN, and null→NaN conflation
matches the default path's isna handling).
"""
import json, sys, math, time, gc, os
import numpy as np
import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def main():
    args = [a for a in sys.argv[1:]
            if not a.startswith("--json") and a != "--bitexact"]
    json_out = next((a.split("=", 1)[1] for a in sys.argv[1:]
                     if a.startswith("--json=")), None)
    bitexact = "--bitexact" in sys.argv[1:]
    sfdir, outdir = args[0], args[1]
    only = set(args[2:])
    report = {}
    def fresh_con():
        # fresh connection per query: a long-lived connection's buffer
        # manager accumulated state across a 200-query sf1 sweep until
        # mid-sized queries died with "bad allocation" (standalone the
        # same query peaks at 4.5 GB); reconnecting is ~ms and isolates
        # every query's memory footprint.
        # memory_limit + temp_directory: allocator fragmentation across
        # ~300 connections leaves less and less contiguous headroom, so
        # a late heavy oracle that standalone needs a few GB dies with
        # "bad allocation" ~query 300 of an sf1 sweep. A bounded buffer
        # pool spills to disk instead of failing, and caps how much any
        # one query contributes to the fragmented high-water mark.
        # Don't set it too low: DuckDB 1.0 window operators do NOT
        # spill, and the heaviest sf1 oracles (ts_moments' rolling
        # sums over 1M rows) genuinely need tens of GB.
        c = duckdb.connect(config={
            "memory_limit": os.environ.get("GRAFT_ORACLE_MEM", "64GB"),
            "temp_directory": "/tmp/duckdb_spill"})
        for t in TABLES:
            c.execute(f"create view {t} as select * from read_parquet('{sfdir}/{t}.parquet')")
        return c
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    fails = 0
    con = exp = got = None
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        # explicitly close the previous query's connection and drop its
        # frames BEFORE opening the next one: relying on rebinding left
        # enough allocator state alive that a 300-query sf0.1 sweep died
        # with "bad allocation" ~290 queries in, on a query that
        # standalone needs 1.3 s
        if con is not None:
            con.close()
        exp = got = None
        gc.collect()
        # pyarrow's default pool retains freed buffers; hand them back
        # so 300 parquet reads don't ratchet the process high-water mark
        pa.default_memory_pool().release_unused()
        con = fresh_con()
        report[name] = {"rows_match": False, "schema_match": False,
                        "values_match": False, "err": None}
        t0 = time.monotonic()
        try:
            exp = con.execute(sql).df()
            report[name]["oracle_sec"] = round(time.monotonic() - t0, 3)
        except Exception as e:
            print(f"{name}: ORACLE SQL ERROR: {e}")
            report[name]["err"] = f"oracle_sql: {e}"
            fails += 1
            continue
        try:
            got = pq.read_table(f"{outdir}/{name}").to_pandas()
        except Exception as e:
            print(f"{name}: SPARK OUTPUT MISSING: {e}")
            report[name]["err"] = f"spark_output_missing: {e}"
            fails += 1
            continue
        report[name]["spark_rows"] = len(got)
        report[name]["oracle_rows"] = len(exp)
        exp = exp.reindex(sorted(exp.columns), axis=1)
        got = got.reindex(sorted(got.columns), axis=1)
        if list(exp.columns) != list(got.columns):
            print(f"{name}: SCHEMA MISMATCH exp={list(exp.columns)} got={list(got.columns)}")
            report[name]["err"] = "schema_mismatch"
            fails += 1
            continue
        report[name]["schema_match"] = True
        if len(exp) != len(got):
            print(f"{name}: ROWCOUNT exp={len(exp)} got={len(got)}")
            report[name]["err"] = "rowcount_mismatch"
            fails += 1
            continue
        report[name]["rows_match"] = True
        bad = []
        for c in exp.columns:
            e, g = exp[c], got[c]
            if e.dtype.kind == 'f' or g.dtype.kind == 'f':
                e = e.astype('float64'); g = g.astype('float64')
                if bitexact:
                    ev = e.to_numpy(dtype='float64', na_value=np.nan)
                    gv = g.to_numpy(dtype='float64', na_value=np.nan)
                    neq = pd.Series(
                        ~((np.isnan(ev) & np.isnan(gv))
                          | (ev.view('uint64') == gv.view('uint64'))),
                        index=e.index)
                else:
                    neq = ~((e.isna() & g.isna()) | (e == g))
            elif e.dtype == g.dtype:
                # same dtype: vectorized equality, no object-boxing
                # (astype(object) on a 15M-row sf1 column doubled into
                # a MemoryError under co-resident JVM pressure)
                neq = ~((e.isna() & g.isna()) | (e == g))
            else:
                neq = ~((e.isna() & g.isna()) | (e.astype(object) == g.astype(object)))
            n = int(neq.sum())
            if n:
                i = neq.idxmax()
                bad.append(f"{c}: {n} diffs, first@{i}: exp={e[i]!r} got={g[i]!r}")
        if bad:
            print(f"{name}: VALUE MISMATCH\n  " + "\n  ".join(bad))
            report[name]["err"] = "value_mismatch: " + "; ".join(bad)[:500]
            fails += 1
        else:
            print(f"{name}: OK ({len(exp)} rows, {len(exp.columns)} cols, "
                  f"oracle {report[name].get('oracle_sec', 0):.1f}s)")
            report[name]["values_match"] = True
    if json_out:
        json.dump(report, open(json_out, "w"), indent=1, sort_keys=True)
        print(f"wrote {json_out}")
    sys.exit(1 if fails else 0)

if __name__ == "__main__":
    main()
