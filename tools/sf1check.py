#!/usr/bin/env python3
"""Scale-correctness checker for the sf1 (10x) pass: run the DuckDB
oracle SQL over the STAGED 10x tables (tools/Sf1Verify.scala writes
them as parquet directories, hence the glob views) and diff exactly
against the Spark dumps — the same canonicalization as localcheck.py,
plus a per-query wall-clock budget because some oracles (gated graph
unrolls, 100x candidate dedup joins) are legitimately expensive at
10x and a hung oracle must not stall the whole pass. Writes a JSON
summary next to the outdir.

Usage: sf1check.py <staged_dir> <outdir> [timeout_sec] [query...]
"""
import sys, os, json, glob, multiprocessing as mp
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "documents", "embeddings"]


def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    out = pd.DataFrame()
    for c in df.columns:
        s = df[c]
        if isinstance(s.dtype, pd.DatetimeTZDtype):
            s = s.dt.tz_convert("UTC").dt.tz_localize(None)
        if s.dtype == object and len(s) and isinstance(
                s.dropna().iloc[0] if s.dropna().size else None,
                (list, np.ndarray)):
            out[c] = s.map(lambda v: str(list(v)) if v is not None else "NULL")
        elif pd.api.types.is_float_dtype(s.dtype):
            out[c] = s.map(lambda v: "NULL" if pd.isna(v)
                           else repr(round(float(v), 9)))
        elif pd.api.types.is_datetime64_any_dtype(s.dtype):
            out[c] = s.map(lambda v: "NULL" if pd.isna(v)
                           else str(pd.Timestamp(v)))
        else:
            out[c] = s.map(lambda v: "NULL" if v is None or
                           (isinstance(v, float) and pd.isna(v)) else str(v))
    return out.sort_values(by=list(out.columns),
                           kind="mergesort").reset_index(drop=True)


def run_one(staged, outdir, name, sql, q):
    try:
        con = duckdb.connect()
        for t in TABLES:
            p = f"{staged}/{t}.parquet"
            if os.path.isdir(p):
                con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
            elif os.path.exists(p):
                con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            q.put(("no_spark_output", None)); return
        spark_df = pd.concat([pd.read_parquet(f) for f in files],
                             ignore_index=True)
        ora_df = con.sql(sql).df()
        a, b = canon(spark_df), canon(ora_df)
        if list(a.columns) != list(b.columns):
            q.put((f"columns spark={list(a.columns)} oracle={list(b.columns)}",
                   None))
        elif len(a) != len(b):
            q.put((f"rows spark={len(a)} oracle={len(b)}", None))
        elif not a.equals(b):
            neq = (a != b).any(axis=1)
            q.put((f"{int(neq.sum())}/{len(a)} rows differ", None))
        else:
            q.put((None, len(a)))
    except Exception as e:
        q.put((f"error: {e}", None))


def main():
    staged, outdir = sys.argv[1], sys.argv[2]
    timeout = int(sys.argv[3]) if len(sys.argv) > 3 else 1800
    only = set(sys.argv[4:])
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    results = {}
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        q = mp.Queue()
        p = mp.Process(target=run_one, args=(staged, outdir, name, sql, q))
        import time
        t0 = time.time()
        p.start()
        p.join(timeout)
        dt = round(time.time() - t0, 1)
        if p.is_alive():
            p.terminate(); p.join()
            results[name] = {"status": "oracle_timeout", "sec": dt}
            print(f"TIMEOUT {name} after {dt}s")
        else:
            err, rows = q.get() if not q.empty() else ("worker died", None)
            if err:
                results[name] = {"status": "fail", "detail": err, "sec": dt}
                print(f"FAIL {name}: {err} ({dt}s)")
            else:
                results[name] = {"status": "ok", "rows": rows, "sec": dt}
                print(f"OK   {name} ({rows} rows, {dt}s)")
    n_ok = sum(1 for r in results.values() if r["status"] == "ok")
    summary = {"sf": "sf0.1 x10", "n_ok": n_ok, "n_total": len(results),
               "queries": results}
    with open("CORRECTNESS_SF1.json", "w") as f:
        json.dump(summary, f, indent=1)
    print(f"== {n_ok}/{len(results)} ok -> CORRECTNESS_SF1.json")


if __name__ == "__main__":
    main()
