#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run Verify's parquet
dumps against the DuckDB oracle SQL and diff exactly (sorted columns,
sorted rows, NaN==NaN). Usage: localcheck.py <sfdir> <outdir> [query...]"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for comparison: everything to string with repr-ish floats
    out = pd.DataFrame()
    for c in df.columns:
        s = df[c]
        if isinstance(s.dtype, pd.DatetimeTZDtype):
            s = s.dt.tz_convert("UTC").dt.tz_localize(None)
        if s.dtype == object and len(s) and isinstance(s.dropna().iloc[0] if s.dropna().size else None, (list, np.ndarray)):
            out[c] = s.map(lambda v: str(list(v)) if v is not None else "NULL")
        elif pd.api.types.is_float_dtype(s.dtype):
            out[c] = s.map(lambda v: "NULL" if pd.isna(v) else repr(round(float(v), 9)))
        elif pd.api.types.is_datetime64_any_dtype(s.dtype):
            out[c] = s.map(lambda v: "NULL" if pd.isna(v) else str(pd.Timestamp(v)))
        else:
            out[c] = s.map(lambda v: "NULL" if v is None or (isinstance(v, float) and pd.isna(v)) else str(v))
    out = out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)
    return out

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_bad += 1
            continue
        try:
            spark_df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
            ora_df = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_bad += 1
            continue
        a, b = canon(spark_df), canon(ora_df)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns spark={list(a.columns)} oracle={list(b.columns)}")
            n_bad += 1
        elif len(a) != len(b):
            print(f"FAIL {name}: rows spark={len(a)} oracle={len(b)}")
            n_bad += 1
        elif not a.equals(b):
            neq = (a != b).any(axis=1)
            print(f"FAIL {name}: {int(neq.sum())}/{len(a)} rows differ; first diffs:")
            merged = pd.concat([a[neq].head(3).add_prefix("s_"),
                                b[neq].head(3).add_prefix("o_")], axis=1)
            print(merged.to_string())
            n_bad += 1
        else:
            print(f"OK   {name} ({len(a)} rows)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail")
    sys.exit(1 if n_bad else 0)

main()
