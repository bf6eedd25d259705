#!/usr/bin/env python3
"""Local correctness check that mimics the driver's DuckDB-oracle compare:
reads each query's parquet dump from Verify, runs the matching oracle SQL in
DuckDB over the same source tables, and compares values (columns sorted by
name, rows sorted by all columns). Usage:
    python3 tools/check_local.py <sfDir> <outDir> [query ...]
"""
import json, math, sys
import duckdb
import pandas as pd

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def compare(name, spark_df, duck_df):
    errs = []
    sc, dc = sorted(spark_df.columns), sorted(duck_df.columns)
    if sc != dc:
        return [f"schema: spark={sc} duck={dc}"]
    if len(spark_df) != len(duck_df):
        errs.append(f"rows: spark={len(spark_df)} duck={len(duck_df)}")
        return errs
    a, b = canon(spark_df), canon(duck_df)
    for c in a.columns:
        av, bv = a[c], b[c]
        try:
            if av.dtype.kind == 'f' or bv.dtype.kind == 'f':
                ok = ((av.isna() & bv.isna()) | (abs(av - bv) < 1e-9)).all()
            else:
                ok = (av.astype(str) == bv.astype(str)).all()
        except Exception as e:
            ok = False
        if not ok:
            mism = (av.astype(str) != bv.astype(str))
            idx = mism[mism].index[:3].tolist()
            errs.append(f"col {c}: first mismatches at {idx}: "
                        f"spark={av.iloc[idx[:1]].tolist() if idx else '?'} duck={bv.iloc[idx[:1]].tolist() if idx else '?'}")
    return errs

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    passed, failed, skipped = [], [], []
    for name, sql in sorted(oracle.items()):
        if only and name not in only: continue
        try:
            spark_df = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            failed.append((name, [f"no spark output: {e}"])); continue
        try:
            duck_df = con.execute(sql).df()
        except Exception as e:
            failed.append((name, [f"oracle error: {str(e).splitlines()[0]}"])); continue
        errs = compare(name, spark_df, duck_df)
        (passed if not errs else failed).append((name, errs))
    for n, _ in passed: print(f"PASS {n}")
    for n, errs in failed:
        print(f"FAIL {n}")
        for e in errs: print(f"     {e}")
    print(f"\n{len(passed)} passed, {len(failed)} failed")

if __name__ == "__main__":
    main()
