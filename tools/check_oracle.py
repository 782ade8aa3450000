#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, runs each SQL in DuckDB against the
parquet tables in <sfDir>, loads the Spark result parquet, and compares
(column-name-sorted, row-sorted) values. Dev tool only — not part of the
library; the shipped engine has zero Python dependencies.
"""
import sys, json, glob, math

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort", ignore_index=True)
    return df


def cmp_frames(a: pd.DataFrame, b: pd.DataFrame) -> str:
    if sorted(a.columns) != sorted(b.columns):
        return f"SCHEMA cols spark={sorted(a.columns)} oracle={sorted(b.columns)}"
    if len(a) != len(b):
        return f"ROWS spark={len(a)} oracle={len(b)}"
    a, b = canon(a), canon(b)
    for c in a.columns:
        av, bv = a[c], b[c]
        try:
            if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
                ok = ((av.isna() & bv.isna()) | (av.astype(float) == bv.astype(float))).all()
            else:
                ok = av.astype(object).where(pd.notna(av), None).equals(
                    bv.astype(object).where(pd.notna(bv), None))
        except Exception as e:
            return f"COMPARE-ERR col {c}: {e}"
        if not ok:
            neq = (av.astype(object).values != bv.astype(object).values)
            idx = [i for i, x in enumerate(neq) if x][:3]
            return f"VALUES col {c} rows {idx}: spark={list(av.iloc[idx])} oracle={list(bv.iloc[idx])}"
    return "OK"


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    import os
    for t in TABLES:
        # driver testdata ships each table as ONE parquet file; Spark-written
        # corpora (SoakData) ship a <table>.parquet/ DIRECTORY of part files
        path = f"{sf_dir}/{t}.parquet"
        pat = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pat}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = 0
    all_dirs = sorted(d.split("/")[-1] for d in glob.glob(f"{out_dir}/*") if not d.endswith(".json"))
    for name in all_dirs:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"  {name:28} NO-OUTPUT")
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        # Verify writes a one-row {err} parquet when a query fails to
        # build/run; it must never read as a healthy rows-only result
        if list(spark_df.columns) == ["err"]:
            print(f"  {name:28} ERR {spark_df['err'].iloc[0] if len(spark_df) else ''}")
            continue
        if name not in oracle:
            status = f"rows-only ({len(spark_df)} rows)" + (" EMPTY!" if len(spark_df) == 0 else "")
            print(f"  {name:28} {status}")
            n_ok += 1 if len(spark_df) > 0 else 0
            continue
        try:
            odf = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"  {name:28} ORACLE-SQL-ERR {e}")
            continue
        r = cmp_frames(spark_df, odf)
        print(f"  {name:28} {r}")
        if r == "OK":
            n_ok += 1
    print(f"== {n_ok}/{len(all_dirs)} ok ==")


if __name__ == "__main__":
    main()
