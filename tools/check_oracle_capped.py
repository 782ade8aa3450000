#!/usr/bin/env python3
"""check_oracle with a per-query DuckDB wall cap — for scale soaks.

Usage: python3 tools/check_oracle_capped.py <sfDir> <verifyOutDir> [capSeconds]

Identical compare semantics to check_oracle.py (the driver's stand-in),
but each oracle SQL runs under a wall cap (default 300 s) and is reported
as ORACLE-TIMEOUT instead of hanging the whole replay: at the 100x soak
step a handful of pair-quadratic oracles (the minhash/levenshtein chains)
are hours-slow in DuckDB while the Spark side is fine — a capped replay
still proves every feasible query and NAMES the skipped ones. Dev tool
only; the shipped engine has zero Python dependencies.
"""
import sys, json, glob, os, threading

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from check_oracle import TABLES, cmp_frames


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    cap = float(sys.argv[3]) if len(sys.argv) > 3 else 300.0
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        pat = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pat}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok, n_to = 0, 0
    all_dirs = sorted(d.split("/")[-1] for d in glob.glob(f"{out_dir}/*") if not d.endswith(".json"))
    for name in all_dirs:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"  {name:28} NO-OUTPUT", flush=True)
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        if list(spark_df.columns) == ["err"]:
            print(f"  {name:28} ERR {spark_df['err'].iloc[0] if len(spark_df) else ''}", flush=True)
            continue
        if name not in oracle:
            status = f"rows-only ({len(spark_df)} rows)" + (" EMPTY!" if len(spark_df) == 0 else "")
            print(f"  {name:28} {status}", flush=True)
            n_ok += 1 if len(spark_df) > 0 else 0
            continue
        # done-flag guards the race where the timer fires between fetchdf()
        # returning and cancel(): a late con.interrupt() would abort the
        # NEXT query on the shared connection and misreport it as a timeout
        done = threading.Event()

        def _interrupt():
            if not done.is_set():
                con.interrupt()

        timer = threading.Timer(cap, _interrupt)
        timer.start()
        try:
            odf = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            msg = str(e)
            if "INTERRUPT" in msg.upper():
                print(f"  {name:28} ORACLE-TIMEOUT (> {cap:g}s in DuckDB; "
                      f"spark rows={len(spark_df)})", flush=True)
                n_to += 1
            else:
                print(f"  {name:28} ORACLE-SQL-ERR {msg[:200]}", flush=True)
            continue
        finally:
            done.set()
            timer.cancel()
        r = cmp_frames(spark_df, odf)
        print(f"  {name:28} {r}", flush=True)
        if r == "OK":
            n_ok += 1
    print(f"== {n_ok}/{len(all_dirs)} ok, {n_to} oracle-timeouts ==")


if __name__ == "__main__":
    main()
