#!/usr/bin/env python3
"""Stream-twin == batch equivalence check over a Verify dump.

Usage: python3 tools/check_twins.py <verifyOutDir>

The replayed-stream twins and their batch pipelines share ONE oracle by
contract (stream == batch). At soak scales where the DuckDB oracle itself
is infeasible for the pair-quadratic pipelines, this checks the contract
directly engine-side: the twin's dump must equal the batch dump
value-for-value (column-name-sorted, row-sorted — the driver's compare
canonicalization). Dev tool only.
"""
import sys, glob

import pandas as pd

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from check_oracle import cmp_frames

PAIRS = [
    # twin dump                batch dump       aligning projection (twin cols -> batch cols)
    ("stream_neardup_twin", "dedup_minhash"),
    ("stream_semantic_twin", "dedup_semantic"),
]


def load(out_dir, name):
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        return None
    return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)


def main():
    out_dir = sys.argv[1]
    fails = 0
    for twin, batch in PAIRS:
        a, b = load(out_dir, twin), load(out_dir, batch)
        if a is None or b is None:
            print(f"  {twin:24} MISSING-DUMP (twin={a is not None} batch={b is not None})")
            fails += 1
            continue
        # compare on the twin's column set (the batch dump may carry extras)
        try:
            b2 = b[list(a.columns)]
        except KeyError as e:
            print(f"  {twin:24} SCHEMA twin cols {list(a.columns)} not in batch: {e}")
            fails += 1
            continue
        r = cmp_frames(a, b2)
        print(f"  {twin:24} vs {batch:20} {r}  ({len(a)} rows)")
        if r != "OK":
            fails += 1
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
