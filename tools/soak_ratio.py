#!/usr/bin/env python3
"""Scale-step ratio analysis between two Bench JSON records.

Usage: python3 tools/soak_ratio.py <small.json> <big.json> [step]

Prints per-query wall-time ratios sorted descending, flagging anything
above `step` (the nominal data multiplier between the two runs, default
10) — i.e. queries growing superlinearly in the data step. Dev tool only.
"""
import sys, json

def main():
    a = json.load(open(sys.argv[1]))["queries"]
    b = json.load(open(sys.argv[2]))["queries"]
    step = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    rows = []
    for k, vb in b.items():
        va = a.get(k)
        if not isinstance(va, (int, float)) or not isinstance(vb, (int, float)):
            rows.append((float("inf"), k, va, vb))
            continue
        rows.append((vb / max(va, 0.05), k, va, vb))
    rows.sort(reverse=True)
    n_super = 0
    for r, k, va, vb in rows:
        flag = ""
        if r == float("inf"):
            flag = "  <-- ERR/missing"
        elif r > step:
            flag = f"  <-- SUPERLINEAR (> {step:g}x)"
            n_super += 1
        print(f"{r:8.2f}x  {va if isinstance(va,(int,float)) else -1:8.2f}s -> "
              f"{vb if isinstance(vb,(int,float)) else -1:8.2f}s  {k}{flag}")
    tot_a = sum(v for v in a.values() if isinstance(v, (int, float)))
    tot_b = sum(v for v in b.values() if isinstance(v, (int, float)))
    print(f"\ntotals: {tot_a:.1f}s -> {tot_b:.1f}s "
          f"({tot_b / max(tot_a, 0.01):.2f}x at a {step:g}x data step); "
          f"{n_super} quer{'y' if n_super == 1 else 'ies'} above the step")

if __name__ == "__main__":
    main()
