#!/usr/bin/env python3
"""Compare two graft.Bench records: per-entry walls, deltas, totals.
Usage: python3 tools/bench_diff.py <before.json> <after.json> [minAbs]
"""
import json, sys

def load(p):
    return json.load(open(p))

def main(a, b, min_abs=0.3):
    ra, rb = load(a), load(b)
    qa, qb = ra["queries"], rb["queries"]
    common = [k for k in qa if k in qb]
    rows = sorted(((qb[k] - qa[k], k) for k in common))
    print(f"total before={ra['value']:.1f} after={rb['value']:.1f} "
          f"delta={rb['value']-ra['value']:+.1f} "
          f"entries {len(qa)}->{len(qb)} failed a={ra['failed']} b={rb['failed']}")
    print("-- improvements --")
    for d, k in rows:
        if d <= -min_abs:
            print(f"{qa[k]:7.2f} -> {qb[k]:7.2f}  {d:+6.2f}  {k}")
    print("-- regressions --")
    for d, k in reversed(rows):
        if d >= min_abs:
            print(f"{qa[k]:7.2f} -> {qb[k]:7.2f}  {d:+6.2f}  {k}")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], float(sys.argv[3]) if len(sys.argv) > 3 else 0.3)
