#!/usr/bin/env python3
"""Compare two Bench JSON files, calibration-normalized.

Usage: python3 scripts/bench_compare.py <prev.json> <cur.json> [threshold]

Prints the calib-normalized geomean ratio over common queries, per-query
regressions above the threshold (default 1.25x), and the slowest current
queries. The calib field (a fixed small reference query) absorbs
machine/JIT noise between runs.
"""
import json, math, sys

prev = json.load(open(sys.argv[1]))
cur = json.load(open(sys.argv[2]))
thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.25

pq, cq = prev["queries"], cur["queries"]
norm = prev["calib"] / cur["calib"]
common = sorted(k for k in cq if k in pq)
if not common:
    sys.exit("no common queries")
ratios = sorted(((cq[k] * norm / pq[k], k) for k in common), reverse=True)
geo = math.exp(sum(math.log(r) for r, _ in ratios) / len(ratios))
print(f"prev total {prev['value']:.1f}s (calib {prev['calib']:.3f}, "
      f"n={len(pq)})  cur total {cur['value']:.1f}s "
      f"(calib {cur['calib']:.3f}, n={len(cq)})")
print(f"geomean normalized ratio over {len(common)} common queries: {geo:.3f}")
print(f"\nregressions > {thr}x (calib-normalized):")
for r, k in ratios:
    if r > thr:
        print(f"  {k:30s} {r:5.2f}x  {pq[k]:7.2f} -> {cq[k]:7.2f}")
print("\nslowest current queries:")
for k, v in sorted(cq.items(), key=lambda x: -x[1])[:12]:
    print(f"  {k:30s} {v:7.2f}  prev {pq.get(k, float('nan')):7.2f}")
only = [k for k in cq if k not in pq]
if only:
    print(f"\nnew queries ({len(only)}):",
          ", ".join(f"{k}={cq[k]:.2f}s" for k in sorted(only)))
