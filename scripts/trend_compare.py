#!/usr/bin/env python3
"""Compare a bench artifact's per-query seconds to the per-query minima
across all previous calm full-inventory artifacts (the BASELINE.md trend
anchor), printing total, s/q, median ratio, and the worst movers.

Usage: python3 scripts/trend_compare.py <new_bench.json> [old1.json old2.json ...]
If no old artifacts are given, uses the repo's calm full-run set.
"""
import sys, json, glob, statistics

new = json.load(open(sys.argv[1]))
olds = sys.argv[2:] or [
    "bench_r13_full233.json", "bench_r13_full233_b.json",
    "bench_r14_calm235.json", "bench_r14_full235.json",
    "bench_r15_sametree.json", "bench_r15_full235.json",
]

minima = {}
for p in olds:
    try:
        d = json.load(open(p))
    except Exception:
        continue
    for q, v in d.get("queries", {}).items():
        if q not in minima or v < minima[q]:
            minima[q] = v

qs = new.get("queries", {})
common = sorted(set(qs) & set(minima))
ratios = {q: qs[q] / minima[q] for q in common if minima[q] > 0}
tot_new = sum(qs[q] for q in common)
tot_min = sum(minima[q] for q in common)
print(f"new total {sum(qs.values()):.1f} s / {len(qs)} q "
      f"({sum(qs.values())/len(qs):.3f} s/q)")
print(f"common-{len(common)} vs minima anchor: {tot_new:.1f} vs {tot_min:.1f} "
      f"({tot_new/tot_min:.3f}x, anchor {tot_min/len(common):.3f} s/q)")
print(f"median per-query ratio: {statistics.median(ratios.values()):.3f}")
print("\nworst absolute movers (new - min, top 20):")
movers = sorted(common, key=lambda q: -(qs[q] - minima[q]))[:20]
for q in movers:
    print(f"  {qs[q]-minima[q]:+6.2f}  {qs[q]:6.2f} vs {minima[q]:6.2f}  "
          f"({ratios[q]:.2f}x)  {q}")
print("\nbest improvements (new - min, top 10):")
for q in sorted(common, key=lambda q: qs[q] - minima[q])[:10]:
    print(f"  {qs[q]-minima[q]:+6.2f}  {qs[q]:6.2f} vs {minima[q]:6.2f}  "
          f"({ratios[q]:.2f}x)  {q}")
