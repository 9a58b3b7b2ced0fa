#!/usr/bin/env python3
"""Interleaved A/B adjudication of the r12->r13 bench drift (r13 verdict
item 1). Inputs: four one-line Bench JSONs from the SAME host, same
testdata, run alternately r12, r13, r12, r13. For each query present in
both catalogs, takes the min over each code version's two runs (the
Bench steady-state convention) and reports the per-query r13/r12 ratio
distribution plus the runs' self-consistency (r12 run1 vs run2).

Usage: python3 tools/ab_drift.py r12_run1.json r13_run1.json r12_run2.json r13_run2.json
"""
import json
import statistics
import sys


def load(p):
    return json.load(open(p))["queries"]


def main():
    a1, b1, a2, b2 = (load(p) for p in sys.argv[1:5])
    common = sorted(set(a1) & set(b1) & set(a2) & set(b2))
    r12 = {q: min(a1[q], a2[q]) for q in common}
    r13 = {q: min(b1[q], b2[q]) for q in common}
    ratios = sorted((r13[q] / r12[q], q) for q in common)
    med = statistics.median(r for r, _ in ratios)
    # self-consistency: the same code run twice, interleaved -- the noise floor
    self12 = sorted(min(a2[q], a1[q]) / max(min(a1[q], a2[q]), 1e-9)
                    for q in common)
    noise = statistics.median(abs(a2[q] - a1[q]) / min(a1[q], a2[q])
                              for q in common)
    print(f"common queries: {len(common)}")
    print(f"median r13/r12 (min-of-two each): {med:.3f}")
    print(f"quartiles: {statistics.quantiles([r for r, _ in ratios], n=4)}")
    print(f"same-code r12 run-to-run median |delta|/min: {noise:.3f}")
    print("slowest 10 (q, ratio, r12s, r13s):")
    for r, q in ratios[-10:]:
        print(f"  {q:28s} {r:5.2f}  {r12[q]:6.2f} -> {r13[q]:6.2f}")
    print("fastest 10:")
    for r, q in ratios[:10]:
        print(f"  {q:28s} {r:5.2f}  {r12[q]:6.2f} -> {r13[q]:6.2f}")
    n_over = sum(1 for r, _ in ratios if r > 1.3)
    print(f"queries with ratio > 1.3: {n_over}/{len(common)}")


if __name__ == "__main__":
    main()
