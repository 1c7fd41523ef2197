#!/usr/bin/env python3
"""Merge N Bench JSON lines into per-query medians (markdown table to stdout).
Usage: bench_median.py run1.json run2.json run3.json"""
import json, statistics, sys

runs = [json.load(open(p)) for p in sys.argv[1:]]
names = sorted(runs[0]["queries"].keys())
meds = {}
for n in names:
    vals = [r["queries"].get(n) for r in runs]
    if any(v is None or v < 0 for v in vals):
        meds[n] = None
    else:
        meds[n] = statistics.median(vals)
totals = [r["value"] for r in runs]
print(f"run totals: {', '.join('%.1f' % t if t is not None else 'FAILED' for t in totals)} s")
ok = [v for v in meds.values() if v is not None]
print(f"per-query-median total: {sum(ok):.1f} s over {len(ok)} queries; "
      f"failed: {[n for n, v in meds.items() if v is None]}")
print()
print("| query | sec (median of 3) |")
print("|---|---|")
for n in names:
    print(f"| {n} | {meds[n]:.2f} |" if meds[n] is not None else f"| {n} | FAILED |")
