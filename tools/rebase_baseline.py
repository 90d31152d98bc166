#!/usr/bin/env python3
"""Regenerate the BASELINE.md measured table from N independent Bench
artifacts (the driver's BENCH_r*.json or local runs of graft.Bench).

Per entry: baseline = median across runs of the per-run median-of-3;
floor = min across runs of the per-run interference-free floor
(queries_min). Emits a markdown table sorted by entry name.

Usage: rebase_baseline.py bench1.json [bench2.json ...]
"""
import json, statistics, sys

runs = []
for p in sys.argv[1:]:
    with open(p) as f:
        # bench output is ONE json line; tolerate surrounding log lines
        for line in f:
            line = line.strip()
            if line.startswith('{"metric"'):
                runs.append(json.loads(line))
                break
if not runs:
    sys.exit("no bench artifacts parsed")

names = sorted({k for r in runs for k in r["queries"]})
print(f"| entry | sec (median of {len(runs)} runs) | floor |")
print("|---|---|---|")
total = 0.0
for n in names:
    meds = [r["queries"][n] for r in runs if n in r["queries"] and r["queries"][n] >= 0]
    mins = [r.get("queries_min", {}).get(n, 1e9) for r in runs if n in r.get("queries_min", {})]
    if not meds:
        print(f"| {n} | FAILED | — |")
        continue
    med = statistics.median(meds)
    flo = min(mins) if mins else med
    total += med
    print(f"| {n} | {med:.2f} | {flo:.2f} |")
print(f"\ntotal (sum of medians): {total:.1f} s over {len(names)} entries")
