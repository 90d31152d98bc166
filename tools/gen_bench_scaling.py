#!/usr/bin/env python3
"""Regenerate BENCH_SCALING.json from two Bench artifacts (sf0.1 and sf1.0)
produced by the SAME binary: per entry, medians + interference-free floors
and the floor-to-floor ratio.

Usage: gen_bench_scaling.py <bench_sf0.1.json> <bench_sf1.0.json> [out.json]
"""
import json, sys

a = json.load(open(sys.argv[1]))
b = json.load(open(sys.argv[2]))
out_path = sys.argv[3] if len(sys.argv) > 3 else "BENCH_SCALING.json"
out = {"methodology": "graft.Bench on HEAD, local[32], plan-warmed median-of-3 per entry; "
       "same binary on both tiers, sequential runs on an idle box. ratio_floor = "
       "sf1.0 floor / sf0.1 floor (the interference-free number that reflects the plan); "
       "sf-independent fixture entries (b01/b02/b04/b07/b08/b09, lifecycle q3x/q4x) "
       "are expected ~1x.",
       "sf0.1_total_sec": round(a["value"], 1), "sf1.0_total_sec": round(b["value"], 1),
       "entries": {}}
for k in sorted(a["queries"]):
    if k not in b["queries"]:
        continue
    am, af = a["queries"][k], a["queries_min"][k]
    bm, bf = b["queries"][k], b["queries_min"][k]
    out["entries"][k] = {"sf0.1_median": round(am, 2), "sf0.1_floor": round(af, 2),
                         "sf1.0_median": round(bm, 2), "sf1.0_floor": round(bf, 2),
                         "ratio_floor": round(bf / af, 1) if af > 0 else None}
json.dump(out, open(out_path, "w"), indent=1)
rs = [v["ratio_floor"] for v in out["entries"].values() if v["ratio_floor"]]
print(f"{out_path}: {len(out['entries'])} entries, total ratio "
      f"{b['value']/a['value']:.2f}x, {sum(1 for r in rs if r <= 3)}/{len(rs)} entries <=3x")
