#!/usr/bin/env python3
"""Record the sf10 spot tier into BENCH_SCALING.json.

Takes a Bench detail artifact produced at sf10 (the scale-critical
spot list, not the full suite) and merges an "sf10_spot" section into
BENCH_SCALING.json: per entry, sf10 median + interference-free floor
and the floor-to-floor ratio against the sf1.0 floor already recorded
in the pair section.

Usage: gen_sf10_spot.py <bench_sf10.json> [BENCH_SCALING.json]
"""
import json, sys

spot = json.load(open(sys.argv[1]))
path = sys.argv[2] if len(sys.argv) > 2 else "BENCH_SCALING.json"
out = json.load(open(path))
section = {"methodology": "graft.Bench on HEAD at sf10 (60M lineitem rows, 571k docs, "
           "200k embeddings — tools/GenScale from sf1.0, same invariants), 24g heap, "
           "idle box, plan-warmed median-of-3 per entry; spot list = the scale-critical "
           "dedup/ANN/streaming/b families only. ratio_floor = sf10 floor / sf1.0 floor "
           "for 10x data. NOTE on the asymptote: local[32] cores are already saturated "
           "by most of these plans at sf1.0, so linear work measures ~10x here (the "
           "sf0.1->sf1.0 step measured <3x only because idle cores absorbed the growth); "
           "the grade at this decade is sub-quadratic candidate/output growth, not <=3x.",
           "sf10_total_sec": round(spot["value"], 1), "entries": {}}
for k in sorted(spot["queries"]):
    m, f = spot["queries"][k], spot["queries_min"][k]
    base = out.get("entries", {}).get(k, {}).get("sf1.0_floor")
    section["entries"][k] = {
        "sf10_median": round(m, 2), "sf10_floor": round(f, 2),
        "sf1.0_floor": base,
        "ratio_floor": round(f / base, 1) if base else None}
out["sf10_spot"] = section
json.dump(out, open(path, "w"), indent=1)
rs = [v["ratio_floor"] for v in section["entries"].values() if v["ratio_floor"]]
print(f"{path}: sf10_spot {len(section['entries'])} entries, "
      f"{sum(1 for r in rs if r <= 10)}/{len(rs)} <= 10x (linear) floor-to-floor")
for k, v in sorted(section["entries"].items(), key=lambda kv: -(kv[1]["ratio_floor"] or 0)):
    print(f"  {k:32s} {v['sf1.0_floor']} -> {v['sf10_floor']} = {v['ratio_floor']}x")
