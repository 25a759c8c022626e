#!/usr/bin/env python3
"""Merge a filtered ScaleBench run (scale_bench_partial.json, produced
when SPARK_GRAFT_BENCH_ONLY is set) into the full scale_bench.json:
partial entries overwrite same-named ones, the median/totals are
recomputed over the merged set.

Usage: python3 tools/merge_scale_bench.py [partial] [full]
"""
import json
import statistics
import sys

partial_path = sys.argv[1] if len(sys.argv) > 1 else "scale_bench_partial.json"
full_path = sys.argv[2] if len(sys.argv) > 2 else "scale_bench.json"

partial = json.load(open(partial_path))
full = json.load(open(full_path))
assert partial["factor"] == full["factor"], "mixed scale factors"

merged = dict(full["entries"])
merged.update(partial["entries"])
ratios = sorted(e["ratio"] for e in merged.values()
                if e["small_sec"] > 0.05 and e["big_sec"] >= 0)
full["entries"] = merged
full["n_entries"] = len(merged)
full["value"] = round(ratios[len(ratios) // 2], 3) if ratios else -1.0
full["total_small_sec"] = round(
    sum(e["small_sec"] for e in merged.values() if e["small_sec"] >= 0), 3)
full["total_big_sec"] = round(
    sum(e["big_sec"] for e in merged.values() if e["big_sec"] >= 0), 3)
json.dump(full, open(full_path, "w"))
print(f"merged {len(partial['entries'])} entries into {full_path}: "
      f"{full['n_entries']} total, median ratio {full['value']}")
