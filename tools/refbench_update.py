#!/usr/bin/env python3
"""Merge a fresh graft.tools.RefBench stdout line into REFBENCH.json,
keeping the reference_comparison block current (verdict r11 item 4: the
headline baseline ratio must be same-tree evidence, regenerated on the
frozen tree each round — REFBENCH.json is in tools/freshness_check.sh's
artifact list).

Usage: tools/run.sh graft.tools.RefBench 2>/dev/null | tail -1 \
         | python3 tools/refbench_update.py
"""
import json
import sys

line = sys.stdin.readline().strip()
fresh = json.loads(line)
assert fresh.get("valid") is True, f"RefBench run invalid: {line}"

REF_BYTES = 4346305527   # BASELINE.md: 12x3M-line corpus on the reference cluster
REF_SECONDS = 570        # stock Hadoop WordCount, 3-container / 4-vcore docker

fresh["reference_comparison"] = {
    "reference_bytes": REF_BYTES,
    "reference_seconds": REF_SECONDS,
    "reference_mb_per_sec": 7.5,
    "speedup": round(REF_SECONDS / fresh["seconds"], 1),
    "note": (
        "graft.tools.RefBench on local[32], one host, same 12x3M-line "
        "synthetic corpus format as cluster/shared/generate_wordcount_data.sh; "
        "reference number is stock Hadoop WordCount on the 3-container / "
        "4-vcore docker cluster on one host (BASELINE.md). Counts validated "
        "against the closed form: 11 fixed + 12 idx + 3M linha words."
    ),
}

with open("REFBENCH.json", "w") as f:
    json.dump(fresh, f)
    f.write("\n")
print(f"REFBENCH.json updated: {fresh['seconds']:.1f}s, "
      f"speedup {fresh['reference_comparison']['speedup']}x")
