#!/bin/bash
# Scaling-curve bench: generate twin datasets at 1x and 10x the sf0.1 row
# counts with the same deterministic generator, run graft.Bench on both,
# and report per-query time ratios. A ratio far above the data ratio (10)
# flags super-linear (quadratic-smelling) behavior that static plan audits
# can only reason about. Writes BENCH_gen1x.json / BENCH_sf1.json.
# Usage: tools/scale_curve.sh [workDir]   (default /tmp/graft-scale)
set -e
cd /root/repo
WORK=${1:-/tmp/graft-scale}
mkdir -p "$WORK"
if [ ! -d "$WORK/gen1x/lineitem.parquet" ]; then
  tools/run.sh graft.tools.GenScale "$WORK/gen1x" 1
fi
if [ ! -d "$WORK/gen10x/lineitem.parquet" ]; then
  tools/run.sh graft.tools.GenScale "$WORK/gen10x" 10
fi
SPARK_GRAFT_SF_DIR="$WORK/gen1x"  SPARK_GRAFT_CPUS=32 tools/run.sh graft.Bench 2>/dev/null > BENCH_gen1x.json
SPARK_GRAFT_SF_DIR="$WORK/gen10x" SPARK_GRAFT_CPUS=32 tools/run.sh graft.Bench 2>/dev/null > BENCH_sf1.json
python3 - <<'EOF'
import json
a = json.load(open("BENCH_gen1x.json"))["queries"]
b = json.load(open("BENCH_sf1.json"))["queries"]
print(f"{'query':34s} {'1x':>7s} {'10x':>8s} {'ratio':>6s}")
flagged = []
for q in sorted(a, key=lambda q: -b[q] / max(a[q], 1e-9)):
    r = b[q] / max(a[q], 1e-9)
    # fixed overheads dominate sub-100ms 1x times; only flag ratios
    # measured against a meaningful base
    mark = ""
    if r > 15 and b[q] > 1.0:
        mark = "  <-- SUPER-LINEAR"
        flagged.append(q)
    print(f"{q:34s} {a[q]:7.2f} {b[q]:8.2f} {r:6.1f}{mark}")
print(f"\ntotal 1x={sum(a.values()):.1f}s 10x={sum(b.values()):.1f}s")
print("FLAGGED:", flagged if flagged else "none")
EOF
