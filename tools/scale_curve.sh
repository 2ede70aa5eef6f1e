#!/bin/bash
# Scaling-curve bench: generate twin datasets at 1x / 10x (and, with
# SCALE_3PT=1, 100x) the sf0.1 row counts with the same deterministic
# generator, run graft.Bench on each, and report per-query time ratios.
# A ratio far above the data ratio flags super-linear (quadratic-smelling)
# behavior that static plan audits can only reason about. Writes
# BENCH_gen1x.json / BENCH_sf1.json (and BENCH_gen100x.json at 3 points).
# Usage: [SCALE_3PT=1] tools/scale_curve.sh [workDir]  (default /tmp/graft-scale)
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
# Keep a bounded stderr tail per point (verdict r10 item 1b): a failed
# query's cause must stay diagnosable from the curve run itself.
run_point() { # $1=sfDir $2=outJson $3=stderrTail
  SPARK_GRAFT_SF_DIR="$1" SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BENCH_REPS=3 \
    SPARK_GRAFT_BENCH_OUT="$2" tools/run.sh graft.Bench \
    >/dev/null 2> >(tail -c 20000 > "$3")
}
run_point "$WORK/gen1x"  "$PWD/BENCH_gen1x.json" "$WORK/gen1x.stderr.tail"
run_point "$WORK/gen10x" "$PWD/BENCH_sf1.json"   "$WORK/gen10x.stderr.tail"
if [ "${SCALE_3PT:-0}" = "1" ]; then
  if [ ! -d "$WORK/gen100x/lineitem.parquet" ]; then
    tools/run.sh graft.tools.GenScale "$WORK/gen100x" 100
  fi
  run_point "$WORK/gen100x" "$PWD/BENCH_gen100x.json" "$WORK/gen100x.stderr.tail"
fi
python3 - <<'EOF'
import json, os, sys
aj = json.load(open("BENCH_gen1x.json"))
bj = json.load(open("BENCH_sf1.json"))
cj = (json.load(open("BENCH_gen100x.json"))
      if os.path.exists("BENCH_gen100x.json") else None)
a, b = aj["queries"], bj["queries"]
c = cj["queries"] if cj else None
flagged = []
# A -1 row is a FAILED query (all reps + retry threw) — it must flag the
# curve loudly (verdict r10 item 1b), never vanish from the total.
for tag, j in [("1x", aj), ("10x", bj)] + ([("100x", cj)] if cj else []):
    for q in j.get("failed", []):
        flagged.append(f"{q}@{tag} FAILED")
    print(f"[{tag}] loadavg={j.get('loadavg','?')} "
          f"mem_avail_kb={j.get('mem_available_kb','?')} "
          f"failed={j.get('failed', [])}")
if c:
    print(f"{'query':34s} {'1x':>7s} {'10x':>8s} {'100x':>9s} {'r10':>5s} {'r100':>6s}")
    # rank by the 100x/1x ratio: the widest lever arm on scaling behavior
    for q in sorted(a, key=lambda q: -c[q] / max(a[q], 1e-9)):
        r10, r100 = b[q] / max(a[q], 1e-9), c[q] / max(a[q], 1e-9)
        # fixed overheads dominate sub-100ms 1x times; only flag ratios
        # measured against a meaningful base
        mark = ""
        if r100 > 150 and c[q] > 1.0:
            mark = "  <-- SUPER-LINEAR"
            flagged.append(q)
        print(f"{q:34s} {a[q]:7.2f} {b[q]:8.2f} {c[q]:9.2f} {r10:5.1f} {r100:6.1f}{mark}")
    print(f"\ntotal 1x={sum(a.values()):.1f}s 10x={sum(b.values()):.1f}s "
          f"100x={sum(c.values()):.1f}s")
else:
    print(f"{'query':34s} {'1x':>7s} {'10x':>8s} {'ratio':>6s}")
    for q in sorted(a, key=lambda q: -b[q] / max(a[q], 1e-9)):
        r = b[q] / max(a[q], 1e-9)
        mark = ""
        if r > 15 and b[q] > 1.0:
            mark = "  <-- SUPER-LINEAR"
            flagged.append(q)
        print(f"{q:34s} {a[q]:7.2f} {b[q]:8.2f} {r:6.1f}{mark}")
    print(f"\ntotal 1x={sum(a.values()):.1f}s 10x={sum(b.values()):.1f}s")
print("FLAGGED:", flagged if flagged else "none")
if any(f.endswith("FAILED") for f in flagged):
    sys.exit(1)  # a failed bench row must fail the curve run, not hide in it
EOF
