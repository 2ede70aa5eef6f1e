#!/usr/bin/env bash
# Artifact-freshness gate (verdict r9 item 1): every committed per-tree
# artifact must POSTDATE the last commit that touched src/main — a query
# landing after the final artifact refresh invalidates the evidence
# (the r8/r9 recurring "late-add" finding class).
#
# Usage: tools/freshness_check.sh <round-suffix>     e.g. r10
# Compares git commit times (falls back to worktree mtime for artifacts
# regenerated but not yet committed — regen-then-commit in one commit is
# the expected flow). Exits non-zero listing every stale artifact.
set -u
cd "$(dirname "$0")/.."
SUF="${1:?usage: freshness_check.sh <round-suffix, e.g. r10>}"

SRC_T=$(git log -1 --format=%ct -- src/main tools/*.scala 2>/dev/null || git log -1 --format=%ct -- src/main)
if [ -z "$SRC_T" ]; then echo "cannot determine last src/main commit"; exit 2; fi
echo "last src/main commit: $(git log -1 --format='%h %ci' -- src/main)"

# The per-tree evidence set: all of these are regenerated on the frozen
# final tree each round. Round-suffixed names first, cross-round ones after.
ARTIFACTS=(
  "CORRECTNESS_local_${SUF}.json"
  "LOCALBENCH_${SUF}.json"
  "CLUSTERSMOKE_${SUF}.txt"
  "MEMENV_${SUF}_2g.json"
  "SKEW_${SUF}.json"
  "STREAMBENCH_${SUF}.json"
  "FAULT_${SUF}.summary.json"
  "ANNEVAL_${SUF}.json"
  "HOSTCALIB_${SUF}.json"
  "CORRECTNESS_sf1.json"
  "REFBENCH.json"
  "SCALE_CURVE.txt"
  "BENCH_gen1x.json"
  "BENCH_sf1.json"
  "BENCH_gen100x.json"
)

fail=0
for f in "${ARTIFACTS[@]}"; do
  if [ ! -e "$f" ]; then echo "MISSING $f"; fail=1; continue; fi
  # uncommitted regen counts as fresh via mtime; committed uses commit time
  if git diff --quiet -- "$f" 2>/dev/null && git ls-files --error-unmatch "$f" >/dev/null 2>&1; then
    T=$(git log -1 --format=%ct -- "$f")
  else
    T=$(stat -c %Y "$f")
  fi
  if [ "$T" -lt "$SRC_T" ]; then
    echo "STALE   $f ($(date -d @"$T" '+%F %T') < src/main)"; fail=1
  else
    echo "fresh   $f"
  fi
done

# No committed bench artifact may carry a non-empty failed list (verdict
# r10 item 1c): a -1 row in the evidence chain is a red round, full stop.
for f in BENCH_*.json LOCALBENCH_${SUF}.json MEMENV_${SUF}_2g.json; do
  [ -e "$f" ] || continue
  if ! python3 -c "
import json, sys
j = json.load(open('$f'))
sys.exit(1 if j.get('failed') else 0)"; then
    echo "FAILED-QUERIES $f carries a non-empty failed list"; fail=1
  else
    echo "clean   $f (failed==[])"
  fi
done

if [ "$fail" -ne 0 ]; then
  echo "FRESHNESS CHECK FAILED: regenerate the artifacts above on the frozen tree"
  exit 1
fi
echo "FRESHNESS CHECK OK: all artifacts postdate the last src/main commit"
