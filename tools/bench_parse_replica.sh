#!/bin/bash
# Replica of the driver's bench invocation + parse contract: run
# `sbt "runMain graft.Bench"` exactly as the per-round driver does,
# capture stdout, and json-parse the LAST non-empty stdout line.
# BENCH_r01..r07 all had "parsed": null because sbt re-logged the forked
# JSON behind "[info] " and appended "[success] Total time..." — fixed in
# build.sbt (run/outputStrategy := StdoutOutput, Global/showSuccess := false).
# This script is the regression gate for that fix.
# Usage: tools/bench_parse_replica.sh [sfDir]   (default sf0.001 for speed)
set -e
cd /root/repo
SF=${1:-/root/testdata/sf0.001}
OUT=$(mktemp /tmp/bench_replica_XXXX.out)
SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_OUT=/tmp/bench_replica_full.json \
  sbt "runMain graft.Bench" >"$OUT" 2>/dev/null || { echo "sbt rc=$?"; }
python3 - "$OUT" <<'EOF'
import json, sys
lines = [l for l in open(sys.argv[1]).read().splitlines() if l.strip()]
last = lines[-1] if lines else ""
try:
    parsed = json.loads(last)
except Exception as e:
    print("PARSE FAILED:", e)
    print("last line was:", repr(last[:300]))
    sys.exit(1)
assert parsed.get("metric") == "total" and "qv" in parsed, parsed
assert len(parsed["qv"]) == parsed["n_queries"], (len(parsed["qv"]), parsed["n_queries"])
full = json.load(open("/tmp/bench_replica_full.json"))
# The headline's qv vector must be the full file's queries dict in
# sorted-name order (that ordering is the recoverability contract), and
# the truncated full_sha must bind the stdout line to the full artifact.
names = sorted(full["queries"])
for nm, v in zip(names, parsed["qv"]):
    assert abs(full["queries"][nm] - v) < 0.51 * 10 ** -(len(str(v).split(".")[-1]) - 1) + 1e-9, (nm, v, full["queries"][nm])
import hashlib
sha = hashlib.sha256(open("/tmp/bench_replica_full.json", "rb").read()).hexdigest()
assert parsed["full_sha"] == sha[:16], (parsed["full_sha"], sha[:16])
print("PARSED OK:", json.dumps({k: parsed[k] for k in ("metric", "value", "n_queries", "failed", "n_requeued", "anchor_mt")}))
print("qv recoverability + full_sha binding OK over", len(names), "queries")
print("line length:", len(last))
EOF
