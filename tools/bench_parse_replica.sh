#!/bin/bash
# Replica of the driver's bench invocation + parse contract: run
# `sbt "runMain graft.Bench"` exactly as the per-round driver does,
# capture stdout, and json-parse the LAST non-empty stdout line.
# BENCH_r01..r07 all had "parsed": null because sbt re-logged the forked
# JSON behind "[info] " and appended "[success] Total time..." — fixed in
# build.sbt (run/outputStrategy := StdoutOutput, Global/showSuccess := false).
# This script is the regression gate for that fix, and (r16) for the
# restored driver contract: the stdout line carries a NAMED
# "queries":{...} map (the rounds-1..14 headline subset — r15's anonymous
# qv vector blinded the driver's per-query comparison, PERF_r15
# n_common: 0), stays under 2000 chars, and binds to the committed full
# artifact (which carries the full named map AND the qv vector) via
# full_sha.
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
assert parsed.get("metric") == "total", parsed
assert len(last) < 2000, ("headline line too long for the driver tail", len(last))
# Driver contract (restored r16): a NAMED per-query map the driver can
# diff round-over-round. 63-name subset, every name present in the full
# artifact with the identical value.
q = parsed.get("queries")
assert isinstance(q, dict) and len(q) >= 60, ("named queries map missing/short", type(q), len(q or {}))
full = json.load(open("/tmp/bench_replica_full.json"))
for nm, v in q.items():
    assert nm in full["queries"], ("headline name not in full artifact", nm)
    assert abs(full["queries"][nm] - v) < 5e-4 + 1e-9, (nm, v, full["queries"][nm])
# Full-pack qv vector lives in the full artifact, sorted-name order.
names = sorted(full["queries"])
assert len(full["qv"]) == len(names), (len(full["qv"]), len(names))
for nm, v in zip(names, full["qv"]):
    assert abs(full["queries"][nm] - v) < 0.51 * 10 ** -(len(str(v).split(".")[-1]) - 1) + 1e-9, (nm, v, full["queries"][nm])
import hashlib
sha = hashlib.sha256(open("/tmp/bench_replica_full.json", "rb").read()).hexdigest()
assert parsed["full_sha"] == sha[:16], (parsed["full_sha"], sha[:16])
print("PARSED OK:", json.dumps({k: parsed[k] for k in ("metric", "value", "n_queries", "failed", "n_requeued", "anchor_mt", "med_q")}))
print("named-map contract + qv recoverability + full_sha binding OK over", len(names), "queries")
EOF
