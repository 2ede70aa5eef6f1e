#!/bin/bash
# Differential executor-serialization check: every query + a stateful
# streaming round (RocksDB state store) under single-JVM local[8] vs
# multi-JVM local-cluster must produce identical result fingerprints.
# Topology defaults to 3 executor JVMs x 2 cores (the closest local
# approximation of the reference's 1-master + 2-worker compose file,
# r8 verdict item 8); override with CLUSTER=N,C,MB.
# Usage: [CLUSTER=3,2,2048] tools/cluster_smoke.sh [sfDir]
set -e
cd /root/repo
SF=${1:-/root/testdata/sf0.001}
TOPO=${CLUSTER:-3,2,2048}
export SPARK_HOME=/opt/spark
# executor-launch command builder needs this when bypassing load-spark-env.sh
export SPARK_SCALA_VERSION=2.13
tools/run.sh graft.tools.ClusterSmoke 'local[8]' "$SF" 2>/dev/null > /tmp/smoke_local.txt
tools/run.sh graft.tools.ClusterSmoke "local-cluster[$TOPO]" "$SF" 2>/dev/null > /tmp/smoke_cluster.txt
if diff /tmp/smoke_local.txt /tmp/smoke_cluster.txt; then
  echo "CLUSTER SMOKE OK: $(wc -l < /tmp/smoke_local.txt) fingerprints identical across JVM boundaries"
else
  echo "CLUSTER SMOKE FAILED: results differ between local and local-cluster" >&2
  exit 1
fi
