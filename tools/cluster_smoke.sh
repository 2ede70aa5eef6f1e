#!/bin/bash
# Differential executor-serialization check: every query + a stateful
# streaming round under single-JVM local[8] vs multi-JVM
# local-cluster[2,4,2048] must produce identical result fingerprints.
# Usage: tools/cluster_smoke.sh [sfDir]   (default /root/testdata/sf0.001)
set -e
cd /root/repo
SF=${1:-/root/testdata/sf0.001}
export SPARK_HOME=/opt/spark
# executor-launch command builder needs this when bypassing load-spark-env.sh
export SPARK_SCALA_VERSION=2.13
tools/run.sh graft.tools.ClusterSmoke 'local[8]' "$SF" 2>/dev/null > /tmp/smoke_local.txt
tools/run.sh graft.tools.ClusterSmoke 'local-cluster[2,4,2048]' "$SF" 2>/dev/null > /tmp/smoke_cluster.txt
if diff /tmp/smoke_local.txt /tmp/smoke_cluster.txt; then
  echo "CLUSTER SMOKE OK: $(wc -l < /tmp/smoke_local.txt) fingerprints identical across JVM boundaries"
else
  echo "CLUSTER SMOKE FAILED: results differ between local and local-cluster" >&2
  exit 1
fi
