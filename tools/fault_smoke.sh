#!/bin/bash
# Real executor-loss fault experiment: kill -9 live CoarseGrainedExecutorBackend
# JVMs mid-WordCount under local-cluster[2,4,2048]; assert identical results +
# reference-shaped FAULT jsonl/summary artifacts.
# Usage: tools/fault_smoke.sh [files] [linesPerFile] [outPrefix]
set -e
cd /root/repo
export SPARK_HOME=/opt/spark
export SPARK_SCALA_VERSION=2.13
tools/run.sh graft.tools.FaultSmoke "${1:-8}" "${2:-1200000}" "${3:-FAULT_r5}"
