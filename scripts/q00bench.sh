#!/bin/bash
# One-query timing harness for the flagship profile (GRAFT_VERBOSE pass
# timings to stderr). Usage: scripts/q00bench.sh [sfDir] [runs]
set -e
cd /root/repo
SF=${1:-/root/testdata/sf0.1}
RUNS=${2:-1}
GRAFT_VERBOSE=1 SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_CPUS=32 SPARK_GRAFT_Q00_RUNS=$RUNS \
  sbt -batch "runMain graft.Q00Bench" 2>&1 | grep -E "\[profiler\]|\[q00bench\]"
