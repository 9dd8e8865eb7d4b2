#!/bin/bash
# r17 dev helper: run the q00-family bench subset N times at a core count,
# print per-run steal + q00/q00b pass pairs. Usage: q00b_ab.sh <cpus> <reps> <tag>
CPUS=${1:-32}; REPS=${2:-2}; TAG=${3:-cfg}
for i in $(seq 1 "$REPS"); do
  OUT=$(SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS="$CPUS" \
        SPARK_GRAFT_ONLY=q00 sbt -batch "runMain graft.Bench" 2>/dev/null |
        grep -ao '{"metric":"total".*' | tail -1)
  STEAL=$(echo "$OUT" | grep -ao '"cpu_steal_frac":[0-9.\-]*' | head -1)
  Q00=$(echo "$OUT" | grep -ao '"q00_profile_lineitem":\[[0-9.,]*\]' | tail -1)
  Q00B=$(echo "$OUT" | grep -ao '"q00b_profile_sketch":\[[0-9.,]*\]' | tail -1)
  Q00C=$(echo "$OUT" | grep -ao '"q00c_profile_gate":\[[0-9.,]*\]' | tail -1)
  echo "[$TAG cpus=$CPUS run$i] $STEAL $Q00 $Q00B $Q00C"
done
