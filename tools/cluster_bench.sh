#!/bin/bash
# Multi-JVM two-cluster-size scaling evidence (north rule: N vs 4N
# executors): interleaved spark-submit runs of graft.bench.ClusterBench
# on local-cluster[2,4,*] vs local-cluster[8,4,*] — separate executor
# JVMs, same corpus, same digest witness. Interleaving sizes within each
# round is the host-noise protocol (CLAUDE.md): never compare two
# configs from disjoint time windows on this bursty box.
#
# Usage: tools/cluster_bench.sh <corpusPath> <pages> [rounds]
# Prereq: sbt -batch package; corpus materialized by ScalingBench.
set -euo pipefail
JAR=$(ls target/scala-2.13/nougatspark*.jar | head -1)
CORPUS=$1
PAGES=$2
ROUNDS=${3:-3}
OUT=/tmp/cluster_bench_results.txt
: > "$OUT"
for r in $(seq 1 "$ROUNDS"); do
  for SIZE in "2,4,3072" "8,4,3072"; do
    LOG="/tmp/cluster_err_${r}_${SIZE//,/‗}.log"
    /opt/spark/bin/spark-submit --master "local-cluster[$SIZE]" \
      --driver-memory 4g \
      --class graft.bench.ClusterBench "$JAR" "$CORPUS" "$PAGES" \
      2>"$LOG" | grep CLUSTERBENCH | sed "s/^/round=$r size=[$SIZE] /" | tee -a "$OUT"
    if grep -q "CompileException" "$LOG"; then
      echo "CODEGEN FALLBACK DETECTED in $LOG" | tee -a "$OUT"
    fi
  done
done
echo "--- results in $OUT; codegen clean unless flagged above"
