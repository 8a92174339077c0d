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
# executor JVM logs land under the standalone worker's work dir — the
# driver stderr would NOT show executor-side Janino fallbacks
WORKDIR=/opt/spark/work
MARKER=$(mktemp)
for r in $(seq 1 "$ROUNDS"); do
  for SIZE in "2,4,3072" "8,4,3072"; do
    LOG="/tmp/cluster_err_${r}_${SIZE//,/_}.log"
    /opt/spark/bin/spark-submit --master "local-cluster[$SIZE]" \
      --driver-memory 4g \
      --class graft.bench.ClusterBench "$JAR" "$CORPUS" "$PAGES" \
      2>"$LOG" | grep CLUSTERBENCH | sed "s/^/round=$r size=[$SIZE] /" | tee -a "$OUT"
  done
done
# codegen gate: grep every executor stderr written during THIS run
FALLBACKS=$(find "$WORKDIR" -name stderr -newer "$MARKER" 2>/dev/null \
  | xargs -r grep -l "CompileException" || true)
rm -f "$MARKER"
if [ -n "$FALLBACKS" ]; then
  echo "CODEGEN FALLBACK DETECTED in executor logs:" | tee -a "$OUT"
  echo "$FALLBACKS" | tee -a "$OUT"
  exit 3
fi
echo "--- results in $OUT; executor-log codegen gate passed (no CompileException)"
