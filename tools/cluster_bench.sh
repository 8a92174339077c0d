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
# codegen gate: grep every executor stderr written during THIS run.
# Zero found files means we looked in the WRONG place (different
# SPARK_WORKER_DIR / install layout) — that must FAIL, not silently
# pass, or the gate stops gating.
NEWLOGS=$(find "$WORKDIR" -name stderr -newer "$MARKER" 2>/dev/null || true)
rm -f "$MARKER"
if [ -z "$NEWLOGS" ]; then
  echo "CODEGEN GATE INCONCLUSIVE: no executor stderr found under $WORKDIR" | tee -a "$OUT"
  exit 5
fi
FALLBACKS=$(echo "$NEWLOGS" | xargs -r grep -l "CompileException" || true)
if [ -n "$FALLBACKS" ]; then
  echo "CODEGEN FALLBACK DETECTED in executor logs:" | tee -a "$OUT"
  echo "$FALLBACKS" | tee -a "$OUT"
  exit 3
fi
# determinism gate: the digest must be byte-identical across every run
# and BOTH cluster sizes (the thread-mode harness require()s this;
# the multi-JVM path is the whole point of the cross-JVM witness)
NDIGESTS=$(grep -o '"digest":"[^"]*"' "$OUT" | sort -u | wc -l)
if [ "$NDIGESTS" -ne 1 ]; then
  echo "DIGEST MISMATCH across runs/sizes:" | tee -a "$OUT"
  grep -o '"digest":"[^"]*"' "$OUT" | sort -u | tee -a "$OUT"
  exit 4
fi
echo "--- results in $OUT; codegen gate passed; digests identical across all runs"
