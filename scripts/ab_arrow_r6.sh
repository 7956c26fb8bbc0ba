#!/bin/bash
# Round-6 A/B (round-5 verdict #7): Arrow batch 128 vs 256 (baseline) vs
# arrow selfDestruct at local[32], judged on pyworker USER time (the
# storm-tolerant signal) with urls_per_sec + during-run steal% alongside.
# Interleaved reps so one storm cannot contaminate a whole condition.
set -u
cd "$(dirname "$0")/.."
OUT=BENCH/explore_r6.jsonl
for rep in 1 2; do
  for cond in A B C; do
    for _ in $(seq 1 40); do
      L=$(cut -d' ' -f1 /proc/loadavg)
      awk -v l="$L" 'BEGIN{exit !(l<1.0)}' && break
      sleep 10
    done
    case $cond in
      A) args="" ;;
      B) args="SPARK_GRAFT_ARROW_BATCH=128" ;;
      C) args="SPARK_GRAFT_EXTRA_CONF=spark.sql.execution.arrow.pyspark.selfDestruct.enabled=true" ;;
    esac
    echo "{\"ab\": \"arrow_r6\", \"rep\": $rep, \"cond\": \"$cond\", \"load\": $(cut -d' ' -f1 /proc/loadavg)}" >> "$OUT"
    # shellcheck disable=SC2086
    python3 scripts/worker_cpu_probe.py 32 $args >> "$OUT" 2>/dev/null
  done
done
echo '{"ab": "arrow_r6", "done": true}' >> "$OUT"
