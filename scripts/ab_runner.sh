#!/bin/bash
# Alternating A/B crawl-bench samples with a real idle wait between runs.
# Usage: scripts/ab_runner.sh OUTFILE REPS CPUS -- [env for condition B...]
set -u
OUT="$1"; REPS="$2"; CPUS="$3"; shift 3
[ "${1:-}" = "--" ] && shift
wait_idle() {
  for _ in $(seq 1 60); do
    L=$(cut -d' ' -f1 /proc/loadavg)
    awk -v l="$L" 'BEGIN{exit !(l<1.5)}' && return 0
    sleep 10
  done
}
for rep in $(seq 1 "$REPS"); do
  wait_idle
  echo "{\"rep\": $rep, \"cond\": \"A\", \"load\": $(cut -d' ' -f1 /proc/loadavg)}" >> "$OUT"
  python3 scripts/worker_cpu_probe.py "$CPUS" >> "$OUT" 2>/dev/null
  wait_idle
  echo "{\"rep\": $rep, \"cond\": \"B\", \"load\": $(cut -d' ' -f1 /proc/loadavg)}" >> "$OUT"
  python3 scripts/worker_cpu_probe.py "$CPUS" "$@" >> "$OUT" 2>/dev/null
done
echo '{"done": true}' >> "$OUT"
