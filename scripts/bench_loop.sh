#!/bin/bash
# Load-gated bench attempts (multi-tenant sandbox protocol): wait for a
# quiet window (1-min load < 1.2), run one attempt, log it with the
# load context at start and end. Alternates headline runs with
# cpu-scaling probes (every 3rd attempt).
LOG=${1:-/tmp/bench_r04_attempts.jsonl}
N=${2:-24}
for i in $(seq 1 "$N"); do
  while :; do
    L=$(cut -d' ' -f1 /proc/loadavg)
    awk "BEGIN{exit !($L < 1.2)}" && break
    sleep 45
  done
  L0=$(cut -d' ' -f1 /proc/loadavg)
  if [ $((i % 3)) -eq 0 ]; then MODE="--cpu-scaling"; else MODE=""; fi
  OUT=$(timeout 1200 python /root/repo/bench.py $MODE 2>/dev/null | tail -1)
  [ -z "$OUT" ] && OUT=null
  L1=$(cut -d' ' -f1 /proc/loadavg)
  echo "{\"attempt\": $i, \"mode\": \"${MODE:---headline}\", \"load_start\": $L0, \"load_end\": $L1, \"result\": $OUT}" >> "$LOG"
  sleep 20
done
echo done >> "$LOG"
