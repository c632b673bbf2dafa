#!/bin/bash
# Deliberate CPU co-load for bench pollution-gate validation:
# spins N busy loops (default 8) for DURATION seconds (default 600).
# Usage: tools/cpuload.sh [N] [DURATION]
N="${1:-8}"
DUR="${2:-600}"
for i in $(seq "$N"); do
  ( end=$((SECONDS + DUR)); while [ $SECONDS -lt $end ]; do :; done ) &
done
echo "spinning $N busy loops for $DUR s (pids: $(jobs -p | tr '\n' ' '))"
wait
