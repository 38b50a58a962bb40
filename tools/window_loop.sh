#!/bin/bash
# Round-N bench window accumulator: runs sf0.1 bench windows
# back-to-back, archiving each via bench.py's own bench_runs/ writer
# (which also refreshes minwin_sf0.1.json). Stop early by touching
# bench_runs/STOP_WINDOW_LOOP. Usage: window_loop.sh <start_idx> <count> [label]
set -u
cd "$(dirname "$0")/.."
start=${1:?start index}
count=${2:?window count}
label=${3:-default}
for ((i = 0; i < count; i++)); do
  [ -e bench_runs/STOP_WINDOW_LOOP ] && { echo "stop file seen, exiting"; break; }
  n=$((start + i))
  out=bench_runs/r14_w${n}_${label}.out
  err=bench_runs/r14_w${n}_${label}.err
  echo "=== window $n ($(date -u +%H:%M:%S)) ==="
  python bench.py >"$out" 2>"$err"
  rc=$?
  tail -1 "$err"
  [ $rc -ne 0 ] && echo "window $n FAILED rc=$rc"
  sleep 20
done
echo "window loop done ($(date -u +%H:%M:%S))"
