#!/bin/bash
# Round-4 TPU measurement batch — run ALONE (tunnel contention corrupts
# numbers). One process at a time, sequential, all output to one log.
set -u
cd /root/repo
LOG=${1:-/tmp/r4_batch1.log}
: > "$LOG"
run() {
  echo "=== $* [$(date +%H:%M:%S)] ===" >> "$LOG"
  timeout "$TMO" "$@" >> "$LOG" 2>&1
  echo "=== rc=$? [$(date +%H:%M:%S)] ===" >> "$LOG"
}
TMO=2400 run python tools/profile_recheck.py
TMO=2400 run python tools/profile_cells.py
TMO=4800 run python tools/bench_e2e.py --runs 4 --dtype bfloat16
TMO=3600 run python tools/profile_train.py --dtype both
TMO=2400 run python bench.py
echo "ALL DONE [$(date +%H:%M:%S)]" >> "$LOG"
