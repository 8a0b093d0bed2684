#!/bin/sh
# Operating-point frontier sweep (VERDICT r2 next-round item 1): bench a
# ladder of solver profiles with the schulz linear solver on the real chip,
# recording throughput + warm exit_ok + residual diagnostics for each.
# Profiles: "inner,outer,later,substeps,penalty".
set -u
LOG=${1:-/root/repo/docs/bench_sweep_r3.log}
: > "$LOG"
for prof in \
    "3,2,2,2,1250" \
    "4,2,3,2,1250" \
    "3,3,2,2,1250" \
    "4,3,3,2,1250" \
    "2,2,2,3,1250" \
    "6,3,3,1,1250" \
    "30,10,10,1,10" \
; do
  echo "=== BENCH_CUSTOM=$prof ===" >> "$LOG"
  BENCH_CUSTOM="$prof" BENCH_DIAG=1 timeout 1800 \
    python /root/repo/bench.py >> "$LOG" 2>&1
  echo "rc=$?" >> "$LOG"
done
echo "SWEEP DONE" >> "$LOG"
