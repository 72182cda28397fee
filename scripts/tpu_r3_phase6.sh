#!/bin/bash
# Round-3 phase 6 (after the f32 wisdom regen):
#  1. per-session Mosaic shifted-slice bf16 lane-concat probe (the stem
#     ledger's reopen condition — docs/mfu_ceiling.md)
#  2. batch sweep at the uncaptured points between b32 and b64 (24..56):
#     the b64/b128 ledger is closed, but nobody has measured whether a
#     mid-point beats b32 (stem emitter improves with batch; the b64
#     pathologies are batch-specific emitter points that b40/b48 may dodge)
#  3. fresh flagship bench capture (defaults) to confirm the headline
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/tpu_r3p6}
mkdir -p "$LOG"
step() { echo "===== [$(date +%H:%M:%S)] $1 ====="; }
run() { name=$1; to=$2; shift 2
  step "$name"
  timeout "$to" "$@" >"$LOG/$name.log" 2>&1
  echo "rc=$?"
  tail -8 "$LOG/$name.log"
}

run probe_concat 600 python scripts/probe_mosaic_concat.py
run batch_sweep 1800 env SWEEP_BATCHES=24,32,40,48,56 \
  python scripts/exp_batch_sweep.py
run bench_fresh 1500 python bench.py
step "all done; logs in $LOG"
