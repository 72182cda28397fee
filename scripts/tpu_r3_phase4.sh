#!/bin/bash
# Round-3 phase 4 (after tpu_r3_phase3):
#  1. pool_shift retry with the no-f32-cast max form (first form measured
#     0.83x b64 / 0.92x b32 — the cast materialized a padded f32 input copy)
#  2. b128 trace with the bench engine config (the repetition-discipline row
#     mfu_ceiling still owes) + b128 bench capture
#  3. res2c_branch2a b64 anomaly: batch_split region sweep around res2c only
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/tpu_r3p4}
mkdir -p "$LOG"
step() { echo "===== [$(date +%H:%M:%S)] $1 ====="; }
run() { name=$1; to=$2; shift 2
  step "$name"
  timeout "$to" "$@" >"$LOG/$name.log" 2>&1
  echo "rc=$?"
  tail -6 "$LOG/$name.log"
}

run pool_nocast_b64 900 env IMG=64 python scripts/exp_pool_shift_ab.py
run pool_nocast_b32 900 env IMG=32 python scripts/exp_pool_shift_ab.py
run trace_b128 1800 python -m boda_tpu net_trace --model=resnet50 \
  --img=128 --native=1 --per-op=1 --top-k=25 \
  --boda-output-dir="$LOG/tr128" \
  --conv-fwd='(mode=pallas,compute_tn=bfloat16,precision=default,input_s2d=1)'
run bench_b128 1500 env BENCH_IMG=128 BENCH_CONV_MFU=0 python bench.py
run bench_b64_split_res2c 1500 env BENCH_IMG=64 BENCH_CONV_MFU=0 \
  BENCH_BSPLIT=res2b_relu:res2c_relu:2 python bench.py
run pot_res2c_gen_b64 900 env IMG=64 POT='(res2c_branch2a=(use_xla=0))' \
  python scripts/exp_pot_ab.py
step "all done; logs in $LOG"
