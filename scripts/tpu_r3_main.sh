#!/bin/bash
# Round-3 main TPU session: remaining VERDICT r2 hardware measurements.
#  1. act_int8 final variants (res2trunk, res234) -> measured-null ledger
#  2. b64 per-op trace (VERDICT #6)
#  3. sgemm gen-vs-lib, method=ab, f32 + bf16 sweeps (VERDICT #3)
#  4. wisdom regen with method=ab on the r50 bf16 corpus (VERDICT #4)
# Logs to $LOG; each step bounded by timeout.
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/tpu_r3}
mkdir -p "$LOG"
step() { echo "===== [$(date +%H:%M:%S)] $1 ====="; }
run() { name=$1; to=$2; shift 2
  step "$name"
  timeout "$to" "$@" >"$LOG/$name.log" 2>&1
  echo "rc=$?"
  tail -6 "$LOG/$name.log"
}

run act_int8_res2trunk 1200 env SET=res2trunk python scripts/exp_act_int8_ab.py
run act_int8_res234 1200 env SET=res234 python scripts/exp_act_int8_ab.py

run trace_b64 1500 python -m boda_tpu net_trace --model=resnet50 \
  --img=64 --per-op=1 --top-k=40 --unmapped=10 --boda-output-dir="$LOG/trace64"

run sgemm_ab_f32 2400 python -m boda_tpu ops_prof \
  --ops-fn=testdata/ops/sgemm-ops-sweep-f32.txt \
  --op-tunes='(kg=(),lib=(use_xla=1))' --method=ab \
  --boda-output-dir="$LOG/sgemm_f32" --wisdom-out-fn=sgemm_f32.wis
run sgemm_ab_bf16 2400 python -m boda_tpu ops_prof \
  --ops-fn=testdata/ops/sgemm-ops-sweep-bf16.txt \
  --op-tunes='(kg=(),lib=(use_xla=1))' --method=ab \
  --boda-output-dir="$LOG/sgemm_bf16" --wisdom-out-fn=sgemm_bf16.wis

run wis_regen_bf16 5400 python -m boda_tpu ops_prof \
  --ops-fn=testdata/ops/resnet50-ops-bf16-img32.txt \
  --op-tunes='(kg=(),halo=(use_halo=1),s2d=(use_s2d=1),lib=(use_xla=1))' \
  --method=ab --boda-output-dir="$LOG/wis_bf16" --wisdom-out-fn=r50_bf16_ab.wis

step "all done; logs in $LOG"
