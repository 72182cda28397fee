#!/bin/bash
# Round-3 follow-up TPU session (runs after tpu_r3_main.sh):
#  1. Mosaic bf16 minor-dim concat probe (VERDICT #7; re-run each toolchain)
#  2. f32 stem in-program A/B (VERDICT #7)
#  3. act_int8 remaining variants (res2, trunk23) -> complete the null table
#  4. b64 per-op trace WITH batch_split (does the split fix the pathology?)
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/tpu_r3f}
mkdir -p "$LOG"
step() { echo "===== [$(date +%H:%M:%S)] $1 ====="; }
run() { name=$1; to=$2; shift 2
  step "$name"
  timeout "$to" "$@" >"$LOG/$name.log" 2>&1
  echo "rc=$?"
  tail -6 "$LOG/$name.log"
}

run mosaic_concat_probe 600 python scripts/probe_mosaic_concat.py
run stem_f32_ab 1800 python scripts/exp_stem_f32_ab.py
run act_int8_res2 1200 env SET=res2 python scripts/exp_act_int8_ab.py
run act_int8_trunk23 1200 env SET=trunk23 python scripts/exp_act_int8_ab.py
run entry_pad_cp128 1800 env CP=128 python scripts/exp_entry_pad_ab.py
run entry_pad_cp16 1800 env CP=16 python scripts/exp_entry_pad_ab.py
run trace_b64_split 1500 python -m boda_tpu net_trace --model=resnet50 \
  --img=64 --per-op=1 --top-k=30 --unmapped=5 --boda-output-dir="$LOG/trace64s" \
  --conv_fwd='(mode=pallas,compute_tn=bfloat16,precision=default,kernel_policy=lib,input_s2d=1,batch_split=(a=pool1:res2c_relu:2))'

step "all done; logs in $LOG"
