#!/bin/bash
# Round-3 phase 2 (after tpu_r3_followup + wisdom regen):
#  1. shifted-slice bf16 concat probe (the pattern tap_cat actually needs)
#  2. b64 per-op trace at the BENCH config WITHOUT batch_split (the
#     apples-to-apples companion of trace64s; trace_b64 used defaults)
#  3. full bench captures: default and (if the entry-pad A/B won) BENCH_PAD_C
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/tpu_r3p2}
mkdir -p "$LOG"
step() { echo "===== [$(date +%H:%M:%S)] $1 ====="; }
run() { name=$1; to=$2; shift 2
  step "$name"
  timeout "$to" "$@" >"$LOG/$name.log" 2>&1
  echo "rc=$?"
  tail -6 "$LOG/$name.log"
}

run probe_shifted_concat 600 python scripts/probe_mosaic_concat.py
run trace_b64_benchcfg 1500 python -m boda_tpu net_trace --model=resnet50 \
  --img=64 --native=1 --per-op=1 --top-k=30 --unmapped=5 \
  --boda-output-dir="$LOG/trace64n" \
  --conv-fwd='(mode=pallas,compute_tn=bfloat16,precision=default,input_s2d=1)'
run bench_default 1200 python bench.py
run bench_padc128 1200 env BENCH_PAD_C=128 python bench.py
step "all done; logs in $LOG"
