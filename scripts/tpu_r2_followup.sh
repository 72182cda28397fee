#!/bin/bash
# Round-2 follow-up TPU session (runs AFTER tpu_r2_capture.sh):
#  - gen-policy strided-conv s2d A/B (can s2d lift gen whole-net?)
#  - per-shape ops_prof census refresh for docs/gen_vs_lib.md
#  - b128 batch-split chunk-count sweep (2 vs 4 vs 8)
# Usage: bash scripts/tpu_r2_followup.sh [stepname...]   (default: all)
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/tpu_r2fu}
mkdir -p "$LOG"

step() { echo "===== [$(date +%H:%M:%S)] $1 ====="; }
ARGS="$*"; _ARGS=$#

run() { # run <name> <timeout_s> <cmd...>
  local name=$1 to=$2; shift 2
  if [ $_ARGS -gt 0 ]; then
    local hit=0; for a in $ARGS; do [ "$a" = "$name" ] && hit=1; done
    [ $hit -eq 1 ] || return 0
  fi
  step "$name"
  timeout "$to" "$@" >"$LOG/$name.log" 2>&1
  local rc=$?
  tail -15 "$LOG/$name.log"
  echo "--- $name rc=$rc"
}

EB='(mode=pallas,compute_tn=bfloat16,precision=default'

# 1. gen policy: does s2d on strided convs lift the gen whole-net?
run ab_gen_s2d 2400 python -m boda_tpu net_ab --model=resnet50 --img=32 \
  --a="$EB,kernel_policy=gen)" \
  --b="$EB,kernel_policy=gen,tune=(use_s2d=1))"

# 2. gen policy: s2d + tap_cat identity? (tap_cat is f32-only; bf16 ignores)
run ab_gen_s2d_b64 2400 python -m boda_tpu net_ab --model=resnet50 --img=64 \
  --a="$EB,kernel_policy=gen)" \
  --b="$EB,kernel_policy=gen,tune=(use_s2d=1))"

# 3. b128 batch-split chunk sweep (in-program A/B each against no-split)
run ab_b128_k2 2400 python -m boda_tpu net_ab --model=resnet50 --img=128 \
  --a="$EB)" --b="$EB,batch_split=(r=pool1:res2c_relu:2))"
run ab_b128_k4 2400 python -m boda_tpu net_ab --model=resnet50 --img=128 \
  --a="$EB)" --b="$EB,batch_split=(r=pool1:res2c_relu:4))"
run ab_b128_k8 2400 python -m boda_tpu net_ab --model=resnet50 --img=128 \
  --a="$EB)" --b="$EB,batch_split=(r=pool1:res2c_relu:8))"

# 4. segmented remat: expect ~25-35% step cost (vs the 4.6x whole-net
#    'dots' pathology), with the activation-memory win
run train_bench_seg 1500 python -m boda_tpu train_bench --model=resnet50 \
  --img=32 --remat=seg

# 5. per-op trace with fusion-vote attribution + unmapped census: where do
#    the non-conv 35% actually go? (the r1 trace had 51% in '(other)')
run trace_unmapped 1200 python -m boda_tpu net_trace --model=resnet50 \
  --img=32 --per-op=1 --top-k=40 --unmapped=25 --boda-output-dir="$LOG"

# 6. localize the large-batch pathology: per-op trace at b64/b128 (batch
#    scaling REGRESSES vs b32 on honest timing — find the superlinear stage)
run trace_b64 1200 python -m boda_tpu net_trace --model=resnet50 \
  --img=64 --per-op=1 --top-k=40 --unmapped=15 --boda-output-dir="$LOG" \
  --trace-dir=trace64
run trace_b128 1200 python -m boda_tpu net_trace --model=resnet50 \
  --img=128 --per-op=1 --top-k=40 --unmapped=15 --boda-output-dir="$LOG" \
  --trace-dir=trace128

# 7. stem_s2d decisive median: 7 independent in-program A/B repeats
run stem_ab_median 3600 bash -c 'for i in 1 2 3 4 5 6 7; do \
  python scripts/exp_stem_ab.py 2>&1 | tail -2; done'

# 8. per-shape census refresh (kg / halo / tapcat / lib) -> gen_vs_lib.md
run census_bf16 3600 python -m boda_tpu ops_prof \
  --ops-fn=testdata/ops/resnet50-ops-bf16-img32.txt \
  --op-tunes='(kg=(),halo=(use_halo=1),s2d=(use_s2d=1),lib=(use_xla=1))' \
  --n-iters=10 --boda-output-dir="$LOG" --wisdom-out-fn=census_bf16.wis

step "all done; logs in $LOG"
