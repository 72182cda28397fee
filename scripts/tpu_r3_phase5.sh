#!/bin/bash
# Round-3 phase 5: run the staged phase-4 experiments, then finish the
# wisdom regens (VERDICT #4) that the previous session's crash cut short:
#  1. phase-4 items (pool_shift no-cast retry, b128 trace+bench, res2c
#     b64 split sweep, res2c per-op gen tune A/B)
#  2. r50 bf16 conv wisdom regen with method=ab (died at ~10/21 ops)
#  3. r50 f32 (img8 corpus) wisdom regen with method=ab
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/tpu_r3p5}
mkdir -p "$LOG"
step() { echo "===== [$(date +%H:%M:%S)] $1 ====="; }
run() { name=$1; to=$2; shift 2
  step "$name"
  timeout "$to" "$@" >"$LOG/$name.log" 2>&1
  echo "rc=$?"
  tail -6 "$LOG/$name.log"
}

bash scripts/tpu_r3_phase4.sh

run wis_regen_bf16 4800 python -m boda_tpu ops_prof \
  --ops-fn=testdata/ops/resnet50-ops-bf16-img32.txt \
  --op-tunes='(kg=(),halo=(use_halo=1),s2d=(use_s2d=1),lib=(use_xla=1))' \
  --method=ab --boda-output-dir="$LOG/wis_bf16" --wisdom-out-fn=r50_bf16_ab.wis

run wis_regen_f32 4800 python -m boda_tpu ops_prof \
  --ops-fn=testdata/ops/resnet50-ops-img8.txt \
  --op-tunes='(kg=(),halo=(use_halo=1),s2d=(use_s2d=1),lib=(use_xla=1))' \
  --method=ab --boda-output-dir="$LOG/wis_f32" --wisdom-out-fn=r50_f32_ab.wis

step "all done; logs in $LOG"
