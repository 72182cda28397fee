#!/bin/bash
# Round-3 phase 3 (after tpu_r3_phase2):
#  1. probe rerun UNBUFFERED (-u): the phase-2 run hit its 600s timeout with
#     zero output — block buffering hid whether the aligned case passed and
#     the shifted case hung Mosaic, or the whole process stalled.
#  2. pool_shift in-program A/B at b64 (the 4x-over-linear pool1 emitter
#     pathology from the b64 trace) and b32 (must be neutral at the default).
#  3. entry pad_c=16 A/B: phase-2 showed CP=128 is a massive loss (the pad
#     becomes 10.7x real conv FLOPs); CP=16 only lane-aligns the sublane
#     (K 192->256, which the MXU pads anyway) — does it cheapen XLA's copy?
#  4. conv wisdom regen rerun (VERDICT #4): phase-1 was killed at op 18/21
#     before the then-end-only write; ops_prof now writes incrementally.
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/tpu_r3p3}
mkdir -p "$LOG"
step() { echo "===== [$(date +%H:%M:%S)] $1 ====="; }
run() { name=$1; to=$2; shift 2
  step "$name"
  timeout "$to" "$@" >"$LOG/$name.log" 2>&1
  echo "rc=$?"
  tail -6 "$LOG/$name.log"
}

run probe_shifted_u 900 python -u scripts/probe_mosaic_concat.py
run pool_shift_b64 900 env IMG=64 python scripts/exp_pool_shift_ab.py
run pool_shift_b32 900 env IMG=32 python scripts/exp_pool_shift_ab.py
run entry_pad16 900 env CP=16 python scripts/exp_entry_pad_ab.py
run wis_regen_bf16 4200 python -m boda_tpu ops_prof \
  --ops-fn=testdata/ops/resnet50-ops-bf16-img32.txt \
  --op-tunes='(kg=(),halo=(use_halo=1),s2d=(use_s2d=1),lib=(use_xla=1))' \
  --method=ab --boda-output-dir="$LOG/wis_bf16" --wisdom-out-fn=r50_bf16_ab.wis
step "all done; logs in $LOG"
