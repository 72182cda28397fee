#!/bin/bash
# Round-4 session 4 (TPU): int8 serving captures (after the s2d-stem fix)
# and the b64 pool escape. Runs after tpu_r4_phase3.sh drains.
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/tpu_r4_p4}
mkdir -p "$LOG"
step() { echo "===== [$(date +%H:%M:%S)] $1 ====="; }
run() { name=$1; to=$2; shift 2
  step "$name"
  timeout "$to" "$@" >"$LOG/$name.log" 2>&1
  rc=$?
  if [ "$rc" = 124 ]; then echo "rc=124 TIMEOUT — result INCONCLUSIVE (not a measured null)";
  else echo "rc=$rc"; fi
  tail -6 "$LOG/$name.log"
}

# int8 serving: dynamic scales, then static-calib scales (kills the
# per-forward amax reduces)
run bench_int8_dyn 2400 env BENCH_MODEL=resnet50 BENCH_INT8=1 python bench.py
run bench_int8_calib 2400 env BENCH_MODEL=resnet50 BENCH_INT8=1 \
  BENCH_CALIB=testdata/calib/resnet50-bf16.calib.json python bench.py

# int8 across the census corpus (serving-config rows)
run bench_int8_vgg16 2400 env BENCH_MODEL=vgg16 BENCH_INT8=1 python bench.py
run bench_int8_goog 2400 env BENCH_MODEL=googlenet_conv BENCH_INT8=1 python bench.py

# b64 pool_bview escape (the one remaining VERDICT r3 #8 row)
run pot_b64_pool_bview 2400 env IMG=64 POT='(pool1=(pool_bview=2))' \
  python scripts/exp_pot_ab.py

step "all done; logs in $LOG"
