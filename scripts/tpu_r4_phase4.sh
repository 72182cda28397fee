#!/bin/bash
# Round-4 session 4 (TPU): int8 serving captures (after the s2d-stem fix),
# train-step component isolation, and the b64 pool escape. Ordered by
# value in case the session window closes early.
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

# session-start watch with the two new train-side probes (pool1_bwd,
# k1s2_dgrad) — validates them on hardware + logs the ledger baselines
run toolchain_watch 2400 python scripts/toolchain_watch.py --log=docs/toolchain_watch.log

# int8 serving: dynamic scales, then static-calib scales (kills the
# per-forward amax reduces)
run bench_int8_dyn 2400 env BENCH_MODEL=resnet50 BENCH_INT8=1 python bench.py
run bench_int8_calib 2400 env BENCH_MODEL=resnet50 BENCH_INT8=1 \
  BENCH_CALIB=testdata/calib/resnet50-bf16.calib.json python bench.py

# train-step component isolation (train_ceiling.md attempts): price
# train-mode BN and the momentum/clip update by ablation
run train_bench_r50_nobn 1800 python -m boda_tpu train_bench --model=resnet50 \
  --img=32 --momentum=0.9
run train_bench_r50_sgd 1800 python -m boda_tpu train_bench --model=resnet50 \
  --img=32 --bn-momentum=0.1

# b64 pool_bview escape (the one remaining VERDICT r3 #8 row)
run pot_b64_pool_bview 2400 env IMG=64 POT='(pool1=(pool_bview=2))' \
  python scripts/exp_pot_ab.py

# int8 across the census corpus (serving-config rows)
run bench_int8_vgg16 2400 env BENCH_MODEL=vgg16 BENCH_INT8=1 python bench.py
run bench_int8_goog 2400 env BENCH_MODEL=googlenet_conv BENCH_INT8=1 python bench.py

step "all done; logs in $LOG"
