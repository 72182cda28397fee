#!/bin/bash
# Round-4 session 3 (TPU): acts on the 2026-08-20 toolchain_watch flips and
# finishes the round-4 ledger captures.
#  1. probe_mosaic_concat + fixed toolchain_watch (shifted-slice form) —
#     decides whether the in-kernel-kx stem tap_cat actually re-opens
#  2. exp_int8_shapes — int8-vs-bf16 at r50 hot shapes (watch flip: 1.87x
#     at 2048^3); if it holds at net shapes, int8 serving is a live lever
#  3. whole-net int8 bench (dynamic quant) + accuracy probe
#  4. stem_im2col in-program A/B (VERDICT r3 #3 — the one untried conv1
#     formulation; +4.9pp conv-MFU if it reaches the stem floor)
#  5. b64/b128 plain re-bench (watch: pool1/res2c pathologies collapsed)
#  6. googlenet re-bench (LRN fast-power fix landed after the census row)
#     + pool2 pool_bview/pool_shift escapes
#  7. ssd300 re-bench (class-vectorized NMS landed after the census row)
#  8. train_trace + train_bench captures for docs/train_ceiling.md
#  9. serve_stages on the tunneled TPU
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/tpu_r4_p3}
mkdir -p "$LOG"
step() { echo "===== [$(date +%H:%M:%S)] $1 ====="; }
run() { name=$1; to=$2; shift 2
  step "$name"
  timeout "$to" "$@" >"$LOG/$name.log" 2>&1
  rc=$?
  if [ "$rc" = 124 ]; then echo "rc=124 TIMEOUT — result INCONCLUSIVE (not a measured null)";
  else echo "rc=$rc"; fi
  tail -8 "$LOG/$name.log"
}

# -- 1. the real stem-blocker probe --
run probe_concat_full 1800 python scripts/probe_mosaic_concat.py
run toolchain_watch 1800 python scripts/toolchain_watch.py --log=docs/toolchain_watch.log

# -- 2/3. int8 --
run int8_shapes 2400 python scripts/exp_int8_shapes.py
run bench_int8 2400 env BENCH_MODEL=resnet50 BENCH_INT8=1 python bench.py
run bench_bf16_same_session 2400 env BENCH_MODEL=resnet50 python bench.py

# -- 4. stem_im2col (in-program A/B, tunnel jitter cancels) --
run pot_stem_im2col 2400 env POT='(conv1=(stem_im2col=1))' python scripts/exp_pot_ab.py

# -- 5. batch scaling re-probe --
run bench_b64_plain 2400 env BENCH_MODEL=resnet50 BENCH_IMG=64 python bench.py
run bench_b128_plain 2400 env BENCH_MODEL=resnet50 BENCH_IMG=128 python bench.py

# -- 6. googlenet post-LRN-fix --
run bench_googlenet 2400 env BENCH_MODEL=googlenet_conv python bench.py
run pot_goog_pool2_bview 2400 env MODEL=googlenet_conv POT='(pool2/3x3_s2=(pool_bview=2))' \
  python scripts/exp_pot_ab.py
run pot_goog_pool2_shift 2400 env MODEL=googlenet_conv POT='(pool2/3x3_s2=(pool_shift=1))' \
  python scripts/exp_pot_ab.py

# -- 7. ssd300 post-NMS-vectorize --
run bench_ssd300 3600 env BENCH_MODEL=ssd300 BENCH_IMG=32 python bench.py

# -- 8. train ledger captures --
run train_trace_r50 2400 python -m boda_tpu train_trace --model=resnet50 \
  --img=32 --n-iters=4 --top-k=30 --unmapped=8 \
  --boda-output-dir="$LOG/train_trace_r50"
run train_trace_r50_seg 2400 python -m boda_tpu train_trace --model=resnet50 \
  --img=32 --n-iters=4 --remat=seg --top-k=30 \
  --boda-output-dir="$LOG/train_trace_r50_seg"
run train_bench_r50 1800 python -m boda_tpu train_bench --model=resnet50 \
  --img=32 --momentum=0.9 --bn-momentum=0.1
run train_bench_r50_seg 1800 python -m boda_tpu train_bench --model=resnet50 \
  --img=32 --momentum=0.9 --bn-momentum=0.1 --remat=seg
run train_bench_r50_b64 1800 python -m boda_tpu train_bench --model=resnet50 \
  --img=64 --momentum=0.9 --bn-momentum=0.1

# -- 9. serving stage isolation --
run serve_stages_r50 1800 python -m boda_tpu serve_stages --model=resnet50 \
  --img=32 --n-batches=16 \
  '--img-fns=(a=testdata/images/test2.jpg)'

step "all done; logs in $LOG"
