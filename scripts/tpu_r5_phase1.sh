#!/bin/bash
# Round-5 session 1 (TPU): the three explicit training-side VJPs
# (graph/train_ops.py) vs the stock autodiff emitters — per-op A/B,
# full-step train_bench stock-vs-custom, per-op trace, plus the
# session-start toolchain watch (VERDICT r4 #1/#3).
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/tpu_r5_p1}
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

# session-start watch (VERDICT r4 #3: the fixed pool1_bwd/k1s2_dgrad
# probes have never produced a hardware verdict)
run toolchain_watch 2400 python scripts/toolchain_watch.py \
  --log=docs/toolchain_watch.log

# per-op in-program A/B of the three explicit VJPs
run train_vjp_ab 2400 python scripts/exp_train_vjp_ab.py

# full-step: stock emitters (reproduces the 2,726 img/s r4 headline on
# this toolchain) vs the explicit VJPs
run train_bench_stock 1800 env BODA_TRAIN_VJP=0 python -m boda_tpu \
  train_bench --model=resnet50 --img=32 --momentum=0.9 --bn-momentum=0.1
run train_bench_vjp 1800 python -m boda_tpu train_bench \
  --model=resnet50 --img=32 --momentum=0.9 --bn-momentum=0.1
run train_bench_vjp_b64 1800 python -m boda_tpu train_bench \
  --model=resnet50 --img=64 --momentum=0.9 --bn-momentum=0.1
run train_bench_vjp_seg 1800 python -m boda_tpu train_bench \
  --model=resnet50 --img=32 --momentum=0.9 --bn-momentum=0.1 --remat=seg

# per-op attribution of the new step (ledger update for train_ceiling.md)
run train_trace_vjp 2400 python -m boda_tpu train_trace --model=resnet50 \
  --img=32 --n-iters=4 --top-k=30 --unmapped=8 \
  --boda-output-dir="$LOG/train_trace_vjp"

step "all done; logs in $LOG"
