#!/bin/bash
# Round-4 session 2 (TPU): runs after the census (tpu_r4_census.sh).
#  1. toolchain_watch — the session-start re-probe discipline (VERDICT #5)
#  2. googlenet re-bench + re-trace with the fixed slash-name attribution
#     (conv_only previously ZeroDivisionError'd; trace rows were truncated)
#  3. firenet + ssd300 benches (BASELINE configs 3/5 rows of the census)
#  4. exp_trace_basis — collapse the conv-only MFU onto one basis (#3)
#  5. train_trace + train_bench captures for the train ledger (#2)
#  6. b64 pool_bview swing (#8): plain b64 vs pool1=(pool_bview=2)
#  7. serve_stages on the real TPU (#6)
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/tpu_r4_p2}
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

run toolchain_watch 1800 python scripts/toolchain_watch.py --log=docs/toolchain_watch.log

run bench_googlenet_fixed 2400 env BENCH_MODEL=googlenet_conv python bench.py
run trace_googlenet_fixed 1800 python -m boda_tpu net_trace --model=googlenet_conv \
  --img=32 --native=1 --per-op=1 --top-k=40 --unmapped=8 \
  --boda-output-dir="$LOG/trace_googlenet"

run bench_firenet 2400 env BENCH_MODEL=firenet python bench.py
run bench_ssd300 3600 env BENCH_MODEL=ssd300 BENCH_IMG=32 python bench.py

run exp_trace_basis 2400 python scripts/exp_trace_basis.py

# -- train ledger captures (the realistic momentum+train-BN config) --
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

# -- b64 pool_bview swing --
run bench_b64_plain 2400 env BENCH_MODEL=resnet50 BENCH_IMG=64 python bench.py
run bench_b64_bview 2400 env BENCH_MODEL=resnet50 BENCH_IMG=64 \
  BENCH_POT='(pool1=(pool_bview=2))' python bench.py

# -- serving stage isolation on the tunneled TPU --
run serve_stages_r50 1800 python -m boda_tpu serve_stages --model=resnet50 \
  --img=32 --n-batches=16 \
  '--img-fns=(a=testdata/images/test2.jpg)'

step "all done; logs in $LOG"
