#!/bin/bash
# Round-4 session 5 (TPU): the combined int8 activation-flow serving
# capture (act_int8 signed storage -> direct int8-conv feed) and the
# fixed train-side watch probes.
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/tpu_r4_p5}
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

# combined int8 flow: storage on every conv-fed activation edge
run bench_int8_flow 2400 env BENCH_MODEL=resnet50 BENCH_INT8=1 \
  BENCH_CALIB=testdata/calib/resnet50-bf16.calib.json \
  BENCH_ACTQ='pool1,res*_branch2a_relu,res*_branch2b_relu,res*_relu' \
  python bench.py

# storage only on single-conv-consumer edges (res*_relu also feeds the
# residual adds, which pay a dequant each -- this variant isolates that)
run bench_int8_flow_narrow 2400 env BENCH_MODEL=resnet50 BENCH_INT8=1 \
  BENCH_CALIB=testdata/calib/resnet50-bf16.calib.json \
  BENCH_ACTQ='pool1,res*_branch2a_relu,res*_branch2b_relu' \
  python bench.py

# fixed train-side probes (pool1_bwd -inf init, k1s2_dgrad dtype fix)
run toolchain_watch 2400 python scripts/toolchain_watch.py --log=docs/toolchain_watch.log

step "all done; logs in $LOG"
