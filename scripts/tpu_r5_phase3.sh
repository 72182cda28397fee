#!/bin/bash
# Round-5 session 3 (TPU): retries + follow-ups from phase 2.
#  1. sgemm block sweep (phase-2 run died on the import cycle, now fixed)
#  2. pool_pallas hardware probe (Mosaic-legal phase-split subsample)
#     on googlenet pools + b64 r50 pool1
#  3. ssd300 re-captures with the loop NMS default restored (the
#     fixpoint form measured 674 vs 1,009 img/s at b32)
#  4. vgg16 int8: keep the fc stack bf16 (per-op int8=0) — is the top-1
#     gate failure the int8 InnerProduct, and does the speed hold?
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/tpu_r5_p3}
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

run sgemm_blocks 2800 python scripts/exp_sgemm_blocks.py

run bench_googlenet 2400 env BENCH_MODEL=googlenet_conv BENCH_NATIVE=1 \
  python bench.py
run bench_googlenet_poolpallas 2400 env BENCH_MODEL=googlenet_conv \
  BENCH_NATIVE=1 BENCH_POT='(pool2/3x3_s2=(pool_pallas=1),pool1/3x3_s2=(pool_pallas=1))' \
  python bench.py
run bench_b64_poolpallas 2400 env BENCH_IMG=64 \
  BENCH_POT='(pool1=(pool_pallas=1))' BENCH_INT8_ROW=0 python bench.py

run bench_ssd300_b32 2400 env BENCH_MODEL=ssd300 python bench.py
run bench_ssd300_b4 1800 env BENCH_MODEL=ssd300 BENCH_IMG=4 python bench.py
run bench_ssd300_b8 1800 env BENCH_MODEL=ssd300 BENCH_IMG=8 python bench.py
run bench_ssd300_b32_int8 2400 env BENCH_MODEL=ssd300 BENCH_INT8=1 \
  BENCH_CALIB=testdata/calib/ssd300-bf16.calib.json python bench.py

# use_xla=1 keeps the fc stack on the library path (an explicit per-op
# tune otherwise implies the generated-kernel family)
run bench_vgg16_int8_fcbf16 2400 env BENCH_MODEL=vgg16 \
  BENCH_POT='(fc6=(int8=0,use_xla=1),fc7=(int8=0,use_xla=1),fc8=(int8=0,use_xla=1))' \
  python bench.py

step "all done; logs in $LOG"
