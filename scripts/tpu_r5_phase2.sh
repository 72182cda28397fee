#!/bin/bash
# Round-5 session 2 (TPU): serving captures + generator swing.
#  1. flagship dual-row bench (bf16 + int8-static; VERDICT r4 #2) and the
#     combined act-int8 flow variant — decides the committed default
#  2. b64 flagship re-capture (b64 pool/res2c emitter pathologies FLIPPED
#     to fixed in toolchain_watch r5 phase 1)
#  3. sgemm generator block sweep (VERDICT #7)
#  4. pool_pallas kernel: Mosaic compile check + googlenet pool2 A/B
#     (VERDICT #5) + googlenet census re-capture
#  5. net_calib sidecars for vgg16 + ssd300; vgg16 dual-row capture;
#     ssd300 int8 capture + latency-shaped small batches (VERDICT #8)
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/tpu_r5_p2}
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

# 1. flagship dual-row (bf16 + int8-static rows, accuracy-gated)
run bench_flagship 2400 python bench.py
# combined act-int8 storage flow variant (commit 3c44e44's config —
# never captured whole-net; decides BENCH_INT8_ACTQ's committed default)
run bench_flagship_actq 2400 env \
  BENCH_INT8_ACTQ='pool1,res*_branch2a_relu,res*_branch2b_relu,res*_relu' \
  python bench.py

# 2. b64 flagship (pool/res2c emitter pathologies flipped to fixed)
run bench_b64 2400 env BENCH_IMG=64 python bench.py

# 3. sgemm generator block sweep
run sgemm_blocks 2400 python scripts/exp_sgemm_blocks.py

# 4. pool_pallas on hardware: compile check via the engine-level tune,
#    then the googlenet whole-net A/B and census re-capture
run bench_googlenet 2400 env BENCH_MODEL=googlenet_conv BENCH_NATIVE=1 \
  python bench.py
run bench_googlenet_poolpallas 2400 env BENCH_MODEL=googlenet_conv \
  BENCH_NATIVE=1 BENCH_POT='(pool2/3x3_s2=(pool_pallas=1),pool1/3x3_s2=(pool_pallas=1))' \
  python bench.py
run bench_b64_poolpallas 2400 env BENCH_IMG=64 \
  BENCH_POT='(pool1=(pool_pallas=1))' BENCH_INT8_ROW=0 python bench.py

# 5. calibration sidecars + captures for vgg16 and ssd300
run calib_vgg16 2400 python -m boda_tpu net_calib --model=vgg16 --img=8 \
  --batches=8 --out-fn=vgg16-bf16.calib.json \
  --boda-output-dir=testdata/calib
run calib_ssd300 2400 python -m boda_tpu net_calib --model=ssd300 --img=4 \
  --batches=8 --out-node=detection_out \
  --out-fn=ssd300-bf16.calib.json --boda-output-dir=testdata/calib
run bench_vgg16 2400 env BENCH_MODEL=vgg16 python bench.py
run bench_ssd300_b32 2400 env BENCH_MODEL=ssd300 python bench.py
run bench_ssd300_b32_int8 2400 env BENCH_MODEL=ssd300 BENCH_INT8=1 \
  BENCH_CALIB=testdata/calib/ssd300-bf16.calib.json python bench.py
# latency-shaped small batches (serving shape; VERDICT #8)
run bench_ssd300_b4 1800 env BENCH_MODEL=ssd300 BENCH_IMG=4 python bench.py
run bench_ssd300_b8 1800 env BENCH_MODEL=ssd300 BENCH_IMG=8 python bench.py

step "all done; logs in $LOG"
