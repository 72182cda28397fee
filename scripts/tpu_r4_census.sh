#!/bin/bash
# Round-4 session 1: multi-model perf census (VERDICT r3 next-item #1).
# For each of googlenet_conv / vgg16 / resnet152 at b32 bf16 (the flagship
# bench configuration): bench capture (incl. live conv-only MFU), in-net
# per-op device trace, and (for the two models whose op corpora are not
# already covered) an ops_prof --method=ab wisdom sweep over the
# kg/halo/s2d/lib tune axes. resnet152's unique-sig corpus is byte-identical
# to resnet50's (verified: diff of sorted corpora), so the committed r50
# m=ab wisdom already covers it — no separate sweep.
# A fresh resnet50 flagship capture leads the session so every number in the
# census shares one toolchain/session.
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/tpu_r4_census}
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

# -- benches (each also emits conv_only MFU from the in-net trace) --
run bench_resnet50 2400 python bench.py
run bench_googlenet 2400 env BENCH_MODEL=googlenet_conv python bench.py
run bench_vgg16 2400 env BENCH_MODEL=vgg16 python bench.py
run bench_resnet152 3600 env BENCH_MODEL=resnet152 python bench.py

# -- per-op traces at the bench engine config --
run trace_googlenet 1800 python -m boda_tpu net_trace --model=googlenet_conv \
  --img=32 --native=1 --per-op=1 --top-k=40 --unmapped=8 \
  --boda-output-dir="$LOG/trace_googlenet"
run trace_vgg16 1800 python -m boda_tpu net_trace --model=vgg16 \
  --img=32 --native=1 --per-op=1 --top-k=40 --unmapped=8 \
  --boda-output-dir="$LOG/trace_vgg16"
run trace_resnet152 3600 python -m boda_tpu net_trace --model=resnet152 \
  --img=32 --native=1 --per-op=1 --top-k=40 --unmapped=8 \
  --conv-fwd='(mode=pallas,compute_tn=bfloat16,precision=default,input_s2d=1)' \
  --boda-output-dir="$LOG/trace_resnet152"

# -- m=ab wisdom sweeps (vgg16 first: smaller corpus, highest shape value —
#    224/112px large-spatial 3x3s are where the XLA emitter is least proven) --
run wis_vgg16 7200 python -m boda_tpu ops_prof \
  --ops-fn=testdata/ops/vgg16-ops-bf16-img32.txt \
  --op-tunes='(kg=(),halo=(use_halo=1),s2d=(use_s2d=1),lib=(use_xla=1))' \
  --method=ab --boda-output-dir="$LOG/wis_vgg16" --wisdom-out-fn=vgg16_ab.wis
run wis_googlenet 10800 python -m boda_tpu ops_prof \
  --ops-fn=testdata/ops/googlenet_conv-ops-bf16-img32.txt \
  --op-tunes='(kg=(),halo=(use_halo=1),s2d=(use_s2d=1),lib=(use_xla=1))' \
  --method=ab --boda-output-dir="$LOG/wis_googlenet" \
  --wisdom-out-fn=googlenet_ab.wis

step "all done; logs in $LOG"
