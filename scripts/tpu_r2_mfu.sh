#!/bin/bash
# Round-2 MFU-focused TPU session: settle the flagship-bench default stack.
#  - native NHWC input vs logical NCHW (in-program A/B, 3 repeats)
#  - batch sweep b16..b48 (single process)
#  - stem_s2d decisive median (5 in-program A/B repeats)
# Usage: bash scripts/tpu_r2_mfu.sh [stepname...]   (default: all)
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/tpu_r2mfu}
mkdir -p "$LOG"

step() { echo "===== [$(date +%H:%M:%S)] $1 ====="; }
ARGS="$*"; _ARGS=$#

run() { # run <name> <timeout_s> <cmd...>
  local name=$1 to=$2; shift 2
  if [ $_ARGS -gt 0 ]; then
    local hit=0; for a in $ARGS; do [ "$a" = "$name" ] && hit=1; done
    [ $hit -eq 1 ] || return 0
  fi
  step "$name"
  timeout "$to" "$@" >"$LOG/$name.log" 2>&1
  local rc=$?
  tail -15 "$LOG/$name.log"
  echo "--- $name rc=$rc"
}

run native_ab 2400 bash -c 'for i in 1 2 3; do \
  python scripts/exp_native_ab.py 2>&1 | tail -2; done'

run batch_sweep 2400 python scripts/exp_batch_sweep.py

run stem_ab_median 3600 bash -c 'for i in 1 2 3 4 5; do \
  SWEEP_ONLY=resnet50 python scripts/exp_stem_ab.py 2>&1 | tail -2; done'

step "all done; logs in $LOG"
