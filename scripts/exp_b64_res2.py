"""Localize the b64 res2 superlinearity (round-2 perf thread).

Background (see NOTES_ROUND3.md + session logs): whole-net decomposition at
b64 showed the res2 stage costing 2.35x worse than linear vs b32 while all
other stages scale ~linearly; standalone per-op timing scales fine, so the
regression is an in-net (fusion/layout) effect. If res2@b64 scaled linearly
the net would read ~150 TF/s (76% of v5e bf16 peak) vs the captured 128.8.

This script runs, in ONE process (compile warmup over the tunnel is
per-process expensive):
  1. fine-cut suffix decomposition at b32 and b64 over the res2 region
     (per-block cuts: pool1, res2a_relu, res2b_relu, res2c_relu, res3a ...)
  2. prints per-stage us and the b64/b32 ratio per stage (linear = 2.0)

Usage: python scripts/exp_b64_res2.py [chain] [n_iters]
"""
from __future__ import annotations

import sys

import numpy as np

from boda_tpu.config import make
from boda_tpu.models.zoo import build_model
from boda_tpu.ops.kernels.gen_data import gen_data_pattern
from boda_tpu.utils.dims import NDA

CUTS = [
    "data", "pool1",
    "res2a_relu", "res2b_relu", "res2c_relu",
    "res3a_relu", "res3d_relu",
    "res4f_relu", "res5c_relu",
]


def decomp(img: int, chain: int, n_iters: int, repeats: int = 3):
    pipe, in_dims = build_model("resnet50", img=img)
    eng = make("conv_fwd", "pallas", precision="default",
               compute_tn="bfloat16", kernel_policy="lib")
    eng.init(pipe)
    d = in_dims["data"]
    x = NDA(d, np.asarray(gen_data_pattern(d.shape, d.tn)))
    acts = eng.run_fwd({"data": x}, [c for c in CUTS if c != "data"])
    times = {}
    for cut in CUTS:
        ins = {"data": x} if cut == "data" else {cut: acts[cut]}
        times[cut] = min(
            eng.time_fwd(ins, ["prob"], n_iters=n_iters, chain=chain)
            for _ in range(repeats))
        print(f"  b{img} from {cut:14s} {times[cut]*1e6:10.1f} us",
              flush=True)
    return times


def main() -> int:
    chain = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_iters = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    print("== b32 fine decomposition ==", flush=True)
    t32 = decomp(32, chain, n_iters)
    print("== b64 fine decomposition ==", flush=True)
    t64 = decomp(64, chain, n_iters)
    print("== per-stage b64/b32 ratios (linear = 2.00) ==")
    full32, full64 = t32[CUTS[0]], t64[CUTS[0]]
    print(f"full net: b32 {full32*1e6:.1f} us  b64 {full64*1e6:.1f} us  "
          f"ratio {full64/full32:.2f}")
    for i in range(len(CUTS) - 1):
        a, b = CUTS[i], CUTS[i + 1]
        d32 = t32[a] - t32[b]
        d64 = t64[a] - t64[b]
        r = d64 / d32 if d32 > 1e-9 else float("nan")
        print(f"  stage {a:14s} -> {b:14s}: b32 {d32*1e6:8.1f} us  "
              f"b64 {d64*1e6:8.1f} us  ratio {r:5.2f}")
    tail32, tail64 = t32[CUTS[-1]], t64[CUTS[-1]]
    print(f"  tail after {CUTS[-1]}: b32 {tail32*1e6:.1f} us  "
          f"b64 {tail64*1e6:.1f} us  ratio {tail64/tail32:.2f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
