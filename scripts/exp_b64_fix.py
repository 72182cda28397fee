"""Validate batch-split candidates for the r50 b64 res2 regression (TPU).

One process (compile warmup amortized): A/B each candidate engine config
against the b64 baseline with the jitter-immune in-program harness, then
absolute-time the winner bench-style (best-of-3 chained) at b32 and b64.

Run AFTER scripts/exp_b64_res2.py confirms the res2 superlinearity still
reproduces. Usage: python scripts/exp_b64_fix.py [img]
"""
from __future__ import annotations

import sys

import numpy as np

from boda_tpu.config import make
from boda_tpu.models.zoo import build_model
from boda_tpu.ops.kernels.gen_data import gen_data_pattern
from boda_tpu.prof.abtime import ab_compare
from boda_tpu.utils.dims import NDA

CANDS = {
    "split_res2x2": ["pool1:res2c_relu:2"],
    "split_res2x4": ["pool1:res2c_relu:4"],
    "split_res23x2": ["pool1:res2c_relu:2", "res2c_relu:res3d_relu:2"],
    "split_allx2": ["data:pool5:2"],
}


def main() -> int:
    img = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    import jax
    pipe, in_dims = build_model("resnet50", img=img)
    d = in_dims["data"]
    x = NDA(d, np.asarray(gen_data_pattern(d.shape, d.tn)))

    def prep(bsplit):
        eng = make("conv_fwd", "pallas", precision="default",
                   compute_tn="bfloat16", kernel_policy="lib",
                   **({"batch_split": bsplit} if bsplit else {}))
        eng.init(pipe)
        raw = eng.build_raw_fn(["prob"])
        return eng, raw, dict(eng._weights_dev)

    eng0, raw0, w0 = prep(None)
    ins = {"data": jax.device_put(x.data, eng0.device())}
    results = {}
    for name, bsplit in CANDS.items():
        _, raw_c, w_c = prep(bsplit)
        tc, tb = ab_compare(lambda w, i: raw_c(w["a"], i),
                            lambda w, i: raw0(w["b"], i),
                            {"a": w_c, "b": w0}, ins, n_legs=6)
        results[name] = (tc, tb)
        print(f"cand {name}: {tc*1e6:.1f} us vs base {tb*1e6:.1f} us "
              f"-> speedup {tb/tc:.3f}x", flush=True)
    best = min(results, key=lambda k: results[k][0] / results[k][1])
    tc, tb = results[best]
    print(f"best: {best} ({tb/tc:.3f}x)")
    # absolute bench-style numbers for winner vs base
    fl = pipe.total_flops()
    for tag, bsplit in [("base", None), (best, CANDS[best])]:
        eng, _, _ = prep(bsplit)
        secs = min(eng.time_fwd({"data": x}, ["prob"], n_iters=24, chain=8)
                   for _ in range(3))
        print(f"abs {tag} b{img}: {img/secs:.1f} img/s "
              f"{fl/secs/1e12:.1f} TF/s ({fl/secs/1.97e14*100:.1f}% peak)",
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
