"""In-program A/B: host-padded lane-aligned entry layout vs XLA's entry copy.

VERDICT r2 item 2b: the per-op trace charges ~108us/fwd to inputs['data']
— an XLA entry-layout pad copy of the (N,115,115,12) s2d-folded input.
The pad is not physics: the loader already rewrites the batch host-side
(host_input_s2d), so it can emit the channel dim pre-padded to the lane
count the conv wants (engine input_pad_c: zero lanes, stem weights padded
to match at upload — results bit-identical). Both variants run in ONE
executable (prof/abtime.ab_compare); each side consumes its own
pre-prepared device input and its own engine's weights via a merged dict.

Usage (TPU host): CP=128 python scripts/exp_entry_pad_ab.py   [IMG=32]
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    img = int(os.environ.get("IMG", "32"))
    cp = int(os.environ.get("CP", "128"))
    import jax
    import ml_dtypes

    from boda_tpu.config import make
    from boda_tpu.models.zoo import build_model
    from boda_tpu.ops.kernels.gen_data import gen_data_pattern
    from boda_tpu.prof.abtime import ab_compare

    pipe, in_dims = build_model("resnet50", img=img)

    def engine(**kw):
        eng = make("conv_fwd", "pallas", compute_tn="bfloat16",
                   precision="default", kernel_policy="lib",
                   input_s2d=True, **kw)
        eng.init(pipe)
        return eng

    base = engine()
    padded = engine(input_pad_c=cp)

    d = in_dims["data"]
    x = np.asarray(gen_data_pattern(d.shape, d.tn))
    xh = np.ascontiguousarray(x.transpose(0, 2, 3, 1)).astype(
        ml_dtypes.bfloat16)
    dev = base.device()
    xins = {"a_data": jax.device_put(base.host_input_s2d("data", xh), dev),
            "b_data": jax.device_put(padded.host_input_s2d("data", xh), dev)}
    weights = {}
    for k, v in base._weights_dev.items():
        weights["a::" + k] = v
    for k, v in padded._weights_dev.items():
        weights["b::" + k] = v

    raw_a = base.build_raw_fn(["prob"])
    raw_b = padded.build_raw_fn(["prob"])

    def wrap(raw, pre):
        def fn(w, xi):
            sub = {k[len(pre):]: v for k, v in w.items() if k.startswith(pre)}
            return raw(sub, {"data": xi[pre[0] + "_data"]})
        return fn

    wa, wb = wrap(raw_a, "a::"), wrap(raw_b, "b::")
    pa = np.asarray(jax.jit(wa)(weights, xins)["prob"], np.float32)
    pb = np.asarray(jax.jit(wb)(weights, xins)["prob"], np.float32)
    agree = float((pa.argmax(1) == pb.argmax(1)).mean())
    perr = float(np.abs(pa - pb).max())
    print(f"CP={cp}: top1 agreement {agree:.3f}, prob err {perr:.5f}",
          file=sys.stderr)

    ta, tb = ab_compare(wa, wb, weights, xins, n_legs=8)
    fl = pipe.total_flops()
    print(json.dumps({
        "exp": "entry_pad_ab", "img": img, "cp": cp,
        "top1_agree": round(agree, 4), "prob_err": round(perr, 5),
        "base_us": round(ta * 1e6, 1), "padded_us": round(tb * 1e6, 1),
        "speedup": round(ta / tb, 4),
        "base_tfs": round(fl / ta / 1e12, 1),
        "padded_tfs": round(fl / tb / 1e12, 1)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
