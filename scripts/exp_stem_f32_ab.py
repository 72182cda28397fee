"""In-program A/B: f32 stem (conv1+pool1) vs the production bf16 stem.

VERDICT r2 item 7: conv1 sits at 2x its padded-MXU floor in bf16 and every
bf16 stem redesign measured null (docs/mfu_ceiling.md). Hypothesis worth
one measurement: if conv1 is layout/memory-bound rather than MXU-bound,
computing the stem in f32 (2x byte width, but a different XLA kernel
family) might beat the 2x-off-floor bf16 conv. Both variants run as the
two branches of ONE executable (prof/abtime.ab_compare), each consuming
its own pre-prepared device input; weights ride a merged dict so both
sides stay jit parameters.

Usage (TPU host): python scripts/exp_stem_f32_ab.py   [IMG=32]
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    img = int(os.environ.get("IMG", "32"))
    import jax
    import ml_dtypes

    from boda_tpu.config import make
    from boda_tpu.models.zoo import build_model
    from boda_tpu.ops.kernels.gen_data import gen_data_pattern
    from boda_tpu.prof.abtime import ab_compare

    pipe, in_dims = build_model("resnet50", img=img)

    def engine(**kw):
        eng = make("conv_fwd", "pallas", precision="default",
                   kernel_policy="lib", input_s2d=True, **kw)
        eng.init(pipe)
        return eng

    eng_f32 = engine()  # compute dtype = net dtype (f32)
    eng_bf16 = engine(compute_tn="bfloat16")

    d = in_dims["data"]
    x = np.asarray(gen_data_pattern(d.shape, d.tn))
    xh = np.ascontiguousarray(x.transpose(0, 2, 3, 1))
    dev = eng_f32.device()
    xins = {
        "a_data": jax.device_put(
            eng_f32.host_input_s2d("data", xh.astype(np.float32)), dev),
        "b_data": jax.device_put(
            eng_bf16.host_input_s2d("data", xh.astype(ml_dtypes.bfloat16)),
            dev),
    }
    weights = {}
    for k, v in eng_f32._weights_dev.items():
        weights["a::" + k] = v
    for k, v in eng_bf16._weights_dev.items():
        weights["b::" + k] = v

    raw_a = eng_f32.build_raw_fn(["pool1"])
    raw_b = eng_bf16.build_raw_fn(["pool1"])

    def wrap(raw, pre):
        def fn(w, xi):
            sub = {k[len(pre):]: v for k, v in w.items() if k.startswith(pre)}
            return raw(sub, {"data": xi[pre[0] + "_data"]})
        return fn

    wa, wb = wrap(raw_a, "a::"), wrap(raw_b, "b::")
    pa = np.asarray(jax.jit(wa)(weights, xins)["pool1"], np.float32)
    pb = np.asarray(jax.jit(wb)(weights, xins)["pool1"], np.float32)
    scale = max(1e-30, float(np.abs(pa).max()))
    err = float(np.abs(pa - pb).max()) / scale
    print(f"stem rel err f32-vs-bf16 {err:.4f}", file=sys.stderr)

    ta, tb = ab_compare(wa, wb, weights, xins, n_legs=8)
    print(json.dumps({
        "exp": "stem_f32_ab", "img": img, "rel_err": round(err, 5),
        "f32_stem_us": round(ta * 1e6, 1), "bf16_stem_us": round(tb * 1e6, 1),
        "f32_over_bf16": round(tb / ta, 4)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
