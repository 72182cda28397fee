"""Whole-net A/B: native NHWC bf16 input vs logical NCHW f32 input.

Measures what the per-forward input transpose+convert actually costs in-net
(resnet50 bf16 b32, lib policy) with the in-program A/B harness
(prof/abtime.py): ONE raw fn, two input layouts — leg A feeds the logical
NCHW f32 batch (engine transposes+converts inside the jit), leg B feeds the
loader-native NHWC bf16 batch (engine ingests it directly). Both layouts
ride in the shared input dict; each side consumes only its own key.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def ab_model(model, img=32):
    import jax
    import ml_dtypes
    import numpy as np

    from boda_tpu.config import make
    from boda_tpu.models.zoo import build_model
    from boda_tpu.ops.kernels.gen_data import gen_data_pattern
    from boda_tpu.prof.abtime import ab_compare

    pipe, in_dims = build_model(model, img=img)
    eng = make("conv_fwd", "pallas", precision="default",
               compute_tn="bfloat16", kernel_policy="lib")
    eng.init(pipe)
    raw = eng.build_raw_fn(["prob"])
    w = dict(eng._weights_dev)
    d = in_dims["data"]
    x = np.asarray(gen_data_pattern(d.shape, d.tn))
    xn = np.ascontiguousarray(
        x.astype(ml_dtypes.bfloat16).transpose(0, 2, 3, 1))
    dev = eng.device()
    ins = {"nchw": jax.device_put(x, dev), "nhwc": jax.device_put(xn, dev)}
    ta, tb = ab_compare(lambda wt, i: raw(wt, {"data": i["nchw"]}),
                        lambda wt, i: raw(wt, {"data": i["nhwc"]}),
                        w, ins, n_legs=8)
    log(f"{model} b{img}: logical {img/ta:.1f} img/s  native {img/tb:.1f} "
        f"img/s  native speedup {ta/tb:.3f}x")
    return {"model": model, "img": img, "logical_img_s": img / ta,
            "native_img_s": img / tb, "speedup": ta / tb}


def main():
    res = [ab_model("resnet50", 32)]
    print(json.dumps(res))


if __name__ == "__main__":
    main()
