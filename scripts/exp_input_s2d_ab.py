"""Whole-net A/B: host-side pre-folded stem_s2d input vs plain native NHWC.

Leg A: engine with input_s2d=1 fed the batch already folded to
(N, oy+m-1, ox+m-1, s*s*C) on the host — stem conv runs as a stride-1
K=s*s*C conv with zero device-side relayout. Leg B: the current default —
native NHWC input, stem conv via XLA's strided conv emitter. Both engines'
weight dicts ride as disjoint subtrees of one weights pytree so the two
variants compile into ONE program (prof/abtime.py) and tunnel jitter
cancels.
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

    _, in_dims = build_model(model, img=img)
    engs = {}
    for name, kw in (("s2d", {"input_s2d": True}), ("plain", {})):
        p, _ = build_model(model, img=img)
        e = make("conv_fwd", "pallas", precision="default",
                 compute_tn="bfloat16", kernel_policy="lib", **kw)
        e.init(p)
        engs[name] = e
    raw_a = engs["s2d"].build_raw_fn(["prob"])
    raw_b = engs["plain"].build_raw_fn(["prob"])
    d = in_dims["data"]
    x = np.asarray(gen_data_pattern(d.shape, d.tn))
    xn = np.ascontiguousarray(
        x.astype(ml_dtypes.bfloat16).transpose(0, 2, 3, 1))
    xf = engs["s2d"].host_input_s2d("data", xn)
    dev = engs["s2d"].device()
    w = {"A": dict(engs["s2d"]._weights_dev),
         "B": dict(engs["plain"]._weights_dev)}
    ins = {"s2d": jax.device_put(xf, dev), "nhwc": jax.device_put(xn, dev)}

    def fa(wt, i):
        return raw_a(wt["A"], {"data": i["s2d"]})

    def fb(wt, i):
        return raw_b(wt["B"], {"data": i["nhwc"]})

    pa = np.asarray(jax.tree_util.tree_leaves(fa(w, ins))[0],
                    dtype=np.float32)
    pb = np.asarray(jax.tree_util.tree_leaves(fb(w, ins))[0],
                    dtype=np.float32)
    mad = float(np.abs(pa - pb).max())
    log(f"{model} b{img}: s2d-vs-plain max abs prob diff {mad:.3e}")
    assert mad < 2e-2, f"input_s2d fidelity broke: {mad}"
    ta, tb = ab_compare(fa, fb, w, ins, n_legs=8)
    log(f"{model} b{img}: input_s2d {img/ta:.1f} img/s  plain {img/tb:.1f} "
        f"img/s  s2d speedup {tb/ta:.3f}x")
    return {"model": model, "img": img, "s2d_img_s": img / ta,
            "plain_img_s": img / tb, "speedup": tb / ta,
            "max_prob_diff": mad}


def main():
    only = os.environ.get("SWEEP_ONLY", "")
    res = []
    for model, img in (("resnet50", 32), ("googlenet_conv", 32)):
        if only and model != only:
            continue
        res.append(ab_model(model, img))
    print(json.dumps(res))


if __name__ == "__main__":
    main()
