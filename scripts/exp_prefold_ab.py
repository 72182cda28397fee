"""Whole-net A/B: upload-time BN/Scale prefold vs per-forward in-jit fold.

The in-jit fold re-derives every fused conv's effective weights each
dispatch (read + scale + write of ~25M resnet50 weights — batch-independent
device time). prefold=1 computes the identical fold ONCE at weight upload.
This A/B compiles both variants into ONE program (prof/abtime.py): leg A is
the prefold engine's raw fn over prefolded weights, leg B the in-jit-fold
engine's raw fn over raw weights; the merged weight dict carries both key
sets so the program object is shared and tunnel jitter cancels.
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
    engs = {}
    for pf in (1, 0):
        p, _ = build_model(model, img=img)
        e = make("conv_fwd", "pallas", precision="default",
                 compute_tn="bfloat16", kernel_policy="lib", prefold=pf)
        e.init(p)
        engs[pf] = e
    raw_pf = engs[1].build_raw_fn(["prob"])
    raw_nf = engs[0].build_raw_fn(["prob"])
    # merged weights: raw keys (identical data both engines) + __folded
    w = dict(engs[0]._weights_dev)
    w.update({k: v for k, v in engs[1]._weights_dev.items()
              if k.endswith("__folded")})
    d = in_dims["data"]
    x = np.asarray(gen_data_pattern(d.shape, d.tn))
    xn = np.ascontiguousarray(
        x.astype(ml_dtypes.bfloat16).transpose(0, 2, 3, 1))
    dev = engs[1].device()
    ins = {"data": jax.device_put(xn, dev)}
    # fidelity gate first: both paths must agree
    oa = raw_pf(w, ins)
    ob = raw_nf(w, ins)
    pa = np.asarray(jax.tree_util.tree_leaves(oa)[0], dtype=np.float32)
    pb = np.asarray(jax.tree_util.tree_leaves(ob)[0], dtype=np.float32)
    mad = float(np.abs(pa - pb).max())
    log(f"{model} b{img}: prefold-vs-injit max abs prob diff {mad:.3e}")
    assert mad < 1e-2, f"prefold fidelity broke: {mad}"
    ta, tb = ab_compare(raw_pf, raw_nf, w, ins, n_legs=8)
    log(f"{model} b{img}: prefold {img/ta:.1f} img/s  injit {img/tb:.1f} "
        f"img/s  prefold speedup {tb/ta:.3f}x")
    return {"model": model, "img": img, "prefold_img_s": img / ta,
            "injit_img_s": img / tb, "speedup": tb / ta, "max_prob_diff": mad}


def main():
    res = []
    for model, img in (("resnet50", 32), ("googlenet_conv", 32)):
        res.append(ab_model(model, img))
    print(json.dumps(res))


if __name__ == "__main__":
    main()
