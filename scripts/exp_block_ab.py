"""Whole-net A/B: fuse_block (Pallas residual-bottleneck kernel) vs default.

The res2 1x1 convs are HBM-bound in-net (~129us each at b32 where their
bandwidth floor is ~78us; net_trace census). fuse_block lowers each
identity bottleneck (1x1 -> 3x3 -> 1x1 + skip) to ONE Pallas kernel holding
intermediates in VMEM. Both engine builds ride one A/B program
(prof/abtime.py) via disjoint weight subtrees; prefold stays at its default
in both so the comparison isolates block fusion.
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
    for name, kw in (("block", {"fuse_block": True}), ("plain", {})):
        p, _ = build_model(model, img=img)
        e = make("conv_fwd", "pallas", precision="default",
                 compute_tn="bfloat16", kernel_policy="lib", **kw)
        e.init(p)
        engs[name] = e
    nblk = len(getattr(engs["block"], "_blocks", {}) or {})
    log(f"{model}: {nblk} fused bottleneck blocks")
    raw_a = engs["block"].build_raw_fn(["prob"])
    raw_b = engs["plain"].build_raw_fn(["prob"])
    d = in_dims["data"]
    x = np.asarray(gen_data_pattern(d.shape, d.tn))
    xn = np.ascontiguousarray(
        x.astype(ml_dtypes.bfloat16).transpose(0, 2, 3, 1))
    dev = engs["block"].device()
    w = {"A": dict(engs["block"]._weights_dev),
         "B": dict(engs["plain"]._weights_dev)}
    ins = {"data": jax.device_put(xn, dev)}

    def fa(wt, i):
        return raw_a(wt["A"], {"data": i["data"]})

    def fb(wt, i):
        return raw_b(wt["B"], {"data": i["data"]})

    pa = np.asarray(jax.tree_util.tree_leaves(fa(w, ins))[0],
                    dtype=np.float32)
    pb = np.asarray(jax.tree_util.tree_leaves(fb(w, ins))[0],
                    dtype=np.float32)
    mad = float(np.abs(pa - pb).max())
    log(f"{model} b{img}: block-vs-plain max abs prob diff {mad:.3e}")
    assert mad < 2e-2, f"fuse_block fidelity broke: {mad}"
    ta, tb = ab_compare(fa, fb, w, ins, n_legs=8)
    log(f"{model} b{img}: block {img/ta:.1f} img/s  plain {img/tb:.1f} "
        f"img/s  block speedup {tb/ta:.3f}x")
    return {"model": model, "img": img, "block_img_s": img / ta,
            "plain_img_s": img / tb, "speedup": tb / ta,
            "n_blocks": nblk, "max_prob_diff": mad}


def main():
    res = [ab_model("resnet50", 32)]
    print(json.dumps(res))


if __name__ == "__main__":
    main()
