"""Whole-net ablation timing on the real chip: where does the non-conv time go?

Times subgraphs of resnet50 (bf16, lib policy) with the on-device-loop chain
method (executor.time_fwd): full net, stem-only (data->pool1), body (pool1->
prob), trunk (data->res5c_relu). Differences attribute time to the stem and
the tail honestly (standalone per-op timing over the tunnel is unusable —
see NOTES_ROUND3.md measurement discipline).

Usage: python scripts/exp_r2_ablate.py [img ...]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    imgs = [int(a) for a in sys.argv[1:]] or [32]
    import boda_tpu.modes_all  # noqa: F401
    from boda_tpu.config import make
    from boda_tpu.models.zoo import build_model
    from boda_tpu.ops.kernels.gen_data import gen_data_pattern
    from boda_tpu.utils.dims import NDA
    import jax
    log(f"devices: {jax.devices()}")

    for img in imgs:
        pipe, in_dims = build_model("resnet50", img=img)
        eng = make("conv_fwd", "pallas", precision="default",
                   compute_tn="bfloat16", kernel_policy="lib")
        eng.init(pipe)
        d = in_dims["data"]
        x = NDA(d, np.asarray(gen_data_pattern(d.shape, d.tn)))
        acts = eng.run_fwd({"data": x}, ["pool1", "prob"])
        fl_net = pipe.total_flops() / img

        cases = [
            ("full", {"data": x}, ["prob"]),
            ("stem", {"data": x}, ["pool1"]),
            ("body", {"pool1": acts["pool1"]}, ["prob"]),
            ("trunk", {"data": x}, ["res5c_relu"]),
        ]
        res = {}
        for name, ins, outs in cases:
            secs = min(eng.time_fwd(ins, outs, n_iters=24, chain=8)
                       for _ in range(2))
            res[name] = secs
            tf = fl_net * img / secs / 1e12
            log(json.dumps({"exp": name, "img": img,
                            "us": round(secs * 1e6, 1),
                            "TF_s_if_whole_net": round(tf, 1)}))
        full = res["full"]
        log(json.dumps({
            "img": img,
            "img_s": round(img / full, 1),
            "TF_s": round(fl_net * img / full / 1e12, 1),
            "pct_peak": round(fl_net * img / full / 197e12 * 100, 1),
            "stem_pct_of_full": round(res["stem"] / full * 100, 1),
            "stem_plus_body_vs_full": round(
                (res["stem"] + res["body"]) / full, 3),
            "tail_pct_of_full": round((full - res["trunk"]) / full * 100, 1),
        }))
    log("done")


if __name__ == "__main__":
    main()
