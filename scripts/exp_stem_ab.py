"""Whole-net A/B: stem_s2d fold on vs off (resnet50 bf16 b32, lib policy).

Uses the in-program A/B harness (prof/abtime.py): both variants compiled
into one executable, flags select the branch per leg — tunnel jitter
cancels. Also reports alexnet (11x11s4 stem) as a second data point.
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
    import numpy as np

    from boda_tpu.config import make
    from boda_tpu.models.zoo import build_model
    from boda_tpu.ops.kernels.gen_data import gen_data_pattern
    from boda_tpu.prof.abtime import ab_compare
    from boda_tpu.utils.lexp import parse_lexp

    pipe, in_dims = build_model(model, img=img)
    stem = pipe.topo_op_order()[0]
    assert pipe.ops[stem].type == "Convolution", stem

    def raw_for(tune_s):
        eng = make("conv_fwd", "pallas", precision="default",
                   compute_tn="bfloat16", kernel_policy="lib")
        eng.per_op_tune = {stem: parse_lexp(tune_s)}
        eng.init(pipe)
        raw = eng.build_raw_fn(["prob"])
        return raw, dict(eng._weights_dev), eng

    raw_a, w_a, eng = raw_for("(stem_s2d=1,use_xla=1)")
    raw_b, w_b, _ = raw_for("(stem_s2d=0,use_xla=1)")
    log(f"{model}: stem={stem} "
        f"a_log={[l for l in eng.get_info_log().splitlines() if stem in l]}")
    d = in_dims["data"]
    x = np.asarray(gen_data_pattern(d.shape, d.tn))
    dev = eng.device()
    # build_raw_fn consumes logical-layout (NCHW) inputs, like net_tune
    ins = {"data": jax.device_put(x, dev)}
    ta, tb = ab_compare(lambda w, i: raw_a(w["a"], i),
                        lambda w, i: raw_b(w["b"], i),
                        {"a": w_a, "b": w_b}, ins, n_legs=8)
    log(f"{model} b{img}: s2d_on {img/ta:.1f} img/s  s2d_off {img/tb:.1f} "
        f"img/s  speedup {tb/ta:.3f}x")
    return {"model": model, "img": img, "on_img_s": img / ta,
            "off_img_s": img / tb, "speedup": tb / ta}


def main():
    only = os.environ.get("SWEEP_ONLY", "")
    models = [only] if only else ["resnet50", "alexnet_ng_conv",
                                  "googlenet_conv"]
    res = [ab_model(m, 32) for m in models]
    print(json.dumps(res))


if __name__ == "__main__":
    main()
