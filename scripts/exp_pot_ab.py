"""In-program A/B: arbitrary per-op tune overrides vs the bench baseline.

Generalizes exp_pool_shift_ab.py: POT is a per_op_tune lexp applied to the
B engine; the A engine is the exact bench default. Both variants in ONE
executable (prof/abtime.ab_compare — tunnel jitter cancels).

Usage (TPU host):
  POT='(res2c_branch2a=(use_xla=0))' IMG=64 python scripts/exp_pot_ab.py
Env: POT (required), IMG (default 32), MODEL (default resnet50).
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    img = int(os.environ.get("IMG", "32"))
    model = os.environ.get("MODEL", "resnet50")
    pot = os.environ["POT"]
    import jax
    import ml_dtypes

    from boda_tpu.config import make
    from boda_tpu.models.zoo import build_model
    from boda_tpu.ops.kernels.gen_data import gen_data_pattern
    from boda_tpu.prof.abtime import ab_compare
    from boda_tpu.utils.lexp import parse_lexp

    pipe, in_dims = build_model(model, img=img)

    def engine(**kw):
        eng = make("conv_fwd", "pallas", compute_tn="bfloat16",
                   precision="default", kernel_policy="lib",
                   input_s2d=True, **kw)
        eng.init(pipe)
        return eng

    base = engine()
    cand = engine(per_op_tune={k: v for k, v in parse_lexp(pot).kids})

    d = in_dims["data"]
    x = np.asarray(gen_data_pattern(d.shape, d.tn))
    xh = np.ascontiguousarray(x.transpose(0, 2, 3, 1)).astype(
        ml_dtypes.bfloat16)
    xs = base.host_input_s2d("data", xh)
    dev = base.device()
    dev_ins = {"data": jax.device_put(xs, dev)}
    weights = base._weights_dev

    raw_a = base.build_raw_fn(["prob"])
    raw_b = cand.build_raw_fn(["prob"])

    pa = np.asarray(jax.jit(raw_a)(weights, dev_ins)["prob"], np.float32)
    pb = np.asarray(jax.jit(raw_b)(weights, dev_ins)["prob"], np.float32)
    agree = float((pa.argmax(1) == pb.argmax(1)).mean())
    perr = float(np.abs(pa - pb).max())
    print(f"top1 agreement {agree:.3f}, prob err {perr:.5f}", file=sys.stderr)

    ta, tb = ab_compare(raw_a, raw_b, weights, dev_ins, n_legs=8)
    fl = pipe.total_flops()
    print(json.dumps({
        "exp": "pot_ab", "model": model, "img": img, "pot": pot,
        "top1_agree": round(agree, 4), "prob_err": round(perr, 6),
        "base_us": round(ta * 1e6, 1), "pot_us": round(tb * 1e6, 1),
        "speedup": round(ta / tb, 4),
        "base_tfs": round(fl / ta / 1e12, 1),
        "pot_tfs": round(fl / tb / 1e12, 1)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
