"""In-program A/B: selective int8 activation storage vs baseline bf16.

VERDICT round-2 item 1: docs/mfu_ceiling.md prices the r50 res2 branch2c
chains AT the bf16 HBM roofline (115.6 MB min traffic/op at b32); storing
the 56x56/28x28-stage activations as uint8 halves that traffic. This
script measures it with the jitter-immune in-program harness
(prof/abtime.ab_compare): both variants in ONE executable, flags pick the
branch per scan leg.

Usage (on the TPU host):
  CALIB=testdata/calib/resnet50-bf16.calib.json SET=res23 \
      python scripts/exp_act_int8_ab.py
Env: IMG (batch, default 32), SET (res23|res2|trunk23|res234), CALIB.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SETS = {
    # full 56x56+28x28 coverage: trunk + branch activations
    "res23": ["pool1", "res2*_relu", "res3*_relu"],
    # res2 stage only (the three ops mfu_ceiling prices at the roofline)
    "res2": ["pool1", "res2*_relu"],
    # trunk tensors only (the 51.4/25.7 MB residual-chain reads)
    "trunk23": ["pool1", "res2?_relu", "res3?_relu"],
    # extend into res4 (memory-bound at its margins only — expected ~nil)
    "res234": ["pool1", "res2*_relu", "res3*_relu", "res4*_relu"],
    # the three 51.4 MB trunk reads only
    "res2trunk": ["pool1", "res2?_relu"],
}


def main() -> int:
    img = int(os.environ.get("IMG", "32"))
    which = os.environ.get("SET", "res23")
    calib = os.environ.get("CALIB", "testdata/calib/resnet50-bf16.calib.json")
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
    quant = engine(act_int8=SETS[which], calib_fn=calib)
    n_q = sum(1 for l in quant._info_log if l.startswith("act_int8 "))
    print(f"act_int8 set={which}: {n_q} nodes quantized", file=sys.stderr)

    d = in_dims["data"]
    x = np.asarray(gen_data_pattern(d.shape, d.tn))
    xh = np.ascontiguousarray(x.transpose(0, 2, 3, 1)).astype(
        ml_dtypes.bfloat16)
    xs = base.host_input_s2d("data", xh)
    dev = base.device()
    dev_ins = {"data": jax.device_put(xs, dev)}
    weights = base._weights_dev  # same keys/prefold both engines

    raw_a = base.build_raw_fn(["prob"])
    raw_b = quant.build_raw_fn(["prob"])

    # correctness gate before timing: top-1 agreement + prob-space error
    pa = np.asarray(jax.jit(raw_a)(weights, dev_ins)["prob"], np.float32)
    pb = np.asarray(jax.jit(raw_b)(weights, dev_ins)["prob"], np.float32)
    agree = float((pa.argmax(1) == pb.argmax(1)).mean())
    perr = float(np.abs(pa - pb).max())
    print(f"top1 agreement {agree:.3f}, prob err {perr:.4f}", file=sys.stderr)

    ta, tb = ab_compare(raw_a, raw_b, weights, dev_ins, n_legs=8)
    fl = pipe.total_flops()
    print(json.dumps({
        "exp": "act_int8_ab", "set": which, "img": img,
        "nodes_quantized": n_q,
        "top1_agree": round(agree, 4), "prob_err": round(perr, 5),
        "base_us": round(ta * 1e6, 1), "act_int8_us": round(tb * 1e6, 1),
        "speedup": round(ta / tb, 4),
        "base_tfs": round(fl / ta / 1e12, 1),
        "act_int8_tfs": round(fl / tb / 1e12, 1)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
