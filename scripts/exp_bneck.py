"""Fused-bottleneck A/B on TPU: pallas_bottleneck vs XLA op sequence.

In-program pairwise comparison on resnet50 identity-block shapes.
Usage: python scripts/exp_bneck.py [dtype f32|bf16]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


SHAPES = [  # (n, h, w, c, k) r50 identity blocks at b32
    (32, 56, 56, 256, 64),
    (32, 28, 28, 512, 128),
    (32, 14, 14, 1024, 256),
    (32, 7, 7, 2048, 512),
]


def main():
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from boda_tpu.ops.kernels.block import block_fuse_ok, pallas_bottleneck
    from boda_tpu.prof.abtime import ab_compare
    from boda_tpu.utils.dims import Dims

    dt = jnp.bfloat16 if (len(sys.argv) < 2 or sys.argv[1] == "bf16") \
        else jnp.float32
    prec = "default" if dt == jnp.bfloat16 else "highest"
    lax_prec = None if prec == "default" else lax.Precision.HIGHEST
    rng = np.random.default_rng(0)
    res = []
    for n, h, w, c, k in SHAPES:
        tn = "bfloat16" if dt == jnp.bfloat16 else "float32"
        ok = block_fuse_ok(Dims.of(img=n, chan=c, y=h, x=w, tn=tn), 3, k,
                           (1, 1), (1, 1), 1)
        weights = {
            "w1": jnp.asarray(rng.standard_normal((c, k)) * 0.05, dt),
            "b1": jnp.asarray(rng.standard_normal((k,)) * 0.1, dt),
            "w2": jnp.asarray(rng.standard_normal((3, 3, k, k)) * 0.05, dt),
            "b2": jnp.asarray(rng.standard_normal((k,)) * 0.1, dt),
            "w3": jnp.asarray(rng.standard_normal((k, c)) * 0.05, dt),
            "b3": jnp.asarray(rng.standard_normal((c,)) * 0.1, dt),
        }
        ins = {"x": jnp.asarray(rng.standard_normal((n, h, w, c)) * 0.5, dt)}
        flops = 2 * n * h * w * (c * k + 9 * k * k + k * c)

        def f_fused(wts, iv):
            return {"o": pallas_bottleneck(
                iv["x"], wts["w1"], wts["b1"], wts["w2"], wts["b2"],
                wts["w3"], wts["b3"], precision=prec)}

        def f_xla(wts, iv):
            x = iv["x"]
            h1 = jnp.einsum("nhwc,ck->nhwk", x, wts["w1"],
                            preferred_element_type=jnp.float32,
                            precision=lax_prec)
            h1 = jnp.maximum(h1 + wts["b1"].astype(jnp.float32), 0).astype(dt)
            h2 = lax.conv_general_dilated(
                h1, wts["w2"], (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                precision=lax_prec, preferred_element_type=jnp.float32)
            h2 = jnp.maximum(h2 + wts["b2"].astype(jnp.float32), 0).astype(dt)
            y = jnp.einsum("nhwk,kc->nhwc", h2, wts["w3"],
                           preferred_element_type=jnp.float32,
                           precision=lax_prec)
            y = y + wts["b3"].astype(jnp.float32) + x.astype(jnp.float32)
            return {"o": jnp.maximum(y, 0).astype(dt)}

        # numerics check first (device, small tolerance scaled to dtype)
        a = f_fused(weights, ins)["o"]
        b = f_xla(weights, ins)["o"]
        err = float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                    - b.astype(jnp.float32))))
        scale = float(jnp.max(jnp.abs(b.astype(jnp.float32)))) or 1.0
        log(f"{n}x{h}x{w}x{c} k{k} fuse_ok={ok} rel_err={err/scale:.2e}")
        ta, tb = ab_compare(f_fused, f_xla, weights, ins, n_legs=8)
        row = {"shape": f"{n}x{h}x{w}x{c} mid{k}", "fuse_ok": ok,
               "rel_err": err / scale,
               "fused_tf": flops / ta / 1e12, "xla_tf": flops / tb / 1e12,
               "speedup": tb / ta}
        log(f"  fused {flops/ta/1e12:7.1f} TF/s  xla {flops/tb/1e12:7.1f} "
            f"TF/s  speedup {tb/ta:.3f}x")
        res.append(row)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
