"""Standalone conv-variant A/B on TPU: halo per-tap vs tap_cat vs XLA.

In-program pairwise comparison (prof/abtime.py) on resnet50 3x3 shapes.
Usage: python scripts/exp_tapcat.py [dtype]   (f32|bf16, default bf16)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


SHAPES = [  # (n, h, w, c, k, oc, pad) resnet50 3x3 layers at b32
    (32, 28, 28, 128, 3, 128, 1),
    (32, 14, 14, 256, 3, 256, 1),
    (32, 7, 7, 512, 3, 512, 1),
]


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from boda_tpu.ops.kernels.conv import conv_halo_blocks, pallas_conv2d_halo
    from boda_tpu.ops.tune import OpTune
    from boda_tpu.prof.abtime import ab_compare
    from boda_tpu.utils.dims import Dims

    dt = jnp.bfloat16 if (len(sys.argv) < 2 or sys.argv[1] == "bf16") \
        else jnp.float32
    prec = "default" if dt == jnp.bfloat16 else "highest"
    rng = np.random.default_rng(0)
    res = []
    for n, h, w, c, k, oc, pad in SHAPES:
        tn = "bfloat16" if dt == jnp.bfloat16 else "float32"
        ind = Dims.of(img=n, chan=c, y=h, x=w, tn=tn)
        fd = Dims.of(out_chan=oc, in_chan=c, y=k, x=k)
        oh = h + 2 * pad - k + 1
        od = Dims.of(img=n, chan=oc, y=oh, x=oh)
        hb = conv_halo_blocks(ind, fd, od, (1, 1), (pad, pad), OpTune())
        hb_tc = conv_halo_blocks(ind, fd, od, (1, 1), (pad, pad),
                                 OpTune(tap_cat=True))
        x = jnp.asarray(rng.standard_normal((n, h, w, c)) * 0.5, dt)
        wt = jnp.asarray(rng.standard_normal((k, k, c, oc)) * 0.05, dt)
        b = jnp.asarray(rng.standard_normal((oc,)) * 0.01, dt)
        flops = 2 * n * oh * oh * oc * k * k * c

        def mk_halo(hbv, tc):
            def f(weights, ins):
                return {"o": pallas_conv2d_halo(
                    ins["x"], weights["w"], weights["b"], stride=(1, 1),
                    pad=(pad, pad), relu=True, hb=hbv, precision=prec,
                    tap_cat=tc)}
            return f

        def f_xla(weights, ins):
            o = lax.conv_general_dilated(
                ins["x"], weights["w"], window_strides=(1, 1),
                padding=[(pad, pad), (pad, pad)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                precision=None if prec == "default" else lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
            return {"o": jnp.maximum(o + weights["b"], 0.0).astype(ins["x"].dtype)}

        weights = {"w": wt, "b": b}
        ins = {"x": x}
        pairs = [("tapcat_vs_pertap", mk_halo(hb_tc, True), mk_halo(hb, False)),
                 ("tapcat_vs_xla", mk_halo(hb_tc, True), f_xla)]
        row = {"shape": f"{n}x{h}x{w}x{c} k{k} oc{oc}", "hb": str(hb_tc)}
        for name, fa, fb in pairs:
            ta, tb = ab_compare(fa, fb, weights, ins, n_legs=8)
            row[name] = {"a_tf": flops / ta / 1e12, "b_tf": flops / tb / 1e12,
                         "speedup_a": tb / ta}
            log(f"{row['shape']} {name}: A {flops/ta/1e12:.1f} TF/s "
                f"B {flops/tb/1e12:.1f} TF/s  A/B {tb/ta:.3f}x")
        res.append(row)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
