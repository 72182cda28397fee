"""Standalone A/B: halo conv image-batch blocking (nb) vs nb=1 vs XLA.

The halo kernel's per-tap matmul has M = boy*wp rows; at small spatial
extents a single image starves the 128-row MXU pass (7x7: M=56). The nb
knob stacks images per grid step (ops/tune.py). This measures whether the
bigger M wins on hardware, with the in-program A/B harness (prof/abtime.py).

Usage: python scripts/exp_nb.py [dtype]   (f32|bf16, default bf16)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


SHAPES = [  # (n, h, w, c, k, oc, pad) small-spatial resnet50 3x3 layers at b32
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
    tn = "bfloat16" if dt == jnp.bfloat16 else "float32"
    rng = np.random.default_rng(0)
    res = []
    for n, h, w, c, k, oc, pad in SHAPES:
        ind = Dims.of(img=n, chan=c, y=h, x=w, tn=tn)
        fd = Dims.of(out_chan=oc, in_chan=c, y=k, x=k)
        oh = h + 2 * pad - k + 1
        od = Dims.of(img=n, chan=oc, y=oh, x=oh)
        flops = 2 * n * oh * oh * oc * k * k * c
        x = jnp.asarray(rng.standard_normal((n, h, w, c)) * 0.5, dt)
        wt = jnp.asarray(rng.standard_normal((k, k, c, oc)) * 0.05, dt)
        b = jnp.asarray(rng.standard_normal((oc,)) * 0.01, dt)

        def halo_fn(hbv):
            def f(weights, ins):
                return {"o": pallas_conv2d_halo(
                    ins["x"], weights["w"], weights["b"], stride=(1, 1),
                    pad=(pad, pad), relu=True, hb=hbv, precision=prec)}
            return f

        def xla_fn(weights, ins):
            o = lax.conv_general_dilated(
                ins["x"], weights["w"], (1, 1), [(pad, pad)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
                precision=(lax.Precision.HIGHEST if prec == "highest"
                           else lax.Precision.DEFAULT))
            return {"o": jnp.maximum(o + weights["b"], 0).astype(dt)}

        variants = {"xla": xla_fn}
        for name, tune in [("nb1", OpTune(nb=1)), ("nb_auto", OpTune()),
                           ("nb_big", OpTune(nb=8 if h == 7 else 4))]:
            hb = conv_halo_blocks(ind, fd, od, (1, 1), (pad, pad), tune)
            if hb is None or (name != "nb1" and hb.nb == 1):
                log(f"{h}x{h}x{c}: {name} infeasible/degenerate ({hb})")
                continue
            log(f"{h}x{h}x{c}: {name} -> {hb}")
            variants[name] = halo_fn(hb)

        weights = {"w": wt, "b": b}
        ins = {"x": x}
        row = {"shape": f"{h}x{h}x{c}->{oc}", "tf": {}}
        base_name = "xla"
        base = variants[base_name]
        for name, fn in variants.items():
            if name == base_name:
                continue
            ta, tb = ab_compare(fn, base, weights, ins, n_legs=32)
            row["tf"][name] = round(flops / ta / 1e12, 1)
            row["tf"].setdefault(base_name + "_reads", []).append(
                round(flops / tb / 1e12, 1))
            log(f"{row['shape']}: {name} {flops/ta/1e12:.1f} TF/s  "
                f"(paired xla {flops/tb/1e12:.1f})")
        res.append(row)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
