"""1x1 stride-2 convs (r50 downsample branches): strided XLA conv vs
pre-slice + stride-1 conv, per shape, in-program A/B.

conv1x1_s2(x) == conv1x1_s1(x[:, ::2, ::2, :]) exactly (no padding, the
kernel sees one pixel). Standalone wisdom timings put the strided form far
above roofline (res5a_branch1 1024->2048 s2: 244us = 27 TF/s; floor ~48us),
suggesting XLA's conv emitter does not exploit the subsample identity. The
slice form reads 1/4 of the rows and becomes a pure-matmul-shaped conv.

Run on the TPU: python scripts/exp_k1s2_ab.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


# r50 downsample-branch shapes at b32: (in_sz, cin, cout)
SHAPES = [
    (56, 256, 512),    # res3a_branch1
    (56, 256, 128),    # res3a_branch2a
    (28, 512, 1024),   # res4a_branch1
    (28, 512, 256),    # res4a_branch2a
    (14, 1024, 2048),  # res5a_branch1
    (14, 1024, 512),   # res5a_branch2a
]


def ab_shape(hw, cin, cout, img=32):
    import jax
    import jax.numpy as jnp
    import ml_dtypes
    import numpy as np
    from jax import lax

    from boda_tpu.prof.abtime import ab_compare

    rng = np.random.default_rng(42)
    x = rng.standard_normal((img, hw, hw, cin), np.float32) \
        .astype(ml_dtypes.bfloat16)
    w = (rng.standard_normal((1, 1, cin, cout), np.float32) * 0.05) \
        .astype(ml_dtypes.bfloat16)
    b = rng.standard_normal((cout,), np.float32)
    dn = ("NHWC", "HWIO", "NHWC")

    def post(acc, b):
        out = acc + b.reshape(1, 1, 1, -1)
        return jnp.maximum(out, 0.0).astype(jnp.bfloat16)

    def fa(weights, ins):  # strided conv (current lib lowering)
        acc = lax.conv_general_dilated(
            ins["x"], weights["w"], window_strides=(2, 2),
            padding=((0, 0), (0, 0)), dimension_numbers=dn,
            preferred_element_type=jnp.float32)
        return post(acc, weights["b"])

    def fb(weights, ins):  # pre-slice + stride-1 conv
        xs = ins["x"][:, ::2, ::2, :]
        acc = lax.conv_general_dilated(
            xs, weights["w"], window_strides=(1, 1),
            padding=((0, 0), (0, 0)), dimension_numbers=dn,
            preferred_element_type=jnp.float32)
        return post(acc, weights["b"])

    dev = jax.devices()[0]
    weights = {"w": jax.device_put(w, dev), "b": jax.device_put(b, dev)}
    ins = {"x": jax.device_put(x, dev)}
    pa = np.asarray(fa(weights, ins), np.float32)
    pb = np.asarray(fb(weights, ins), np.float32)
    mad = float(np.abs(pa - pb).max())
    assert mad == 0.0, f"not an identity?! {mad}"
    ta, tb = ab_compare(fa, fb, weights, ins, n_legs=64)
    fl = 2.0 * img * (hw // 2) ** 2 * cin * cout
    log(f"{hw}x{hw}x{cin}->{cout} s2 b{img}: strided {ta*1e6:.1f}us "
        f"({fl/ta/1e12:.1f} TF/s)  slice+s1 {tb*1e6:.1f}us "
        f"({fl/tb/1e12:.1f} TF/s)  speedup {ta/tb:.3f}x")
    return {"hw": hw, "cin": cin, "cout": cout,
            "strided_us": ta * 1e6, "slice_us": tb * 1e6,
            "speedup": ta / tb}


def main():
    res = [ab_shape(*s) for s in SHAPES]
    print(json.dumps(res))


if __name__ == "__main__":
    main()
