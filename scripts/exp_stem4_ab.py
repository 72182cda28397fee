"""Stem double-s2d (MLPerf-style conv0 space-to-depth) vs the current
single-fold stem, in-program A/B.

Current flagship stem (input_s2d=1): host folds the 224x224x3 batch by the
stride (2x2) -> (N,115,115,12); conv1 becomes a stride-1 4x4x12->64 XLA
conv. Per-op trace (2026-08): conv1 270us + inputs['data'] 108us = 18% of
the b32 forward — the folded conv's K=4*4*12=192 / N=64 starve the MXU and
C=12 forces an exotic padded input layout.

Candidate: fold ONCE more (total 4x4 block -> channels, the MLPerf resnet
conv0 trick, done from the already-folded form so the kernel only grows to
3 taps/axis): host emits (N,58,58,48); conv1 becomes 3x3x48->256 where the
256 output channels are (2x2 output phase) x 64; pool1 (3x3s2) is computed
directly on the phase-folded layout as a max of 9 shifted slices, emitting
the standard (N,56,56,64) res2a input. K=432, N=256 — MXU-shaped — at
2.25x structural FLOP inflation (22.2 vs 9.9 GFLOP @ b32).

Run on the TPU: python scripts/exp_stem4_ab.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def fold2_weights(w1):
    """(4,4,12,O) single-fold stem weights -> (3,3,48,4*O) double-fold.

    Per axis: output pixel y=2p+u (u in {0,1}) needs folded-1 input rows
    y+t = 2(p+d)+phi with d=floor((u+t)/2), phi=(u+t)%2, t in 0..3."""
    import numpy as np
    o = w1.shape[-1]
    c = w1.shape[2]
    w2 = np.zeros((3, 3, 2, 2, c, 2, 2, o), w1.dtype)  # dy dx phiy phix c uy ux o
    for uy in range(2):
        for ty in range(4):
            dy, py = divmod(uy + ty, 2)
            for ux in range(2):
                for tx in range(4):
                    dx, px = divmod(ux + tx, 2)
                    w2[dy, dx, py, px, :, uy, ux, :] = w1[ty, tx]
    return w2.reshape(3, 3, 4 * c, 4 * o)


def fold2_input(x1):
    """(N,H,W,C) folded-1 input -> (N,ceil(H/2),ceil(W/2),4C) with channel
    order (phiy, phix, c)."""
    import numpy as np
    n, h, w, c = x1.shape
    h2, w2 = -(-h // 2), -(-w // 2)
    xp = np.pad(x1, ((0, 0), (0, 2 * h2 - h), (0, 2 * w2 - w), (0, 0)))
    xr = xp.reshape(n, h2, 2, w2, 2, c)
    return np.ascontiguousarray(
        xr.transpose(0, 1, 3, 2, 4, 5).reshape(n, h2, w2, 4 * c))


def main():
    import jax
    import jax.numpy as jnp
    import ml_dtypes
    import numpy as np
    from jax import lax

    from boda_tpu.prof.abtime import ab_compare

    img = int(os.environ.get("IMG", "32"))
    rng = np.random.default_rng(42)
    # folded-1 stem input as the engine's host_input_s2d emits it
    x1 = (rng.standard_normal((img, 115, 115, 12), np.float32) * 0.5) \
        .astype(ml_dtypes.bfloat16)
    w1 = (rng.standard_normal((4, 4, 12, 64), np.float32) * 0.05) \
        .astype(ml_dtypes.bfloat16)
    b = rng.standard_normal((64,), np.float32).astype(ml_dtypes.bfloat16)
    x2 = fold2_input(np.asarray(x1))
    w2 = fold2_weights(np.asarray(w1))
    dn = ("NHWC", "HWIO", "NHWC")
    NEG = -1e30

    def fa(weights, ins):  # current: folded-1 conv + reduce_window pool
        acc = lax.conv_general_dilated(
            ins["x1"], weights["w1"], window_strides=(1, 1),
            padding=((0, 0), (0, 0)), dimension_numbers=dn,
            preferred_element_type=jnp.float32)
        y = jnp.maximum(acc + weights["b"].astype(jnp.float32)
                        .reshape(1, 1, 1, -1), 0.0)
        p = lax.reduce_window(y, -float("inf"), lax.max,
                              (1, 3, 3, 1), (1, 2, 2, 1),
                              ((0, 0), (0, 1), (0, 1), (0, 0)))
        return p.astype(jnp.bfloat16)

    def fb(weights, ins):  # candidate: folded-2 conv + phase-folded pool
        acc = lax.conv_general_dilated(
            ins["x2"], weights["w2"], window_strides=(1, 1),
            padding=((0, 0), (0, 0)), dimension_numbers=dn,
            preferred_element_type=jnp.float32)  # (N,56,56,256)
        b4 = jnp.tile(weights["b"].astype(jnp.float32), 4)
        y = jnp.maximum(acc + b4.reshape(1, 1, 1, -1), 0.0)
        n, hp, wp, _ = y.shape
        yr = y.reshape(n, hp, wp, 2, 2, 64)
        # pad +1 block bottom/right with -inf (pool's 0_1 edge padding)
        yr = jnp.pad(yr, ((0, 0), (0, 1), (0, 1), (0, 0), (0, 0), (0, 0)),
                     constant_values=NEG)
        out = None
        for a in range(3):
            for c2 in range(3):
                t = yr[:, a // 2: a // 2 + hp, c2 // 2: c2 // 2 + wp,
                       a % 2, c2 % 2, :]
                out = t if out is None else jnp.maximum(out, t)
        return out.astype(jnp.bfloat16)

    dev = jax.devices()[0]
    weights = {"w1": jax.device_put(w1, dev), "w2": jax.device_put(w2, dev),
               "b": jax.device_put(b, dev)}
    ins = {"x1": jax.device_put(x1, dev), "x2": jax.device_put(x2, dev)}
    pa = np.asarray(fa(weights, ins), np.float32)
    pb = np.asarray(fb(weights, ins), np.float32)
    mad = float(np.abs(pa - pb).max())
    rel = mad / max(1e-9, float(np.abs(pa).max()))
    log(f"parity: shape {pa.shape} vs {pb.shape} mad {mad:.3e} rel {rel:.3e}")
    assert pa.shape == pb.shape and rel < 2e-2, "fold mismatch"
    for _ in range(3):
        ta, tb = ab_compare(fa, fb, weights, ins, n_legs=64)
        fl = 2.0 * img * 112 * 112 * 64 * 147  # true stem MACs*2
        log(f"stem b{img}: fold1 {ta*1e6:.1f}us ({fl/ta/1e12:.1f} TF/s eff)"
            f"  fold2 {tb*1e6:.1f}us ({fl/tb/1e12:.1f} TF/s eff)"
            f"  speedup {ta/tb:.3f}x")


if __name__ == "__main__":
    main()
