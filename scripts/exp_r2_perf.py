"""Round-2 perf experiments (one process, tunneled TPU).

exp1: resnet50 bf16 whole-net throughput at b32/b64/b128, 3 independent
      best-of-3 chained readings each (batch scaling + spread).
exp2: stem cost: conv7x7s2(+bias+relu)+maxpool3x3s2 standalone, chained
      in-program (meaningful unlike per-op dispatch timing).
exp3: stem ideal probe: same stem via space-to-depth matmul form.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def time_chained(fn, args, chain=8, n_iters=16, reps=3):
    """Best-of-reps steady-state secs per fn application (data-dep chained)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from boda_tpu.rtc.backends import time_diff_method

    def chained(*a):
        def step(carry, _):
            pert = [x + carry.astype(x.dtype)
                    if jnp.issubdtype(x.dtype, jnp.floating) else x
                    for x in a]
            out = fn(*pert)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return leaf.ravel()[0].astype(jnp.float32) * 1e-30, None
        return lax.scan(step, jnp.float32(0.0), None, length=chain)[0]

    cfn = jax.jit(chained)
    best = min(
        time_diff_method(lambda: cfn(*args),
                         lambda o: [x.block_until_ready() for x in o
                                    if hasattr(x, "block_until_ready")],
                         n_iters=max(1, n_iters // chain), warmup=1)
        for _ in range(reps))
    return best / chain


def exp1_batches():
    import jax

    from boda_tpu.config import make
    from boda_tpu.models.zoo import build_model
    from boda_tpu.ops.kernels.gen_data import gen_data_pattern
    from boda_tpu.utils.dims import NDA
    for img in (32, 64, 128):
        pipe, in_dims = build_model("resnet50", img=img)
        eng = make("conv_fwd", "pallas", precision="default",
                   compute_tn="bfloat16", kernel_policy="lib")
        eng.init(pipe)
        d = in_dims["data"]
        x = NDA(d, np.asarray(gen_data_pattern(d.shape, d.tn)))
        fl = pipe.total_flops() / img
        for rep in range(3):
            secs = min(eng.time_fwd({"data": x}, ["prob"], n_iters=24, chain=8)
                       for _ in range(3))
            log(json.dumps({"exp": "batch", "img": img, "rep": rep,
                            "img_s": round(img / secs, 1),
                            "TF_s": round(fl * img / secs / 1e12, 1),
                            "pct_peak": round(fl * img / secs / 197e12 * 100, 1)}))
        del eng


def _stem_flops(n):
    return 2 * n * 112 * 112 * 64 * 7 * 7 * 3


def exp2_stem_xla():
    import jax
    import jax.numpy as jnp
    from jax import lax
    n = 32
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(n, 224, 224, 3), jnp.bfloat16)
    w = jnp.asarray(rng.randn(7, 7, 3, 64) * 0.05, jnp.bfloat16)
    b = jnp.asarray(rng.randn(64), jnp.bfloat16)

    def stem(x, w, b):
        y = lax.conv_general_dilated(
            x, w, window_strides=(2, 2), padding=[(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        y = jnp.maximum(y + b.reshape(1, 1, 1, -1), 0.0).astype(x.dtype)
        return lax.reduce_window(
            y, -jnp.inf if y.dtype == jnp.float32 else jnp.finfo(y.dtype).min,
            lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            [(0, 0), (0, 1), (0, 1), (0, 0)])

    secs = time_chained(stem, (x, w, b), reps=3)
    log(json.dumps({"exp": "stem_xla", "img": n,
                    "us_per_batch": round(secs * 1e6, 1),
                    "TF_s": round(_stem_flops(n) / secs / 1e12, 1)}))
    return secs


def exp3_stem_s2d():
    """Stem as one GEMM: s2d(2) -> 4x4 conv s1 on 12ch -> im2col GEMM."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    n = 32
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(n, 224, 224, 3), jnp.bfloat16)
    w = jnp.asarray(rng.randn(7, 7, 3, 64) * 0.05, jnp.bfloat16)
    b = jnp.asarray(rng.randn(64), jnp.bfloat16)

    def stem(x, w, b):
        # pad to 228 (pad 3 left, 1 right -> multiples of 2), s2d by 2
        xp = jnp.pad(x, ((0, 0), (3, 1), (3, 1), (0, 0)))
        xs = xp.reshape(n, 114, 2, 114, 2, 3).transpose(0, 1, 3, 2, 4, 5) \
               .reshape(n, 114, 114, 12)
        wz = jnp.pad(w, ((0, 1), (0, 1), (0, 0), (0, 0)))  # 8x8
        wf = wz.reshape(4, 2, 4, 2, 3, 64).transpose(0, 2, 1, 3, 4, 5) \
               .reshape(4, 4, 12, 64)
        y = lax.conv_general_dilated(
            xs, wf, window_strides=(1, 1), padding=[(0, 1), (0, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        y = jnp.maximum(y + b.reshape(1, 1, 1, -1), 0.0).astype(x.dtype)[:, :112, :112]
        return lax.reduce_window(
            y, jnp.finfo(y.dtype).min, lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            [(0, 0), (0, 1), (0, 1), (0, 0)])

    secs = time_chained(stem, (x, w, b), reps=3)
    log(json.dumps({"exp": "stem_s2d", "img": n,
                    "us_per_batch": round(secs * 1e6, 1),
                    "TF_s": round(_stem_flops(n) / secs / 1e12, 1)}))


def main():
    import jax
    log(f"devices: {jax.devices()}")
    exp2_stem_xla()
    exp3_stem_s2d()
    exp1_batches()
    log("done")


if __name__ == "__main__":
    main()
