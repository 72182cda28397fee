"""pool_pallas=1: the direct Pallas pooling kernel vs reduce_window.

VERDICT r4 #5: both source-level escapes for the reduce_window emitter
pathologies (pool_shift, pool_bview) measured null on googlenet pool2 /
b64 pool1 — this is the kernel-level answer (ops/kernels/pool.py; ref
test/rtc/pool.cucl is the reference's dedicated pooling kernel). Gates
pin semantic equality against the default lowering (interpret mode on
CPU), the VMEM-decline fallback, and the custom-VJP backward."""

import numpy as np

from boda_tpu.config import make
from boda_tpu.models.zoo import build_model
from boda_tpu.ops.kernels.gen_data import gen_data_pattern
from boda_tpu.utils.dims import NDA
from boda_tpu.utils.lexp import parse_lexp


def _run(model, img, **kw):
    pipe, in_dims = build_model(model, img=img)
    eng = make("conv_fwd", "pallas", **kw)
    eng.init(pipe)
    d = in_dims["data"]
    x = NDA(d, np.asarray(gen_data_pattern(d.shape, d.tn)))
    return eng.run_fwd({"data": x}, ["prob"])["prob"].data


def test_pool_pallas_kernel_direct():
    """Kernel-level: max + avg vs reduce_window over mixed geometries."""
    import jax.numpy as jnp
    from jax import lax

    from boda_tpu.ops.kernels.pool import pallas_pool
    rng = np.random.RandomState(3)
    for iy, ix, c, k, s, p in [(14, 14, 8, (3, 3), (2, 2), (0, 0)),
                               (12, 12, 16, (2, 2), (2, 2), (0, 0)),
                               (9, 9, 8, (3, 3), (1, 1), (1, 1))]:
        oy = -(-(iy + 2 * p[0] - k[0]) // s[0]) + 1
        ox = -(-(ix + 2 * p[1] - k[1]) // s[1]) + 1
        pad_y = (p[0], max(0, (oy - 1) * s[0] + k[0] - iy - p[0]))
        pad_x = (p[1], max(0, (ox - 1) * s[1] + k[1] - ix - p[1]))
        x = jnp.asarray(rng.randn(2, iy, ix, c).astype(np.float32))
        for avg in (False, True):
            out = pallas_pool(x, k, s, pad_y, pad_x, oy, ox, avg,
                              interpret=True)
            assert out is not None
            if avg:
                ref = lax.reduce_window(
                    x, 0.0, lax.add, (1, k[0], k[1], 1),
                    (1, s[0], s[1], 1), ((0, 0), pad_y, pad_x, (0, 0)))
                from boda_tpu.graph.lowering_nhwc import _avg_divisor
                ref = ref / _avg_divisor(iy, ix, k, s, p, oy, ox) \
                    .reshape(1, oy, ox, 1)
            else:
                ref = lax.reduce_window(
                    x, -np.inf, lax.max, (1, k[0], k[1], 1),
                    (1, s[0], s[1], 1), ((0, 0), pad_y, pad_x, (0, 0)))
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       rtol=1e-6, atol=1e-6)


def test_pool_pallas_plan_modes():
    from boda_tpu.ops.kernels.pool import pool_plan
    assert pool_plan((1, 14, 14, 8), "float32", 7, 7)["mode"] == "full"
    # the r50/googlenet 112x112x64 3x3s2 pool: full-plane blows the
    # measured Mosaic stack -> the y-blocked plan takes over
    p = pool_plan((32, 112, 112, 64), "bfloat16", 56, 56)
    assert p["mode"] == "yblk" and p["halo"] == 1
    # over-budget AND iy != oy*s (ceil geometry): decline entirely
    assert pool_plan((1, 1025, 8192, 512), "float32", 513, 4096) is None


def test_pool_pallas_yblk_exact():
    """The y-blocked plan (halo view + last-block masking) must equal
    reduce_window on the exact r50 pool1 geometry class (iy == oy*s,
    ceil-mode bottom pad == halo) — in a size small enough to test."""
    import jax.numpy as jnp
    from jax import lax

    from boda_tpu.ops.kernels import pool as pool_mod
    rng = np.random.RandomState(9)
    iy = ix = 16
    oy = ox = 8
    k, s = (3, 3), (2, 2)
    pad_y = pad_x = (0, 1)
    x = jnp.asarray(rng.randn(3, iy, ix, 5).astype(np.float32))
    for avg in (False, True):
        plan = {"mode": "yblk", "ob": 4, "halo": 1}
        f = pool_mod._build((3, iy, ix, 5), "float32", k, s, pad_y, pad_x,
                            oy, ox, avg, True, plan["mode"], plan["ob"],
                            plan["halo"])
        out = f(x)
        if avg:
            ref = lax.reduce_window(
                x, 0.0, lax.add, (1, 3, 3, 1), (1, 2, 2, 1),
                ((0, 0), pad_y, pad_x, (0, 0)))
            from boda_tpu.graph.lowering_nhwc import _avg_divisor
            ref = ref / _avg_divisor(iy, ix, k, s, (0, 0), oy, ox) \
                .reshape(1, oy, ox, 1)
        else:
            ref = lax.reduce_window(
                x, -np.inf, lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
                ((0, 0), pad_y, pad_x, (0, 0)))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-6, atol=1e-6)


def test_pool_pallas_backward_matches():
    """custom-VJP backward = the XLA reduce_window adjoint."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from boda_tpu.ops.kernels.pool import pallas_pool
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(2, 10, 10, 4).astype(np.float32))
    ct = jnp.asarray(rng.randn(2, 5, 5, 4).astype(np.float32))

    def f(a):
        return jnp.sum(pallas_pool(a, (2, 2), (2, 2), (0, 0), (0, 0),
                                   5, 5, False, interpret=True) * ct)

    def ref(a):
        return jnp.sum(lax.reduce_window(
            a, -np.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
            ((0, 0), (0, 0), (0, 0), (0, 0))) * ct)

    np.testing.assert_allclose(np.asarray(jax.grad(f)(x)),
                               np.asarray(jax.grad(ref)(x)), atol=1e-6)


def test_pool_pallas_engine_resnet():
    """Whole-net: pool_pallas=1 on r50 pool1+pool5 equals the default."""
    ref = _run("resnet50", 1)
    alt = _run("resnet50", 1, tune=parse_lexp("(pool_pallas=1)"))
    assert np.allclose(ref, alt, atol=1e-6), np.abs(ref - alt).max()


def test_pool_pallas_engine_googlenet():
    """googlenet (the 7x-floor pool2 target): per-op tune on pool2 only."""
    ref = _run("googlenet_conv", 1)
    alt = _run("googlenet_conv", 1,
               per_op_tune={"pool2/3x3_s2": parse_lexp("(pool_pallas=1)")})
    assert np.allclose(ref, alt, atol=1e-6), np.abs(ref - alt).max()
