"""pool_shift=1: shifted-strided-slice pooling vs the reduce_window lowering.

The b64 per-op trace (docs/mfu_ceiling.md) shows XLA's reduce_window
emitter at 4x over linear scaling on r50 pool1 at batch 64; pool_shift
expresses the same pooling as k*k strided slices + a max/add tree. These
gates pin semantic equality against the default lowering across max
(ceil-mode right-padded geometry) and avg (non-padding divisor, global)
pools. Parity: ref test/rtc/pool.cucl window/divisor semantics."""

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


def test_pool_shift_max_ceil_geometry():
    """alexnet-style 3x3s2 ceil-mode max pools (right-clipped windows)."""
    ref = _run("alexnet_ng_conv", 2)
    alt = _run("alexnet_ng_conv", 2, tune=parse_lexp("(pool_shift=1)"))
    assert np.allclose(ref, alt, atol=1e-6), np.abs(ref - alt).max()


def test_pool_shift_global_avg():
    """global average pool (the divisor path) via mini_resnet's gap."""
    ref = _run("mini_resnet", 2)
    alt = _run("mini_resnet", 2, tune=parse_lexp("(pool_shift=1)"))
    assert np.allclose(ref, alt, atol=1e-6), np.abs(ref - alt).max()


def test_pool_shift_resnet_pools():
    """r50 pool1 (3x3s2 ceil max — the b64 target op) + pool5 (7x7 avg)."""
    ref = _run("resnet50", 1)
    alt = _run("resnet50", 1, tune=parse_lexp("(pool_shift=1)"))
    assert np.allclose(ref, alt, atol=1e-6), np.abs(ref - alt).max()


def test_pool_shift_bf16_avg_dtype():
    """bf16 engine: pool_shift avg pooling must return the input dtype
    (regression: the f32 sum rebound `x`, so the cast-back was a no-op and
    the pool node was emitted f32, diverging from the default lowering)."""
    import jax.numpy as jnp

    from boda_tpu.graph.lowering_nhwc import _pool_shift_fn
    x = jnp.arange(2 * 8 * 8 * 4, dtype=jnp.bfloat16).reshape(2, 8, 8, 4) \
        / 100.0
    fn = _pool_shift_fn((2, 2), (2, 2), (0, 0), (0, 0), 4, 4, True, 8, 8,
                        (0, 0))
    (out,) = fn(x)
    assert out.dtype == jnp.bfloat16
    # bf16-engine whole-net equality on a model with a non-global avg path
    ref = _run("mini_resnet", 2, compute_tn="bfloat16", precision="default")
    alt = _run("mini_resnet", 2, compute_tn="bfloat16", precision="default",
               tune=parse_lexp("(pool_shift=1)"))
    assert ref.dtype == alt.dtype
    assert np.allclose(np.asarray(ref, np.float32),
                       np.asarray(alt, np.float32), atol=2e-2)


def test_pool_bview_max_and_avg():
    """pool_bview=2 (batch-view reduce_window — the b64 pool1 emitter
    escape, VERDICT r3 #8) must equal the default lowering exactly for
    max (r50 pool1 ceil geometry) and avg (alexnet/mini nets) pools."""
    ref = _run("resnet50", 2)
    alt = _run("resnet50", 2, tune=parse_lexp("(pool_bview=2)"))
    assert np.allclose(ref, alt, atol=1e-6), np.abs(ref - alt).max()
    ref = _run("alexnet_ng_conv", 2)
    alt = _run("alexnet_ng_conv", 2, tune=parse_lexp("(pool_bview=2)"))
    assert np.allclose(ref, alt, atol=1e-6), np.abs(ref - alt).max()


def test_pool_bview_must_divide_batch():
    import pytest
    with pytest.raises(Exception, match="pool_bview=3 must divide batch"):
        _run("mini_resnet", 2, tune=parse_lexp("(pool_bview=3)"))
