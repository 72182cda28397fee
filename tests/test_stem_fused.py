"""Fused Pallas stem kernel (conv7x7s2 + bias/ReLU + maxpool3x3s2):
correctness vs the XLA conv+pool reference, interpret mode.

This kernel is a measured NULL RESULT for performance (docs/kernel_guide.md
"Fused stem, measured"): on v5e it runs 0.55-0.66x the XLA stem_s2d + pool
path it would replace, so the engine does not use it. The test pins the
kernel's math (incl. the host dx-fold + weight fold pair) so the experiment
stays reproducible. Parity: ref cnn_codegen.cc:39 store fusion, extended to
pooling — the extension the reference never had."""

import numpy as np
import jax.numpy as jnp
import pytest
from jax import lax

from boda_tpu.graph.lowering_nhwc import host_stem_s2d, stem_s2d_geom
from boda_tpu.ops.kernels.stem import (fold_stem_weights_dx, host_stem_dxfold,
                                       pallas_stem_fused, stem_dxfold_cp)


def _ref_stem(x_nhwc, w_oihw, b, s, p, relu=True):
    out = lax.conv_general_dilated(
        jnp.asarray(x_nhwc), jnp.asarray(w_oihw.transpose(2, 3, 1, 0)),
        window_strides=(s, s), padding=[(p, p), (p, p)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    out = out + b.reshape(1, 1, 1, -1)
    if relu:
        out = jnp.maximum(out, 0.0)
    # caffe ceil-mode 3x3s2 maxpool: right-clipped windows
    return lax.reduce_window(
        jnp.pad(out, ((0, 0), (0, 1), (0, 1), (0, 0)),
                constant_values=-np.inf),
        -np.inf, lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "valid")


@pytest.mark.parametrize("cp_pad", [None, 64])
def test_stem_fused_matches_xla_r50_shape(cp_pad):
    rng = np.random.RandomState(7)
    n, c, h, w_, oc, kk, s, p = 2, 3, 224, 224, 64, 7, 2, 3
    x = rng.randn(n, h, w_, c).astype(np.float32)
    w = (rng.randn(oc, c, kk, kk) * 0.1).astype(np.float32)
    b = (rng.randn(oc) * 0.1).astype(np.float32)
    ref = np.asarray(_ref_stem(x, w, b, s, p))
    assert ref.shape == (n, 56, 56, oc)

    geom = stem_s2d_geom({"chan": c, "y": h, "x": w_}, {"y": 112, "x": 112},
                         (s, s), (p, p), (kk, kk), (1, 1), 1)
    m = geom["m"]
    xsd = host_stem_s2d(x, geom)
    x6 = host_stem_dxfold(xsd, m, 112, cp=cp_pad)
    assert x6.shape == (n, geom["xs_h"], 112,
                        cp_pad or stem_dxfold_cp(m, s * s * c))
    # weights: OIHW -> s2d-folded HWIO (same math as the lowering's prep_w)
    wh = w.transpose(2, 3, 1, 0)
    wh = np.pad(wh, ((0, m * s - kk), (0, m * s - kk), (0, 0), (0, 0)))
    wh = wh.reshape(m, s, m, s, c, oc).transpose(0, 2, 1, 3, 4, 5) \
           .reshape(m, m, s * s * c, oc)
    w2 = fold_stem_weights_dx(wh, cp=cp_pad)
    out = pallas_stem_fused(jnp.asarray(x6), jnp.asarray(w2), jnp.asarray(b),
                            kh=m, poh=56, pow_=56, interpret=True)
    np.testing.assert_allclose(np.asarray(out), ref,
                               rtol=1e-5, atol=1e-5 * np.abs(ref).max())


def test_stem_fused_poy_chunking_and_no_relu():
    rng = np.random.RandomState(3)
    n, c, h, w_, oc, kk, s, p = 1, 3, 224, 224, 16, 7, 2, 3
    x = rng.randn(n, h, w_, c).astype(np.float32)
    w = (rng.randn(oc, c, kk, kk) * 0.1).astype(np.float32)
    b = np.zeros(oc, np.float32)
    ref = np.asarray(_ref_stem(x, w, b, s, p, relu=False))
    geom = stem_s2d_geom({"chan": c, "y": h, "x": w_}, {"y": 112, "x": 112},
                         (s, s), (p, p), (kk, kk), (1, 1), 1)
    m = geom["m"]
    x6 = host_stem_dxfold(host_stem_s2d(x, geom), m, 112)
    wh = w.transpose(2, 3, 1, 0)
    wh = np.pad(wh, ((0, m * s - kk), (0, m * s - kk), (0, 0), (0, 0)))
    wh = wh.reshape(m, s, m, s, c, oc).transpose(0, 2, 1, 3, 4, 5) \
           .reshape(m, m, s * s * c, oc)
    w2 = fold_stem_weights_dx(wh)
    for poy in (7, 14, 28, 56):  # uneven final chunks + single-chunk cases
        out = pallas_stem_fused(jnp.asarray(x6), jnp.asarray(w2),
                                jnp.asarray(b), kh=m, poh=56, pow_=56,
                                poy=poy, relu=False, interpret=True)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5,
                                   atol=1e-5 * np.abs(ref).max(),
                                   err_msg=f"poy={poy}")
