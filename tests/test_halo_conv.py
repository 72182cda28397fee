"""Halo-window direct conv (v2): interpret-mode fidelity vs lax.conv.

Covers the supported envelope of conv_halo_blocks/pallas_conv2d_halo
(stride-1 any dtype, strided f32-only, c%128==0, padded oc, residual
fusion, masked row tails) and the feasibility gating (c<128, bf16
strided, 1x1 stride-1 -> None). Ref parity: the generated tconv family
(test/rtc/tconv.cucl, cnn_codegen.cc:763) whose line-blocked reads this
kernel reproduces via in-kernel DMA windows.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from boda_tpu.ops.kernels.conv import conv_halo_blocks, pallas_conv2d_halo
from boda_tpu.ops.tune import OpTune
from boda_tpu.utils.dims import Dims

rng = np.random.default_rng(7)


def _ref_conv(x, wt, b, s, p, relu, residual=None):
    out = lax.conv_general_dilated(
        x.astype(jnp.float32), wt.astype(jnp.float32), window_strides=s,
        padding=[(p[0], p[0]), (p[1], p[1])],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=lax.Precision.HIGHEST)
    out = out + b.astype(jnp.float32).reshape(1, 1, 1, -1)
    if residual is not None:
        out = out + residual.astype(jnp.float32)
    if relu:
        out = jnp.maximum(out, 0.0)
    return out


def _run(n, h, w, c, k, oc, s=(1, 1), p=(1, 1), dt=jnp.float32, relu=True,
         chunk=0, res=False, tap_cat=False, nb=0):
    x = jnp.asarray(rng.standard_normal((n, h, w, c)) * 0.5, dt)
    wt = jnp.asarray(rng.standard_normal((k, k, c, oc)) * (1 / (k * k * c) ** 0.5), dt)
    b = jnp.asarray(rng.standard_normal((oc,)) * 0.01, dt)
    oh = (h + 2 * p[0] - k) // s[0] + 1
    ow = (w + 2 * p[1] - k) // s[1] + 1
    tn = "float32" if dt == jnp.float32 else "bfloat16"
    ind = Dims.of(img=n, chan=c, y=h, x=w, tn=tn)
    fd = Dims.of(out_chan=oc, in_chan=c, y=k, x=k)
    od = Dims.of(img=n, chan=oc, y=oh, x=ow)
    hb = conv_halo_blocks(ind, fd, od, s, p,
                          OpTune(chunk=chunk, tap_cat=tap_cat, nb=nb))
    assert hb is not None, "expected a feasible halo blocking"
    residual = jnp.asarray(rng.standard_normal((n, oh, ow, oc)) * 0.1, dt) \
        if res else None
    out = pallas_conv2d_halo(x, wt, b, stride=s, pad=p, relu=relu, hb=hb,
                             precision="highest", interpret=True,
                             residual=residual, tap_cat=tap_cat)
    ref = _ref_conv(x, wt, b, s, p, relu, residual)
    tol = 1e-5 if dt == jnp.float32 else 0.08
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref)))
    assert err < tol, f"err={err} hb={hb}"
    return hb


def test_f32_basic_3x3():
    _run(2, 16, 16, 128, 3, 128)


def test_f32_boy_tail_masked():
    # oh=13 not divisible by any preferred boy: tail block row-masked
    _run(1, 13, 13, 128, 3, 128, p=(1, 1))


def test_f32_padded_oc():
    # oc=192 -> ocp=256 (boc split), trailing channels sliced off
    _run(1, 14, 14, 128, 3, 192)


def test_f32_5x5_pad2():
    _run(1, 14, 14, 128, 5, 128, p=(2, 2))


def test_f32_no_pad():
    _run(1, 16, 16, 128, 3, 128, p=(0, 0))


def test_bf16_3x3():
    _run(2, 14, 14, 128, 3, 256, dt=jnp.bfloat16)


def test_f32_strided_3x3():
    _run(2, 14, 14, 128, 3, 128, s=(2, 2), p=(1, 1))


def test_f32_strided_7x7():
    # resnet-stem-like (channels padded to 128 by caller in engine use)
    _run(1, 28, 28, 128, 7, 64, s=(2, 2), p=(3, 3))


def test_residual_fusion():
    _run(1, 14, 14, 128, 3, 128, res=True)


def test_gate_small_c():
    ind = Dims.of(img=1, chan=64, y=14, x=14, tn="float32")
    fd = Dims.of(out_chan=128, in_chan=64, y=3, x=3)
    od = Dims.of(img=1, chan=128, y=14, x=14)
    assert conv_halo_blocks(ind, fd, od, (1, 1), (1, 1), OpTune()) is None


def test_gate_bf16_strided():
    ind = Dims.of(img=1, chan=128, y=14, x=14, tn="bfloat16")
    fd = Dims.of(out_chan=128, in_chan=128, y=3, x=3)
    od = Dims.of(img=1, chan=128, y=7, x=7)
    assert conv_halo_blocks(ind, fd, od, (2, 2), (1, 1), OpTune()) is None


def test_gate_1x1s1():
    ind = Dims.of(img=1, chan=128, y=14, x=14, tn="float32")
    fd = Dims.of(out_chan=128, in_chan=128, y=1, x=1)
    od = Dims.of(img=1, chan=128, y=14, x=14)
    assert conv_halo_blocks(ind, fd, od, (1, 1), (0, 0), OpTune()) is None


def test_tap_cat_3x3():
    # deep-K tap-concatenated form: one (boy*owp, kh*kw*c) matmul per block
    _run(2, 16, 16, 128, 3, 128, tap_cat=True)


def test_tap_cat_tail_masked_padded_oc():
    _run(1, 13, 13, 128, 3, 192, p=(1, 1), tap_cat=True)


def test_tap_cat_5x5_residual():
    _run(1, 14, 14, 128, 5, 128, p=(2, 2), res=True, tap_cat=True)


def test_tap_cat_bf16():
    # sub-32-bit tap_cat takes the kx-buffered (kxb) form: kw column-shifted
    # DMA buffers + ky-slice channel concat -> one deep-K matmul
    hb = _run(2, 14, 14, 128, 3, 256, dt=jnp.bfloat16, tap_cat=True)
    assert hb.kxb, hb


def test_kxb_multi_row_blocks():
    # r>1 (chunked rows): interior/top/bottom DMA variants with kx shifts
    hb = _run(1, 28, 28, 128, 3, 128, dt=jnp.bfloat16, tap_cat=True, chunk=8)
    assert hb.kxb and hb.r == 4, hb


def test_kxb_tail_masked_padded_oc():
    # oh=13 (masked tail rows) + oc=192 -> ocp=256 slice-off
    hb = _run(1, 13, 13, 128, 3, 192, p=(1, 1), dt=jnp.bfloat16, tap_cat=True)
    assert hb.kxb, hb


def test_kxb_residual_5x5():
    hb = _run(1, 14, 14, 128, 5, 128, p=(2, 2), dt=jnp.bfloat16, res=True,
              tap_cat=True)
    assert hb.kxb, hb


def test_kxb_no_pad():
    # p=0: owp (16) rounds above ow (14); wp must cover kw-1+owp source cols
    hb = _run(2, 16, 16, 128, 3, 128, p=(0, 0), dt=jnp.bfloat16, tap_cat=True)
    assert hb.kxb, hb


def test_kxb_f32_keeps_roll_form():
    # 32-bit tap_cat stays on the measured roll-based form
    hb = _run(2, 16, 16, 128, 3, 128, tap_cat=True)
    assert not hb.kxb, hb


def test_tap_cat_strided_falls_back():
    # stride>1: tap_cat is ignored (kernel runs the per-tap form), still correct
    _run(2, 14, 14, 128, 3, 128, s=(2, 2), p=(1, 1), tap_cat=True)


def test_nb_default_off():
    # nb stays off unless forced: the measured v5e null result (exp_nb.py)
    # showed image-batching loses to full-width oc blocks
    hb = _run(8, 7, 7, 128, 3, 128)
    assert hb.nb == 1, hb


def test_nb_forced_2():
    hb = _run(4, 14, 14, 128, 3, 128, nb=2)
    assert hb.nb == 2, hb


def test_nb_residual_padded_oc():
    # batched-image path with residual fusion + oc=192 -> ocp=256 slice-off
    hb = _run(4, 7, 7, 128, 3, 192, res=True, nb=2)
    assert hb.nb == 2, hb


def test_nb_bf16():
    hb = _run(4, 7, 7, 128, 3, 128, dt=jnp.bfloat16, nb=2)
    assert hb.nb == 2, hb


def test_nb_no_pad():
    hb = _run(4, 9, 9, 128, 3, 128, p=(0, 0), nb=2)
    assert hb.nb == 2, hb


def test_nb_indivisible_falls_back():
    # n=3 not divisible by forced nb=2 -> kernel must run unbatched
    hb = _run(3, 7, 7, 128, 3, 128, nb=2)
    assert hb.nb == 1, hb


def test_nb_strided_stays_off():
    # nb is gated to stride-1; strided shapes must never pick nb>1
    hb = _run(4, 14, 14, 128, 3, 128, s=(2, 2), p=(1, 1))
    assert hb.nb == 1, hb
