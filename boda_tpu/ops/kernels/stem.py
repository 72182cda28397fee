"""Fused Pallas stem: dx-folded stride-1 conv + bias/ReLU + maxpool 3x3s2.

The resnet/googlenet stem (conv 7x7s2 C=3 -> 64, then maxpool 3x3s2) is the
single largest per-op cost of the flagship forward (per-op trace 2026-08:
conv1 270us + pool1 40us = 15% of the b32 r50 forward) because XLA runs the
s2d-folded conv at ~2x above its utilization bound (C=12 forces an exotic
padded input layout) and then round-trips the 112x112x64 activation through
HBM for the pool. This kernel removes both:

  * host layout: the loader emits the *dx-folded* stem input
    (N, XS_H, OW, KW*CIN zero-padded to a sublane-tile multiple) — the
    stem_s2d fold (lowering_nhwc.stem_s2d_geom) with the KW column taps
    additionally gathered into the channel dim, so the kernel needs no
    column shifts at all (the sub-32-bit-rotate Mosaic gap that blocked
    bf16 tap_cat; see conv.py kxb notes).
  * kernel: whole-image BlockSpec pipelining (no manual halo DMA — every
    row window lives in the per-image block); per row-chunk, the KH row
    taps are lane-concatenated (major-dim offsets only, the proven kxb
    concat form) into ONE (rows*OW, KH*CP) operand for a single deep-K
    MXU pass; bias+ReLU and the 3x3s2 max pool run on the f32 accumulator
    in VMEM, so the full-resolution conv activation NEVER touches HBM.

Pool lowering uses only Mosaic-proven patterns (conv.py probing notes):
stride-2 column pairs via reshape-(rows//2,2,c)+static-index, column shift
via f32 pltpu.roll + iota mask, row windows via layout-free leading-dim
splits (trailing dims (OW//2, c) with OW//2 % 8 == 0).

Parity: the reference fuses bias+ReLU into conv stores (cnn_codegen.cc:39)
but cannot fuse pooling; this is the TPU-native extension of the same idea
(ref rtc_fwd.cc:486-493 fusion pass) to the HBM-bound stem pair.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import PRECISIONS, cdiv, round_up


def stem_dxfold_cp(kw: int, cin: int) -> int:
    """Packed channel width per kx tap group: kw*cin rounded up so the
    lane-concat pieces keep a consistent offset grid (sublane-tile safe)."""
    return round_up(kw * cin, 16)


def host_stem_dxfold(xsd: np.ndarray, kw: int, ow: int,
                     cp: int | None = None) -> np.ndarray:
    """(N, XS_H, XS_W, CIN) s2d-folded batch -> (N, XS_H, OW, CP) dx-folded:
    out[n, y, ox, kx*CIN + c] = xsd[n, y, ox+kx, c]; lanes >= KW*CIN zero.
    Numpy, run by the loader at decode time (like host_stem_s2d)."""
    n, h, w, cin = xsd.shape
    assert w >= ow + kw - 1, (w, ow, kw)
    cp = cp or stem_dxfold_cp(kw, cin)
    out = np.zeros((n, h, ow, cp), xsd.dtype)
    for kx in range(kw):
        out[:, :, :, kx * cin:(kx + 1) * cin] = xsd[:, :, kx:kx + ow, :]
    return out


def fold_stem_weights_dx(wf: np.ndarray, cp: int | None = None) -> np.ndarray:
    """s2d-folded stem weights (KH, KW, CIN, OC) -> (KH*CP, OC) matmul form
    matching the kernel's lane-concat K order: K = ky*CP + kx*CIN + c."""
    kh, kw, cin, oc = wf.shape
    cp = cp or stem_dxfold_cp(kw, cin)
    w2 = np.zeros((kh, cp, oc), np.asarray(wf).dtype)
    for kx in range(kw):
        w2[:, kx * cin:(kx + 1) * cin, :] = wf[:, kx]
    return w2.reshape(kh * cp, oc)


def _stem_kernel(x_ref, w_ref, b_ref, o_ref, *, kh: int, ncv: int, poh: int,
                 pow_: int, poy: int, precision, relu: bool):
    """One image per grid step. x_ref (1, XS_H, OW, CP); w (KH*CP, OC);
    b (1, OC) f32; o_ref (1, POH, POW, OC)."""
    ow = x_ref.shape[2]
    cp = x_ref.shape[3]
    oc = o_ref.shape[3]
    neg = jnp.float32(-1.0)           # pool clip sentinel (post-ReLU >= 0)
    for ci in range(cdiv(poh, poy)):
        p0 = ci * poy
        rows = min(poy, poh - p0)     # pool rows this chunk (static)
        cy0 = 2 * p0
        ncy = min(2 * rows + 1, ncv - cy0)  # conv rows available (static)
        # deep-K gather: KH row taps lane-concatenated (major-dim offsets
        # only — the sublane-offset-consistent form Mosaic accepts for
        # sub-32-bit data; see conv.py kxb)
        views = [x_ref[0, cy0 + ky:cy0 + ky + ncy] for ky in range(kh)]
        g = jnp.concatenate(views, axis=-1).reshape(ncy * ow, kh * cp)
        acc = jnp.dot(g, w_ref[...], preferred_element_type=jnp.float32,
                      precision=precision)          # (ncy*ow, oc) f32
        acc = acc + b_ref[...].astype(jnp.float32)
        if relu:
            acc = jnp.maximum(acc, 0.0)
        # pool x (3-wide stride-2 on the ow axis, right-clipped):
        # stride-2 via reshape-(m,2,c)+static-index (the f32-proven strided
        # access form, conv.py:185); the +2 column via sublane roll + mask
        vp = acc.reshape(ncy * (ow // 2), 2, oc)
        xe = vp[:, 0].reshape(ncy, ow // 2, oc)     # cols 2q
        xo = vp[:, 1].reshape(ncy, ow // 2, oc)     # cols 2q+1
        xs = pltpu.roll(xe, ow // 2 - 1, 1)         # cols 2q+2 (q+1 of xe)
        q = jax.lax.broadcasted_iota(jnp.int32, (ncy, ow // 2, 1), 1)
        xs = jnp.where(q < ow // 2 - 1, xs, neg)    # clip col ow at q max
        px = jnp.maximum(jnp.maximum(xe, xo), xs)[:, :pow_, :]
        # pool y (3-wide stride-2 on conv rows, right-clipped): layout-free
        # leading-dim split + static index; the +2 row via leading concat
        pe = px[0:2 * rows].reshape(rows, 2, pow_, oc)
        ye, yo = pe[:, 0], pe[:, 1]
        tail = px[2 * rows:2 * rows + 1] if ncy == 2 * rows + 1 \
            else jnp.full((1, pow_, oc), neg, px.dtype)
        ys = jnp.concatenate([ye[1:], tail], axis=0) if rows > 1 else tail
        out = jnp.maximum(jnp.maximum(ye, yo), ys)  # (rows, pow, oc)
        o_ref[0, p0:p0 + rows] = out.astype(o_ref.dtype)


def pallas_stem_fused(x6, w2, bias, *, kh: int, poh: int, pow_: int,
                      poy: int = 7, relu: bool = True,
                      precision: str = "default", interpret: bool = False):
    """Fused stem: x6 (N, XS_H, OW, CP) dx-folded input; w2 (KH*CP, OC);
    bias (OC,) -> (N, POH, POW, OC) pooled activations.

    Computes conv rows ncv = XS_H - KH + 1 (stride-1 deep-K matmul), then
    maxpool 3x3 stride 2 with right-clipped windows (Caffe ceil mode):
    poh/pow_ give the pooled output size from the pipe."""
    n, xs_h, ow, cp = x6.shape
    k2, oc = w2.shape
    assert k2 == kh * cp, (k2, kh, cp)
    assert ow % 2 == 0 and ow // 2 % 8 == 0, ow  # layout-free row splits
    ncv = xs_h - kh + 1
    assert 2 * (poh - 1) + 1 <= ncv <= 2 * (poh - 1) + 3, (ncv, poh)
    assert pow_ <= ow // 2, (ow, pow_)
    bias2 = bias.reshape(1, oc).astype(jnp.float32)
    out = pl.pallas_call(
        functools.partial(_stem_kernel, kh=kh, ncv=ncv, poh=poh, pow_=pow_,
                          poy=poy, precision=PRECISIONS[precision], relu=relu),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, xs_h, ow, cp), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((kh * cp, oc), lambda i: (0, 0)),
            pl.BlockSpec((1, oc), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, poh, pow_, oc), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, poh, pow_, oc), x6.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * ncv * ow * oc * kh * cp,
            bytes_accessed=int(x6.size * x6.dtype.itemsize
                               + w2.size * w2.dtype.itemsize
                               + n * poh * pow_ * oc * x6.dtype.itemsize),
            transcendentals=0),
        interpret=interpret,
    )(x6, w2, bias2)
    return out
