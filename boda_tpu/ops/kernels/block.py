"""Fused residual-bottleneck block: 1x1 -> 3x3 -> 1x1 + skip in one kernel.

The TPU move the reference could not make: its CUDA kernels fuse epilogues
into ONE conv (cnn_codegen.cc:39 fused store+bias+ReLU); here a whole
ResNet bottleneck block — conv1x1+ReLU, conv3x3(p1,s1)+ReLU, conv1x1,
residual add, ReLU — runs as a single Pallas kernel with every intermediate
held in VMEM. Rationale (measured, net_decomp r50 bf16 b32 on v5e): the
large-spatial stages run at ~50% of the MXU roofline because unfused 1x1
convs at 56x56/28x28 are HBM-bound (AI = 2*C*K/(2*(C+K)) ~ 51 FLOP/B for
C=256,K=64 vs the ~240 FLOP/B ridge); fusing the block cuts activation
traffic from 8 plane transfers (x2 reads + h1/h2 write+read + y write +
skip read) to 2 (x read, y write).

Per grid step (one image), the full plane lives in VMEM:

  h1  = relu(x @ w1 + b1)                  (H, W, K)   one big MXU dot
  h1p = zero-pad h1 by 1 in y/x            (H+2, W+2, K)
  h2  = relu(sum_taps h1p-shifts @ w2 + b2)(H, W, K)   9 dots, halo-free
  y   = relu(x + h2 @ w3 + b3)             (H, W, C)   one big MXU dot

BN/Scale params are folded into (w, b) by the engine's chain folding before
the call (executor._lower_chain generalized to blocks). Weights arrive in
the standard NHWC prep layouts: w1 (C,K), w2 (3,3,K,K), w3 (K,C).

Feasibility (block_fuse_ok): stride 1, kern 3, pad 1, groups 1, all of
x/h1p/y + weights within the VMEM budget, C and K lane-friendly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...utils.dims import Dims
from .common import PRECISIONS

_VMEM_BUDGET = 14 * 2 ** 20  # scoped-VMEM stack limit is 16M


def _oc_blk(h: int, w: int, c: int) -> int:
    """Final-1x1 output-channel chunk: small enough that the f32 partial +
    f32 residual stay modest on big planes, big enough for MXU N-efficiency
    on small ones."""
    return min(c, 128 if h * w >= 1024 else 256)


def block_fuse_ok(xd: Dims, k: int, cc: int, s, p, groups: int,
                  dil=(1, 1)) -> bool:
    """Can pallas_bottleneck run this (x dims, 3x3 width k, mid chans cc)?"""
    if s != (1, 1) or p != (1, 1) or k != 3 or groups != 1 or dil != (1, 1):
        return False
    h, w, c = xd["y"], xd["x"], xd["chan"]
    if c % 128 or cc % 8:
        return False
    itemsize = 2 if xd.tn == "bfloat16" else 4
    oc_blk = _oc_blk(h, w, c)
    x_b = h * w * c * itemsize            # double-buffered in + out
    h1p_b = (h + 2) * (w + 2) * cc * itemsize
    h2_b = h * w * cc * itemsize
    w_b = (2 * c * cc + 9 * cc * cc) * itemsize
    acc_b = h * w * cc * 4                # 3x3 f32 accumulator
    tap_b = h * (w + 2) * cc * 4          # per-tap full-width f32 product
    y_b = h * w * oc_blk * 4 * 2          # chunked final dot + f32 residual
    return (2 * 2 * x_b + h1p_b + h2_b + w_b + acc_b + tap_b + y_b
            <= _VMEM_BUDGET)


def _bneck_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
                  o_ref, *, hh, ww, precision, relu_out, oc_blk, rb, wp):
    c = x_ref.shape[-1]
    k = w1_ref.shape[-1]
    dt = x_ref.dtype
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32,
                            precision=precision)
    h1 = dot(x_ref[0].reshape(hh * ww, c), w1_ref[:])   # (H*W, K) f32
    h1 = jnp.maximum(h1 + b1_ref[:].astype(jnp.float32), 0.0)
    h1 = h1.reshape(hh, ww, k).astype(dt)
    # zero border = the 3x3's pad ring (pad right up to wp: sublane-aligned
    # widths keep the shifted tap slices relayout-free)
    h1p = jnp.pad(h1, ((1, 1), (1, wp - ww - 1), (0, 0)))
    # 3x3 + final 1x1 in row chunks: small live values schedule well and
    # the f32 partials never exceed ~rb*ww*max(c,k)
    for r0 in range(0, hh, rb):
        rr = min(rb, hh - r0)
        acc = jnp.zeros((rr, ww, k), jnp.float32)
        for ky in range(3):
            xk = h1p[r0 + ky:r0 + ky + rr]              # (rr, WP, K)
            xk2 = xk.reshape(rr * wp, k)
            for kx in range(3):
                z = dot(xk2, w2_ref[ky, kx])            # full-width tap
                z3 = z.reshape(rr, wp, k)
                acc = acc + z3[:, kx:kx + ww, :]
        h2 = jnp.maximum(acc + b2_ref[:].astype(jnp.float32), 0.0).astype(dt)
        h2 = h2.reshape(rr * ww, k)                     # contiguous collapse
        # final 1x1 in lane-aligned C chunks: caps the live f32 set (the
        # whole (H*W, C) f32 y + residual blew the 16M scoped-VMEM limit)
        for j in range(0, c, oc_blk):
            yj = dot(h2, w3_ref[:, j:j + oc_blk])       # (rr*W, ocb) f32
            yj = yj + b3_ref[j:j + oc_blk].astype(jnp.float32)
            yj = yj.reshape(rr, ww, oc_blk) \
                + x_ref[0, r0:r0 + rr, :, j:j + oc_blk].astype(jnp.float32)
            if relu_out:
                yj = jnp.maximum(yj, 0.0)
            o_ref[0, r0:r0 + rr, :, j:j + oc_blk] = yj.astype(o_ref.dtype)


def pallas_bottleneck(x, w1, b1, w2, b2, w3, b3, *,
                      precision: str = "highest", relu_out: bool = True,
                      interpret: bool = False, rb: int = 0, oc_blk: int = 0):
    """x (N,H,W,C); w1 (C,K) b1 (K); w2 (3,3,K,K) b2 (K); w3 (K,C) b3 (C)
    -> relu(x + conv1x1(relu(conv3x3(relu(conv1x1(x)))))) (N,H,W,C)."""
    n, h, w, c = x.shape
    k = w1.shape[-1]
    assert w1.shape == (c, k) and w3.shape == (k, c), (w1.shape, w3.shape)
    assert w2.shape == (3, 3, k, k), w2.shape
    from .common import round_up
    wp = round_up(w + 2, 8)
    kern = functools.partial(_bneck_kernel, hh=h, ww=w, wp=wp,
                             precision=PRECISIONS[precision],
                             relu_out=relu_out,
                             oc_blk=oc_blk or _oc_blk(h, w, c),
                             rb=rb or h)
    grid = (n,)
    full = lambda *s: pl.BlockSpec(s, lambda i: (0,) * len(s))
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0)),
            full(c, k), full(k), full(3, 3, k, k), full(k),
            full(k, c), full(c),
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, h, w, c), x.dtype),
        # the unrolled tap/chunk loops keep several f32 planes on the Mosaic
        # value stack at once (allocator does not reuse slots across the
        # unroll); the 16M default scoped limit is too tight at 56x56
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 2 ** 20),
        interpret=interpret,
    )(x, w1, b1, w2, b2, w3, b3)
