"""Generated backward-convolution kernels (training path).

Parity target: the reference's dedicated backward conv kernels — BckConv
producing in/filts/biases grads (ref test/rtc/bconv.cucl,
BckConv_*_grad_loss.cucl, generators cnn_codegen.cc:44-136). TPU-native
redesign (stride-1, groups-1):

  * in_grad   = full-correlation conv of dY with the spatially-flipped,
    io-transposed filters — REUSES the forward Pallas conv kernel with
    pad' = k-1-p (the bck_in_pad of the reference, cnn_op.cc bconv setup).
  * filts_grad[ky,kx,c,oc] = sum_{n,oy,ox} Xpad[n,oy+ky,ox+kx,c]·dY[n,oy,ox,oc]
    — one (C,M)x(M,OC) MXU contraction per filter tap, M = N*OH*OW, via a
    transposed-LHS Pallas matmul (contraction over the leading axis, so the
    big activation never gets transposed in HBM).
  * biases_grad = sum dY over (n,y,x) — a bandwidth-trivial reduction left
    to XLA (fuses with the dY producer).

All accumulate in f32 (the 1e-5 gate holds vs the jax.vjp-of-XLA oracle).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...utils.dims import Dims
from ..tune import OpTune
from .common import pick_block, round_up, sublane
from .conv import conv_blocks, pallas_conv2d_nhwc
from .sgemm import PRECISIONS


def _atb_kernel(a_ref, b_ref, o_ref, acc_ref, *, n_k: int, precision):
    """o[M,N] (+)= a[K,M]^T @ b[K,N] — contraction over the leading axis."""
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += lax.dot_general(
        a_ref[:], b_ref[:], dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)

    @pl.when(pl.program_id(2) == n_k - 1)
    def _store():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def pallas_matmul_atb(a, b, *, bm: int, bn: int, bk: int, out_dtype=None,
                      precision: str = "highest", interpret: bool = False):
    """a[K,M]^T @ b[K,N] -> [M,N] without materializing a^T in HBM."""
    K, M = a.shape
    K2, N = b.shape
    assert K == K2, (a.shape, b.shape)
    out_dtype = out_dtype or jnp.float32
    mp, kp, np_ = round_up(M, bm), round_up(K, bk), round_up(N, bn)
    if (K, M) != (kp, mp):
        a = jnp.pad(a, ((0, kp - K), (0, mp - M)))
    if (K, N) != (kp, np_):
        b = jnp.pad(b, ((0, kp - K), (0, np_ - N)))
    n_k = kp // bk
    out = pl.pallas_call(
        functools.partial(_atb_kernel, n_k=n_k, precision=PRECISIONS[precision]),
        grid=(mp // bm, np_ // bn, n_k),
        in_specs=[
            pl.BlockSpec((bk, bm), lambda i, j, k: (k, i)),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=int(a.size * a.dtype.itemsize
                               + b.size * b.dtype.itemsize
                               + mp * np_ * jnp.dtype(out_dtype).itemsize),
            transcendentals=0),
        interpret=interpret,
    )(a, b)
    if (mp, np_) != (M, N):
        out = out[:M, :N]
    return out


def bck_in_blocks(dyd: Dims, fd: Dims, xd: Dims, tune: OpTune):
    """Feasibility of the in-grad path (forward kernel on transformed dims)."""
    dy_as_in = Dims.of(img=dyd["img"], chan=fd["out_chan"], y=dyd["y"],
                       x=dyd["x"], tn=dyd.tn)
    f_t = Dims.of(out_chan=fd["in_chan"], in_chan=fd["out_chan"],
                  y=fd["y"], x=fd["x"])
    x_as_out = Dims.of(img=xd["img"], chan=fd["in_chan"], y=xd["y"],
                       x=xd["x"], tn=xd.tn)
    return conv_blocks(dy_as_in, f_t, x_as_out, tune)


def pallas_conv2d_bck_in(dy, w, *, pad, blocks, precision: str = "highest",
                         interpret: bool = False):
    """dX (N,IH,IW,C) from dY (N,OH,OW,OC) and w (KH,KW,C,OC); stride (1,1).
    dX = conv(dY, rot180(w)^T) with pad k-1-p (ref bck_in_pad)."""
    kh, kw, c, oc = w.shape
    wt = w[::-1, ::-1].transpose(0, 1, 3, 2)  # (kh,kw,oc,c)
    zb = jnp.zeros((c,), jnp.float32)
    return pallas_conv2d_nhwc(dy, wt, zb, stride=(1, 1),
                              pad=(kh - 1 - pad[0], kw - 1 - pad[1]),
                              relu=False, blocks=blocks, precision=precision,
                              interpret=interpret)


def pallas_conv2d_bck_filts(x, dy, *, pad, tune: OpTune,
                            precision: str = "highest",
                            interpret: bool = False):
    """dW (KH,KW,C,OC) from x (N,IH,IW,C) and dY (N,OH,OW,OC); stride (1,1).
    One leading-axis-contraction matmul per filter tap."""
    n, ih, iw, c = x.shape
    n2, oh, ow, oc = dy.shape
    assert n == n2
    kh = ih + 2 * pad[0] - oh + 1
    kw = iw + 2 * pad[1] - ow + 1
    xp = jnp.pad(x, ((0, 0), (pad[0], pad[0]), (pad[1], pad[1]), (0, 0)))
    m = n * oh * ow
    dyf = dy.reshape(m, oc)
    sl = sublane(str(x.dtype))
    bm = pick_block(tune.bm, c, sl)
    bn = pick_block(tune.bn, oc, 128)
    bk = pick_block(tune.bk, m, 128)
    taps = []
    for ky in range(kh):
        row = []
        for kx in range(kw):
            xs = xp[:, ky:ky + oh, kx:kx + ow, :].reshape(m, c)
            row.append(pallas_matmul_atb(xs, dyf, bm=bm, bn=bn, bk=bk,
                                         out_dtype=jnp.float32,
                                         precision=precision,
                                         interpret=interpret))
        taps.append(jnp.stack(row))
    return jnp.stack(taps)  # (kh,kw,c,oc) f32
