"""Training-side custom-VJP ops: explicit backward kernels for the three
train-step pathologies the round-4 ledger priced (docs/train_ceiling.md).

The reference ships these exact designs as CUDA kernels for its gradient
graphs: a max-pool forward that emits argmax plus a Spreading backward
that routes the gradient by index (ref test/rtc/pool.cucl,
src/rtc_fwd.cc:296,:375, src/conv_util.cc:40-64), and an explicit
backward-convolution pair instead of autodiff through the forward conv
(ref test/rtc/BckConv_in_grad_loss.cucl, src/cnn_codegen.cc:44). On TPU
the equivalent pathologies are XLA emitter choices, not missing kernels:

1. The maxpool VJP lowers through SelectAndScatter, which the TPU
   emitter serializes (pool1 bwd: 650us vs a ~110us HBM floor). Here the
   forward computes max + first-max argmax with shifted strided slices
   (one fused pass) and the backward spreads the cotangent with k*k
   interior-padded masked terms that XLA fuses into one output loop —
   no SelectAndScatter anywhere.
2. Stride-2 / 1x1 dgrads lower to gradient-dilated transpose convs that
   run at up to 12.5x the forward's time. Here dgrad is a dense 1x1
   forward-style conv at the SMALL spatial size followed by interior-pad
   zero-stuffing, and wgrad is one MXU dot over (batch, y, x).
3. Train-mode BatchNorm's autodiff backward emits ~6 HBM passes over the
   activation. The hand-derived fused backward is 2-phase: one fused
   read of (dy, x) for the two stat sums, one read + write for dx.

All three are drop-in custom_vjp functions gated by ``enabled()`` so the
toolchain watch can A/B them against the stock autodiff lowering
(BODA_TRAIN_VJP=0 restores stock). Numerics match the stock adjoints to
reduction-order rounding (first-max tiebreak matches SelectAndScatter's
>= select and torch's argmax semantics).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax

# Default OFF (measured, v5e 2026-08-21, in-program A/B at resnet50 hot
# shapes — scripts/exp_train_vjp_ab.py + toolchain_watch pool_vjp/k1_vjp):
# the jax-0.9.0 toolchain's emitters now BEAT all three explicit VJPs —
# pool custom 20,285us vs stock 1,197us (the NCHW lane-dim strided
# slices/interior pads are pathological XLA ops), 1x1-dgrad custom 163us
# vs stock 139us (the gradient-dilated transpose-conv emitter pathology
# priced in r4's train_ceiling.md is FIXED: k1s2_dgrad probe reads
# fwd+dgrad at 0.70x fwd), BN custom 399us vs stock 334us. The machinery
# stays: BODA_TRAIN_VJP=1 re-enables, and the pool_vjp/k1_vjp watch
# probes re-measure every hardware session — if the emitters regress
# again, the explicit kernels are one flag away.
_FLAG = False


def enabled() -> bool:
    env = os.environ.get("BODA_TRAIN_VJP")
    if env is not None:
        return env not in ("0", "")
    return _FLAG


# -- 1. maxpool with argmax + spreading backward ------------------------------


@functools.lru_cache(maxsize=None)
def make_maxpool_vjp(k, s, pad_y, pad_x, in_y, in_x, out_y, out_x):
    """fn(x_nchw) -> pooled, with a Spreading custom backward.

    Forward: shifted strided slices of the (-inf-padded) input; running
    (max, first-argmax) over the k*k window offsets — a single fused
    elementwise pass (reads x once, writes out + an int8 index plane).
    Backward: for each window offset j, the cotangent masked to
    ``idx == j`` lands at input positions ``o*s - pad + j`` — an interior
    lax.pad (negative edge padding trims the out-of-range rows); the k*k
    padded terms sum into one fused output loop.
    """
    ky_n, kx_n = k
    sy, sx = s

    def _max_idx(x):
        xp = jnp.pad(x, ((0, 0), (0, 0), pad_y, pad_x),
                     constant_values=-jnp.inf)
        best = idx = None
        j = 0
        for ky in range(ky_n):
            for kx in range(kx_n):
                sl = lax.slice(
                    xp, (0, 0, ky, kx),
                    (xp.shape[0], xp.shape[1],
                     ky + (out_y - 1) * sy + 1, kx + (out_x - 1) * sx + 1),
                    (1, 1, sy, sx))
                if best is None:
                    best, idx = sl, jnp.zeros(sl.shape, jnp.int8)
                else:
                    gt = sl > best  # strict: FIRST max wins (caffe/torch)
                    best = jnp.where(gt, sl, best)
                    idx = jnp.where(gt, jnp.int8(j), idx)
                j += 1
        return best, idx

    @jax.custom_vjp
    def f(x):
        return _max_idx(x)[0]

    def fwd(x):
        best, idx = _max_idx(x)
        return best, (idx,)

    def bwd(res, og):
        (idx,) = res  # og arrives in the forward output's (= x's) dtype
        zero = jnp.zeros((), og.dtype)
        acc = None
        j = 0
        for ky in range(ky_n):
            for kx in range(kx_n):
                t = jnp.where(idx == jnp.int8(j), og, zero)
                lo_y = ky - pad_y[0]
                hi_y = in_y - 1 - ((out_y - 1) * sy + ky - pad_y[0])
                lo_x = kx - pad_x[0]
                hi_x = in_x - 1 - ((out_x - 1) * sx + kx - pad_x[0])
                t = lax.pad(t, zero, [(0, 0, 0), (0, 0, 0),
                                      (lo_y, hi_y, sy - 1),
                                      (lo_x, hi_x, sx - 1)])
                acc = t if acc is None else acc + t
                j += 1
        return (acc,)

    f.defvjp(fwd, bwd)
    return f


# -- 2. explicit 1x1-conv backward --------------------------------------------


@functools.lru_cache(maxsize=None)
def conv1x1_explicit(s, prec):
    """1x1 (groups=1, pad=0) NCHW conv with explicit dgrad/wgrad.

    Forward is byte-identical to the stock lowering (same
    conv_general_dilated with f32 accumulation) — only the VJP changes:
    dgrad runs the dense 1x1 conv at the small (output) spatial size then
    interior-pads ('zero-stuffs') up to the input grid; wgrad is one
    dot_general contracting (n, y, x). Neither touches the
    gradient-dilated transpose-conv emitter.
    """
    sy, sx = s

    def raw(x, w, pref):
        return lax.conv_general_dilated(
            x, w, window_strides=(sy, sx), padding=[(0, 0), (0, 0)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            precision=prec, preferred_element_type=pref)

    @jax.custom_vjp
    def f(x, w):
        return raw(x, w, jnp.float32)

    def fwd(x, w):
        return raw(x, w, jnp.float32), (x, w)

    def bwd(res, ct):
        x, w = res
        og = ct.astype(x.dtype)
        n, c, iy, ix = x.shape
        kk = w.shape[0]
        oy, ox = og.shape[2], og.shape[3]
        wt = jnp.transpose(w, (1, 0, 2, 3))  # (in_c, out_c, 1, 1)
        t = lax.conv_general_dilated(
            og, wt, window_strides=(1, 1), padding=[(0, 0), (0, 0)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"), precision=prec)
        if sy != 1 or sx != 1 or (oy - 1) * sy + 1 != iy \
                or (ox - 1) * sx + 1 != ix:
            t = lax.pad(t, jnp.zeros((), t.dtype),
                        [(0, 0, 0), (0, 0, 0),
                         (0, iy - 1 - (oy - 1) * sy, sy - 1),
                         (0, ix - 1 - (ox - 1) * sx, sx - 1)])
        if sy == 1 and sx == 1 and oy == iy and ox == ix:
            xs = x
        else:
            xs = lax.slice(x, (0, 0, 0, 0),
                           (n, c, (oy - 1) * sy + 1, (ox - 1) * sx + 1),
                           (1, 1, sy, sx))
        dw = lax.dot_general(og, xs, (((0, 2, 3), (0, 2, 3)), ((), ())),
                             precision=prec,
                             preferred_element_type=jnp.float32)
        return t.astype(x.dtype), dw.reshape(kk, c, 1, 1).astype(w.dtype)

    f.defvjp(fwd, bwd)
    return f


# -- 3. train-mode BatchNorm with the fused hand backward ---------------------


@functools.lru_cache(maxsize=None)
def make_bn_train(eps: float):
    """fn(x_nchw) -> (xhat[x.dtype], batch_mean[f32], batch_var[f32]).

    Forward matches parallel/train._bn_train's stock math exactly (f32
    mean, two-pass f32 biased variance, rsqrt normalize, cast back).
    Backward is the standard fused BN adjoint:
      dx = r/B * (B*dy - sum(dy) - xhat * sum(dy*xhat))
    (+ the mean/var output cotangent terms dm/B and dv*2(x-m)/B, normally
    zero: the EMA stats flow through the non-differentiated aux output).
    """

    def _fwd_math(x):
        xf = x.astype(jnp.float32)
        m = xf.mean(axis=(0, 2, 3))
        v = xf.var(axis=(0, 2, 3))
        out = ((xf - m.reshape(1, -1, 1, 1))
               * lax.rsqrt(v.reshape(1, -1, 1, 1) + eps))
        return out.astype(x.dtype), m, v

    @jax.custom_vjp
    def f(x):
        return _fwd_math(x)

    def fwd(x):
        out, m, v = _fwd_math(x)
        return (out, m, v), (x, m, v)

    def bwd(res, cts):
        x, m, v = res
        dy, dm, dv = cts
        xf = x.astype(jnp.float32)
        dyf = dy.astype(jnp.float32)
        b_count = x.shape[0] * x.shape[2] * x.shape[3]
        r = lax.rsqrt(v + eps).reshape(1, -1, 1, 1)
        xc = xf - m.reshape(1, -1, 1, 1)
        # phase 1: one fused read of (dy, x) for both per-channel sums
        s_dy = dyf.sum(axis=(0, 2, 3)).reshape(1, -1, 1, 1)
        s_dyxh = (dyf * xc).sum(axis=(0, 2, 3)).reshape(1, -1, 1, 1) \
            * r  # sum(dy * xhat) = r * sum(dy * (x - m))
        # phase 2: one read of (dy, x) + one write of dx
        dx = (r / b_count) * (b_count * dyf - s_dy - (xc * r) * s_dyxh)
        dx = dx + (dm.reshape(1, -1, 1, 1)
                   + dv.reshape(1, -1, 1, 1) * 2.0 * xc) / b_count
        return (dx.astype(x.dtype),)

    f.defvjp(fwd, bwd)
    return f
