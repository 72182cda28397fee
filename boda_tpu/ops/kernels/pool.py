"""Direct Pallas pooling kernel (NHWC) — built, hardware-measured NULL.

Parity target: the reference's dedicated pooling kernel (ref
test/rtc/pool.cucl — max/avg with caffe window clipping) vs leaving
pooling to the XLA reduce_window emitter, whose per-shape pathologies
(googlenet pool2 at ~7x its HBM floor; the b64 pool1 scaling) survived
both source-level escapes (pool_shift, pool_bview) — VERDICT r4 #5
asked for the kernel-level answer. This is it, and the verdict is in
docs/model_census.md: the working kernel measures 0.59x (googlenet
pools) / 0.70x (r50 b64 pool1) WHOLE-NET vs reduce_window, which
streams the plane at HBM bandwidth with no VMEM residency requirement.
The knob (tune.pool_pallas) stays for future toolchains.

Three Mosaic caps shaped the surviving design (each probed on v5e):
strided vector slices are confined to stride 1 (the stride lives in a
phase-split reshape subsample); the kernel stack is scoped to 16M VMEM
with C<128 paying lane padding (the accumulate is SEPARABLE, x-pass
then y-pass, bounding live values to k slices + one accumulator); and
lane-dim blocks must be 128-multiples, so large planes block over
ROWS, with the k-s halo delivered by a second clamped-index view whose
last-block rows are masked (exact when iy == oy*s).

The jittable wrapper carries a custom VJP whose backward is the XLA
reduce_window adjoint (Mosaic kernels have no auto-VJP; pooling backward
in TRAINING uses graph/train_ops.make_maxpool_vjp instead — this kernel
is a serving-path form).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

def _subsample(v, sy, sx, oy, ox):
    """Mosaic-legal strided subsample: v[::sy, ::sx] for a (Y, X, C)
    register value. Mosaic confines vector strided slices to stride 1
    (probed on v5e: "expected strides to be confined to [1, 2)"), so the
    stride is expressed as a phase-split reshape (oy, sy, ox, sx, C)
    followed by unit slices of the phase dims."""
    if sy == 1 and sx == 1:
        return v[:oy, :ox]
    y, x, c = v.shape
    need_y, need_x = oy * sy, ox * sx
    if y < need_y or x < need_x:
        v = jnp.pad(v, ((0, need_y - y), (0, need_x - x), (0, 0)))
    v = v[:need_y, :need_x]
    v = v.reshape(oy, sy, ox, sx, c)
    return v[:, 0, :, 0, :]


def _pool_kernel(x_ref, div_ref, o_ref, *, k, s, pad_y, pad_x, oy, ox, avg):
    xb = x_ref[0]  # (iy, ix, C)
    if avg:
        xb = xb.astype(jnp.float32)
        init = jnp.float32(0.0)
    else:
        init = jnp.asarray(-jnp.inf, xb.dtype)
    xp = jnp.pad(xb, (pad_y, pad_x, (0, 0)), constant_values=init)
    # SEPARABLE two-stage accumulate with UNIT-stride shifted slices only
    # (Mosaic confines vector strided slices to stride 1), then one
    # phase-split subsample. Separability also bounds the kernel stack:
    # the naive k*k dense accumulate kept all k^2 slices live (measured
    # 18.37M vs the 16M scoped-vmem limit at 112x112x64); the two passes
    # keep at most k slices + one accumulator.
    span_y = (oy - 1) * s[0] + 1
    span_x = (ox - 1) * s[1] + 1
    m1 = None  # stage 1: window-acc along x at every row
    for kx in range(k[1]):
        v = lax.slice(xp, (0, kx, 0),
                      (xp.shape[0], kx + span_x, xp.shape[2]))
        m1 = v if m1 is None else (m1 + v if avg else jnp.maximum(m1, v))
    acc = None  # stage 2: window-acc along y
    for ky in range(k[0]):
        v = lax.slice(m1, (ky, 0, 0), (ky + span_y, span_x, m1.shape[2]))
        acc = v if acc is None else (acc + v if avg else
                                     jnp.maximum(acc, v))
    acc = _subsample(acc, s[0], s[1], oy, ox)
    if avg:
        acc = acc * div_ref[...]
    o_ref[0] = acc.astype(o_ref.dtype)


def _pool_kernel_yblk(xa_ref, xb_ref, div_ref, o_ref, *, k, s, pad_x,
                      ob, ox, avg, nyb, halo, init_f):
    """y-blocked variant: block j holds in rows [j*ob*sy, (j+1)*ob*sy);
    the (k-s)-row halo comes from a SECOND view of the same array whose
    index map is clamped to j+1 — for the last block those rows are
    exactly the ceil-mode bottom pad, so they are masked to the init
    value. Requires pad_y == (0, <= k-s); the caller checks."""
    import jax

    a = xa_ref[0]  # (ob*sy, ix, C)
    if avg:
        a = a.astype(jnp.float32)
    init = jnp.asarray(init_f, a.dtype)
    if halo:
        b = xb_ref[0][:halo].astype(a.dtype)
        j = pl.program_id(1)
        b = jnp.where(j == nyb - 1, init, b)
        a = jnp.concatenate([a, b], axis=0)
    xp = jnp.pad(a, ((0, 0), pad_x, (0, 0)), constant_values=init)
    span_y = (ob - 1) * s[0] + 1
    span_x = (ox - 1) * s[1] + 1
    m1 = None
    for kx in range(k[1]):
        v = lax.slice(xp, (0, kx, 0),
                      (xp.shape[0], kx + span_x, xp.shape[2]))
        m1 = v if m1 is None else (m1 + v if avg else jnp.maximum(m1, v))
    acc = None
    for ky in range(k[0]):
        v = lax.slice(m1, (ky, 0, 0), (ky + span_y, span_x, m1.shape[2]))
        acc = v if acc is None else (acc + v if avg else
                                     jnp.maximum(acc, v))
    acc = _subsample(acc, s[0], s[1], ob, ox)
    if avg:
        acc = acc * div_ref[...]
    o_ref[0] = acc.astype(o_ref.dtype)


def pool_plan(in_shape, dtype, oy, ox, k=(3, 3), s=(2, 2), avg=False):
    """Channel-block plan: the largest ct dividing C whose modeled VMEM
    stack fits. Mosaic keeps each of the k*k dense shifted slices live on
    the kernel stack (measured on v5e: 18.37M for the naive 112x112x64
    bf16 3x3s2 plan vs the 16M scoped limit), so the model charges
    k[0]*k[1] dense accumulate-extent planes plus the padded input.
    Returns None when even ct=1 cannot fit (caller falls back)."""
    _, iy, ix, c = in_shape
    bytes_per = 4 if avg else max(jnp.dtype(dtype).itemsize, 2)
    budget = 12 * 1024 * 1024  # headroom under the 16M scoped-vmem limit

    def ru(v, m):
        return -(-v // m) * m

    def est(rows):
        # Mosaic physical values: x on sublanes (round to 8), C on lanes
        # (round to 128 — a 64-chan pool pays 2x); ~6 plane values live
        # through the separable accumulate (measured 18.4M for the
        # full-plane 112x112x64 bf16 case = ~5.5 such values)
        width = max(ix + k[1], (ox - 1) * s[1] + 1)
        return 6 * rows * ru(width, 8) * ru(c, 128) * bytes_per

    if est(iy + k[0]) <= budget:
        return {"mode": "full"}
    # y-blocked fallback: block j holds rows [j*ob*sy, ...) + a clamped
    # halo view whose last-block rows are masked to the init value. That
    # masking is exact only when the masked halo IS the ceil-mode bottom
    # pad, i.e. iy == oy*sy (and top pad 0 — checked by the caller);
    # true for the target pools (r50 pool1 112->56 s2, googlenet
    # pool1/pool2).
    halo = max(0, k[0] - s[0])
    if iy != oy * s[0]:
        return None
    for ob in [d for d in range(oy, 0, -1) if oy % d == 0]:
        if est(ob * s[0] + halo) <= budget:
            return {"mode": "yblk", "ob": ob, "halo": halo}
    return None


@functools.lru_cache(maxsize=None)
def _build(in_shape, dtype_name, k, s, pad_y, pad_x, oy, ox, avg,
           interpret, mode, ob, halo):
    n, iy, ix, c = in_shape
    dt = jnp.dtype(dtype_name)
    import numpy as np
    if avg:
        from ...graph.lowering_nhwc import _avg_divisor
        # inverse divisor: a multiply in the accumulate epilogue, not a div
        div = (1.0 / _avg_divisor(iy, ix, k, s,
                                  (pad_y[0], pad_x[0]), oy, ox)) \
            .astype(np.float32)
    else:
        div = np.ones((oy, ox), np.float32)
    # numpy, not jnp: _build is cached and may first run inside a jit
    # trace — a jnp reshape there would bind div to that trace and leak
    # the tracer into every later caller
    div = np.asarray(div).reshape(oy, ox, 1)

    if mode == "full":
        kern = functools.partial(_pool_kernel, k=k, s=s, pad_y=pad_y,
                                 pad_x=pad_x, oy=oy, ox=ox, avg=avg)
        call = pl.pallas_call(
            kern,
            grid=(n,),
            in_specs=[pl.BlockSpec((1, iy, ix, c),
                                   lambda i: (i, 0, 0, 0)),
                      pl.BlockSpec((oy, ox, 1), lambda i: (0, 0, 0))],
            out_specs=pl.BlockSpec((1, oy, ox, c), lambda i: (i, 0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((n, oy, ox, c), dt),
            interpret=bool(interpret),
        )
    else:  # yblk
        nyb = oy // ob
        rb = ob * s[0]
        init_f = 0.0 if avg else float("-inf")
        kern = functools.partial(_pool_kernel_yblk, k=k, s=s, pad_x=pad_x,
                                 ob=ob, ox=ox, avg=avg, nyb=nyb,
                                 halo=halo, init_f=init_f)
        inner = pl.pallas_call(
            kern,
            grid=(n, nyb),
            in_specs=[
                pl.BlockSpec((1, rb, ix, c), lambda i, j: (i, j, 0, 0)),
                pl.BlockSpec((1, rb, ix, c),
                             lambda i, j: (i, jnp.minimum(j + 1, nyb - 1),
                                           0, 0)),
                pl.BlockSpec((ob, ox, 1), lambda i, j: (j, 0, 0))],
            out_specs=pl.BlockSpec((1, ob, ox, c),
                                   lambda i, j: (i, j, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((n, oy, ox, c), dt),
            interpret=bool(interpret),
        )

        def call(x, dv):
            # trim to whole y-blocks (the clamped-halo design covers the
            # bottom pad; rows past nyb*rb never contribute — guaranteed
            # by pool_plan's pad_y_hi <= halo check)
            return inner(x[:, :nyb * rb], x[:, :nyb * rb], dv)

    def xla_ref(x):  # the backward (and the numerics oracle): reduce_window
        if avg:
            out = lax.reduce_window(
                x.astype(jnp.float32), 0.0, lax.add,
                window_dimensions=(1, k[0], k[1], 1),
                window_strides=(1, s[0], s[1], 1),
                padding=((0, 0), pad_y, pad_x, (0, 0)))
            return (out * div[None, :, :, None]).astype(x.dtype)
        return lax.reduce_window(
            x.astype(jnp.float32), -jnp.inf, lax.max,
            window_dimensions=(1, k[0], k[1], 1),
            window_strides=(1, s[0], s[1], 1),
            padding=((0, 0), pad_y, pad_x, (0, 0))).astype(x.dtype)

    @jax.custom_vjp
    def f(x):
        return call(x, div)

    def fwd(x):
        return call(x, div), (x,)

    def bwd(res, ct):
        (x,) = res
        _, vjp = jax.vjp(xla_ref, x)
        return vjp(ct)

    f.defvjp(fwd, bwd)
    return f


def pallas_pool(x, k, s, pad_y, pad_x, oy, ox, avg,
                interpret: bool = False):
    """NHWC pooling via the direct Pallas kernel; returns None (caller
    falls back) when the plan declines the shape."""
    plan = pool_plan(x.shape, x.dtype, oy, ox, tuple(k), tuple(s),
                     bool(avg))
    if plan is None:
        return None
    if plan["mode"] == "yblk" and pad_y[0] != 0:
        return None  # y-block start offsets assume no top pad
    f = _build(tuple(x.shape), str(x.dtype), tuple(k), tuple(s),
               tuple(pad_y), tuple(pad_x), oy, ox, bool(avg),
               bool(interpret), plan["mode"], plan.get("ob", 0),
               plan.get("halo", 0))
    return f(x)
