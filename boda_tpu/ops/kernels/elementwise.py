"""Elementwise kernel family (mul/add/max/relu/scale/copy).

Parity targets: the reference's small CUCL kernels — the rtc_test dot-product
smoke kernel (ref test/nvrtc_test_dot.cu), relu/dropout/scale/eltwise
templates (ref test/rtc/). On TPU these ops are normally left to XLA fusion
inside the whole-net program; the standalone Pallas versions exercise the
kernel-launch path and serve the backend smoke test.

Op signature: (type=eltwise,func=mul,a=(<dims>)[,b=(<dims>)],out=(<dims>)).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ...rtc.compute import FuncInfo
from ..op_base import Op
from ..registry import GenCtx, kernel_gen
from ..tune import OpTune
from .common import jdt, round_up

_UNARY = {
    "relu": lambda x: jnp.maximum(x, 0.0),
    "copy": lambda x: x,
    "neg": lambda x: -x,
}
_BINARY = {
    "mul": lambda x, y: x * y,
    "add": lambda x, y: x + y,
    "sub": lambda x, y: x - y,
    "max": lambda x, y: jnp.maximum(x, y),
}

_LANES = 128
_ROWS = 512  # rows per elementwise block (64 KiB f32 blocks)


def _elt_kernel(*refs, f):
    out_ref = refs[-1]
    out_ref[:] = f(*(r[:] for r in refs[:-1])).astype(out_ref.dtype)


def pallas_elementwise(f, *xs, out_dtype=None, interpret: bool = False):
    """Apply f elementwise via a Pallas kernel: flatten, pad to (ROWS,128)
    blocks, grid over row-blocks, un-pad."""
    x0 = xs[0]
    out_dtype = out_dtype or x0.dtype
    n = x0.size
    shape = x0.shape
    ncols = _LANES
    nrows = round_up(-(-n // ncols), 8)
    padded = nrows * ncols
    flats = []
    for x in xs:
        flat = x.reshape(-1)
        if padded != n:
            flat = jnp.pad(flat, (0, padded - n))
        flats.append(flat.reshape(nrows, ncols))
    br = min(_ROWS, nrows)
    grid = (-(-nrows // br),)
    out = pl.pallas_call(
        functools.partial(_elt_kernel, f=f),
        grid=grid,
        in_specs=[pl.BlockSpec((br, ncols), lambda i: (i, 0)) for _ in flats],
        out_specs=pl.BlockSpec((br, ncols), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((round_up(nrows, br), ncols), out_dtype),
        interpret=interpret,
    )(*flats)
    return out.reshape(-1)[:n].reshape(shape)


@kernel_gen("eltwise")
def gen_eltwise(op: Op, tune: OpTune, ctx: GenCtx) -> FuncInfo:
    func = op.sval("func", "mul")
    od = op.dims("out")
    dt = jdt(od.tn)
    nargs = 2 if func in _BINARY else 1
    f = _BINARY[func] if func in _BINARY else _UNARY[func]
    byts = float(od.bytes_sz() * (nargs + 1))

    if ctx.use_ref:
        def fn(*xs):
            return f(*xs).astype(dt)
        info = f"ref:jnp {func}"
    else:
        fn = functools.partial(pallas_elementwise, f, out_dtype=dt,
                               interpret=ctx.interpret)
        info = f"pallas:eltwise {func}"

    args = [("a", "in")] + ([("b", "in")] if nargs == 2 else []) + [("out", "out")]
    in_dims = [op.dims("a")] + ([op.dims("b")] if nargs == 2 else [])
    return FuncInfo(name="", args=args, fn=fn, flops=float(od.num_elems()),
                    bytes_accessed=byts, info=info, in_dims=in_dims)
