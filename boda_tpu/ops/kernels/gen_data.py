"""On-device deterministic test-pattern generation.

Parity target: the reference's ``gen_data_*.cucl`` kernels (ref test/rtc/,
used by ops-prof per SURVEY.md section 4.4): inputs for per-op profiling and
digest tests are generated *on the device* from a parameterized integer
pattern — reproducible everywhere with no host RNG.

Pattern: v[flat_i] = ((flat_i * stride + offset) mod "mod" - sub) * mul
Op signature: (type=gen_data,out=(<dims>),mod=..,sub=..,mul=..,stride=..,offset=..)
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from ...rtc.compute import FuncInfo
from ..op_base import Op
from ..registry import GenCtx, kernel_gen
from ..tune import OpTune
from .common import jdt


def gen_data_pattern(dims_shape, tn: str, mod: int = 13, sub: float = 6.0,
                     mul: float = 0.1, stride: int = 7, offset: int = 0):
    """The pattern as a jax computation (runs on-device under jit)."""
    n = 1
    for s in dims_shape:
        n *= s
    # TPU requires >=2D iota; build flat indices as (n,1) then reshape.
    flat = lax.broadcasted_iota(jnp.int32, (n, 1), 0).reshape(-1)
    v = ((flat * stride + offset) % mod).astype(jnp.float32)
    v = (v - jnp.float32(sub)) * jnp.float32(mul)
    return v.reshape(dims_shape).astype(jdt(tn))


@kernel_gen("gen_data")
def gen_gen_data(op: Op, tune: OpTune, ctx: GenCtx) -> FuncInfo:
    od = op.dims("out")
    mod = op.ival("mod", 13)
    sub = op.fval("sub", 6.0)
    mul = op.fval("mul", 0.1)
    stride = op.ival("stride", 7)
    offset = op.ival("offset", 0)

    def fn():
        return gen_data_pattern(od.shape, od.tn, mod, sub, mul, stride, offset)

    return FuncInfo(name="", args=[("out", "out")], fn=fn,
                    flops=0.0, bytes_accessed=float(od.bytes_sz()),
                    info=f"gen_data mod={mod} stride={stride}", in_dims=[])
