"""SGEMM kernel family: MXU-tiled Pallas matmul.

Parity target: the reference's generated sgemm variants (ref
test/rtc/sgemm*.cucl + cnn_codegen.cc:293-513) and the cuBLAS peer
(cublas_sgemm.cucl). TPU-native design: a 3D (m,n,k) grid with an f32 VMEM
accumulator; the k grid dim is "arbitrary" (sequential) so the accumulator
carries across k-steps; m/n are parallel. Block sizes (bm,bn,bk) are the tune
space (the analog of MNt/MNb/Kb register/thread blocking, ref cnn_op.H:10).
``tune.use_xla`` lowers to jnp.dot instead — the cuBLAS-analog library path.

Op signature: (type=sgemm,a=(M,K),b=(K,N),c=(M,N)).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# .common imports FIRST: registry's module-level _import_kernels() pulls
# in conv.py, which does `from .sgemm import PRECISIONS` — if this module
# reaches its registry import before binding PRECISIONS, importing
# kernels.sgemm directly (scripts) dies on the half-initialized cycle
from .common import PRECISIONS  # noqa: F401  (canonical home; re-export)
from .common import jdt, pad2d, pick_block, round_up, sublane

from ...rtc.compute import FuncInfo
from ..op_base import Op
from ..registry import GenCtx, kernel_gen
from ..tune import OpTune


def _matmul_kernel(a_ref, b_ref, o_ref, acc_ref, *, n_k: int, precision,
                   relu: bool = False):
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(a_ref[:], b_ref[:], preferred_element_type=jnp.float32,
                          precision=precision)

    @pl.when(pl.program_id(2) == n_k - 1)
    def _store():
        acc = acc_ref[:]
        if relu:
            acc = jnp.maximum(acc, 0.0)
        o_ref[:] = acc.astype(o_ref.dtype)


def _matmul_bias_kernel(a_ref, b_ref, bias_ref, *rest, n_k: int,
                        precision, relu: bool, has_res: bool = False):
    """Matmul with fused bias(+residual)(+ReLU) epilogue (the reference's
    fused store+bias+ReLU expressions, ref cnn_codegen.cc:39; the residual
    add plays Eltwise-sum fused into the producer's store)."""
    if has_res:
        res_ref, o_ref, acc_ref = rest
    else:
        o_ref, acc_ref = rest

    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(a_ref[:], b_ref[:], preferred_element_type=jnp.float32,
                          precision=precision)

    @pl.when(pl.program_id(2) == n_k - 1)
    def _store():
        acc = acc_ref[:] + bias_ref[:].astype(jnp.float32)
        if has_res:
            acc = acc + res_ref[:].astype(jnp.float32)
        if relu:
            acc = jnp.maximum(acc, 0.0)
        o_ref[:] = acc.astype(o_ref.dtype)


def pallas_matmul(a, b, bias=None, *, bm: int, bn: int, bk: int, out_dtype=None,
                  precision: str = "highest", relu: bool = False,
                  interpret: bool = False, residual=None):
    """2D matmul a[M,K] @ b[K,N] (+ optional fused bias[N], residual[M,N]
    and ReLU) with (bm,bn,bk) blocking; pads to block multiples and slices
    the result back."""
    M, K = a.shape
    K2, N = b.shape
    assert K == K2, (a.shape, b.shape)
    out_dtype = out_dtype or a.dtype
    mp, kp, np_ = round_up(M, bm), round_up(K, bk), round_up(N, bn)
    a = pad2d(a, mp, kp)
    b = pad2d(b, kp, np_)
    n_k = kp // bk
    prec = PRECISIONS[precision]
    common = dict(
        grid=(mp // bm, np_ // bn, n_k),
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
    )
    ab_specs = [
        pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
        pl.BlockSpec((bk, bn), lambda i, j, k: (k, j)),
    ]
    if bias is None:
        assert residual is None, "residual epilogue requires the bias kernel"
        out = pl.pallas_call(
            functools.partial(_matmul_kernel, n_k=n_k, precision=prec, relu=relu),
            in_specs=ab_specs, **common)(a, b)
    else:
        bias2d = jnp.pad(bias.reshape(1, N), ((0, 0), (0, np_ - N)))
        in_specs = ab_specs + [pl.BlockSpec((1, bn), lambda i, j, k: (0, j))]
        args = [a, b, bias2d]
        if residual is not None:
            in_specs.append(pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)))
            args.append(pad2d(residual, mp, np_))
        out = pl.pallas_call(
            functools.partial(_matmul_bias_kernel, n_k=n_k, precision=prec,
                              relu=relu, has_res=residual is not None),
            in_specs=in_specs, **common)(*args)
    if (mp, np_) != (M, N):
        out = out[:M, :N]
    return out


def pick_matmul_blocks(M: int, K: int, N: int, tune: OpTune, tn: str):
    """Clamp the tune's blocks to the problem and MXU/VMEM alignment.

    Large-problem default upgrade (measured, v5e 2026-08-21,
    docs/gen_vs_lib.md round-5 sweep): at >=1024^3 the (256,256,512)
    default is HBM-bound by operand re-reads — each operand re-loads
    grid_n/grid_m times. 512-wide tiles quarter the re-reads and lift
    bf16 sgemm from 0.56 to 0.79-0.81 of the XLA dot. Applied only when
    the tune still carries the stock defaults (an explicit tune wins)."""
    tm, tn_, tk = tune.bm, tune.bn, tune.bk
    if ((tm, tn_, tk) == (256, 256, 512) and tn != "float32"
            and min(M, N) >= 1024 and K >= 1024):
        tm, tn_, tk = 512, 512, 1024
    sl = sublane(tn)
    bm = pick_block(tm, M, sl)
    bn = pick_block(tn_, N, 128)
    bk = pick_block(tk, K, 128 if tn != "float32" else 128)
    return bm, bn, bk


@kernel_gen("sgemm")
def gen_sgemm(op: Op, tune: OpTune, ctx: GenCtx) -> FuncInfo:
    ad, bd, cd = op.dims("a"), op.dims("b"), op.dims("c")
    M, K = ad["M"], ad["K"]
    N = bd["N"]
    if bd["K"] != K or cd["M"] != M or cd["N"] != N:
        raise ValueError(f"sgemm: inconsistent dims a={ad} b={bd} c={cd}")
    dt = jdt(ad.tn)
    flops = 2.0 * M * N * K
    byts = float((M * K + K * N + M * N) * 4)

    prec = PRECISIONS[tune.precision]
    if ctx.use_ref:
        def fn(a, b):
            return jnp.dot(a, b, preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST).astype(dt)
        info = "ref:jnp.dot"
    elif tune.use_xla:
        def fn(a, b):
            return jnp.dot(a, b, preferred_element_type=jnp.float32,
                           precision=prec).astype(dt)
        info = "xla:dot (library path)"
    else:
        bm, bn, bk = pick_matmul_blocks(M, K, N, tune, ad.tn)
        fn = functools.partial(pallas_matmul, bm=bm, bn=bn, bk=bk,
                               out_dtype=dt, precision=tune.precision,
                               interpret=ctx.interpret)
        info = f"pallas:matmul bm={bm} bn={bn} bk={bk} prec={tune.precision}"

    return FuncInfo(name="", args=[("a", "in"), ("b", "in"), ("c", "out")],
                    fn=fn, flops=flops, bytes_accessed=byts, info=info,
                    in_dims=[ad, bd])
