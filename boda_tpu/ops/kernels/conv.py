"""Direct Pallas 2D convolution: NHWC implicit-GEMM with row-block halos.

Parity target: the reference's generated conv kernel family (ref
test/rtc/conv.cucl, tconv.cucl "line-based tiled conv" + cnn_codegen.cc
gen_op_conv:165/gen_op_tconv:763). TPU-native redesign:

  * NHWC layout: channels on the MXU lane dim, pixels on the sublane dim.
  * host-side prep (stays inside the same XLA program, fuses with neighbors):
    spatial zero-pad, then gather output-row blocks WITH their halo rows into
    a (N*R, XR, PW, C) tensor so Pallas blocks never overlap (the analog of
    tconv's per-line overlapped read pattern, done as one strided gather).
  * kernel: for each (image-row-block, out-chan block) grid cell, loop the
    KHxKW filter taps accumulating (rows*OW, C) @ (C, OCb) MXU dots in f32,
    then apply fused bias+ReLU and store (ref fused store+bias+ReLU,
    cnn_codegen.cc:39).

Supported here: groups=1, any kern/pad, stride (1,1) (strided convs lower to
XLA; see ops/cnn_variants.py policy). Inputs NHWC x, HWIO w, bias (OC).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...rtc.compute import FuncInfo
from ...utils.dims import Dims
from ..op_base import Op
from ..registry import GenCtx, kernel_gen
from ..tune import OpTune
from .common import cdiv, round_up
from .sgemm import PRECISIONS

# VMEM budget for choosing row-block size (leave headroom under ~16MB/core)
_VMEM_BUDGET = 10 * 2 ** 20


@dataclass(frozen=True)
class ConvBlocks:
    boy: int   # output rows per block
    boc: int   # output channels per block

    def __str__(self):
        return f"boy={self.boy} boc={self.boc}"


def conv_blocks(ind: Dims, fd: Dims, od: Dims, tune: OpTune) -> ConvBlocks | None:
    """Variant feasibility + block choice (the gbt_tile_t analog, ref
    gbt_tile.H:24: waste-aware block selection under a memory budget)."""
    kh, kw = fd["y"], fd["x"]
    c, oc = fd["in_chan"], fd["out_chan"]
    ow, oh = od["x"], od["y"]
    # Mosaic can relayout the in-kernel (boy,ow,c)->(boy*ow,c) collapse only
    # when it is layout-free: c lane-aligned (each row owns whole vregs), or
    # rows sublane-aligned with c within one lane tile. Observed failures:
    # (4,7,160) and (4,7,32) collapses ("unsupported shape cast"); working:
    # c%128==0 any ow, and c=64 with ow=56. Otherwise fall back to XLA.
    if c % 128 != 0 and not (c <= 128 and ow % 8 == 0):
        return None
    pw = ind["x"] + 2 * 8  # upper bound on padded width (pad unknown here; ~ok)
    itemsize = 4 if ind.tn == "float32" else 2
    boc = min(round_up(oc, 128), max(128, (tune.bn // 128) * 128))
    while round_up(oc, 128) % boc:  # keep boc a divisor of the padded oc
        boc -= 128
    # row-block candidates; tune.chunk pins boy (the sweepable knob)
    cands = (tune.chunk,) if tune.chunk else (32, 16, 8, 4, 2, 1)
    for boy in cands:
        if boy > oh and not tune.chunk:
            continue
        boy = min(boy, oh)
        xr = boy + kh - 1
        x_blk = xr * pw * c * itemsize
        out_blk = boy * ow * boc * itemsize
        acc_blk = boy * ow * boc * 4
        w_blk = kh * kw * c * boc * itemsize
        if 2 * x_blk + 2 * out_blk + acc_blk + w_blk <= _VMEM_BUDGET:
            return ConvBlocks(boy=boy, boc=boc)
    return None


def _conv_kernel(x_ref, w_ref, b_ref, o_ref, *, kh: int, kw: int, boy: int,
                 ow: int, precision, relu: bool):
    c = x_ref.shape[3]
    boc = o_ref.shape[3]
    acc = jnp.zeros((boy * ow, boc), dtype=jnp.float32)
    for ky in range(kh):
        for kx in range(kw):
            xs = x_ref[0, ky:ky + boy, kx:kx + ow, :].reshape(boy * ow, c)
            wv = w_ref[ky, kx, :, :]
            acc += jnp.dot(xs, wv, preferred_element_type=jnp.float32,
                           precision=precision)
    acc += b_ref[:].astype(jnp.float32)
    if relu:
        acc = jnp.maximum(acc, 0.0)
    o_ref[0] = acc.reshape(boy, ow, boc).astype(o_ref.dtype)


def pallas_conv2d_nhwc(x, w, bias, *, stride=(1, 1), pad=(0, 0),
                       relu: bool = False, blocks: ConvBlocks,
                       precision: str = "highest", interpret: bool = False):
    """x (N,H,W,C) * w (KH,KW,C,OC) + bias -> (N,OH,OW,OC). stride must be (1,1)."""
    assert stride == (1, 1), "pallas conv v1 handles stride-1 only (policy gates this)"
    n, h, wdt, c = x.shape
    kh, kw, wc, oc = w.shape
    assert wc == c
    py, px = pad
    oh = h + 2 * py - kh + 1
    ow = wdt + 2 * px - kw + 1
    boy, boc = blocks.boy, blocks.boc
    r = cdiv(oh, boy)
    xr = boy + kh - 1  # halo rows per block
    # zero-pad: spatial pad + extra bottom rows so the last block's halo reads
    # stay in bounds, + lane padding of C to 128 not needed (C is contraction)
    pad_bottom = (r - 1) * boy + xr - (h + py)
    xp = jnp.pad(x, ((0, 0), (py, max(pad_bottom, 0)), (px, px), (0, 0)))
    pw = xp.shape[2]
    # gather halo'd row blocks: (N, R, XR, PW, C) -> (N*R, XR, PW, C)
    row_idx = (jnp.arange(r)[:, None] * boy + jnp.arange(xr)[None, :])  # (R, XR)
    xg = xp[:, row_idx]  # (N, R, XR, PW, C)
    xg = xg.reshape(n * r, xr, pw, c)
    ocp = round_up(oc, 128)
    boc = min(boc, ocp)
    # grid is ocp // boc: boc must divide ocp or trailing channels would
    # never be written (uninitialized output). Shrink to the largest
    # 128-multiple divisor (boc and ocp are both 128-multiples, so 128
    # always terminates the loop).
    while ocp % boc:
        boc -= 128
    if ocp != oc:
        w = jnp.pad(w, ((0, 0), (0, 0), (0, 0), (0, ocp - oc)))
        bias = jnp.pad(bias, (0, ocp - oc))
    bias2d = bias.reshape(1, ocp)

    out = pl.pallas_call(
        functools.partial(_conv_kernel, kh=kh, kw=kw, boy=boy, ow=ow,
                          precision=PRECISIONS[precision], relu=relu),
        grid=(n * r, ocp // boc),
        in_specs=[
            pl.BlockSpec((1, xr, pw, c), lambda i, j: (i, 0, 0, 0)),
            pl.BlockSpec((kh, kw, c, boc), lambda i, j: (0, 0, 0, j)),
            pl.BlockSpec((1, boc), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((1, boy, ow, boc), lambda i, j: (i, 0, 0, j)),
        out_shape=jax.ShapeDtypeStruct((n * r, boy, ow, ocp), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * oh * ow * oc * kh * kw * c,
            bytes_accessed=int(xg.size * xg.dtype.itemsize
                               + w.size * w.dtype.itemsize
                               + n * oh * ow * ocp * x.dtype.itemsize),
            transcendentals=0),
        interpret=interpret,
    )(xg, w, bias2d)
    out = out.reshape(n, r * boy, ow, ocp)
    return out[:, :oh, :, :oc]


def space_to_depth_conv(x, w, bias, *, stride, pad, relu, tune,
                        precision: str = "highest", interpret: bool = False):
    """Strided conv via space-to-depth: fold the stride into the channel dim
    so the Pallas stride-1 kernel applies (the classic TPU conv1 transform;
    plays the role of the reference's strided tconv variant).

    x (N,H,W,C), w (KH,KW,C,OC), stride (s,s) -> equivalent stride-1 conv on
    x' (N,H/s,W/s,C*s*s) with w' (ceil(KH/s),ceil(KW/s),C*s*s,OC)."""
    sy, sx = stride
    n, h, wd, c = x.shape
    kh, kw, _, oc = w.shape
    py, px = pad
    oh = (h + 2 * py - kh) // sy + 1
    ow = (wd + 2 * px - kw) // sx + 1
    khp = cdiv(kh, sy)
    kwp = cdiv(kw, sx)
    # pad: conv padding + bottom/right so the folded view covers all taps
    need_h = (oh - 1 + (khp - 1)) * sy + sy
    need_w = (ow - 1 + (kwp - 1)) * sx + sx
    xp = jnp.pad(x, ((0, 0), (py, max(0, need_h - h - py)),
                     (px, max(0, need_w - wd - px)), (0, 0)))
    hp, wp = xp.shape[1], xp.shape[2]
    hp -= hp % sy
    wp -= wp % sx
    xp = xp[:, :hp, :wp, :]
    xs = xp.reshape(n, hp // sy, sy, wp // sx, sx, c) \
           .transpose(0, 1, 3, 2, 4, 5).reshape(n, hp // sy, wp // sx,
                                                sy * sx * c)
    # fold the kernel: w'[ky',kx',(py,px,c),oc] = w[ky'*s+py, kx'*s+px, c, oc]
    wz = jnp.zeros((khp * sy, kwp * sx, c, oc), w.dtype)
    wz = wz.at[:kh, :kw].set(w)
    wf = wz.reshape(khp, sy, kwp, sx, c, oc).transpose(0, 2, 1, 3, 4, 5) \
           .reshape(khp, kwp, sy * sx * c, oc)
    from ...utils.dims import Dims
    ind = Dims.of(img=n, chan=sy * sx * c, y=xs.shape[1], x=xs.shape[2],
                  tn=str(x.dtype))
    fd = Dims.of(out_chan=oc, in_chan=sy * sx * c, y=khp, x=kwp)
    od = Dims.of(img=n, chan=oc, y=oh, x=ow)
    blocks = conv_blocks(ind, fd, od, tune)
    if blocks is not None:
        out = pallas_conv2d_nhwc(xs, wf, bias, stride=(1, 1), pad=(0, 0),
                                 relu=relu, blocks=blocks, precision=precision,
                                 interpret=interpret)
    else:  # folded shapes too big for VMEM blocking: stock XLA on the fold
        from jax import lax
        out = lax.conv_general_dilated(
            xs, wf, window_strides=(1, 1), padding=[(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=PRECISIONS[precision],
            preferred_element_type=jnp.float32)
        out = out + bias.reshape(1, 1, 1, -1)
        if relu:
            out = jnp.maximum(out, 0.0)
        out = out.astype(x.dtype)
    return out[:, :oh, :ow, :]


# -- standalone rtc-layer conv op -----------------------------------------------------
# signature: (type=conv,stride=S,pad=P,in=(img,chan,y,x),filts=(out_chan,in_chan,y,x),
#             biases=(out_chan),out=(img,chan,y,x))  [NCHW names; ref conv.cucl]

@kernel_gen("conv")
def gen_conv(op: Op, tune: OpTune, ctx: GenCtx) -> FuncInfo:
    import jax.numpy as jnp
    from jax import lax
    ind, fd, od = op.dims("in"), op.dims("filts"), op.dims("out")
    s = (op.ival("stride", 1), op.ival("stride", 1))
    p = (op.ival("pad", 0), op.ival("pad", 0))
    relu = op.ival("relu", 0)
    kh, kw = fd["y"], fd["x"]
    flops = 2.0 * od.num_elems() * fd["in_chan"] * kh * kw
    byts = float(ind.bytes_sz() + fd.bytes_sz() + od.bytes_sz())
    use_pallas = (not ctx.use_ref and not tune.use_xla and s == (1, 1))
    blocks = conv_blocks(ind, fd, od, tune) if use_pallas else None
    use_s2d = (not ctx.use_ref and not tune.use_xla and tune.use_s2d
               and s != (1, 1))

    if blocks is not None:
        def fn(x, w, b):
            xh = x.transpose(0, 2, 3, 1)
            wh = w.transpose(2, 3, 1, 0)
            out = pallas_conv2d_nhwc(xh, wh, b, stride=s, pad=p, relu=bool(relu),
                                     blocks=blocks, precision=tune.precision,
                                     interpret=ctx.interpret)
            return out.transpose(0, 3, 1, 2)
        info = f"pallas_conv {blocks}"
    elif use_s2d:
        def fn(x, w, b):
            xh = x.transpose(0, 2, 3, 1)
            wh = w.transpose(2, 3, 1, 0)
            out = space_to_depth_conv(xh, wh, b, stride=s, pad=p,
                                      relu=bool(relu), tune=tune,
                                      precision=tune.precision,
                                      interpret=ctx.interpret)
            return out.transpose(0, 3, 1, 2)
        info = f"s2d_conv s={s}"
    else:
        prec = PRECISIONS[tune.precision if not ctx.use_ref else "highest"]

        def fn(x, w, b):
            out = lax.conv_general_dilated(
                x, w, window_strides=s, padding=[(p[0], p[0]), (p[1], p[1])],
                dimension_numbers=("NCHW", "OIHW", "NCHW"), precision=prec,
                preferred_element_type=jnp.float32)
            out = out + b.reshape(1, -1, 1, 1)
            if relu:
                out = jnp.maximum(out, 0.0)
            return out.astype(x.dtype)
        info = "xla_conv" + (" (ref)" if ctx.use_ref else "")

    return FuncInfo(name="", args=[("in", "in"), ("filts", "in"),
                                   ("biases", "in"), ("out", "out")],
                    fn=fn, flops=flops, bytes_accessed=byts, info=info,
                    in_dims=[ind, fd, Dims.of(out_chan=fd["out_chan"], tn=ind.tn)])
