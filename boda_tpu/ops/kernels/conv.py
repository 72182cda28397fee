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


# -- v2: halo-window direct conv (no host-side gather) -------------------------------
#
# The v1 kernel above gathers halo'd row blocks host-side, materializing a
# duplicated (N*R, XR, PW, C) tensor in HBM (an extra full read+write of the
# input per conv). v2 keeps the input in HBM (memory_space=ANY) and streams
# overlapping row windows into a double-buffered VMEM scratch with manual
# async DMAs — the TPU analog of the reference tconv's in-kernel overlapped
# line reads (ref test/rtc/tconv.cucl + cnn_codegen.cc:763).
#
# Mosaic constraints discovered by on-hardware probing (v5e, 2026-08):
#   * DMA destinations must be FULL rows of the scratch (any partial-width or
#     sub-lane-tile destination slice crashes the Mosaic backend), AND the
#     row width must be a sublane-tile multiple (w % 8; w=28 crashes the
#     compiler, w=56 works). The input is therefore host-side width-padded
#     to wp = round_up(w + 2*px, 8) with the column padding folded in —
#     a cheap fusable pad, O(input), unlike v1's O(kh x input) row gather.
#     With pre-padded columns every tap is full-width (no per-tap column
#     bounds; value .at[].add would lower to unsupported scatter-add anyway).
#   * The scratch minor dim must be a 128 multiple => c % 128 == 0 here;
#     c < 128 shapes keep using the v1 gather kernel.
#   * Strided row/col access on values lowers to unsupported gathers; the
#     stride is instead expressed as reshape-to-(rows//s, s, ...) + static
#     index, which compiles for f32 but crashes for bf16 => strided convs
#     take this path only for f32.
#   * Un-DMA'd buffer rows (top/bottom halo at image edges) hold stale data
#     and are masked with iota row compares.
#   * Large row blocks (boy=28, 9 unrolled taps of ~800KB f32 temps) abort
#     the Mosaic compiler — per-tap value size is capped (_HALO_TEMP_CAP).


ANY_SPACE = getattr(pl, "ANY", None) or pltpu.ANY

# per-tap f32 value cap (boy*wp*boc*4): boy=28 blocks (~800KB/tap) abort the
# Mosaic compiler; 229KB blocks compile+run. Probed ceiling between.
_HALO_TEMP_CAP = 300 * 1024


@dataclass(frozen=True)
class HaloBlocks:
    boy: int        # output rows per block
    boc: int        # output-channel block (<=128 exact, else 128-multiple)
    jn: int         # number of oc blocks (ocp // boc)
    xr: int         # input rows per window = (boy-1)*sy + kh
    xrp: int        # buffer rows: xr padded to a stride multiple
    r: int          # row blocks per image = ceil(oh / boy)
    wp: int         # width after folding column pad + rounding to 8
    owp: int        # kernel output width from wp (>= ow; sliced after)
    nb: int = 1     # images per block (r==1 stride-1 only; lifts matmul M)
    kxb: bool = False  # kx-shifted tap-cat buffers (sub-32-bit deep-K path)

    def __str__(self):
        return f"boy={self.boy} boc={self.boc}x{self.jn}" + \
            (f" nb={self.nb}" if self.nb > 1 else "") + \
            (" kxb" if self.kxb else "")


def conv_halo_blocks(ind: Dims, fd: Dims, od: Dims, stride, pad,
                     tune: OpTune) -> HaloBlocks | None:
    """Feasibility + block choice for the halo-window conv (gbt_tile analog,
    ref gbt_tile.H:24: waste-aware block selection under a memory budget)."""
    kh, kw = fd["y"], fd["x"]
    c, oc = fd["in_chan"], fd["out_chan"]
    oh, ow = od["y"], od["x"]
    h, w = ind["y"], ind["x"]
    sy, sx = stride
    py, px = pad
    if c % 128 != 0:  # Mosaic: DMA-able scratch needs a 128-multiple minor dim
        return None
    if kh == 1 and kw == 1 and sy == 1 and sx == 1:
        return None  # k1conv (matmul) path is better
    is_f32 = ind.tn == "float32"
    if (sy, sx) != (1, 1) and not is_f32:
        return None  # bf16 strided reshape-trick crashes Mosaic (see header)
    itemsize = 4 if is_f32 else 2
    # kx-buffered tap_cat (kxb): the sub-32-bit deep-K form. The roll-based
    # tap_cat is 32-bit only (Mosaic: no sub-32-bit dynamic_rotate, and bf16
    # packed-layout concat hits sublane-offset mismatches). kxb sidesteps
    # both: the kw column shifts happen in the DMA *source* slices (one
    # shifted VMEM buffer per kx; destinations stay full rows), and only
    # ky-slices — which share sublane offsets — are concatenated in-kernel.
    kxb = bool(tune.tap_cat) and (sy, sx) == (1, 1) and itemsize == 2
    if kxb:
        owp = round_up(ow, 8)              # per-kx buffer width (8-multiple)
        wp = round_up(max(w + 2 * px, kw - 1 + owp), 8)  # src slices in range
    else:
        wp = round_up(w + 2 * px, 8)   # folded column pad (see module header)
        wp = round_up(wp, sx * 8) if sx > 1 else wp  # stride reshape: wp%sx==0
        owp = (wp - kw) // sx + 1
    if owp < ow:
        return None  # cannot happen (wp >= w + 2*px), defensive
    # oc <= 128 (f32): exact sub-128 lane block — no channel padding, no
    # output slice copy (validated f32-only on hardware)
    ocp = oc if (oc <= 128 and is_f32) else round_up(oc, 128)
    # row-block candidates: divisors of oh first (no masked-tail waste),
    # then non-divisors, both descending
    cands = [tune.chunk] if tune.chunk else sorted(
        (b for b in (64, 56, 32, 28, 16, 14, 8, 7, 4, 2, 1) if b <= oh),
        key=lambda b: (oh % b != 0, -b))
    n = ind["img"]
    for boy in cands:
        boy = min(boy, oh)
        r = cdiv(oh, boy)
        xr = (boy - 1) * sy + kh
        xrp = cdiv(xr, sy) * sy
        # DMA-variant feasibility (see _halo_dma_variants): interior windows
        # fully in-bounds, top window fits, bottom overrun smaller than xr
        bz = max(0, (r - 1) * boy * sy - py + xr - h)
        if r > 1 and (boy * sy < py or xr - py > h or bz >= xr):
            continue
        if r > 2 and (r - 2) * boy * sy - py + xr > h:
            continue
        # image-batch blocking (nb): with one row-block per image (r==1,
        # small spatial) the per-tap matmul has only boy*wp rows — well
        # under the 128-row MXU pass (e.g. 7x7: M=56). Stacking nb images
        # per grid step multiplies M. Measured on v5e (scripts/exp_nb.py,
        # 2026-08): batching forces boc to shrink to fit VMEM and the
        # full-width oc block matters MORE than matmul M (nb_auto 115 vs
        # nb1 120 TF/s @14x14x256; 62 vs 69 @7x7x512) — so nb is OFF by
        # default and only applied when a tune/wisdom entry forces it
        # (stride-1, r==1, no tap_cat; keeps the DMA one contiguous
        # multi-image copy).
        nb_ok = r == 1 and (sy, sx) == (1, 1) and not tune.tap_cat
        if tune.nb > 1 and nb_ok and n % tune.nb == 0:
            nbs = [tune.nb]
        else:
            nbs = [1]
        for nb in nbs:
            x_blk = (kw * xr * owp if kxb else nb * xrp * wp) * c * itemsize
            for boc in (ocp, *range(((ocp // 128) - 1) * 128, 0, -128)):
                if ocp % boc:
                    continue
                acc_sz = (boy * owp if kxb else nb * boy * wp) * boc * 4
                if acc_sz > _HALO_TEMP_CAP:
                    continue  # Mosaic aborts on huge unrolled values
                jn = ocp // boc
                w_blk = kh * kw * c * boc * itemsize
                out_blk = nb * boy * owp * boc * itemsize
                if kxb:
                    # gathered (boy*owp, kh*kw*c) operand + the f32 acc
                    z_tmp = boy * owp * (kh * kw * c * itemsize + boc * 4)
                else:
                    # per-tap f32 temps
                    z_tmp = nb * (boy * wp * boc + boy * owp * boc) * 4
                    if tune.tap_cat and (sy, sx) == (1, 1) and itemsize == 4:
                        # roll-based tap_cat: gathered operand lives alongside
                        z_tmp += boy * owp * kh * kw * c * itemsize
                if 2 * x_blk + 2 * w_blk + 2 * out_blk + z_tmp <= _VMEM_BUDGET:
                    return HaloBlocks(boy=boy, boc=boc, jn=jn, xr=xr, xrp=xrp,
                                      r=r, wp=wp, owp=owp, nb=nb, kxb=kxb)
    return None


def _halo_dma_variants(x_hbm, xbuf, sem, tt, slot, *, r, boy, sy, py, xr, h,
                       bz, action):
    """Issue (action='start') or complete (action='wait') the row-window DMA
    for grid row-step `tt` into buffer `slot`. Statically-sized full-row copy
    variants (top / bottom / interior) selected by pl.when — DMA slice sizes
    must be static, and pl.when traces BOTH branches, so statically-impossible
    variants must not be emitted at all."""
    n = tt // r
    i = jax.lax.rem(tt, r)
    start = i * boy * sy - py

    def go(src_lo, n_rows, dst_lo):
        cp = pltpu.make_async_copy(
            x_hbm.at[n, pl.ds(src_lo, n_rows)],
            xbuf.at[slot, pl.ds(dst_lo, n_rows)],
            sem.at[slot])
        cp.start() if action == "start" else cp.wait()

    if r == 1:  # single block: top and bottom clipping combined
        go(0, min(xr - py, h), py)
        return

    @pl.when(i == 0)
    def _top():
        go(0, min(xr - py, h), py)

    if bz > 0:
        @pl.when(i == r - 1)
        def _bot():
            go(start, xr - bz, 0)

        if r > 2:
            @pl.when((i > 0) & (i < r - 1))
            def _mid():
                go(start, xr, 0)
    else:
        @pl.when(i > 0)
        def _mid():
            go(start, xr, 0)


def _halo_dma_kx(x_hbm, xbuf, sem, tt, slot, *, kw, owp, r, boy, py, xr, h,
                 bz, action):
    """kx-shifted row-window DMAs (kxb tap_cat, stride-1): kw copies per
    window, one per filter column, each reading the column slice
    [kx, kx+owp) of the padded input into its own full-row buffer
    xbuf[slot, kx]. Destinations are full rows (the Mosaic constraint);
    the column shift lives entirely in the *source* slice."""
    n = tt // r
    i = jax.lax.rem(tt, r)
    start = i * boy - py

    def go(src_lo, n_rows, dst_lo):
        for kx in range(kw):
            cp = pltpu.make_async_copy(
                x_hbm.at[n, pl.ds(src_lo, n_rows), pl.ds(kx, owp)],
                xbuf.at[slot, kx, pl.ds(dst_lo, n_rows)],
                sem.at[slot, kx])
            cp.start() if action == "start" else cp.wait()

    if r == 1:  # single block: top and bottom clipping combined
        go(0, min(xr - py, h), py)
        return

    @pl.when(i == 0)
    def _top():
        go(0, min(xr - py, h), py)

    if bz > 0:
        @pl.when(i == r - 1)
        def _bot():
            go(start, xr - bz, 0)

        if r > 2:
            @pl.when((i > 0) & (i < r - 1))
            def _mid():
                go(start, xr, 0)
    else:
        @pl.when(i > 0)
        def _mid():
            go(start, xr, 0)


def _halo_dma_nb(x_hbm, xbuf, sem, tt, slot, *, nb, py, xr, h, action):
    """Multi-image window DMA (r==1 only): one contiguous copy of the full
    (clipped) row window of `nb` consecutive images into the batched buffer."""
    n_rows = min(xr - py, h)
    cp = pltpu.make_async_copy(
        x_hbm.at[pl.ds(tt * nb, nb), pl.ds(0, n_rows)],
        xbuf.at[slot, :, pl.ds(py, n_rows)],
        sem.at[slot])
    cp.start() if action == "start" else cp.wait()


def _conv_halo_kernel(x_hbm, w_ref, b_ref, *rest, kh, kw, sy, sx, boy, owp,
                      py, h, wp, r, n_t, bz, xrp, precision, relu, has_res,
                      tap_cat=False, nb=1, kxb=False):
    if has_res:
        res_ref, o_ref, xbuf, sem = rest
    else:
        o_ref, xbuf, sem = rest
    c = xbuf.shape[-1]
    boc = o_ref.shape[-1]
    t = pl.program_id(0)
    j = pl.program_id(1)
    i = jax.lax.rem(t, r)
    slot = jax.lax.rem(t, 2)
    if kxb:
        dma_kw = dict(kw=kw, owp=owp, r=r, boy=boy, py=py,
                      xr=(boy - 1) * sy + kh, h=h, bz=bz)
        dma = _halo_dma_kx
    elif nb > 1:
        dma_kw = dict(nb=nb, py=py, xr=(boy - 1) * sy + kh, h=h)
        dma = _halo_dma_nb
    else:
        dma_kw = dict(r=r, boy=boy, sy=sy, py=py, xr=(boy - 1) * sy + kh, h=h,
                      bz=bz)
        dma = _halo_dma_variants

    @pl.when(j == 0)
    def _dma():
        @pl.when(t == 0)
        def _():
            dma(x_hbm, xbuf, sem, t, slot, action="start", **dma_kw)

        @pl.when(t + 1 < n_t)
        def _():
            dma(x_hbm, xbuf, sem, t + 1,
                jax.lax.rem(t + 1, 2), action="start", **dma_kw)

        dma(x_hbm, xbuf, sem, t, slot, action="wait", **dma_kw)

    if nb > 1:
        # batched-image path (r==1, stride-1, no tap_cat — gated in blocks):
        # per-tap dot M = nb*boy*wp rows (vs boy*wp unbatched)
        acc = jnp.zeros((nb, boy, owp, boc), jnp.float32)
        for ky in range(kh):
            xk = xbuf[slot][:, ky:ky + boy]  # (nb, boy, wp, c)
            rows = jax.lax.broadcasted_iota(jnp.int32, (1, boy, wp, 1), 1) + ky
            xk = jnp.where((rows >= py) & (rows < py + h), xk,
                           jnp.zeros((), xk.dtype))
            xk2 = xk.reshape(nb * boy * wp, c)
            for kx in range(kw):
                z = jnp.dot(xk2, w_ref[ky, kx],
                            preferred_element_type=jnp.float32,
                            precision=precision)
                acc = acc + z.reshape(nb, boy, wp, boc)[:, :, kx:kx + owp, :]
        acc = acc + b_ref[0].astype(jnp.float32)
        if has_res:
            acc = acc + res_ref[...].astype(jnp.float32)
        if relu:
            acc = jnp.maximum(acc, 0.0)
        o_ref[...] = acc.astype(o_ref.dtype)
        return

    if kxb:
        # kx-buffered deep-K form (stride-1, sub-32-bit; gated in blocks):
        # each xbuf[slot, kx] already holds the kx-shifted window at column
        # offset 0 (the DMA sources did the shifting), so only ky row-slices
        # — which share sublane offsets and therefore concatenate cleanly —
        # are gathered here, into one (boy*owp, kh*kw*c) operand for a
        # single deep-K MXU pass (same insight as tap_cat below, without
        # the sub-32-bit rotate Mosaic cannot compile).
        base0 = i * boy
        views = []
        for ky in range(kh):
            rows = jax.lax.broadcasted_iota(jnp.int32, (boy, owp, 1), 0) \
                + base0 + ky
            m = (rows >= py) & (rows < py + h)
            for kx in range(kw):
                xk = xbuf[slot, kx, ky:ky + boy]
                views.append(jnp.where(m, xk, jnp.zeros((), xk.dtype)))
        xcat = jnp.concatenate(views, axis=2).reshape(boy * owp, kh * kw * c)
        wcat = w_ref[:].reshape(kh * kw * c, boc)
        acc = jnp.dot(xcat, wcat, preferred_element_type=jnp.float32,
                      precision=precision).reshape(boy, owp, boc)
        acc = acc + b_ref[0].astype(jnp.float32)
        if has_res:
            acc = acc + res_ref[0].astype(jnp.float32)
        if relu:
            acc = jnp.maximum(acc, 0.0)
        o_ref[0] = acc.astype(o_ref.dtype)
        return
    acc = jnp.zeros((boy, owp, boc), jnp.float32)
    base = i * boy * sy
    if tap_cat:
        # tap-concatenated deep-K form (stride-1 only, gated in blocks):
        # gather all kh*kw shifted views into one (boy*owp, kh*kw*c) operand
        # and run ONE matmul. kh*kw separate K=c dots each pay the MXU
        # pipeline fill (~K cycles) and per-tap shift/add layout ops; a
        # single K=kh*kw*c pass amortizes both (the TPU analog of the
        # reference k1conv's "convert conv to one big GEMM" insight,
        # cnn_codegen.cc:165 — here per-block in VMEM, not via im2col in HBM).
        views = []
        for ky in range(kh):
            xk = xbuf[slot, ky:ky + boy]
            rows = jax.lax.broadcasted_iota(jnp.int32, (boy, wp, 1), 0) \
                + base + ky
            xk = jnp.where((rows >= py) & (rows < py + h), xk,
                           jnp.zeros((), xk.dtype))
            # Mosaic cannot concatenate views with mismatched sublane
            # offsets ("result/input offset mismatch on non-concat
            # dimension"), so plain shifted slices xk[:, kx:kx+owp] fail to
            # compile. Roll-then-slice realigns each view to offset 0 (no
            # wraparound reaches the kept columns: q+kx < wp for q < owp).
            # tpu.dynamic_rotate is unimplemented for sub-32-bit data, so
            # tap_cat is gated to 32-bit dtypes (pallas_conv2d_halo).
            for kx in range(kw):
                xs = pltpu.roll(xk, wp - kx, 1) if kx else xk
                views.append(xs[:, :owp, :])
        xcat = jnp.concatenate(views, axis=2).reshape(boy * owp, kh * kw * c)
        wcat = w_ref[:].reshape(kh * kw * c, boc)
        acc = jnp.dot(xcat, wcat, preferred_element_type=jnp.float32,
                      precision=precision).reshape(boy, owp, boc)
        acc = acc + b_ref[0].astype(jnp.float32)
        if has_res:
            acc = acc + res_ref[0].astype(jnp.float32)
        if relu:
            acc = jnp.maximum(acc, 0.0)
        o_ref[0] = acc.astype(o_ref.dtype)
        return
    for ky in range(kh):
        if sy > 1:  # stride as reshape + static index (no strided slicing)
            xv4 = xbuf[slot].reshape(xrp // sy, sy, wp, c)
            xk = xv4[ky // sy:ky // sy + boy, ky % sy]
        else:
            xk = xbuf[slot, ky:ky + boy]
        # mask rows whose padded coordinate falls outside [py, py+h):
        # un-DMA'd buffer rows hold stale data
        rows = jax.lax.broadcasted_iota(jnp.int32, (boy, wp, 1), 0) * sy \
            + base + ky
        xk = jnp.where((rows >= py) & (rows < py + h), xk,
                       jnp.zeros((), xk.dtype))
        xk2 = xk.reshape(boy * wp, c)  # contiguous collapse (layout-free)
        for kx in range(kw):
            # columns are pre-padded host-side: every tap is full width;
            # output col q reads input col q*sx + kx, always in [0, wp)
            z = jnp.dot(xk2, w_ref[ky, kx], preferred_element_type=jnp.float32,
                        precision=precision)
            z3 = z.reshape(boy, wp, boc)
            if sx > 1:
                s_lo = kx
                if s_lo % sx:  # shift so wanted cols are stride-aligned
                    sh = s_lo % sx
                    z3 = jnp.pad(z3[:, sh:, :], ((0, 0), (0, sh), (0, 0)))
                    s_lo -= sh
                z4 = z3.reshape(boy, wp // sx, sx, boc)
                zs = z4[:, s_lo // sx:s_lo // sx + owp, 0]
            else:
                zs = z3[:, kx:kx + owp, :]
            acc = acc + zs
    acc = acc + b_ref[0].astype(jnp.float32)
    if has_res:
        acc = acc + res_ref[0].astype(jnp.float32)
    if relu:
        acc = jnp.maximum(acc, 0.0)
    o_ref[0] = acc.astype(o_ref.dtype)


def pallas_conv2d_halo(x, wt, bias, *, stride=(1, 1), pad=(0, 0),
                       relu: bool = False, hb: HaloBlocks,
                       precision: str = "highest", interpret: bool = False,
                       residual=None, tap_cat: bool = False):
    """x (N,H,W,C) * wt (KH,KW,C,OC) + bias [+ residual (N,OH,OW,OC)] ->
    (N,OH,OW,OC). Direct conv with manual-DMA halo row streaming and fused
    bias(+residual)+ReLU store."""
    n, h, w, c = x.shape
    kh, kw, wc, oc = wt.shape
    assert wc == c, (wt.shape, x.shape)
    sy, sx = stride
    py, px = pad
    oh = (h + 2 * py - kh) // sy + 1
    ow = (w + 2 * px - kw) // sx + 1
    boy, boc, jn, xrp, r = hb.boy, hb.boc, hb.jn, hb.xrp, hb.r
    wp, owp, nb = hb.wp, hb.owp, hb.nb
    assert nb == 1 or (r == 1 and (sy, sx) == (1, 1) and n % nb == 0), hb
    # fold the column pad host-side (cheap fusable O(input) pad; Mosaic DMA
    # rows must be 8-multiples — see module header). Rows stay unpadded.
    x = jnp.pad(x, ((0, 0), (0, 0), (px, wp - w - px), (0, 0)))
    ocp = boc * jn
    if ocp != oc:
        wt = jnp.pad(wt, ((0, 0), (0, 0), (0, 0), (0, ocp - oc)))
        bias = jnp.pad(bias, (0, ocp - oc))
    bias2d = bias.reshape(1, ocp)
    ohp = r * boy
    n_t = (n // nb) * r
    bz = max(0, (r - 1) * boy * sy - py + hb.xr - h)  # last-block row overrun
    if nb > 1:  # batched-image blocks: r==1, so the row index is always 0
        io_spec = pl.BlockSpec((nb, boy, owp, boc), lambda t, j: (t, 0, 0, j))
    else:
        io_spec = pl.BlockSpec((1, boy, owp, boc),
                               lambda t, j: (t // r, t % r, 0, j))

    in_specs = [
        pl.BlockSpec(memory_space=ANY_SPACE),
        pl.BlockSpec((kh, kw, c, boc), lambda t, j: (0, 0, 0, j)),
        pl.BlockSpec((1, boc), lambda t, j: (0, j)),
    ]
    args = [x, wt, bias2d]
    if residual is not None:
        if ocp != oc:
            residual = jnp.pad(residual, ((0, 0), (0, 0), (0, 0), (0, ocp - oc)))
        if owp != ow:
            residual = jnp.pad(residual, ((0, 0), (0, 0), (0, owp - ow), (0, 0)))
        in_specs.append(io_spec)
        args.append(residual)

    if hb.kxb:
        scratch = [pltpu.VMEM((2, kw, hb.xr, owp, c), x.dtype),
                   pltpu.SemaphoreType.DMA((2, kw))]
    elif nb > 1:
        scratch = [pltpu.VMEM((2, nb, xrp, wp, c), x.dtype),
                   pltpu.SemaphoreType.DMA((2,))]
    else:
        scratch = [pltpu.VMEM((2, xrp, wp, c), x.dtype),
                   pltpu.SemaphoreType.DMA((2,))]
    out = pl.pallas_call(
        functools.partial(
            _conv_halo_kernel, kh=kh, kw=kw, sy=sy, sx=sx, boy=boy, owp=owp,
            py=py, h=h, wp=wp, r=r, n_t=n_t, bz=bz, xrp=xrp,
            precision=PRECISIONS[precision],
            relu=relu, has_res=residual is not None,
            # roll-based tap_cat: stride-1, 32-bit only (Mosaic: no
            # sub-32-bit rotate, and bf16 packed-layout concat hits the
            # offset-mismatch error); sub-32-bit takes the kxb form instead
            tap_cat=(tap_cat and (sy, sx) == (1, 1) and not hb.kxb
                     and jnp.dtype(x.dtype).itemsize == 4),
            nb=nb, kxb=hb.kxb),
        grid=(n_t, jn),
        in_specs=in_specs,
        out_specs=io_spec,
        out_shape=jax.ShapeDtypeStruct((n, ohp, owp, ocp), x.dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * oh * ow * ocp * kh * kw * c,
            bytes_accessed=int(n * h * wp * c * x.dtype.itemsize
                               + wt.size * wt.dtype.itemsize
                               + n * oh * ow * ocp * x.dtype.itemsize),
            transcendentals=0),
        interpret=interpret,
    )(*args)
    if ohp != oh or ocp != oc or owp != ow:
        out = out[:, :oh, :ow, :oc]
    return out


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
    gen_ok = not ctx.use_ref and not tune.use_xla
    halo_on = tune.use_halo == 1 or (tune.use_halo == -1 and not ctx.interpret)
    hb = conv_halo_blocks(ind, fd, od, s, p, tune) \
        if gen_ok and halo_on else None
    use_pallas = gen_ok and s == (1, 1) and hb is None
    blocks = conv_blocks(ind, fd, od, tune) if use_pallas else None
    use_s2d = (gen_ok and tune.use_s2d and s != (1, 1) and hb is None)

    if hb is not None:
        def fn(x, w, b):
            xh = x.transpose(0, 2, 3, 1)
            wh = w.transpose(2, 3, 1, 0)
            out = pallas_conv2d_halo(xh, wh, b, stride=s, pad=p,
                                     relu=bool(relu), hb=hb,
                                     precision=tune.precision,
                                     interpret=ctx.interpret)
            return out.transpose(0, 3, 1, 2)
        info = f"halo_conv {hb} s={s}"
    elif blocks is not None:
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
