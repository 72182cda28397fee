"""NHWC-native lowering: the TPU-optimal layout path for the Pallas engine.

The reference handles layout by materializing transpose vars and propagating
"write-xposed" output formats between its k1conv kernels (ref rtc_fwd.cc
:495-503, xpose*.cucl). The TPU-native equivalent: run the WHOLE net in NHWC
(channels on the 128-lane axis) — activations are transposed once at the net
input, conv weights are pre-transposed at upload time, and every op lowers to
an NHWC rule, so no transposes exist between layers at all.

Activations here are physically (img, y, x, chan) while node Dims remain
logically named NCHW; the executor transposes requested outputs back so all
digests/comparisons are layout-independent.

Each rule returns (fn, weight_preps) where weight_preps maps weight-node name
-> (prep, inv): a one-time transform applied at weight upload, and its
inverse (used to convert weight-GRADIENT values back to the logical layout).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax

from ..utils.dims import stable_hash
from .lowering import PRECISIONS, LowerCtx, _softmax
from .pipe import ConvOp, ConvPipe, PipeError

_NHWC_RULES: dict[str, Callable] = {}


def nhwc_rule(op_type: str):
    def deco(fn):
        _NHWC_RULES[op_type] = fn
        return fn
    return deco


def has_nhwc_rule(op_type: str) -> bool:
    return op_type in _NHWC_RULES


def lower_op_nhwc(pipe: ConvPipe, op: ConvOp, ctx: LowerCtx, tune,
                  info_log: list[str]):
    """Returns (fn, weight_preps) or None if no NHWC rule exists."""
    rule = _NHWC_RULES.get(op.type)
    if rule is None:
        return None
    return rule(pipe, op, ctx, tune, info_log)


def _no_preps(fn):
    return fn, {}


def stem_s2d_geom(ind, od, s, p, k, dil, groups):
    """Geometry of the stem space-to-depth fold, or None when the conv does
    not qualify (shared by the Convolution rule and PallasFwd.input_s2d's
    host-side fold). Conditions: square stride>1/kernel>1, no dilation or
    groups, starved in_chan (C*s*s <= 64), and non-negative right-pad (a
    negative right-pad means floor division discards input tail rows)."""
    sb, kk = s[0], k[0]
    m = -(-kk // sb)                        # taps per axis after the fold
    pad_r_y = sb * (od["y"] + m - 1) - ind["y"] - p[0]
    pad_r_x = sb * (od["x"] + m - 1) - ind["x"] - p[1]
    if not (groups == 1 and dil == (1, 1) and s[0] == s[1] > 1
            and k[0] == k[1] > 1 and ind["chan"] * s[0] * s[1] <= 64
            and pad_r_y >= 0 and pad_r_x >= 0):
        return None
    return {"sb": sb, "kk": kk, "m": m, "pad": (p[0], p[1]),
            "pad_r": (pad_r_y, pad_r_x), "xs_h": od["y"] + m - 1,
            "xs_w": od["x"] + m - 1, "cin": ind["chan"]}


def host_stem_s2d(x_nhwc, geom):
    """Numpy host-side fold of an NHWC batch into the stem_s2d input layout
    (N, xs_h, xs_w, sb*sb*C) — identical math to the in-jit fold in the
    Convolution rule, run once at load time by the data loader instead of
    per-forward on the device."""
    import numpy as np
    sb, cin = geom["sb"], geom["cin"]
    (p0, p1), (pry, prx) = geom["pad"], geom["pad_r"]
    xs_h, xs_w = geom["xs_h"], geom["xs_w"]
    xp = np.pad(x_nhwc, ((0, 0), (p0, pry), (p1, prx), (0, 0)))
    xsd = xp.reshape(x_nhwc.shape[0], xs_h, sb, xs_w, sb, cin)
    return np.ascontiguousarray(
        xsd.transpose(0, 1, 3, 2, 4, 5).reshape(
            x_nhwc.shape[0], xs_h, xs_w, sb * sb * cin))


# -- conv ------------------------------------------------------------------------

@nhwc_rule("Convolution")
def _nhwc_conv(pipe, op, ctx, tune, info_log):
    from ..ops.cnn_variants import ctx_interp
    from ..ops.kernels.conv import conv_blocks, pallas_conv2d_nhwc
    from ..ops.kernels.sgemm import pallas_matmul, pick_matmul_blocks
    s, p = op.stride(), op.pad()
    k = op.kern_sz()
    dil = op.dilation()
    groups = int(op.p("groups", 1))
    relu = bool(op.p("fused_relu", False))
    ind = pipe.must_dims(op.bots[0])
    fd = pipe.must_dims(op.bots[1])
    od = pipe.must_dims(op.tops[0])
    preps = {op.bots[1]: (lambda w: w.transpose(2, 3, 1, 0),      # OIHW->HWIO
                          lambda g: g.transpose(3, 2, 0, 1))}    # HWIO->OIHW

    if dil != (1, 1):  # atrous conv (SSD fc6): XLA path only for now
        import dataclasses
        tune = dataclasses.replace(tune, use_xla=True)

    # s2d-folded stem: the input arrives host-folded (sb*sb*cin channels at
    # the folded spatial size), so any branch that consumes the LOGICAL
    # geometry — including int8 below — must not claim this op. The stem
    # stays bf16 under engine-wide int8 (it is layout-pathological, not
    # MXU-bound; int8 would deepen its C-lane waste, docs/mfu_ceiling.md).
    s2d_stem = tune.stem_s2d == 1 and \
        stem_s2d_geom(ind, od, s, p, k, dil, groups) is not None

    if tune.int8 and groups == 1 and dil == (1, 1) and not s2d_stem:
        # int8 MXU conv: symmetric dynamic quantization. Activations get a
        # per-tensor scale computed on the fly (one fused max-reduce, no
        # calibration state); weights get per-out-channel scales. int32
        # accumulation via preferred_element_type, dequant+bias(+residual)
        # (+ReLU) epilogue fuses into the conv's consumer ops.
        # static calibration (prof/calib.py): persisted act amax kills the
        # runtime per-tensor amax reduce; out-of-range acts saturate at +-127
        amax = (getattr(ctx, "act_amax", None) or {}).get(op.bots[0])
        info_log.append(f"{op.name}: nhwc-int8_conv s={s}"
                        + (f" static_amax={amax:.4g}" if amax is not None else ""))

        def fn(x, w, b, residual=None):
            wf = w.astype(jnp.float32)
            ws = jnp.maximum(jnp.max(jnp.abs(wf), axis=(0, 1, 2)),
                             1e-12) / 127.0
            wq = jnp.round(wf / ws).astype(jnp.int8)
            if x.dtype == jnp.int8:
                # act_int8-stored input (signed storage under engine int8):
                # feed the stored value straight into the int8 dot,
                # dequantizing with the engine's ACTUAL storage scale
                # (plumbed via ctx.act_store_scale — ADVICE r4: re-deriving
                # amax/127 here would silently skew if the storage
                # quantizer ever changes). The per-conv quantize never runs.
                stored = (getattr(ctx, "act_store_scale", None) or {}) \
                    .get(op.bots[0])
                assert stored is not None, \
                    "int8-stored input needs the engine storage scale " \
                    "(act_store_scale) for exact dequantization"
                xs = jnp.float32(stored)
                xq = x
            elif amax is not None:  # truthiness would skip valid amax==0.0
                xf = x.astype(jnp.float32)
                xs = jnp.float32(max(amax, 1e-12) / 127.0)
                xq = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
            else:
                xf = x.astype(jnp.float32)
                xs = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-12) / 127.0
                xq = jnp.round(xf / xs).astype(jnp.int8)
            if k == (1, 1) and p == (0, 0):
                # 1x1: int8 matmul (the MXU's native int8 path; the int8
                # conv emitter is measurably slower than the dot emitter)
                if s != (1, 1):
                    xq = xq[:, ::s[0], ::s[1], :]
                n_, y_, x_, c_ = xq.shape
                acc = jnp.dot(xq.reshape(-1, c_), wq.reshape(c_, -1),
                              preferred_element_type=jnp.int32)
                acc = acc.reshape(n_, y_, x_, -1)
            else:
                acc = lax.conv_general_dilated(
                    xq, wq, window_strides=s,
                    padding=[(p[0], p[0]), (p[1], p[1])],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.int32)
            out = acc.astype(jnp.float32) * (ws * xs).reshape(1, 1, 1, -1) \
                + b.astype(jnp.float32).reshape(1, 1, 1, -1)
            if residual is not None:
                out = out + residual.astype(jnp.float32)
            if relu:
                out = jnp.maximum(out, 0.0)
            # int8-stored inputs are not a float target dtype: emit the
            # weights' compute dtype instead (the engine's compute_tn)
            odt = x.dtype if jnp.issubdtype(x.dtype, jnp.floating) else w.dtype
            return (out.astype(odt),)
        fn.supports_residual = True
        fn.q8_input_ok = amax is not None
        return fn, preps
    if groups == 1 and not tune.use_xla and k == (1, 1) and p == (0, 0) \
            and tune.use_k1conv:
        M = od["img"] * od["y"] * od["x"]
        K, N = fd["in_chan"], fd["out_chan"]
        bm, bn, bk = pick_matmul_blocks(M, K, N, tune, ind.tn)
        info_log.append(f"{op.name}: nhwc-k1conv bm={bm} bn={bn} bk={bk}")

        def fn(x, w, b, residual=None):  # x NHWC, w HWIO
            if s != (1, 1):
                x = x[:, ::s[0], ::s[1], :]
            n, y, xx, c = x.shape
            res2d = residual.reshape(n * y * xx, -1) \
                if residual is not None else None
            out = pallas_matmul(x.reshape(n * y * xx, c), w.reshape(c, -1), b,
                                bm=bm, bn=bn, bk=bk, out_dtype=x.dtype,
                                precision=tune.precision, relu=relu,
                                interpret=ctx_interp(), residual=res2d)
            return (out.reshape(n, y, xx, -1),)
        fn.supports_residual = True
        return fn, preps

    # stem conv (large kernel, stride>1, starved in_chan — resnet/googlenet
    # 7x7s2 C=3, alexnet 11x11s4 C=3): space-to-depth fold in pure XLA ops.
    # The MXU contracts over k*k*C; at C=3 that wastes almost the whole
    # 128-deep systolic dimension. Folding stride-s blocks into channels
    # yields an equivalent stride-1 conv with (ceil(k/s))^2 taps over C*s*s
    # channels — measured 1.35x on the standalone stem (scripts/exp_r2_perf
    # exp3) with identical math (kernel zero-padding adds ~(s*ceil(k/s)/k)^2
    # FLOPs but lifts MXU utilization far more). Applies under any kernel
    # policy (the fold and conv are XLA; nothing here needs Pallas). Off by
    # default — whole-net A/B shows the win is context-dependent (+4.3%
    # resnet50, -12% googlenet with the IDENTICAL stem shape); selected
    # per-op by net_tune wisdom.
    stem_on = tune.stem_s2d == 1
    geom = stem_s2d_geom(ind, od, s, p, k, dil, groups)
    if stem_on and geom is not None:
        sb, kk, m = geom["sb"], geom["kk"], geom["m"]
        pad_r_y, pad_r_x = geom["pad_r"]
        oy, ox = od["y"], od["x"]
        cin = ind["chan"]
        xs_h, xs_w = geom["xs_h"], geom["xs_w"]
        info_log.append(f"{op.name}: nhwc-stem_s2d s={sb} k={kk} m={m}")
        prec = PRECISIONS[tune.precision]
        from .lowering import conv_f32acc
        conv = conv_f32acc(("NHWC", "HWIO", "NHWC"), (1, 1),
                           ((0, 0), (0, 0)), 1, (1, 1), prec)

        # entry channel pad (tune.pad_c): folded channels zero-padded to a
        # lane-aligned count chosen by the engine/loader, weights padded to
        # match — the conv result is identical (zero lanes contribute 0)
        c_eff = max(tune.pad_c, sb * sb * cin) if tune.pad_c else \
            sb * sb * cin

        def prep_w(w):  # OIHW -> folded (m, m, c_eff, O)
            wh = w.transpose(2, 3, 1, 0)                      # HWIO
            wh = jnp.pad(wh, ((0, m * sb - kk), (0, m * sb - kk),
                              (0, 0), (0, 0)))
            wh = wh.reshape(m, sb, m, sb, cin, -1)
            wh = wh.transpose(0, 2, 1, 3, 4, 5).reshape(m, m,
                                                        sb * sb * cin, -1)
            if c_eff > sb * sb * cin:
                wh = jnp.pad(wh, ((0, 0), (0, 0),
                                  (0, c_eff - sb * sb * cin), (0, 0)))
            return wh

        def inv_w(g):   # folded grad -> OIHW
            g = g[:, :, :sb * sb * cin]
            g = g.reshape(m, m, sb, sb, cin, -1)
            g = g.transpose(0, 2, 1, 3, 4, 5).reshape(m * sb, m * sb, cin, -1)
            return g[:kk, :kk].transpose(3, 2, 0, 1)

        im2col = bool(tune.stem_im2col)
        if im2col:
            info_log.append(f"{op.name}: nhwc-stem_s2d im2col "
                            f"K={m * m * c_eff}")

        def fn(x, w, b, residual=None):
            if x.shape[1] == xs_h and x.shape[-1] in (sb * sb * cin, c_eff):
                # input arrives PRE-FOLDED (host-side s2d at load time — see
                # PallasFwd.input_s2d): the per-forward pad+reshape+minor-dim
                # transpose, the expensive part of the in-jit fold on TPU,
                # never touches the device. Under pad_c the loader emits the
                # channel-padded layout directly; an unpadded arrival is
                # padded in-jit (e.g. the logical-layout fallback path).
                xsd = x
                if x.shape[-1] < c_eff:
                    xsd = jnp.pad(xsd, ((0, 0), (0, 0), (0, 0),
                                        (0, c_eff - x.shape[-1])))
            else:
                xp = jnp.pad(x, ((0, 0), (p[0], pad_r_y), (p[1], pad_r_x),
                                 (0, 0)))
                xsd = xp.reshape(x.shape[0], xs_h, sb, xs_w, sb, cin)
                xsd = xsd.transpose(0, 1, 3, 2, 4, 5).reshape(
                    x.shape[0], xs_h, xs_w, sb * sb * cin)
                if c_eff > sb * sb * cin:
                    xsd = jnp.pad(xsd, ((0, 0), (0, 0), (0, 0),
                                        (0, c_eff - sb * sb * cin)))
            if im2col:
                # tap matrix via m*m shifted slices concat on channel (XLA
                # concat, NOT Mosaic — the tap_cat limitation is a Pallas
                # one), then one (N*oy*ox, m*m*c_eff) x (m*m*c_eff, O) dot:
                # the single-MXU-dot stem form (VERDICT r3 #3)
                pat = jnp.concatenate(
                    [xsd[:, dy:dy + oy, dx:dx + ox, :]
                     for dy in range(m) for dx in range(m)], axis=-1)
                n_ = pat.shape[0]
                out = lax.dot_general(
                    pat.reshape(n_ * oy * ox, m * m * c_eff),
                    w.reshape(m * m * c_eff, -1),
                    (((1,), (0,)), ((), ())), precision=prec,
                    preferred_element_type=jnp.float32)
                out = out.reshape(n_, oy, ox, -1) + b.reshape(1, 1, 1, -1)
            else:
                out = conv(xsd, w) + b.reshape(1, 1, 1, -1)
            if residual is not None:
                out = out + residual.astype(out.dtype)
            if relu:
                out = jnp.maximum(out, 0.0)
            return (out.astype(x.dtype),)
        fn.supports_residual = True
        return fn, {op.bots[1]: (prep_w, inv_w)}

    halo_on = tune.use_halo == 1 or (tune.use_halo == -1 and not ctx_interp())
    if groups == 1 and not tune.use_xla and halo_on:
        from ..ops.kernels.conv import conv_halo_blocks, pallas_conv2d_halo
        hb = conv_halo_blocks(ind, fd, od, s, p, tune)
        if hb is not None:
            info_log.append(f"{op.name}: nhwc-halo_conv {hb} s={s}")

            tcat = tune.tap_cat

            def fn(x, w, b, residual=None):
                return (pallas_conv2d_halo(x, w, b, stride=s, pad=p, relu=relu,
                                           hb=hb, precision=tune.precision,
                                           interpret=ctx_interp(),
                                           residual=residual, tap_cat=tcat),)
            fn.supports_residual = True
            return fn, preps

    blocks = None
    if groups == 1 and not tune.use_xla and s == (1, 1):
        blocks = conv_blocks(ind, fd, od, tune)
    if blocks is not None:
        info_log.append(f"{op.name}: nhwc-pallas_conv {blocks}")

        def fn(x, w, b):
            return (pallas_conv2d_nhwc(x, w, b, stride=s, pad=p, relu=relu,
                                       blocks=blocks, precision=tune.precision,
                                       interpret=ctx_interp()),)
        return fn, preps

    if groups == 1 and not tune.use_xla and tune.use_s2d and s != (1, 1) \
            and k != (1, 1):  # 1x1 strided = subsample; XLA wins there
        # strided conv -> space-to-depth fold + stride-1 Pallas kernel
        from ..utils.dims import Dims
        from ..ops.kernels.conv import space_to_depth_conv
        folded_in = Dims.of(img=ind["img"], chan=ind["chan"] * s[0] * s[1],
                            y=-(-ind["y"] // s[0]), x=-(-ind["x"] // s[1]),
                            tn=ind.tn)
        folded_f = Dims.of(out_chan=fd["out_chan"],
                           in_chan=fd["in_chan"] * s[0] * s[1],
                           y=-(-fd["y"] // s[0]), x=-(-fd["x"] // s[1]))
        if conv_blocks(folded_in, folded_f, od, tune) is not None:
            info_log.append(f"{op.name}: nhwc-s2d_conv s={s}")

            def fn(x, w, b):
                out = space_to_depth_conv(x, w, b, stride=s, pad=p, relu=relu,
                                          tune=tune, precision=tune.precision,
                                          interpret=ctx_interp())
                return (out,)
            return fn, preps

    info_log.append(f"{op.name}: nhwc-xla_conv")
    prec = PRECISIONS[tune.precision]
    from .lowering import conv_f32acc
    conv = conv_f32acc(("NHWC", "HWIO", "NHWC"), s,
                       ((p[0], p[0]), (p[1], p[1])), groups, dil, prec)

    def fn(x, w, b, residual=None):
        out = conv(x, w)
        out = out + b.reshape(1, 1, 1, -1)
        if residual is not None:
            out = out + residual.astype(out.dtype)
        if relu:
            out = jnp.maximum(out, 0.0)
        return (out.astype(x.dtype),)
    fn.supports_residual = True
    return fn, preps


@nhwc_rule("Deconvolution")
def _nhwc_deconv(pipe, op, ctx, tune, info_log):
    s, p = op.stride(), op.pad()
    k = op.kern_sz()
    groups = int(op.p("groups", 1))
    tpad = [(k[0] - 1 - p[0], k[0] - 1 - p[0]),
            (k[1] - 1 - p[1], k[1] - 1 - p[1])]
    preps = {op.bots[1]: (lambda w: w.transpose(2, 3, 1, 0),
                          lambda g: g.transpose(3, 2, 0, 1))}
    # prepped weight is (kh, kw, in_chan/g, out_chan) = HWIO; deconv = input-
    # dilated forward conv on the spatially-flipped kernel (see lowering.py)

    def fn(x, w, b):
        out = lax.conv_general_dilated(
            x, w[::-1, ::-1, :, :], window_strides=(1, 1), padding=tpad,
            lhs_dilation=s, dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups,
            precision=PRECISIONS[tune.precision],
            preferred_element_type=jnp.float32)
        return ((out + b.reshape(1, 1, 1, -1)).astype(x.dtype),)
    return fn, preps


@nhwc_rule("InnerProduct")
def _nhwc_ip(pipe, op, ctx, tune, info_log):
    from ..ops.cnn_variants import ctx_interp
    from ..ops.kernels.sgemm import pallas_matmul, pick_matmul_blocks
    ind = pipe.must_dims(op.bots[0])
    fd = pipe.must_dims(op.bots[1])
    relu = bool(op.p("fused_relu", False))
    preps = {}
    if "y" in ind.names and (ind["y"] > 1 or ind["x"] > 1):
        # fc weights are ordered for NCHW flatten; permute once for NHWC
        c, y, x = ind["chan"], ind["y"], ind["x"]

        def prep(w):
            return w.reshape(w.shape[0], c, y, x).transpose(0, 2, 3, 1) \
                .reshape(w.shape[0], -1)

        def inv(g):
            return g.reshape(g.shape[0], y, x, c).transpose(0, 3, 1, 2) \
                .reshape(g.shape[0], -1)
        preps[op.bots[1]] = (prep, inv)
    M, K, N = ind["img"], fd["in_feats"], fd["out_chan"]
    bm, bn, bk = pick_matmul_blocks(M, K, N, tune, ind.tn)
    amax = (getattr(ctx, "act_amax", None) or {}).get(op.bots[0]) \
        if tune.int8 else None
    info_log.append(f"{op.name}: nhwc-ip{' int8' if tune.int8 else ''} "
                    f"bm={bm} bn={bn} bk={bk}"
                    + (f" static_amax={amax:.4g}" if amax is not None else ""))
    prec = PRECISIONS[tune.precision]
    use_xla = tune.use_xla

    int8 = tune.int8

    def fn(x, w, b):
        xf = x.reshape(x.shape[0], -1)
        if int8:  # symmetric int8; static calib scale when available
            wf = w.astype(jnp.float32)
            ws = jnp.maximum(jnp.max(jnp.abs(wf), axis=1), 1e-12) / 127.0
            wq = jnp.round(wf / ws[:, None]).astype(jnp.int8)
            if amax is not None:  # truthiness would skip a valid amax==0.0
                xs = jnp.float32(max(amax, 1e-12) / 127.0)
                xq = jnp.clip(jnp.round(xf.astype(jnp.float32) / xs),
                              -127, 127).astype(jnp.int8)
            else:
                xs = jnp.maximum(jnp.max(jnp.abs(xf.astype(jnp.float32))),
                                 1e-12) / 127.0
                xq = jnp.round(xf.astype(jnp.float32) / xs).astype(jnp.int8)
            out = jnp.dot(xq, wq.T, preferred_element_type=jnp.int32)
            out = out.astype(jnp.float32) * (ws * xs)[None, :] \
                + b.astype(jnp.float32)
            if relu:
                out = jnp.maximum(out, 0.0)
            return (out.astype(x.dtype),)
        if use_xla:
            out = jnp.dot(xf, w.T, precision=prec,
                          preferred_element_type=jnp.float32) + b
            if relu:
                out = jnp.maximum(out, 0.0)
            return (out.astype(x.dtype),)
        out = pallas_matmul(xf, w.T, b, bm=bm, bn=bn, bk=bk, out_dtype=x.dtype,
                            precision=tune.precision, relu=relu,
                            interpret=ctx_interp())
        return (out,)
    return fn, preps


# -- spatial ops --------------------------------------------------------------------

def _pool_shift_fn(k, s, pad_y, pad_x, oy, ox, avg, iy, ix, p):
    """Pooling as k*k shifted strided slices + a max/add tree
    (tune.pool_shift=1): semantically identical to the reduce_window
    lowering, but expressed as plain slices and elementwise ops that
    XLA's fusion handles like any other — sidestepping the reduce_window
    emitter's batch-64 pathology (4x over linear scaling on r50 pool1;
    docs/mfu_ceiling.md b64 table)."""
    import numpy as np
    div = None
    if avg:
        # non-padding pixels only (ref test/rtc/pool.cucl avg_pool_sz)
        def divisor(o, in_sz, kk, ss, pp):
            st = o * ss - pp
            en = min(st + kk, in_sz)
            return en - max(st, 0)
        dy = np.array([divisor(o, iy, k[0], s[0], p[0]) for o in range(oy)],
                      np.float32)
        dx = np.array([divisor(o, ix, k[1], s[1], p[1]) for o in range(ox)],
                      np.float32)
        div = jnp.asarray((dy[:, None] * dx[None, :]).reshape(1, oy, ox, 1))

    def fn(x):
        # avg sums in f32 (divisor exactness); max stays in the input
        # dtype — comparison is exact in any dtype, and skipping the cast
        # avoids materializing a padded f32 copy of the input (the first
        # pool_shift A/B measured 0.83x at b64 WITH the cast)
        out_tn = x.dtype
        if avg:
            x = x.astype(jnp.float32)
        init = 0.0 if avg else -np.inf
        xp = jnp.pad(x, ((0, 0), pad_y, pad_x, (0, 0)),
                     constant_values=init)
        acc = None
        for ky in range(k[0]):
            for kx in range(k[1]):
                v = lax.slice(
                    xp, (0, ky, kx, 0),
                    (xp.shape[0], ky + (oy - 1) * s[0] + 1,
                     kx + (ox - 1) * s[1] + 1, xp.shape[3]),
                    (1, s[0], s[1], 1))
                acc = v if acc is None else \
                    (acc + v if avg else jnp.maximum(acc, v))
        out = acc / div if avg else acc
        return (out.astype(out_tn),)
    return fn


def _avg_divisor(iy, ix, k, s, p, oy, ox):
    """(oy, ox) f32 per-window non-padding pixel counts (ref
    test/rtc/pool.cucl avg_pool_sz semantics)."""
    import numpy as np

    def divisor(o, in_sz, kk, ss, pp):
        st = o * ss - pp
        en = min(st + kk, in_sz)
        return en - max(st, 0)
    dy = np.array([divisor(o, iy, k[0], s[0], p[0]) for o in range(oy)],
                  np.float32)
    dx = np.array([divisor(o, ix, k[1], s[1], p[1]) for o in range(ox)],
                  np.float32)
    return dy[:, None] * dx[None, :]


@nhwc_rule("Pooling")
def _nhwc_pool(pipe, op, ctx, tune, info_log):
    k, s, p = op.kern_sz(), op.stride(), op.pad()
    avg = op.p("avg_pool", False)
    ind = pipe.must_dims(op.bots[0])
    od = pipe.must_dims(op.tops[0])
    iy, ix = ind["y"], ind["x"]
    oy, ox = od["y"], od["x"]
    pad_y = (p[0], max(0, (oy - 1) * s[0] + k[0] - iy - p[0]))
    pad_x = (p[1], max(0, (ox - 1) * s[1] + k[1] - ix - p[1]))
    if tune.pool_pallas:
        from ..ops.cnn_variants import ctx_interp
        from ..ops.kernels.pool import pallas_pool, pool_plan

        def pallas_fn(x):
            out = pallas_pool(x, k, s, pad_y, pad_x, oy, ox, avg,
                              interpret=ctx_interp())
            if out is None:  # plane over VMEM budget: reduce_window path
                out = lax.reduce_window(
                    x.astype(jnp.float32), 0.0 if avg else -jnp.inf,
                    lax.add if avg else lax.max,
                    window_dimensions=(1, k[0], k[1], 1),
                    window_strides=(1, s[0], s[1], 1),
                    padding=((0, 0), pad_y, pad_x, (0, 0)))
                if avg:
                    out = out / jnp.asarray(
                        _avg_divisor(iy, ix, k, s, p, oy, ox)
                        .reshape(1, oy, ox, 1))
                out = out.astype(x.dtype)
            return (out,)
        plan = pool_plan((ind['img'], iy, ix, ind['chan']), 'float32',
                         oy, ox, tuple(k), tuple(s), bool(avg))
        info_log.append(f"{op.name}: nhwc-pool_pallas k={k} s={s} avg={avg}"
                        + (f" plan={plan['mode']}" if plan
                           else " (plane>VMEM: reduce_window fallback)"))
        return _no_preps(pallas_fn)
    if tune.pool_shift:
        return _no_preps(_pool_shift_fn(k, s, pad_y, pad_x, oy, ox, avg,
                                        iy, ix, p))
    bview = int(tune.pool_bview)
    if bview > 1:
        # batch-view escape (tune.pool_bview=k): identical windows over a
        # (k, N/k, H, W, C) view — dodges per-shape reduce_window emitter
        # pathologies (the b64 pool1 4.1x, docs/mfu_ceiling.md) without
        # changing semantics. Padding/divisor math is the 4D rule's.
        n_img = ind["img"]
        if n_img % bview != 0:
            raise ValueError(f"pool_bview={bview} must divide batch {n_img}")

        def bview_fn(x):
            xv = x.reshape((bview, n_img // bview) + x.shape[1:])
            if avg:
                out = lax.reduce_window(
                    xv.astype(jnp.float32), 0.0, lax.add,
                    window_dimensions=(1, 1, k[0], k[1], 1),
                    window_strides=(1, 1, s[0], s[1], 1),
                    padding=((0, 0), (0, 0), pad_y, pad_x, (0, 0)))
                out = out / jnp.asarray(
                    _avg_divisor(iy, ix, k, s, p, oy, ox)
                    .reshape(1, 1, oy, ox, 1))
            else:
                out = lax.reduce_window(
                    xv.astype(jnp.float32), -jnp.inf, lax.max,
                    window_dimensions=(1, 1, k[0], k[1], 1),
                    window_strides=(1, 1, s[0], s[1], 1),
                    padding=((0, 0), (0, 0), pad_y, pad_x, (0, 0)))
            return (out.astype(x.dtype).reshape((n_img,) + out.shape[2:]),)
        return _no_preps(bview_fn)
    if avg:
        # non-padding pixels only (ref test/rtc/pool.cucl avg_pool_sz)
        div = jnp.asarray(
            _avg_divisor(iy, ix, k, s, p, oy, ox).reshape(1, oy, ox, 1))

        def fn(x):
            sums = lax.reduce_window(
                x.astype(jnp.float32), 0.0, lax.add,
                window_dimensions=(1, k[0], k[1], 1),
                window_strides=(1, s[0], s[1], 1),
                padding=((0, 0), pad_y, pad_x, (0, 0)))
            return ((sums / div).astype(x.dtype),)
        return _no_preps(fn)

    def fn(x):
        out = lax.reduce_window(
            x.astype(jnp.float32), -jnp.inf, lax.max,
            window_dimensions=(1, k[0], k[1], 1),
            window_strides=(1, s[0], s[1], 1),
            padding=((0, 0), pad_y, pad_x, (0, 0)))
        return (out.astype(x.dtype),)
    return _no_preps(fn)


@nhwc_rule("LRN")
def _nhwc_lrn(pipe, op, ctx, tune, info_log):
    size = int(op.p("local_size", 5))
    alpha = float(op.p("alpha", 1e-4))
    beta = float(op.p("beta", 0.75))
    kk = float(op.p("k", 1.0))
    half = (size - 1) // 2

    def fn(x):
        x32 = x.astype(jnp.float32)
        sq = x32 * x32
        c = x.shape[3]
        sqp = jnp.pad(sq, ((0, 0), (0, 0), (0, 0), (half, size - 1 - half)))
        ssum = sqp[..., 0:c]
        for i in range(1, size):
            ssum = ssum + sqp[..., i:i + c]
        from .lowering import lrn_inv_pow
        return ((x32 * lrn_inv_pow(kk + (alpha / size) * ssum, beta))
                .astype(x.dtype),)
    return _no_preps(fn)


@nhwc_rule("BatchNorm")
def _nhwc_bn(pipe, op, ctx, tune, info_log):
    eps = float(op.p("eps", 1e-5))

    def fn(x, mean, var, scale_factor=None):
        sf = 1.0
        if scale_factor is not None:
            sf = jnp.where(scale_factor[0] != 0, 1.0 / scale_factor[0], 1.0)
        m = (mean * sf).reshape(1, 1, 1, -1)
        v = (var * sf).reshape(1, 1, 1, -1)
        return (((x - m) * lax.rsqrt(v + eps)).astype(x.dtype),)
    return _no_preps(fn)


@nhwc_rule("Scale")
def _nhwc_scale(pipe, op, ctx, tune, info_log):
    def fn(x, gamma, beta=None):
        out = x * gamma.reshape(1, 1, 1, -1)
        if beta is not None:
            out = out + beta.reshape(1, 1, 1, -1)
        return (out.astype(x.dtype),)
    return _no_preps(fn)


# -- pointwise / structural ------------------------------------------------------------

@nhwc_rule("ReLU")
def _nhwc_relu(pipe, op, ctx, tune, info_log):
    return _no_preps(lambda x: (jnp.maximum(x, 0.0).astype(x.dtype),))


@nhwc_rule("Sigmoid")
def _nhwc_sigmoid(pipe, op, ctx, tune, info_log):
    return _no_preps(lambda x: (jax.nn.sigmoid(x),))


@nhwc_rule("TanH")
def _nhwc_tanh(pipe, op, ctx, tune, info_log):
    return _no_preps(lambda x: (jnp.tanh(x),))


@nhwc_rule("Dropout")
def _nhwc_dropout(pipe, op, ctx, tune, info_log):
    ratio = float(op.p("dropout_ratio", 0.5))
    if not ctx.train:
        return _no_preps(lambda x: (x,))
    seed = ctx.det_drop_seed + (stable_hash(op.name) & 0xFFFF)

    def fn(x):
        key = jax.random.PRNGKey(seed)
        mask = jax.random.bernoulli(key, 1.0 - ratio, x.shape)
        return ((x * mask / (1.0 - ratio)).astype(x.dtype),)
    return _no_preps(fn)


@nhwc_rule("Split")
def _nhwc_split(pipe, op, ctx, tune, info_log):
    n = len(op.tops)
    return _no_preps(lambda x: (x,) * n)


@nhwc_rule("Concat")
def _nhwc_concat(pipe, op, ctx, tune, info_log):
    from .pipe import _concat_axis_name
    d0 = pipe.must_dims(op.bots[0])
    axis_name = _concat_axis_name(op, d0)
    if d0.names == ("img", "chan", "y", "x"):  # physically NHWC
        axis = {"img": 0, "y": 1, "x": 2, "chan": 3}[axis_name]
    else:  # non-canonical nodes keep logical layout
        axis = d0.index(axis_name)

    def fn(*xs):
        return (jnp.concatenate(xs, axis=axis),)
    return _no_preps(fn)


@nhwc_rule("Eltwise")
def _nhwc_eltwise(pipe, op, ctx, tune, info_log):
    import functools
    kind = op.p("eltwise_op", "sum")
    coeffs = op.p("coeffs", None)

    def fn(*xs):
        if kind == "sum":
            out = sum((c * x for c, x in zip(coeffs, xs)), start=0.0) \
                if coeffs else sum(xs[1:], start=xs[0])
        elif kind == "prod":
            out = functools.reduce(jnp.multiply, xs)
        elif kind == "max":
            out = functools.reduce(jnp.maximum, xs)
        else:
            raise PipeError(f"eltwise: unknown op {kind!r}")
        return (out,)
    return _no_preps(fn)


@nhwc_rule("Reduce")
def _nhwc_reduce(pipe, op, ctx, tune, info_log):
    """N-ary elementwise sum (ref Reduce_coi, conv_util.cc:57)."""
    def fn(*xs):
        return (sum(xs[1:], start=xs[0]),)
    return _no_preps(fn)


@nhwc_rule("Softmax")
def _nhwc_softmax(pipe, op, ctx, tune, info_log):
    ind = pipe.must_dims(op.bots[0])
    laxis = int(op.p("axis", 1))
    if ind.names == ("img", "chan", "y", "x"):  # physically NHWC
        axis = {0: 0, 1: 3, 2: 1, 3: 2}[laxis]
    else:  # non-canonical nodes keep logical layout
        axis = laxis
    return _no_preps(lambda x: (_softmax(x, axis=axis).astype(x.dtype),))


@nhwc_rule("SoftmaxWithLoss")
def _nhwc_sml(pipe, op, ctx, tune, info_log):
    ind = pipe.must_dims(op.bots[0])
    axis = 3 if "y" in ind.names else 1

    def fn(x, labels):
        prob = _softmax(x, axis=axis)
        n_cls = x.shape[axis]
        lab = jnp.clip(labels.reshape(labels.shape[0]).astype(jnp.int32),
                       0, n_cls - 1)
        if prob.ndim == 4:
            p = prob[jnp.arange(prob.shape[0]), 0, 0, lab]
        else:
            p = prob[jnp.arange(prob.shape[0]), lab]
        loss = -jnp.log(jnp.maximum(p, 1e-38))
        return (loss.astype(x.dtype), prob.astype(x.dtype))
    return fn, {}


@nhwc_rule("Data")
def _nhwc_data(pipe, op, ctx, tune, info_log):
    return _no_preps(lambda x: (x,))


@nhwc_rule("GradAccum")
def _nhwc_gradaccum(pipe, op, ctx, tune, info_log):
    def fn(*parts):
        out = parts[0]
        for p in parts[1:]:
            out = out + p
        return (out,)
    return _no_preps(fn)
