"""Per-op lowering: graph ops -> JAX computations (Caffe-compatible numerics).

Parity target: the per-op lowering in ``conv_pipe_fwd_t::gen_op`` (ref
src/rtc_fwd.cc:263) and the op semantics of the reference's CUCL kernels
(ref test/rtc/*.cucl): Convolution (+fused bias/ReLU), Pooling (max/avg with
Caffe window clipping), LRN, Softmax, SoftmaxWithLoss, ReLU, Dropout (the
deterministic-seed flavor), BatchNorm, Scale, Concat, Split, Eltwise,
InnerProduct, Deconvolution (spreading), Sigmoid/TanH.

TPU-first design: each op lowers to a jax-traceable callable; the executor
composes them into ONE jit program so XLA fuses elementwise chains into
convolutions (the reference did conv+ReLU fusion by hand, rtc_fwd.cc:490).
Convolution/InnerProduct may lower either to stock XLA ops (library path,
cuDNN analog) or to generated Pallas kernels (ref generated-kernel path);
that choice lives in the executor's variant-selection policy, not here.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax

from ..utils.dims import stable_hash
from .pipe import ConvOp, ConvPipe, PipeError

PRECISIONS = {"default": lax.Precision.DEFAULT,
              "high": lax.Precision.HIGH,
              "highest": lax.Precision.HIGHEST}


@dataclass(frozen=True)
class LowerCtx:
    precision: str = "highest"     # MXU pass precision for conv/matmul
    compute_tn: str = ""           # '' = keep input dtype; else cast for compute
    det_drop_seed: int = 0         # deterministic dropout seed (0 = inference)
    train: bool = False            # training mode (dropout active)
    # static int8 calibration: node name -> activation amax (prof/calib.py).
    # None = dynamic quantization (runtime per-tensor amax reduce per fwd).
    act_amax: object = None
    # act_int8 SIGNED storage scales (node -> float), plumbed from the
    # engine's resolved _act_q so int8-stored inputs dequantize with the
    # ACTUAL storage scale, not a re-derivation of it (ADVICE r4: a future
    # percentile/asymmetric storage quantizer must not silently skew the
    # direct int8-conv feed)
    act_store_scale: object = None

    @property
    def prec(self):
        return PRECISIONS[self.precision]


_LOWER: dict[str, Callable] = {}


def lower_rule(op_type: str):
    def deco(fn):
        _LOWER[op_type] = fn
        return fn
    return deco


def lower_op(pipe: ConvPipe, op: ConvOp, ctx: LowerCtx) -> Callable:
    """Return fn(*bot_arrays) -> tuple(top_arrays)."""
    rule = _LOWER.get(op.type)
    if rule is None:
        raise PipeError(f"no lowering rule for op type {op.type!r} (op {op.name!r})")
    return rule(pipe, op, ctx)


# -- conv / ip ------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def conv_f32acc(dn, s, p, groups, dil, prec):
    """conv with f32 MXU accumulation that stays differentiable on low-
    precision inputs: the transpose rule of a preferred_element_type=f32
    conv receives an f32 cotangent against bf16 operands, which the strict
    conv dtype rule rejects. custom_vjp keeps the f32-accumulating forward
    and computes input/filter grads via the same conv in operand dtype
    (cotangent cast down first — standard bf16 training numerics)."""
    import jax

    def raw(x, w, pref):
        return lax.conv_general_dilated(
            x, w, window_strides=s, padding=list(p),
            dimension_numbers=dn, feature_group_count=groups,
            rhs_dilation=dil, precision=prec,
            preferred_element_type=pref)

    @jax.custom_vjp
    def f(x, w):
        return raw(x, w, jnp.float32)

    def fwd(x, w):
        return raw(x, w, jnp.float32), (x, w)

    def bwd(res, ct):
        import jax as _jax
        x, w = res
        _, vjp = _jax.vjp(lambda xi, wi: raw(xi, wi, None), x, w)
        return vjp(ct.astype(x.dtype))

    f.defvjp(fwd, bwd)
    return f


@lower_rule("Convolution")
def _lower_conv(pipe: ConvPipe, op: ConvOp, ctx: LowerCtx) -> Callable:
    s, p = op.stride(), op.pad()
    k = op.kern_sz()
    dil = op.dilation()
    groups = int(op.p("groups", 1))
    relu = bool(op.p("fused_relu", False))
    from . import train_ops
    if (k == (1, 1) and p == (0, 0) and groups == 1 and dil == (1, 1)
            and train_ops.enabled()):
        # explicit 1x1 backward (same forward program; the VJP avoids the
        # gradient-dilated transpose-conv emitter — train_ceiling.md)
        conv = train_ops.conv1x1_explicit(s, ctx.prec)
    else:
        conv = conv_f32acc(("NCHW", "OIHW", "NCHW"), s,
                           ((p[0], p[0]), (p[1], p[1])), groups, dil, ctx.prec)

    def fn(x, w, b):
        out = conv(x, w)
        out = out + b.reshape(1, -1, 1, 1)
        if relu:
            out = jnp.maximum(out, 0.0)
        return (out.astype(x.dtype),)
    return fn


@lower_rule("InnerProduct")
def _lower_ip(pipe: ConvPipe, op: ConvOp, ctx: LowerCtx) -> Callable:
    relu = bool(op.p("fused_relu", False))

    def fn(x, w, b):
        xf = x.reshape(x.shape[0], -1)
        # w is (out_chan, in_feats); match Caffe y = x.W^T + b
        out = jnp.dot(xf, w.T, precision=ctx.prec,
                      preferred_element_type=jnp.float32) + b
        if relu:
            out = jnp.maximum(out, 0.0)
        return (out.astype(x.dtype),)
    return fn


@lower_rule("Deconvolution")
def _lower_deconv(pipe: ConvPipe, op: ConvOp, ctx: LowerCtx) -> Callable:
    s, p = op.stride(), op.pad()
    k = op.kern_sz()
    groups = int(op.p("groups", 1))
    # Caffe deconv == gradient of conv wrt its input (spreading, ref
    # conv_util.cc Spreading) == transposed conv, expressed directly as an
    # input-dilated forward conv (supports groups, e.g. the reference rrc
    # net's depthwise bilinear upsamples): spatial-flip the kernel, dilate
    # the input by the stride, pad k-1-p per side -> out (in-1)*s + k - 2p.
    # Our logical weights are (out_chan, in_chan/g, kh, kw) = OIHW already.
    tpad = [(k[0] - 1 - p[0], k[0] - 1 - p[0]),
            (k[1] - 1 - p[1], k[1] - 1 - p[1])]

    def fn(x, w, b):
        out = lax.conv_general_dilated(
            x, w[:, :, ::-1, ::-1], window_strides=(1, 1), padding=tpad,
            lhs_dilation=s, dimension_numbers=("NCHW", "OIHW", "NCHW"),
            feature_group_count=groups, precision=ctx.prec,
            preferred_element_type=jnp.float32,
        )
        out = out + b.reshape(1, -1, 1, 1)
        return (out.astype(x.dtype),)
    return fn


# -- pooling -----------------------------------------------------------------------

def _pool_geom(in_sz, k, s, p, out_sz):
    """Per-output-window [start, end) in padded coords, Caffe clipping."""
    starts = [o * s - p for o in range(out_sz)]
    return starts


@lower_rule("Pooling")
def _lower_pool(pipe: ConvPipe, op: ConvOp, ctx: LowerCtx) -> Callable:
    k, s, p = op.kern_sz(), op.stride(), op.pad()
    avg = op.p("avg_pool", False)
    ind = pipe.must_dims(op.bots[0])
    od = pipe.must_dims(op.tops[0])
    iy, ix = ind["y"], ind["x"]
    oy, ox = od["y"], od["x"]
    # explicit asymmetric padding: ceil-mode output may read past in+pad
    pad_y = (p[0], max(0, (oy - 1) * s[0] + k[0] - iy - p[0]))
    pad_x = (p[1], max(0, (ox - 1) * s[1] + k[1] - ix - p[1]))

    if avg:
        # AVE divisor: only non-padding pixels count (ref test/rtc/pool.cucl
        # "to match caffe, only non-padding pixels are considered")
        def divisor(o, in_sz, kk, ss, pp):
            st = o * ss - pp
            en = min(st + kk, in_sz)
            st = max(st, 0)
            return en - st
        dy = jnp.array([divisor(o, iy, k[0], s[0], p[0]) for o in range(oy)],
                       dtype=jnp.float32)
        dx = jnp.array([divisor(o, ix, k[1], s[1], p[1]) for o in range(ox)],
                       dtype=jnp.float32)
        div = (dy[:, None] * dx[None, :]).reshape(1, 1, oy, ox)

        def fn(x):
            sums = lax.reduce_window(
                x.astype(jnp.float32), 0.0, lax.add,
                window_dimensions=(1, 1, k[0], k[1]),
                window_strides=(1, 1, s[0], s[1]),
                padding=((0, 0), (0, 0), pad_y, pad_x))
            return ((sums / div).astype(x.dtype),)
        return fn

    from . import train_ops
    if ctx.train and train_ops.enabled():
        # training: argmax forward + Spreading backward (custom_vjp) —
        # the maxpool VJP otherwise lowers through SelectAndScatter,
        # which the TPU emitter serializes (train_ceiling.md; ref
        # pool.cucl / rtc_fwd.cc:296 ship this design as CUDA kernels)
        pool = train_ops.make_maxpool_vjp(
            tuple(k), tuple(s), pad_y, pad_x, iy, ix, oy, ox)

        def fn(x):
            return (pool(x).astype(x.dtype),)
        return fn

    def fn(x):
        out = lax.reduce_window(
            x.astype(jnp.float32), -jnp.inf, lax.max,
            window_dimensions=(1, 1, k[0], k[1]),
            window_strides=(1, 1, s[0], s[1]),
            padding=((0, 0), (0, 0), pad_y, pad_x))
        return (out.astype(x.dtype),)
    return fn


# -- normalization ---------------------------------------------------------------------

@lower_rule("LRN")
def _lower_lrn(pipe: ConvPipe, op: ConvOp, ctx: LowerCtx) -> Callable:
    size = int(op.p("local_size", 5))
    alpha = float(op.p("alpha", 1e-4))
    beta = float(op.p("beta", 0.75))
    k = float(op.p("k", 1.0))
    half = (size - 1) // 2

    def fn(x):
        # across-channel LRN (Caffe default): scale = k + alpha/size * sum(x^2)
        # implemented as a static shifted-slice sum over the channel window
        # (reduce_window over a channel dim tickles an XLA/TPU layout bug and
        # fuses worse; `size` is tiny so the unroll is free)
        x32 = x.astype(jnp.float32)
        sq = x32 * x32
        c = x.shape[1]
        sqp = jnp.pad(sq, ((0, 0), (half, size - 1 - half), (0, 0), (0, 0)))
        ssum = sqp[:, 0:c]
        for i in range(1, size):
            ssum = ssum + sqp[:, i:i + c]
        scale = k + (alpha / size) * ssum
        return ((x32 * lrn_inv_pow(scale, beta)).astype(x.dtype),)
    return fn


def lrn_inv_pow(scale, beta: float):
    """scale**(-beta) with fast hardware forms for the caffe-standard betas:
    beta=0.75 -> rsqrt(s)*sqrt(rsqrt(s)) (s^-1/2 * s^-1/4 — two hardware
    root ops instead of the exp/log pow chain, which the googlenet per-op
    trace showed costing ~400us/fwd fused into the LRN consumers), and
    beta=0.5 -> rsqrt. Exact same math; differs from pow only in final-ulp
    rounding."""
    import jax.numpy as jnp
    from jax import lax
    if beta == 0.75:
        t = lax.rsqrt(scale)
        return t * jnp.sqrt(t)
    if beta == 0.5:
        return lax.rsqrt(scale)
    return jnp.power(scale, -beta)


@lower_rule("BatchNorm")
def _lower_bn(pipe: ConvPipe, op: ConvOp, ctx: LowerCtx) -> Callable:
    eps = float(op.p("eps", 1e-5))

    def fn(x, mean, var, scale_factor=None):
        sf = 1.0
        if scale_factor is not None:
            sf = jnp.where(scale_factor[0] != 0, 1.0 / scale_factor[0], 1.0)
        m = (mean * sf).reshape(1, -1, 1, 1)
        v = (var * sf).reshape(1, -1, 1, 1)
        return (((x - m) * lax.rsqrt(v + eps)).astype(x.dtype),)
    return fn


@lower_rule("Scale")
def _lower_scale(pipe: ConvPipe, op: ConvOp, ctx: LowerCtx) -> Callable:
    def fn(x, gamma, beta=None):
        out = x * gamma.reshape(1, -1, 1, 1)
        if beta is not None:
            out = out + beta.reshape(1, -1, 1, 1)
        return (out.astype(x.dtype),)
    return fn


# -- activations ------------------------------------------------------------------------

@lower_rule("ReLU")
def _lower_relu(pipe, op, ctx):
    def fn(x):
        return (jnp.maximum(x, 0.0).astype(x.dtype),)
    return fn


@lower_rule("Sigmoid")
def _lower_sigmoid(pipe, op, ctx):
    def fn(x):
        return (jax.nn.sigmoid(x),)
    return fn


@lower_rule("TanH")
def _lower_tanh(pipe, op, ctx):
    def fn(x):
        return (jnp.tanh(x),)
    return fn


@lower_rule("Dropout")
def _lower_dropout(pipe: ConvPipe, op: ConvOp, ctx: LowerCtx) -> Callable:
    ratio = float(op.p("dropout_ratio", 0.5))

    if not ctx.train:
        def fn(x):
            return (x,)
        return fn

    # deterministic dropout: fixed seed per op (ref set_det_drop_seed,
    # has_conv_fwd.H:22 / rtc_fwd.cc:91-100 — reproducible masks for testing)
    seed = ctx.det_drop_seed + (stable_hash(op.name) & 0xFFFF)

    def fn(x):
        key = jax.random.PRNGKey(seed)
        mask = jax.random.bernoulli(key, 1.0 - ratio, x.shape)
        return ((x * mask / (1.0 - ratio)).astype(x.dtype),)
    return fn


# -- structure ---------------------------------------------------------------------------

@lower_rule("Concat")
def _lower_concat(pipe: ConvPipe, op: ConvOp, ctx: LowerCtx) -> Callable:
    from .pipe import _concat_axis_name
    d0 = pipe.must_dims(op.bots[0])
    axis = d0.index(_concat_axis_name(op, d0))

    def fn(*xs):
        return (jnp.concatenate(xs, axis=axis),)
    return fn


@lower_rule("Split")
def _lower_split(pipe: ConvPipe, op: ConvOp, ctx: LowerCtx) -> Callable:
    n = len(op.tops)

    def fn(x):
        return (x,) * n
    return fn


@lower_rule("Eltwise")
def _lower_eltwise(pipe: ConvPipe, op: ConvOp, ctx: LowerCtx) -> Callable:
    kind = op.p("eltwise_op", "sum")
    coeffs = op.p("coeffs", None)

    def fn(*xs):
        if kind == "sum":
            if coeffs:
                out = sum(c * x for c, x in zip(coeffs, xs))
            else:
                out = sum(xs[1:], start=xs[0])
        elif kind == "prod":
            out = functools.reduce(jnp.multiply, xs)
        elif kind == "max":
            out = functools.reduce(jnp.maximum, xs)
        else:
            raise PipeError(f"eltwise: unknown op {kind!r}")
        return (out,)
    return fn


@lower_rule("Reduce")
def _lower_reduce(pipe: ConvPipe, op: ConvOp, ctx: LowerCtx) -> Callable:
    """N-ary elementwise sum (ref Reduce_coi, conv_util.cc:57): merges
    gradients from multiple consumers in add_bck_ops (conv_util.cc:844)."""
    def fn(*xs):
        return (sum(xs[1:], start=xs[0]),)
    return fn


# -- classification head ------------------------------------------------------------------

def _softmax(x, axis=1):
    x32 = x.astype(jnp.float32)
    m = jnp.max(x32, axis=axis, keepdims=True)
    e = jnp.exp(x32 - m)
    return e / jnp.sum(e, axis=axis, keepdims=True)


@lower_rule("Softmax")
def _lower_softmax(pipe, op, ctx):
    axis = int(op.p("axis", 1))

    def fn(x):
        return (_softmax(x, axis=axis).astype(x.dtype),)
    return fn


@lower_rule("SoftmaxWithLoss")
def _lower_sml(pipe: ConvPipe, op: ConvOp, ctx: LowerCtx) -> Callable:
    def fn(x, labels):
        prob = _softmax(x, axis=1)
        n_cls = x.shape[1]
        lab = labels.reshape(labels.shape[0]).astype(jnp.int32)
        lab = jnp.clip(lab, 0, n_cls - 1)
        if prob.ndim == 4:
            p = prob[jnp.arange(prob.shape[0]), lab, 0, 0]
        else:
            p = prob[jnp.arange(prob.shape[0]), lab]
        loss = -jnp.log(jnp.maximum(p, 1e-38))
        return (loss.astype(x.dtype), prob.astype(x.dtype))
    return fn


@lower_rule("Accuracy")
def _lower_accuracy(pipe: ConvPipe, op: ConvOp, ctx: LowerCtx) -> Callable:
    top_k = int(op.p("top_k", 1))

    def fn(x, labels):
        xf = x.reshape(x.shape[0], -1)
        lab = labels.reshape(labels.shape[0]).astype(jnp.int32)
        _, idx = lax.top_k(xf, top_k)
        hit = jnp.any(idx == lab[:, None], axis=1)
        return (hit.astype(jnp.float32),)
    return fn


@lower_rule("Data")
def _lower_data(pipe, op, ctx):
    def fn(x):
        return (x,)
    return fn


# -- backward ops (graph autodiff; see graph/autodiff.py) ---------------------------
#
# The reference also exposes EXPLICIT backward op types usable directly in
# hand-built graphs (ref conv_util.cc:40-64: Spreading {out, out_grad_loss,
# in} -> in_grad_loss with pooling params; ZeroIfNonPos {in, cond} -> out;
# BckDropout; BckLRN {in, out, out_grad_loss} -> in_grad_loss). These lower
# here with vjp-exact numerics; graph/autodiff.py's Bck op remains the
# mechanism add_bck_ops uses.


@lower_rule("Spreading")
def _lower_spreading(pipe: ConvPipe, op: ConvOp, ctx: LowerCtx) -> Callable:
    """Pooling backward: spread out_grad to the input positions that
    produced each pooled value (max: argmax positions; ave: uniform over
    the window) — vjp of the Pooling forward at `in`."""
    from .pipe import ConvOp as _Op
    pool_op = _Op(name=op.name + "__fwd", type="Pooling",
                  bots=[op.bots[2]], tops=[op.bots[0]], params=dict(op.params))
    fwd = lower_op(pipe, pool_op, ctx)

    def fn(out, og, x):
        import jax
        _, vjp = jax.vjp(lambda xi: fwd(xi)[0], x)
        return (vjp(og)[0].astype(x.dtype),)
    return fn


@lower_rule("ZeroIfNonPos")
def _lower_zinp(pipe: ConvPipe, op: ConvOp, ctx: LowerCtx) -> Callable:
    """ReLU backward: out = (cond > 0) ? in : 0 (ref ZeroIfNonPos_coi)."""
    def fn(x, cond):
        return (jnp.where(cond > 0, x, jnp.zeros((), x.dtype)),)
    return fn


@lower_rule("BckDropout")
def _lower_bck_dropout(pipe: ConvPipe, op: ConvOp, ctx: LowerCtx) -> Callable:
    """Dropout backward: grad through the same deterministic mask the
    forward drew (ctx.det_drop_seed + op-name hash keeps them aligned when
    the BckDropout op is named '<fwd_name>__bck')."""
    ratio = float(op.p("dropout_ratio", 0.5))
    # the activation input is optional: the reference's add_bck_ops builds
    # BckDropout with a single grad input (ref conv_util.cc:40)
    if not ctx.train:
        def fn(g, _act=None):
            return (g,)
        return fn
    base = op.name[:-5] if op.name.endswith("__bck") else op.name
    seed = ctx.det_drop_seed + (stable_hash(base) & 0xFFFF)

    def fn(g, _act=None):
        import jax
        key = jax.random.PRNGKey(seed)
        mask = jax.random.bernoulli(key, 1.0 - ratio, g.shape)
        return ((g * mask / (1.0 - ratio)).astype(g.dtype),)
    return fn


@lower_rule("BckLRN")
def _lower_bck_lrn(pipe: ConvPipe, op: ConvOp, ctx: LowerCtx) -> Callable:
    """LRN backward: vjp of the LRN forward at `in` (ref BckLRN_coi
    {in, out, out_grad_loss} -> in_grad_loss)."""
    from .pipe import ConvOp as _Op
    lrn_op = _Op(name=op.name + "__fwd", type="LRN",
                 bots=[op.bots[0]], tops=[op.bots[1]], params=dict(op.params))
    fwd = lower_op(pipe, lrn_op, ctx)

    def fn(x, out, og):
        import jax
        _, vjp = jax.vjp(lambda xi: fwd(xi)[0], x)
        return (vjp(og)[0].astype(x.dtype),)
    return fn


@lower_rule("Bck")
def _lower_bck(pipe: ConvPipe, op: ConvOp, ctx: LowerCtx) -> Callable:
    """Backward of one forward op = jax.vjp of its forward lowering.

    Structurally mirrors the reference's explicit backward ops (BckConv,
    Spreading, ZeroIfNonPos, BckLRN, BckDropout — ref conv_util.cc:753-877)
    while inheriting exact-adjoint numerics from the forward rule."""
    from .autodiff import _wants_grad
    fwd = pipe.ops[op.p("fwd_op")]
    fwd_fn = lower_op(pipe, fwd, ctx)
    n_fwd_bots = len(fwd.bots)
    grad_pos = [i for i, b in enumerate(fwd.bots) if _wants_grad(pipe, op, b)]
    top_has_grad = set(op.p("top_has_grad") or [])
    loss_node = op.p("loss_node")
    is_loss = fwd.type == "SoftmaxWithLoss"

    def fn(*args):
        fwd_ins = list(args[:n_fwd_bots])
        gs = list(args[n_fwd_bots:])

        def f(*grad_ins):
            full = list(fwd_ins)
            for pos, gi in zip(grad_pos, grad_ins):
                full[pos] = gi
            return fwd_fn(*full)

        primals = [fwd_ins[p] for p in grad_pos]
        outs, vjp = jax.vjp(f, *primals)
        cts = []
        gi = 0
        for t, out in zip(fwd.tops, outs):
            if is_loss and t == loss_node:
                cts.append(jnp.ones_like(out))  # d(sum loss)/d(loss_i) = 1
            elif t in top_has_grad:
                cts.append(gs[gi].astype(out.dtype))
                gi += 1
            else:
                cts.append(jnp.zeros_like(out))
        grads = vjp(tuple(cts))
        return tuple(g.astype(p.dtype) for g, p in zip(grads, primals))
    return fn


@lower_rule("GradAccum")
def _lower_gradaccum(pipe: ConvPipe, op: ConvOp, ctx: LowerCtx) -> Callable:
    def fn(*parts):
        out = parts[0]
        for p in parts[1:]:
            out = out + p
        return (out,)
    return fn
