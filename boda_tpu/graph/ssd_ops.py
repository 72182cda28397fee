"""SSD/RRC detection-net op set: Permute, Flatten, Reshape, Normalize,
PriorBox, DetectionOutput.

Parity target: the layer types used by the reference's detection nets
(ref nets/rrc/deploy.prototxt, nets/stratosnet-conv) — the reference consumes
them through Caffe (SSD fork); there is no CUCL kernel for them. TPU-native
design: all six lower to jax-traceable callables composed into the whole-net
jit program; DetectionOutput (decode + per-class NMS + cross-class top-k) is
implemented with FIXED shapes (lax.top_k + greedy NMS over a static
candidate count) so it compiles once — no dynamic shapes under jit.

Layout note: in the NHWC (Pallas) engine, canonical (img,chan,y,x) nodes are
physically NHWC; these ops run in LOGICAL layout, so each rule converts a
canonical-4D input back to NCHW first (one transpose; XLA folds it into the
neighboring ops). Nodes with non-canonical dim order (every tensor downstream
of a Permute) are physically logical already.
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .lowering import LowerCtx, _softmax, lower_rule
from .lowering_nhwc import _no_preps, nhwc_rule
from .pipe import ConvOp, ConvPipe, PipeError, _op_info
from ..utils.dims import Dims

_CANON = ("img", "chan", "y", "x")


def _is_canon4d(d: Dims) -> bool:
    return d.names == _CANON


# ---------------------------------------------------------------------------
# shape rules (ref conv_util.cc:405-530 calc_dims analog for the SSD set)
# ---------------------------------------------------------------------------

@_op_info("Permute")
def _calc_permute(pipe: ConvPipe, op: ConvOp) -> list[Dims]:
    ind = pipe.must_dims(op.bots[0])
    order = tuple(op.p("order"))
    if sorted(order) != list(range(len(ind))):
        raise PipeError(f"op {op.name!r}: bad permute order {order} for {ind}")
    return [Dims.make([ind.names[i] for i in order],
                      [ind.sizes[i] for i in order], ind.tn)]


def _flat_range(ind: Dims, op: ConvOp) -> tuple[int, int]:
    axis = int(op.p("axis", 1))
    end = int(op.p("end_axis", -1))
    n = len(ind)
    axis = axis % n
    end = end % n
    if axis > end:
        raise PipeError(f"op {op.name!r}: flatten axis {axis} > end_axis {end}")
    return axis, end


@_op_info("Flatten")
def _calc_flatten(pipe: ConvPipe, op: ConvOp) -> list[Dims]:
    ind = pipe.must_dims(op.bots[0])
    axis, end = _flat_range(ind, op)
    names = list(ind.names[:axis])
    sizes = list(ind.sizes[:axis])
    prod = 1
    for s in ind.sizes[axis:end + 1]:
        prod *= s
    kept_after = list(ind.names[end + 1:])
    flat_name = "chan" if "chan" not in names + kept_after else "flat"
    names.append(flat_name)
    sizes.append(prod)
    names += kept_after
    sizes += list(ind.sizes[end + 1:])
    return [Dims.make(names, sizes, ind.tn)]


@_op_info("Reshape")
def _calc_reshape(pipe: ConvPipe, op: ConvOp) -> list[Dims]:
    ind = pipe.must_dims(op.bots[0])
    spec = list(op.p("shape"))
    sizes, names = [], []
    infer_at = -1
    for i, s in enumerate(spec):
        s = int(s)
        if s == 0:  # copy from input (caffe ReshapeParameter semantics)
            if i >= len(ind):
                raise PipeError(f"op {op.name!r}: reshape dim 0 at {i} "
                                f"but input has {len(ind)} dims")
            sizes.append(ind.sizes[i])
            names.append(ind.names[i])
        elif s == -1:
            if infer_at >= 0:
                raise PipeError(f"op {op.name!r}: multiple -1 in reshape")
            infer_at = i
            sizes.append(-1)
            names.append(f"d{i}")
        else:
            sizes.append(s)
            names.append(f"d{i}")
    known = 1
    for s in sizes:
        if s > 0:
            known *= s
    if infer_at >= 0:
        if ind.num_elems() % known:
            raise PipeError(f"op {op.name!r}: cannot infer -1 "
                            f"({ind.num_elems()} % {known})")
        sizes[infer_at] = ind.num_elems() // known
    elif known != ind.num_elems():
        raise PipeError(f"op {op.name!r}: reshape {spec} size {known} != "
                        f"input {ind.num_elems()}")
    # dedupe names (a copied name may collide with a generated one)
    seen: set = set()
    for i, nm in enumerate(names):
        while nm in seen:
            nm = nm + "_"
        seen.add(nm)
        names[i] = nm
    return [Dims.make(names, sizes, ind.tn)]


@_op_info("Normalize", min_bots=2, max_bots=2)
def _calc_normalize(pipe: ConvPipe, op: ConvOp) -> list[Dims]:
    return [pipe.must_dims(op.bots[0])]


def _prior_geometry(op: ConvOp):
    """Expanded aspect-ratio list + per-location prior count (caffe SSD
    PriorBoxLayer::LayerSetUp semantics)."""
    mins = [float(v) for v in op.p("min_sizes")]
    maxs = [float(v) for v in op.p("max_sizes") or []]
    flip = bool(op.p("flip", True))
    ars = [1.0]
    for ar in op.p("aspect_ratios") or []:
        ar = float(ar)
        if any(abs(ar - a) < 1e-6 for a in ars):
            continue
        ars.append(ar)
        if flip:
            ars.append(1.0 / ar)
    n_per_loc = len(ars) * len(mins) + len(maxs)
    return mins, maxs, ars, n_per_loc


@_op_info("PriorBox", min_bots=2, max_bots=2)
def _calc_priorbox(pipe: ConvPipe, op: ConvOp) -> list[Dims]:
    fd = pipe.must_dims(op.bots[0])
    _, _, _, n_per_loc = _prior_geometry(op)
    n_priors = fd["y"] * fd["x"] * n_per_loc
    return [Dims.make(("img", "pv", "pbox"), (1, 2, n_priors * 4), fd.tn)]


@_op_info("DetectionOutput", min_bots=3, max_bots=3)
def _calc_detout(pipe: ConvPipe, op: ConvOp) -> list[Dims]:
    ind = pipe.must_dims(op.bots[0])
    keep = int(op.p("keep_top_k", 200))
    n = ind["img"] if "img" in ind.names else ind.sizes[0]
    # caffe emits (1,1,num_dets,7); we keep the fixed-shape padded analog
    return [Dims.make(("img", "lvl", "det", "attr"), (1, 1, n * keep, 7), ind.tn)]


# ---------------------------------------------------------------------------
# logical (NCHW-engine) lowerings
# ---------------------------------------------------------------------------

@lower_rule("Permute")
def _lower_permute(pipe: ConvPipe, op: ConvOp, ctx: LowerCtx) -> Callable:
    order = tuple(op.p("order"))

    def fn(x):
        return (x.transpose(order),)
    return fn


def _reshape_rule(pipe: ConvPipe, op: ConvOp) -> Callable:
    shape = pipe.must_dims(op.tops[0]).shape

    def fn(x):
        return (x.reshape(shape),)
    return fn


@lower_rule("Flatten")
def _lower_flatten(pipe: ConvPipe, op: ConvOp, ctx: LowerCtx) -> Callable:
    return _reshape_rule(pipe, op)


@lower_rule("Reshape")
def _lower_reshape(pipe: ConvPipe, op: ConvOp, ctx: LowerCtx) -> Callable:
    return _reshape_rule(pipe, op)


def _normalize_math(x, scales, *, chan_axis: int, across_spatial: bool,
                    eps: float, out_dtype):
    x32 = x.astype(jnp.float32)
    if across_spatial:
        red = tuple(range(1, x.ndim))
        norm = jnp.sqrt(jnp.sum(x32 * x32, axis=red, keepdims=True) + eps)
    else:
        norm = jnp.sqrt(jnp.sum(x32 * x32, axis=chan_axis, keepdims=True) + eps)
    shape = [1] * x.ndim
    shape[chan_axis] = -1
    s = scales.astype(jnp.float32)
    if s.size == 1:
        s = s.reshape(())
    else:
        s = s.reshape(shape)
    return (x32 / norm * s).astype(out_dtype)


@lower_rule("Normalize")
def _lower_normalize(pipe: ConvPipe, op: ConvOp, ctx: LowerCtx) -> Callable:
    across = bool(op.p("across_spatial", False))
    eps = float(op.p("eps", 1e-10))

    def fn(x, scales):
        return (_normalize_math(x, scales, chan_axis=1, across_spatial=across,
                                eps=eps, out_dtype=x.dtype),)
    return fn


def _compute_priors(op: ConvOp, feat_d: Dims, img_d: Dims) -> np.ndarray:
    """Host-side prior-box table (caffe SSD PriorBoxLayer::Forward_cpu).
    Returns (2, n_priors*4) float32: row 0 = boxes, row 1 = variances."""
    mins, maxs, ars, n_per_loc = _prior_geometry(op)
    clip = bool(op.p("clip", False))
    offset = float(op.p("offset", 0.5))
    variance = [float(v) for v in op.p("variance") or [0.1]]
    if len(variance) == 1:
        variance = variance * 4
    lh, lw = feat_d["y"], feat_d["x"]
    ih, iw = img_d["y"], img_d["x"]
    step_h = float(op.p("step_h", 0) or op.p("step", 0)) or ih / lh
    step_w = float(op.p("step_w", 0) or op.p("step", 0)) or iw / lw
    boxes = np.empty((lh, lw, n_per_loc, 4), np.float32)
    wh = []
    for mn in mins:
        wh.append((mn, mn))                      # ar=1
        for mx in maxs:
            s = math.sqrt(mn * mx)               # second ar=1 box
            wh.append((s, s))
        for ar in ars[1:]:
            wh.append((mn * math.sqrt(ar), mn / math.sqrt(ar)))
    assert len(wh) == n_per_loc
    cy = (np.arange(lh, dtype=np.float32) + offset) * step_h
    cx = (np.arange(lw, dtype=np.float32) + offset) * step_w
    for k, (bw, bh) in enumerate(wh):
        boxes[:, :, k, 0] = (cx[None, :] - bw / 2.0) / iw
        boxes[:, :, k, 1] = (cy[:, None] - bh / 2.0) / ih
        boxes[:, :, k, 2] = (cx[None, :] + bw / 2.0) / iw
        boxes[:, :, k, 3] = (cy[:, None] + bh / 2.0) / ih
    if clip:
        boxes = np.clip(boxes, 0.0, 1.0)
    flat = boxes.reshape(-1)
    var = np.tile(np.asarray(variance, np.float32), flat.size // 4)
    return np.stack([flat, var])


@lower_rule("PriorBox")
def _lower_priorbox(pipe: ConvPipe, op: ConvOp, ctx: LowerCtx) -> Callable:
    pri = _compute_priors(op, pipe.must_dims(op.bots[0]),
                          pipe.must_dims(op.bots[1]))[None]  # (1,2,P*4)

    def fn(feat, data):
        return (jnp.asarray(pri),)
    return fn


# -- DetectionOutput ---------------------------------------------------------

def _decode_center_size(loc, pb, pv):
    """CENTER_SIZE decode (caffe bbox_util DecodeBBox, variance-scaled)."""
    pw = pb[:, 2] - pb[:, 0]
    ph = pb[:, 3] - pb[:, 1]
    pcx = (pb[:, 0] + pb[:, 2]) * 0.5
    pcy = (pb[:, 1] + pb[:, 3]) * 0.5
    cx = pv[:, 0] * loc[..., 0] * pw + pcx
    cy = pv[:, 1] * loc[..., 1] * ph + pcy
    w = jnp.exp(pv[:, 2] * loc[..., 2]) * pw
    h = jnp.exp(pv[:, 3] * loc[..., 3]) * ph
    return jnp.stack([cx - w * 0.5, cy - h * 0.5,
                      cx + w * 0.5, cy + h * 0.5], axis=-1)


def _decode_corner(loc, pb, pv):
    return pb[None] + pv[None] * loc


def _pairwise_iou(b):
    """(K,4) -> (K,K) IoU (caffe JaccardOverlap semantics)."""
    area = jnp.maximum(b[:, 2] - b[:, 0], 0) * jnp.maximum(b[:, 3] - b[:, 1], 0)
    x0 = jnp.maximum(b[:, None, 0], b[None, :, 0])
    y0 = jnp.maximum(b[:, None, 1], b[None, :, 1])
    x1 = jnp.minimum(b[:, None, 2], b[None, :, 2])
    y1 = jnp.minimum(b[:, None, 3], b[None, :, 3])
    inter = jnp.maximum(x1 - x0, 0) * jnp.maximum(y1 - y0, 0)
    union = area[:, None] + area[None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


def _greedy_nms(scores, boxes, k, nms_thresh, conf_thresh,
                method: str = "loop"):
    """Fixed-shape greedy NMS: top-k by score, then suppression.
    Returns (scores_k, boxes_k, keep_mask_k).

    method="loop" (default) is the k-step sequential suppression.
    method="fixpoint" computes the EXACT same greedy result by iterating
    the suppression recurrence in parallel (K[i] = ok[i] & not any_{j<i}
    (K[j] & iou[j,i] > t) has a unique solution; full reapplication
    converges within suppression-chain depth). MEASURED NULL on v5e
    whole-net ssd300 b32 (2026-08-21): 674 vs 1,009 img/s — under the
    batch*class vmap the while_loop re-reads the (C',k,k) IoU tensor
    every iteration and runs until the LAST lane converges (gen-data's
    clustered boxes make deep suppression chains), losing to the fori
    loop's k cheap steps. Kept selectable: on real (sparse-overlap)
    detections the chain depth is shallow, and the exactness gate in
    tests covers both forms."""
    sc, idx = lax.top_k(scores, k)
    b = boxes[idx]
    iou = _pairwise_iou(b)
    rng = jnp.arange(k)

    if method == "loop":
        def body(i, keep):
            earlier = keep & (rng < i)
            suppressed = jnp.any(earlier & (iou[:, i] > nms_thresh))
            ok = (sc[i] > conf_thresh) & jnp.logical_not(suppressed)
            return keep.at[i].set(ok)

        keep = lax.fori_loop(0, k, body, jnp.zeros((k,), bool))
        return sc, b, keep

    ok0 = sc > conf_thresh
    # M[j,i]: an earlier KEPT j would suppress i (strict upper triangle:
    # top_k emits descending scores, ties resolved by index order exactly
    # like the sequential loop)
    sup_m = ((iou > nms_thresh) & (rng[:, None] < rng[None, :])) \
        .astype(jnp.float32)

    def cond(st):
        _, changed, it = st
        return changed & (it < k)

    def body(st):
        keep, _, it = st
        sup = (keep.astype(jnp.float32) @ sup_m) > 0.5
        kn = ok0 & jnp.logical_not(sup)
        return kn, jnp.any(kn != keep), it + 1

    keep, _, _ = lax.while_loop(cond, body,
                                (ok0, jnp.bool_(True), jnp.int32(0)))
    return sc, b, keep


def _detection_output_fn(op: ConvOp, n_classes: int, top_k_override: int = 0):
    bg = int(op.p("background_label_id", 0))
    share = bool(op.p("share_location", True))
    nms_thresh = float(op.p("nms_threshold", 0.3))
    top_k = int(op.p("top_k", 400) or 400)
    if top_k_override:
        # serving knob (tune.det_top_k): the NMS candidate count is the
        # latency knob of the detection head — the suppression loop and
        # IoU matrix scale with it and are batch-invariant, so at
        # latency-shaped batches the head is ~2/3 of the forward
        # (model_census round 5: ssd300 b4 = 5.8 ms, head ~66%). Caffe
        # parity needs the prototxt's own top_k (default 400); overriding
        # DROPS candidates below the new rank and is an accuracy/latency
        # trade the operator opts into per deployment.
        top_k = top_k_override
    keep_top_k = int(op.p("keep_top_k", 200))
    conf_thresh = float(op.p("confidence_threshold", 0.01))
    code = op.p("code_type", "CENTER_SIZE")
    if not share:
        raise PipeError(f"op {op.name!r}: share_location=false unsupported")

    def fn(loc, conf, priors):
        n = loc.shape[0]
        pb = priors[0, 0].reshape(-1, 4).astype(jnp.float32)
        pv = priors[0, 1].reshape(-1, 4).astype(jnp.float32)
        p = pb.shape[0]
        k = min(top_k, p)
        locs = loc.reshape(n, p, 4).astype(jnp.float32)
        confs = conf.reshape(n, p, n_classes).astype(jnp.float32)
        dec = (_decode_center_size(locs, pb, pv) if code == "CENTER_SIZE"
               else _decode_corner(locs, pb, pv))

        cls_ids = np.asarray([c for c in range(n_classes) if c != bg])

        def per_image(boxes_i, conf_i):
            # class axis VECTORIZED through the greedy-NMS suppression loop
            # (vmap over per-class score rows): one 400-step sequential loop
            # over (C', k)-batched operands instead of C' separate loops —
            # the b32 ssd300 head measured ~38ms/fwd with per-class loops
            # (8000 sequential steps of lane-starved work)
            conf_c = conf_i[:, cls_ids].T                       # (C', p)
            sc, b, keep = jax.vmap(
                lambda s: _greedy_nms(s, boxes_i, k,
                                      nms_thresh, conf_thresh))(conf_c)
            sck = jnp.where(keep, sc, -1.0)                     # (C', k)
            lab = jnp.broadcast_to(
                jnp.asarray(cls_ids, jnp.float32)[:, None], sck.shape)
            allr = jnp.concatenate(
                [lab[..., None], sck[..., None], b],
                axis=2).reshape(-1, 6)                          # (C'*k, 6)
            best, bidx = lax.top_k(allr[:, 1], min(keep_top_k, allr.shape[0]))
            sel = allr[bidx]
            valid = sel[:, 1] > 0
            lab = jnp.where(valid, sel[:, 0], -1.0)
            sc = jnp.where(valid, sel[:, 1], 0.0)
            out = jnp.concatenate([lab[:, None], sc[:, None], sel[:, 2:]],
                                  axis=1)            # (keep, 6)
            if out.shape[0] < keep_top_k:
                pad = jnp.zeros((keep_top_k - out.shape[0], 6), out.dtype)
                pad = pad.at[:, 0].set(-1.0)
                out = jnp.concatenate([out, pad], axis=0)
            return out

        per = jax.vmap(per_image)(dec, confs)        # (n, keep, 6)
        img_id = jnp.broadcast_to(
            jnp.arange(n, dtype=jnp.float32)[:, None, None],
            (n, per.shape[1], 1))
        dets = jnp.concatenate([img_id, per], axis=2).reshape(1, 1, -1, 7)
        return (dets.astype(loc.dtype),)
    return fn


@lower_rule("DetectionOutput")
def _lower_detout(pipe: ConvPipe, op: ConvOp, ctx: LowerCtx) -> Callable:
    return _detection_output_fn(op, int(op.p("num_classes")))


# ---------------------------------------------------------------------------
# NHWC-engine rules: convert canonical-4D (physically NHWC) inputs to logical
# layout, then run the logical math
# ---------------------------------------------------------------------------

def _nhwc_logicalize(pipe: ConvPipe, op: ConvOp, fn: Callable,
                     n_data_bots: int = 1) -> Callable:
    """Wrap fn so canonical-4D data inputs arrive logically (NCHW)."""
    need = [i for i in range(n_data_bots)
            if _is_canon4d(pipe.must_dims(op.bots[i]))]
    if not need:
        return fn

    def wrapped(*args):
        args = list(args)
        for i in need:
            args[i] = args[i].transpose(0, 3, 1, 2)
        return fn(*args)
    return wrapped


@nhwc_rule("Permute")
def _nhwc_permute(pipe, op, ctx, tune, info_log):
    order = tuple(op.p("order"))
    ind = pipe.must_dims(op.bots[0])
    if _is_canon4d(ind):
        # input is physically (img,y,x,chan) = logical axes (0,2,3,1);
        # produce the logical permute directly from the physical layout
        phys_of_logical = {0: 0, 2: 1, 3: 2, 1: 3}
        perm = tuple(phys_of_logical[o] for o in order)

        def fn(x):
            return (x.transpose(perm),)
        return _no_preps(fn)

    def fn(x):
        return (x.transpose(order),)
    return _no_preps(fn)


@nhwc_rule("Flatten")
def _nhwc_flatten(pipe, op, ctx, tune, info_log):
    return _no_preps(_nhwc_logicalize(pipe, op, _reshape_rule(pipe, op)))


@nhwc_rule("Reshape")
def _nhwc_reshape(pipe, op, ctx, tune, info_log):
    return _no_preps(_nhwc_logicalize(pipe, op, _reshape_rule(pipe, op)))


@nhwc_rule("Normalize")
def _nhwc_normalize(pipe, op, ctx, tune, info_log):
    across = bool(op.p("across_spatial", False))
    eps = float(op.p("eps", 1e-10))
    canon = _is_canon4d(pipe.must_dims(op.bots[0]))
    chan_axis = 3 if canon else 1

    def fn(x, scales):
        return (_normalize_math(x, scales, chan_axis=chan_axis,
                                across_spatial=across, eps=eps,
                                out_dtype=x.dtype),)
    return _no_preps(fn)


@nhwc_rule("PriorBox")
def _nhwc_priorbox(pipe, op, ctx, tune, info_log):
    pri = _compute_priors(op, pipe.must_dims(op.bots[0]),
                          pipe.must_dims(op.bots[1]))[None]

    def fn(feat, data):
        return (jnp.asarray(pri),)
    return _no_preps(fn)


@nhwc_rule("DetectionOutput")
def _nhwc_detout(pipe, op, ctx, tune, info_log):
    k_over = int(getattr(tune, "det_top_k", 0))
    if k_over:
        info_log.append(f"{op.name}: det_top_k={k_over} (serving latency "
                        f"knob; caffe parity uses the prototxt top_k)")
    fn = _detection_output_fn(op, int(op.p("num_classes")),
                              top_k_override=k_over)
    return _no_preps(_nhwc_logicalize(pipe, op, fn, n_data_bots=3))
