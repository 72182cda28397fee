"""Training step over a ConvPipe: loss + gradients + SGD, mesh-shardable.

The reference is inference-only but carries graph-level autodiff
(``add_bck_ops``, ref src/conv_util.cc:753-877) used by its gradient
regression tests. Here the production training path is jax.value_and_grad
over the whole-net function (TPU-idiomatic: one XLA program containing
forward+backward+update, sharded via pjit); the graph-level backward for
digest parity lives in graph/autodiff.py.
"""

from __future__ import annotations

from typing import Callable, Optional

from ..graph.lowering import LowerCtx, lower_op
from ..graph.pipe import ConvPipe


def find_logits_node(pipe: ConvPipe, prob_node: str = "prob") -> str:
    """The input of the Softmax producing ``prob_node`` (pre-softmax logits)."""
    node = pipe.nodes.get(prob_node)
    if node and node.top_for:
        op = pipe.ops[node.top_for[0]]
        if op.type == "Softmax":
            return op.bots[0]
    return prob_node


def spatial_segments(pipe: ConvPipe) -> list[list[str]]:
    """Partition the topo op order at spatial-resolution boundaries.

    The segments are the natural checkpoints for structured remat: for a
    staged CNN (resnet50: 112/56/28/14/7) this yields ~5 segments, so
    checkpointing each segment costs ~one extra forward total while only
    boundary activations (+ one segment's internals) stay live."""
    segs: list[list[str]] = []
    cur: list[str] = []
    prev_y = None
    for op_name in pipe.topo_op_order():
        op = pipe.ops[op_name]
        y = None
        for t in op.tops:
            node = pipe.nodes.get(t)
            d = node.dims if node is not None else None
            if d is not None and "y" in d:
                y = d["y"]
                break
        if cur and y is not None and prev_y is not None and y != prev_y:
            segs.append(cur)
            cur = []
        cur.append(op_name)
        if y is not None:
            prev_y = y
    if cur:
        segs.append(cur)
    return segs


def build_net_fn(pipe: ConvPipe, out_names: list[str],
                 ctx: Optional[LowerCtx] = None,
                 bn_momentum: float = 0.0,
                 segments: Optional[list[list[str]]] = None) -> Callable:
    """Pure fn(weights_dict, inputs_dict) -> {name: array} over stock-XLA ops.

    bn_momentum > 0 switches BatchNorm ops to TRAINING semantics: normalize
    with the current batch's statistics and return EMA-updated running
    stats under the extra output key "__bn_stats__" (new = (1-m)*old +
    m*batch). The reference has no training loop at all (SURVEY §2), so
    inference-stats BN is its only semantic; this is the standard
    train-mode extension users of a training step expect.

    segments (from ``spatial_segments``) wraps each op segment in
    ``jax.checkpoint`` (structured remat): the backward recomputes one
    segment at a time from its boundary inputs — ~1 extra forward total.
    Wrapping the WHOLE net in one policy-remat instead (the old
    ``remat=dots``) measured 4.6x slower on v5e (31.7 vs 146 TF/s): conv
    outputs aren't 'dots', so each layer's cotangent recomputed a prefix of
    the block and XLA did not CSE the cascade."""
    import jax.numpy as jnp
    ctx = ctx or LowerCtx(train=True)
    topo = pipe.topo_op_order()
    lowered = {name: lower_op(pipe, pipe.ops[name], ctx) for name in topo}

    from ..graph import train_ops

    def _bn_train(op, vals, new_stats):
        x = vals[op.bots[0]]
        eps = float(op.p("eps", 1e-5))
        if train_ops.enabled():
            # fused hand-derived backward (2-phase, ~2.5 HBM passes vs
            # autodiff's ~6 — train_ceiling.md); fwd math is identical
            out, m_b, v_b = train_ops.make_bn_train(eps)(x)
        else:
            xf = x.astype(jnp.float32)
            m_b = xf.mean(axis=(0, 2, 3))
            v_b = xf.var(axis=(0, 2, 3))
            out = ((xf - m_b.reshape(1, -1, 1, 1))
                   * jax.lax.rsqrt(v_b.reshape(1, -1, 1, 1) + eps))
        # running stats are stored caffe-style (sums + scale factor sf);
        # emit the UNSCALED running values with sf pinned to 1
        mean_w, var_w = op.bots[1], op.bots[2]
        sf = vals[op.bots[3]][0].astype(jnp.float32) \
            if len(op.bots) > 3 else jnp.float32(1.0)
        inv_sf = jnp.where(sf != 0, 1.0 / sf, 1.0)
        old_m = vals[mean_w].astype(jnp.float32) * inv_sf
        old_v = vals[var_w].astype(jnp.float32) * inv_sf
        new_stats[mean_w] = ((1 - bn_momentum) * old_m
                             + bn_momentum * m_b).astype(vals[mean_w].dtype)
        new_stats[var_w] = ((1 - bn_momentum) * old_v
                            + bn_momentum * v_b).astype(vals[var_w].dtype)
        if len(op.bots) > 3:
            new_stats[op.bots[3]] = jnp.ones_like(vals[op.bots[3]])
        return (out.astype(x.dtype),)

    import jax

    def _run_ops(op_names, vals, new_stats):
        for op_name in op_names:
            op = pipe.ops[op_name]
            # named_scope: op names survive into HLO op_name metadata on BOTH
            # the forward ops and their autodiff adjoints (JAX keeps the name
            # stack through jvp/transpose), so train_trace can attribute
            # per-op fwd AND bwd device time (the reference's per-call timing
            # role, ref src/rtc_fwd.cc:560-572, extended to training)
            with jax.named_scope(op_name):
                if bn_momentum > 0 and op.type == "BatchNorm":
                    outs = _bn_train(op, vals, new_stats)
                else:
                    outs = lowered[op_name](*[vals[b] for b in op.bots])
            vals.update(zip(op.tops, outs))

    if segments is None:
        def net_fn(weights, inputs):
            vals = dict(inputs)
            vals.update(weights)
            new_stats = {}
            _run_ops(topo, vals, new_stats)
            res = {n: vals[n] for n in out_names}
            if bn_momentum > 0:
                res["__bn_stats__"] = new_stats
            return res

        return net_fn

    # structured remat: per-segment in/out name sets, each segment fn
    # checkpointed (saves only its boundary inputs; internals recomputed
    # during that segment's backward)
    need = set(out_names)  # names needed AFTER each segment, built backwards
    seg_ins: list[set] = [set() for _ in segments]
    seg_outs: list[set] = [set() for _ in segments]
    for i in range(len(segments) - 1, -1, -1):
        prod = {t for op_name in segments[i]
                for t in pipe.ops[op_name].tops}
        seg_outs[i] = prod & need
        cons = {b for op_name in segments[i]
                for b in pipe.ops[op_name].bots}
        seg_ins[i] = cons - prod  # bots not produced within the segment
        need = (need - prod) | seg_ins[i]

    def _make_seg(seg_ops, outs_s):
        def f(vin):
            vals = dict(vin)
            stats = {}
            _run_ops(seg_ops, vals, stats)
            return {n: vals[n] for n in outs_s}, stats
        return jax.checkpoint(f)

    seg_fns = [(_make_seg(s, seg_outs[i]), sorted(seg_ins[i]))
               for i, s in enumerate(segments)]

    def net_fn(weights, inputs):
        vals = dict(inputs)
        vals.update(weights)
        new_stats = {}
        for f, ins_s in seg_fns:
            outs, stats = f({n: vals[n] for n in ins_s})
            vals.update(outs)
            new_stats.update(stats)
        res = {n: vals[n] for n in out_names}
        if bn_momentum > 0:
            res["__bn_stats__"] = new_stats
        return res

    return net_fn


# weight-name suffixes that are statistics, not trainable parameters
_FROZEN_SUFFIXES = ("__means", "__vars", "__sf")


def is_trainable(name: str) -> bool:
    return not name.endswith(_FROZEN_SUFFIXES)


def make_train_step(pipe: ConvPipe, logits_node: str, lr: float = 0.01,
                    precision: str = "default", clip_norm: float = 0.0,
                    momentum: float = 0.0, weight_decay: float = 0.0,
                    bn_momentum: float = 0.0,
                    compute_dtype=None,
                    lr_schedule: Optional[Callable] = None,
                    remat: str = "") -> Callable:
    """SGD(+momentum, +decoupled weight decay) step:
    fn(weights, x_dict, labels[, mom_state]) -> (loss, new_weights)
    — or (loss, new_weights, new_mom_state) when momentum > 0 (pass the
    previous mom_state or None to start from zeros; f32 regardless of the
    weight dtype). BatchNorm statistics blobs (means/vars/scale-factor) are
    frozen — gradients flow through them but SGD does not update them.
    clip_norm>0 applies global-norm gradient clipping (in f32) before the
    update — necessary for low-precision weights on nets whose fabricated
    BN stats don't actually normalize (residual variance growth makes raw
    grads overflow bf16). compute_dtype (e.g. jnp.bfloat16) enables
    mixed-precision training with f32 master weights: pass f32 weights,
    forward/backward run in compute_dtype, updates apply to the masters.
    lr_schedule (see parallel.schedules.make_lr_schedule) makes the step
    take a trailing ``step=`` index and derive lr from it inside the jit
    (one compiled program for the whole run, no per-step recompiles).
    remat rematerializes the forward during the backward pass
    (jax.checkpoint), trading FLOPs for activation HBM — the standard TPU
    lever for fitting larger batches/deeper nets per chip:
      "seg"   checkpoint each spatial stage (structured remat: ~1 extra
              forward total, only boundary activations + one stage's
              internals live — the recommended form; see build_net_fn)
      "full"  one whole-net checkpoint: recompute everything (cheapest
              memory; backward cost grows with net depth)
      "dots"  whole-net checkpoint_dots policy — MEASURED PATHOLOGICAL on
              conv nets (v5e: 4.6x slower; conv outputs aren't dots, the
              per-layer recompute cascade doesn't CSE); kept for
              completeness, prefer "seg"."""
    import jax
    import jax.numpy as jnp
    lctx = LowerCtx(precision=precision, train=True, det_drop_seed=42)
    if remat == "seg":
        net_fn = build_net_fn(pipe, [logits_node], lctx,
                              bn_momentum=bn_momentum,
                              segments=spatial_segments(pipe))
    else:
        net_fn = build_net_fn(pipe, [logits_node], lctx,
                              bn_momentum=bn_momentum)
        if remat:
            policies = {"full": None,
                        "dots": jax.checkpoint_policies.checkpoint_dots}
            if remat not in policies:
                raise ValueError(f"remat must be one of "
                                 f"{sorted(policies) + ['seg']} "
                                 f"or '', not {remat!r}")
            net_fn = jax.checkpoint(net_fn, policy=policies[remat])

    def loss_fn(train_w, frozen_w, inputs, labels):
        res = net_fn({**train_w, **frozen_w}, inputs)
        logits = res[logits_node]
        # __loss__ scope: lets train_trace attribute softmax-CE time apart
        # from net ops (its adjoint is likewise tagged)
        with jax.named_scope("__loss__"):
            logits = logits.reshape(logits.shape[0], -1).astype(jnp.float32)
            logp = jax.nn.log_softmax(logits, axis=-1)
            nll = -jnp.take_along_axis(logp, labels.reshape(-1, 1), axis=1)
            return jnp.mean(nll), res.get("__bn_stats__", {})

    def train_step(weights, inputs, labels, mom_state=None, step=None):
        lr_t = lr if lr_schedule is None else lr_schedule(step)
        train_w = {k: v for k, v in weights.items() if is_trainable(k)}
        frozen_w = {k: v for k, v in weights.items() if not is_trainable(k)}
        if compute_dtype is not None:
            # f32 master weights: forward/backward in the compute dtype,
            # update applied to the f32 masters (mixed-precision training)
            cast_w = {k: v.astype(compute_dtype) for k, v in train_w.items()}
            # frozen BN statistics stay f32: they feed the running-stat EMA,
            # and deriving new = (1-m)*old + m*batch from bf16 round-trips of
            # the masters accumulates quantization error over long runs
            cast_f = frozen_w
            cast_in = {k: (v.astype(compute_dtype)
                           if jnp.issubdtype(v.dtype, jnp.floating) else v)
                       for k, v in inputs.items()}
            (loss, bn_stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(cast_w, cast_f, cast_in, labels)
            bn_stats = {k: v.astype(weights[k].dtype)
                        for k, v in bn_stats.items()}
        else:
            (loss, bn_stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(train_w, frozen_w, inputs, labels)
        # __update__ scope: clip + momentum + SGD apply, attributed apart
        # from the net's fwd/bwd ops by train_trace
        with jax.named_scope("__update__"):
            grads = jax.tree_util.tree_map(
                lambda g: g.astype(jnp.float32), grads)
            if clip_norm > 0:
                gnorm = jnp.sqrt(sum(
                    jnp.sum(jnp.square(g))
                    for g in jax.tree_util.tree_leaves(grads)))
                scale = jnp.minimum(1.0,
                                    clip_norm / jnp.maximum(gnorm, 1e-12))
                grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
            if momentum > 0:
                if mom_state is None:
                    mom_state = jax.tree_util.tree_map(
                        lambda g: jnp.zeros_like(g), grads)
                mom_state = jax.tree_util.tree_map(
                    lambda m, g: momentum * m + g, mom_state, grads)
                grads = mom_state
            def upd(w, g):
                delta = lr_t * g
                if weight_decay > 0:  # decoupled (AdamW-style) decay
                    delta = delta + lr_t * weight_decay \
                        * w.astype(jnp.float32)
                return (w.astype(jnp.float32) - delta).astype(w.dtype)
            new_w = jax.tree_util.tree_map(upd, train_w, grads)
            new_w.update(frozen_w)
            new_w.update(bn_stats)  # EMA running stats (train-mode BN)
        if momentum > 0:
            return loss, new_w, mom_state
        return loss, new_w

    return train_step
