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


def build_net_fn(pipe: ConvPipe, out_names: list[str],
                 ctx: Optional[LowerCtx] = None) -> Callable:
    """Pure fn(weights_dict, inputs_dict) -> {name: array} over stock-XLA ops."""
    ctx = ctx or LowerCtx(train=True)
    topo = pipe.topo_op_order()
    lowered = {name: lower_op(pipe, pipe.ops[name], ctx) for name in topo}

    def net_fn(weights, inputs):
        vals = dict(inputs)
        vals.update(weights)
        for op_name in topo:
            op = pipe.ops[op_name]
            outs = lowered[op_name](*[vals[b] for b in op.bots])
            vals.update(zip(op.tops, outs))
        return {n: vals[n] for n in out_names}

    return net_fn


# weight-name suffixes that are statistics, not trainable parameters
_FROZEN_SUFFIXES = ("__means", "__vars", "__sf")


def is_trainable(name: str) -> bool:
    return not name.endswith(_FROZEN_SUFFIXES)


def make_train_step(pipe: ConvPipe, logits_node: str, lr: float = 0.01,
                    precision: str = "default", clip_norm: float = 0.0,
                    momentum: float = 0.0,
                    weight_decay: float = 0.0) -> Callable:
    """SGD(+momentum, +decoupled weight decay) step:
    fn(weights, x_dict, labels[, mom_state]) -> (loss, new_weights)
    — or (loss, new_weights, new_mom_state) when momentum > 0 (pass the
    previous mom_state or None to start from zeros; f32 regardless of the
    weight dtype). BatchNorm statistics blobs (means/vars/scale-factor) are
    frozen — gradients flow through them but SGD does not update them.
    clip_norm>0 applies global-norm gradient clipping (in f32) before the
    update — necessary for low-precision weights on nets whose fabricated
    BN stats don't actually normalize (residual variance growth makes raw
    grads overflow bf16)."""
    import jax
    import jax.numpy as jnp
    net_fn = build_net_fn(pipe, [logits_node],
                          LowerCtx(precision=precision, train=True,
                                   det_drop_seed=42))

    def loss_fn(train_w, frozen_w, inputs, labels):
        logits = net_fn({**train_w, **frozen_w}, inputs)[logits_node]
        logits = logits.reshape(logits.shape[0], -1).astype(jnp.float32)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, labels.reshape(-1, 1), axis=1)
        return jnp.mean(nll)

    def train_step(weights, inputs, labels, mom_state=None):
        train_w = {k: v for k, v in weights.items() if is_trainable(k)}
        frozen_w = {k: v for k, v in weights.items() if not is_trainable(k)}
        loss, grads = jax.value_and_grad(loss_fn)(train_w, frozen_w, inputs,
                                                  labels)
        grads = jax.tree_util.tree_map(
            lambda g: g.astype(jnp.float32), grads)
        if clip_norm > 0:
            gnorm = jnp.sqrt(sum(
                jnp.sum(jnp.square(g))
                for g in jax.tree_util.tree_leaves(grads)))
            scale = jnp.minimum(1.0, clip_norm / jnp.maximum(gnorm, 1e-12))
            grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
        if momentum > 0:
            if mom_state is None:
                mom_state = jax.tree_util.tree_map(
                    lambda g: jnp.zeros_like(g), grads)
            mom_state = jax.tree_util.tree_map(
                lambda m, g: momentum * m + g, mom_state, grads)
            grads = mom_state
        def upd(w, g):
            step = lr * g
            if weight_decay > 0:  # decoupled (AdamW-style) decay
                step = step + lr * weight_decay * w.astype(jnp.float32)
            return (w.astype(jnp.float32) - step).astype(w.dtype)
        new_w = jax.tree_util.tree_map(upd, train_w, grads)
        new_w.update(frozen_w)
        if momentum > 0:
            return loss, new_w, mom_state
        return loss, new_w

    return train_step
