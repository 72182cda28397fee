"""train_bench: steady-state training-step throughput on the local device.

Parity target: the training-side performance role of the reference's
generated backward kernels (ref cnn_codegen.cc:44-136, test/rtc/bconv.cucl)
— here the step is jax.value_and_grad over the whole-net program (exact
adjoints of the same lowering the forward uses) with SGD fused into the
same jit. Chaining runs REAL consecutive steps (the weight carry makes
each step depend on the previous), so high-latency dispatch paths measure
device time, not dispatch jitter.
"""

from __future__ import annotations

import json

import numpy as np

from .. import graph  # noqa: F401
from ..config import Field, Mode, register
from .cnet import load_net


@register("mode", "train_bench", help="training-step throughput benchmark")
class TrainBench(Mode):
    model = Field(str, default="resnet50", help="zoo model")
    ptt_fn = Field("filename", default="", help="caffe prototxt")
    img = Field(int, default="32", help="batch size")
    lr = Field(float, default="0.01", help="SGD learning rate")
    clip_norm = Field(float, default="1.0", help="global-norm grad clip (0=off)")
    momentum = Field(float, default="0.0", help="SGD momentum (0=plain SGD)")
    weight_decay = Field(float, default="0.0", help="decoupled weight decay")
    bn_momentum = Field(float, default="0.0", help="train-mode BN EMA rate (0=inference-stats BN)")
    master_f32 = Field(bool, default="0", help="f32 master weights (compute in compute_tn)")
    remat = Field(str, default="", help="rematerialization: '' | seg | full | dots")
    compute_tn = Field(str, default="bfloat16", help="weight/activation dtype ('' = f32)")
    chain = Field(int, default="4", help="steps chained per dispatch")
    n_iters = Field(int, default="12", help="timed dispatches")
    n_best = Field(int, default="3", help="best-of-N timing repeats")
    golden_out = Field(bool, default="0",
                       help="omit timing fields (deterministic golden output)")

    def main(self) -> None:
        import jax
        import jax.numpy as jnp
        from jax import lax

        from ..parallel.train import find_logits_node, make_train_step
        from ..ops.kernels.gen_data import gen_data_pattern
        from ..rtc.backends import time_diff_method
        pipe, in_dims = load_net(self.model, self.ptt_fn, "", self.img, 0)
        logits = find_logits_node(pipe)
        step = make_train_step(pipe, logits, lr=self.lr,
                               clip_norm=self.clip_norm,
                               momentum=self.momentum,
                               weight_decay=self.weight_decay,
                               bn_momentum=self.bn_momentum,
                               compute_dtype=(jnp.dtype(self.compute_tn)
                                              if self.master_f32 and
                                              self.compute_tn else None),
                               remat=self.remat)
        d = in_dims["data"]
        cdt = jnp.dtype(self.compute_tn) if self.compute_tn else jnp.float32
        dev = jax.devices()[0]
        # all weights in the compute dtype (matching the engines' _cast_w;
        # mixed dtypes would break conv dtype agreement mid-net) — or f32
        # masters when master_f32 is set (the step casts per forward)
        wdt = np.float32 if self.master_f32 else cdt
        weights = {k: jax.device_put(np.asarray(w.data, np.float32)
                                     .astype(wdt), dev)
                   for k, w in pipe.weights.items()}
        x = jax.device_put(np.asarray(
            gen_data_pattern(d.shape, d.tn)).astype(cdt), dev)
        n_cls = int(np.prod(pipe.nodes[logits].dims.shape)) // self.img
        labels = jax.device_put(
            (np.arange(self.img) % n_cls).astype(np.int32), dev)

        use_mom = self.momentum > 0
        if use_mom:
            mom0 = {k: jnp.zeros(v.shape, jnp.float32)
                    for k, v in weights.items()
                    if not k.endswith(("__means", "__vars", "__sf"))}

        def chained(w):
            def body(carry, _):
                if use_mom:
                    cw, cm = carry
                    loss, nw, nm = step(cw, {"data": x}, labels, cm)
                    return (nw, nm), loss
                loss, nw = step(carry, {"data": x}, labels)
                return nw, loss
            carry0 = (w, mom0) if use_mom else w
            nw, losses = lax.scan(body, carry0, None, length=self.chain)
            return losses, nw

        cfn = jax.jit(chained)
        losses, _ = cfn(weights)  # compile + sanity
        l0, l1 = float(losses[0]), float(losses[-1])
        secs = min(
            time_diff_method(
                lambda: cfn(weights),
                lambda outs: jax.tree_util.tree_map(
                    lambda a: a.block_until_ready()
                    if hasattr(a, "block_until_ready") else a, outs),
                n_iters=max(1, self.n_iters // self.chain), warmup=1)
            for _ in range(self.n_best)) / self.chain
        fwd_fl = pipe.total_flops()
        # fwd + input-grad + weight-grad conv passes: the standard 3x model
        step_fl = 3.0 * fwd_fl
        out = {
            "mode": "train_bench", "net": pipe.name, "img": self.img,
            "compute_tn": self.compute_tn or "float32",
            "img_per_sec": round(self.img / secs, 1),
            "secs_per_step": round(secs, 6),
            "TF_per_s": round(step_fl / secs / 1e12, 1),
            "loss_first": round(l0, 4), "loss_last": round(l1, 4),
            "loss_decreased": bool(l1 < l0)}
        if self.golden_out:  # drop timing fields: goldenable output
            out = {k: v for k, v in out.items()
                   if k not in ("img_per_sec", "secs_per_step", "TF_per_s")}
            out["loss_first"] = round(l0, 2)
            out["loss_last"] = round(l1, 2)
        print(json.dumps(out))
