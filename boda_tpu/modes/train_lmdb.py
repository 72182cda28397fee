"""train_lmdb: end-to-end training loop over datum records.

The training-side counterpart of test_lmdb's accuracy loop (ref
src/lmdb_caffe_io.cc:37): read datum records (LMDB or the block-stream
container), batch + preprocess, and run real optimizer steps
(SGD/momentum/weight-decay/train-mode BN/f32 masters via
parallel.train.make_train_step) with optional dp/tp mesh sharding.
The reference has no training loop at all — this is the transcend path
that turns the parity pieces (records, preprocessing, autodiff, sharding)
into a usable trainer.
"""

from __future__ import annotations

import numpy as np

from .. import graph  # noqa: F401
from ..config import ConfigError, Field, Mode, register
from .cnet import load_net
from .lmdb_modes import _iter_records


@register("mode", "train_lmdb", help="train a net over datum records")
class TrainLmdb(Mode):
    db_fn = Field("filename", default="", help="lmdb directory (needs lmdb)")
    rec_fn = Field("filename", default="", help="block-stream record file")
    model = Field(str, default="", help="zoo model")
    ptt_fn = Field("filename", default="", help="caffe prototxt")
    img = Field(int, default="4", help="batch size")
    in_sz = Field(int, default="0", help="input size override")
    n_steps = Field(int, default="10", help="optimizer steps")
    lr = Field(float, default="0.01", help="learning rate")
    momentum = Field(float, default="0.9", help="SGD momentum")
    weight_decay = Field(float, default="0.0", help="decoupled weight decay")
    clip_norm = Field(float, default="1.0", help="global-norm grad clip")
    bn_momentum = Field(float, default="0.1", help="train-mode BN EMA rate")
    # BN freeze schedule: train-mode BN (batch stats + EMA) for the first
    # N steps, then switch to inference-stats BN using the accumulated
    # running statistics. Measured motivation (docs/train_ceiling.md):
    # train-mode BN costs 46% of the r50 step (the batch-stat passes, the
    # stat adjoints, AND the lost conv prefolding) — the frozen-stats
    # step runs 1.87x faster (60% vs 32% MFU), so a warmup-then-freeze
    # recipe buys most of that back where the training recipe allows.
    # 0 = never freeze.
    bn_freeze_at = Field(int, default="0",
                         help="switch BN to frozen running stats at this step (0=never)")
    compute_tn = Field(str, default="", help="bfloat16 = f32-master mixed precision")
    remat = Field(str, default="", help="rematerialization: '' | seg | full | dots")
    mesh = Field("lexp", default="()", help="mesh axes, e.g. (dp=2)")
    log_every = Field(int, default="1", help="print loss every N steps")
    # LR schedules (parallel/schedules.py): lr is the base rate
    lr_schedule = Field(str, default="const", help="const | step | cosine")
    warmup_steps = Field(int, default="0", help="linear LR warmup steps")
    lr_gamma = Field(float, default="0.1", help="step-schedule decay factor")
    lr_step_size = Field(int, default="0", help="step-schedule period")
    # checkpoint/resume (parallel/checkpoint.py): atomic weights+momentum+
    # BN-stats+step snapshots; --resume=1 continues from ckpt_fn if present
    init_seed = Field(int, default="1234",
                      help="weight-init seed (prototxt nets; measures "
                           "train-variance for the learning gates)")
    ckpt_fn = Field(str, default="", help="checkpoint file (enables saving)")
    ckpt_every = Field(int, default="0", help="save every N steps (0: at end only)")
    resume = Field(bool, default="0", help="resume from ckpt_fn if it exists")
    curve_fn = Field(str, default="",
                     help="write the loss curve (step<TAB>loss, 3 sig "
                          "figs) to this output file — goldenable curve-"
                          "shape pinning (VERDICT r3 #4)")

    def main(self) -> None:
        import jax
        import jax.numpy as jnp

        from ..apps.preproc import img_to_batch_np
        from ..frontend.datum import parse_datum
        from ..parallel.train import find_logits_node, make_train_step
        pipe, in_dims = load_net(self.model, self.ptt_fn, "", self.img,
                                 self.in_sz, init_seed=self.init_seed)
        logits = find_logits_node(pipe)
        cdt = jnp.dtype(self.compute_tn) if self.compute_tn else None
        from ..parallel.schedules import make_lr_schedule
        sched = make_lr_schedule(self.lr_schedule, self.lr,
                                 total_steps=self.n_steps,
                                 warmup_steps=self.warmup_steps,
                                 gamma=self.lr_gamma,
                                 step_size=self.lr_step_size)
        def build_step(bn_m):
            return make_train_step(pipe, logits, lr=self.lr,
                                   clip_norm=self.clip_norm,
                                   momentum=self.momentum,
                                   weight_decay=self.weight_decay,
                                   bn_momentum=bn_m,
                                   compute_dtype=cdt,
                                   lr_schedule=sched,
                                   remat=self.remat)
        # donate the previous weights/momentum buffers: the update writes
        # in place instead of allocating a second full copy of the state
        # every step (r50 f32 masters + momentum ≈ 200MB of HBM churn).
        # Safe: the loop rebinds to the returned state and checkpoints read
        # post-step values only. (No donation in train_bench — its timing
        # harness re-invokes the same jit with the same buffers.)
        donate = (0, 3) if self.momentum > 0 else (0,)
        jstep = jax.jit(build_step(self.bn_momentum), donate_argnums=donate)
        # bn_freeze_at: a SECOND jitted step with inference-stats BN (the
        # running stats the warmup phase accumulated live in `weights`, so
        # the swap is purely which program runs — state threads unchanged,
        # and resume past the freeze point lands on the frozen step)
        jstep_frozen = None
        if self.bn_freeze_at > 0 and self.bn_momentum > 0:
            jstep_frozen = jax.jit(build_step(0.0), donate_argnums=donate)

        # load all records once (the committed fixtures are small; a real
        # run streams batches — the loader is not the subject here)
        from ..utils.img_io import Img
        recs = []
        for _k, val in _iter_records(self.db_fn, self.rec_fn, 0):
            d = parse_datum(val)
            recs.append((d.to_rgb(), d.label))
        if not recs:
            raise ConfigError("no records found")
        dd = in_dims["data"]
        h, w = dd["y"], dd["x"]

        def batch_at(i):
            xs, ys = [], []
            for j in range(self.img):
                rgb, lab = recs[(i * self.img + j) % len(recs)]
                rgba = Img.from_rgb(rgb).resize(h, w).data
                xs.append(rgba)
                ys.append(lab)
            x = img_to_batch_np(np.stack(xs)).astype(np.float32)
            return x, np.asarray(ys, np.int32)

        weights = {k: jnp.asarray(np.asarray(wv.data, np.float32))
                   for k, wv in pipe.weights.items()}
        mom = None
        start = 0
        ckpt = self.out_path(self.ckpt_fn) if self.ckpt_fn else ""
        if self.resume and ckpt:
            import os

            from ..parallel.checkpoint import load_checkpoint
            if os.path.exists(ckpt):
                start, w_np, m_np = load_checkpoint(ckpt)
                weights = {k: jnp.asarray(v) for k, v in w_np.items()}
                mom = {k: jnp.asarray(v) for k, v in m_np.items()} \
                    if m_np is not None else None
                print(f"resumed from {self.ckpt_fn} at step {start}")

        def save(i):
            from ..parallel.checkpoint import save_checkpoint
            save_checkpoint(ckpt, i,
                            {k: np.asarray(v) for k, v in weights.items()},
                            {k: np.asarray(v) for k, v in mom.items()}
                            if mom is not None else None)

        first = last = None
        curve: list[tuple[int, float]] = []
        for i in range(start, self.n_steps):
            x, labels = batch_at(i)
            sfn = jstep
            if jstep_frozen is not None and i >= self.bn_freeze_at:
                if i == self.bn_freeze_at:
                    print(f"step {i}: BN frozen (inference running stats)")
                sfn = jstep_frozen
            out = sfn(weights, {"data": x}, labels, mom,
                      step=jnp.int32(i)) \
                if self.momentum > 0 else \
                sfn(weights, {"data": x}, labels, step=jnp.int32(i))
            if self.momentum > 0:
                loss, weights, mom = out
            else:
                loss, weights = out
            loss = float(loss)
            if first is None:
                first = loss
            last = loss
            if i % max(1, self.log_every) == 0:
                print(f"step {i}: loss {loss:.3g}")
                curve.append((i, loss))
            if ckpt and self.ckpt_every and (i + 1) % self.ckpt_every == 0:
                save(i + 1)
        if first is None:  # resumed past the end: keep the existing (newer)
            # checkpoint — re-saving would relabel its step backwards
            print(f"train_lmdb: nothing to do (resumed at {start} "
                  f">= n_steps {self.n_steps})")
            return
        if ckpt:
            save(self.n_steps)
        if self.curve_fn:
            cfn = self.out_path(self.curve_fn)
            with open(cfn, "w") as f:
                for s_i, lv in curve:
                    f.write(f"{s_i}\t{lv:.3g}\n")
            print(f"wrote loss curve ({len(curve)} points) to "
                  f"{self.curve_fn}")
        print(f"train_lmdb: {self.n_steps - start} steps over {len(recs)} "
              f"records, loss {first:.3g} -> {last:.3g} "
              f"({'improved' if last < first else 'NOT improved'})")
