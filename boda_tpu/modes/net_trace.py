"""net_trace: XLA device-trace dump + in-net per-op device-time table.

The TPU-native observability analog of the reference's per-launch profiling
hooks (ref src/rtc_fwd.cc:560-572 per-layer call timing, rtc_prof.cc): on
XLA the net is ONE fused program, so the honest per-op view is the
compiler's own profiler — ``jax.profiler.trace`` captures device timelines
(TensorBoard / Perfetto format) with ops attributed back to graph op names
via the per-op ``jax.named_scope`` annotations the engines emit.

``--per-op=1`` joins the trace's device events (HLO instruction names)
against the compiled program's ``op_name`` metadata and prints per-graph-op
device time measured IN the fused net — unlike ``run_cnet --per-layer``'s
standalone-op decomposition, whose sum exceeds the fused net time ~20x over
the remote dispatch path (see NOTES_ROUND3.md): these numbers come from the
single program's own timeline, so they add up to the real net time.

Open the dump with TensorBoard (`tensorboard --logdir <dir>`) or
`perfetto` on the generated `.trace.json.gz`.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import re

import numpy as np

from .. import graph  # noqa: F401
from ..config import Field, Mode, register
from ..utils.dims import NDA
from .cnet import load_net

_OPNAME_RE = re.compile(r'%?([\w.\-]+)\s*=.*metadata=\{[^}]*op_name="([^"]+)"')
_INSTR_RE = re.compile(r'^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=')
_CALLS_RE = re.compile(r'calls=%?([\w.\-]+)')


def _scope_of(op_name_path: str, op_names=None) -> str:
    path = op_name_path.split("/")
    # path like jit(net_fn)/<op_scope>/<prim>[...]; keep the op scope
    if len(path) > 1 and path[0].startswith("jit("):
        path = path[1:]
    if op_names:
        # graph-op names may themselves contain '/' (caffe-style
        # 'inception_3a/3x3' — ref nets/googlenet_conv layer names), and
        # control-flow frames may PRECEDE the op scope (a traced chained
        # program puts ops under 'while/body/...'): keep the
        # leftmost-LONGEST contiguous segment-join naming a real op
        for i in range(len(path)):
            for k in range(len(path), i, -1):
                if "/".join(path[i:k]) in op_names:
                    return "/".join(path[i:k])
    return path[0]


def _map_from_hlo(hlo_text: str, scope_fn) -> dict[str, str]:
    """HLO instruction name -> scope_fn(op_name metadata path).

    Two passes: direct metadata on the instruction line wins; a fusion/call
    instruction WITHOUT its own op_name is attributed to the dominant scope
    inside the computation it calls (majority vote over the fused body's
    metadata) — without this, layout/epilogue fusions land in '(other)'."""
    out: dict[str, str] = {}
    comp_votes: dict[str, dict[str, int]] = {}
    calls: list[tuple[str, str]] = []  # (instr, called computation)
    cur = None
    for ln in hlo_text.splitlines():
        if ln.rstrip().endswith("{") and ") -> " in ln:
            # computation header: "%name (params) -> type {" / "ENTRY %... {"
            head = ln.split("(", 1)[0].replace("ENTRY", "").strip()
            cur = head.lstrip("%").strip()
            continue
        r = _OPNAME_RE.search(ln)
        if r:
            scope = scope_fn(r.group(2))
            out.setdefault(r.group(1), scope)
            if cur is not None:
                comp_votes.setdefault(cur, {})
                comp_votes[cur][scope] = comp_votes[cur].get(scope, 0) + 1
            continue
        im = _INSTR_RE.match(ln)
        cm = _CALLS_RE.search(ln)
        if im and cm:
            calls.append((im.group(1), cm.group(1)))
    for instr, comp in calls:
        votes = comp_votes.get(comp)
        if votes and instr not in out:
            out[instr] = max(votes, key=votes.get)
    return out


def instr_op_map(hlo_text: str, op_names=None) -> dict[str, str]:
    """HLO instruction name -> graph-op scope (the first named_scope segment
    after the jit(...) root, or the longest `/`-joined segment run naming an
    op in `op_names`) from compiled-HLO op_name metadata."""
    return _map_from_hlo(hlo_text, lambda p: _scope_of(p, op_names))


_XFORM_RE = re.compile(
    r"\b(?:jvp|transpose|jit|vjp|vmap|pmap|checkpoint|remat|rematted"
    r"|custom_jvp|custom_vjp|scan|while|cond)\(")


def _train_scope_of(op_name_path: str, op_names) -> str:
    """'<op or tag> [fwd|bwd]' for a train-step op_name path.

    JAX keeps the named_scope stack through jvp/transpose by wrapping each
    scope entry in the transform frame: an adjoint's path looks like
    'jit(<lambda>)/transpose(jvp(conv1))/conv_general_dilated'. Phase is
    read off 'transpose(' presence; the scope by stripping the transform
    wrappers and matching the leftmost-longest '/'-join against real op
    names (names may contain '/': 'inception_3a/3x3'). remat recompute is
    forward computation and counts as fwd."""
    phase = "bwd" if "transpose(" in op_name_path else "fwd"
    segs = _XFORM_RE.sub("", op_name_path).replace(")", "").split("/")
    for tag in ("__loss__", "__update__"):
        if tag in segs:
            return tag if tag == "__update__" else f"{tag} [{phase}]"
    if op_names:
        for i in range(len(segs)):
            for k in range(len(segs), i, -1):
                if "/".join(segs[i:k]) in op_names:
                    return f'{"/".join(segs[i:k])} [{phase}]'
    return f"(non-op) [{phase}]"


def instr_train_map(hlo_text: str, op_names) -> dict[str, str]:
    """Phase-aware instruction map for train-step traces: values are
    '<op> [fwd]' / '<op> [bwd]' / '__update__' / '__loss__ [fwd|bwd]'."""
    return _map_from_hlo(hlo_text, lambda p: _train_scope_of(p, op_names))


def aggregate_trace(trace_dir: str, imap: dict[str, str],
                    unmapped: dict[str, float] | None = None
                    ) -> dict[str, float]:
    """Sum device-event durations (us) per graph-op scope across all
    .trace.json.gz dumps under trace_dir. Only events on XLA executor /
    device timelines count (the python thread carries host dispatch spans
    like PjitFunction/shard_args, which overlap device time and would
    double-count). Unattributed device events land in '(other)'."""
    per = {}
    for fn in glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                        recursive=True):
        d = json.load(gzip.open(fn))
        evs = d.get("traceEvents", [])
        proc = {}
        dev_tids = set()
        for e in evs:
            if e.get("ph") != "M":
                continue
            if e["name"] == "process_name":
                proc[e["pid"]] = e["args"].get("name", "")
            elif e["name"] == "thread_name":
                tn = e["args"].get("name", "")
                if "XLA" in tn or "TPU" in tn or "device" in tn.lower():
                    dev_tids.add((e["pid"], e.get("tid")))
        for e in evs:
            if e.get("ph") != "X":
                continue
            on_dev_proc = any(s in proc.get(e.get("pid"), "")
                              for s in ("TPU", "device:"))
            if (e.get("pid"), e.get("tid")) not in dev_tids \
                    and not on_dev_proc:
                continue
            name = e.get("name", "")
            if name.startswith("end: "):  # paired region-end markers
                continue
            scope = imap.get(name)
            if scope is None:
                # fusion names keep the root instruction's name + suffix
                scope = imap.get(name.split(".", 1)[0])
            if scope is None:
                if any(c in name for c in " $:("):
                    # runtime/listener marker or the whole-program envelope
                    # event (e.g. "jit_net_fn(<fingerprint>)"), which spans
                    # every instruction event and would double-count ~25%
                    # of the table into '(other)'
                    continue
                scope = "(other)"  # device instruction without metadata
                if unmapped is not None:
                    unmapped[name] = unmapped.get(name, 0.0) \
                        + float(e.get("dur", 0.0))
            per[scope] = per.get(scope, 0.0) + float(e.get("dur", 0.0))
    return per


@register("mode", "net_trace", help="dump a jax.profiler device trace of net forwards")
class NetTrace(Mode):
    model = Field(str, default="", help="zoo model")
    ptt_fn = Field("filename", default="", help="caffe prototxt")
    img = Field(int, default="4", help="batch size")
    in_sz = Field(int, default="0", help="input size override")
    conv_fwd = Field("conv_fwd",
                     default="(mode=pallas,compute_tn=bfloat16,precision=default)",
                     help="engine config")
    out_node = Field(str, default="prob", help="output node")
    n_iters = Field(int, default="4", help="traced forwards")
    trace_dir = Field(str, default="trace", help="trace output subdir")
    native = Field(bool, default="0",
                   help="feed native NHWC compute-dtype input (what the "
                        "production loader emits); engines with input_s2d=1 "
                        "additionally get the host-folded stem layout — "
                        "matches the flagship bench program")
    per_op = Field(bool, default="0",
                   help="print in-net per-op device time from the trace")
    top_k = Field(int, default="20", help="per-op table rows (0=all)")
    unmapped = Field(int, default="0",
                     help="also list top-N unattributed '(other)' event names")
    wisdom_fn = Field("filename", default="",
                      help="with --per-op: reconcile against this wisdom "
                           "file — print each op's best standalone wisdom "
                           "runtime (+ trust tier) next to its in-net time")

    def _wisdom_by_op(self, pipe, eng) -> dict:
        """graph-op name -> best wisdom run for that op's rtc signature.
        Keys via the engine's own wisdom_sig (the one canonical keying —
        writers and readers must agree or lookups silently miss) and
        filters to this device's platform tag first, so a run imported
        from another platform is never printed unmarked next to a TPU
        trace row; OpWisdom.best prefers the ab trust tier."""
        from ..prof.wisdom import read_wisdom
        wis = {w.op.key(): w for w in read_wisdom(self.wisdom_fn)}
        _, plat = eng.wisdom_plats()
        out = {}
        for op_name in pipe.ops:
            sig = eng.wisdom_sig(op_name)
            if sig is None:
                continue
            w = wis.get(sig.key())
            if w is None:
                continue
            best = w.best(plat) or w.best()
            if best is not None:
                out[op_name] = best
        return out

    def main(self) -> None:
        import jax

        from ..config import ConfigError
        from ..ops.kernels.gen_data import gen_data_pattern
        if self.n_iters < 1:
            raise ConfigError("net_trace: n_iters must be >= 1")
        pipe, in_dims = load_net(self.model, self.ptt_fn, "", self.img,
                                 self.in_sz)
        eng = self.conv_fwd
        eng.init(pipe)
        d = in_dims["data"]
        x = NDA(d, np.asarray(gen_data_pattern(d.shape, d.tn)))
        if self.native:
            from ..utils.dims import Dims
            ctn = getattr(eng, "compute_tn", "") or d.tn
            xh = np.ascontiguousarray(x.data.transpose(0, 2, 3, 1))
            if ctn != d.tn:
                import ml_dtypes
                xh = xh.astype(getattr(ml_dtypes, ctn, None)
                               or np.dtype(ctn))
            if getattr(eng, "input_s2d", False):
                xh = eng.host_input_s2d("data", xh)
            nd = Dims.of(img=xh.shape[0], y=xh.shape[1], x=xh.shape[2],
                         chan=xh.shape[3], tn=ctn)
            x = NDA(nd, xh)
        # compile + warm OUTSIDE the trace window: a traced first call
        # records minutes of compile, swamping the device timeline
        eng.run_fwd({"data": x}, [self.out_node])
        td = self.out_path(self.trace_dir)
        with jax.profiler.trace(td):
            for _ in range(self.n_iters):
                outs = eng.run_fwd({"data": x}, [self.out_node])
        # run_fwd returns host numpy — device work is synced by construction
        _ = float(np.asarray(outs[self.out_node].data).ravel()[0])
        files = [os.path.relpath(f, self.boda_output_dir)
                 for f in glob.glob(os.path.join(td, "**", "*"),
                                    recursive=True) if os.path.isfile(f)]
        kinds = sorted({os.path.basename(f).split(".", 1)[-1]
                        for f in files})
        print(f"net_trace: {self.n_iters} forwards of {pipe.name} "
              f"({self.img} img) -> {len(files)} trace files under "
              f"{self.trace_dir}/ (kinds: {', '.join(kinds)})")
        if not self.per_op:
            return
        raw = eng.build_raw_fn([self.out_node])
        ins = {"data": np.asarray(x.data)}
        hlo = jax.jit(raw).lower(dict(eng._weights_dev), ins) \
            .compile().as_text()
        imap = instr_op_map(hlo, set(pipe.ops))
        um: dict[str, float] = {}
        per = aggregate_trace(td, imap, unmapped=um if self.unmapped else None)
        wmap = self._wisdom_by_op(pipe, eng) \
            if self.wisdom_fn and hasattr(eng, "wisdom_sig") else {}
        tot = sum(per.values())
        rows = sorted(per.items(), key=lambda kv: -kv[1])
        if self.top_k:
            rows = rows[: self.top_k]
        print(f"per-op device time over {self.n_iters} forwards "
              f"({len(imap)} mapped instrs, total {tot:.0f}us):")
        n_rec = 0
        for scope, us in rows:
            line = (f"  {scope:<28} {us / self.n_iters:>10.1f} us/fwd "
                    f"{100.0 * us / max(tot, 1e-9):>5.1f}%")
            if scope in wmap:
                b = wmap[scope]
                ratio = b.secs * 1e6 / max(us / self.n_iters, 1e-9)
                line += (f"  wis {b.secs * 1e6:>8.1f}us "
                         f"[{b.method or 'chain'}] x{ratio:.2f}")
                n_rec += 1
            print(line)
        if self.wisdom_fn:
            # standalone-vs-in-net ratio caveat: wisdom times are measured
            # on the bare op (no fused epilogue, its own entry layouts);
            # in-net rows include fused bias/ReLU/residual epilogues and
            # share the program's layouts. Large x-ratios mean the wisdom
            # number is a standalone artifact, not an in-net truth — the
            # reconciliation VERDICT r2 Weak #7 asked for.
            print(f"wisdom reconciliation: {n_rec}/{len(rows)} rows matched "
                  f"{os.path.basename(self.wisdom_fn)} "
                  f"(x = standalone wisdom / in-net)")
        if self.unmapped and um:
            print(f"top unattributed event names "
                  f"({len(um)} distinct, {sum(um.values()):.0f}us):")
            for name, us in sorted(um.items(),
                                   key=lambda kv: -kv[1])[: self.unmapped]:
                print(f"  {name:<40} {us / self.n_iters:>10.1f} us/fwd")


@register("mode", "train_trace",
          help="per-op fwd/bwd device-time attribution of a training step")
class TrainTrace(Mode):
    """The train-side analog of ``net_trace --per-op`` (VERDICT r3 #2): run
    real consecutive training steps under jax.profiler.trace and attribute
    device time per graph op AND per phase (fwd / bwd / loss / update) via
    the named_scope stack, which JAX preserves through jvp/transpose.
    Defaults match the 'realistic' train_bench config (momentum + train-mode
    BN). Prints the phase rollup with FLOP-based TF/s per phase (bwd convs
    carry 2x fwd FLOPs: dgrad + wgrad), a per-type rollup (BatchNorm rows =
    batch-stats cost), and the top-K per-op table.

    Parity: the reference times generated per-call kernels
    (ref src/rtc_fwd.cc:560-572) but has no training loop; this extends its
    per-op timing role to the training step."""
    model = Field(str, default="resnet50", help="zoo model")
    ptt_fn = Field("filename", default="", help="caffe prototxt")
    img = Field(int, default="32", help="batch size")
    lr = Field(float, default="0.01", help="SGD learning rate")
    clip_norm = Field(float, default="1.0", help="global-norm grad clip (0=off)")
    momentum = Field(float, default="0.9", help="SGD momentum (0=plain SGD)")
    bn_momentum = Field(float, default="0.1",
                        help="train-mode BN EMA rate (0=inference-stats BN)")
    weight_decay = Field(float, default="0.0", help="decoupled weight decay")
    master_f32 = Field(bool, default="0",
                       help="f32 master weights (compute in compute_tn)")
    remat = Field(str, default="", help="rematerialization: '' | seg | full | dots")
    compute_tn = Field(str, default="bfloat16",
                       help="weight/activation dtype ('' = f32)")
    n_iters = Field(int, default="4", help="traced steps")
    trace_dir = Field(str, default="trace", help="trace output subdir")
    top_k = Field(int, default="25", help="per-op table rows (0=all)")
    unmapped = Field(int, default="0",
                     help="also list top-N unattributed '(other)' event names")

    def main(self) -> None:
        import jax
        import jax.numpy as jnp

        from ..ops.kernels.gen_data import gen_data_pattern
        from ..parallel.train import find_logits_node, make_train_step
        pipe, in_dims = load_net(self.model, self.ptt_fn, "", self.img, 0)
        logits = find_logits_node(pipe)
        step = make_train_step(
            pipe, logits, lr=self.lr, clip_norm=self.clip_norm,
            momentum=self.momentum, weight_decay=self.weight_decay,
            bn_momentum=self.bn_momentum,
            compute_dtype=(jnp.dtype(self.compute_tn)
                           if self.master_f32 and self.compute_tn else None),
            remat=self.remat)
        d = in_dims["data"]
        cdt = jnp.dtype(self.compute_tn) if self.compute_tn else jnp.float32
        dev = jax.devices()[0]
        wdt = np.float32 if self.master_f32 else cdt
        weights = {k: jax.device_put(
            np.asarray(w.data, np.float32).astype(wdt), dev)
            for k, w in pipe.weights.items()}
        x = jax.device_put(np.asarray(
            gen_data_pattern(d.shape, d.tn)).astype(cdt), dev)
        n_cls = int(np.prod(pipe.nodes[logits].dims.shape)) // self.img
        labels = jax.device_put(
            (np.arange(self.img) % n_cls).astype(np.int32), dev)
        use_mom = self.momentum > 0
        if use_mom:
            from ..parallel.train import is_trainable
            mom = {k: jnp.zeros(v.shape, jnp.float32)
                   for k, v in weights.items() if is_trainable(k)}
            jstep = jax.jit(lambda w, xx, ll, mm: step(w, {"data": xx},
                                                       ll, mm))
            loss, weights, mom = jstep(weights, x, labels, mom)  # warm
            lowered = jstep.lower(weights, x, labels, mom)
        else:
            jstep = jax.jit(lambda w, xx, ll: step(w, {"data": xx}, ll))
            loss, weights = jstep(weights, x, labels)  # warm
            lowered = jstep.lower(weights, x, labels)
        td = self.out_path(self.trace_dir)
        with jax.profiler.trace(td):
            for _ in range(self.n_iters):
                if use_mom:
                    loss, weights, mom = jstep(weights, x, labels, mom)
                else:
                    loss, weights = jstep(weights, x, labels)
            # scalar D2H read INSIDE the window: dispatches are async and
            # events of work still in flight when the profiler session
            # closes are lost (block_until_ready can return early on this
            # platform — CLAUDE.md trap #2)
            loss_f = float(loss)
        hlo = lowered.compile().as_text()
        imap = instr_train_map(hlo, set(pipe.ops))
        um: dict[str, float] = {}
        per = aggregate_trace(td, imap,
                              unmapped=um if self.unmapped else None)
        n = self.n_iters
        tot = sum(per.values())
        # -- phase rollup with FLOP bases (bwd convs: dgrad + wgrad = 2x) --
        ctypes = ("Convolution", "InnerProduct")
        conv_fl = sum(pipe.op_flops(o) for o, op in pipe.ops.items()
                      if op.type in ctypes)
        def phase_us(ph):
            return sum(us for s, us in per.items()
                       if s.endswith(f"[{ph}]")) / n
        def conv_us(ph):
            return sum(us for s, us in per.items()
                       if s.endswith(f"[{ph}]")
                       and s[: -len(f" [{ph}]")] in pipe.ops
                       and pipe.ops[s[: -len(f" [{ph}]")]].type
                       in ctypes) / n
        print(f"train-step phase rollup over {n} steps "
              f"({len(imap)} mapped instrs, total {tot / n:.0f}us/step, "
              f"loss {loss_f:.3f}):")
        for ph, mult in (("fwd", 1.0), ("bwd", 2.0)):
            pus, cus = phase_us(ph), conv_us(ph)
            tfs = conv_fl * mult / (cus * 1e-6) / 1e12 if cus > 0 else 0.0
            print(f"  {ph:<11} {pus:>9.1f} us/step "
                  f"{100.0 * pus * n / max(tot, 1e-9):>5.1f}%   "
                  f"conv {cus:>8.1f} us  {tfs:>6.1f} TF/s "
                  f"({mult:.0f}x-fwd-FLOP basis)")
        upd_us = per.get("__update__", 0.0) / n
        print(f"  {'__update__':<11} {upd_us:>9.1f} us/step "
              f"{100.0 * upd_us * n / max(tot, 1e-9):>5.1f}%")
        oth = per.get("(other)", 0.0) / n
        if oth:
            print(f"  {'(other)':<11} {oth:>9.1f} us/step "
                  f"{100.0 * oth * n / max(tot, 1e-9):>5.1f}%")
        # -- per-type rollup (BatchNorm rows = batch-stats + normalize) --
        bytype: dict[str, float] = {}
        for s, us in per.items():
            base = s.rsplit(" [", 1)[0]
            t = pipe.ops[base].type if base in pipe.ops else base
            bytype[t] = bytype.get(t, 0.0) + us
        print("per-type device time:")
        for t, us in sorted(bytype.items(), key=lambda kv: -kv[1]):
            print(f"  {t:<24} {us / n:>10.1f} us/step "
                  f"{100.0 * us / max(tot, 1e-9):>5.1f}%")
        # -- per-op table: fwd + bwd side by side --
        ops_fb: dict[str, list[float]] = {}
        for s, us in per.items():
            if s.endswith(" [fwd]") or s.endswith(" [bwd]"):
                base, ph = s.rsplit(" [", 1)
                d_i = 0 if ph.startswith("fwd") else 1
                ops_fb.setdefault(base, [0.0, 0.0])[d_i] += us
        rows = sorted(ops_fb.items(), key=lambda kv: -sum(kv[1]))
        if self.top_k:
            rows = rows[: self.top_k]
        print("per-op fwd/bwd (us/step):")
        for base, (fus, bus) in rows:
            rat = bus / fus if fus > 0 else float("inf")
            print(f"  {base:<28} fwd {fus / n:>9.1f}  bwd {bus / n:>9.1f}"
                  f"  bwd/fwd {rat:>5.2f}")
        if self.unmapped and um:
            print(f"top unattributed event names "
                  f"({len(um)} distinct, {sum(um.values()):.0f}us):")
            for name, us in sorted(um.items(),
                                   key=lambda kv: -kv[1])[: self.unmapped]:
                print(f"  {name:<40} {us / n:>10.1f} us/step")
