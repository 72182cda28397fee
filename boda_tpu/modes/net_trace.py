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


def instr_op_map(hlo_text: str) -> dict[str, str]:
    """HLO instruction name -> graph-op scope (the first named_scope segment
    after the jit(...) root) from compiled-HLO op_name metadata."""
    out = {}
    for ln in hlo_text.splitlines():
        r = _OPNAME_RE.search(ln)
        if not r:
            continue
        path = r.group(2).split("/")
        # path like jit(net_fn)/<op_scope>/<prim>[...]; keep the op scope
        scope = path[1] if len(path) > 1 and path[0].startswith("jit(") \
            else path[0]
        out[r.group(1)] = scope
    return out


def aggregate_trace(trace_dir: str, imap: dict[str, str]) -> dict[str, float]:
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
                if any(c in name for c in " $:"):
                    continue  # runtime/listener marker, not an instruction
                scope = "(other)"  # device instruction without metadata
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
    per_op = Field(bool, default="0",
                   help="print in-net per-op device time from the trace")
    top_k = Field(int, default="20", help="per-op table rows (0=all)")

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
        imap = instr_op_map(hlo)
        per = aggregate_trace(td, imap)
        tot = sum(per.values())
        rows = sorted(per.items(), key=lambda kv: -kv[1])
        if self.top_k:
            rows = rows[: self.top_k]
        print(f"per-op device time over {self.n_iters} forwards "
              f"({len(imap)} mapped instrs, total {tot:.0f}us):")
        for scope, us in rows:
            print(f"  {scope:<28} {us / self.n_iters:>10.1f} us/fwd "
                  f"{100.0 * us / max(tot, 1e-9):>5.1f}%")
