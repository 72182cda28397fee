"""net_trace: XLA device-trace dump of whole-net forwards.

The TPU-native observability analog of the reference's per-launch profiling
hooks (ref src/rtc_fwd.cc:560-572 per-layer call timing, rtc_prof.cc): on
XLA the net is ONE fused program, so the honest per-op view is the
compiler's own profiler — ``jax.profiler.trace`` captures device timelines
(TensorBoard / Perfetto format) with ops attributed back to graph op names
via the per-op ``jax.named_scope`` annotations the engines emit.

Open the dump with TensorBoard (`tensorboard --logdir <dir>`) or
`perfetto` on the generated `.trace.json.gz`.
"""

from __future__ import annotations

import glob
import os

import numpy as np

from .. import graph  # noqa: F401
from ..config import Field, Mode, register
from ..utils.dims import NDA
from .cnet import load_net


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

    def main(self) -> None:
        import jax

        from ..ops.kernels.gen_data import gen_data_pattern
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
