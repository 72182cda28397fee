"""serve_bench: end-to-end serving throughput — native loader feeding the TPU.

The production-pipeline benchmark the reference's capture/LMDB loops play:
decode -> preprocess -> net, with every stage overlapped:
  * jpeg decode/resize: native C++ threaded prefetcher (native/boda_native.cc)
  * preprocessing: fused ON DEVICE into the same XLA program as the net
    (uint8 RGBA is what crosses the host->device link — 4x less traffic)
  * dispatch: pipelined (block on batch i-depth while i is in flight)
"""

from __future__ import annotations

import json
import time

from .. import graph  # noqa: F401
from ..config import ConfigError, Field, Mode, register
from .cnet import load_net


@register("mode", "serve_bench", help="loader->preprocess->net serving throughput")
class ServeBench(Mode):
    model = Field(str, default="resnet50", help="zoo model")
    ptt_fn = Field("filename", default="", help="caffe prototxt")
    conv_fwd = Field("conv_fwd",
                     default="(mode=pallas,compute_tn=bfloat16,precision=default)",
                     help="engine")
    img_fns = Field((list, "filename"), req=True, help="jpeg pool to cycle")
    img = Field(int, default="32", help="batch size")
    n_batches = Field(int, default="20", help="batches to serve")
    n_threads = Field(int, default="0", help="native loader threads (0=ncpu)")
    pipeline_depth = Field(int, default="2", help="in-flight batches")
    out_node_name = Field(str, default="prob", help="output node")
    # decode-decoupled mode: pre-decode cache_batches batches once, then
    # serve n_batches by cycling them host-side (still re-uploading uint8 +
    # preprocessing on device per batch). Measures the serving pipeline's
    # ceiling independent of jpeg-decode CPU capacity — on a 1-core host the
    # decoder caps ~150 img/s no matter how fast the engine is (the
    # reference's capture loop had the same camera/decode bound).
    cache_batches = Field(int, default="0", help="pre-decode N batches, cycle them")
    # deterministic-output mode for the golden harness (test_cmds pins exact
    # stdout): swap the timing fields for the served output's shape + a
    # softmax sanity bit, which are run-to-run stable on CPU
    report_perf = Field(bool, default="1",
                        help="0: omit timing fields (deterministic output)")

    def main(self) -> None:
        import jax
        import numpy as np

        from ..apps.preproc import img_to_batch_jax
        from ..utils.native import BatchLoader, native_available
        if not native_available():
            raise ConfigError("serve_bench needs the native library "
                              "(make -C native failed?)")
        pipe, in_dims = load_net(self.model, self.ptt_fn, "", self.img, 0)
        eng = self.conv_fwd
        eng.init(pipe)
        d = in_dims["data"]
        net_fn = eng.build_raw_fn([self.out_node_name])

        # NHWC engine: preprocess straight into the engine's native layout
        # (no NCHW round-trip on device; run_fwd/build_raw_fn shape-detect it)
        layout = "nhwc" if getattr(eng, "layout", "") == "nhwc" else "nchw"
        cdt = getattr(eng, "compute_tn", "") or None

        def serve_fn(weights, rgba_u8):
            x = img_to_batch_jax(rgba_u8, layout=layout, out_dtype=cdt)
            return net_fn(weights, {"data": x})[self.out_node_name]

        served = jax.jit(serve_fn)
        dev = eng.device()
        weights = eng._weights_dev
        paths = list(self.img_fns)
        n_imgs = self.n_batches * self.img
        paths = (paths * (n_imgs // len(paths) + 1))[:n_imgs]
        # warmup compile
        warm = jax.device_put(np.zeros((self.img, d["y"], d["x"], 4), np.uint8),
                              dev)
        served(weights, warm).block_until_ready()

        inflight = []
        n_done = 0
        last = None
        if self.cache_batches > 0:
            cache = []
            cpaths = paths[: self.cache_batches * self.img]
            with BatchLoader(cpaths, self.img, d["y"], d["x"],
                             n_threads=self.n_threads) as loader:
                while True:
                    r = loader.next()
                    if r is None:
                        break
                    cache.append(np.ascontiguousarray(r[1]))
            t0 = time.perf_counter()
            for i in range(self.n_batches):
                u8 = jax.device_put(cache[i % len(cache)], dev)
                last = served(weights, u8)
                inflight.append(last)
                if len(inflight) > self.pipeline_depth:
                    inflight.pop(0).block_until_ready()
                n_done += 1
            for o in inflight:
                o.block_until_ready()
            secs = time.perf_counter() - t0
        else:
            t0 = time.perf_counter()
            with BatchLoader(paths, self.img, d["y"], d["x"],
                             n_threads=self.n_threads) as loader:
                while True:
                    r = loader.next()
                    if r is None:
                        break
                    _, rgba = r
                    u8 = jax.device_put(rgba, dev)
                    last = served(weights, u8)
                    inflight.append(last)
                    if len(inflight) > self.pipeline_depth:
                        inflight.pop(0).block_until_ready()
                    n_done += 1
                for o in inflight:
                    o.block_until_ready()
            secs = time.perf_counter() - t0
        img_s = n_done * self.img / secs
        rep = {"mode": "serve_bench", "net": pipe.name,
               "batches": n_done, "img": self.img,
               "cached": bool(self.cache_batches)}
        if self.report_perf:
            rep.update(img_per_sec=round(img_s, 1), secs=round(secs, 3))
        elif last is None:  # zero batches served (n_batches=0 / no frames)
            rep.update(out_shape=[], prob_ok=False)
        else:
            out = np.asarray(last, np.float32).reshape(self.img, -1)
            rep.update(out_shape=list(np.asarray(last).shape),
                       prob_ok=bool(abs(float(out.sum()) / self.img - 1.0)
                                    < 2e-2))  # bf16 row sums
        print(json.dumps(rep))
