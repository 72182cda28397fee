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


@register("mode", "serve_stages",
          help="serving pipeline stage isolation: decode / H2D / dispatch / overlapped")
class ServeStages(Mode):
    """Which stage caps serving throughput HERE (VERDICT r3 #6)? Measures
    four rates with the same batch shapes and engine program:
      decode     native threaded jpeg decode+resize alone (no device)
      h2d        host->device upload of pre-decoded uint8 batches alone
                 (consumed by a trivial on-device reduce)
      dispatch   net forwards on a device-RESIDENT batch (no per-batch H2D)
      overlapped cache-batches serving (H2D + dispatch pipelined)
    The serving roofline note (docs/serving_roofline.md) derives the
    projected rate on a local-PCIe host from these.

    Parity: the reference's capture loop is the same pipeline with a
    camera source (ref src/cap_app.cc:25-148, caffeif.H:13
    preprocess-into-batch)."""
    model = Field(str, default="resnet50", help="zoo model")
    ptt_fn = Field("filename", default="", help="caffe prototxt")
    conv_fwd = Field("conv_fwd",
                     default="(mode=pallas,compute_tn=bfloat16,precision=default)",
                     help="engine")
    img_fns = Field((list, "filename"), req=True, help="jpeg pool to cycle")
    img = Field(int, default="32", help="batch size")
    n_batches = Field(int, default="20", help="batches per stage measurement")
    n_threads = Field(int, default="0", help="native loader threads (0=ncpu)")
    pipeline_depth = Field(int, default="2", help="in-flight batches")
    out_node_name = Field(str, default="prob", help="output node")
    report_perf = Field(bool, default="1",
                        help="0: omit timing fields (deterministic output)")

    def main(self) -> None:
        import jax
        import numpy as np

        from ..apps.preproc import img_to_batch_jax
        from ..utils.native import BatchLoader, native_available
        if not native_available():
            raise ConfigError("serve_stages needs the native library "
                              "(make -C native failed?)")
        pipe, in_dims = load_net(self.model, self.ptt_fn, "", self.img, 0)
        eng = self.conv_fwd
        eng.init(pipe)
        d = in_dims["data"]
        net_fn = eng.build_raw_fn([self.out_node_name])
        layout = "nhwc" if getattr(eng, "layout", "") == "nhwc" else "nchw"
        cdt = getattr(eng, "compute_tn", "") or None

        def serve_fn(weights, rgba_u8):
            x = img_to_batch_jax(rgba_u8, layout=layout, out_dtype=cdt)
            return net_fn(weights, {"data": x})[self.out_node_name]

        served = jax.jit(serve_fn)

        # h2d consume: a trivial reduce that forces the upload to complete
        # without doing meaningful compute (reading one scalar back would
        # only sync ~1 byte; the sum needs every uploaded element)
        @jax.jit
        def consume(u8):
            return u8.astype(np.uint32).sum()

        dev = eng.device()
        weights = eng._weights_dev
        paths = list(self.img_fns)
        n_imgs = self.n_batches * self.img
        paths = (paths * (n_imgs // len(paths) + 1))[:n_imgs]
        nbytes = self.img * d["y"] * d["x"] * 4

        # -- stage 1: decode-only ---------------------------------------
        t0 = time.perf_counter()
        n_dec = 0
        cache = []
        with BatchLoader(paths, self.img, d["y"], d["x"],
                         n_threads=self.n_threads) as loader:
            while True:
                r = loader.next()
                if r is None:
                    break
                n_dec += 1
                if len(cache) < 4:
                    cache.append(np.ascontiguousarray(r[1]))
        dec_s = time.perf_counter() - t0
        if not cache:
            raise ConfigError("no batches decoded")

        # -- stage 2: H2D-only ------------------------------------------
        u8w = jax.device_put(cache[0], dev)
        float(consume(u8w))  # warm compile
        t0 = time.perf_counter()
        acc = []
        for i in range(self.n_batches):
            u8 = jax.device_put(cache[i % len(cache)], dev)
            acc.append(consume(u8))
            if len(acc) > self.pipeline_depth:
                float(acc.pop(0))  # scalar D2H sync (platform-reliable)
        for a in acc:
            float(a)
        h2d_s = time.perf_counter() - t0

        # -- stage 3: dispatch-only (device-resident batch) -------------
        last = served(weights, u8w)
        _ = float(np.asarray(last, np.float32).sum())  # warm + sync
        t0 = time.perf_counter()
        inflight = []
        for i in range(self.n_batches):
            inflight.append(served(weights, u8w))
            if len(inflight) > self.pipeline_depth:
                inflight.pop(0).block_until_ready()
        out = inflight[-1]
        for o in inflight:
            o.block_until_ready()
        _ = float(np.asarray(out, np.float32).ravel()[0])
        disp_s = time.perf_counter() - t0

        # -- stage 4: overlapped (H2D + dispatch pipelined) -------------
        t0 = time.perf_counter()
        inflight = []
        for i in range(self.n_batches):
            u8 = jax.device_put(cache[i % len(cache)], dev)
            inflight.append(served(weights, u8))
            if len(inflight) > self.pipeline_depth:
                inflight.pop(0).block_until_ready()
        out = inflight[-1]
        for o in inflight:
            o.block_until_ready()
        _ = float(np.asarray(out, np.float32).ravel()[0])
        ovl_s = time.perf_counter() - t0

        rate = lambda s, n=self.n_batches: round(n * self.img / s, 1)  # noqa: E731
        rep = {"mode": "serve_stages", "net": pipe.name, "img": self.img,
               "batches": self.n_batches}
        if self.report_perf:
            rep.update(
                decode_img_s=rate(dec_s, n_dec),
                h2d_img_s=rate(h2d_s),
                h2d_GB_s=round(self.n_batches * nbytes / h2d_s / 1e9, 3),
                dispatch_img_s=rate(disp_s),
                overlapped_img_s=rate(ovl_s),
                # the pipeline cap: min of the stage rates; overlap quality
                # = overlapped rate / that cap (1.0 = perfect overlap)
                overlap_quality=round(
                    rate(ovl_s) / min(rate(h2d_s), rate(disp_s)), 3))
        else:
            o = np.asarray(out, np.float32).reshape(self.img, -1)
            rep.update(out_shape=list(np.asarray(out).shape),
                       prob_ok=bool(abs(float(o.sum()) / self.img - 1.0)
                                    < 2e-2))
        print(json.dumps(rep))
