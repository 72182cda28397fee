"""serve_bench: end-to-end serving throughput — native loader feeding the TPU.

The production-pipeline benchmark the reference's capture/LMDB loops play
(decode -> preprocess -> net, host work overlapped with device compute):
the native C++ threaded loader (jpeg decode + resize, native/boda_native.cc)
prefetches batches while the engine runs the previous one.
"""

from __future__ import annotations

import json
import time

from .. import graph  # noqa: F401
from ..config import ConfigError, Field, Mode, register
from ..utils.dims import NDA
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
    n_threads = Field(int, default="4", help="native loader threads")
    out_node_name = Field(str, default="prob", help="output node")

    def main(self) -> None:
        import numpy as np

        from ..apps.preproc import img_to_batch_np
        from ..utils.native import BatchLoader, native_available
        if not native_available():
            raise ConfigError("serve_bench needs the native library "
                              "(make -C native failed?)")
        pipe, in_dims = load_net(self.model, self.ptt_fn, "", self.img, 0)
        self.conv_fwd.init(pipe)
        d = in_dims["data"]
        paths = [fn for fn in self.img_fns]
        n_imgs = self.n_batches * self.img
        paths = (paths * (n_imgs // len(paths) + 1))[:n_imgs]
        # warmup compile
        warm = np.zeros((self.img, d["y"], d["x"], 4), np.uint8)
        self.conv_fwd.run_fwd(
            {"data": NDA(d, img_to_batch_np(warm).astype(np.float32))},
            [self.out_node_name])
        t0 = time.perf_counter()
        n_done = 0
        with BatchLoader(paths, self.img, d["y"], d["x"],
                         n_threads=self.n_threads) as loader:
            while True:
                r = loader.next()
                if r is None:
                    break
                _, rgba = r
                x = img_to_batch_np(rgba).astype(np.float32)
                self.conv_fwd.run_fwd({"data": NDA(d, x)}, [self.out_node_name])
                n_done += 1
        secs = time.perf_counter() - t0
        img_s = n_done * self.img / secs
        print(json.dumps({"mode": "serve_bench", "net": pipe.name,
                          "batches": n_done, "img": self.img,
                          "img_per_sec": round(img_s, 1),
                          "secs": round(secs, 3)}))
