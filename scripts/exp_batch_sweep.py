"""Batch-size sweep for the flagship bench, one process (shared warmup).

Runs resnet50 bf16 lib-policy time_fwd at a list of batch sizes and prints
img/s + TF/s for each. Cross-batch numbers are cross-program (the ±6% A/B
noise floor does not apply), but the b32->b64 regression previously measured
is ~17% — coarse resolution is enough to map the curve's shape. Best-of-4
chained readings per batch (bench.py discipline), with the physics floor
guard against corrupted slope reads.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

BATCHES = [int(b) for b in
           os.environ.get("SWEEP_BATCHES", "16,24,32,40,48").split(",")]


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def bench_batch(model, img):
    import numpy as np

    from boda_tpu.config import make
    from boda_tpu.models.zoo import build_model
    from boda_tpu.ops.kernels.gen_data import gen_data_pattern
    from boda_tpu.utils.dims import NDA

    pipe, in_dims = build_model(model, img=img)
    eng = make("conv_fwd", "pallas", precision="default",
               compute_tn="bfloat16", kernel_policy="lib")
    eng.init(pipe)
    d = in_dims["data"]
    x = NDA(d, np.asarray(gen_data_pattern(d.shape, d.tn)))
    fl = pipe.total_flops()
    floor_s = fl / 500e12
    times = [eng.time_fwd({"data": x}, ["prob"], n_iters=24, chain=8)
             for _ in range(4)]
    valid = [t for t in times if t >= floor_s]
    if not valid:
        log(f"b{img}: ALL readings below physics floor {floor_s*1e6:.0f}us")
        return None
    secs = min(valid)
    r = {"img": img, "img_s": round(img / secs, 1),
         "TF_s": round(fl / secs / 1e12, 1),
         "us_per_fwd": round(secs * 1e6, 1)}
    log(f"b{img}: {r['img_s']} img/s = {r['TF_s']} TF/s")
    return r


def main():
    model = os.environ.get("SWEEP_MODEL", "resnet50")
    res = [bench_batch(model, b) for b in BATCHES]
    print(json.dumps([r for r in res if r]))


if __name__ == "__main__":
    main()
