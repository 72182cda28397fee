"""Dump the compiled-HLO instructions + tiled layouts around the stem
(inputs['data'] ingestion and conv1) of the flagship program, to explain
the 108us input-copy + 270us conv1 reads in the per-op trace.

Run on the TPU: python scripts/exp_stem_hlo.py
"""

import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import numpy as np

    import boda_tpu.modes_all  # noqa: F401
    from boda_tpu.config import make
    from boda_tpu.models.zoo import build_model
    from boda_tpu.ops.kernels.gen_data import gen_data_pattern
    import jax
    import ml_dtypes

    pipe, in_dims = build_model("resnet50", img=32)
    eng = make("conv_fwd", "pallas", precision="default",
               compute_tn="bfloat16", kernel_policy="lib", input_s2d=True)
    eng.init(pipe)
    d = in_dims["data"]
    x = np.asarray(gen_data_pattern(d.shape, d.tn))
    xh = np.ascontiguousarray(x.transpose(0, 2, 3, 1)).astype(
        ml_dtypes.bfloat16)
    xh = eng.host_input_s2d("data", xh)
    print("host s2d input shape:", xh.shape, xh.dtype)
    raw = eng.build_raw_fn(["prob"])
    hlo = jax.jit(raw).lower(dict(eng._weights_dev),
                             {"data": xh}).compile().as_text()
    # print every instruction mentioning the input or conv1's op_name, plus
    # any instruction whose shape carries the 115x115 stem spatial dims
    pat = re.compile(r"conv1|data|115|57,\s*57|custom-call", re.I)
    n = 0
    for ln in hlo.splitlines():
        if ("=" in ln and pat.search(ln)) or " ROOT " in ln[:12]:
            ln = ln.strip()
            if len(ln) > 400:
                ln = ln[:400] + " ..."
            print(ln)
            n += 1
            if n > 80:
                break
    # buffer donation / entry layouts
    print("\n--- entry computation layout ---")
    m = re.search(r"ENTRY[^\n]*\n", hlo)
    if m:
        print(m.group(0)[:2000])


if __name__ == "__main__":
    main()
