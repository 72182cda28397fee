"""sgemm generator swing (VERDICT r4 #7): block-size sweep vs XLA dot.

Ledger (docs/gen_vs_lib.md): gen Pallas sgemm bf16 2048^3 = 90.3 TF/s vs
XLA dot 160.4 (56%); the reference's generated sgemm reached ~81% of
cuBLAS (ref doc/sgemm-notes.txt:10-52). Roofline arithmetic says the
incumbent (bm,bn,bk)=(256,256,512) is HBM-BOUND BY RE-READS, not
compute-bound: at 2048^3 each operand re-loads grid_n (resp. grid_m) = 8
times -> 128 MB of block traffic = 156 us at 820 GB/s vs an 87 us MXU
floor. 512-wide tiles quarter the re-reads (72 MB ~ 88 us — balanced).
This sweeps the block space in-program vs the XLA dot (ab_compare; both
sides share dispatch path), per shape.

Usage (TPU host): python scripts/exp_sgemm_blocks.py [SIZES=2048,4096]
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

CASES = [
    (256, 256, 512),    # incumbent (OpTune defaults)
    (256, 256, 2048),
    (512, 256, 512),
    (512, 512, 512),
    (512, 512, 1024),
    (512, 512, 2048),
    (1024, 512, 512),
    (512, 1024, 512),
]


def main() -> int:
    sizes = [int(s) for s in
             os.environ.get("SIZES", "2048,4096").split(",")]
    import jax
    import jax.numpy as jnp

    from boda_tpu.ops.kernels.sgemm import pallas_matmul
    from boda_tpu.prof.abtime import ab_compare

    rng = np.random.RandomState(0)
    dev = jax.devices()[0]
    out = {}
    for n in sizes:
        a = jax.device_put(jnp.asarray(
            rng.randn(n, n).astype(np.float32)).astype(jnp.bfloat16), dev)
        b = jax.device_put(jnp.asarray(
            rng.randn(n, n).astype(np.float32)).astype(jnp.bfloat16), dev)
        fl = 2.0 * n * n * n

        def raw_dot(w, ins):
            return {"o": jnp.dot(ins["a"], w["b"],
                                 preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.DEFAULT)
                    .astype(jnp.bfloat16)}

        for bm, bn, bk in CASES:
            if bk > n or bm > n or bn > n:
                continue

            def raw_gen(w, ins, bm=bm, bn=bn, bk=bk):
                return {"o": pallas_matmul(
                    ins["a"], w["b"], bm=bm, bn=bn, bk=bk,
                    out_dtype=jnp.bfloat16, precision="default")}

            try:
                sa, sb = ab_compare(raw_gen, raw_dot, {"b": b}, {"a": a})
            except Exception as e:
                print(f"n={n} bm={bm} bn={bn} bk={bk} ERROR "
                      f"{type(e).__name__}: {e}", flush=True)
                continue
            row = {"gen_TFs": round(fl / sa / 1e12, 1),
                   "dot_TFs": round(fl / sb / 1e12, 1),
                   "ratio": round(sb / sa, 3)}
            out[f"{n}_{bm}_{bn}_{bk}"] = row
            print(f"n={n} bm={bm} bn={bn} bk={bk}", json.dumps(row),
                  flush=True)
    print("ALL", json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
