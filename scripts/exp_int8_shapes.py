"""int8-vs-bf16 MXU probe at the flagship's ACTUAL hot shapes.

toolchain_watch 2026-08-20 flipped the int8 ledger: int8 matmul at 2048^3
measured 1.87x over bf16 (307 TOPS) where earlier probes read 67/51 TOPS
("no int8 advantage", docs/mfu_ceiling.md act_int8 section). Before
re-opening the int8 engine path (tune.int8 / BENCH_INT8) as a whole-net
lever, measure whether the advantage exists at resnet50's real shapes —
the deep-half 1x1s and 3x3s that already run at ~95% of bf16 peak and are
therefore the only ops int8 compute can still accelerate.

Each row: in-program A/B (abtime.ab_compare), int8 (pre-quantized
operands, int32 accumulation — the steady-state serving form where weight
quant is upload-time and activation quant fuses into the producer) vs
bf16 on identical logical shapes.

Run on TPU: python scripts/exp_int8_shapes.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (tag, M, K, N) matmul views of r50 b32 ops: 1x1 convs are exact matmuls
# (M = img*y*x); 3x3 res5 branch2b via its implicit-GEMM K
SHAPES = [
    ("res4_branch2a 1x1 1024->256 @14", 32 * 14 * 14, 1024, 256),
    ("res4_branch2c 1x1 256->1024 @14", 32 * 14 * 14, 256, 1024),
    ("res5_branch2a 1x1 2048->512 @7", 32 * 7 * 7, 2048, 512),
    ("res5_branch2b 3x3 512->512 @7 (im2col K)", 32 * 7 * 7, 512 * 9, 512),
    ("res3_branch2c 1x1 128->512 @28", 32 * 28 * 28, 128, 512),
    ("res2_branch2c 1x1 64->256 @56", 32 * 56 * 56, 64, 256),
    ("fc1000", 32, 2048, 1000),
    ("square 1024^3", 1024, 1024, 1024),
    ("square 2048^3", 2048, 2048, 2048),
]


def main() -> int:
    import numpy as np

    import jax.numpy as jnp
    import ml_dtypes
    from jax import lax

    from boda_tpu.prof.abtime import ab_compare
    import jax
    dev = jax.devices()[0]
    print(f"int8-vs-bf16 at r50 shapes (jax {jax.__version__}):")
    for tag, m, k, n in SHAPES:
        rng = np.random.RandomState(0)
        w = {"w8": jax.device_put(
                rng.randint(-127, 127, (k, n)).astype(np.int8), dev),
             "wb": jax.device_put(
                rng.randn(k, n).astype(ml_dtypes.bfloat16), dev)}
        ins = {"x8": jax.device_put(
                rng.randint(-127, 127, (m, k)).astype(np.int8), dev),
               "xb": jax.device_put(
                rng.randn(m, k).astype(ml_dtypes.bfloat16), dev)}

        def raw_a(wd, xi):
            o = lax.dot(xi["x8"], wd["w8"],
                        preferred_element_type=jnp.int32)
            return {"o": o.astype(jnp.float32)}

        def raw_b(wd, xi):
            return {"o": lax.dot(xi["xb"], wd["wb"],
                                 preferred_element_type=jnp.float32)}

        sa, sb = ab_compare(raw_a, raw_b, w, ins)
        fl = 2.0 * m * k * n
        print(f"  {tag:<42} int8 {sa*1e6:8.1f}us ({fl/sa/1e12:6.1f} TOP/s)"
              f"  bf16 {sb*1e6:8.1f}us ({fl/sb/1e12:6.1f} TF/s)"
              f"  speedup {sb/sa:5.2f}x")
    return 0


if __name__ == "__main__":
    sys.exit(main())
