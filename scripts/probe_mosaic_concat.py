"""Probe: can Mosaic (Pallas TPU) compile a bf16 minor-dim concat yet?

The fused-stem kernel ledger (docs/mfu_ceiling.md, docs/kernel_guide.md)
is blocked on exactly this: building the K=4*48=192 tap matrix for the
7x7s2 stem conv needs lane-dim concatenation of bf16 tiles in VMEM, which
Mosaic historically cannot lower (the tap_cat kernel falls back to
DMA-composed buffers whose overhead eats the MXU win). Run this probe
each session/toolchain bump (VERDICT r2 item 7); if it prints OK, re-open
the stem kernel (ops/kernels/stem.py) — a compiling bf16 minor-dim concat
flips that ledger.

Exit 0 + "OK" = supported; exit 0 + "UNSUPPORTED: <err>" = still blocked.
"""

import sys


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl

    def kern(a_ref, b_ref, o_ref):
        o_ref[:] = jnp.concatenate([a_ref[:], b_ref[:]], axis=-1)

    a = jnp.ones((8, 128), jnp.bfloat16)
    b = jnp.ones((8, 128), jnp.bfloat16) * 2
    try:
        out = pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((8, 256), jnp.bfloat16),
        )(a, b)
        ok = float(out[:, :128].sum()) == 8 * 128 and \
            float(out[:, 128:].sum()) == 2 * 8 * 128
        print(f"OK: bf16 minor-dim concat compiles and is correct={ok} "
              f"(jax {jax.__version__}) -> re-open stem.py tap_cat")
    except Exception as e:
        msg = str(e).split("\n")[0][:200]
        print(f"UNSUPPORTED: {type(e).__name__}: {msg} (jax {jax.__version__})")

    # The pattern tap_cat ACTUALLY needs (conv.py:516): lane-concat of
    # column-shifted slices, whose sublane/lane offsets differ per view.
    # The f32 path realigns with pltpu.roll (32-bit-only dynamic_rotate);
    # if this compiles for bf16, plain shifted-slice tap_cat unblocks for
    # sub-32-bit dtypes with no roll at all.
    owp, wp, c, kw = 16, 24, 128, 3

    def kern2(x_ref, o_ref):
        views = [x_ref[:, kx:kx + owp, :] for kx in range(kw)]
        o_ref[:] = jnp.concatenate(views, axis=-1)

    x = jnp.asarray(np.arange(8 * wp * c).reshape(8, wp, c) % 251,
                    jnp.bfloat16)
    try:
        out2 = pl.pallas_call(
            kern2,
            out_shape=jax.ShapeDtypeStruct((8, owp, kw * c), jnp.bfloat16),
        )(x)
        want = np.concatenate(
            [np.asarray(x, np.float32)[:, kx:kx + owp, :] for kx in range(kw)],
            axis=-1)
        ok2 = bool(np.array_equal(np.asarray(out2, np.float32), want))
        print(f"OK: bf16 SHIFTED-slice lane concat compiles, correct={ok2} "
              f"(jax {jax.__version__}) -> bf16 tap_cat viable without roll")
    except Exception as e:
        msg = str(e).split("\n")[0][:200]
        print(f"UNSUPPORTED (shifted): {type(e).__name__}: {msg} "
              f"(jax {jax.__version__})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
