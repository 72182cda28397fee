"""Toolchain watch: re-probe every closed perf-ledger item each session.

The b64/b128/stem/int8 ledgers in docs/mfu_ceiling.md are all closed
"until the compiler moves" (VERDICT r3 #5): each records an XLA/Mosaic
behavior measured on one toolchain generation. This script makes that
claim live instead of archival — run it at the START of each hardware
session and log the output; any FLIPPED line re-opens the named ledger
item.

Items probed (one versioned verdict line each):
  mosaic_concat  bf16 minor-dim concat in a Pallas kernel (blocks the
                 fused-stem tap_cat design, docs/kernel_guide.md)
  b64_pool1      reduce_window max-pool 3x3s2 @112px: b64-vs-b32
                 device-time ratio (ledger: 4.1x over linear at b64,
                 the XLA reduce_window emitter pathology)
  b64_res2c      1x1 conv 256->64 @56px: b64-vs-b32 ratio (ledger: 2.9x
                 over linear at b64, per-shape emitter choice)
  int8_tops      2048^3 int8 vs bf16 matmul (ledger: act_int8 measured
                 0.81-0.96x at four scopes; no int8 TOPS advantage
                 reachable through this toolchain — FLIPPED 2026-08-20,
                 int8 compute re-opened, see mfu_ceiling.md)
  pool1_bwd      maxpool 3x3s2@112 fwd+bwd vs HBM roofline (train-step
                 ledger: SelectAndScatter emitter, train_ceiling.md)
  k1s2_dgrad     stride-2 1x1 dgrad vs its fwd conv (train-step ledger:
                 gradient-dilated transpose-conv emitter)

Measurement: prof/abtime.ab_compare — both variants in ONE program
(cond-branch scan legs), so the b64/b32 comparison shares dispatch path,
compilation artifacts, and tunnel state. Ratios are device-time per
DISPATCH of the two branch bodies; 'linear' batch scaling = 2.0.

Usage:
  python scripts/toolchain_watch.py [--log=docs/toolchain_watch.log]

Parity: the re-test-and-merge discipline of the reference's op-tuner
(ref src/op-tuner.cc:68-204), applied to compiler-behavior ledgers.
"""

from __future__ import annotations

import datetime
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _toolchain() -> str:
    import jax
    import jaxlib
    return f"jax={jax.__version__} jaxlib={jaxlib.__version__}"


def probe_mosaic_concat() -> tuple[bool, str]:
    """True = FLIPPED (SHIFTED-slice concat now compiles -> re-open stem
    tap_cat).

    The aligned bf16 minor-dim concat already compiled on the round-3
    toolchain; the stem ledger's actual blocker is the shifted form —
    lane-concat of column-shifted views (what in-kernel kx taps need,
    probe_mosaic_concat.py kern2). Probe THAT, not the aligned case, or
    the watch re-opens the ledger on a condition that was never closed.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl

    owp, wp, c, kw = 16, 24, 128, 3

    def kern(x_ref, o_ref):
        views = [x_ref[:, kx:kx + owp, :] for kx in range(kw)]
        o_ref[:] = jnp.concatenate(views, axis=-1)

    x = jnp.asarray(np.arange(8 * wp * c).reshape(8, wp, c) % 251,
                    jnp.bfloat16)
    try:
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((8, owp, kw * c), jnp.bfloat16))(x)
        want = np.concatenate(
            [np.asarray(x, np.float32)[:, kx:kx + owp, :] for kx in range(kw)],
            axis=-1)
        ok = bool(np.array_equal(np.asarray(out, np.float32), want))
        return ok, f"shifted-slice concat compiles, correct={ok}"
    except Exception as e:
        return False, f"{type(e).__name__}: {str(e).splitlines()[0][:120]}"


def _ab_ratio(raw_a, raw_b, weights, ins) -> tuple[float, float, float]:
    """(secs_a, secs_b, ratio a/b) via in-program A/B."""
    import jax

    from boda_tpu.prof.abtime import ab_compare
    dev = jax.devices()[0]
    w = {k: jax.device_put(v, dev) for k, v in weights.items()}
    di = {k: jax.device_put(v, dev) for k, v in ins.items()}
    sa, sb = ab_compare(raw_a, raw_b, w, di)
    return sa, sb, sa / sb


def probe_b64_pool1() -> tuple[bool, str]:
    """True = FLIPPED (b64 pool within 1.5x of linear -> re-open b64)."""
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    def pool(x):
        return lax.reduce_window(
            x, -jnp.inf if x.dtype == jnp.float32 else
            jnp.finfo(x.dtype).min, lax.max,
            (1, 3, 3, 1), (1, 2, 2, 1), "SAME")

    def raw_a(w, ins):  # b64
        return {"o": pool(ins["x"])}

    def raw_b(w, ins):  # b32 (first half of the same buffer)
        return {"o": pool(ins["x"][:32])}

    rng = np.random.RandomState(0)
    x = rng.randn(64, 112, 112, 64).astype(np.float32)
    import ml_dtypes
    ins = {"x": x.astype(ml_dtypes.bfloat16)}
    sa, sb, r = _ab_ratio(raw_a, raw_b, {}, ins)
    over = r / 2.0  # linear batch scaling = 2.0
    flipped = over < 1.5
    return flipped, (f"b64 {sa*1e6:.0f}us vs b32 {sb*1e6:.0f}us ratio "
                     f"{r:.2f} ({over:.2f}x over linear; ledger 4.1x)")


def probe_b64_res2c() -> tuple[bool, str]:
    """True = FLIPPED (b64 1x1@56px conv near-linear -> re-open b64)."""
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    def conv(x, w):
        return lax.conv_general_dilated(
            x, w, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(x.dtype)

    def raw_a(w, ins):
        return {"o": conv(ins["x"], w["f"])}

    def raw_b(w, ins):
        return {"o": conv(ins["x"][:32], w["f"])}

    import ml_dtypes
    rng = np.random.RandomState(0)
    w = {"f": rng.randn(1, 1, 256, 64).astype(ml_dtypes.bfloat16)}
    ins = {"x": rng.randn(64, 56, 56, 256).astype(ml_dtypes.bfloat16)}
    sa, sb, r = _ab_ratio(raw_a, raw_b, w, ins)
    over = r / 2.0
    flipped = over < 1.5
    return flipped, (f"b64 {sa*1e6:.0f}us vs b32 {sb*1e6:.0f}us ratio "
                     f"{r:.2f} ({over:.2f}x over linear; ledger 2.9x)")


def probe_int8_tops() -> tuple[bool, str]:
    """True = FLIPPED (int8 matmul >1.3x faster than bf16 -> re-open
    act_int8: the part/toolchain now exposes int8 TOPS)."""
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    def raw_a(w, ins):  # int8 x int8 -> int32
        o = lax.dot(ins["x8"], w["w8"],
                    preferred_element_type=jnp.int32)
        return {"o": o.astype(jnp.float32)}

    def raw_b(w, ins):  # bf16 x bf16
        return {"o": lax.dot(ins["xb"], w["wb"],
                             preferred_element_type=jnp.float32)}

    import ml_dtypes
    rng = np.random.RandomState(0)
    n = 2048
    w = {"w8": rng.randint(-127, 127, (n, n)).astype(np.int8),
         "wb": rng.randn(n, n).astype(ml_dtypes.bfloat16)}
    ins = {"x8": rng.randint(-127, 127, (n, n)).astype(np.int8),
           "xb": rng.randn(n, n).astype(ml_dtypes.bfloat16)}
    sa, sb, r = _ab_ratio(raw_a, raw_b, w, ins)
    speedup = sb / sa  # >1: int8 faster
    flipped = speedup > 1.3
    return flipped, (f"int8 {sa*1e6:.0f}us vs bf16 {sb*1e6:.0f}us "
                     f"speedup {speedup:.2f}x (ledger: no int8 advantage)")


def probe_pool1_bwd() -> tuple[bool, str]:
    """True = FLIPPED (maxpool 3x3s2@112 fwd+bwd reaches half of HBM
    roofline -> re-open the train-step pool ledger, train_ceiling.md).

    Ledger (jax 0.9.0, 2026-08-21): in-train pool1 costs 392us fwd +
    650us bwd per b32 step vs a ~220us combined roofline — the maxpool
    VJP lowers through SelectAndScatter, which the TPU emitter
    serializes. Bytes: fwd 64.3 MB; +bwd (re-read x, read g, write gx)
    = 180.4 MB total."""
    import jax
    import jax.numpy as jnp
    import ml_dtypes
    import numpy as np
    from jax import lax

    def pool(x):
        # init must be literal -inf: the maxpool VJP rule rejects a
        # finfo-min init ("Linearization failed ... output primals")
        return lax.reduce_window(x, -jnp.inf, lax.max,
                                 (1, 3, 3, 1), (1, 2, 2, 1), "SAME")

    def raw_a(w, ins):  # fwd + bwd
        g = jax.grad(lambda x: pool(x).astype(jnp.float32).sum())(ins["x"])
        return {"o": g}

    def raw_b(w, ins):  # fwd only
        return {"o": pool(ins["x"])}

    rng = np.random.RandomState(0)
    ins = {"x": rng.randn(32, 112, 112, 64).astype(ml_dtypes.bfloat16)}
    sa, sb, r = _ab_ratio(raw_a, raw_b, {}, ins)
    eff = 180.4e6 / sa / 819e9  # fraction of spec HBM BW
    flipped = eff > 0.5
    return flipped, (f"fwd+bwd {sa*1e6:.0f}us ({eff*100:.0f}% of HBM "
                     f"roofline) vs fwd {sb*1e6:.0f}us ratio {r:.2f} "
                     f"(ledger: SelectAndScatter-bound)")


def probe_k1s2_dgrad() -> tuple[bool, str]:
    """True = FLIPPED (stride-2 1x1 dgrad within 3x of its fwd conv ->
    re-open the train-step dgrad ledger, train_ceiling.md).

    Ledger (jax 0.9.0, 2026-08-21): the train trace shows stride-2/1x1
    branch bwd rows at 4-12x their fwd (res2a_branch1 6.3x,
    res3a_branch2a 12.5x) — the gradient-dilated transpose-conv emitter.
    Ideal dgrad has exactly the fwd's FLOPs -> fwd+dgrad = 2x fwd."""
    import jax
    import jax.numpy as jnp
    import ml_dtypes
    import numpy as np
    from jax import lax

    def conv(x, w):
        # no preferred_element_type: its transpose rule feeds an f32
        # cotangent to the bf16 transpose-conv (dtype error). The MXU
        # accumulates f32 either way; this is a timing probe.
        return lax.conv_general_dilated(
            x, w, (2, 2), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def raw_a(w, ins):  # fwd + dgrad (w non-diff: no wgrad in the program)
        g = jax.grad(lambda x: conv(x, w["f"]).sum().astype(jnp.float32),
                     )(ins["x"])
        return {"o": g}

    def raw_b(w, ins):  # fwd only
        return {"o": conv(ins["x"], w["f"])}

    rng = np.random.RandomState(0)
    w = {"f": rng.randn(1, 1, 256, 512).astype(ml_dtypes.bfloat16)}
    ins = {"x": rng.randn(32, 56, 56, 256).astype(ml_dtypes.bfloat16)}
    sa, sb, r = _ab_ratio(raw_a, raw_b, w, ins)
    flipped = r < 3.0
    return flipped, (f"fwd+dgrad {sa*1e6:.0f}us vs fwd {sb*1e6:.0f}us "
                     f"ratio {r:.2f} (ideal 2.0; ledger 4-12x bwd/fwd rows)")


def probe_pool_vjp() -> tuple[bool, str]:
    """True = FLIPPED (the explicit argmax+Spreading VJP,
    graph/train_ops.py, becomes FASTER than the stock SelectAndScatter
    path -> re-enable BODA_TRAIN_VJP). Ledger (v5e 2026-08-21): custom
    20,285us vs stock 1,197us fwd+bwd at the train pool1 shape — the
    NCHW lane-dim strided slices/interior pads are pathological, so the
    explicit kernel ships default-OFF."""
    import jax
    import jax.numpy as jnp
    import ml_dtypes
    import numpy as np
    from jax import lax

    from boda_tpu.graph import train_ops

    pool_c = train_ops.make_maxpool_vjp((3, 3), (2, 2), (0, 1), (0, 1),
                                        112, 112, 56, 56)

    def pool_s(x):
        return lax.reduce_window(x, -jnp.inf, lax.max, (1, 1, 3, 3),
                                 (1, 1, 2, 2),
                                 ((0, 0), (0, 0), (0, 1), (0, 1)))

    def mk(fn):
        def raw(w, ins):
            g = jax.grad(
                lambda x: fn(x).astype(jnp.float32).sum())(ins["x"])
            return {"o": g}
        return raw

    rng = np.random.RandomState(0)
    ins = {"x": rng.randn(32, 64, 112, 112).astype(ml_dtypes.bfloat16)}
    sc, ss, r = _ab_ratio(mk(pool_s), mk(pool_c), {}, ins)
    flipped = (sc / ss) > 1.2
    return flipped, (f"stock fwd+bwd {sc*1e6:.0f}us vs explicit-VJP "
                     f"{ss*1e6:.0f}us ratio {sc/ss:.2f} "
                     f"(ledger: custom OFF; re-enable when > 1.2)")


def probe_k1_vjp() -> tuple[bool, str]:
    """True = FLIPPED (the explicit 1x1 dgrad/wgrad VJP becomes FASTER
    than the transpose-conv emitter at the res3a_branch2a shape ->
    re-enable BODA_TRAIN_VJP). Ledger (v5e 2026-08-21): custom 163us vs
    stock 139us — the r4 emitter pathology is FIXED in jax 0.9.0 (the
    k1s2_dgrad probe reads fwd+dgrad at 0.70x fwd), so the explicit
    kernel ships default-OFF."""
    import jax
    import jax.numpy as jnp
    import ml_dtypes
    import numpy as np
    from jax import lax

    from boda_tpu.graph import train_ops
    from boda_tpu.graph.lowering import conv_f32acc

    conv_c = train_ops.conv1x1_explicit((2, 2), lax.Precision.DEFAULT)
    conv_s = conv_f32acc(("NCHW", "OIHW", "NCHW"), (2, 2), ((0, 0), (0, 0)),
                         1, (1, 1), lax.Precision.DEFAULT)

    def mk(fn):
        def raw(w, ins):
            gx, gw = jax.grad(
                lambda x, f: fn(x, f).sum(), argnums=(0, 1))(
                ins["x"], w["f"])
            return {"gx": gx, "gw": gw}
        return raw

    rng = np.random.RandomState(0)
    w = {"f": rng.randn(128, 256, 1, 1).astype(ml_dtypes.bfloat16)}
    ins = {"x": rng.randn(32, 256, 56, 56).astype(ml_dtypes.bfloat16)}
    ss, sc, _ = _ab_ratio(mk(conv_s), mk(conv_c), w, ins)
    flipped = (ss / sc) > 1.2
    return flipped, (f"stock fwd+bwd {ss*1e6:.0f}us vs explicit-VJP "
                     f"{sc*1e6:.0f}us ratio {ss/sc:.2f} "
                     f"(ledger: custom OFF; re-enable when > 1.2)")


PROBES = [
    ("mosaic_concat", probe_mosaic_concat, "stem tap_cat kernel"),
    ("b64_pool1", probe_b64_pool1, "b64 batch-scaling (pool emitter)"),
    ("b64_res2c", probe_b64_res2c, "b64 batch-scaling (1x1@56 emitter)"),
    ("int8_tops", probe_int8_tops, "act_int8 quantized serving"),
    ("pool1_bwd", probe_pool1_bwd, "train-step pool backward (train_ceiling.md)"),
    ("k1s2_dgrad", probe_k1s2_dgrad, "train-step stride-2 dgrad (train_ceiling.md)"),
    ("pool_vjp", probe_pool_vjp, "explicit pool VJP vs stock (train_ops.py)"),
    ("k1_vjp", probe_k1_vjp, "explicit 1x1 VJP vs stock (train_ops.py)"),
]


def main(argv) -> int:
    log_fn = ""
    for a in argv:
        if a.startswith("--log="):
            log_fn = a.split("=", 1)[1]
    tc = _toolchain()
    stamp = datetime.datetime.now().strftime("%Y-%m-%d %H:%M")
    lines = [f"# toolchain_watch {stamp} {tc}"]
    print(lines[0], flush=True)
    n_flip = 0
    for name, fn, ledger in PROBES:
        try:
            flipped, detail = fn()
        except Exception as e:  # a probe crash is INCONCLUSIVE, not a null
            lines.append(f"WATCH {name}: INCONCLUSIVE "
                         f"({type(e).__name__}: {str(e)[:120]})")
            print(lines[-1], flush=True)
            continue
        if flipped:
            n_flip += 1
            lines.append(f"WATCH {name}: FLIPPED -> RE-OPEN [{ledger}] "
                         f"| {detail}")
        else:
            lines.append(f"WATCH {name}: HOLDS | {detail}")
        print(lines[-1], flush=True)
    lines.append(f"toolchain_watch: {n_flip} flipped / {len(PROBES)} probes")
    print(lines[-1], flush=True)
    out = "\n".join(lines)
    if log_fn:
        with open(log_fn, "a") as f:
            f.write(out + "\n\n")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
