"""AUTO entry layouts for the flagship program: kill the in-program input
relayout copy.

Per-op trace (2026-08, b32 flagship): `inputs['data']` costs 108us/fwd and
the compiled HLO shows XLA relaying the host-layout (N,115,115,12) s2d
input into an exotic {0,3,2,1} tiled layout before conv1, plus a weight
copy for conv1's folded filters (~26us). Compiling with
``Format(Layout.AUTO)`` in_shardings lets XLA declare its preferred ENTRY
layouts instead; device_put-ing the inputs/weights with the compiled
formats then makes the in-program copies vanish (the relayout moves to
upload time, off the per-forward critical path — production serving
uploads asynchronously).

Evidence captured here:
 1. static: bytes of copy/transpose fusions touching parameters in the
    default vs AUTO HLO
 2. wall: chained slope timing (time_fwd method) of both programs,
    interleaved best-of-N

Run on the TPU: python scripts/exp_auto_layout.py
"""

import os
import statistics
import sys
import time as _time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def log(msg):
    print(f"[{_time.strftime('%H:%M:%S')}] {msg}", flush=True)


def build_chained(raw):
    import jax
    import jax.numpy as jnp
    from jax import lax

    def chained(weights, xins, length):
        def step(carry, _):
            pins = {}
            for k, v in xins.items():
                if jnp.issubdtype(v.dtype, jnp.floating):
                    pins[k] = v + carry.astype(v.dtype)
                else:
                    pins[k] = v
            outs = raw(weights, pins)
            tot = jnp.float32(0.0)
            for leaf in jax.tree_util.tree_leaves(outs):
                if jnp.issubdtype(leaf.dtype, jnp.floating):
                    tot = tot + jnp.sum(jnp.abs(leaf.astype(jnp.float32)))
            return tot * 1e-30, None
        return lax.scan(step, jnp.float32(0.0), None, length=length)[0]
    return chained


def slope_time(fn_n, fn_2n, args_n, args_2n, n):
    """median-of-3 paired (2n - n) slope, best-of-4 per endpoint."""
    for _ in range(2):
        float(fn_n(*args_n))
        float(fn_2n(*args_2n))
    diffs = []
    for _ in range(3):
        ts = {k: [] for k in ("n", "2n")}
        for _ in range(4):
            t0 = _time.perf_counter()
            float(fn_n(*args_n))
            ts["n"].append(_time.perf_counter() - t0)
            t0 = _time.perf_counter()
            float(fn_2n(*args_2n))
            ts["2n"].append(_time.perf_counter() - t0)
        diffs.append((min(ts["2n"]) - min(ts["n"])) / n)
    return statistics.median(diffs)


def main():
    import jax
    import ml_dtypes
    import numpy as np
    from jax.experimental.layout import Format, Layout

    import boda_tpu.modes_all  # noqa: F401
    from boda_tpu.config import make
    from boda_tpu.models.zoo import build_model
    from boda_tpu.ops.kernels.gen_data import gen_data_pattern

    img = int(os.environ.get("IMG", "32"))
    pipe, in_dims = build_model("resnet50", img=img)
    eng = make("conv_fwd", "pallas", precision="default",
               compute_tn="bfloat16", kernel_policy="lib", input_s2d=True)
    eng.init(pipe)
    d = in_dims["data"]
    x = np.asarray(gen_data_pattern(d.shape, d.tn))
    xh = np.ascontiguousarray(x.transpose(0, 2, 3, 1)).astype(
        ml_dtypes.bfloat16)
    xh = eng.host_input_s2d("data", xh)
    raw = eng.build_raw_fn(["prob"])
    dev = jax.devices()[0]
    w_dev = dict(eng._weights_dev)
    ins = {"data": jax.device_put(xh, dev)}

    chained = build_chained(raw)
    n = 48
    fns, args = {}, {}
    for mode in ("default", "auto"):
        kw = {}
        if mode == "auto":
            kw["in_shardings"] = Format(Layout.AUTO)
        for length in (n, 2 * n):
            j = jax.jit(lambda w, x_, length=length:
                        chained(w, x_, length), **kw)
            if mode == "auto":
                sds = jax.tree.map(
                    lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype),
                    (w_dev, ins))
                lowered = j.lower(*sds)
            else:
                lowered = j.lower(w_dev, ins)
            comp = lowered.compile()
            if mode == "auto" and length == n:
                fmts = comp.input_formats[0]
                log(f"auto data format: {fmts[1]['data']}")
                hlo = comp.as_text()
                ncopy = sum(1 for ln in hlo.splitlines()
                            if ("copy(" in ln or "bitcast_fusion" in ln))
                log(f"auto HLO copy-ish instrs: {ncopy}")
                wa = jax.tree.map(jax.device_put, w_dev, fmts[0])
                xa = jax.tree.map(jax.device_put, ins, fmts[1])
            elif mode == "default" and length == n:
                hlo = comp.as_text()
                ncopy = sum(1 for ln in hlo.splitlines()
                            if ("copy(" in ln or "bitcast_fusion" in ln))
                log(f"default HLO copy-ish instrs: {ncopy}")
            fns[(mode, length)] = comp
        args[mode] = (w_dev, ins) if mode == "default" else (wa, xa)

    for _ in range(3):
        td = slope_time(lambda w, x_: fns[("default", n)](w, x_),
                        lambda w, x_: fns[("default", 2 * n)](w, x_),
                        args["default"], args["default"], n)
        ta = slope_time(lambda w, x_: fns[("auto", n)](w, x_),
                        lambda w, x_: fns[("auto", 2 * n)](w, x_),
                        args["auto"], args["auto"], n)
        log(f"b{img}: default {td*1e6:.1f}us/fwd ({img/td:.0f} img/s)  "
            f"auto {ta*1e6:.1f}us/fwd ({img/ta:.0f} img/s)  "
            f"speedup {td/ta:.3f}x")


if __name__ == "__main__":
    main()
