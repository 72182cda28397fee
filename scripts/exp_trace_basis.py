"""Collapse the conv-only MFU onto ONE measured time basis (VERDICT r3 #3).

The flagship bench reports conv-only MFU on two bases that straddle the
70% north star (67.3% trace / 72.0% bench). The gap is load-bearing and
was only hypothesized. This experiment measures it:

  1. slope      the chained-bench number (time_fwd chain=8, best-of-4) —
                the marginal per-leg cost inside one dispatch
  2. window(n)  the trace basis at n_iters = 2/4/8/16 UNCHAINED dispatches
                — per-op device time incl. per-dispatch work (the entry
                relayout runs EVERY forward here)
  3. chained-trace  trace of the chain=L scan program itself, attributed
                per-op and divided by L — the same program the slope
                times, with per-op resolution

Hypothesis to test: the slope's 2n-vs-n difference cancels per-DISPATCH
device work (entry relayout, weight-layout ops) along with the RTT, so
the bench basis (unchained conv SHARE x chained secs) understates conv
time; if chained-trace conv_us/leg ~= window conv_us/fwd, the honest
conv-only number is the trace one on BOTH programs and the bench basis
is a share-mismatch artifact.

Run on TPU: python scripts/exp_trace_basis.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MODEL = os.environ.get("TB_MODEL", "resnet50")
IMG = int(os.environ.get("TB_IMG", "32"))
CHAIN_L = int(os.environ.get("TB_CHAIN", "16"))


def build_flagship():
    import numpy as np

    import boda_tpu.modes_all  # noqa: F401
    from boda_tpu.config import make
    from boda_tpu.models.zoo import build_model
    from boda_tpu.ops.kernels.gen_data import gen_data_pattern
    from boda_tpu.utils.dims import Dims, NDA
    s2d = MODEL.startswith("resnet")  # matches the bench default
    pipe, in_dims = build_model(MODEL, img=IMG)
    eng = make("conv_fwd", "pallas", precision="default",
               compute_tn="bfloat16", kernel_policy="lib",
               **({"input_s2d": True} if s2d else {}))
    eng.init(pipe)
    d = in_dims["data"]
    x = np.asarray(gen_data_pattern(d.shape, d.tn))
    import ml_dtypes
    xh = np.ascontiguousarray(x.transpose(0, 2, 3, 1)).astype(
        ml_dtypes.bfloat16)
    if s2d:
        xh = eng.host_input_s2d("data", xh)
    nd = Dims.of(img=xh.shape[0], y=xh.shape[1], x=xh.shape[2],
                 chan=xh.shape[3], tn="bfloat16")
    return pipe, eng, NDA(nd, xh)


def main() -> int:
    import numpy as np

    import jax

    from bench import V5E_BF16_PEAK_TFS, conv_only_mfu
    pipe, eng, x = build_flagship()
    ctypes = ("Convolution", "InnerProduct")
    conv_fl = sum(pipe.op_flops(o) for o, op in pipe.ops.items()
                  if op.type in ctypes)

    # -- 1: slope (the bench headline) ------------------------------------
    eng.run_fwd({"data": x}, ["prob"])  # warm
    secs = min(eng.time_fwd({"data": x}, ["prob"], n_iters=48, chain=8)
               for _ in range(4))
    print(f"slope: {secs * 1e6:.1f} us/fwd (chain=8 best-of-4)")

    # -- 2: unchained trace windows ---------------------------------------
    for n in (2, 4, 8, 16):
        r = conv_only_mfu(eng, pipe, x, secs, n_iters=n)
        print(f"window(n={n:2d}): tot {r['trace_total_us_per_fwd']:7.1f} "
              f"conv {r['conv_us_per_fwd_trace']:7.1f} us/fwd  "
              f"share {r['conv_share']:.4f}  "
              f"mfu_trace {r['conv_mfu_trace_basis']:.4f}  "
              f"mfu_bench {r['conv_mfu_bench_basis']:.4f}")

    # -- 3: chained-program trace -----------------------------------------
    import tempfile
    import shutil

    import jax.numpy as jnp
    from jax import lax

    from boda_tpu.modes.net_trace import aggregate_trace, instr_op_map
    raw = eng.build_raw_fn(["prob"])
    xins = {"data": np.asarray(x.data)}

    def chained(weights, xins):
        def step(carry, _):
            pins = {k: v + carry.astype(v.dtype)
                    if jnp.issubdtype(v.dtype, jnp.floating) else v
                    for k, v in xins.items()}
            outs = raw(weights, pins)
            tot = jnp.float32(0.0)
            for leaf in jax.tree_util.tree_leaves(outs):
                if jnp.issubdtype(leaf.dtype, jnp.floating):
                    tot = tot + jnp.sum(jnp.abs(leaf.astype(jnp.float32)))
            return tot * 1e-30, None
        return lax.scan(step, jnp.float32(0.0), None, length=CHAIN_L)[0]

    cfn = jax.jit(chained)
    w = eng._weights_dev
    float(cfn(w, xins))  # compile + warm
    td = tempfile.mkdtemp(prefix="exp_trace_basis_")
    n_disp = 2
    try:
        with jax.profiler.trace(td):
            for _ in range(n_disp):
                float(cfn(w, xins))  # scalar D2H sync inside the window
        hlo = cfn.lower(w, xins).compile().as_text()
        per = aggregate_trace(td, instr_op_map(hlo, set(pipe.ops)))
    finally:
        shutil.rmtree(td, ignore_errors=True)
    legs = CHAIN_L * n_disp
    tot_us = sum(per.values()) / legs
    conv_us = sum(us for s, us in per.items()
                  if s in pipe.ops and pipe.ops[s].type in ctypes) / legs
    entry_us = sum(us for s, us in per.items()
                   if s.startswith("inputs[")) / legs
    mfu = conv_fl / (conv_us * 1e-6) / 1e12 / V5E_BF16_PEAK_TFS \
        if conv_us > 0 else 0.0
    for s, us in sorted(per.items(), key=lambda kv: -kv[1])[:12]:
        print(f"    {s:<28} {us / legs:>9.1f} us/leg")
    print(f"chained-trace(L={CHAIN_L} x{n_disp}): tot {tot_us:7.1f} "
          f"conv {conv_us:7.1f} entry {entry_us:5.1f} us/leg  "
          f"share {conv_us / max(tot_us, 1e-9):.4f}  conv-MFU {mfu:.4f}")
    print(f"reconcile: slope {secs * 1e6:.1f} vs chained-trace tot "
          f"{tot_us:.1f} us ({tot_us / (secs * 1e6):.3f}x); the honest "
          f"conv-only MFU is the chained-trace one ({mfu:.4f}) — conv "
          f"device time measured per-leg in the SAME program the slope "
          f"times")
    return 0


if __name__ == "__main__":
    sys.exit(main())
