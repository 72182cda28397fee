"""In-program A/B timing: jitter-immune candidate-vs-incumbent comparison.

Cross-program timing over the tunneled TPU dispatch path jitters up to 2x
(NOTES_ROUND3.md), which made net_tune's paired-incumbent guard correctly
reject every candidate — the loop was closed but empty-handed (round-1
verdict, Weak #3). This harness removes the program identity as a noise
source: BOTH whole-net variants are compiled into ONE executable as the two
branches of a ``lax.cond`` inside a data-dependent ``lax.scan`` chain, with
the branch selected per leg by a runtime flags array. Timing flags=all-A vs
flags=all-B dispatches the *same* program object down the *same* path —
dispatch latency, tunnel state, and compilation artifacts cancel, leaving
only the device-time difference of the two variants.

Parity target: the measurement role of the reference's per-op profiler
(ref src/op-tuner.cc:68-204, src/rtc_prof.cc:194 — timed candidate runs vs a
known-good incumbent), redesigned for a high-jitter remote dispatch path.
"""

from __future__ import annotations

from typing import Callable


def build_ab_prog(raw_a: Callable, raw_b: Callable, out_names: list[str],
                  n_legs: int = 8) -> Callable:
    """One jitted fn(weights, inputs, flags) -> f32 scalar running `n_legs`
    data-dependent whole-net forwards; leg i runs variant A when flags[i]
    is nonzero, else variant B. raw_* are build_raw_fn-style pure fns.

    The scan carry perturbs the inputs by ~0 each leg (defeats CSE; forces
    serial execution) exactly like FwdEngine.time_fwd's chained mode."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    def prog(weights, xins, flags):
        def leg(raw):
            def run(carry):
                pins = {}
                for k, v in xins.items():
                    if jnp.issubdtype(v.dtype, jnp.floating):
                        pins[k] = v + carry.astype(v.dtype)
                    else:
                        pins[k] = v
                outs = raw(weights, pins)
                # chain through a FULL reduction of every output: consuming
                # only out[0] lets XLA push the slice back through dots and
                # convs and dead-code-eliminate almost the entire leg
                # (measured: impossible 600+ TF/s per-leg readings); a sum
                # needs every element, so the leg must actually run
                tot = jnp.float32(0.0)
                for leaf in jax.tree_util.tree_leaves(outs):
                    if jnp.issubdtype(leaf.dtype, jnp.floating):
                        tot = tot + jnp.sum(leaf.astype(jnp.float32))
                return tot * 1e-30
            return run

        run_a, run_b = leg(raw_a), leg(raw_b)

        def step(carry, flag):
            out = lax.cond(flag != 0, run_a, run_b, carry)
            return out, None

        return lax.scan(step, jnp.float32(0.0), flags)[0]

    return jax.jit(prog)


def ab_compare(prog: Callable, weights, dev_ins, n_legs: int = 8,
               n_rounds: int = 5, n_iters: int = 6) -> tuple[float, float]:
    """(secs_per_fwd_A, secs_per_fwd_B) from interleaved same-program runs.

    Per round, times the program once with flags=all-A and once with
    flags=all-B (interleaved, so slow drift hits both equally) using the
    difference method; returns the per-leg medians across rounds."""
    import statistics

    import jax.numpy as jnp

    from ..rtc.backends import time_diff_method
    flags_a = jnp.ones((n_legs,), jnp.int32)
    flags_b = jnp.zeros((n_legs,), jnp.int32)

    def timed(flags):
        return time_diff_method(
            lambda: prog(weights, dev_ins, flags),
            lambda outs: [o.block_until_ready() for o in outs
                          if hasattr(o, "block_until_ready")],
            n_iters=n_iters, warmup=1) / n_legs

    ta, tb = [], []
    for _ in range(n_rounds):
        ta.append(timed(flags_a))
        tb.append(timed(flags_b))
    return statistics.median(ta), statistics.median(tb)
