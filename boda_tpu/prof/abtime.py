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


def build_ab_prog(raw_a: Callable, raw_b: Callable,
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
                    if jnp.issubdtype(v.dtype, jnp.floating) or \
                        jnp.issubdtype(v.dtype, jnp.integer):
                        # also chain int inputs: the cast of a runtime ~1e-30
                        # float is 0 in VALUE but not provably so at compile
                        # time, which stops XLA hoisting an all-int leg out
                        # of the scan as loop-invariant
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
                        # abs: a LINEAR full reduction of a matmul can be
                        # strength-reduced by XLA to O(N^2) (sum(XW) =
                        # sum_k rowsum(X)_k * colsum(W)_k — observed 290
                        # "TF/s" on a 197 TF/s part); abs blocks the rewrite
                        tot = tot + jnp.sum(jnp.abs(leaf.astype(jnp.float32)))
                return tot * 1e-30
            return run

        run_a, run_b = leg(raw_a), leg(raw_b)

        def step(carry, flag):
            out = lax.cond(flag != 0, run_a, run_b, carry)
            return out, None

        return lax.scan(step, jnp.float32(0.0), flags)[0]

    return jax.jit(prog)


def ab_compare(raw_a: Callable, raw_b: Callable,
               weights, dev_ins, n_legs: int = 8, reps: int = 2,
               min_diff_s: float = 8e-3) -> tuple[float, float]:
    """(secs_per_fwd_A, secs_per_fwd_B) from interleaved same-program runs.

    Work scales INSIDE one dispatch: each variant is timed as the scan-leg
    slope between an n and a 2n-leg program (one blocked execution per
    reading, best-of-reps). Scaling the number of *executions* of one
    program instead measures dispatch pipelining, not device time — over
    the tunneled TPU repeated identical dispatches overlap so deeply that
    per-execution marginal cost reads near zero (impossible 600+ TF/s).

    The leg count auto-scales: with ~26ms dispatch latency and ms-scale
    jitter, the n-vs-2n difference must comfortably exceed the noise floor
    (min_diff_s) or the slope is jitter, not device time. If the first
    reading's difference is too small, legs are multiplied and the
    measurement redone (scan bodies compile once regardless of length).
    Measured repeatability (identical A/B programs, v5e over the tunnel):
    per-side ratio within ~±6%. Treat sub-10% wins as noise unless
    confirmed across independent calls."""
    import time as _time

    import jax.numpy as jnp

    def measure(legs):
        progs = {n: build_ab_prog(raw_a, raw_b, n_legs=n)
                 for n in (legs, 2 * legs)}

        def run(n, a_side):
            flags = (jnp.ones if a_side else jnp.zeros)((n,), jnp.int32)
            t0 = _time.perf_counter()
            # sync via scalar D2H: block_until_ready has been observed to
            # return before device completion over the tunneled platform
            # (probe: 512-leg program "completing" in 0.05ms); the host read
            # of the chain result cannot
            float(progs[n](weights, dev_ins, flags))
            return _time.perf_counter() - t0

        import statistics
        for n in progs:  # compile + warm both variants
            run(n, True)
            run(n, False)
        das, dbs = [], []
        for p in range(3):  # median of 3 independent slope passes: a single
            # jittered reading otherwise produces wild outlier slopes
            t = {(s, n): [] for s in (True, False) for n in progs}
            for _r in range(reps):
                for n in progs:
                    # palindromic order: each side gets a reading in the
                    # warm (second) position, so min() cancels switch cost
                    for side in (True, False, False, True):
                        t[(side, n)].append(run(n, side))
            das.append(min(t[(True, 2 * legs)]) - min(t[(True, legs)]))
            dbs.append(min(t[(False, 2 * legs)]) - min(t[(False, legs)]))
        return statistics.median(das), statistics.median(dbs)

    legs = n_legs
    da, db = measure(legs)
    for _ in range(3):
        worst = min(da, db)
        if worst >= min_diff_s:
            break
        scale = max(4, int(min_diff_s / max(worst, min_diff_s / 64)))
        legs = min(legs * scale, 4096)
        da, db = measure(legs)
    return max(da / legs, 1e-12), max(db / legs, 1e-12)
