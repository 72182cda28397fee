"""Concrete compute backends: ``tpu`` (Pallas/XLA) and ``interp`` (CPU oracle).

Parity mapping (ref SURVEY.md section 1 L3):
  * ``tpu``    <- nvrtc_compute_t (the real device, generated kernels)
  * ``interp`` <- the oracle role of caffe/OpenCL-peer backends: runs the
                  *reference* (plain jax.numpy) implementation of every op on
                  CPU in float32 — an independent numeric ground truth.
"""

from __future__ import annotations

import numpy as np

from ..config import Field, register
from ..utils.dims import NDA, Dims
from .compute import Backend, FuncInfo


def _jax():
    import jax
    return jax


def _jnp_dtype(tn: str):
    import jax.numpy as jnp
    return {
        "float32": jnp.float32, "bfloat16": jnp.bfloat16, "float16": jnp.float16,
        "int32": jnp.int32, "uint32": jnp.uint32, "int8": jnp.int8,
        "uint8": jnp.uint8, "float64": jnp.float64, "bool": jnp.bool_,
    }[tn]


def time_diff_method(run_once, block_on, n_iters: int = 20, warmup: int = 3) -> float:
    """Steady-state secs/iter: slope between an n-iter and a 2n-iter batch
    (cancels fixed dispatch/sync latency). Noise guard: if the slope is an
    implausibly small fraction of the per-iter wall time, re-measure with a
    larger n (dispatch jitter can otherwise produce ~0 slopes)."""
    import time as _time

    def batch(n):
        t0 = _time.perf_counter()
        outs = None
        for _ in range(n):
            outs = run_once()
        block_on(outs if isinstance(outs, tuple) else (outs,))
        return _time.perf_counter() - t0

    for _ in range(warmup):
        outs = run_once()
        block_on(outs if isinstance(outs, tuple) else (outs,))
    n = n_iters
    for _attempt in range(3):
        # median of 3 slope estimates: a single jittered batch otherwise
        # produces impossible near-zero (or huge) slopes that poison wisdom
        slopes = []
        for _ in range(3):
            t_n = batch(n)
            t_2n = batch(2 * n)
            slopes.append(((t_2n - t_n) / n, t_n))
        slopes.sort()
        slope, t_n = slopes[1]
        if slope > 0.02 * (t_n / n):
            return slope
        n *= 4  # suspicious slope: amortize harder
    return max(slope, 1e-12)


class _JaxBackend(Backend):
    """Shared jax-array var store + AOT jit compilation."""

    donate = Field(bool, default="0", help="donate inputs named like outputs (memory reuse)")

    def _zeros(self, dims: Dims):
        import jax.numpy as jnp
        with _jax().default_device(self.device()):
            return jnp.zeros(dims.shape, dtype=_jnp_dtype(dims.tn))

    def _upload(self, nda: NDA):
        return _jax().device_put(nda.data, self.device())

    def _download(self, arr) -> np.ndarray:
        return np.asarray(arr)

    def _compile_one(self, fi: FuncInfo):
        jax = _jax()
        jitted = jax.jit(fi.fn)
        dev = self.device()
        if fi.in_dims is not None:
            # true AOT: trace+lower+compile now (the batched-deferred-compile
            # parity point, ref rtc_func_gen.cc:636) so first run() is hot.
            import jax.numpy as jnp
            avals = [jax.ShapeDtypeStruct(d.shape, _jnp_dtype(d.tn)) for d in fi.in_dims]
            with jax.default_device(dev):
                compiled = jitted.lower(*avals).compile()

            def run_aot(*args):
                return compiled(*args)
            return run_aot

        def run_on_device(*args):
            # inputs are committed to dev by _upload/_zeros; default_device
            # pins zero-input funcs (e.g. gen_data) to the same device.
            with jax.default_device(dev):
                return jitted(*args)
        return run_on_device

    def _block_on(self, arrs) -> None:
        for a in arrs:
            if hasattr(a, "block_until_ready"):
                a.block_until_ready()

    # precise kernel timing: data-dependent chaining INSIDE one dispatch
    # (a lax.scan of n data-chained kernel applications), slope between the
    # n and 2n-leg programs, scalar-D2H sync. Three measured traps force
    # this design (see prof/abtime.py): repeated identical dispatches
    # pipeline so deeply that per-execution marginal cost reads ~0; a lone
    # out[0] chain gets slice-DCE'd; and block_until_ready can return
    # before device completion on the tunneled platform.
    def _chained_prog(self, fi: FuncInfo, length: int):
        jax = _jax()
        import jax.numpy as jnp
        from jax import lax
        fn = fi.fn

        def prog(*ins):
            def step(carry, _):
                pins = []
                for v in ins:
                    if hasattr(v, "dtype") and (
                            jnp.issubdtype(v.dtype, jnp.floating)
                            or jnp.issubdtype(v.dtype, jnp.integer)):
                        pins.append(v + carry.astype(v.dtype))
                    else:
                        pins.append(v)
                outs = fn(*pins)
                outs = outs if isinstance(outs, tuple) else (outs,)
                tot = jnp.float32(0.0)
                for o in outs:
                    if jnp.issubdtype(o.dtype, jnp.floating) or \
                            jnp.issubdtype(o.dtype, jnp.integer):
                        # abs blocks sum-of-matmul strength reduction (see
                        # prof/abtime.py)
                        tot = tot + jnp.sum(jnp.abs(o.astype(jnp.float32)))
                return tot * 1e-30, None
            return lax.scan(step, jnp.float32(0.0), None, length=length)[0]
        return jax.jit(prog)

    def time_func(self, call, n_iters: int = 20, warmup: int = 3):
        import time as _time
        fi = self.funcs[call.fn_name]
        ins = [self._get(call.arg_map[p])[1] for p in fi.in_names]
        if not ins:  # nothing to chain through (e.g. gen_data): repeat-run
            fn = self._compiled[fi.name]
            return time_diff_method(lambda: fn(*ins), self._block_on,
                                    n_iters, warmup)
        n = max(4, n_iters)
        cache = getattr(self, "_time_progs", None)
        if cache is None:
            cache = self._time_progs = {}
        progs = {}
        for length in (n, 2 * n):
            key = (fi.name, length)
            if key not in cache:
                cache[key] = self._chained_prog(fi, length)
            progs[length] = cache[key]

        def run(length):
            t0 = _time.perf_counter()
            float(progs[length](*ins))  # D2H read = real completion barrier
            return _time.perf_counter() - t0

        for length in progs:
            for _ in range(max(1, warmup - 1)):
                run(length)
        import statistics
        slopes = []
        for _ in range(3):
            t_n = min(run(n) for _ in range(2))
            t_2n = min(run(2 * n) for _ in range(2))
            slopes.append((t_2n - t_n) / n)
        return max(statistics.median(slopes), 1e-12)


@register("be", "tpu", help="TPU backend: Pallas kernels + XLA (the real device)")
class TpuBackend(_JaxBackend):
    device_idx = Field(int, default="0", help="jax device index")

    def init(self) -> None:
        jax = _jax()
        devs = jax.devices()
        if self.device_idx >= len(devs):
            raise RuntimeError(f"device_idx {self.device_idx} out of range ({len(devs)} devices)")
        self._device = devs[self.device_idx]

    def device(self):
        return self._device

    def get_plat_tag(self) -> str:
        d = self._device
        return f"tpu:{getattr(d, 'device_kind', 'unknown')}".replace(" ", "_")

    def interpret_mode(self) -> bool:
        # Pallas TPU kernels only compile for real TPUs; on any other platform
        # (tests run on CPU) fall back to the Pallas interpreter.
        return self._device.platform != "tpu"


@register("be", "interp", help="CPU oracle backend: plain-jnp reference implementations")
class InterpBackend(_JaxBackend):
    def init(self) -> None:
        jax = _jax()
        cpus = [d for d in jax.devices("cpu")] or jax.devices()
        self._device = cpus[0]

    def device(self):
        return self._device

    def get_plat_tag(self) -> str:
        return "interp:cpu"

    def use_ref_impl(self) -> bool:
        return True

    def interpret_mode(self) -> bool:
        return True
