"""Kernel generation: op signature + tune -> compiled-function factory.

Parity target: ``rtc_codegen_t`` (ref src/rtc_func_gen.H:170) — the
cache/driver mapping op signatures to generated-function instantiations with
unique deterministic naming and batched deferred compilation — and the
per-op custom codegen hook (``custom_codegen_t``, ref src/rtc_func_gen.H:37).

TPU-first: a "generator" is a python function building a jax-callable (Pallas
kernel or stock-XLA lowering) from (op, tune, ctx); there is no source-string
templating. Signature reduction (ref check_args, rtc_func_gen.cc:126) is
subsumed by keying the cache on exactly (op.key, tune.key, platform).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from ..rtc.compute import Backend, Call, FuncInfo, RtcError
from .op_base import Op
from .tune import OpTune


@dataclass(frozen=True)
class GenCtx:
    use_ref: bool        # build the plain-jnp reference implementation
    interpret: bool      # run Pallas kernels in interpreter mode (non-TPU)
    platform: str        # 'tpu' | 'cpu' | ...


# op type -> generator(op, tune, ctx) -> FuncInfo (name filled in by Codegen)
_GENERATORS: dict[str, Callable[[Op, OpTune, GenCtx], FuncInfo]] = {}


def kernel_gen(op_type: str):
    def deco(fn):
        _GENERATORS[op_type] = fn
        return fn
    return deco


def has_generator(op_type: str) -> bool:
    return op_type in _GENERATORS


class Codegen:
    """Per-backend function cache + unique naming + deferred compile."""

    def __init__(self, be: Backend):
        self.be = be
        self._cache: dict[tuple[str, str], FuncInfo] = {}
        self._n = 0

    def ctx(self) -> GenCtx:
        return GenCtx(use_ref=self.be.use_ref_impl(),
                      interpret=self.be.interpret_mode(),
                      platform=self.be.device().platform)

    def gen_func(self, op: Op, tune: OpTune = OpTune()) -> FuncInfo:
        key = (op.key(), tune.key())
        fi = self._cache.get(key)
        if fi is not None:
            return fi
        if hasattr(self.be, "remote_gen_func"):
            # remote backends regenerate kernels worker-side from the signature
            fi = self.be.remote_gen_func(op, tune)
            self._cache[key] = fi
            return fi
        gen = _GENERATORS.get(op.type)
        if gen is None:
            raise RtcError(f"no kernel generator for op type {op.type!r}; "
                           f"have {sorted(_GENERATORS)}")
        fi = gen(op, tune, self.ctx())
        fi.name = f"{op.type}__{self._n}"
        self._n += 1
        self.be.add_func(fi)
        self._cache[key] = fi
        return fi

    def compile(self) -> None:
        self.be.compile()

    def run_func(self, fi: FuncInfo, arg_map: dict[str, str], call_tag: str = "") -> int:
        return self.be.run(Call(fi.name, arg_map, call_tag or fi.name))


# import kernel modules so their generators register (mirrors modes_all)
def _import_kernels() -> None:
    from .kernels import conv, elementwise, gen_data, sgemm  # noqa: F401


_import_kernels()
