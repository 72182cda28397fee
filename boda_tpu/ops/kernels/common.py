"""Shared helpers for Pallas kernel builders."""

from __future__ import annotations

import jax
import jax.numpy as jnp

PRECISIONS = {"default": jax.lax.Precision.DEFAULT,
              "high": jax.lax.Precision.HIGH,
              "highest": jax.lax.Precision.HIGHEST}


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return cdiv(x, m) * m


def jdt(tn: str):
    return {
        "float32": jnp.float32, "bfloat16": jnp.bfloat16, "float16": jnp.float16,
        "int32": jnp.int32, "uint32": jnp.uint32, "int8": jnp.int8,
        "uint8": jnp.uint8, "float64": jnp.float64, "bool": jnp.bool_,
    }[tn]


def sublane(tn: str) -> int:
    """Min second-to-last tile dim for a dtype (lane dim is always 128)."""
    return {"float32": 8, "bfloat16": 16, "int8": 32, "float16": 16}.get(tn, 8)


def pick_block(want: int, total: int, align: int) -> int:
    """Largest aligned block <= max(want, align), clamped to padded total."""
    b = max(align, (want // align) * align)
    return min(b, round_up(total, align))


def pad2d(x, mp: int, np_: int):
    m, n = x.shape
    if m == mp and n == np_:
        return x
    return jnp.pad(x, ((0, mp - m), (0, np_ - n)))
