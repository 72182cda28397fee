"""Atomic training-state checkpoints: weights + optimizer + step.

Persisted-state contract generalized to training state (round-1 verdict
next item #5; the reference's persisted-state surface is weights/wisdom/
digests, SURVEY §5.4). Format: one .npz written to a temp file then
os.replace'd (atomic on POSIX) — a killed run never leaves a truncated
checkpoint. bfloat16 arrays (no native numpy dtype) are stored as uint16
views with a dtype manifest."""

from __future__ import annotations

import json
import os

import numpy as np


def _pack(arrays: dict, prefix: str, out: dict, dtypes: dict) -> None:
    for k, v in arrays.items():
        a = np.asarray(v)
        key = prefix + k
        if a.dtype.name == "bfloat16":
            dtypes[key] = "bfloat16"
            a = a.view(np.uint16)
        out[key] = a


def save_checkpoint(fn: str, step: int, weights: dict,
                    mom_state: dict | None = None) -> None:
    out: dict = {}
    dtypes: dict = {}
    _pack(weights, "w/", out, dtypes)
    if mom_state:
        _pack(mom_state, "m/", out, dtypes)
    out["__meta__"] = np.frombuffer(json.dumps(
        {"step": int(step), "dtypes": dtypes,
         "has_mom": bool(mom_state)}).encode(), dtype=np.uint8)
    tmp = fn + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **out)
    os.replace(tmp, fn)  # atomic: readers never see a partial file


def load_checkpoint(fn: str) -> tuple[int, dict, dict | None]:
    """-> (step, weights, mom_state-or-None)."""
    import ml_dtypes
    z = np.load(fn)
    meta = json.loads(bytes(z["__meta__"]).decode())
    dtypes = meta["dtypes"]

    def unpack(prefix):
        out = {}
        for key in z.files:
            if not key.startswith(prefix):
                continue
            a = z[key]
            if dtypes.get(key) == "bfloat16":
                a = a.view(ml_dtypes.bfloat16)
            out[key[len(prefix):]] = a
        return out

    weights = unpack("w/")
    mom = unpack("m/") if meta["has_mom"] else None
    return meta["step"], weights, mom
