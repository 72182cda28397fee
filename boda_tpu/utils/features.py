"""Runtime feature detection (the analog of build-feature gating).

Parity target: ``is_feature_enabled`` (ref build_info.H:7, obj_list feature
sections): the reference compiles features in/out and tests auto-adapt via
``needs=``. Here features are runtime-detected (python deps / devices).
"""

from __future__ import annotations

import importlib
from functools import lru_cache


@lru_cache(maxsize=None)
def is_feature_enabled(name: str) -> bool:
    if name == "tpu":
        import jax
        try:
            return any(d.platform == "tpu" for d in jax.devices())
        except RuntimeError:
            return False
    if name in ("lmdb", "zmq", "torch", "PIL"):
        try:
            importlib.import_module(name)
            return True
        except ImportError:
            return False
    if name == "turbojpeg":
        return is_feature_enabled("PIL")  # PIL plays the jpeg-decode role
    if name == "ref_nets":  # the reference's nets/ zoo (prototxt fixtures)
        import os

        from ..config import _ENV
        return os.path.isdir(_ENV.get("ref_nets_dir", "/root/reference/nets"))
    raise ValueError(f"unknown feature name {name!r}")
