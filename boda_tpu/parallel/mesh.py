"""Device-mesh sharding for multi-chip execution.

The reference's distribution story is an RPC proxy of its device runtime
(ref src/rtc_ipc.cc — §5.8 of SURVEY.md); the TPU-native equivalent is
single-controller JAX: pick a mesh, annotate shardings, let XLA insert
collectives over ICI (pjit/GSPMD — the scaling-book recipe).

Axes used for CNN workloads:
  * dp — data parallel over the img (batch) dim
  * tp — tensor parallel over out_chan of conv/fc weights (+ activations'
         chan dim after each sharded layer; XLA propagates)
  * sp — spatial parallel over activation rows (y) — the CNN analog of
         sequence parallelism (halo exchanges become XLA collective-permutes)

pp/ep notes: the reference has no pipeline stages or experts to map; pipeline
parallelism over graph stages is expressible by staging the topo order across
mesh slices, but is out of reference scope (SURVEY.md §2 checklist).
"""

from __future__ import annotations

from typing import Optional

import numpy as np


class MeshError(ValueError):
    """Invalid mesh request (axis sizes vs available devices)."""


def make_mesh(axis_sizes: dict[str, int], devices=None):
    import jax
    from jax.sharding import Mesh
    devices = devices if devices is not None else jax.devices()
    n = 1
    for ax, s in axis_sizes.items():
        if not isinstance(s, int) or s < 1:
            raise MeshError(f"mesh axis {ax!r} size must be a positive int, "
                            f"got {s!r}")
        n *= s
    if n > len(devices):
        raise MeshError(f"mesh needs {n} devices, have {len(devices)}")
    arr = np.array(devices[:n]).reshape(tuple(axis_sizes.values()))
    return Mesh(arr, tuple(axis_sizes.keys()))


def named_sharding(mesh, *spec):
    from jax.sharding import NamedSharding, PartitionSpec
    return NamedSharding(mesh, PartitionSpec(*spec))


def weight_shardings(pipe, mesh, tp_axis: str = "tp") -> dict:
    """Per-weight NamedSharding: shard out_chan over tp where divisible,
    replicate otherwise. XLA propagates activation shardings from these."""
    from jax.sharding import NamedSharding, PartitionSpec
    tp = mesh.shape[tp_axis] if tp_axis in mesh.axis_names else 1
    out = {}
    for name, w in pipe.weights.items():
        spec = [None] * len(w.dims)
        if tp > 1 and "out_chan" in w.dims.names:
            i = w.dims.index("out_chan")
            if w.dims["out_chan"] % tp == 0 and len(w.dims) > 1:
                spec[i] = tp_axis
        out[name] = NamedSharding(mesh, PartitionSpec(*spec))
    return out


def input_shardings(in_dims: dict, mesh, dp_axis: str = "dp",
                    sp_axis: Optional[str] = None) -> dict:
    """Inputs: shard img over dp (and optionally y over sp)."""
    from jax.sharding import NamedSharding, PartitionSpec
    out = {}
    for name, d in in_dims.items():
        spec = [None] * len(d)
        if dp_axis in mesh.axis_names and "img" in d.names and \
                d["img"] % mesh.shape[dp_axis] == 0:
            spec[d.index("img")] = dp_axis
        if sp_axis and sp_axis in mesh.axis_names and "y" in d.names and \
                d["y"] % mesh.shape[sp_axis] == 0:
            spec[d.index("y")] = sp_axis
        out[name] = NamedSharding(mesh, PartitionSpec(*spec))
    return out
