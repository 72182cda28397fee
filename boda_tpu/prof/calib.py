"""Static int8 calibration sidecar: per-node activation amax.

Offline calibration (net_calib mode) observes per-node |act| maxima over N
batches and persists them; at engine init the int8 lowerings consume the
static scales instead of computing a runtime per-tensor amax reduce each
forward (the "kill the runtime amax passes" step of the quantization story).

Parity target: the reference's quantization experiments persist per-node
max_val clamps chosen offline (ref doc/quant_notes.txt, test/rtc/quantize.cucl
driven via --quantize=(li_0=(max_val=...)) command lines); this is the same
contract — observed activation ranges as durable sidecar state — for the
real-int8 MXU path.
"""

from __future__ import annotations

import json
import os


def write_calib(fn: str, net: str, amax: dict[str, float], *,
                batches: int, compute_tn: str) -> None:
    rec = {"net": net, "batches": batches, "compute_tn": compute_tn,
           "amax": {k: float(v) for k, v in sorted(amax.items())}}
    tmp = fn + ".tmp"
    with open(tmp, "w") as f:
        json.dump(rec, f, indent=1, sort_keys=True)
        f.write("\n")
    os.replace(tmp, fn)  # atomic (same contract as checkpoint saves)


def read_calib(fn: str) -> dict[str, float]:
    """node name -> activation amax (absolute max over calibration batches)."""
    with open(fn) as f:
        rec = json.load(f)
    return {k: float(v) for k, v in rec["amax"].items()}
