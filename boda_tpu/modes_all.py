"""Import every module that registers CLI modes (the mode census lives here)."""

# Registration happens at import time via @register("mode", ...) decorators.
# Keep this list sorted; gate optional-dependency modules with try/except.

_MODE_MODULES = [
    "boda_tpu.modes.apps",
    "boda_tpu.modes.basic",
    "boda_tpu.modes.calib",
    "boda_tpu.modes.cnet",
    "boda_tpu.modes.cnn_prof",
    "boda_tpu.modes.detect",
    "boda_tpu.modes.dist_modes",
    "boda_tpu.modes.display_modes",
    "boda_tpu.modes.ipc_modes",
    "boda_tpu.modes.lmdb_modes",
    "boda_tpu.modes.net_trace",
    "boda_tpu.modes.net_tune",
    "boda_tpu.modes.plot_modes",
    "boda_tpu.modes.proc_pipe",
    "boda_tpu.modes.prof",
    "boda_tpu.modes.test_cmds",
    "boda_tpu.modes.test_compute",
    "boda_tpu.modes.train_bench",
    "boda_tpu.modes.train_lmdb",
    "boda_tpu.modes.zmq_modes",
    "boda_tpu.modes.rtc",
    "boda_tpu.modes.serve_bench",
    "boda_tpu.modes.stream_modes",
    "boda_tpu.modes.surgery_modes",
]

import importlib

for _m in _MODE_MODULES:
    importlib.import_module(_m)
