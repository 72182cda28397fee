"""Two-controller (multi-process) distributed execution tests.

Parity: ref cs_test_master/cs_test_worker (rtc_ipc.cc:290,:313) — the
cross-process compute test, here as multi-controller jax.distributed over
two local CPU processes jointly running the dp-sharded training step
(SURVEY.md §5.8 DCN mapping).
"""

import boda_tpu.modes_all  # noqa: F401
from boda_tpu.cli import main


def test_dist_two_controllers(capsys):
    rc = main(["dist_test_master", "--num-procs=2", "--devices-per-proc=2",
               "--steps=3"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "2 controllers x 2 devices" in out
    assert "all ranks agree OK" in out


import pytest as _pytest


@_pytest.mark.slow
def test_dist_resnet50_class(capsys):
    """Flagship-class graph across two controllers (VERDICT r4 #6): the
    full resnet50 momentum+train-BN+remat=seg step dp-sharded over a
    2-process CPU cluster, loss-identical on every rank."""
    rc = main(["dist_test_master", "--num-procs=2", "--devices-per-proc=2",
               "--steps=2", "--model=resnet50", "--in-sz=32",
               "--num-cls=16"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "all ranks agree OK" in out


def test_mesh_error_typed():
    """Invalid mesh requests raise MeshError (a ValueError subclass) with
    exact messages (VERDICT r3 #7)."""
    import pytest

    from boda_tpu.parallel.mesh import MeshError, make_mesh
    with pytest.raises(MeshError, match=r"^mesh needs 32 devices, have 8$"):
        make_mesh({"dp": 8, "tp": 4})
    with pytest.raises(MeshError,
                       match=r"^mesh axis 'tp' size must be a positive int"):
        make_mesh({"dp": 2, "tp": 0})
    assert issubclass(MeshError, ValueError)  # old except-ValueError works


def test_dryrun_multichip_16():
    """The driver dryrun at n=16 (beyond this process's 8 virtual devices):
    exercises the subprocess self-provision route AND the dp=2 x tp=8 mesh,
    including the sharded-vs-single-device inference parity gate inside the
    dryrun body (VERDICT r3 #7)."""
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import __graft_entry__ as g
    g.dryrun_multichip(16)  # raises on any failure (incl. parity)
