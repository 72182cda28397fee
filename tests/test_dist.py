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
