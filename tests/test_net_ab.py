"""net_ab mode: whole-net in-program A/B of two engine configs."""

import pytest

from boda_tpu.config import make


@pytest.mark.slow
def test_net_ab_batch_split_parity(capsys):
    import boda_tpu.modes_all  # noqa: F401
    m = make("mode", "net_ab", model="mini_resnet", img=4, ab_legs=2,
             a=make("conv_fwd", "pallas"),
             b=make("conv_fwd", "pallas",
                    batch_split=["relu1:s1b1_relu:2"]))
    m.main()
    out = capsys.readouterr().out
    assert "net_ab mini_resnet" in out
    assert "B/A speedup" in out
