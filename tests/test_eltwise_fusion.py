"""Residual (Eltwise-sum + ReLU) fusion into conv store epilogues.

The Pallas NHWC engine folds conv[->BN][->Scale]->Eltwise(sum)[->ReLU]
chains into one kernel launch: the residual add rides the kernel's store
epilogue when the selected variant supports it (k1conv matmul, halo conv),
else it runs as XLA ops in the same compile unit. Correctness gate: xla
engine vs pallas engine within 1e-5 per node (the standing cross-engine
fidelity bar). No reference analog (the reference never fused across
Eltwise, rtc_fwd.cc:490 fuses ReLU only).
"""

import numpy as np
import pytest

from boda_tpu.config import make
from boda_tpu.models.zoo import NetBuilder, build_model
from boda_tpu.utils.digest import comp_vars
from boda_tpu.utils.dims import NDA, Dims


def _run_engines(pipe, in_dims, nodes, seed=0, **pallas_kw):
    rng = np.random.RandomState(seed)
    x = NDA(in_dims["data"],
            rng.randn(*in_dims["data"].shape).astype(np.float32))
    res = {}
    for engine in ("xla", "pallas"):
        eng = make("conv_fwd", engine,
                   **({"kernel_policy": "gen", **pallas_kw}
                      if engine == "pallas" else {}))
        eng.init(pipe)
        res[engine] = eng.run_fwd({"data": x}, nodes)
        res[engine + "_eng"] = eng
    return res


def _check(res, nodes):
    for n in nodes:
        a, b = res["xla"][n].data, res["pallas"][n].data
        scale = max(1e-30, float(np.abs(a).max()))
        r = comp_vars(a, b, mrd_toler=1e-5, atol=1e-5 * scale)
        assert r.ok(), f"node {n}: {r}"


def test_mini_resnet_eltwise_chains_detected():
    pipe, in_dims = build_model("mini_resnet")
    eng = make("conv_fwd", "pallas")
    eng.init(pipe)
    # every residual block's trailing conv claims its eltwise(+relu)
    elt_chains = [c for c in eng._chains.values()
                  if any(pipe.ops[n].type == "Eltwise" for n in c)]
    assert len(elt_chains) == 6  # 3 stages x 2 reps
    for c in elt_chains:
        assert pipe.ops[c[-1]].type == "ReLU"


def test_mini_resnet_fused_vs_xla():
    pipe, in_dims = build_model("mini_resnet")
    res = _run_engines(pipe, in_dims, ["prob"])
    _check(res, ["prob"])


def _residual_net(chan, k, hw):
    """conv(a) -> relu -> [conv1x1(b), conv kxk(c)] -> eltwise -> relu."""
    b = NetBuilder("resnet_tail")
    t = b.input("data")
    t = b.conv("c0", t, chan, 3, pad=1, in_chans=chan, relu=True)
    skip = b.conv("c_skip", t, chan, 1, in_chans=chan)
    main = b.conv("c_main", t, chan, k, pad=k // 2, in_chans=chan)
    t = b.eltwise("sum", [skip, main], relu=True)
    b.softmax("prob", b.fc("fc", b.pool("gap", t, avg=True, global_pool=True),
                           8, in_feats=chan))
    in_dims = {"data": Dims.of(img=1, chan=chan, y=hw, x=hw)}
    return b.done(in_dims), in_dims


def test_k1conv_residual_in_kernel():
    # main branch is a 1x1 conv -> k1conv matmul takes the in-kernel residual
    pipe, in_dims = _residual_net(chan=32, k=1, hw=16)
    res = _run_engines(pipe, in_dims, ["prob", "sum_relu"])
    _check(res, ["prob", "sum_relu"])
    log = str(res["pallas_eng"].get_info_log())
    assert "c_main: nhwc-k1conv" in log


def test_halo_conv_residual_in_kernel():
    # main branch 3x3 c=128 -> halo conv takes the in-kernel residual
    # (use_halo=1 forces the halo variant on in interpret mode)
    from boda_tpu.utils.lexp import parse_lexp
    pipe, in_dims = _residual_net(chan=128, k=3, hw=8)
    res = _run_engines(pipe, in_dims, ["prob", "sum_relu"],
                       tune=parse_lexp("(use_halo=1)"))
    _check(res, ["prob", "sum_relu"])
    log = str(res["pallas_eng"].get_info_log())
    assert "c_main: nhwc-halo_conv" in log


def test_intermediate_output_disables_fusion():
    # requesting the pre-relu eltwise value must still work (per-compile
    # fusion decision skips chains whose intermediates are outputs)
    pipe, in_dims = _residual_net(chan=32, k=1, hw=16)
    res = _run_engines(pipe, in_dims, ["sum", "c_main", "prob"])
    _check(res, ["sum", "c_main", "prob"])
