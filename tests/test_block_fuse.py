"""Whole-bottleneck block fusion (ops/kernels/block.py + executor blocks).

Gate: xla engine vs pallas engine with fuse_block=1 within the standing
1e-5 cross-engine fidelity bar, including the per-layer fallback (when an
intermediate node is requested the block must un-fuse for that compile).
"""

import numpy as np

from boda_tpu.config import make
from boda_tpu.models.zoo import NetBuilder, build_model
from boda_tpu.utils.digest import comp_vars
from boda_tpu.utils.dims import NDA, Dims


def _tiny_bneck(img=2, c=128, k=8, sz=8):
    b = NetBuilder("tinybneck")
    t = b.input("data")
    u = b.conv("blk_branch2a", t, k, 1, in_chans=c)
    u = b.bn_scale("bn_branch2a", u, k)
    u = b.relu("blk_branch2a_relu", u)
    u = b.conv("blk_branch2b", u, k, 3, pad=1, in_chans=k)
    u = b.bn_scale("bn_branch2b", u, k)
    u = b.relu("blk_branch2b_relu", u)
    u = b.conv("blk_branch2c", u, c, 1, in_chans=k)
    u = b.bn_scale("bn_branch2c", u, c)
    b.eltwise("blk", ["data", u], relu=True)
    in_dims = {"data": Dims.of(img=img, chan=c, y=sz, x=sz)}
    return b.done(in_dims), in_dims


def _x(in_dims, seed=0):
    rng = np.random.RandomState(seed)
    return NDA(in_dims["data"],
               rng.randn(*in_dims["data"].shape).astype(np.float32))


def test_block_detected_and_fused():
    pipe, in_dims = _tiny_bneck()
    eng = make("conv_fwd", "pallas", fuse_block="1")
    eng.init(pipe)
    assert "blk_branch2a" in eng._blocks
    blk = eng._blocks["blk_branch2a"]
    assert blk["b"] == "blk_branch2b" and blk["c"] == "blk_branch2c"
    # mega-chain covers all 3 convs' follow-ops
    assert len(eng._chains["blk_branch2a"]) == 12
    assert "block-fused bottleneck" in eng.get_info_log()


def test_block_fused_vs_xla():
    pipe, in_dims = _tiny_bneck()
    x = _x(in_dims)
    ref = make("conv_fwd", "xla")
    ref.init(pipe)
    want = ref.run_fwd({"data": x}, ["blk"])["blk"].data
    eng = make("conv_fwd", "pallas", fuse_block="1")
    eng.init(pipe)
    got = eng.run_fwd({"data": x}, ["blk"])["blk"].data
    scale = max(1e-30, float(np.abs(want).max()))
    r = comp_vars(want, got, mrd_toler=1e-5, atol=1e-5 * scale)
    assert r.ok(), str(r)


def test_block_per_layer_fallback():
    """Requesting an intermediate un-fuses the block for that compile and
    every node still matches the oracle."""
    pipe, in_dims = _tiny_bneck()
    x = _x(in_dims, seed=3)
    nodes = ["blk_branch2a_relu", "blk_branch2b_relu", "blk"]
    ref = make("conv_fwd", "xla")
    ref.init(pipe)
    want = ref.run_fwd({"data": x}, nodes)
    eng = make("conv_fwd", "pallas", fuse_block="1")
    eng.init(pipe)
    got = eng.run_fwd({"data": x}, nodes)
    for n in nodes:
        a, b = want[n].data, got[n].data
        scale = max(1e-30, float(np.abs(a).max()))
        r = comp_vars(a, b, mrd_toler=1e-5, atol=1e-5 * scale)
        assert r.ok(), f"{n}: {r}"


def test_resnet50_blocks_detected():
    pipe, in_dims = build_model("resnet50", img=1)
    eng = make("conv_fwd", "pallas", fuse_block="1", compute_tn="bfloat16")
    eng.init(pipe)
    # identity (non-downsampling) blocks: (3-1)+(4-1)+(6-1)+(3-1) = 12
    assert len(eng._blocks) == 12


def test_block_fusion_disabled_under_tp():
    """tp>1 GSPMD cannot partition pallas_call: fuse_block must deactivate
    (same constraint the per-op use_xla forcing protects)."""
    from boda_tpu.utils.lexp import parse_lexp
    pipe, in_dims = _tiny_bneck()
    x = _x(in_dims)
    ref = make("conv_fwd", "xla")
    ref.init(pipe)
    want = ref.run_fwd({"data": x}, ["blk"])["blk"].data
    eng = make("conv_fwd", "pallas", fuse_block="1",
               mesh=parse_lexp("(dp=2,tp=4)"))
    eng.init(pipe)
    assert eng._blocks == {}
    got = eng.run_fwd({"data": x}, ["blk"])["blk"].data
    scale = max(1e-30, float(np.abs(want).max()))
    r = comp_vars(want, got, mrd_toler=1e-4, atol=1e-5 * scale)
    assert r.ok(), str(r)
