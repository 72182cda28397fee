"""Mesh-sharded inference + bf16 compute tests (8 virtual CPU devices)."""

import numpy as np
import pytest

import boda_tpu.modes_all  # noqa: F401
from boda_tpu.config import make
from boda_tpu.models.zoo import build_mini_resnet
from boda_tpu.utils.digest import comp_vars
from boda_tpu.utils.dims import NDA
from boda_tpu.utils.lexp import parse_lexp


def _setup(img=8):
    pipe, in_dims = build_mini_resnet(img=img, num_cls=16, in_sz=16)
    rng = np.random.RandomState(0)
    x = NDA(in_dims["data"], rng.randn(*in_dims["data"].shape).astype(np.float32))
    return pipe, x


@pytest.mark.parametrize("engine,mesh", [
    ("xla", "(dp=8)"), ("xla", "(dp=2,tp=4)"), ("pallas", "(dp=8)"),
    ("pallas", "(dp=2,tp=4)"),  # lib kernel policy -> GSPMD path
])
def test_sharded_matches_local(engine, mesh):
    pipe, x = _setup()
    base = make("conv_fwd", "xla")
    base.init(pipe)
    ref = base.run_fwd({"data": x}, ["prob"])["prob"].data

    eng = make("conv_fwd", engine, mesh=parse_lexp(mesh))
    eng.init(pipe)
    got = eng.run_fwd({"data": x}, ["prob"])["prob"].data
    scale = max(1e-30, float(np.abs(ref).max()))
    r = comp_vars(ref, got, mrd_toler=1e-4, atol=1e-5 * scale)
    assert r.ok(), f"{engine} {mesh}: {r}"


def test_pallas_tp_rejected_with_gen_kernels():
    from boda_tpu.graph.pipe import PipeError
    pipe, x = _setup()
    eng = make("conv_fwd", "pallas", kernel_policy="gen",
               mesh=parse_lexp("(dp=2,tp=4)"))
    eng.init(pipe)
    with pytest.raises(PipeError, match="dp only"):
        eng.run_fwd({"data": x}, ["prob"])


def test_pallas_tp_forces_lib_over_wisdom(tmp_path):
    """tp>1 + per-op gen tunes (wisdom): the GSPMD path cannot partition
    pallas_call, so the engine must force the library lowering per op
    instead of silently shipping an unpartitionable program."""
    from boda_tpu.ops.sig_of import collect_net_sigs
    from boda_tpu.prof.wisdom import OpRun, OpWisdom, write_wisdom
    pipe, x = _setup()
    wis = []
    for s in collect_net_sigs(pipe):
        w = OpWisdom(s)
        w.runs.append(OpRun("(bm=64,bn=128,bk=128)", "interp:cpu", 1e-4))
        wis.append(w)
    fn = tmp_path / "w.wis"
    write_wisdom(str(fn), wis)
    eng = make("conv_fwd", "pallas", wisdom_fn=str(fn),
               mesh=parse_lexp("(dp=2,tp=4)"))
    eng.init(pipe)
    got = eng.run_fwd({"data": x}, ["prob"])["prob"].data
    assert "tp>1 forces use_xla" in eng.get_info_log()
    base = make("conv_fwd", "xla")
    base.init(pipe)
    ref = base.run_fwd({"data": x}, ["prob"])["prob"].data
    scale = max(1e-30, float(np.abs(ref).max()))
    r = comp_vars(ref, got, mrd_toler=1e-4, atol=1e-5 * scale)
    assert r.ok(), r


def test_bf16_compute():
    pipe, x = _setup(img=2)
    f32 = make("conv_fwd", "pallas")
    f32.init(pipe)
    ref = f32.run_fwd({"data": x}, ["prob"])["prob"].data
    bf = make("conv_fwd", "pallas", compute_tn="bfloat16", precision="default")
    bf.init(pipe)
    got = bf.run_fwd({"data": x}, ["prob"])["prob"].data
    assert got.dtype == np.float32  # outputs restored to logical dtype
    assert np.abs(ref - got).max() < 0.05  # bf16-level agreement
    assert not np.array_equal(ref, got)   # actually computed in bf16


def test_wisdom_driven_tunes(tmp_path):
    """PallasFwd picks per-op tunes from a wisdom file by op signature."""
    from boda_tpu.ops.sig_of import collect_net_sigs
    from boda_tpu.prof.wisdom import OpRun, OpWisdom, write_wisdom
    pipe, x = _setup(img=2)
    sigs = collect_net_sigs(pipe)
    assert len(sigs) > 3
    wis = []
    for s in sigs:
        w = OpWisdom(s)
        w.runs.append(OpRun("(bm=64,bn=128,bk=128)", "interp:cpu", 1e-4))
        wis.append(w)
    fn = tmp_path / "w.wis"
    write_wisdom(str(fn), wis)
    eng = make("conv_fwd", "pallas", wisdom_fn=str(fn))
    eng.init(pipe)
    out = eng.run_fwd({"data": x}, ["prob"])["prob"].data
    log = eng.get_info_log()
    assert "wisdom tune (bm=64,bn=128,bk=128)" in log
    base = make("conv_fwd", "xla")
    base.init(pipe)
    ref = base.run_fwd({"data": x}, ["prob"])["prob"].data
    assert np.abs(ref - out).max() < 1e-4


def test_s2d_conv_matches_xla():
    """Space-to-depth strided conv (tune-gated) == stock XLA strided conv."""
    from boda_tpu.utils.lexp import parse_lexp
    pipe, x = _setup(img=2)
    ref = make("conv_fwd", "xla")
    ref.init(pipe)
    want = ref.run_fwd({"data": x}, ["prob"])["prob"].data
    eng = make("conv_fwd", "pallas", kernel_policy="gen",
              tune=parse_lexp("(use_s2d=1)"))
    eng.init(pipe)
    got = eng.run_fwd({"data": x}, ["prob"])["prob"].data
    assert "s2d_conv" in eng.get_info_log()
    r = comp_vars(want, got, mrd_toler=1e-4,
                  atol=1e-5 * max(1e-30, float(np.abs(want).max())))
    assert r.ok(), r


def test_graft_entry_points():
    """Driver contract: entry() jits; dryrun_multichip runs a sharded step."""
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    import jax
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert float(out["prob"].sum()) == pytest.approx(1.0, abs=1e-3)
    ge.dryrun_multichip(8)


def test_bn_chain_folding_matches_unfused():
    """conv->BN->Scale->ReLU folding must be numerically invisible."""
    pipe, x = _setup(img=2)
    fused = make("conv_fwd", "pallas")  # fuse_relu on by default
    fused.init(pipe)
    assert fused._chains, "mini_resnet should have foldable BN chains"
    a = fused.run_fwd({"data": x}, ["prob"])["prob"].data
    unfused = make("conv_fwd", "pallas", fuse_relu=False)
    unfused.init(pipe)
    b = unfused.run_fwd({"data": x}, ["prob"])["prob"].data
    r = comp_vars(a, b, mrd_toler=1e-4, atol=1e-5)
    assert r.ok(), r
    # requesting an intermediate node disables folding only for that compile
    mid = list(fused._chains)[0]
    mid_top = pipe.ops[mid].tops[0]
    c = fused.run_fwd({"data": x}, ["prob", mid_top])
    assert mid_top in c
