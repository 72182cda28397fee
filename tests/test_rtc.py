"""rtc layer tests: backends, var management, codegen, sgemm/eltwise kernels.

On CPU test hosts the tpu backend runs Pallas kernels in interpreter mode;
the interp backend runs plain-jnp reference implementations. Cross-checking
the two reproduces the reference's multi-backend test_compute methodology.
"""

import numpy as np
import pytest

import boda_tpu.modes_all  # noqa: F401 (registers backends+modes)
from boda_tpu.config import make
from boda_tpu.ops.op_base import Op, load_op_sigs, save_op_sigs
from boda_tpu.ops.registry import Codegen
from boda_tpu.ops.tune import OpTune
from boda_tpu.rtc.compute import Call, RtcError
from boda_tpu.utils.digest import comp_vars
from boda_tpu.utils.dims import NDA, Dims


@pytest.fixture(params=["tpu", "interp"])
def be(request):
    return make("be", request.param)


def test_var_management(be):
    d = Dims.of(y=4, x=8)
    be.create_var_with_dims("v", d)
    assert be.var_exists("v")
    assert be.get_var_dims("v") == d
    out = be.copy_var_to_nda("v")
    assert out.data.shape == (4, 8) and np.all(out.data == 0)

    src = NDA(d, np.arange(32, dtype=np.float32).reshape(4, 8))
    be.copy_nda_to_var("v", src)
    assert np.array_equal(be.copy_var_to_nda("v").data, src.data)

    be.set_var_to_zero("v")
    assert np.all(be.copy_var_to_nda("v").data == 0)

    with pytest.raises(RtcError):
        be.create_var_with_dims("v", d)
    be.release_var("v")
    assert not be.var_exists("v")
    with pytest.raises(RtcError):
        be.copy_var_to_nda("v")


def test_gen_data_deterministic_across_backends():
    d = Dims.of(n=1000)
    op = Op("gen_data", {"mod": "13"}, {"out": d})
    outs = []
    for name in ("tpu", "interp"):
        b = make("be", name)
        cg = Codegen(b)
        fi = cg.gen_func(op)
        b.create_var_with_dims("x", d)
        cg.compile()
        cg.run_func(fi, {"out": "x"})
        outs.append(b.copy_var_to_nda("x").data)
    assert np.array_equal(outs[0], outs[1])
    # the pattern is nontrivial
    assert len(np.unique(outs[0])) == 13


def test_eltwise_kernel(be):
    d = Dims.of(n=777)  # deliberately not lane-aligned
    cg = Codegen(be)
    fi = cg.gen_func(Op("eltwise", {"func": "mul"}, {"a": d, "b": d, "out": d}))
    rng = np.random.RandomState(0)
    a = rng.randn(777).astype(np.float32)
    b_ = rng.randn(777).astype(np.float32)
    be.create_var_from_nda("a", NDA(d, a))
    be.create_var_from_nda("b", NDA(d, b_))
    be.create_var_with_dims("c", d)
    cg.compile()
    cg.run_func(fi, {"a": "a", "b": "b", "out": "c"})
    c = be.copy_var_to_nda("c").data
    assert comp_vars(a * b_, c, 1e-6).ok()


@pytest.mark.parametrize("M,K,N", [(128, 128, 128), (130, 70, 258), (64, 512, 128)])
def test_sgemm_vs_ref(be, M, K, N):
    ad, bd, cd = Dims.of(M=M, K=K), Dims.of(K=K, N=N), Dims.of(M=M, N=N)
    cg = Codegen(be)
    tune = OpTune(bm=64, bn=128, bk=128)
    fi = cg.gen_func(Op("sgemm", {}, {"a": ad, "b": bd, "c": cd}), tune)
    rng = np.random.RandomState(1)
    a = rng.randn(M, K).astype(np.float32)
    b_ = rng.randn(K, N).astype(np.float32)
    be.create_var_from_nda("a", NDA(ad, a))
    be.create_var_from_nda("b", NDA(bd, b_))
    be.create_var_with_dims("c", cd)
    cg.compile()
    cg.run_func(fi, {"a": "a", "b": "b", "c": "c"})
    c = be.copy_var_to_nda("c").data
    ref = (a.astype(np.float64) @ b_.astype(np.float64)).astype(np.float32)
    # atol guards near-zero entries against f32 accumulation-order noise
    r = comp_vars(ref, c, mrd_toler=1e-5, atol=1e-4)
    assert r.ok(), f"{fi.info}: {r}"


def test_codegen_cache_and_naming():
    be = make("be", "interp")
    cg = Codegen(be)
    d = Dims.of(M=8, K=8)
    op = Op("sgemm", {}, {"a": d, "b": Dims.of(K=8, N=8), "c": Dims.of(M=8, N=8)})
    f1 = cg.gen_func(op)
    f2 = cg.gen_func(op.copy())
    assert f1 is f2  # cache hit on equal signature
    f3 = cg.gen_func(op, OpTune(bm=8))
    assert f3 is not f1
    assert f1.name != f3.name


def test_unknown_op_type():
    cg = Codegen(make("be", "interp"))
    with pytest.raises(RtcError, match="no kernel generator"):
        cg.gen_func(Op("nosuch", {}, {}))


def test_get_dur_and_call_errors():
    be = make("be", "interp")
    cg = Codegen(be)
    d = Dims.of(n=64)
    fi = cg.gen_func(Op("gen_data", {}, {"out": d}))
    be.create_var_with_dims("x", d)
    with pytest.raises(RtcError, match="not compiled"):
        be.run(Call(fi.name, {"out": "x"}))
    cg.compile()
    b = be.run(Call(fi.name, {"out": "x"}))
    e = be.run(Call(fi.name, {"out": "x"}))
    assert be.get_dur(b, e) > 0
    with pytest.raises(RtcError, match="missing arg|missing out arg"):
        be.run(Call(fi.name, {}))


def test_op_sig_roundtrip(tmp_path):
    op = Op("sgemm", {"flags": "x,y"},
            {"a": Dims.of(M=4, K=4), "b": Dims.of(K=4, N=4), "c": Dims.of(M=4, N=4)})
    s = op.key()
    op2 = Op.parse(s)
    assert op2 == op and op2.sval("flags") == "x,y"
    fn = str(tmp_path / "sigs.txt")
    save_op_sigs(fn, [op, op2])
    assert load_op_sigs(fn) == [op, op]
