"""input_s2d (host-side pre-folded stem input) + prefold (upload-time
BN/Scale fold) fidelity and gating.

input_s2d: the loader folds the NHWC batch to the stem_s2d layout on the
host (lowering_nhwc.host_stem_s2d) and the engine ingests it directly —
zero device-side relayout for the starved-C stem conv. prefold: BN/Scale
constants fold into conv weights ONCE at upload instead of per-forward.
Both are pure performance rewrites; these tests pin exact equivalence with
the unrewritten paths and the gate edges (multi-consumer input, fold-less
nets, example_weights key surface).
"""

import numpy as np
import pytest

import boda_tpu.graph  # noqa: F401
from boda_tpu.config import make
from boda_tpu.models.zoo import NetBuilder, build_model
from boda_tpu.utils.digest import comp_vars
from boda_tpu.utils.dims import NDA, Dims


def stem_net(img=2, in_sz=32):
    """Tiny net with a QUALIFYING stem (7x7 s2 C=3, the resnet shape) plus a
    BN/Scale chain so prefold also engages."""
    b = NetBuilder("s2dstem")
    t = b.input("data")
    t = b.conv("conv1", t, 16, 7, stride=2, pad=3, in_chans=3)
    t = b.bn_scale("bn1", t, 16)
    t = b.relu("relu1", t)
    t = b.conv("conv2", t, 16, 3, stride=1, pad=1, in_chans=16, relu=True)
    t = b.fc("fc", t, 10, in_feats=16 * (in_sz // 2) ** 2)
    b.softmax("prob", t)
    in_dims = {"data": Dims.of(img=img, chan=3, y=in_sz, x=in_sz)}
    return b.done(in_dims), in_dims


def _fold_nda(eng, in_dims, x):
    xh = np.ascontiguousarray(x.transpose(0, 2, 3, 1))
    xf = eng.host_input_s2d("data", xh)
    nd = Dims.of(img=xf.shape[0], y=xf.shape[1], x=xf.shape[2],
                 chan=xf.shape[3], tn=in_dims["data"].tn)
    return NDA(nd, xf)


def test_input_s2d_matches_plain_engine():
    pipe, in_dims = stem_net()
    rng = np.random.RandomState(7)
    x = rng.randn(*in_dims["data"].shape).astype(np.float32)

    p0, _ = stem_net()
    e0 = make("conv_fwd", "pallas")
    e0.init(p0)
    ref = e0.run_fwd({"data": NDA(in_dims["data"], x)}, ["prob"])["prob"].data

    p1, _ = stem_net()
    e1 = make("conv_fwd", "pallas", input_s2d=True)
    e1.init(p1)
    assert "input_s2d on 'data'" in str(e1.get_info_log())
    got = e1.run_fwd({"data": _fold_nda(e1, in_dims, x)}, ["prob"])["prob"].data
    assert comp_vars(ref, got, mrd_toler=1e-5, atol=1e-6).ok()

    # the same engine must still accept logical NCHW input (in-jit fold)
    got2 = e1.run_fwd({"data": NDA(in_dims["data"], x)}, ["prob"])["prob"].data
    assert comp_vars(ref, got2, mrd_toler=1e-5, atol=1e-6).ok()


def test_input_s2d_forces_stem_rule_under_lib_policy():
    pipe, in_dims = stem_net()
    eng = make("conv_fwd", "pallas", input_s2d=True, kernel_policy="lib")
    eng.init(pipe)
    log = str(eng.get_info_log())
    assert "nhwc-stem_s2d" in log, log


def test_input_s2d_skips_multi_consumer_input():
    b = NetBuilder("twoheads")
    t = b.input("data")
    b.conv("conv1", t, 8, 7, stride=2, pad=3, in_chans=3, relu=True)
    b.conv("conv2", t, 8, 7, stride=2, pad=3, in_chans=3, relu=True)
    in_dims = {"data": Dims.of(img=1, chan=3, y=16, x=16)}
    pipe = b.done(in_dims)
    eng = make("conv_fwd", "pallas", input_s2d=True)
    eng.init(pipe)
    assert "input_s2d" not in str(eng.get_info_log())
    with pytest.raises(Exception, match="no input_s2d fold"):
        eng.host_input_s2d("data", np.zeros((1, 16, 16, 3), np.float32))


def test_input_pad_c_matches_plain_engine():
    """input_pad_c: host-padded lane-aligned entry (zero channels, padded
    stem weights) is exactly equivalent on all three arrival paths."""
    pipe, in_dims = stem_net()
    rng = np.random.RandomState(7)
    x = rng.randn(*in_dims["data"].shape).astype(np.float32)
    p0, _ = stem_net()
    e0 = make("conv_fwd", "pallas")
    e0.init(p0)
    ref = e0.run_fwd({"data": NDA(in_dims["data"], x)}, ["prob"])["prob"].data

    p1, _ = stem_net()
    e1 = make("conv_fwd", "pallas", input_s2d=True, input_pad_c=32)
    e1.init(p1)
    fx = _fold_nda(e1, in_dims, x)
    assert fx.data.shape[-1] == 32  # host emits the padded layout
    assert np.all(fx.data[..., 12:] == 0)
    got = e1.run_fwd({"data": fx}, ["prob"])["prob"].data
    assert comp_vars(ref, got, mrd_toler=1e-5, atol=1e-6).ok()
    # logical NCHW arrival pads in-jit
    got2 = e1.run_fwd({"data": NDA(in_dims["data"], x)}, ["prob"])["prob"].data
    assert comp_vars(ref, got2, mrd_toler=1e-5, atol=1e-6).ok()


def test_input_pad_c_validation():
    pipe, _ = stem_net()
    with pytest.raises(Exception, match="requires input_s2d"):
        e = make("conv_fwd", "pallas", input_pad_c=32)
        e.init(pipe)
    p2, _ = stem_net()
    with pytest.raises(Exception, match="input_pad_c=4 < folded channels"):
        e = make("conv_fwd", "pallas", input_s2d=True, input_pad_c=4)
        e.init(p2)


def test_input_s2d_skips_nonqualifying_stem():
    b = NetBuilder("s1stem")  # stride-1 stem: no fold applies
    t = b.input("data")
    b.conv("conv1", t, 8, 3, stride=1, pad=1, in_chans=3, relu=True)
    in_dims = {"data": Dims.of(img=1, chan=3, y=16, x=16)}
    pipe = b.done(in_dims)
    eng = make("conv_fwd", "pallas", input_s2d=True)
    eng.init(pipe)
    assert "input_s2d" not in str(eng.get_info_log())


def test_prefold_matches_injit_fold():
    pipe, in_dims = build_model("mini_resnet", img=2)
    rng = np.random.RandomState(11)
    x = NDA(in_dims["data"],
            rng.randn(*in_dims["data"].shape).astype(np.float32))
    outs = {}
    for pf in (0, 1):
        p, _ = build_model("mini_resnet", img=2)
        eng = make("conv_fwd", "pallas", prefold=pf)
        eng.init(p)
        if pf:
            assert eng._prefold_plan, "mini_resnet has BN chains to prefold"
        outs[pf] = eng.run_fwd({"data": x}, ["prob"])["prob"].data
    assert comp_vars(outs[0], outs[1], mrd_toler=1e-6, atol=1e-7).ok()


def test_prefold_example_weights_carries_folded_keys():
    pipe, _ = build_model("mini_resnet", img=2)
    eng = make("conv_fwd", "pallas")
    eng.init(pipe)
    ws = eng.example_weights()
    fk = [k for k in ws if k.endswith("__folded")]
    assert fk, "prefold default-on must surface folded keys"
    raw = eng.build_raw_fn(["prob"])
    import jax.numpy as jnp
    d = pipe.must_dims("data")
    out = raw({k: jnp.asarray(v) for k, v in ws.items()},
              {"data": jnp.zeros(d.shape, jnp.float32)})
    assert "prob" in out


def test_prefold_off_for_bck_graphs():
    from boda_tpu.graph.autodiff import add_bck_ops
    pipe, _ = build_model("mini_resnet", img=2)
    add_bck_ops(pipe)
    eng = make("conv_fwd", "pallas")
    eng.init(pipe)
    assert not eng._prefold_plan
