"""Stem space-to-depth conv fold: fidelity + gating.

The NHWC engine rewrites large-kernel strided tiny-C stem convs
(resnet/googlenet 7x7s2 C=3, alexnet 11x11s4 C=3) into a stride-1 conv
over C*s*s folded channels (lowering_nhwc.py stem_s2d). Math is identical
(kernel zero-padded to a stride multiple); these tests pin that against
the NCHW XLA oracle engine, through the graph backward (weight-grad
inv map), and the gate edges (disable knob, negative right-pad fall-through).
Ref parity: performance rewrite only — the reference lowers stems through
the same conv_pipe path as any conv (conv_util.cc), no analog transform.
"""

import numpy as np
import pytest

import boda_tpu.graph  # noqa: F401
from boda_tpu.config import make
from boda_tpu.graph.autodiff import add_bck_ops, softmax_to_loss
from boda_tpu.models.zoo import NetBuilder
from boda_tpu.utils.digest import comp_vars
from boda_tpu.utils.lexp import parse_lexp
from boda_tpu.utils.dims import NDA, Dims


def stem_net(k, s, p, in_sz, img=2, oc=16, relu=True):
    b = NetBuilder(f"stem{k}s{s}")
    t = b.input("data")
    b.conv("conv1", t, oc, k, stride=s, pad=p, in_chans=3, relu=relu)
    in_dims = {"data": Dims.of(img=img, chan=3, y=in_sz, x=in_sz)}
    return b.done(in_dims), in_dims


def _run(pipe, in_dims, nodes, **pallas_kw):
    rng = np.random.RandomState(3)
    x = NDA(in_dims["data"],
            rng.randn(*in_dims["data"].shape).astype(np.float32))
    out = {}
    for engine in ("xla", "pallas"):
        eng = make("conv_fwd", engine, **(pallas_kw if engine == "pallas" else {}))
        eng.init(pipe)
        out[engine] = eng.run_fwd({"data": x}, nodes)
        out[engine + "_log"] = str(eng.get_info_log())
    return out


@pytest.mark.parametrize("k,s,p,in_sz", [
    (7, 2, 3, 32),    # resnet/googlenet stem shape (reduced spatial)
    (11, 4, 0, 35),   # alexnet stem shape
    (3, 2, 1, 16),    # small-k strided stem (m=2, kernel pad 3->4)
    (4, 2, 1, 16),    # k%s==0: no kernel padding needed
])
def test_stem_s2d_matches_oracle(k, s, p, in_sz):
    pipe, in_dims = stem_net(k, s, p, in_sz)
    r = _run(pipe, in_dims, ["conv1"], tune=parse_lexp("(stem_s2d=1)"))
    assert "nhwc-stem_s2d" in r["pallas_log"], r["pallas_log"]
    a, b = r["xla"]["conv1"].data, r["pallas"]["conv1"].data
    scale = max(1e-30, float(np.abs(a).max()))
    cmp = comp_vars(a, b, mrd_toler=1e-5, atol=1e-5 * scale)
    assert cmp.ok(), f"{cmp}"


def test_stem_s2d_default_off():
    # whole-net A/B showed the fold is context-dependent (lowering_nhwc.py);
    # it must only engage when a tune/wisdom entry selects it
    pipe, in_dims = stem_net(7, 2, 3, 32)
    r = _run(pipe, in_dims, ["conv1"])
    assert "nhwc-stem_s2d" not in r["pallas_log"]
    a, b = r["xla"]["conv1"].data, r["pallas"]["conv1"].data
    assert comp_vars(a, b, mrd_toler=1e-5, atol=1e-4).ok()


def test_stem_s2d_negative_right_pad_falls_through():
    # k=4 s=2 p=0 h=7: oy=2, folded cover = 2*(2+2-1)=6 < h+p -> pad_r<0;
    # the gate must fall through to a plain path and still be correct.
    pipe, in_dims = stem_net(4, 2, 0, 7)
    r = _run(pipe, in_dims, ["conv1"], tune=parse_lexp("(stem_s2d=1)"))
    assert "nhwc-stem_s2d" not in r["pallas_log"]
    a, b = r["xla"]["conv1"].data, r["pallas"]["conv1"].data
    assert comp_vars(a, b, mrd_toler=1e-5, atol=1e-4).ok()


def test_stem_s2d_weight_grads_match_jax_grad():
    """Backward through the folded stem: the vjp runs in folded layout and
    the inv map must return OIHW grads identical to jax.grad ground truth."""
    import jax
    import jax.numpy as jnp
    from boda_tpu.parallel.train import build_net_fn

    def net():
        b = NetBuilder("stemtiny")
        t = b.input("data")
        t = b.conv("conv1", t, 8, 7, stride=2, pad=3, in_chans=3, relu=True)
        t = b.fc("fc1", t, 5, in_feats=8 * 8 * 8)
        b.softmax("prob", t)
        in_dims = {"data": Dims.of(img=2, chan=3, y=16, x=16)}
        return b.done(in_dims), in_dims

    pipe, in_dims = net()
    add_bck_ops(pipe)
    eng = make("conv_fwd", "pallas", tune=parse_lexp("(stem_s2d=1)"))
    eng.init(pipe)
    assert "nhwc-stem_s2d" in str(eng.get_info_log())
    rng = np.random.RandomState(0)
    x = rng.randn(*in_dims["data"].shape).astype(np.float32)
    labels = np.array([1, 3], dtype=np.float32)
    want = ["conv1__filts__grad", "conv1__biases__grad"]
    name_map = {w: (w if pipe.nodes.get(w) is not None and
                    pipe.nodes[w].dims is not None else f"{w}__p0")
                for w in want}
    outs = eng.run_fwd({"data": NDA(in_dims["data"], x),
                        "label": NDA(Dims.of(img=2), labels)},
                       list(name_map.values()))

    fwd_pipe, _ = net()
    softmax_to_loss(fwd_pipe)
    net_fn = build_net_fn(fwd_pipe, ["prob_loss"])
    weights = {kk: w.data for kk, w in fwd_pipe.weights.items()}

    def loss(ws):
        return jnp.sum(net_fn(ws, {"data": x, "label": labels})["prob_loss"])

    g = jax.grad(loss)(weights)
    for w in want:
        got = np.asarray(outs[name_map[w]].data)
        ref = np.asarray(g[w.replace("__grad", "")])
        assert got.shape == ref.shape, (w, got.shape, ref.shape)
        scale = max(1e-30, float(np.abs(ref).max()))
        cmp = comp_vars(ref, got, mrd_toler=1e-4, atol=1e-4 * scale)
        assert cmp.ok(), f"{w}: {cmp}"


@pytest.mark.parametrize("k,s,p,in_sz", [
    (7, 2, 3, 32),    # resnet/googlenet stem shape (reduced spatial)
    (11, 4, 0, 35),   # alexnet stem shape
    (3, 2, 1, 16),    # small-k strided stem
])
def test_stem_im2col_matches_oracle(k, s, p, in_sz):
    """stem_im2col=1: the folded stem as shifted-slice im2col -> one MXU
    dot (VERDICT r3 #3's untried conv1 formulation) — must equal the XLA
    oracle exactly like the conv form does."""
    pipe, in_dims = stem_net(k, s, p, in_sz)
    r = _run(pipe, in_dims, ["conv1"],
             tune=parse_lexp("(stem_s2d=1,stem_im2col=1)"))
    assert "im2col" in r["pallas_log"], r["pallas_log"]
    a, b = r["xla"]["conv1"].data, r["pallas"]["conv1"].data
    scale = max(1e-30, float(np.abs(a).max()))
    cmp = comp_vars(a, b, mrd_toler=1e-5, atol=1e-5 * scale)
    assert cmp.ok(), f"{cmp}"


def test_stem_im2col_with_pad_c():
    """im2col composes with the lane-aligned entry channel pad."""
    pipe, in_dims = stem_net(7, 2, 3, 32)
    r = _run(pipe, in_dims, ["conv1"],
             tune=parse_lexp("(stem_s2d=1,stem_im2col=1,pad_c=128)"))
    assert "im2col" in r["pallas_log"]
    a, b = r["xla"]["conv1"].data, r["pallas"]["conv1"].data
    scale = max(1e-30, float(np.abs(a).max()))
    cmp = comp_vars(a, b, mrd_toler=1e-5, atol=1e-5 * scale)
    assert cmp.ok(), f"{cmp}"
