"""Graph-level autodiff tests: add_bck_ops vs jax.grad ground truth."""

import numpy as np
import pytest

import boda_tpu.graph  # noqa: F401
from boda_tpu.config import make
from boda_tpu.graph.autodiff import add_bck_ops, softmax_to_loss
from boda_tpu.models.zoo import NetBuilder, build_mini_resnet
from boda_tpu.parallel.train import build_net_fn
from boda_tpu.utils.digest import comp_vars
from boda_tpu.utils.dims import NDA, Dims


def tiny_net(img=2):
    b = NetBuilder("tiny")
    t = b.input("data")
    t = b.conv("conv1", t, 8, 3, pad=1, in_chans=3, relu=True)
    t = b.pool("pool1", t, kern=2, stride=2)
    t = b.lrn("norm1", t)
    t = b.fc("fc1", t, 6, in_feats=8 * 4 * 4)
    b.softmax("prob", t)
    in_dims = {"data": Dims.of(img=img, chan=3, y=8, x=8)}
    return b.done(in_dims), in_dims


def test_softmax_to_loss():
    pipe, _ = tiny_net()
    loss = softmax_to_loss(pipe)
    assert loss == "prob_loss"
    assert pipe.ops["prob"].type == "SoftmaxWithLoss"
    assert pipe.must_dims("prob_loss").shape == (2,)
    assert pipe.must_dims("label").shape == (2,)


def test_add_bck_ops_structure():
    pipe, _ = tiny_net()
    add_bck_ops(pipe)
    # gradient nodes exist for data, conv weights, fc weights
    for n in ("data__grad", "conv1__filts__grad", "conv1__biases__grad",
              "fc1__filts__grad"):
        assert any(node.startswith(n) for node in pipe.nodes), n
    assert pipe.bck_added
    # shapes match their forward tensors
    g = [n for n in pipe.nodes if n == "data__grad" or n == "data__grad__p0"][0]
    assert pipe.must_dims(g).shape == pipe.must_dims("data").shape


@pytest.mark.parametrize("engine", ["xla", "pallas"])
def test_bck_grads_match_jax_grad(engine):
    """Graph-level backward == jax.grad of the whole-net loss."""
    import jax
    import jax.numpy as jnp
    pipe, in_dims = tiny_net()
    add_bck_ops(pipe)
    eng = make("conv_fwd", engine)
    eng.init(pipe)
    rng = np.random.RandomState(0)
    x = rng.randn(*in_dims["data"].shape).astype(np.float32)
    labels = np.array([1, 3], dtype=np.float32)
    want = ["data__grad", "conv1__filts__grad", "conv1__biases__grad",
            "fc1__filts__grad", "fc1__biases__grad", "prob_loss"]
    have = [n for n in want if n in pipe.nodes and pipe.nodes[n].dims is not None]
    # partial names if single-contribution aliasing kept __p0
    name_map = {}
    for w in want:
        if w in pipe.nodes and pipe.nodes[w].dims is not None:
            name_map[w] = w
        elif f"{w}__p0" in pipe.nodes:
            name_map[w] = f"{w}__p0"
    outs = eng.run_fwd({"data": NDA(in_dims["data"], x),
                        "label": NDA(Dims.of(img=2), labels)},
                       list(name_map.values()))

    # ground truth: jax.grad over the forward-only net (sum of per-img losses)
    fwd_pipe, _ = tiny_net()
    softmax_to_loss(fwd_pipe)
    net_fn = build_net_fn(fwd_pipe, ["prob_loss"])
    weights = {k: w.data for k, w in fwd_pipe.weights.items()}

    def loss_fn(w, xx):
        return jnp.sum(net_fn(w, {"data": xx, "label": jnp.asarray(labels)})
                       ["prob_loss"])

    gw = jax.grad(loss_fn)(weights, x)
    gx = jax.grad(loss_fn, argnums=1)(weights, x)

    def check(name, ref):
        got = outs[name_map[name]].data
        scale = max(1e-30, float(np.abs(ref).max()))
        r = comp_vars(np.asarray(ref), got, mrd_toler=1e-4, atol=1e-5 * scale)
        assert r.ok(), f"{name} ({engine}): {r}"

    check("data__grad", gx)
    check("conv1__filts__grad", gw["conv1__filts"])
    check("conv1__biases__grad", gw["conv1__biases"])
    check("fc1__filts__grad", gw["fc1__filts"])
    check("fc1__biases__grad", gw["fc1__biases"])


def test_bck_with_eltwise_fanout():
    """mini_resnet has fan-out (shortcut + residual): accumulation must work."""
    pipe, in_dims = build_mini_resnet(img=2, num_cls=8, in_sz=8)
    add_bck_ops(pipe)
    eng = make("conv_fwd", "xla")
    eng.init(pipe)
    rng = np.random.RandomState(1)
    x = rng.randn(*in_dims["data"].shape).astype(np.float32)
    outs = eng.run_fwd({"data": NDA(in_dims["data"], x),
                        "label": NDA(Dims.of(img=2), np.zeros(2, np.float32))},
                       ["data__grad" if "data__grad" in pipe.nodes
                        else "data__grad__p0"])
    g = list(outs.values())[0].data
    assert np.all(np.isfinite(g))
    assert float(np.abs(g).max()) > 0


def test_test_compute_with_bck(tmp_path):
    from boda_tpu.cli import main
    rc = main(["test_compute", "--model=mini_resnet", "--img=1", "--n-wins=1",
               "--add-bck-ops=1", "--in-sz=8", f"--boda-output-dir={tmp_path}",
               "--mrd-toler=1e-3"])
    assert rc == 0


def test_pallas_bck_conv_kernels_selected_and_match():
    """The generated Pallas backward-conv path (ops/kernels/bconv.py — the
    BckConv analog, ref test/rtc/bconv.cucl) must be SELECTED for an
    eligible stride-1 conv and must match the xla engine's vjp grads."""
    from boda_tpu.models.zoo import NetBuilder
    b = NetBuilder("bk")
    t = b.input("data")
    t = b.conv("conv1", t, 32, 3, pad=1, in_chans=64)   # c=64, ow=8: eligible
    t = b.relu("r1", t)
    t = b.conv("conv2", t, 16, 1, in_chans=32)
    b.softmax("prob", t)
    in_dims = {"data": Dims.of(img=2, chan=64, y=8, x=8)}
    pipe = b.done(in_dims)
    add_bck_ops(pipe)
    rng = np.random.RandomState(0)
    x = rng.randn(2, 64, 8, 8).astype(np.float32)
    labels = np.array([1, 3], dtype=np.float32)
    want = []
    for w in ("data__grad", "conv1__filts__grad", "conv1__biases__grad"):
        if not (w in pipe.nodes and pipe.nodes[w].dims is not None):
            w = f"{w}__p0"
        assert w in pipe.nodes, w
        want.append(w)
    res = {}
    logs = {}
    for engine in ("xla", "pallas"):
        kw = {"kernel_policy": "gen"} if engine == "pallas" else {}
        eng = make("conv_fwd", engine, **kw)
        eng.init(pipe)
        res[engine] = eng.run_fwd(
            {"data": NDA(in_dims["data"], x),
             "label": NDA(Dims.of(img=2), labels)}, want)
        logs[engine] = eng.get_info_log()
    assert "pallas-bck-conv" in logs["pallas"], logs["pallas"]
    for n in want:
        a = res["xla"][n].data
        g = res["pallas"][n].data
        scale = max(1e-30, float(np.abs(a).max()))
        r = comp_vars(a, g, mrd_toler=1e-5, atol=1e-5 * scale)
        assert r.ok(), f"{n}: {r}"
