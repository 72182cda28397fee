"""Graph IR + lowering tests: shape inference, receptive fields, and
op-semantics parity against torch (CPU) as an independent Caffe-semantics
oracle (the role Caffe itself plays in ref test_compute, SURVEY.md section 4.3)."""

import numpy as np
import pytest

import boda_tpu.graph  # noqa: F401  (registers conv_fwd engines)
from boda_tpu.config import make
from boda_tpu.graph.pipe import ConvOp, ConvPipe, PipeError
from boda_tpu.models.zoo import MODELS, NetBuilder, build_model
from boda_tpu.utils.digest import comp_vars
from boda_tpu.utils.dims import NDA, Dims


def small_net(img=2, in_sz=16):
    b = NetBuilder("small")
    t = b.input("data")
    t = b.conv("conv1", t, 8, 3, pad=1, in_chans=3, relu=True)
    t = b.pool("pool1", t, kern=3, stride=2)
    t = b.lrn("norm1", t)
    t = b.conv("conv2", t, 16, 5, pad=2, stride=2, in_chans=8, relu=True)
    t = b.pool("pool2", t, kern=2, stride=2, avg=True)
    t = b.fc("fc1", t, 10, in_feats=16 * 2 * 2)
    b.softmax("prob", t)
    in_dims = {"data": Dims.of(img=img, chan=3, y=in_sz, x=in_sz)}
    return b.done(in_dims), in_dims


def test_shape_inference():
    pipe, _ = small_net()
    assert pipe.must_dims("conv1").shape == (2, 8, 16, 16)
    assert pipe.must_dims("pool1").shape == (2, 8, 8, 8)   # ceil((16-3)/2)+1 = 8
    assert pipe.must_dims("conv2").shape == (2, 16, 4, 4)
    assert pipe.must_dims("pool2").shape == (2, 16, 2, 2)
    assert pipe.must_dims("fc1").shape == (2, 10)
    assert pipe.must_dims("prob").shape == (2, 10)


def test_caffe_pool_ceil_clip():
    # caffe pooling: ceil mode, but last window must start inside input+pad
    b = NetBuilder("p")
    t = b.input("data")
    b.pool("pool", t, kern=3, stride=2, pad=1)
    pipe = b.done({"data": Dims.of(img=1, chan=1, y=7, x=7)})
    # ceil((7+2-3)/2)+1 = 4; window starts 0,2,4,6 offset -1 -> start 6-1=5 < 7+1 ok
    assert pipe.must_dims("pool").shape == (1, 1, 4, 4)


def test_support_info():
    pipe, _ = small_net()
    csi = pipe.nodes["conv1"].csi
    assert csi.support_sz == (3, 3) and csi.support_stride == (1, 1)
    csi = pipe.nodes["pool1"].csi
    assert csi.support_sz == (5, 5) and csi.support_stride == (2, 2)
    csi = pipe.nodes["conv2"].csi
    assert csi.support_sz == (13, 13) and csi.support_stride == (4, 4)
    assert pipe.nodes["fc1"].csi.support_stride == (0, 0)  # global


def test_graph_errors():
    p = ConvPipe("bad")
    with pytest.raises(PipeError, match="unknown op type"):
        p.add_op(ConvOp("x", "NoSuchOp", {}, ["a"], ["b"]))
    p2 = ConvPipe("cycle")
    p2.add_op(ConvOp("op1", "ReLU", {}, ["a"], ["b"]))
    p2.add_op(ConvOp("op2", "ReLU", {}, ["b"], ["a"]))
    with pytest.raises(PipeError, match="cycle"):
        p2.topo_op_order()


def test_flops():
    pipe, _ = small_net()
    # conv1: 2 * (2*8*16*16) outputs * 3*3*3
    assert pipe.op_flops("conv1") == 2 * (2 * 8 * 16 * 16) * 27
    assert pipe.total_flops() > 0


@pytest.mark.parametrize("engine", ["xla", "pallas"])
def test_engine_runs_small_net(engine):
    pipe, in_dims = small_net()
    eng = make("conv_fwd", engine)
    eng.init(pipe)
    rng = np.random.RandomState(0)
    x = NDA(in_dims["data"], rng.randn(*in_dims["data"].shape).astype(np.float32))
    outs = eng.run_fwd({"data": x}, ["prob", "conv1_relu"])
    prob = outs["prob"].data
    assert prob.shape == (2, 10)
    assert np.allclose(prob.sum(axis=1), 1.0, atol=1e-5)
    assert outs["conv1_relu"].data.min() >= 0.0


def test_native_nhwc_input_matches_logical():
    """The NHWC engine ingests native-layout (NHWC, compute-dtype) inputs —
    the production loader's decode layout — bit-identically to the logical
    NCHW path; a wrong-shape input raises with both shapes named."""
    from boda_tpu.graph.executor import PipeError
    from boda_tpu.utils.dims import Dims
    pipe, in_dims = small_net()
    eng = make("conv_fwd", "pallas", compute_tn="bfloat16")
    eng.init(pipe)
    d = in_dims["data"]
    rng = np.random.RandomState(3)
    x = rng.randn(*d.shape).astype(np.float32)
    ref = eng.run_fwd({"data": NDA(d, x)}, ["prob"])["prob"].data
    import ml_dtypes
    nd = Dims.of(img=d["img"], y=d["y"], x=d["x"], chan=d["chan"],
                 tn="bfloat16")
    xn = x.astype(ml_dtypes.bfloat16).transpose(0, 2, 3, 1)
    out = eng.run_fwd({"data": NDA(nd, np.ascontiguousarray(xn))},
                      ["prob"])["prob"].data
    np.testing.assert_array_equal(out, ref)
    bad = Dims.of(img=d["img"], y=d["y"], x=d["x"] + 1, chan=d["chan"],
                  tn="bfloat16")
    with pytest.raises(PipeError, match="neither logical NCHW"):
        eng.run_fwd({"data": NDA(bad)}, ["prob"])


def test_xla_vs_pallas_per_layer():
    """Cross-engine per-layer regression (the test_compute methodology)."""
    pipe, in_dims = small_net()
    rng = np.random.RandomState(1)
    x = NDA(in_dims["data"], rng.randn(*in_dims["data"].shape).astype(np.float32))
    all_nodes = [n for n in pipe.nodes
                 if pipe.nodes[n].dims is not None and n not in pipe.weights
                 and n != "data"]
    res = {}
    for engine in ("xla", "pallas"):
        eng = make("conv_fwd", engine)
        eng.init(pipe)
        res[engine] = eng.run_fwd({"data": x}, all_nodes)
    for n in all_nodes:
        a, b = res["xla"][n].data, res["pallas"][n].data
        scale = max(1e-30, float(np.abs(a).max()))
        r = comp_vars(a, b, mrd_toler=1e-5, atol=1e-5 * scale)
        assert r.ok(), f"node {n}: {r}"


def _torch_smallnet_forward(x, pipe):
    """Independent oracle: same net in torch (Caffe-compatible modules)."""
    import torch
    import torch.nn.functional as F
    tw = {k: torch.tensor(w.data) for k, w in pipe.weights.items()}
    t = torch.tensor(x)
    t = F.conv2d(t, tw["conv1__filts"], tw["conv1__biases"], padding=1)
    t = F.relu(t)
    conv1 = t
    t = F.max_pool2d(t, 3, stride=2, ceil_mode=True)
    pool1 = t
    # caffe LRN: across channels, alpha scaled by size
    t = F.local_response_norm(t, size=5, alpha=1e-4, beta=0.75, k=1.0)
    norm1 = t
    t = F.conv2d(t, tw["conv2__filts"], tw["conv2__biases"], padding=2, stride=2)
    t = F.relu(t)
    conv2 = t
    t = F.avg_pool2d(t, 2, stride=2, ceil_mode=True, count_include_pad=True)
    pool2 = t
    t = t.reshape(t.shape[0], -1)
    t = t @ tw["fc1__filts"].T + tw["fc1__biases"]
    fc1 = t
    prob = F.softmax(t, dim=1)
    return {"conv1": conv1, "pool1": pool1, "norm1": norm1, "conv2": conv2,
            "pool2": pool2, "fc1": fc1, "prob": prob}


def test_xla_vs_torch_oracle():
    pipe, in_dims = small_net()
    rng = np.random.RandomState(2)
    x = rng.randn(*in_dims["data"].shape).astype(np.float32)
    eng = make("conv_fwd", "xla")
    eng.init(pipe)
    names = ["conv1", "pool1", "norm1", "conv2", "pool2", "fc1", "prob"]
    # engine nodes: relu is a separate node; conv1 node is pre-relu in builder
    ours = eng.run_fwd({"data": NDA(in_dims["data"], x)},
                       ["conv1_relu", "pool1", "norm1", "conv2_relu", "pool2",
                        "fc1", "prob"])
    theirs = _torch_smallnet_forward(x, pipe)
    mapping = {"conv1": "conv1_relu", "conv2": "conv2_relu"}
    for tname, tval in theirs.items():
        ref = tval.detach().numpy()
        got = ours[mapping.get(tname, tname)].data
        scale = max(1e-30, float(np.abs(ref).max()))
        r = comp_vars(ref, got, mrd_toler=1e-4, atol=1e-5 * scale)
        assert r.ok(), f"{tname}: {r}"


@pytest.mark.parametrize("model", ["alexnet_ng_conv", "nin_imagenet",
                                   "googlenet_conv", "resnet50", "squeezenet",
                                   "vgg16"])
def test_zoo_builds_and_infers(model):
    pipe, in_dims = build_model(model, img=1)
    assert pipe.must_dims("prob").shape[1] == 1000
    assert pipe.total_flops() > 1e8
