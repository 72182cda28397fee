"""Edge-op coverage: grouped conv, deconvolution, sigmoid/tanh, eltwise modes,
global avg pool, concat axes — each vs torch or analytic reference."""

import numpy as np
import pytest

import boda_tpu.graph  # noqa: F401
from boda_tpu.config import make
from boda_tpu.graph.pipe import ConvOp, ConvPipe
from boda_tpu.models.zoo import NetBuilder
from boda_tpu.utils.digest import comp_vars
from boda_tpu.utils.dims import NDA, Dims


def _run_both(pipe, in_dims, out, x):
    res = {}
    for engine in ("xla", "pallas"):
        eng = make("conv_fwd", engine)
        eng.init(pipe)
        res[engine] = eng.run_fwd({"data": NDA(in_dims["data"], x)}, [out])[out].data
    scale = max(1e-30, float(np.abs(res["xla"]).max()))
    r = comp_vars(res["xla"], res["pallas"], mrd_toler=1e-5, atol=1e-5 * scale)
    assert r.ok(), r
    return res["xla"]


def test_grouped_conv_vs_torch():
    import torch
    import torch.nn.functional as F
    b = NetBuilder("g")
    t = b.input("data")
    b.conv("conv1", t, 8, 3, pad=1, in_chans=4, groups=2)
    in_dims = {"data": Dims.of(img=2, chan=4, y=6, x=6)}
    pipe = b.done(in_dims)
    rng = np.random.RandomState(0)
    x = rng.randn(2, 4, 6, 6).astype(np.float32)
    got = _run_both(pipe, in_dims, "conv1", x)
    ref = F.conv2d(torch.tensor(x), torch.tensor(pipe.weights["conv1__filts"].data),
                   torch.tensor(pipe.weights["conv1__biases"].data),
                   padding=1, groups=2).numpy()
    assert np.allclose(ref, got, atol=1e-4)


def test_deconv_vs_torch():
    import torch
    import torch.nn.functional as F
    pipe = ConvPipe("d")
    w = Dims.of(out_chan=3, in_chan=5, y=4, x=4)
    rng = np.random.RandomState(1)
    pipe.weights["up__filts"] = NDA(w, rng.randn(*w.shape).astype(np.float32))
    pipe.weights["up__biases"] = NDA(Dims.of(out_chan=3),
                                     rng.randn(3).astype(np.float32))
    pipe.add_op(ConvOp("up", "Deconvolution",
                       {"kern_sz": (4, 4), "stride": (2, 2), "pad": (1, 1)},
                       bots=["data", "up__filts", "up__biases"], tops=["up"]))
    in_dims = {"data": Dims.of(img=2, chan=5, y=7, x=7)}
    pipe.get_or_make_node("up__filts").dims = w
    pipe.get_or_make_node("up__biases").dims = Dims.of(out_chan=3)
    pipe.calc_dims(in_dims)
    assert pipe.must_dims("up").shape == (2, 3, 14, 14)
    x = rng.randn(2, 5, 7, 7).astype(np.float32)
    got = _run_both(pipe, in_dims, "up", x)
    # caffe deconv == torch ConvTranspose2d with weight (in, out, kh, kw);
    # our weights are (out_chan=3=output, in_chan=5=input) -> transpose
    tw = torch.tensor(pipe.weights["up__filts"].data).permute(1, 0, 2, 3)
    ref = F.conv_transpose2d(torch.tensor(x), tw,
                             torch.tensor(pipe.weights["up__biases"].data),
                             stride=2, padding=1).numpy()
    assert np.allclose(ref, got, atol=1e-4), float(np.abs(ref - got).max())


def test_sigmoid_tanh_eltwise_max():
    b = NetBuilder("s")
    t = b.input("data")
    c1 = b.conv("c1", t, 4, 1, in_chans=3)
    pipe = b.pipe
    pipe.add_op(ConvOp("sig", "Sigmoid", {}, bots=[c1], tops=["sig"]))
    pipe.add_op(ConvOp("tanh", "TanH", {}, bots=[c1], tops=["tanh"]))
    pipe.add_op(ConvOp("emax", "Eltwise", {"eltwise_op": "max"},
                       bots=["sig", "tanh"], tops=["emax"]))
    pipe.add_op(ConvOp("eprod", "Eltwise", {"eltwise_op": "prod"},
                       bots=["sig", "tanh"], tops=["eprod"]))
    in_dims = {"data": Dims.of(img=1, chan=3, y=4, x=4)}
    pipe = b.done(in_dims)
    rng = np.random.RandomState(2)
    x = rng.randn(1, 3, 4, 4).astype(np.float32)
    eng = make("conv_fwd", "pallas")
    eng.init(pipe)
    outs = eng.run_fwd({"data": NDA(in_dims["data"], x)},
                       ["c1", "sig", "tanh", "emax", "eprod"])
    c1v = outs["c1"].data
    assert np.allclose(outs["sig"].data, 1 / (1 + np.exp(-c1v)), atol=1e-5)
    assert np.allclose(outs["tanh"].data, np.tanh(c1v), atol=1e-5)
    assert np.allclose(outs["emax"].data,
                       np.maximum(outs["sig"].data, outs["tanh"].data))
    assert np.allclose(outs["eprod"].data,
                       outs["sig"].data * outs["tanh"].data, atol=1e-6)


def _caffe_avg_pool_ref(x, k, s, p):
    """Explicit AVE pooling semantics of the reference kernel (ref
    test/rtc/pool.cucl: "to match caffe, only non-padding pixels are
    considered"): sum AND divisor both count only real (non-padding)
    pixels — torch's count_include_pad=False."""
    n, c, iy, ix = x.shape
    oy = -(-(iy + 2 * p - k) // s) + 1
    if (oy - 1) * s >= iy + p:
        oy -= 1
    ox = oy
    out = np.zeros((n, c, oy, ox), np.float32)
    for yo in range(oy):
        for xo in range(ox):
            y0, x0 = yo * s - p, xo * s - p
            ry0, rx0 = max(y0, 0), max(x0, 0)
            ry1, rx1 = min(y0 + k, iy), min(x0 + k, ix)
            area = (ry1 - ry0) * (rx1 - rx0)
            out[:, :, yo, xo] = x[:, :, ry0:ry1, rx0:rx1].sum(axis=(2, 3)) / area
    return out


def test_avg_pool_padded_divisor_caffe_semantics():
    b = NetBuilder("p")
    t = b.input("data")
    b.pool("pool", t, kern=3, stride=2, pad=1, avg=True)
    in_dims = {"data": Dims.of(img=1, chan=2, y=6, x=6)}
    pipe = b.done(in_dims)
    rng = np.random.RandomState(3)
    x = rng.randn(1, 2, 6, 6).astype(np.float32)
    got = _run_both(pipe, in_dims, "pool", x)
    ref = _caffe_avg_pool_ref(x, 3, 2, 1)
    assert np.allclose(ref, got, atol=1e-5), float(np.abs(ref - got).max())
