"""Regression tests for the round-1 advisor findings (ADVICE.md):

1. pallas conv grid must cover all output channels when round_up(oc,128) is
   not a multiple of the tuned boc (e.g. oc=384, bn=256) — previously the
   trailing channels were never written (uninitialized garbage / NaN).
2. set_det_drop_seed must invalidate the compiled-fn cache key, so the next
   run_fwd rebuilds with the new seed instead of calling a None fn.
3. average pooling with pad>0 must divide by the count of NON-padding pixels
   only (ref test/rtc/pool.cucl "to match caffe"), i.e. torch's
   count_include_pad=False semantics.
"""

import numpy as np

import boda_tpu.graph  # noqa: F401
from boda_tpu.config import make
from boda_tpu.models.zoo import NetBuilder
from boda_tpu.ops.tune import OpTune
from boda_tpu.utils.dims import NDA, Dims


def test_pallas_conv_oc384_boc256_covers_all_channels():
    # alexnet conv3/conv4-class shape: c=256 -> oc=384, 3x3 stride 1 pad 1
    from jax import lax

    from boda_tpu.ops.kernels.conv import conv_blocks, pallas_conv2d_nhwc

    rng = np.random.RandomState(0)
    n, h, w_sz, c, oc, k = 1, 13, 16, 256, 384, 3
    x = rng.randn(n, h, w_sz, c).astype(np.float32)
    w = (rng.randn(k, k, c, oc) * 0.05).astype(np.float32)
    b = rng.randn(oc).astype(np.float32)
    tune = OpTune(bn=256)  # boc=256 does not divide round_up(384,128)=384
    ind = Dims.of(img=n, chan=c, y=h, x=w_sz)
    fd = Dims.of(out_chan=oc, in_chan=c, y=k, x=k)
    od = Dims.of(img=n, chan=oc, y=h, x=w_sz - 2)
    blocks = conv_blocks(ind, fd, od, tune)
    assert blocks is not None
    got = np.asarray(pallas_conv2d_nhwc(x, w, b, stride=(1, 1), pad=(1, 0),
                                        blocks=blocks, interpret=True))
    ref = np.asarray(lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=[(1, 1), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=lax.Precision.HIGHEST)) + b.reshape(1, 1, 1, -1)
    assert np.isfinite(got).all(), "uninitialized output channels (grid gap)"
    assert np.allclose(got, ref, atol=1e-4), float(np.abs(got - ref).max())


def test_set_det_drop_seed_rebuilds_fn():
    b = NetBuilder("d")
    t = b.input("data")
    t = b.conv("c1", t, 8, 3, pad=1, in_chans=4)
    t = b.dropout("drop1", t, ratio=0.5)
    in_dims = {"data": Dims.of(img=1, chan=4, y=6, x=6)}
    pipe = b.done(in_dims)
    x = np.random.RandomState(0).randn(1, 4, 6, 6).astype(np.float32)
    eng = make("conv_fwd", "xla", train="1")
    eng.init(pipe)
    out1 = eng.run_fwd({"data": NDA(in_dims["data"], x)}, ["drop1"])["drop1"].data
    eng.set_det_drop_seed(1234)
    # previously: _fn_key survived the reset -> run_fwd called _fn=None
    out2 = eng.run_fwd({"data": NDA(in_dims["data"], x)}, ["drop1"])["drop1"].data
    eng.set_det_drop_seed(1234)
    out3 = eng.run_fwd({"data": NDA(in_dims["data"], x)}, ["drop1"])["drop1"].data
    assert not np.allclose(out1, out2), "new seed must change the dropout mask"
    assert np.allclose(out2, out3), "same seed must reproduce the mask"


def test_avg_pool_pad_divisor_excludes_padding():
    import torch
    import torch.nn.functional as F
    b = NetBuilder("p")
    t = b.input("data")
    b.pool("pool1", t, kern=3, stride=2, pad=1, avg=True)
    in_dims = {"data": Dims.of(img=2, chan=3, y=7, x=7)}
    pipe = b.done(in_dims)
    rng = np.random.RandomState(1)
    x = rng.randn(2, 3, 7, 7).astype(np.float32)
    res = {}
    for engine in ("xla", "pallas"):
        eng = make("conv_fwd", engine)
        eng.init(pipe)
        res[engine] = eng.run_fwd({"data": NDA(in_dims["data"], x)},
                                  ["pool1"])["pool1"].data
    ref = F.avg_pool2d(torch.tensor(x), 3, stride=2, padding=1,
                       count_include_pad=False).numpy()
    for engine, got in res.items():
        assert np.allclose(got, ref, atol=1e-5), \
            (engine, float(np.abs(got - ref).max()))
