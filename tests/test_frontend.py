"""Frontend tests: textproto parser, caffemodel wire decoder, pipe builder."""

import struct

import numpy as np
import pytest

import boda_tpu.graph  # noqa: F401
from boda_tpu.config import make
from boda_tpu.frontend.caffemodel import read_caffemodel
from boda_tpu.frontend.pipe_builder import (FrontendError, pipe_from_netparam,
                                            pipe_from_prototxt)
from boda_tpu.frontend.textproto import (TextProtoError, get1, getl,
                                         parse_textproto)
from boda_tpu.utils.dims import NDA

NETS = "/root/repo/testdata/nets"


# -- textproto ----------------------------------------------------------------

def test_textproto_basics():
    m = parse_textproto('''
      name: "x"   # comment
      num: 5 f: 2.5 flag: true en: MAX
      sub { a: 1 a: 2 }
      sub { a: 3 }
      colon_msg: { b: "q\\"z" }
    ''')
    assert get1(m, "name") == "x"
    assert get1(m, "num") == 5 and get1(m, "f") == 2.5
    assert get1(m, "flag") is True and get1(m, "en") == "MAX"
    assert [getl(s, "a") for s in getl(m, "sub")] == [[1, 2], [3]]
    assert get1(getl(m, "colon_msg")[0], "b") == 'q"z'


@pytest.mark.parametrize("bad", ["a: {", "}", 'x: "unterminated', "{ }"])
def test_textproto_errors(bad):
    with pytest.raises(TextProtoError):
        parse_textproto(bad)


# -- caffemodel wire decode ------------------------------------------------------

def _varint(v: int) -> bytes:
    out = b""
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            out += bytes([b])
            return out


def _field(fno: int, wt: int, payload: bytes) -> bytes:
    return _varint((fno << 3) | wt) + payload


def _ld(fno: int, data: bytes) -> bytes:
    return _field(fno, 2, _varint(len(data)) + data)


def _make_blob(arr: np.ndarray) -> bytes:
    shape = b"".join(_field(1, 0, _varint(d)) for d in arr.shape)
    # use packed data (field 5, length-delimited float array)
    data = arr.astype("<f4").tobytes()
    return _ld(7, shape) + _ld(5, data)


def _make_caffemodel(layers: dict[str, list[np.ndarray]]) -> bytes:
    out = _ld(1, b"testnet")
    for name, blobs in layers.items():
        lp = _ld(1, name.encode())
        lp += _ld(2, b"Convolution")
        for b in blobs:
            lp += _ld(7, _make_blob(b))
        out += _ld(100, lp)
    return out


def test_caffemodel_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    w = rng.randn(8, 3, 3, 3).astype(np.float32)
    b = rng.randn(8).astype(np.float32)
    fn = tmp_path / "m.caffemodel"
    fn.write_bytes(_make_caffemodel({"conv1": [w, b]}))
    blobs = read_caffemodel(str(fn))
    assert set(blobs) == {"conv1"}
    assert blobs["conv1"][0].shape == (8, 3, 3, 3)
    assert np.array_equal(blobs["conv1"][0].data, w)
    assert np.array_equal(blobs["conv1"][1].data, b)


# -- pipe builder -------------------------------------------------------------------

def test_prototxt_to_pipe():
    pipe, in_dims = pipe_from_prototxt(f"{NETS}/tinynet.prototxt")
    assert pipe.name == "tinynet"
    assert in_dims["data"].shape == (2, 3, 16, 16)
    # in-place relu/dropout created SSA nodes
    assert "conv1@relu1" in pipe.nodes
    assert pipe.must_dims("conv1@relu1").shape == (2, 8, 16, 16)
    assert pipe.must_dims("pool1").shape == (2, 8, 8, 8)
    assert pipe.must_dims("conv2").shape == (2, 16, 4, 4)
    assert pipe.must_dims("prob").shape == (2, 10)
    assert "fc1__filts" in pipe.weights
    assert pipe.weights["fc1__filts"].dims.shape == (10, 16 * 2 * 2)


def test_prototxt_v1_upgrade():
    pipe, in_dims = pipe_from_prototxt(f"{NETS}/tinynet_v1.prototxt")
    assert pipe.must_dims("prob").shape == (2, 10)
    assert pipe.ops["conv1"].type == "Convolution"


def test_prototxt_batch_override():
    pipe, in_dims = pipe_from_prototxt(f"{NETS}/tinynet.prototxt", img=5)
    assert in_dims["data"]["img"] == 5
    assert pipe.must_dims("prob").shape == (5, 10)


def test_prototxt_with_weights(tmp_path):
    rng = np.random.RandomState(1)
    w = rng.randn(8, 3, 3, 3).astype(np.float32)
    b = rng.randn(8).astype(np.float32)
    fn = tmp_path / "m.caffemodel"
    fn.write_bytes(_make_caffemodel({"conv1": [w, b]}))
    pipe, _ = pipe_from_prototxt(f"{NETS}/tinynet.prototxt", weights_fn=str(fn))
    assert np.array_equal(pipe.weights["conv1__filts"].data, w)
    assert np.array_equal(pipe.weights["conv1__biases"].data, b)
    # layers without stored blobs got deterministic init
    pipe2, _ = pipe_from_prototxt(f"{NETS}/tinynet.prototxt", weights_fn=str(fn))
    assert np.array_equal(pipe.weights["conv2__filts"].data,
                          pipe2.weights["conv2__filts"].data)


def test_prototxt_net_runs():
    pipe, in_dims = pipe_from_prototxt(f"{NETS}/tinynet.prototxt")
    eng = make("conv_fwd", "xla")
    eng.init(pipe)
    rng = np.random.RandomState(0)
    x = NDA(in_dims["data"], rng.randn(*in_dims["data"].shape).astype(np.float32))
    outs = eng.run_fwd({"data": x}, ["prob"])
    assert np.allclose(outs["prob"].data.sum(axis=1), 1.0, atol=1e-5)


def test_unsupported_layer_type():
    with pytest.raises(FrontendError, match="unsupported type"):
        pipe_from_netparam({"name": ["x"], "input": ["d"],
                            "input_shape": [{"dim": [1, 3, 4, 4]}],
                            "layer": [{"name": ["l"], "type": ["NoSuch"],
                                       "bottom": ["d"], "top": ["t"]}]})


REF_NETS = "/root/reference/nets"


def test_all_reference_prototxts_parse():
    """Every net in the reference zoo must parse + shape-infer (ref
    parse_and_upgrade_net_param_from_text_file, caffepb.cc:329 — incl. the
    V1 'layers'/enum-type format of nin/vgg_19/bconv_strides_1)."""
    import glob
    import os
    if not os.path.isdir(REF_NETS):
        pytest.skip("reference nets not available")
    files = sorted(glob.glob(f"{REF_NETS}/*/train_val.prototxt"))
    files.append(f"{REF_NETS}/rrc/deploy.prototxt")
    assert len(files) == 21
    for f in files:
        pipe, in_dims = pipe_from_prototxt(f, img=1)
        assert pipe.ops and in_dims, f
        assert "data" in in_dims or "data_layer" in in_dims, f
