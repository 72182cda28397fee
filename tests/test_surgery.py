"""Net-surgery tests: fc_to_conv equivalence, filter resize, net writers."""

import numpy as np
import pytest

import boda_tpu.modes_all  # noqa: F401
from boda_tpu.cli import main
from boda_tpu.config import make
from boda_tpu.frontend.pipe_builder import pipe_from_prototxt
from boda_tpu.frontend.surgery import (fc_to_conv, pipe_to_prototxt,
                                       resize_conv, write_caffemodel)
from boda_tpu.utils.digest import comp_vars
from boda_tpu.utils.dims import NDA

PTT = "/root/repo/testdata/nets/tinynet.prototxt"


def _run(pipe, in_dims, out):
    eng = make("conv_fwd", "xla")
    eng.init(pipe)
    rng = np.random.RandomState(0)
    x = NDA(in_dims["data"], rng.randn(*in_dims["data"].shape).astype(np.float32))
    return eng.run_fwd({"data": x}, [out])[out].data


def test_fc_to_conv_equivalence():
    """At the native input size, the converted net must match exactly."""
    pipe_a, ind_a = pipe_from_prototxt(PTT)
    base = _run(pipe_a, ind_a, "prob")
    pipe_b, ind_b = pipe_from_prototxt(PTT)
    converted = fc_to_conv(pipe_b)
    assert converted == ["fc1"]
    assert pipe_b.ops["fc1"].type == "Convolution"
    conv = _run(pipe_b, ind_b, "prob")
    assert conv.shape == (2, 10, 1, 1)
    r = comp_vars(base.reshape(conv.shape), conv, mrd_toler=1e-5, atol=1e-6)
    assert r.ok(), r


def test_fc_to_conv_dense():
    """After conversion the net accepts larger inputs (dense evaluation)."""
    pipe, in_dims = pipe_from_prototxt(PTT)
    fc_to_conv(pipe)
    in_dims2 = {"data": in_dims["data"].with_size("y", 32).with_size("x", 32)}
    # re-infer at the new size
    for node in pipe.nodes.values():
        if node.name not in pipe.weights and node.name != "data":
            node.dims = None
    pipe.nodes["data"].dims = in_dims2["data"]
    pipe.calc_dims(in_dims2)
    assert pipe.must_dims("prob").shape == (2, 10, 3, 3)


def test_resize_conv_preserves_sum():
    pipe, _ = pipe_from_prototxt(PTT)
    w0 = pipe.weights["conv2__filts"]
    sums0 = w0.data.reshape(16 * 8, 5, 5).sum(axis=(1, 2))
    resize_conv(pipe, "conv2", (3, 3))
    w1 = pipe.weights["conv2__filts"]
    assert w1.dims.shape == (16, 8, 3, 3)
    sums1 = w1.data.reshape(16 * 8, 3, 3).sum(axis=(1, 2))
    assert np.allclose(sums0, sums1, rtol=1e-4)
    assert pipe.ops["conv2"].kern_sz() == (3, 3)


def test_net_writers_roundtrip(tmp_path):
    pipe, in_dims = pipe_from_prototxt(PTT)
    ptt = tmp_path / "copy.prototxt"
    wfn = tmp_path / "copy.caffemodel"
    ptt.write_text(pipe_to_prototxt(pipe))
    write_caffemodel(str(wfn), pipe)
    pipe2, ind2 = pipe_from_prototxt(str(ptt), weights_fn=str(wfn))
    # same structure, same weights, same outputs
    assert sorted(pipe2.ops) == sorted(pipe.ops)
    for k, w in pipe.weights.items():
        assert np.array_equal(w.data, pipe2.weights[k].data), k
    a = _run(pipe, in_dims, "prob")
    b = _run(pipe2, ind2, "prob")
    assert np.array_equal(a, b)


def test_surgery_modes(tmp_path, capsys):
    rc = main(["cnet_copy", f"--ptt-fn={PTT}", "--out-weights-fn=w.caffemodel",
               f"--boda-output-dir={tmp_path}"])
    assert rc == 0
    rc = main(["cnet_resize_conv", f"--ptt-fn={PTT}", "--layer=conv1",
               "--new-kern=5", f"--boda-output-dir={tmp_path}"])
    assert rc == 0
    rc = main(["cnet_util", f"--ptt-fn={PTT}", f"--boda-output-dir={tmp_path}"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "weight blobs" in out and "resized conv1" in out


def test_upsample_2x_net_exact():
    from boda_tpu.frontend.surgery import upsample_2x_net
    pipe, in_dims = pipe_from_prototxt(PTT)
    name = upsample_2x_net(pipe)
    assert name == "conv1"
    assert pipe.ops["conv1"].kern_sz() == (6, 6)
    assert pipe.ops["conv1"].stride() == (2, 2)
    assert pipe.weights["conv1__filts"].dims.shape == (8, 3, 6, 6)


def test_upsamp_mode(tmp_path):
    rc = main(["test_upsamp", "--model=mini_resnet", "--out-node-name=relu1",
               "--in-sz=16", f"--boda-output-dir={tmp_path}"])
    assert rc == 0


def test_serve_bench_mode(tmp_path, capsys):
    from boda_tpu.utils.native import native_available
    if not native_available():
        pytest.skip("no native lib")
    rc = main(["serve_bench", "--model=mini_resnet",
               "--img-fns=(a=/root/repo/testdata/images/test2.jpg)",
               "--img=2", "--n-batches=2", "--conv-fwd=(mode=xla)",
               f"--boda-output-dir={tmp_path}"])
    assert rc == 0
    assert '"img_per_sec"' in capsys.readouterr().out


def test_serve_bench_nhwc_native_layout(tmp_path, capsys):
    # NHWC pallas engine: preprocessing emits the engine's native (img,y,x,3)
    # layout directly (no device-side NCHW round trip)
    from boda_tpu.utils.native import native_available
    if not native_available():
        pytest.skip("no native lib")
    rc = main(["serve_bench", "--model=mini_resnet",
               "--img-fns=(a=/root/repo/testdata/images/test2.jpg)",
               "--img=2", "--n-batches=2",
               "--conv-fwd=(mode=pallas,compute_tn=bfloat16)",
               f"--boda-output-dir={tmp_path}"])
    assert rc == 0
    assert '"img_per_sec"' in capsys.readouterr().out


def test_preproc_nhwc_matches_nchw():
    import numpy as np

    from boda_tpu.apps.preproc import img_to_batch_jax
    rgba = np.random.RandomState(0).randint(0, 256, (2, 6, 5, 4), np.uint8)
    nchw = np.asarray(img_to_batch_jax(rgba))
    nhwc = np.asarray(img_to_batch_jax(rgba, layout="nhwc"))
    np.testing.assert_array_equal(nhwc.transpose(0, 3, 1, 2), nchw)


def test_cnet_bpt_dump(tmp_path, capsys):
    from boda_tpu.cli import main
    rc = main(["cnet_bpt_dump",
               "--weights-fn=testdata/nets/tinynet.caffemodel"])
    assert rc == 0
    out = capsys.readouterr().out
    assert 'name: "tinynet"' in out
    assert "type: InnerProduct" in out      # V1 enum decode
    assert 'type: "Convolution"' in out     # new-style layer
    assert "f201: 9" in out                 # unknown fields preserved
    assert "data:" not in out               # remove_data=1 default
    rc = main(["cnet_bpt_dump",
               "--weights-fn=testdata/nets/tinynet.caffemodel",
               "--remove_data=0"])
    out = capsys.readouterr().out
    assert out.count("data:") == 4 * 3 * 3 * 3 + 4 + 8  # w + b + v1 fc
