"""Selective int8 ACTIVATION STORAGE (PallasFwd.act_int8).

Distinct from int8 compute (test_int8.py): listed nodes are stored in HBM
as int8/uint8 with static calib scales and dequantized on read, compute
staying in the engine dtype. The bandwidth tool for HBM-roofline stages
(docs/mfu_ceiling.md); reference semantics analog: per-node quantization
injection (ref test/rtc/quantize.cucl, rtc_fwd.cc:212)."""

import numpy as np
import pytest

from boda_tpu.cli import main
from boda_tpu.config import ConfigError, make
from boda_tpu.models.zoo import build_model
from boda_tpu.ops.kernels.gen_data import gen_data_pattern
from boda_tpu.utils.dims import NDA


TRUNK = ["relu1", "s1b?_relu", "s2b?_relu", "s3b?_relu"]


@pytest.fixture(scope="module")
def calib_fn(tmp_path_factory):
    fn = str(tmp_path_factory.mktemp("calib") / "mini.calib.json")
    rc = main(["net_calib", "--model=mini_resnet", "--img=4", "--batches=3",
               f"--out-fn={fn}"])
    assert rc == 0
    return fn


def _run(model, img, out=("prob",), x=None, **kw):
    pipe, in_dims = build_model(model, img=img)
    eng = make("conv_fwd", "pallas", **kw)
    eng.init(pipe)
    d = in_dims["data"]
    if x is None:
        x = NDA(d, np.asarray(gen_data_pattern(d.shape, d.tn)))
    outs = eng.run_fwd({"data": x}, list(out))
    return outs, eng


def test_act_int8_top1_and_prob(calib_fn):
    ref, _ = _run("mini_resnet", 4)
    q, eng = _run("mini_resnet", 4, act_int8=TRUNK, calib_fn=calib_fn)
    sel = [l for l in eng._info_log if l.startswith("act_int8 ")]
    assert len(sel) >= 7, sel  # relu1 + 6 block trunk nodes
    # ReLU-fed trunk nodes are provably non-negative -> uint8 storage
    assert all("uint8" in l for l in sel), sel
    rp, qp = ref["prob"].data, q["prob"].data
    assert (rp.argmax(1) == qp.argmax(1)).all()
    assert float(np.abs(rp - qp).max()) < 0.05


def test_act_int8_node_output_is_dequantized(calib_fn):
    """Requesting a quantized node as an output returns the DEQUANTIZED
    float value (logical dtype), within half a quantization step of the
    unquantized engine per element."""
    ref, _ = _run("mini_resnet", 2, out=("s1b0_relu",))
    q, eng = _run("mini_resnet", 2, out=("s1b0_relu",),
                  act_int8=["s1b0_relu"], calib_fn=calib_fn)
    rv, qv = ref["s1b0_relu"].data, q["s1b0_relu"].data
    assert qv.dtype == rv.dtype
    scale = next(s for n, (_u, s) in eng._act_q.items() if n == "s1b0_relu")
    assert float(np.abs(rv - qv).max()) <= 0.5001 * scale + 1e-6


def test_act_int8_feed_quantized_node_as_input(calib_fn):
    """Mid-graph runs FEEDING a quantized node stay exact: a float input
    passes through _qload untouched."""
    full, _ = _run("mini_resnet", 2, out=("s1b0_relu", "prob"),
                   act_int8=["s1b0_relu"], calib_fn=calib_fn)
    pipe, in_dims = build_model("mini_resnet", img=2)
    eng = make("conv_fwd", "pallas", act_int8=["s1b0_relu"],
               calib_fn=calib_fn)
    eng.init(pipe)
    out2 = eng.run_fwd({"s1b0_relu": full["s1b0_relu"]}, ["prob"])
    assert np.allclose(out2["prob"].data, full["prob"].data, atol=2e-5)


def test_act_int8_requires_calib():
    with pytest.raises(ConfigError, match="calib"):
        _run("mini_resnet", 2, act_int8=["relu1"])


def test_act_int8_bad_pattern_errors(calib_fn):
    with pytest.raises(ConfigError, match="matches no activation node"):
        _run("mini_resnet", 2, act_int8=["no_such_node*"], calib_fn=calib_fn)


def test_act_int8_missing_calib_entry(tmp_path, calib_fn):
    import json
    rec = json.load(open(calib_fn))
    crippled = str(tmp_path / "crippled.json")
    rec["amax"].pop("relu1", None)
    json.dump(rec, open(crippled, "w"))
    with pytest.raises(ConfigError, match="no amax for"):
        _run("mini_resnet", 2, act_int8=["relu1"], calib_fn=crippled)


def test_act_int8_train_rejected(calib_fn):
    with pytest.raises(ConfigError, match="inference-only"):
        _run("mini_resnet", 2, act_int8=["relu1"], calib_fn=calib_fn,
             train="1")


def test_act_int8_batch_split_interaction(calib_fn):
    """A batch-split region spanning quantized nodes still applies and
    matches the unsplit quantized engine exactly (same rounding)."""
    q1, _ = _run("mini_resnet", 4, act_int8=TRUNK, calib_fn=calib_fn)
    q2, eng = _run("mini_resnet", 4, act_int8=TRUNK, calib_fn=calib_fn,
                   batch_split=["relu1:s2b1_relu:2"])
    assert eng._bs_applied == [("relu1", "s2b1_relu")]
    assert np.allclose(q1["prob"].data, q2["prob"].data, atol=1e-6)


def test_act_int8_changes_fingerprint(calib_fn):
    pipe, _ = build_model("mini_resnet", img=2)
    a = make("conv_fwd", "pallas")
    b = make("conv_fwd", "pallas", act_int8=["relu1"], calib_fn=calib_fn)
    a.init(pipe)
    b.init(pipe)
    assert a.fusion_fingerprint() != b.fusion_fingerprint()


def test_act_int8_direct_feed_into_int8_conv(calib_fn):
    """Engine-wide int8 + act_int8: stored nodes switch to SIGNED int8 and
    conv consumers read the stored value straight into the int8 dot
    (q8_input_ok) -- no per-conv re-quantize, no dequant on that edge.
    Accuracy stays within the quantization gates."""
    ref, _ = _run("mini_resnet", 4)
    q, eng = _run("mini_resnet", 4, act_int8=TRUNK, calib_fn=calib_fn,
                  int8="1")
    sel = [l for l in eng._info_log if l.startswith("act_int8 ")]
    # non-negative trunk nodes store SIGNED under engine int8
    assert sel and all("signed for direct int8-conv feed" in l for l in sel), sel
    # the direct feed engaged on conv consumers of stored nodes
    assert eng._q8_direct, "no conv consumed the int8 storage directly"
    rp, qp = ref["prob"].data, q["prob"].data
    assert (rp.argmax(1) == qp.argmax(1)).all()
    assert float(np.abs(rp - qp).max()) < 0.06
