"""int8 MXU inference path: dynamic symmetric quantization of conv/fc.

The TPU-native transcend of the reference's fixed-point quantization
experiments (ref doc/quant-notes.txt, test/rtc/quantize.cucl,
gen_op_quantize rtc_fwd.cc:212): instead of emulating bit-drop in f32,
run the conv/fc compute in real int8 with int32 accumulation.
Accuracy gates: classification agreement with the f32 engine."""

import numpy as np
import pytest

from boda_tpu.cli import main
from boda_tpu.config import make
from boda_tpu.models.zoo import build_model
from boda_tpu.ops.kernels.gen_data import gen_data_pattern
from boda_tpu.utils.dims import NDA


def _run_engine(model, img, **kw):
    pipe, in_dims = build_model(model, img=img)
    eng = make("conv_fwd", "pallas", **kw)
    eng.init(pipe)
    d = in_dims["data"]
    x = NDA(d, np.asarray(gen_data_pattern(d.shape, d.tn)))
    out = eng.run_fwd({"data": x}, ["prob"])["prob"].data
    return out, eng


def test_int8_top1_agreement_mini():
    ref, _ = _run_engine("mini_resnet", 4)
    q, eng = _run_engine("mini_resnet", 4, int8="1")
    sel = [l for l in eng._info_log if "int8_conv" in l or "int8" in l]
    assert sel, "int8 path not selected"
    assert (ref.argmax(1) == q.argmax(1)).all()
    assert float(np.abs(ref - q).max()) < 0.05  # prob-space quant error


def test_int8_fc_path():
    """alexnet-style net exercises the int8 InnerProduct branch too."""
    ref, _ = _run_engine("firenet", 2)
    q, eng = _run_engine("firenet", 2, int8="1")
    assert (ref.argmax(1) == q.argmax(1)).all()


def test_int8_per_op_override():
    """per_op_tune can opt a layer back out of int8."""
    from boda_tpu.utils.lexp import parse_lexp
    q, eng = _run_engine("mini_resnet", 2, int8="1",
                         per_op_tune={"conv1": parse_lexp("(int8=0)")})
    sel = "\n".join(eng._info_log)
    assert "conv1: nhwc-int8_conv" not in sel
    assert "nhwc-int8_conv" in sel  # others still quantized


def test_int8_accuracy_gate_lmdb(tmp_path, capsys):
    """test_lmdb top-1/top-5 must agree between f32 and int8 engines
    (the accuracy-gate flow of ref's ImageNet-val loop on the committed
    record fixture)."""
    outs = {}
    for tag, eng in (("f32", "(mode=pallas)"), ("int8", "(mode=pallas,int8=1)")):
        rc = main(["test_lmdb", "--rec-fn=testdata/lmdb/cifar_mini.rec",
                   "--model=mini_resnet", "--img=4", f"--conv-fwd={eng}",
                   f"--boda-output-dir={tmp_path}"])
        assert rc == 0
        outs[tag] = [ln for ln in capsys.readouterr().out.splitlines()
                     if "top1" in ln]
    assert outs["f32"] == outs["int8"] and outs["f32"]


def test_static_calibration_roundtrip(tmp_path):
    """net_calib -> calib_fn engine: static scales replace runtime amax;
    prob output stays within the quantization tolerance of f32."""
    calib_fn = str(tmp_path / "mini.calib.json")
    main(["net_calib", "--model=mini_resnet", "--img=4", "--batches=3",
          f"--out-fn={calib_fn}"])
    from boda_tpu.prof.calib import read_calib
    amax = read_calib(calib_fn)
    assert "data" in amax and amax["data"] > 0
    ref, _ = _run_engine("mini_resnet", 4)
    q, eng = _run_engine("mini_resnet", 4, int8="1", calib_fn=calib_fn)
    logs = [l for l in eng._info_log if "static_amax" in l]
    assert logs, "static calibration scales not applied"
    assert (ref.argmax(1) == q.argmax(1)).all()
    # static scales are coarser than per-batch dynamic amax (calibrated on
    # other batches, bf16 stats) — top-1 parity with a looser prob bound
    assert float(np.abs(ref - q).max()) < 0.1


def test_static_calibration_saturates_outliers(tmp_path):
    """Acts beyond the calibrated range clip at +-127 instead of wrapping."""
    import json
    calib_fn = str(tmp_path / "tiny.calib.json")
    main(["net_calib", "--model=mini_resnet", "--img=4", "--batches=2",
          f"--out-fn={calib_fn}"])
    rec = json.load(open(calib_fn))
    rec["amax"] = {k: v * 0.25 for k, v in rec["amax"].items()}  # force clipping
    json.dump(rec, open(calib_fn, "w"))
    q, eng = _run_engine("mini_resnet", 4, int8="1", calib_fn=calib_fn)
    assert np.isfinite(q).all()
    assert float(q.max()) <= 1.0 + 1e-6  # still a valid prob head


def test_int8_with_s2d_folded_stem():
    """Engine-wide int8 + input_s2d: the s2d-folded stem must fall through
    to the stem_s2d rule (bf16), NOT the int8 branch — the int8 lowering
    consumes logical geometry while the input arrives host-folded
    (regression: int8+s2d bench crashed with a 12-vs-3 channel mismatch)."""
    from test_input_s2d import _fold_nda, stem_net

    pipe, in_dims = stem_net()
    rng = np.random.RandomState(7)
    x = rng.randn(*in_dims["data"].shape).astype(np.float32)

    p0, _ = stem_net()
    e0 = make("conv_fwd", "pallas")
    e0.init(p0)
    ref = e0.run_fwd({"data": NDA(in_dims["data"], x)}, ["prob"])["prob"].data

    p1, _ = stem_net()
    e1 = make("conv_fwd", "pallas", int8="1", input_s2d=True)
    e1.init(p1)
    log = str(e1.get_info_log())
    assert "conv1: nhwc-stem_s2d" in log, log      # stem NOT claimed by int8
    assert "conv2: nhwc-int8_conv" in log, log     # rest still quantized
    got = e1.run_fwd({"data": _fold_nda(e1, in_dims, x)},
                     ["prob"])["prob"].data
    assert (ref.argmax(1) == got.argmax(1)).all()
    assert float(np.abs(ref - got).max()) < 0.05
