"""cnet_detect end-to-end: detection prototxt -> forward -> dets file ->
VOC scoring (ref: the rrc deploy + results_io score flow)."""

import numpy as np

from boda_tpu.cli import main

PTT = "testdata/nets/tinyssd.prototxt"


def _read_dets(fn):
    out = []
    with open(fn) as f:
        for line in f:
            if line.startswith("#") or not line.strip():
                continue
            p = line.split()
            out.append((p[0], p[1], float(p[2]), [float(v) for v in p[3:]]))
    return out


def test_detect_writes_and_scores(tmp_path, capsys):
    rc = main(["cnet_detect", f"--ptt-fn={PTT}", "--conf-thresh=0.3",
               f"--boda-output-dir={tmp_path}"])
    assert rc == 0
    dets = _read_dets(tmp_path / "dets.txt")
    assert dets, "expected at least one detection"
    assert all(d[1] == "cls1" and 0.3 <= d[2] <= 1.0 for d in dets)
    # round-trip through the scorer: gt derived from the dets scores mAP=1
    gt = tmp_path / "gt.txt"
    with open(gt, "w") as f:
        for img_id, cls, _sc, box in dets:
            f.write(f"{img_id} {cls} {' '.join(str(v) for v in box)}\n")
    rc = main(["cnet_detect", f"--ptt-fn={PTT}", "--conf-thresh=0.3",
               f"--gt-fn={gt}", f"--boda-output-dir={tmp_path}"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "mAP=1.0000" in out


def test_detect_engines_agree(tmp_path):
    """xla vs pallas(NHWC) engines must produce the same detections."""
    for eng, sub in (("(mode=xla)", "a"), ("(mode=pallas)", "b")):
        d = tmp_path / sub
        d.mkdir()
        rc = main(["cnet_detect", f"--ptt-fn={PTT}", "--conf-thresh=0.3",
                   f"--conv-fwd={eng}", f"--boda-output-dir={d}"])
        assert rc == 0
    da = _read_dets(tmp_path / "a" / "dets.txt")
    db = _read_dets(tmp_path / "b" / "dets.txt")
    assert len(da) == len(db)
    for (ia, ca, sa, ba), (ib, cb, sb, bb) in zip(da, db):
        assert (ia, ca) == (ib, cb)
        assert abs(sa - sb) < 1e-3
        assert np.allclose(ba, bb, atol=0.15)


def test_detect_class_names_and_image(tmp_path):
    rc = main(["cnet_detect", f"--ptt-fn={PTT}", "--conf-thresh=0.3",
               "--cls-names=bg:car", "--img-fn=testdata/images/test1.png",
               f"--boda-output-dir={tmp_path}"])
    assert rc == 0
    dets = _read_dets(tmp_path / "dets.txt")
    assert dets and all(d[0] == "test1" and d[1] == "car" for d in dets)


def test_ssd300_zoo_build_and_fwd():
    """The full-scale detection net (BASELINE config 5): canonical SSD300
    geometry (8732 priors over 38/19/10/5/3/1 grids, 4/6/6/6/4/4 priors
    per location, dilated fc6) and a real forward producing decoded+NMS'd
    detections identical across engines."""
    from boda_tpu.config import make
    from boda_tpu.models.zoo import build_model
    from boda_tpu.ops.kernels.gen_data import gen_data_pattern
    from boda_tpu.utils.dims import NDA
    pipe, in_dims = build_model("ssd300", img=1)
    nd = pipe.nodes
    assert nd["conv4_3"].dims["y"] == 38 and nd["fc7"].dims["y"] == 19
    assert nd["conv9_2"].dims["y"] == 1
    assert nd["mbox_priorbox"].dims["pbox"] == 8732 * 4
    assert nd["mbox_loc"].dims["chan"] == 8732 * 4
    assert tuple(nd["detection_out"].dims.shape) == (1, 1, 200, 7)
    assert pipe.ops["fc6"].dilation() == (6, 6)
    d = in_dims["data"]
    x = NDA(d, np.asarray(gen_data_pattern(d.shape, d.tn)))
    outs = {}
    for mode in ("xla", "pallas"):
        eng = make("conv_fwd", mode)
        eng.init(pipe)
        outs[mode] = eng.run_fwd({"data": x},
                                 ["detection_out"])["detection_out"].data
    a, b = outs["xla"][0, 0], outs["pallas"][0, 0]
    assert np.isfinite(a).all()
    assert (a[:, 2] >= 0).all() and (a[:, 2] <= 1).all()  # scores
    # cross-engine agreement on class ids + scores of the kept detections
    assert np.array_equal(a[:, 1], b[:, 1])
    assert np.allclose(a[:, 2], b[:, 2], atol=1e-3)
    assert np.allclose(a[:, 3:], b[:, 3:], atol=1e-3)
