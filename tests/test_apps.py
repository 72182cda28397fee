"""App-layer tests: img_io, preprocessing, pyramid packing, scoring, modes."""

import numpy as np
import pytest

import boda_tpu.modes_all  # noqa: F401
from boda_tpu.apps.preproc import img_to_batch_np
from boda_tpu.apps.pyramid import (Placement, blf_pack, img_pyra_pack,
                                   pyra_sizes)
from boda_tpu.apps.scoring import (Box, Det, GtBox, load_dets_file,
                                   load_gt_file, score_all, score_class)
from boda_tpu.cli import main
from boda_tpu.utils.img_io import Img, ImgError

IMGS = "/root/repo/testdata/images"


# -- img_io ----------------------------------------------------------------------

def test_img_load_save_resize(tmp_path):
    im = Img.load(f"{IMGS}/test1.png")
    assert im.sz == (320, 480)
    im2 = Img.load(f"{IMGS}/test2.jpg")
    assert im2.sz == (320, 480)
    small = im.resize(80, 120)
    assert small.sz == (80, 120)
    fn = str(tmp_path / "out.png")
    small.save(fn)
    back = Img.load(fn)
    assert np.array_equal(back.data, small.data)
    up = small.upsample_2x()
    assert up.sz == (160, 240)


def test_img_errors():
    with pytest.raises(ImgError, match="not found"):
        Img.load("/no/such/file.png")
    with pytest.raises(ImgError, match="failed to load"):
        Img.load(f"{IMGS}/invalid.jpg")
    with pytest.raises(ImgError, match="want .y,x,4. uint8"):
        Img(np.zeros((4, 4, 3), np.uint8))


def test_preproc():
    rgba = np.zeros((1, 2, 2, 4), np.uint8)
    rgba[0, :, :, 0] = 200  # R
    rgba[0, :, :, 2] = 50   # B
    out = img_to_batch_np(rgba)
    assert out.shape == (1, 3, 2, 2)
    assert np.allclose(out[0, 0], 50 - 104.0)   # B channel first
    assert np.allclose(out[0, 2], 200 - 123.0)  # R channel last


# -- pyramid ---------------------------------------------------------------------

def test_pyra_sizes():
    sz = pyra_sizes((256, 256), interval=2, min_sz=32)
    assert sz[0] == (256, 256)
    assert sz[1] == (181, 181)  # 2^-0.5
    assert all(s[0] >= 32 for s in sz)
    # strictly decreasing
    assert all(a[0] > b[0] for a, b in zip(sz, sz[1:]))


def test_blf_pack_fits_and_no_overlap():
    sizes = [(100, 200), (100, 100), (50, 50), (50, 50), (25, 25)]
    pl = blf_pack(sizes, (128, 256))
    assert len(pl) == len(sizes)
    # no overlaps within each plane
    by_plane = {}
    for p in pl:
        by_plane.setdefault(p.plane, []).append(p)
    for plist in by_plane.values():
        for i, a in enumerate(plist):
            for b in plist[i + 1:]:
                no = (a.y + a.sz[0] <= b.y or b.y + b.sz[0] <= a.y or
                      a.x + a.sz[1] <= b.x or b.x + b.sz[1] <= a.x)
                assert no, f"overlap {a} {b}"
    with pytest.raises(ValueError, match="exceeds"):
        blf_pack([(300, 300)], (128, 256))


def test_img_pyra_pack():
    im = Img.load(f"{IMGS}/test1.png")
    pack = img_pyra_pack(im, (256, 256), interval=2, min_sz=64)
    assert pack.planes.dtype == np.uint8
    assert pack.planes.shape[1:] == (256, 256, 4)
    assert len(pack.placements) == len(pack.sizes) >= 3


# -- scoring ----------------------------------------------------------------------

def test_iou_and_ap_perfect():
    gt = {"img1": [GtBox(Box(0, 0, 10, 10))], "img2": [GtBox(Box(5, 5, 15, 15))]}
    dets = [Det("img1", 0.9, Box(0, 0, 10, 10)),
            Det("img2", 0.8, Box(5, 5, 15, 15))]
    r = score_class(dets, gt)
    assert r.ap == pytest.approx(1.0)
    # one false positive lowers AP
    dets.append(Det("img1", 0.95, Box(50, 50, 60, 60)))
    r2 = score_class(dets, gt)
    assert r2.ap < 1.0


def test_score_mode(tmp_path, capsys):
    dets = tmp_path / "dets.txt"
    gt = tmp_path / "gt.txt"
    dets.write_text("img1 cat 0.9 0 0 10 10\nimg1 dog 0.8 20 20 30 30\n"
                    "img2 cat 0.7 5 5 15 15\n")
    gt.write_text("img1 cat 0 0 10 10\nimg1 dog 20 20 30 30\n"
                  "img2 cat 5 5 15 15\nimg2 dog 1 1 9 9\n")
    rc = main(["score", f"--dets-fn={dets}", f"--gt-fn={gt}",
               f"--boda-output-dir={tmp_path}"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "class cat" in out and "AP=1.0000" in out
    assert "mAP=0.7500" in out  # dog: 1 of 2 gt found


def test_load_pil_mode(tmp_path, capsys):
    ann = tmp_path / "ann"
    ann.mkdir()
    (ann / "im1.xml").write_text("""<annotation>
      <object><name>cat</name><difficult>0</difficult>
        <bndbox><xmin>1</xmin><ymin>2</ymin><xmax>30</xmax><ymax>40</ymax></bndbox>
      </object>
      <object><name>dog</name><difficult>1</difficult>
        <bndbox><xmin>5</xmin><ymin>5</ymin><xmax>25</xmax><ymax>25</ymax></bndbox>
      </object></annotation>""")
    lst = tmp_path / "ids.txt"
    lst.write_text("im1\n")
    rc = main(["load_pil", f"--ann-dir={ann}", f"--img-list-fn={lst}",
               f"--boda-output-dir={tmp_path}"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "cat: 1" in out and "1 images, 2 objects" in out


# -- app modes over nets ------------------------------------------------------------

def test_cnet_predict_mode(tmp_path, capsys):
    rc = main(["cnet_predict", "--model=mini_resnet", "--in-sz=32",
               f"--img-fns=(a={IMGS}/test1.png,b={IMGS}/test2.jpg)",
               f"--boda-output-dir={tmp_path}"])
    assert rc == 0
    out = capsys.readouterr().out
    assert '"img": "test1.png"' in out and '"top"' in out


def test_conv_pyra_mode(tmp_path, capsys):
    rc = main(["conv_pyra", "--model=mini_resnet", f"--img-fn={IMGS}/test1.png",
               "--out-node-name=relu1", "--plane-sz=128", "--min-sz=48",
               f"--boda-output-dir={tmp_path}"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "support_stride" in out and "scale 0" in out


def test_test_dense_mode(tmp_path):
    rc = main(["test_dense", "--model=mini_resnet", "--out-node-name=relu1",
               "--big-sz=48", "--win-sz=24", f"--boda-output-dir={tmp_path}"])
    assert rc == 0


def test_img_pyra_pack_mode(tmp_path, capsys):
    rc = main(["img_pyra_pack", f"--img-fn={IMGS}/test1.png", "--plane-y=256",
               "--plane-x=256", "--min-sz=64", "--write-planes=1",
               f"--boda-output-dir={tmp_path}"])
    assert rc == 0
    assert "scales into" in capsys.readouterr().out
    import os
    assert any(f.startswith("plane_") for f in os.listdir(tmp_path))


def test_cnet_predict_upsamp(tmp_path, capsys):
    rc = main(["cnet_predict", "--model=mini_resnet", "--in-sz=32",
               "--enable-upsamp-net=1", f"--img-fns=(a={IMGS}/test1.png)",
               f"--boda-output-dir={tmp_path}"])
    assert rc == 0
    assert '"top"' in capsys.readouterr().out


def test_plot_modes(tmp_path):
    rc = main(["roofline_plot", "--model=mini_resnet", "--img=2",
               f"--boda-output-dir={tmp_path}"])
    assert rc == 0
    assert (tmp_path / "roofline.png").exists()
    from boda_tpu.prof.wisdom import OpRun, OpWisdom, write_wisdom
    from boda_tpu.ops.op_base import Op
    w = OpWisdom(Op.parse("(type=sgemm,a=(M=8,K=8),b=(K=8,N=8),c=(M=8,N=8))"))
    w.runs.append(OpRun("()", "p", 1e-4))
    w.runs.append(OpRun("(bm=8)", "p", 2e-4))
    write_wisdom(str(tmp_path / "w.wis"), [w])
    rc = main(["wis_plot", f"--wisdom-fn={tmp_path}/w.wis",
               f"--boda-output-dir={tmp_path}"])
    assert rc == 0
    assert (tmp_path / "wisdom.png").exists()


def test_weights_fallback(tmp_path):
    # ':'-separated weights list: first existing wins; none -> clean error
    rc = main(["run_cnet", "--ptt-fn=/root/repo/testdata/nets/tinynet.prototxt",
               "--weights-fn=/no/a:/no/b", f"--boda-output-dir={tmp_path}"])
    assert rc == 1


def test_predict_dense_mode(tmp_path, capsys):
    rc = main(["predict_dense", "--model=mini_resnet",
               f"--img-fn={IMGS}/test1.png", "--plane-sz=128", "--min-sz=48",
               "--write-heatmap=hm", f"--boda-output-dir={tmp_path}"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "fc_to_conv converted ['fc']" in out and "scale 0" in out
    import os
    assert any(f.startswith("hm_") for f in os.listdir(tmp_path))


def test_score_files_mode(tmp_path, capsys):
    """score_files: per-class VOC results files + all-classes summary
    (ref results_io.cc:470 score_results_files_t)."""
    (tmp_path / "cat_test.txt").write_text(
        "im0 0.9 10 10 50 50\nim1 0.3 0 0 20 20\n")
    (tmp_path / "dog_test.txt").write_text("im0 0.8 60 60 90 90\n")
    gt = tmp_path / "gt.txt"
    gt.write_text("im0 cat 10 10 50 50\nim0 dog 60 60 90 90\n"
                  "im1 cat 100 100 120 120\n")
    rc = main(["score_files", f"--res-fn={tmp_path}/%s_test.txt",
               "--classes=(a=cat,b=dog)", f"--gt-fn={gt}",
               f"--boda-output-dir={tmp_path}"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "class cat" in out and "class dog" in out
    assert "mAP=0.75" in out  # cat AP=0.5 (1 of 2 gt found), dog AP=1.0
    assert (tmp_path / "summary.txt").read_text().strip().endswith(
        "mAP=0.7500 over 2 classes")
    # classes filter: gt classes outside the requested set add no rows
    rc = main(["score_files", f"--res-fn={tmp_path}/%s_test.txt",
               "--classes=(a=cat)", f"--gt-fn={gt}",
               f"--boda-output-dir={tmp_path}"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "dog" not in out and "mAP=0.5000 over 1 classes" in out


def test_compsup_mode(capsys):
    rc = main(["compsup"])
    assert rc == 0
    modes = capsys.readouterr().out.split()
    assert "run_cnet" in modes and "score_files" in modes
    rc = main(["compsup", "--arg=noop"])
    assert rc == 0
    assert "--msg=" in capsys.readouterr().out
