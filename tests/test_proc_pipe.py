"""Multi-process pipeline (cs_disp / proc_ipc / display_ipc) tests."""

import numpy as np

import boda_tpu.modes_all  # noqa: F401
from boda_tpu.cli import main
from boda_tpu.modes.proc_pipe import _luma, row_luma_sort
from boda_tpu.utils.img_io import Img


def test_row_luma_sort_properties():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (7, 13, 4), dtype=np.uint8)
    out = row_luma_sort(img)
    y = _luma(out)
    assert (np.diff(y.astype(np.int64), axis=1) <= 0).all()  # descending
    for r in range(img.shape[0]):  # per-row pixel multiset preserved
        a = {tuple(p) for p in img[r]}
        b = {tuple(p) for p in out[r]}
        assert a == b


def test_cs_disp_three_process_pipeline(tmp_path):
    rc = main(["cs_disp",
               "--src=(stream=img-dir-src,dir=testdata/images,glob=test)",
               f"--boda_output_dir={tmp_path}"])
    assert rc == 0
    outs = sorted(p.name for p in tmp_path.iterdir())
    assert outs == ["frame_0000.png", "frame_0001.png"]
    # the written frame is exactly the deterministic converged luma sort
    src = Img.load("testdata/images/test1.png").data
    got = Img.load(str(tmp_path / "frame_0000.png")).data
    np.testing.assert_array_equal(got, row_luma_sort(src))
