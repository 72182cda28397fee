"""Native C++ data-path tests (auto-built libboda_native.so)."""

import io

import numpy as np
import pytest

from boda_tpu.utils.native import native_available

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native lib unavailable")

IMGS = "/root/repo/testdata/images"


def test_jpeg_decode_matches_pil():
    from PIL import Image

    from boda_tpu.utils.native import jpeg_decode
    data = open(f"{IMGS}/test2.jpg", "rb").read()
    img = jpeg_decode(data)
    ref = np.asarray(Image.open(io.BytesIO(data)).convert("RGBA"))
    assert img.shape == ref.shape
    assert np.array_equal(img, ref)  # same libjpeg under the hood -> bit-exact


def test_jpeg_decode_error():
    from boda_tpu.utils.native import jpeg_decode
    with pytest.raises(ValueError, match="jpeg decode failed"):
        jpeg_decode(b"definitely not a jpeg")


def test_resize_and_preproc_match_reference():
    from boda_tpu.apps.preproc import img_to_batch_np
    from boda_tpu.utils.native import resize_bilinear, rgba_to_nchw_bgr
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (37, 53, 4), np.uint8)
    out = resize_bilinear(img, 21, 33)
    assert out.shape == (21, 33, 4)
    # corners are exact samples under align-corners bilinear
    assert np.array_equal(out[0, 0], img[0, 0])
    assert np.array_equal(out[-1, -1], img[-1, -1])
    batch = img[None]
    got = rgba_to_nchw_bgr(batch, scale=0.5)
    ref = img_to_batch_np(batch, scale=0.5)
    assert np.allclose(got, ref)


def test_f32_stats():
    from boda_tpu.utils.native import f32_stats
    rng = np.random.RandomState(1)
    v = rng.randn(10000).astype(np.float32)
    mn, mx, s, sq = f32_stats(v)
    assert mn == pytest.approx(float(v.min()))
    assert mx == pytest.approx(float(v.max()))
    assert s == pytest.approx(float(v.sum(dtype=np.float64)), rel=1e-9)
    assert sq == pytest.approx(float((v.astype(np.float64) ** 2).sum()), rel=1e-9)


def test_batch_loader():
    from boda_tpu.utils.native import BatchLoader
    paths = [f"{IMGS}/test2.jpg"] * 7
    seen = set()
    with BatchLoader(paths, batch=2, y=48, x=48, n_threads=3) as L:
        while True:
            r = L.next()
            if r is None:
                break
            bi, data = r
            assert data.shape == (2, 48, 48, 4)
            assert data.sum() > 0
            seen.add(bi)
    assert seen == {0, 1, 2, 3}  # ceil(7/2) batches, all delivered


def test_batch_loader_error():
    from boda_tpu.utils.native import BatchLoader
    with BatchLoader(["/no/such/file.jpg"], batch=1, y=8, x=8) as L:
        with pytest.raises(RuntimeError, match="failed to load"):
            L.next()
