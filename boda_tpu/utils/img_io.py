"""Image type + IO + high-quality resampling.

Parity target: ``img_t`` (ref src/img_io.H:18 — RGBA row-aligned images,
turbojpeg/lodepng loaders, high-quality downsampling tested against Octave).
Here: numpy (y, x, 4) uint8 RGBA; PIL plays the jpeg/png codec role; LANCZOS
is the high-quality downsample filter (the reference's filtered downsample).
"""

from __future__ import annotations

import os

import numpy as np


class ImgError(ValueError):
    pass


class Img:
    """RGBA uint8 image: data shape (y, x, 4)."""

    __slots__ = ("data",)

    def __init__(self, data: np.ndarray):
        data = np.asarray(data)
        if data.ndim != 3 or data.shape[2] != 4 or data.dtype != np.uint8:
            raise ImgError(f"Img: want (y,x,4) uint8, got {data.shape} {data.dtype}")
        self.data = data

    @property
    def sz(self) -> tuple[int, int]:  # (y, x)
        return self.data.shape[0], self.data.shape[1]

    @staticmethod
    def zeros(y: int, x: int, fill: int = 0) -> "Img":
        d = np.full((y, x, 4), fill, dtype=np.uint8)
        d[:, :, 3] = 255
        return Img(d)

    @staticmethod
    def from_rgb(rgb: np.ndarray) -> "Img":
        rgb = np.asarray(rgb, dtype=np.uint8)
        a = np.full(rgb.shape[:2] + (1,), 255, np.uint8)
        return Img(np.concatenate([rgb, a], axis=2))

    def rgb(self) -> np.ndarray:
        return self.data[:, :, :3]

    # -- codec io ---------------------------------------------------------------
    @staticmethod
    def load(fn: str) -> "Img":
        if not os.path.exists(fn):
            raise ImgError(f"image file not found: {fn!r}")
        try:
            from PIL import Image
            with Image.open(fn) as im:
                return Img(np.asarray(im.convert("RGBA")))
        except ImgError:
            raise
        except Exception as e:
            raise ImgError(f"failed to load image {fn!r}: {e}") from None

    @staticmethod
    def from_bytes(data: bytes, what: str = "image") -> "Img":
        """Decode an in-memory encoded image (e.g. an MJPEG AVI chunk)."""
        import io
        try:
            from PIL import Image
            with Image.open(io.BytesIO(data)) as im:
                return Img(np.asarray(im.convert("RGBA")))
        except Exception as e:
            raise ImgError(f"failed to decode {what}: {e}") from None

    def save(self, fn: str) -> None:
        from PIL import Image
        Image.fromarray(self.data, "RGBA").save(fn)

    # -- resampling ----------------------------------------------------------------
    def resize(self, y: int, x: int) -> "Img":
        """High-quality resample (LANCZOS; ref downsample path img_io.H:88)."""
        from PIL import Image
        im = Image.fromarray(self.data, "RGBA").resize((x, y), Image.LANCZOS)
        return Img(np.asarray(im))

    def upsample_2x(self) -> "Img":
        y, x = self.sz
        return self.resize(y * 2, x * 2)

    def crop(self, y0: int, x0: int, y1: int, x1: int) -> "Img":
        return Img(np.ascontiguousarray(self.data[y0:y1, x0:x1]))

    def paste(self, other: "Img", y: int, x: int) -> None:
        oy, ox = other.sz
        self.data[y:y + oy, x:x + ox] = other.data
