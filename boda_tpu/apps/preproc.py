"""Image -> net-input preprocessing, fused on-device.

Parity target: ``subtract_mean_and_copy_img_to_batch`` (ref src/caffeif.H:13):
the canonical RGBA-image -> NCHW-float-batch transform (channel reorder to
BGR, mean subtract, optional scale). TPU-first: expressed as a jax transform
so it fuses into the same XLA program as the net (uint8 H2D transfer, on-device
convert — 4x less PCIe/ICI traffic than host-side float conversion).
"""

from __future__ import annotations

import numpy as np

# Caffe ImageNet channel means, BGR order (ref caffeif.cc u32_rgba_inmc usage)
IMAGENET_MEAN_BGR = (104.0, 117.0, 123.0)


def img_to_batch_jax(rgba_u8, mean_bgr=IMAGENET_MEAN_BGR, scale: float = 1.0,
                     out_dtype=None, layout: str = "nchw"):
    """(img, y, x, 4) uint8 RGBA -> mean-subtracted BGR float batch.
    Jax-traceable; runs on device under jit. layout='nchw' emits the logical
    (img, 3, y, x) batch; layout='nhwc' emits (img, y, x, 3) — the NHWC
    engine's native ingestion layout, skipping the device-side relayout
    entirely (the C=3-minor NCHW<->NHWC transpose is a pathologically slow
    TPU relayout; see scripts/exp_native_ab.py)."""
    import jax.numpy as jnp
    out_dtype = out_dtype or jnp.float32
    x = rgba_u8.astype(jnp.float32)
    if layout == "nhwc":
        bgr = x[..., 2::-1]                                  # RGBA -> BGR
        mean = jnp.asarray(mean_bgr, jnp.float32).reshape(1, 1, 1, 3)
    else:
        bgr = jnp.stack([x[..., 2], x[..., 1], x[..., 0]], axis=1)  # (img,3,y,x)
        mean = jnp.asarray(mean_bgr, dtype=jnp.float32).reshape(1, 3, 1, 1)
    return ((bgr - mean) * scale).astype(out_dtype)


def img_to_batch_np(rgba_u8: np.ndarray, mean_bgr=IMAGENET_MEAN_BGR,
                    scale: float = 1.0) -> np.ndarray:
    """Host reference of the same transform (for tests/oracles)."""
    x = rgba_u8.astype(np.float32)
    bgr = np.stack([x[..., 2], x[..., 1], x[..., 0]], axis=1)
    mean = np.asarray(mean_bgr, np.float32).reshape(1, 3, 1, 1)
    return (bgr - mean) * scale


def center_crop(img_data: np.ndarray, y: int, x: int) -> np.ndarray:
    """Center-crop (y0,x0) so output is (y, x, C)."""
    iy, ix = img_data.shape[:2]
    if iy < y or ix < x:
        raise ValueError(f"crop {y}x{x} larger than image {iy}x{ix}")
    y0 = (iy - y) // 2
    x0 = (ix - x) // 2
    return img_data[y0:y0 + y, x0:x0 + x]
