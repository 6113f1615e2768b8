"""Image-plane ops for the feature pipeline: grayscale, separable Gaussian
blur, bilinear pyramid resize, and batched patch extraction.

These replace the OpenCV calls in the reference's ORBextractor
(cvtColor Tracking.cc:96-109, cv::resize ComputePyramid ORBextractor.cc:971,
GaussianBlur ORBextractor.cc:898) with XLA-fusable jnp code. Convolutions
lower onto the MXU; everything operates on float32 [H, W] images.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def rgb_to_gray(img: jnp.ndarray) -> jnp.ndarray:
    """[H, W, 3] (RGB, any float/int dtype) -> [H, W] float32 luminance.

    Uses the same BT.601 weights as cv::cvtColor(BGR2GRAY)'s RGB ordering,
    matching the reference's grayscale conversion (Tracking.cc:96-109).
    """
    img = img.astype(jnp.float32)
    if img.ndim == 2:
        return img
    w = jnp.array([0.299, 0.587, 0.114], dtype=jnp.float32)
    return img @ w


def _gaussian_kernel(ksize: int, sigma: float) -> np.ndarray:
    r = (ksize - 1) / 2.0
    x = np.arange(ksize, dtype=np.float64) - r
    k = np.exp(-(x * x) / (2.0 * sigma * sigma))
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(img: jnp.ndarray, ksize: int = 7, sigma: float = 2.0) -> jnp.ndarray:
    """Separable Gaussian blur with replicate-edge padding, [H, W] float32.

    Matches the 7x7 sigma=2 blur applied before BRIEF sampling in the
    reference (ORBextractor.cc:898).
    """
    k = jnp.asarray(_gaussian_kernel(ksize, sigma))
    pad = ksize // 2
    x = jnp.pad(img, ((pad, pad), (0, 0)), mode="edge")
    x = jax.lax.conv_general_dilated(
        x[None, None, :, :],
        k[None, None, :, None],
        window_strides=(1, 1),
        padding="VALID",
    )[0, 0]
    x = jnp.pad(x, ((0, 0), (pad, pad)), mode="edge")
    x = jax.lax.conv_general_dilated(
        x[None, None, :, :],
        k[None, None, None, :],
        window_strides=(1, 1),
        padding="VALID",
    )[0, 0]
    return x


def resize_bilinear(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Bilinear resize [H, W] -> [out_h, out_w] (pyramid downscale)."""
    return jax.image.resize(img, (out_h, out_w), method="bilinear")


def extract_patches(img: jnp.ndarray, centers: jnp.ndarray, patch: int) -> jnp.ndarray:
    """Gather square patches around integer centers.

    img: [H, W] float32. centers: [N, 2] float32/int (x, y). patch: odd size.
    Returns [N, patch, patch]. Out-of-bounds reads are clamped to the border
    (callers mask keypoints inside the valid border anyway, mirroring the
    reference's EDGE_THRESHOLD=19 margin).
    """
    half = patch // 2
    cx = jnp.round(centers[..., 0]).astype(jnp.int32)
    cy = jnp.round(centers[..., 1]).astype(jnp.int32)
    h, w = img.shape
    y0 = jnp.clip(cy - half, 0, h - patch)
    x0 = jnp.clip(cx - half, 0, w - patch)

    def one(yx):
        return jax.lax.dynamic_slice(img, (yx[0], yx[1]), (patch, patch))

    return jax.vmap(one)(jnp.stack([y0, x0], axis=-1))


def bilinear_sample(img: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Bilinear interpolation of [H, W] at float coords xy [..., 2] (x, y)."""
    h, w = img.shape
    x = jnp.clip(xy[..., 0], 0.0, w - 1.001)
    y = jnp.clip(xy[..., 1], 0.0, h - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    v00 = img[y0, x0]
    v01 = img[y0, x0 + 1]
    v10 = img[y0 + 1, x0]
    v11 = img[y0 + 1, x0 + 1]
    return (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )
