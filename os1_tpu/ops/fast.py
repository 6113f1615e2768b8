"""FAST-9/16 corner scoring as a dense, data-parallel map.

The reference runs OpenCV's scalar FAST per 30x30 cell with a threshold
fallback 20->7 (ORBextractor.cc:848-856). Here the whole level is scored at
once: the 16 Bresenham-circle neighbors become 16 shifted views of the image,
the "9 contiguous brighter/darker" test becomes a windowed reduction over a
[16, H, W] stack, and non-max suppression is a 3x3 reduce_window. Output is
a dense score map (zero = not a corner) — downstream spatial balancing picks
keypoints from it (ops/topk.py).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

# Bresenham circle of radius 3 (dx, dy), clockwise from 12 o'clock — the
# standard FAST-16 ring (same geometry OpenCV uses).
CIRCLE = np.array(
    [
        (0, -3), (1, -3), (2, -2), (3, -1),
        (3, 0), (3, 1), (2, 2), (1, 3),
        (0, 3), (-1, 3), (-2, 2), (-3, 1),
        (-3, 0), (-3, -1), (-2, -2), (-1, -3),
    ],
    dtype=np.int32,
)

ARC = 9  # contiguous run length for FAST-9


def _ring_stack(img: jnp.ndarray) -> jnp.ndarray:
    """[H, W] -> [16, H, W]: neighbor intensity at each circle offset.

    Implemented with static pad+slice (no gather): each offset is a shifted
    view, which XLA fuses into the comparison that follows.
    """
    h, w = img.shape
    padded = jnp.pad(img, 3, mode="edge")
    views = [padded[3 + dy : 3 + dy + h, 3 + dx : 3 + dx + w] for dx, dy in CIRCLE]
    return jnp.stack(views, axis=0)


def fast_scores(img: jnp.ndarray, threshold: float) -> jnp.ndarray:
    """Dense FAST-9/16 corner score map, [H, W] float32 (0 = no corner).

    Score is the max-min margin over contiguous 9-arcs:
      bright arc: min_i (ring_i - p - t) over the arc, maxed over 16 starts
      dark  arc: min_i (p - ring_i - t) likewise
    which matches OpenCV's "highest threshold at which the pixel is still a
    corner" score up to the constant offset t.
    """
    ring = _ring_stack(img)  # [16, H, W]
    p = img[None, :, :]
    bright = ring - p - threshold  # >0 where neighbor clearly brighter
    dark = p - ring - threshold

    # Wrap-around windows: duplicate the first ARC-1 entries.
    def arc_min(x):
        x2 = jnp.concatenate([x, x[: ARC - 1]], axis=0)  # [16+8, H, W]
        # min over each window of length ARC starting at s = 0..15
        windows = jnp.stack([x2[s : s + ARC] for s in range(16)], axis=0)
        return jnp.max(jnp.min(windows, axis=1), axis=0)  # [H, W]

    score = jnp.maximum(arc_min(bright), arc_min(dark))
    score = jnp.maximum(score, 0.0)
    # Kill the 3px border (ring reads clamp there and are meaningless).
    h, w = img.shape
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    interior = (ys >= 3) & (ys < h - 3) & (xs >= 3) & (xs < w - 3)
    return jnp.where(interior, score, 0.0)


def nms3x3(scores: jnp.ndarray) -> jnp.ndarray:
    """3x3 non-maximum suppression: keep strict local maxima, zero the rest."""
    neigh_max = jax.lax.reduce_window(
        scores,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(3, 3),
        window_strides=(1, 1),
        padding="SAME",
    )
    return jnp.where((scores >= neigh_max) & (scores > 0.0), scores, 0.0)


def fast_with_fallback(img: jnp.ndarray, hi: float, lo: float) -> jnp.ndarray:
    """Score with high threshold; where an image region yields nothing, the
    low-threshold response is used (branchless version of the reference's
    20->7 per-cell fallback, ORBextractor.cc:848-856).

    Returned scores from the fallback pass are down-weighted so genuine
    high-threshold corners always outrank fallback ones in top-k selection.
    """
    s_hi = fast_scores(img, hi)
    s_lo = fast_scores(img, lo)
    # Region emptiness test at 32x32 granularity via max-pool.
    region = 32
    h, w = img.shape
    ph = (region - h % region) % region
    pw = (region - w % region) % region
    pad = jnp.pad(s_hi, ((0, ph), (0, pw)))
    pooled = jax.lax.reduce_window(
        pad, -jnp.inf, jax.lax.max,
        window_dimensions=(region, region),
        window_strides=(region, region),
        padding="VALID",
    )
    empty = (pooled <= 0.0)
    empty_full = jnp.repeat(jnp.repeat(empty, region, 0), region, 1)[:h, :w]
    # Fallback scores are scaled into (0, lo] so they sort below real ones.
    s_fb = s_lo / (1.0 + jnp.max(s_lo)) * lo
    return jnp.where(empty_full, s_fb, s_hi)
