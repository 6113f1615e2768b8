"""Batched ORB feature extraction: pyramid FAST -> spatial balance ->
orientation -> rotated binary descriptors, as one jitted device program.

Re-designs the reference's ORBextractor (ORBextractor.cc:907-996: 8-level
pyramid, per-cell FAST with 20->7 fallback, octree balancing, IC-angle
orientation, Gaussian blur + rotated BRIEF) for TPU: every stage is a dense
data-parallel map over the whole level, keypoint lists are fixed-capacity
masked arrays, and the per-level loop is unrolled at trace time (static
shapes per level).

Descriptor note: the sampling pattern is a seeded isotropic-Gaussian BRIEF
pattern generated at build time — NOT OpenCV's learned bit_pattern_31 table.
The framework is self-contained (its own matcher thresholds and its own BoW
vocabulary are calibrated to this pattern); parity with the reference is at
the capability level (256-bit rotated binary descriptors), not bit level.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import fast, image, topk, hamming

# Keep keypoints this far from the level border so orientation patches and
# rotated descriptor samples stay in-bounds (reference EDGE_THRESHOLD=19).
BORDER = 19
PATCH = 31  # orientation patch (radius 15), same as reference HALF_PATCH_SIZE*2+1
BRIEF_RADIUS = 13.0  # max offset of a descriptor sample from the keypoint


class OrbConfig(NamedTuple):
    """Static extractor configuration (hashable; one compiled program each).

    Defaults mirror the reference's webcam.yaml ORBextractor.* block:
    nFeatures=1000 (rounded to 1024 for tiling), scaleFactor=1.2, nLevels=8,
    iniThFAST=20, minThFAST=7.
    """

    height: int = 480
    width: int = 640
    n_features: int = 1024
    n_levels: int = 8
    scale_factor: float = 1.2
    fast_hi: float = 20.0
    fast_lo: float = 7.0
    cell: int = 16
    k_per_cell: int = 4
    seed: int = 42

    @property
    def scales(self) -> tuple:
        return tuple(self.scale_factor**l for l in range(self.n_levels))

    @property
    def sigma2(self) -> tuple:
        """Per-octave squared scale (reference Frame mvLevelSigma2)."""
        return tuple(s * s for s in self.scales)

    @property
    def level_sizes(self) -> tuple:
        return tuple(
            (int(round(self.height / s)), int(round(self.width / s)))
            for s in self.scales
        )

    @property
    def features_per_level(self) -> tuple:
        """Geometric budget split across levels (reference ORBextractor ctor)."""
        f = 1.0 / self.scale_factor
        raw = np.array([f**l for l in range(self.n_levels)])
        raw = raw / raw.sum() * self.n_features
        counts = np.floor(raw).astype(int)
        counts[0] += self.n_features - counts.sum()
        return tuple(int(c) for c in counts)


class FrameFeatures(NamedTuple):
    """Fixed-capacity masked keypoint set for one image.

    All arrays have leading dim n_features; invalid lanes have valid=False.
    ``xy`` is in level-0 (full-resolution) pixel coordinates, pre-undistortion
    (the reference's mvKeys; undistortion to mvKeysUn happens in the frame
    builder, see pipeline/frame.py).
    """

    xy: jnp.ndarray  # [N, 2] float32 (x, y)
    response: jnp.ndarray  # [N] float32
    angle: jnp.ndarray  # [N] float32 radians
    octave: jnp.ndarray  # [N] int32
    desc: jnp.ndarray  # [N, 8] uint32 packed 256-bit
    valid: jnp.ndarray  # [N] bool


def _brief_pattern(seed: int) -> np.ndarray:
    """[256, 2, 2] float32 sample-pair offsets, isotropic Gaussian (sigma =
    patch/5), clipped to BRIEF_RADIUS — the BRIEF-I construction."""
    rng = np.random.default_rng(seed)
    pts = rng.normal(0.0, PATCH / 5.0, size=(hamming.BITS, 2, 2))
    return np.clip(pts, -BRIEF_RADIUS, BRIEF_RADIUS).astype(np.float32)


def _ic_weights() -> tuple[np.ndarray, np.ndarray]:
    """x- and y-moment weight masks over the circular orientation patch."""
    r = PATCH // 2
    ys, xs = np.mgrid[-r : r + 1, -r : r + 1]
    disc = (xs * xs + ys * ys) <= r * r
    return (xs * disc).astype(np.float32), (ys * disc).astype(np.float32)


def _extract_level(
    img_l: jnp.ndarray,
    n_out: int,
    cfg: OrbConfig,
    pattern: jnp.ndarray,
    wx: jnp.ndarray,
    wy: jnp.ndarray,
):
    """One pyramid level -> (xy_level, resp, angle, desc, valid)."""
    h, w = img_l.shape
    scores = fast.nms3x3(fast.fast_with_fallback(img_l, cfg.fast_hi, cfg.fast_lo))
    # Mask the border so downstream patches stay in-bounds.
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    interior = (
        (ys >= BORDER) & (ys < h - BORDER) & (xs >= BORDER) & (xs < w - BORDER)
    )
    scores = jnp.where(interior, scores, 0.0)

    xy, resp, valid = topk.balanced_cell_topk(scores, cfg.cell, cfg.k_per_cell, n_out)

    # Orientation: intensity-centroid moments on the raw level image.
    patches = image.extract_patches(img_l, xy, PATCH)  # [n, 31, 31]
    m10 = jnp.sum(patches * wx, axis=(-2, -1))
    m01 = jnp.sum(patches * wy, axis=(-2, -1))
    angle = jnp.arctan2(m01, m10)

    # Descriptors: rotated BRIEF on the blurred level image.
    blurred = image.gaussian_blur(img_l)
    c, s = jnp.cos(angle), jnp.sin(angle)
    rot = jnp.stack(
        [jnp.stack([c, -s], -1), jnp.stack([s, c], -1)], axis=-2
    )  # [n, 2, 2]
    # pattern: [256, 2(pair), 2(xy)] -> rotated absolute coords [n, 256, 2, 2]
    offs = jnp.einsum("nij,pkj->npki", rot, pattern)
    coords = xy[:, None, None, :] + offs
    samples = image.bilinear_sample(blurred, coords)  # [n, 256, 2]
    bits = samples[..., 0] < samples[..., 1]
    desc = hamming.pack_bits(bits)
    return xy, resp, angle, desc, valid


@functools.lru_cache(maxsize=8)
def make_extractor(cfg: OrbConfig):
    """Build a jitted extractor: float32 [H, W] grayscale -> FrameFeatures."""
    pattern = jnp.asarray(_brief_pattern(cfg.seed))
    wx, wy = (jnp.asarray(a) for a in _ic_weights())
    sizes = cfg.level_sizes
    budgets = cfg.features_per_level
    scales = cfg.scales

    @jax.jit
    def extract(img: jnp.ndarray) -> FrameFeatures:
        img = img.astype(jnp.float32)
        out = []
        img_l = img
        for l in range(cfg.n_levels):
            if l > 0:
                img_l = image.resize_bilinear(img_l, *sizes[l])
            xy, resp, angle, desc, valid = _extract_level(
                img_l, budgets[l], cfg, pattern, wx, wy
            )
            octave = jnp.full(budgets[l], l, dtype=jnp.int32)
            out.append((xy * scales[l], resp, angle, octave, desc, valid))
        xy, resp, angle, octave, desc, valid = (
            jnp.concatenate([o[i] for o in out], axis=0) for i in range(6)
        )
        return FrameFeatures(
            xy=xy, response=resp, angle=angle, octave=octave, desc=desc, valid=valid
        )

    return extract
