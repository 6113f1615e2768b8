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


N_ORIENT = 64  # discrete BRIEF pattern orientations (5.6 deg steps, max 2.8 deg rounding error)


def _brief_pattern(seed: int) -> np.ndarray:
    """[256, 2, 2] float32 sample-pair offsets, isotropic Gaussian (sigma =
    patch/5), clipped to BRIEF_RADIUS — the BRIEF-I construction."""
    rng = np.random.default_rng(seed)
    pts = rng.normal(0.0, PATCH / 5.0, size=(hamming.BITS, 2, 2))
    return np.clip(pts, -BRIEF_RADIUS, BRIEF_RADIUS).astype(np.float32)


def _rotated_offset_table(seed: int, row_stride: int) -> np.ndarray:
    """[N_ORIENT, 256*2] int32: FLAT-IMAGE offsets (dy * row_stride + dx) of
    every BRIEF sample for each discrete pattern orientation, nearest-pixel
    rounded.

    The steered pattern is precomputed per orientation bin — sampling a
    descriptor is then ONE flat gather per keypoint straight from the blurred
    pyramid stack, no per-keypoint patch materialization (this is also how
    OpenCV's ORB steers BRIEF: nearest-pixel reads of a rotated pattern,
    ORBextractor.cc computeOrbDescriptor)."""
    pat = _brief_pattern(seed)  # [256, 2, 2] (x, y)
    r = BRIEF_RADIUS + 1
    tables = []
    for a in range(N_ORIENT):
        th = 2.0 * np.pi * a / N_ORIENT
        c, s = np.cos(th), np.sin(th)
        x = pat[..., 0] * c - pat[..., 1] * s
        y = pat[..., 0] * s + pat[..., 1] * c
        xi = np.clip(np.round(x), -r, r).astype(np.int64)
        yi = np.clip(np.round(y), -r, r).astype(np.int64)
        tables.append((yi * row_stride + xi).reshape(-1))
    return np.stack(tables).astype(np.int32)


def _ic_weights(patch: int = PATCH) -> tuple[np.ndarray, np.ndarray]:
    """x- and y-moment weight masks over the circular orientation patch
    (radius = reference HALF_PATCH_SIZE = 15 regardless of patch size)."""
    r = patch // 2
    ys, xs = np.mgrid[-r : r + 1, -r : r + 1]
    disc = (xs * xs + ys * ys) <= (PATCH // 2) ** 2
    return (xs * disc).astype(np.float32), (ys * disc).astype(np.float32)


def _ic_offsets_strided(row_stride: int, stride: int = 2):
    """Strided intensity-centroid sample set: (flat offsets [S], wx [S],
    wy [S]) over the radius-15 orientation disc, sampled every ``stride``
    pixels. The moments are computed on the sigma=2 blurred image, which is
    band-limited well below the stride-2 Nyquist rate, so the strided sums
    track the reference's dense disc (IC_Angle, ORBextractor.cc:86-113) to
    well under the 5.6-degree orientation bin width — at 1/4 the gather
    traffic."""
    r = PATCH // 2
    ys, xs = np.mgrid[-r : r + 1 : stride, -r : r + 1 : stride]
    disc = (xs * xs + ys * ys) <= r * r
    keep = disc.reshape(-1)
    off = (ys * row_stride + xs).reshape(-1)[keep]
    wx = xs.reshape(-1)[keep].astype(np.float32)
    wy = ys.reshape(-1)[keep].astype(np.float32)
    return off.astype(np.int32), wx, wy


@functools.lru_cache(maxsize=8)
def make_extractor(cfg: OrbConfig):
    """Build a jitted extractor: float32 [H, W] grayscale -> FrameFeatures.

    All pyramid levels live in one padded [L, H, W] stack and every stage
    (pyramid resize as two MXU matmuls, FAST, NMS, balanced top-k, patches,
    orientation, blur, rotated BRIEF) runs ONCE over the whole stack — the
    per-level loop version (reference ORBextractor.cc:907-969 structure) is
    dominated by per-op dispatch overhead on TPU, not compute.
    """
    sizes = cfg.level_sizes
    budgets = cfg.features_per_level
    scales = cfg.scales
    L = cfg.n_levels
    n_max = max(budgets)
    Ry, Rx = (jnp.asarray(a) for a in image.pyramid_matrices(cfg.height, cfg.width, sizes))
    hb = jnp.asarray(np.array([h for h, _ in sizes], np.int32))
    wb = jnp.asarray(np.array([w for _, w in sizes], np.int32))
    ic_off, ic_wx, ic_wy = _ic_offsets_strided(cfg.width)
    ic_off, ic_wx, ic_wy = jnp.asarray(ic_off), jnp.asarray(ic_wx), jnp.asarray(ic_wy)
    sample_table = jnp.asarray(_rotated_offset_table(cfg.seed, cfg.width))

    @jax.jit
    def extract(img: jnp.ndarray) -> FrameFeatures:
        img = img.astype(jnp.float32)
        pyr = image.build_pyramid_stack(img, Ry, Rx)  # [L, H, W]

        scores = fast.nms3x3(
            fast.fast_with_fallback(img=pyr, hi=cfg.fast_hi, lo=cfg.fast_lo, bounds=(hb, wb))
        )
        ys = jax.lax.broadcasted_iota(jnp.int32, pyr.shape, 1)
        xs = jax.lax.broadcasted_iota(jnp.int32, pyr.shape, 2)
        interior = (
            (ys >= BORDER) & (ys < hb[:, None, None] - BORDER)
            & (xs >= BORDER) & (xs < wb[:, None, None] - BORDER)
        )
        scores = jnp.where(interior, scores, 0.0)

        xy, resp, valid = topk.balanced_cell_topk_batch(
            scores, cfg.cell, cfg.k_per_cell, n_max
        )  # [L, n_max, ...]

        lvl = jax.lax.broadcasted_iota(jnp.int32, (L, n_max), 0).reshape(-1)
        xy_f = xy.reshape(-1, 2)

        # The blurred stack feeds BOTH the orientation moments and the
        # descriptor samples (the blur is isotropic, so the intensity-
        # centroid direction matches the raw-image one; the reference blurs
        # before BRIEF too, ORBextractor.cc:898). Level edges are replicated
        # into the stack padding first so the blur cannot bleed zeros into
        # border samples on the upper levels. Keypoints sit >= BORDER from
        # their level bounds, so every sample below stays inside level
        # content; sampling is direct FLAT gathers from the stack — no
        # per-keypoint patch materialization (the vmapped dynamic-slice
        # version cost ~6 ms/frame on TPU, ~3x all the gathers here).
        blurred = image.gaussian_blur(image.replicate_level_edges(pyr, hb, wb))
        flat = blurred.reshape(-1)
        size = flat.shape[0]
        H, W = cfg.height, cfg.width
        cx = jnp.round(xy_f[:, 0]).astype(jnp.int32)
        cy = jnp.round(xy_f[:, 1]).astype(jnp.int32)
        base = (lvl * H + cy) * W + cx  # flat index of each keypoint center

        # Orientation: strided intensity-centroid disc (see _ic_offsets_strided).
        s_or = flat[jnp.clip(base[:, None] + ic_off[None, :], 0, size - 1)]
        m10 = s_or @ ic_wx
        m01 = s_or @ ic_wy
        angle = jnp.arctan2(m01, m10)  # [L*n_max]

        # Descriptors: steered BRIEF via the precomputed per-orientation
        # nearest-pixel flat-offset table — one gather per keypoint.
        two_pi = 2.0 * jnp.pi
        abin = (
            jnp.round(jnp.mod(angle, two_pi) * (N_ORIENT / two_pi)).astype(jnp.int32)
            % N_ORIENT
        )
        samples = flat[jnp.clip(base[:, None] + sample_table[abin], 0, size - 1)]
        samples = samples.reshape(-1, hamming.BITS, 2)
        desc = hamming.pack_bits(samples[..., 0] < samples[..., 1])

        # Per-level budget selection: lane [l, :budgets[l]], concatenated.
        angle = angle.reshape(L, n_max)
        desc = desc.reshape(L, n_max, -1)
        outs = []
        for l in range(L):
            b = budgets[l]
            outs.append((
                xy[l, :b] * scales[l],
                resp[l, :b],
                angle[l, :b],
                jnp.full(b, l, dtype=jnp.int32),
                desc[l, :b],
                valid[l, :b],
            ))
        xy_o, resp_o, ang_o, oct_o, desc_o, val_o = (
            jnp.concatenate([o[i] for o in outs], axis=0) for i in range(6)
        )
        return FrameFeatures(
            xy=xy_o, response=resp_o, angle=ang_o, octave=oct_o,
            desc=desc_o, valid=val_o,
        )

    return extract
