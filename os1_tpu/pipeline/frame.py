"""Frame construction: image -> features + undistorted coordinates.

The reference's Frame constructor (Frame.cc:60-112: ORB extraction,
UndistortKeyPoints, grid assignment) as one device program. No 64x48 grid is
built — window queries are dense masked comparisons on TPU (see
matching/core.py window_gate).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..features.orb import FrameFeatures, OrbConfig, make_extractor
from ..geometry import camera as cam_mod


class FrameData(NamedTuple):
    feats: FrameFeatures  # raw pixel coords (reference mvKeys)
    xy_un: jnp.ndarray  # [N, 2] undistorted coords (reference mvKeysUn)
    sigma2: jnp.ndarray  # [N] per-feature squared octave scale


@functools.lru_cache(maxsize=8)
def make_frame_builder(orb_cfg: OrbConfig):
    extractor = make_extractor(orb_cfg)
    sigma2_table = jnp.asarray(orb_cfg.sigma2)

    @jax.jit
    def build(img: jnp.ndarray, cam: cam_mod.Camera) -> FrameData:
        feats = extractor(img)
        xy_un = cam_mod.undistort_pixels(cam, feats.xy)
        sigma2 = sigma2_table[feats.octave]
        return FrameData(feats=feats, xy_un=xy_un, sigma2=sigma2)

    return build
