"""Device-resident mirror of the map store.

The host-side :class:`~os1_tpu.map.store.MapStore` owns all bookkeeping
(allocation, observation tables, culling) in numpy; per-frame device programs
must NOT re-upload map slices every frame — over a tunneled TPU each small
host->device transfer costs ~1 ms, and the tracker needs ~25 of them, which
alone caps tracking at ~30 fps.

The mirror keeps the arrays the per-frame program reads resident in HBM and
refreshes them only when the map actually changes (keyframe insertion, local
mapping, loop closure, load/reset) — the TPU-native analogue of the
reference's tracking thread reading the map under ``Map::mMutexMapUpdate``
between frames (reference Map.h:140, Tracking.cc:133): a frame sees one
consistent map version; map mutations publish a new version between frames.

Refresh cost: full point block ~1.3 MB (~2 ms once per map event), one
keyframe row ~60 KB. Per tracked frame: zero map bytes move.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp

from .store import MapStore


@jax.jit
def _insert_row(kf_xy, kf_angle, kf_octave, kf_desc, k, xy, angle, octave, desc):
    return (
        kf_xy.at[k].set(xy),
        kf_angle.at[k].set(angle),
        kf_octave.at[k].set(octave),
        kf_desc.at[k].set(desc),
    )


@dataclass
class DeviceMirror:
    store: MapStore
    # --- point block (refreshed wholesale on map events) ---
    pt_xyz: jnp.ndarray = field(init=False)  # [P, 3] f32
    pt_desc: jnp.ndarray = field(init=False)  # [P, 8] u32
    pt_valid: jnp.ndarray = field(init=False)  # [P] bool
    pt_normal: jnp.ndarray = field(init=False)  # [P, 3] f32
    pt_min_dist: jnp.ndarray = field(init=False)  # [P] f32
    pt_max_dist: jnp.ndarray = field(init=False)  # [P] f32
    pt_n_obs: jnp.ndarray = field(init=False)  # [P] i32
    pt_obs_kf: jnp.ndarray = field(init=False)  # [P, M] i32
    # --- keyframe block (rows refreshed as keyframes change) ---
    kf_T: jnp.ndarray = field(init=False)  # [K, 4, 4] f32
    kf_valid: jnp.ndarray = field(init=False)  # [K] bool
    kf_xy: jnp.ndarray = field(init=False)  # [K, N, 2] f32
    kf_angle: jnp.ndarray = field(init=False)  # [K, N] f32
    kf_octave: jnp.ndarray = field(init=False)  # [K, N] i32
    kf_desc: jnp.ndarray = field(init=False)  # [K, N, 8] u32
    kf_feat_valid: jnp.ndarray = field(init=False)  # [K, N] bool
    kf_obs_point: jnp.ndarray = field(init=False)  # [K, N] i32

    version: int = field(init=False, default=0)

    def __post_init__(self):
        self.refresh()

    # ------------------------------------------------------------------ #
    def refresh(self) -> None:
        """Re-publish every mirrored array from the host store. Called after
        any batch of map mutations (keyframe insertion + local mapping pass,
        loop correction, reset, map load)."""
        st = self.store
        self.pt_xyz = jnp.asarray(st.pt_xyz)
        self.pt_desc = jnp.asarray(st.pt_desc)
        self.pt_valid = jnp.asarray(st.pt_valid)
        self.pt_normal = jnp.asarray(st.pt_normal)
        self.pt_min_dist = jnp.asarray(st.pt_min_dist)
        self.pt_max_dist = jnp.asarray(st.pt_max_dist)
        self.pt_n_obs = jnp.asarray(st.pt_n_obs)
        self.pt_obs_kf = jnp.asarray(st.pt_obs_kf)
        self.kf_T = jnp.asarray(st.kf_T)
        self.kf_valid = jnp.asarray(st.kf_valid)
        self.kf_xy = jnp.asarray(st.kf_xy)
        self.kf_angle = jnp.asarray(st.kf_angle)
        self.kf_octave = jnp.asarray(st.kf_octave)
        self.kf_desc = jnp.asarray(st.kf_desc)
        self.kf_feat_valid = jnp.asarray(st.kf_feat_valid)
        self.kf_obs_point = jnp.asarray(st.kf_obs_point)
        self.version += 1

    def refresh_dynamic(self) -> None:
        """Re-publish everything that MUTATES after keyframe insertion: the
        whole point block plus the mutable keyframe arrays (poses, liveness,
        bindings). The static per-keyframe feature arrays (xy/angle/octave/
        desc — written once at insertion, ~5.5 MB of the full refresh) are
        uploaded per-row by :meth:`insert_keyframe_row` instead."""
        st = self.store
        self.pt_xyz = jnp.asarray(st.pt_xyz)
        self.pt_desc = jnp.asarray(st.pt_desc)
        self.pt_valid = jnp.asarray(st.pt_valid)
        self.pt_normal = jnp.asarray(st.pt_normal)
        self.pt_min_dist = jnp.asarray(st.pt_min_dist)
        self.pt_max_dist = jnp.asarray(st.pt_max_dist)
        self.pt_n_obs = jnp.asarray(st.pt_n_obs)
        self.pt_obs_kf = jnp.asarray(st.pt_obs_kf)
        self.kf_T = jnp.asarray(st.kf_T)
        self.kf_valid = jnp.asarray(st.kf_valid)
        self.kf_feat_valid = jnp.asarray(st.kf_feat_valid)
        self.kf_obs_point = jnp.asarray(st.kf_obs_point)
        self.version += 1

    def insert_keyframe_row(self, k: int) -> None:
        """Publish one new keyframe's static feature arrays (row k)."""
        st = self.store
        self.kf_xy = self.kf_xy.at[k].set(jnp.asarray(st.kf_xy[k]))
        self.kf_angle = self.kf_angle.at[k].set(jnp.asarray(st.kf_angle[k]))
        self.kf_octave = self.kf_octave.at[k].set(jnp.asarray(st.kf_octave[k]))
        self.kf_desc = self.kf_desc.at[k].set(jnp.asarray(st.kf_desc[k]))

    def insert_keyframe_row_device(self, k: int, frame) -> None:
        """Publish a new keyframe row straight from the frame's
        device-resident feature arrays — zero host<->device bytes (the frame
        was extracted on device; the host store row materializes later on
        the mapping worker)."""
        self.kf_xy, self.kf_angle, self.kf_octave, self.kf_desc = (
            _insert_row(self.kf_xy, self.kf_angle, self.kf_octave,
                        self.kf_desc, jnp.int32(k), frame.xy_un,
                        frame.feats.angle, frame.feats.octave,
                        frame.feats.desc)
        )

    def refresh_points(self) -> None:
        """Re-publish only the point block (pose-graph-free map events)."""
        st = self.store
        self.pt_xyz = jnp.asarray(st.pt_xyz)
        self.pt_desc = jnp.asarray(st.pt_desc)
        self.pt_valid = jnp.asarray(st.pt_valid)
        self.pt_normal = jnp.asarray(st.pt_normal)
        self.pt_min_dist = jnp.asarray(st.pt_min_dist)
        self.pt_max_dist = jnp.asarray(st.pt_max_dist)
        self.pt_n_obs = jnp.asarray(st.pt_n_obs)
        self.pt_obs_kf = jnp.asarray(st.pt_obs_kf)
        self.version += 1
