"""Relocalization: BoW candidate retrieval -> descriptor matching -> RANSAC
PnP -> LM pose polish (reference Tracking::Relocalization,
Tracking.cc:969-1131).
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from ..map.store import MapStore
from ..matching import core as mcore
from ..optim import optimize_pose
from ..solvers.pnp import solve_pnp
from ..vocab.database import KeyFrameDatabase
from .config import SlamConfig
from .frame import FrameData


@jax.jit
def _match_frame_to_kf_points(frame_desc, frame_valid, frame_angle,
                              kf_desc, kf_angle, kf_has_pt):
    """Descriptor matching of frame features to point-bound KF features
    (the reference's SearchByBoW; dense gated matching here)."""
    gate = frame_valid[:, None] & kf_has_pt[None, :]
    res = mcore.match_with_gate(frame_desc, kf_desc, gate,
                                max_dist=mcore.TH_LOW, ratio=0.75)
    res = mcore.mutual_best(res, kf_desc.shape[0])
    return mcore.rotation_consistency(frame_angle, kf_angle, res)


@dataclass
class Relocalizer:
    cfg: SlamConfig
    store: MapStore
    db: KeyFrameDatabase
    max_candidates: int = 5
    # One-shot console detail of the next relocalization attempt (the
    # reference's 'v' key -> KeyFrameDatabase::verbose, Viewer.cc:247-248).
    verbose: bool = False

    def __post_init__(self):
        self._key = jax.random.PRNGKey(42)
        self._intr = jnp.asarray(self.cfg.intr)

    def __call__(self, frame: FrameData):
        """Attempt relocalization. Returns (ok, Tcw, bind [N] point ids)."""
        st = self.store
        n_feat = self.cfg.orb.n_features
        desc = np.asarray(frame.feats.desc)
        valid = np.asarray(frame.feats.valid)
        _, _, bow = self.db.compute_bow(desc, valid)
        # Reference protocol: candidates accumulated over covisibility groups
        # (DetectRelocalizationCandidates, KeyFrameDatabase.cc:199-336).
        cands = self.db.detect_reloc_candidates(
            bow, covis_fn=lambda k: st.covisible_keyframes(k, top=10)
        )
        if self.verbose:
            self.verbose = False  # one-shot, as in the reference
            print(f"[reloc] {len(cands)} candidates: {list(map(int, cands[:8]))}")
        for kf in cands[: self.max_candidates]:
            kf = int(kf)
            obs_pt = st.kf_obs_point[kf]
            has_pt = (obs_pt >= 0) & st.pt_valid[np.clip(obs_pt, 0, None)]
            if has_pt.sum() < 15:
                continue
            res = _match_frame_to_kf_points(
                frame.feats.desc, frame.feats.valid, frame.feats.angle,
                jnp.asarray(st.kf_desc[kf]), jnp.asarray(st.kf_angle[kf]),
                jnp.asarray(has_pt),
            )
            ok_np = np.asarray(res.ok)
            if ok_np.sum() < 15:  # reference: nmatches < 15 -> skip
                continue
            idx_np = np.asarray(res.idx)
            pt_ids = np.where(ok_np, obs_pt[np.clip(idx_np, 0, None)], -1)
            pts = st.pt_xyz[np.clip(pt_ids, 0, None)]

            self._key, sub = jax.random.split(self._key)
            pnp = solve_pnp(
                jnp.asarray(pts), frame.xy_un, frame.sigma2,
                jnp.asarray(pt_ids >= 0), self._intr, sub,
            )
            if not bool(pnp.success):
                continue
            # LM polish over PnP inliers (reference: PoseOptimization after
            # each RANSAC iterate, >= 10 inliers to continue, Tracking.cc:1050).
            opt = optimize_pose(
                pnp.Tcw, jnp.asarray(pts), frame.xy_un, frame.sigma2,
                pnp.inliers, self._intr,
            )
            n_good = int(opt.n_inliers)
            if n_good < 10:
                continue
            inlier = np.asarray(opt.inlier)
            Tcw = np.asarray(opt.Tcw)
            bind = np.where(inlier, pt_ids, -1)
            # Escalation (Tracking.cc:1079-1108): below 50 inliers, run up to
            # two guided SearchByProjection + re-optimize rounds over the
            # candidate's covisibility region — first a wide window, then a
            # narrow one around the refined pose.
            if n_good < 50:
                region_pts = self._region_points(kf)
                for radius in (10.0, 3.0):
                    if n_good >= 50 or len(region_pts) == 0:
                        break
                    Tcw, bind, n_good = self._guided_round(
                        frame, Tcw, bind, region_pts, radius
                    )
            if n_good < 50:
                continue
            return True, Tcw, bind
        return False, None, None

    def _region_points(self, kf: int) -> np.ndarray:
        """Map points of the candidate keyframe's covisibility region."""
        st = self.store
        region = [kf] + [int(k) for k in st.covisible_keyframes(kf, top=10)]
        pts = st.kf_obs_point[region]
        pts = np.unique(pts[pts >= 0])
        return pts[st.pt_valid[pts]]

    def _guided_round(self, frame, Tcw, bind, region_pts, radius):
        """One guided projection-matching + pose-optimization round."""
        from . import tracking_kernels as tk

        st = self.store
        P = self.cfg.th.max_local_points
        ids = np.zeros(P, np.int64)
        valid = np.zeros(P, bool)
        m = min(len(region_pts), P)
        ids[:m] = region_pts[:m]
        valid[:m] = ~np.isin(ids[:m], bind[bind >= 0])
        prev_bound = bind >= 0
        prev_xyz = st.pt_xyz[np.clip(bind, 0, None)].astype(np.float32)
        T, lbind, inl, n, _ = tk.track_points(
            jnp.asarray(Tcw.astype(np.float32)),
            jnp.asarray(st.pt_xyz[ids].astype(np.float32)),
            jnp.asarray(st.pt_desc[ids]),
            jnp.asarray(valid & st.pt_valid[ids]),
            jnp.zeros(P, jnp.int32),
            jnp.asarray(st.pt_normal[ids]),
            jnp.asarray(st.pt_min_dist[ids]),
            jnp.asarray(np.nan_to_num(st.pt_max_dist[ids], posinf=1e9)),
            jnp.asarray(prev_bound),
            jnp.asarray(prev_xyz), jnp.asarray(prev_bound),
            frame, self.cfg.camera, self._intr, jnp.float32(radius),
            scale_factor=self.cfg.orb.scale_factor,
            n_levels=self.cfg.orb.n_levels,
            use_frustum=True, ratio=0.9,
        )
        from ..utils.transfer import fetch
        lbind, inl, n, T = fetch((lbind, inl, n, T))
        new_bind = np.where(
            lbind >= 0, ids[np.clip(lbind, 0, None)],
            np.where(prev_bound & inl, bind, -1),
        )
        return np.asarray(T), new_bind, int(n)
