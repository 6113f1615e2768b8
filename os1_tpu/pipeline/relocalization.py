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
        cands, scores = self.db.query(bow)
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
            if int(opt.n_inliers) < 10:
                continue
            inlier = np.asarray(opt.inlier)
            bind = np.where(inlier, pt_ids, -1)
            return True, np.asarray(opt.Tcw), bind
        return False, None, None
