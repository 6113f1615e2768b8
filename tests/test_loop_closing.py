"""Loop-closing orchestration test on a hand-built map: a chain of keyframes
whose tail revisits the start with an injected Sim3 drift. Detection must
fire (consistency protocol), the Sim3 must be recovered, and correction must
snap the drifted tail back onto the original place."""
import numpy as np
import jax.numpy as jnp
import pytest

from os1_tpu.geometry import se3, sim3
from os1_tpu.geometry.camera import Camera
from os1_tpu.features.orb import OrbConfig
from os1_tpu.map.store import MapConfig, MapStore
from os1_tpu.pipeline.config import SlamConfig
from os1_tpu.pipeline.loop_closing import LoopCloser
from os1_tpu.vocab.database import KeyFrameDatabase
from os1_tpu.vocab.dbow2 import default_vocabulary

N_FEAT = 256
INTR = [260.0, 260.0, 160.0, 120.0]


def project(T, pts):
    pc = pts @ T[:3, :3].T + T[:3, 3]
    uv = np.stack(
        [260 * pc[:, 0] / pc[:, 2] + 160, 260 * pc[:, 1] / pc[:, 2] + 120], 1
    )
    return uv.astype(np.float32), pc


@pytest.fixture(scope="module")
def looped_map():
    rng = np.random.default_rng(0)
    cam = Camera.make(fx=260.0, fy=260.0, cx=160.0, cy=120.0, width=320, height=240)
    cfg = SlamConfig(
        camera=cam,
        orb=OrbConfig(height=240, width=320, n_features=N_FEAT, n_levels=4),
        map=MapConfig(max_keyframes=32, max_points=4096, n_features=N_FEAT),
    )
    st = MapStore(cfg.map)
    vocab = default_vocabulary()
    db = KeyFrameDatabase(vocab, cfg.map.max_keyframes)

    # Ground-truth keyframe chain: move sideways, come back to the start.
    n_out = 6
    gt = [np.eye(4, dtype=np.float32)]
    for i in range(1, n_out):
        gt.append(
            np.asarray(se3.exp(jnp.asarray([0.4 * i, 0, 0, 0, 0, 0], jnp.float32)))
        )
    # Return leg: same poses reversed (revisit).
    gt = gt + gt[::-1][1:]
    n_kf = len(gt)

    # Each pose observes a shared window of landmarks.
    world = rng.uniform(-1, 7, size=(600, 3)).astype(np.float32)
    world[:, 2] = rng.uniform(4, 7, size=600)
    world[:, 1] = rng.uniform(-2, 2, size=600)
    descs_world = rng.integers(0, 2**32, size=(600, 8), dtype=np.uint32)

    # Drift: the return leg's estimated poses/points are perturbed by a Sim3.
    D = np.asarray(
        sim3.exp(jnp.asarray([0.15, 0.1, -0.08, 0.02, -0.03, 0.02, 0.06], jnp.float32))
    )
    drift_start = n_out  # first drifted keyframe index

    kf_ids = []
    world_pt_id = {}  # world landmark -> map point id (true copy)
    drift_pt_id = {}  # world landmark -> drifted copy id
    for k in range(n_kf):
        T_true = gt[k]
        drifted = k >= drift_start
        T_est = (T_true @ np.linalg.inv(np.asarray(sim3.to_se3(jnp.asarray(D))))
                 if drifted else T_true).astype(np.float32)
        uv, pc = project(T_true, world)
        vis = (
            (pc[:, 2] > 0.5) & (uv[:, 0] > 5) & (uv[:, 0] < 315)
            & (uv[:, 1] > 5) & (uv[:, 1] < 235)
        )
        sel = np.nonzero(vis)[0][:N_FEAT]
        n = len(sel)
        xy = np.zeros((N_FEAT, 2), np.float32)
        xy[:n] = uv[sel]
        desc = np.zeros((N_FEAT, 8), np.uint32)
        desc[:n] = descs_world[sel]
        valid = np.zeros(N_FEAT, bool)
        valid[:n] = True
        kf = st.add_keyframe(T_est, xy, np.zeros(N_FEAT, np.float32),
                             np.zeros(N_FEAT, np.int32), desc, valid,
                             frame_id=k, timestamp=k / 30.0)
        kf_ids.append(kf)
        pid_map = drift_pt_id if drifted else world_pt_id
        for slot, w_id in enumerate(sel):
            if w_id not in pid_map:
                p = int(st.alloc_points(1)[0])
                pid_map[w_id] = p
                xyz = world[w_id]
                if drifted:
                    # Drifted copy: the same physical point as estimated by
                    # the drifted odometry (apply D^-1 in world space).
                    Dinv = np.asarray(sim3.inverse(jnp.asarray(D)))
                    xyz = Dinv[:3, :3] @ xyz + Dinv[:3, 3]
                st.pt_xyz[p] = xyz
                st.pt_desc[p] = descs_world[w_id]
                st.pt_first_seq[p] = st.kf_seq[kf]
            st.add_observation(pid_map[w_id], kf, slot)
        st.update_point_derived(
            np.array(sorted(set(pid_map.values()))), 1.2, 4
        )
        _, _, bow = db.compute_bow(desc, valid)
        db.add(kf, bow)

    return cfg, st, db, kf_ids, gt, D, drift_start


class TestLoopCloser:
    def test_detect_and_close(self, looped_map):
        cfg, st, db, kf_ids, gt, D, drift_start = looped_map
        lc = LoopCloser(cfg=cfg, store=st, db=db)
        closed = False
        # Process the return-leg keyframes in order; consistency needs a few.
        for k in range(drift_start, len(kf_ids)):
            closed = lc.process(kf_ids[k], k)
            if closed:
                break
        assert closed, "loop was never closed"
        assert lc.n_loops_closed == 1
        assert len(lc.loop_edges) == 1

        # After correction the drifted tail keyframes must align with the
        # ground-truth chain (up to the rigid frame of the fixed loop KF).
        last = kf_ids[k]
        T_est = st.kf_T[last]
        T_true = gt[k]
        dR = T_est[:3, :3] @ T_true[:3, :3].T
        ang = np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))
        assert ang < 0.05, ang
        assert np.linalg.norm(T_est[:3, 3] - T_true[:3, 3]) < 0.25

    def test_no_self_loop(self, looped_map):
        """A keyframe must not close a loop against its own covisible set."""
        cfg, st, db, kf_ids, gt, D, drift_start = looped_map
        lc = LoopCloser(cfg=cfg, store=st, db=db)
        cands = lc.detect(kf_ids[1], 1)
        group = set(int(x) for x in st.covisible_keyframes(kf_ids[1], min_weight=15))
        assert not (set(int(c) for c in cands) & group)
