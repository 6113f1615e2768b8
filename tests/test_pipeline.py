"""End-to-end pipeline test on a rendered synthetic scene: initialize, track,
map, and bound trajectory error vs ground truth (the v1 milestone test,
SURVEY.md §7 step 6)."""
import numpy as np
import pytest

from os1_tpu.geometry.camera import Camera
from os1_tpu.features.orb import OrbConfig
from os1_tpu.io import synthetic
from os1_tpu.map.store import MapConfig, MapStore
from os1_tpu.pipeline import System, SlamConfig, TrackingState

H, W = 240, 320
K = np.array([[260.0, 0, 160.0], [0, 260.0, 120.0], [0, 0, 1.0]])


def make_system(n_features=512, **kw):
    cam = Camera.make(fx=K[0, 0], fy=K[1, 1], cx=K[0, 2], cy=K[1, 2],
                      width=W, height=H)
    orb = OrbConfig(height=H, width=W, n_features=n_features, n_levels=4)
    cfg = SlamConfig(camera=cam, orb=orb,
                     map=MapConfig(max_keyframes=64, max_points=8192,
                                   n_features=n_features))
    return System(cfg=cfg, **kw)


@pytest.fixture(scope="module")
def sequence():
    scene = synthetic.default_scene(seed=3)
    poses = synthetic.orbit_trajectory(40, advance=0.08)
    frames = [synthetic.render(scene, T, K, H, W) for T in poses]
    return frames, poses


class TestStore:
    def test_observation_bookkeeping(self):
        st = MapStore(MapConfig(max_keyframes=4, max_points=16, n_features=8))
        k = st.add_keyframe(np.eye(4), np.zeros((8, 2)), np.zeros(8),
                            np.zeros(8, np.int32), np.zeros((8, 8), np.uint32),
                            np.ones(8, bool))
        p = st.alloc_points(1)[0]
        st.add_observation(int(p), k, 3)
        assert st.kf_obs_point[k, 3] == p
        assert st.pt_n_obs[p] == 1
        st.remove_observation(int(p), k)
        assert st.kf_obs_point[k, 3] == -1
        assert st.pt_n_obs[p] == 0

    def test_covisibility(self):
        st = MapStore(MapConfig(max_keyframes=4, max_points=64, n_features=32))
        ks = [
            st.add_keyframe(np.eye(4), np.zeros((32, 2)), np.zeros(32),
                            np.zeros(32, np.int32), np.zeros((32, 8), np.uint32),
                            np.ones(32, bool))
            for _ in range(3)
        ]
        pts = st.alloc_points(20)
        for i, p in enumerate(pts):
            st.add_observation(int(p), ks[0], i)
            st.add_observation(int(p), ks[1], i)
            if i < 5:
                st.add_observation(int(p), ks[2], i)
        w = st.covisibility_weights(ks[0])
        assert w[ks[1]] == 20 and w[ks[2]] == 5 and w[ks[0]] == 0
        cov = st.covisible_keyframes(ks[0], min_weight=3)
        assert list(cov) == [ks[1], ks[2]]

    def test_cull_points(self):
        st = MapStore(MapConfig(max_keyframes=2, max_points=8, n_features=4))
        k = st.add_keyframe(np.eye(4), np.zeros((4, 2)), np.zeros(4),
                            np.zeros(4, np.int32), np.zeros((4, 8), np.uint32),
                            np.ones(4, bool))
        p = st.alloc_points(1)[0]
        st.add_observation(int(p), k, 0)
        st.cull_points(np.array([p]))
        assert not st.pt_valid[p]
        assert st.kf_obs_point[k, 0] == -1


class TestEndToEnd:
    def test_initializes_and_tracks(self, sequence):
        frames, poses = sequence
        sys = make_system()
        states = []
        for i, f in enumerate(frames):
            state, Tcw = sys.track_monocular(f, timestamp=i / 30.0)
            states.append(state)
        # Must initialize within the first frames and stay OK after.
        first_ok = states.index(TrackingState.OK)
        assert first_ok < 10, f"slow init: {[s.name for s in states[:12]]}"
        ok_after = [s == TrackingState.OK for s in states[first_ok:]]
        assert np.mean(ok_after) > 0.9, [s.name for s in states]
        assert sys.store.n_keyframes() >= 3
        assert sys.store.n_points() > 100

    def test_trajectory_accuracy(self, sequence):
        frames, poses = sequence
        sys = make_system()
        est, gt = [], []
        for i, f in enumerate(frames):
            state, Tcw = sys.track_monocular(f, timestamp=i / 30.0)
            if state == TrackingState.OK and Tcw is not None:
                est.append(Tcw)
                gt.append(poses[i])
        assert len(est) > 25
        ate = synthetic.ate_rmse(est, gt)
        traj_len = np.linalg.norm(np.diff(
            np.array([-T[:3, :3].T @ T[:3, 3] for T in gt]), axis=0), axis=1).sum()
        # ATE under 1.5% of the (3 m, 240x320, 40-frame) toy path. The
        # 0.5%-of-path class bound lives at bench scale where it is
        # physically meaningful (bench.py gates: 300 frames at 640x480,
        # sync ATE 0.36-0.65% measured); at this resolution the
        # triangulation noise floor alone is ~1% of the path.
        assert ate < 0.015 * traj_len, f"ATE {ate:.4f} over {traj_len:.2f}m"

    def test_pipelined_matches_sync(self, sequence):
        """1-frame-lag pipelined tracking (bench mode) must initialize, stay
        OK, and produce a trajectory as accurate as the synchronous path —
        results lag a frame but are stamped with their own timestamps."""
        frames, poses = sequence
        sys = make_system(pipelined=True)
        states = []
        for i, f in enumerate(frames):
            state, _ = sys.track_monocular(f, timestamp=i / 30.0)
            states.append(state)
        sys.flush()
        ok = [s == TrackingState.OK for s in states]
        assert np.mean(ok[10:]) > 0.9, [s.name for s in states]
        traj = sys.frame_trajectory()
        assert len(traj) > 25
        # Trajectory entries carry each frame's own timestamp: accuracy must
        # match the sync path on the same ATE gate.
        est = [Tcw for _, fid, Tcw in traj]
        gt = [poses[fid] for _, fid, Tcw in traj]
        ate = synthetic.ate_rmse(est, gt)
        traj_len = np.linalg.norm(np.diff(
            np.array([-T[:3, :3].T @ T[:3, 3] for T in gt]), axis=0), axis=1).sum()
        assert ate < 0.015 * traj_len, f"ATE {ate:.4f} over {traj_len:.2f}m"

    def test_localization_mode_freezes_map(self, sequence):
        frames, poses = sequence
        sys = make_system()
        for i, f in enumerate(frames[:25]):
            sys.track_monocular(f, timestamp=i / 30.0)
        n_pts = sys.store.n_points()
        n_kfs = sys.store.n_keyframes()
        sys.activate_localization_mode()
        for i, f in enumerate(frames[25:]):
            state, _ = sys.track_monocular(f, timestamp=(25 + i) / 30.0)
        assert sys.store.n_points() <= n_pts + 1
        assert sys.state == TrackingState.OK

    def test_reset(self, sequence):
        frames, poses = sequence
        sys = make_system()
        for i, f in enumerate(frames[:15]):
            sys.track_monocular(f, timestamp=i / 30.0)
        sys.reset()
        assert sys.store.n_keyframes() == 0
        assert sys.state == TrackingState.NO_IMAGES_YET
        # Can re-initialize after reset.
        for i, f in enumerate(frames[15:30]):
            state, _ = sys.track_monocular(f, timestamp=(15 + i) / 30.0)
        assert state == TrackingState.OK


class TestFusionAndCulling:
    def test_replace_point_merges_observations(self):
        st = MapStore(MapConfig(max_keyframes=4, max_points=16, n_features=8))
        ks = [
            st.add_keyframe(np.eye(4), np.zeros((8, 2)), np.zeros(8),
                            np.zeros(8, np.int32), np.zeros((8, 8), np.uint32),
                            np.ones(8, bool))
            for _ in range(3)
        ]
        a, b = (int(p) for p in st.alloc_points(2))
        st.add_observation(a, ks[0], 0)
        st.add_observation(a, ks[1], 1)
        st.add_observation(b, ks[1], 2)
        st.add_observation(b, ks[2], 3)
        st.replace_point(a, b)
        assert not st.pt_valid[a]
        assert st.pt_n_obs[b] == 3  # ks[1] kept once (winner already there)
        assert st.kf_obs_point[ks[0], 0] == b
        assert st.kf_obs_point[ks[2], 3] == b

    def test_cull_keyframe_releases_slot(self):
        st = MapStore(MapConfig(max_keyframes=4, max_points=16, n_features=8))
        k = st.add_keyframe(np.eye(4), np.zeros((8, 2)), np.zeros(8),
                            np.zeros(8, np.int32), np.zeros((8, 8), np.uint32),
                            np.ones(8, bool))
        p = int(st.alloc_points(1)[0])
        st.add_observation(p, k, 0)
        st.cull_keyframe(k)
        assert not st.kf_valid[k]
        assert st.pt_n_obs[p] == 0
        k2 = st.add_keyframe(np.eye(4), np.zeros((8, 2)), np.zeros(8),
                             np.zeros(8, np.int32), np.zeros((8, 8), np.uint32),
                             np.ones(8, bool))
        assert k2 == k  # slot reused


class TestFarPointsAndGlobalBA:
    def test_far_points_enabled(self, sequence):
        """With the os1 'puntos lejanos' experiment on, low-parallax
        candidates land at quasi-infinity, flagged pt_far, and are excluded
        from BA and covisibility."""
        frames, poses = sequence
        sys = make_system()
        sys.cfg.enable_far_points = True
        for i, f in enumerate(frames[:25]):
            state, _ = sys.track_monocular(f, timestamp=i / 30.0)
        assert sys.state == TrackingState.OK
        st = sys.store
        far = st.pt_valid & st.pt_far
        if far.any():  # far points are opportunistic; validate when present
            dist = np.linalg.norm(st.pt_xyz[far], axis=1)
            assert (dist > 1e6).all()

    def test_global_ba_improves_or_keeps_map(self, sequence):
        from os1_tpu.pipeline.local_mapping import global_bundle_adjustment

        frames, poses = sequence
        sys = make_system()
        for i, f in enumerate(frames[:25]):
            sys.track_monocular(f, timestamp=i / 30.0)
        assert sys.state == TrackingState.OK
        st = sys.store
        before = st.kf_T.copy()
        global_bundle_adjustment(st, sys.cfg, iters=10)
        assert np.isfinite(st.kf_T[st.kf_valid]).all()
        assert np.isfinite(st.pt_xyz[st.pt_valid]).all()
        # Gauge keyframe unmoved.
        k0 = np.nonzero(st.kf_valid)[0][0]
        np.testing.assert_array_equal(st.kf_T[k0], before[k0])
        # Map still trackable afterwards.
        state, _ = sys.track_monocular(frames[25], timestamp=25 / 30.0)
        assert state == TrackingState.OK


class TestLoopClosureEndToEnd:
    """A camera circling inside a textured room revisits its start: the full
    tracker -> mapper -> loop-closer path must detect and close the loop on
    rendered imagery alone (LoopClosing.cc:104-592 behavior), run global BA,
    and keep the trajectory accurate (VERDICT r1 item 7)."""

    @pytest.fixture(scope="class")
    def loop_sequence(self):
        scene = synthetic.room_scene(seed=5)
        poses = synthetic.loop_trajectory(160, radius=1.5, revolutions=1.15)
        frames = [synthetic.render(scene, T, K, H, W) for T in poses]
        return frames, poses

    def test_loop_closes_on_rendered_circuit(self, loop_sequence):
        frames, poses = loop_sequence
        sys = make_system()
        est, gt = [], []
        for i, f in enumerate(frames):
            state, Tcw = sys.track_monocular(f, timestamp=i / 30.0)
            if state == TrackingState.OK and Tcw is not None:
                est.append(Tcw)
                gt.append(poses[i])
        assert len(est) > 100, "tracking did not survive the circuit"
        assert sys.loop_closer.n_loops_closed >= 1, "no loop closed"
        st = sys.store
        assert np.isfinite(st.kf_T[st.kf_valid]).all()
        assert np.isfinite(st.pt_xyz[st.pt_valid]).all()
        # Post-closure trajectory accuracy: ATE within 3% of path length.
        ate = synthetic.ate_rmse(est, gt)
        traj_len = np.linalg.norm(np.diff(
            np.array([-T[:3, :3].T @ T[:3, 3] for T in gt]), axis=0),
            axis=1).sum()
        assert ate < 0.03 * traj_len, f"ATE {ate:.4f} over {traj_len:.2f}m"
        # The loop edge is recorded and the spanning tree is consistent.
        assert len(sys.loop_closer.loop_edges) >= 1
        live = np.nonzero(st.kf_valid)[0]
        for k in live:
            p = st.kf_parent[k]
            assert p < 0 or st.kf_valid[p]


class TestRelocalizationEndToEnd:
    def test_blackout_then_relocalize(self, sequence):
        """Occlusion blackout: tracking goes LOST on featureless frames and
        must relocalize via the BoW database when imagery returns
        (Tracking.cc:969-1131 driven end-to-end through track_monocular)."""
        frames, poses = sequence
        sys = make_system()
        for i, f in enumerate(frames):
            sys.track_monocular(f, timestamp=i / 30.0)
        assert sys.state == TrackingState.OK
        assert sys.store.n_keyframes() > 5, "need a mature map for this test"
        black = np.zeros((H, W), np.float32)
        for j in range(5):
            state, _ = sys.track_monocular(black, timestamp=(40 + j) / 30.0)
        assert sys.state == TrackingState.LOST
        # Replay late-sequence imagery: the relocalizer must recover.
        recovered = False
        for i, f in enumerate(frames[30:]):
            state, _ = sys.track_monocular(f, timestamp=(45 + i) / 30.0)
            if state == TrackingState.OK:
                recovered = True
                break
        assert recovered, "failed to relocalize after blackout"


class TestFisheyeEndToEnd:
    def test_fisheye_full_pipeline(self):
        """BASELINE config 3: the FULL pipeline on an equidistant-distortion
        (fisheye) sequence — init, tracking, mapping — with the same ATE
        gate as the pinhole run. The renderer bends each pixel ray by the
        exact inverse of the camera model's undistortion (Frame.cc:355-384),
        so residual error measures the pipeline, not the test rig."""
        from os1_tpu.io import synthetic

        scene = synthetic.default_scene(seed=3)
        poses = synthetic.orbit_trajectory(40, advance=0.08)
        frames = [
            synthetic.render(scene, T, K, H, W, fisheye=True) for T in poses
        ]
        cam = Camera.make(fx=K[0, 0], fy=K[1, 1], cx=K[0, 2], cy=K[1, 2],
                          width=W, height=H, fisheye=True)
        cfg = SlamConfig(
            camera=cam,
            orb=OrbConfig(height=H, width=W, n_features=512, n_levels=4),
            map=MapConfig(max_keyframes=64, max_points=8192, n_features=512),
        )
        sys = System(cfg=cfg)
        est, gt = [], []
        for i, f in enumerate(frames):
            state, Tcw = sys.track_monocular(f, timestamp=i / 30.0)
            if state == TrackingState.OK and Tcw is not None:
                est.append(Tcw)
                gt.append(poses[i])
        assert len(est) > 25, f"fisheye tracked only {len(est)}/40"
        ate = synthetic.ate_rmse(est, gt)
        traj_len = np.linalg.norm(np.diff(
            np.array([-T[:3, :3].T @ T[:3, 3] for T in gt]), axis=0),
            axis=1).sum()
        assert ate < 0.02 * traj_len, f"fisheye ATE {ate:.4f} / {traj_len:.2f}"
