"""End-to-end test of the ASYNC pipeline — the exact configuration bench.py
and run_slam use (pipelined tracker + MappingWorker/LoopWorker threads +
deferred keyframe materialization). The synchronous pipeline tests cannot
catch wiring bugs in the worker path (e.g. a renamed callback), and the
worker threads exercise the snapshot/dispatch/apply locking discipline under
real concurrency.
"""
import numpy as np
import pytest

from os1_tpu.geometry.camera import Camera
from os1_tpu.features.orb import OrbConfig
from os1_tpu.io import synthetic
from os1_tpu.map.store import MapConfig
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


class TestAsyncPipeline:
    def test_async_tracks_and_maps(self, sequence):
        """bench.py configuration: pipelined + async_mapping. Must
        initialize, keep tracking OK, build a map through the worker path
        (deferred materialization included), and shut down cleanly."""
        frames, poses = sequence
        sys = make_system(pipelined=True, async_mapping=True)
        try:
            states = []
            for i, f in enumerate(frames):
                state, _ = sys.track_monocular(f, timestamp=i / 30.0)
                states.append(state)
            sys.flush()  # drains the in-flight frame and keyframe queues

            first_ok = next(
                i for i, s in enumerate(states) if s == TrackingState.OK
            )
            assert first_ok < 10, [s.name for s in states[:12]]
            ok_after = [s == TrackingState.OK for s in states[first_ok:]]
            assert np.mean(ok_after) > 0.85, [s.name for s in states]
            assert sys.store.n_keyframes() >= 3
            assert sys.store.n_points() > 100
            # Deferred keyframes must all have materialized on the worker:
            # every valid keyframe has real feature arrays.
            live = np.nonzero(sys.store.kf_valid)[0]
            assert all(sys.store.kf_feat_valid[k].any() for k in live)
            assert not sys._pending_frames  # nothing left un-materialized

            # Trajectory accuracy matches the synchronous-path gate.
            traj = sys.frame_trajectory()
            est = [T for (_, fid, T) in traj]
            gt = [poses[fid] for (_, fid, _) in traj]
            assert len(est) > 25
            ate = synthetic.ate_rmse(est, gt)
            traj_len = np.linalg.norm(np.diff(
                np.array([-T[:3, :3].T @ T[:3, 3] for T in gt]), axis=0),
                axis=1).sum()
            # Much looser than the sync-path 2% gate: on the 2-core CI host
            # the mapping worker lags a scheduler-dependent number of
            # keyframes behind, so the tracker works against a staler mirror
            # than it ever would at real-time rates and the ATE varies run
            # to run. This gate catches map corruption, not accuracy — the
            # TPU bench measures (and gates) the honest number.
            assert ate < 0.06 * traj_len, f"ATE {ate:.4f} over {traj_len:.2f}"
        finally:
            sys.shutdown()

    def test_async_reset_mid_sequence(self, sequence):
        """Reset while workers hold queued keyframes must not deadlock or
        leave stale pending frames."""
        frames, _ = sequence
        sys = make_system(pipelined=True, async_mapping=True)
        try:
            for i, f in enumerate(frames[:20]):
                sys.track_monocular(f, timestamp=i / 30.0)
            sys.reset()
            assert not sys._pending_frames
            # Must re-initialize after the reset.
            states = []
            for i, f in enumerate(frames):
                state, _ = sys.track_monocular(f, timestamp=1.0 + i / 30.0)
                states.append(state)
            sys.flush()
            assert TrackingState.OK in states
        finally:
            sys.shutdown()
