"""End-to-end tests of the overlapped pipelines.

The SHIPPED configuration (bench.py, run_slam) is `pipelined=True,
coop_mapping=True`: frame pipelining over the device chain + the cooperative
mapping scheduler (workers.py CoopScheduler) that advances keyframe events
as generator micro-steps between tracked frames. It is DETERMINISTIC by
construction, so its test asserts the same accuracy class as the
synchronous path and bit-identical repeatability.

The worker-THREAD topology (async_mapping=True — the reference's
System.cc:63-83 thread layout) is kept for parity and multi-core hosts; its
timing is OS-scheduler-dependent, so its test checks wiring and map
integrity, with only a coarse no-corruption accuracy bound (on a 2-core CI
host the mapping worker can lag an arbitrary number of keyframes).
"""
import hashlib

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


def run_through(sys, frames):
    states = []
    for i, f in enumerate(frames):
        state, _ = sys.track_monocular(f, timestamp=i / 30.0)
        states.append(state)
    sys.flush()
    return states


def traj_ate(sys, poses):
    traj = sys.frame_trajectory()
    est = [T for (_, fid, T) in traj]
    gt = [poses[fid] for (_, fid, _) in traj]
    ate = synthetic.ate_rmse(est, gt)
    traj_len = np.linalg.norm(np.diff(
        np.array([-T[:3, :3].T @ T[:3, 3] for T in gt]), axis=0),
        axis=1).sum()
    sha = hashlib.sha256(
        np.ascontiguousarray(np.stack(est)).tobytes()
    ).hexdigest()[:16]
    return ate, traj_len, len(est), sha


class TestCoopPipeline:
    """The shipped bench configuration: pipelined + cooperative mapping."""

    def test_coop_tracks_and_maps(self, sequence):
        frames, poses = sequence
        sys = make_system(pipelined=True, coop_mapping=True)
        try:
            states = run_through(sys, frames)
            first_ok = next(
                i for i, s in enumerate(states) if s == TrackingState.OK
            )
            assert first_ok < 10, [s.name for s in states[:12]]
            ok_after = [s == TrackingState.OK for s in states[first_ok:]]
            assert np.mean(ok_after) > 0.9, [s.name for s in states]
            assert sys.store.n_keyframes() >= 3
            assert sys.store.n_points() > 100
            # Deferred keyframes must all have materialized in the scheduler:
            # every valid keyframe has real feature arrays.
            live = np.nonzero(sys.store.kf_valid)[0]
            assert all(sys.store.kf_feat_valid[k].any() for k in live)
            assert not sys._pending_frames  # nothing left un-materialized
            assert not sys.coop.busy()

            ate, traj_len, n_est, _ = traj_ate(sys, poses)
            assert n_est > 25
            # Same accuracy class as the synchronous path: the cooperative
            # interleave adds bounded (deterministic) mapping lag, not
            # scheduler-dependent drift.
            assert ate < 0.04 * traj_len, f"ATE {ate:.4f} over {traj_len:.2f}"
        finally:
            sys.shutdown()

    def test_coop_deterministic(self, sequence):
        """Two coop runs must produce bit-identical trajectories — the
        reference's seeded-replay regression property (Initializer.cc:80)
        held by the SHIPPED overlapped configuration, not just sync mode."""
        frames, poses = sequence
        shas = []
        for _ in range(2):
            sys = make_system(pipelined=True, coop_mapping=True)
            try:
                run_through(sys, frames)
                shas.append(traj_ate(sys, poses)[3])
            finally:
                sys.shutdown()
        assert shas[0] == shas[1], shas

    def test_coop_reset_mid_sequence(self, sequence):
        """Reset with queued keyframe events must drop them cleanly and
        re-initialize."""
        frames, _ = sequence
        sys = make_system(pipelined=True, coop_mapping=True)
        try:
            for i, f in enumerate(frames[:20]):
                sys.track_monocular(f, timestamp=i / 30.0)
            sys.reset()
            assert not sys._pending_frames
            assert not sys.coop.busy()
            states = []
            for i, f in enumerate(frames):
                state, _ = sys.track_monocular(f, timestamp=1.0 + i / 30.0)
                states.append(state)
            sys.flush()
            assert TrackingState.OK in states
        finally:
            sys.shutdown()


class TestThreadedPipeline:
    """The reference's worker-thread topology (parity mode)."""

    def test_async_tracks_and_maps(self, sequence):
        """Wiring + map integrity under real concurrency. Accuracy here is
        scheduler-dependent (the worker can lag arbitrarily on a 2-core
        host); the bound below catches map corruption, not drift — the
        shipped coop configuration carries the tight gate."""
        frames, poses = sequence
        sys = make_system(pipelined=True, async_mapping=True)
        try:
            states = run_through(sys, frames)
            first_ok = next(
                i for i, s in enumerate(states) if s == TrackingState.OK
            )
            assert first_ok < 10, [s.name for s in states[:12]]
            ok_after = [s == TrackingState.OK for s in states[first_ok:]]
            assert np.mean(ok_after) > 0.85, [s.name for s in states]
            assert sys.store.n_keyframes() >= 3
            assert sys.store.n_points() > 100
            live = np.nonzero(sys.store.kf_valid)[0]
            assert all(sys.store.kf_feat_valid[k].any() for k in live)
            assert not sys._pending_frames  # nothing left un-materialized

            ate, traj_len, n_est, _ = traj_ate(sys, poses)
            assert n_est > 25
            assert ate < 0.15 * traj_len, f"ATE {ate:.4f} over {traj_len:.2f}"
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
