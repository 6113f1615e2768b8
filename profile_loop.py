"""Isolate the steady-state tracking-loop ceiling on the real TPU.

Builds the bench system, initializes on the first frames of the bench
trajectory, then re-tracks a slice of frames with keyframe creation
suppressed — no mapper/loop device programs compete for the chip — and
reports pure-tracking fps. The gap between this and the full-bench fps is
what keyframe events cost; the gap between this and 1/(device time) is
host/dispatch/transfer overhead.
"""
import time

import numpy as np


def main():
    from os1_tpu.features.orb import OrbConfig
    from os1_tpu.geometry.camera import Camera
    from os1_tpu.map.store import MapConfig
    from os1_tpu.pipeline import System, SlamConfig, TrackingState
    from os1_tpu.io import synthetic

    H, W = 480, 640
    K = np.array([[400.0, 0, 320.0], [0, 400.0, 240.0], [0, 0, 1.0]])
    cam = Camera.make(fx=400.0, fy=400.0, cx=320.0, cy=240.0, width=W, height=H)
    cfg = SlamConfig(
        camera=cam,
        orb=OrbConfig(height=H, width=W, n_features=1024, n_levels=8),
        map=MapConfig(max_keyframes=128, max_points=16384, n_features=1024),
    )
    scene = synthetic.default_scene(seed=1)
    poses = synthetic.orbit_trajectory(300, advance=0.05)
    frames = [
        np.clip(synthetic.render(scene, T, K, 480, 640), 0, 255).astype(np.uint8)
        for T in poses[:80]
    ]

    sys_ = System(cfg=cfg, pipelined=True, async_mapping=True)
    sys_.warmup()
    # Map the first stretch normally.
    for i, img in enumerate(frames[:60]):
        sys_.track_monocular(img, timestamp=i / 30.0)
    sys_.flush()

    # Suppress keyframe creation: tracking only, no mapper/loop programs.
    sys_.tracker.only_tracking = True

    # Warm pass over the loop slice (shapes already compiled).
    loop_frames = frames[40:60]
    for j, img in enumerate(loop_frames):
        sys_.track_monocular(img, timestamp=10.0 + j / 30.0)
    sys_.flush()

    for trial in range(3):
        t0 = time.perf_counter()
        n_ok = 0
        N = 0
        for rep in range(5):
            for j, img in enumerate(loop_frames):
                s, _ = sys_.track_monocular(img, timestamp=20.0 + N / 30.0)
                n_ok += s == TrackingState.OK
                N += 1
        sys_.flush()
        dt = time.perf_counter() - t0
        print(f"trial {trial}: pure-tracking {N/dt:6.2f} fps "
              f"({dt/N*1e3:.1f} ms/frame), ok={n_ok}/{N}")

    t = sys_.timer
    for name in ("trk.readback", "trk.local_select", "trk.extract"):
        if t.counts.get(name):
            print(f"  {name}: {t.totals[name]/t.counts[name]*1e3:.2f} ms/call "
                  f"x{t.counts[name]}")
    sys_.shutdown()


if __name__ == "__main__":
    main()
