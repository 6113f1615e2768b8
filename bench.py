"""Benchmark: steady-state monocular tracking throughput on one TPU chip.

Runs the full SLAM pipeline (ORB extraction -> matching -> pose optimization
-> local mapping + Schur BA on keyframes) over a rendered synthetic 640x480
sequence and reports tracked frames/s.

Baseline: the reference system's design target is real-time at camera fps
(30 fps, BASELINE.md "Live webcam operation"); vs_baseline = fps / 30.
North-star target is >= 5x real time per chip (BASELINE.json).

Prints exactly one JSON line.
"""
import json
import time

import numpy as np


def main():
    import jax

    from os1_tpu.features.orb import OrbConfig
    from os1_tpu.geometry.camera import Camera
    from os1_tpu.io import synthetic
    from os1_tpu.map.store import MapConfig
    from os1_tpu.pipeline import System, SlamConfig, TrackingState

    H, W = 480, 640
    K = np.array([[400.0, 0, 320.0], [0, 400.0, 240.0], [0, 0, 1.0]])
    cam = Camera.make(fx=400.0, fy=400.0, cx=320.0, cy=240.0, width=W, height=H)
    cfg = SlamConfig(
        camera=cam,
        orb=OrbConfig(height=H, width=W, n_features=1024, n_levels=8),
        map=MapConfig(max_keyframes=128, max_points=16384, n_features=1024),
    )
    sys_ = System(cfg=cfg, pipelined=True)

    scene = synthetic.default_scene(seed=1)
    poses = synthetic.orbit_trajectory(80, advance=0.05)
    frames = [synthetic.render(scene, T, K, H, W) for T in poses]

    # Warmup: initialization + first keyframes trigger all compiles.
    n_warm = 30
    for i in range(n_warm):
        sys_.track_monocular(frames[i], timestamp=i / 30.0)

    t0 = time.time()
    n_timed = 0
    n_ok = 0
    for i in range(n_warm, len(frames)):
        state, _ = sys_.track_monocular(frames[i], timestamp=i / 30.0)
        n_timed += 1
        n_ok += state == TrackingState.OK
    sys_.flush()  # drain the pipelined in-flight frame
    dt = time.time() - t0
    fps = n_timed / dt

    print(
        json.dumps(
            {
                "metric": "tracked_frames_per_s_per_chip",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / 30.0, 3),
                "detail": {
                    "frames_timed": n_timed,
                    "ok_fraction": round(n_ok / max(n_timed, 1), 3),
                    "n_keyframes": sys_.store.n_keyframes(),
                    "n_points": sys_.store.n_points(),
                    "platform": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
