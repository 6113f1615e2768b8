"""Benchmark: steady-state monocular SLAM on one TPU chip.

Runs the full pipeline (ORB extraction -> fused tracking -> keyframe events:
triangulation, fusion, Schur local BA -> loop closing) over a rendered
synthetic 640x480 sequence and reports the full metric triple of
BASELINE.json ("ATE RMSE; tracked frames/s/chip; local-BA iters/s") plus
frame-latency percentiles and a per-stage wall-time breakdown.

Protocol: the WHOLE sequence runs once as warmup (every device program,
including all BA bucket shapes hit on this trajectory, compiles there), the
system is reset, and the timed pass re-runs the identical sequence — so the
timed region measures steady state, not compilation.

Baseline: the reference's design target is real-time at camera fps
(30 fps, BASELINE.md "Live webcam operation"); vs_baseline = fps / 30.
North-star target is >= 5x real time per chip (BASELINE.json).

Prints exactly one JSON line on stdout (stage table goes to stderr).
"""
import json
import sys
import time

import numpy as np

N_FRAMES = 300
FPS_BASELINE = 30.0


def build_system():
    from os1_tpu.features.orb import OrbConfig
    from os1_tpu.geometry.camera import Camera
    from os1_tpu.map.store import MapConfig
    from os1_tpu.pipeline import System, SlamConfig

    H, W = 480, 640
    cam = Camera.make(fx=400.0, fy=400.0, cx=320.0, cy=240.0, width=W, height=H)
    cfg = SlamConfig(
        camera=cam,
        orb=OrbConfig(height=H, width=W, n_features=1024, n_levels=8),
        map=MapConfig(max_keyframes=128, max_points=16384, n_features=1024),
    )
    return System(cfg=cfg, pipelined=True, async_mapping=True)


def run_sequence(sys_, frames):
    """Track every frame; returns (wall dt, per-frame latencies, ok count,
    estimated trajectory aligned to frame ids)."""
    from os1_tpu.pipeline import TrackingState

    lat = np.zeros(len(frames))
    n_ok = 0
    t0 = time.time()
    for i, img in enumerate(frames):
        f0 = time.perf_counter()
        state, _ = sys_.track_monocular(img, timestamp=i / FPS_BASELINE)
        lat[i] = time.perf_counter() - f0
        n_ok += state == TrackingState.OK
    sys_.flush()  # drain the pipelined in-flight frame
    dt = time.time() - t0
    return dt, lat, n_ok


def main():
    import jax

    from os1_tpu.io import synthetic

    K = np.array([[400.0, 0, 320.0], [0, 400.0, 240.0], [0, 0, 1.0]])
    scene = synthetic.default_scene(seed=1)
    poses = synthetic.orbit_trajectory(N_FRAMES, advance=0.05)
    # uint8 frames: what a camera delivers, and 4x cheaper on the tunneled
    # h2d path than float32 (the frame builder converts on device).
    frames = [
        np.clip(synthetic.render(scene, T, K, 480, 640), 0, 255).astype(np.uint8)
        for T in poses
    ]

    # Warmup: explicit compile of every device program + bucket shape, then
    # one full pass for anything data-dependent.
    sys_ = build_system()
    warm_s = sys_.warmup()
    run_sequence(sys_, frames)
    sys_.shutdown()

    # Timed pass on a fresh system: identical shapes, zero compiles.
    sys_ = build_system()
    dt, lat, n_ok = run_sequence(sys_, frames)
    fps = len(frames) / dt

    # ---- metric triple ----
    # ATE RMSE vs the rendered ground truth (Sim3-aligned, monocular).
    traj = sys_.frame_trajectory()
    est = [T for (_, fid, T) in traj]
    gt = [poses[fid] for (_, fid, _) in traj]
    ate = synthetic.ate_rmse(est, gt) if len(est) >= 10 else float("nan")

    # Local-BA iters/s: LM iterations executed / local-BA wall time.
    ba_wall = sys_.timer.totals.get("lm.local_ba", 0.0)
    ba_iters_s = sys_.mapper.ba_iters / ba_wall if ba_wall > 0 else 0.0

    stage_ms = {
        name: round(tot / max(sys_.timer.counts[name], 1) * 1e3, 2)
        for name, tot in sorted(sys_.timer.totals.items(), key=lambda kv: -kv[1])
    }
    print(sys_.timer.report(), file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "tracked_frames_per_s_per_chip",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / FPS_BASELINE, 3),
                "detail": {
                    "ate_rmse": round(ate, 5),
                    "local_ba_iters_per_s": round(ba_iters_s, 1),
                    "frame_latency_ms_p50": round(float(np.percentile(lat, 50)) * 1e3, 2),
                    "frame_latency_ms_p99": round(float(np.percentile(lat, 99)) * 1e3, 2),
                    "frames_timed": len(frames),
                    "ok_fraction": round(n_ok / len(frames), 3),
                    "n_keyframes": sys_.store.n_keyframes(),
                    "n_points": sys_.store.n_points(),
                    "n_loops_closed": sys_.loop_closer.n_loops_closed,
                    "stage_ms_per_call": stage_ms,
                    "platform": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
