"""Diagnose bench-scene ATE: per-frame aligned error, lost-frame indices,
keyframe cadence. Mirrors bench.py's protocol (full warmup pass, reset,
logged pass) so the async timing dynamics match the measured benchmark."""
import numpy as np

from bench import FPS_BASELINE, N_FRAMES, build_system, orbit_frames


def run(sys_, frames):
    from os1_tpu.pipeline import TrackingState

    states = []
    for i, img in enumerate(frames):
        state, _ = sys_.track_monocular(img, timestamp=i / FPS_BASELINE)
        states.append(state)
    sys_.flush()
    return states


def main():
    from os1_tpu.io import synthetic
    from os1_tpu.pipeline import TrackingState

    frames, poses = orbit_frames()

    sys_ = build_system()
    sys_.warmup()
    run(sys_, frames)
    sys_.shutdown()

    sys_ = build_system()
    states = run(sys_, frames)

    lost = [i for i, s in enumerate(states) if s != TrackingState.OK]
    print(f"non-OK frames: {lost}")

    traj = sys_.frame_trajectory()
    est = [T for (_, fid, T) in traj]
    gt = [poses[fid] for (_, fid, _) in traj]
    fids = [fid for (_, fid, _) in traj]
    ate = synthetic.ate_rmse(est, gt)
    print(f"ATE {ate:.4f} over {len(est)} frames, "
          f"KFs={sys_.store.n_keyframes()} pts={sys_.store.n_points()} "
          f"loops={sys_.loop_closer.n_loops_closed}")

    # Per-frame aligned error profile (the same Sim3 alignment ate_rmse uses).
    err = synthetic.aligned_errors(est, gt)
    for lo in range(0, len(err), 20):
        hi = min(lo + 20, len(err))
        bar = "#" * int(err[lo:hi].mean() * 40)
        print(f"frames {fids[lo]:3d}-{fids[hi-1]:3d}: "
              f"mean {err[lo:hi].mean():.3f} max {err[lo:hi].max():.3f} {bar}")
    sys_.shutdown()


if __name__ == "__main__":
    main()
