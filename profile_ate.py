"""Diagnose bench-scene ATE: per-frame aligned error, lost-frame indices,
keyframe cadence. Mirrors bench.py's protocol (full warmup pass, reset,
logged pass) so the async timing dynamics match the measured benchmark."""
import sys
import time

import numpy as np

from bench import build_system, N_FRAMES, FPS_BASELINE


def run(sys_, frames, log=False):
    from os1_tpu.pipeline import TrackingState

    states = []
    for i, img in enumerate(frames):
        state, _ = sys_.track_monocular(img, timestamp=i / FPS_BASELINE)
        states.append(int(state))
    sys_.flush()
    return states


def main():
    from os1_tpu.io import synthetic

    K = np.array([[400.0, 0, 320.0], [0, 400.0, 240.0], [0, 0, 1.0]])
    scene = synthetic.default_scene(seed=1)
    poses = synthetic.orbit_trajectory(N_FRAMES, advance=0.05)
    frames = [
        np.clip(synthetic.render(scene, T, K, 480, 640), 0, 255).astype(np.uint8)
        for T in poses
    ]

    sys_ = build_system()
    sys_.warmup()
    run(sys_, frames)
    sys_.shutdown()

    sys_ = build_system()
    states = run(sys_, frames, log=True)
    from os1_tpu.pipeline import TrackingState

    lost = [i for i, s in enumerate(states) if s != int(TrackingState.OK)]
    print(f"non-OK frames: {lost}")

    traj = sys_.frame_trajectory()
    est = [T for (_, fid, T) in traj]
    gt = [poses[fid] for (_, fid, _) in traj]
    fids = [fid for (_, fid, _) in traj]
    ate = synthetic.ate_rmse(est, gt)
    print(f"ATE {ate:.4f} over {len(est)} frames, "
          f"KFs={sys_.store.n_keyframes()} pts={sys_.store.n_points()} "
          f"loops={sys_.loop_closer.n_loops_closed}")

    # Per-frame aligned error profile (same Sim3 alignment as ate_rmse).
    pe = np.array([-T[:3, :3].T @ T[:3, 3] for T in est])
    pg = np.array([-T[:3, :3].T @ T[:3, 3] for T in gt])
    mu_e, mu_g = pe.mean(0), pg.mean(0)
    ec, gc = pe - mu_e, pg - mu_g
    cov = gc.T @ ec / len(pe)
    U, d, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    var_e = (ec ** 2).sum() / len(pe)
    scale = np.trace(np.diag(d) @ S) / max(var_e, 1e-12)
    t = mu_g - scale * R @ pe.mean(0)
    aligned = (scale * (R @ pe.T)).T + t
    err = np.linalg.norm(aligned - pg, axis=1)
    print(f"alignment scale={scale:.4f}")
    for lo in range(0, len(err), 20):
        hi = min(lo + 20, len(err))
        bar = "#" * int(err[lo:hi].mean() * 40)
        print(f"frames {fids[lo]:3d}-{fids[hi-1]:3d}: "
              f"mean {err[lo:hi].mean():.3f} max {err[lo:hi].max():.3f} {bar}")
    sys_.shutdown()


if __name__ == "__main__":
    main()
