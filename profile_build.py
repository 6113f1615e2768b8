"""Async map-building probe: run the bench configuration once (warmup +
timed pass) and print map stats + the stage table — the fast feedback loop
for scheduling changes (no localization laps, no loop sequence)."""
import sys
import time

import numpy as np

from bench import FPS_BASELINE, build_system, orbit_frames


def main():
    depth = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    th = {}
    for kv in sys.argv[2:]:
        k, v = kv.split("=", 1)
        th[k] = eval(v)  # noqa: S307 — operator-provided CLI values
    from os1_tpu.io import synthetic
    from os1_tpu.pipeline import TrackingState

    frames, poses = orbit_frames()
    sys_ = build_system(**th)
    sys_.tracker.pipeline_depth = depth
    sys_.warmup()
    for i, img in enumerate(frames):
        sys_.track_monocular(img, timestamp=i / FPS_BASELINE)
    sys_.flush()
    sys_.shutdown()
    print(f"warm pass: {sys_.store.n_keyframes()} KFs {sys_.store.n_points()} pts",
          flush=True)

    sys_ = build_system(**th)
    sys_.tracker.pipeline_depth = depth
    states = []
    t0 = time.time()
    for i, img in enumerate(frames):
        s, _ = sys_.track_monocular(img, timestamp=i / FPS_BASELINE)
        states.append(s)
    sys_.flush()
    dt = time.time() - t0
    ok = np.array([s == TrackingState.OK for s in states])
    first = int(np.argmax(ok)) if ok.any() else len(ok)
    traj = sys_.frame_trajectory()
    est = [T for (_, fid, T) in traj]
    gt = [poses[fid] for (_, fid, _) in traj]
    ate = synthetic.ate_rmse(est, gt) if len(est) >= 10 else float("nan")
    print(
        f"depth {depth}: {len(frames)/dt:.1f} fps  ok {ok[first:].mean():.3f}  "
        f"ATE {ate:.3f}  KFs {sys_.store.n_keyframes()} "
        f"pts {sys_.store.n_points()}  loops {sys_.loop_closer.n_loops_closed}  "
        f"lost {[i for i, s in enumerate(states) if not ok[i]][:20]}"
    )
    for fid, info in sys_.tracker.loss_log[:30]:
        print(f"  loss @{fid}: {info}")
    import sys as _s
    print(sys_.timer.report(), file=_s.stderr)
    sys_.shutdown()


if __name__ == "__main__":
    main()
