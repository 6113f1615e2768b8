"""Async map-building probe: run the bench configuration once (warmup +
timed pass) and print map stats + the stage table — the fast feedback loop
for scheduling changes (no localization laps, no loop sequence)."""
import sys
import time

import numpy as np

from bench import FPS_BASELINE, build_system, loop_frames, orbit_frames


def build(mode, th):
    """mode: async (bench config), pipe-inline (pipelined tracking + inline
    mapping — deterministic), workers (async workers + unpipelined
    tracking), sync (fully deterministic)."""
    from os1_tpu.pipeline import System

    if mode == "async":
        return build_system(**th)
    if mode == "sync":
        return build_system(sync=True, **th)
    base = build_system(sync=True, **th)  # thresholds only
    cfg = base.cfg
    if mode == "pipe-inline":
        return System(cfg=cfg, pipelined=True, async_mapping=False)
    if mode == "workers":
        return System(cfg=cfg, pipelined=False, async_mapping=True)
    raise SystemExit(f"unknown mode {mode}")


def main():
    depth = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    mode = "async"
    th = {}
    for kv in sys.argv[2:]:
        if "=" not in kv:
            mode = kv
            continue
        k, v = kv.split("=", 1)
        th[k] = eval(v)  # noqa: S307 — operator-provided CLI values
    from os1_tpu.io import synthetic
    from os1_tpu.pipeline import TrackingState

    seq = orbit_frames
    if mode.startswith("loop-"):
        seq, mode = loop_frames, mode[5:]
    frames, poses = seq()
    sys_ = build(mode, th)
    sys_.tracker.pipeline_depth = depth
    sys_.warmup()
    for i, img in enumerate(frames):
        sys_.track_monocular(img, timestamp=i / FPS_BASELINE)
    sys_.flush()
    sys_.shutdown()
    print(f"warm pass: {sys_.store.n_keyframes()} KFs {sys_.store.n_points()} pts",
          flush=True)

    sys_ = build(mode, th)
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
        f"{mode} depth {depth}: {len(frames)/dt:.1f} fps  ok {ok[first:].mean():.3f}  "
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
