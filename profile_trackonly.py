"""Pure tracking throughput: build a map on the orbit sequence, freeze it
(localization mode), and re-track the whole sequence with zero mapper work.
This isolates the per-frame pipelined tracking chain (h2d upload ->
extract -> fused step -> async packed readback) from keyframe-event
contention — the fps ceiling scheduling can reach without touching kernels."""
import time

import numpy as np

from bench import FPS_BASELINE, build_system, orbit_frames


def main():
    import sys as _s

    from os1_tpu.pipeline import TrackingState

    depths = [int(d) for d in (_s.argv[1:] or ["1", "2", "3"])]
    frames, poses = orbit_frames()
    sys_ = build_system()
    sys_.tracker.pipeline_depth = 1  # map-building at the known-good depth
    sys_.warmup()
    # Mapping pass: build the map.
    for i, img in enumerate(frames):
        sys_.track_monocular(img, timestamp=i / FPS_BASELINE)
    sys_.flush()
    print(f"map built: {sys_.store.n_keyframes()} KFs {sys_.store.n_points()} pts",
          flush=True)

    sys_.activate_localization_mode()
    for depth in depths:
        sys_.tracker.pipeline_depth = depth
        # Warmup lap (no compiles expected; chain reseeds).
        for i, img in enumerate(frames[:50]):
            sys_.track_monocular(img, timestamp=i / FPS_BASELINE)
        sys_.flush()

        lat = np.zeros(len(frames))
        n_ok = 0
        sys_.timer.totals.clear()
        sys_.timer.counts.clear()
        t0 = time.time()
        for i, img in enumerate(frames):
            f0 = time.perf_counter()
            state, _ = sys_.track_monocular(img, timestamp=i / FPS_BASELINE)
            lat[i] = time.perf_counter() - f0
            n_ok += state == TrackingState.OK
        sys_.flush()
        dt = time.time() - t0
        print(
            f"depth {depth}: {len(frames)/dt:.1f} fps  "
            f"p50 {np.percentile(lat,50)*1e3:.1f} ms  "
            f"p99 {np.percentile(lat,99)*1e3:.1f} ms  ok {n_ok}/{len(frames)}",
            flush=True,
        )
        for name in ("trk.extract", "trk.local_select", "trk.readback"):
            tot = sys_.timer.totals.get(name, 0.0)
            cnt = sys_.timer.counts.get(name, 1)
            print(f"  {name}: {tot/max(cnt,1)*1e3:.2f} ms/call x{cnt}")
    sys_.shutdown()


if __name__ == "__main__":
    main()
