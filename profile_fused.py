"""Profile the per-frame device critical path on the real TPU.

Times each component of the fused tracking step in isolation:
extractor/frame-build, the hamming match at both shapes, the pose-opt
chain, and the full fused step. Prints a ms table.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, n=30, warm=3):
    for _ in range(warm):
        jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    from os1_tpu.features.orb import OrbConfig
    from os1_tpu.geometry.camera import Camera
    from os1_tpu.map.store import MapConfig
    from os1_tpu.pipeline import System, SlamConfig
    from os1_tpu.pipeline.frame import make_frame_builder
    from os1_tpu.matching import matchers
    from os1_tpu.optim import optimize_pose
    from os1_tpu.ops import hamming

    H, W = 480, 640
    cam = Camera.make(fx=400.0, fy=400.0, cx=320.0, cy=240.0, width=W, height=H)
    cfg = SlamConfig(
        camera=cam,
        orb=OrbConfig(height=H, width=W, n_features=1024, n_levels=8),
        map=MapConfig(max_keyframes=128, max_points=16384, n_features=1024),
    )
    N = cfg.orb.n_features
    L = cfg.th.max_local_points
    print(f"n_features={N} max_local_points={L}")

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (H, W), np.uint8)

    build = make_frame_builder(cfg.orb)

    # --- frame build (extract) ---
    def f_build():
        f = build(jnp.asarray(img), cam)
        return f.feats.desc
    ms = timeit(f_build)
    print(f"frame_build (incl h2d+extract dispatch wait): {ms:8.2f} ms")

    frame = build(jnp.asarray(img), cam)
    jax.block_until_ready(frame.feats.desc)

    # --- hamming matrix shapes ---
    da = jnp.asarray(rng.integers(0, 2**32, (L, 8), np.uint32).astype(np.uint32))
    db = jnp.asarray(rng.integers(0, 2**32, (N, 8), np.uint32).astype(np.uint32))
    f1 = jax.jit(hamming.hamming_matrix_mxu)
    print(f"hamming_mxu [{L}x{N}]: {timeit(lambda: f1(da, db)):8.2f} ms")
    f2 = jax.jit(hamming.hamming_matrix)
    print(f"hamming_vpu [{L}x{N}]: {timeit(lambda: f2(da, db)):8.2f} ms")

    # --- pose opt (3x4 GN schedule used by fused) at N and L widths ---
    for P, name in ((N, "N=1024"), (L, f"L={L}")):
        pts = jnp.asarray(rng.normal(0, 1, (P, 3)).astype(np.float32) + np.array([0, 0, 5], np.float32))
        uv = jnp.asarray(rng.uniform(0, 640, (P, 2)).astype(np.float32))
        s2 = jnp.ones(P)
        v = jnp.ones(P, bool)
        intr = jnp.asarray(cfg.intr)
        po = jax.jit(lambda: optimize_pose(jnp.eye(4), pts, uv, s2, v, intr,
                                           rounds=3, iters_per_round=4,
                                           accept_reject=False).Tcw)
        print(f"pose_opt 3x4 GN [{name}]: {timeit(po):8.2f} ms")

    # --- search_by_projection at local-map shape ---
    feats = frame.feats._replace(xy=frame.xy_un)
    sbp = jax.jit(lambda: matchers.search_by_projection(
        point_desc=da, point_uv=jnp.zeros((L, 2)),
        point_valid=jnp.ones(L, bool), point_octave=jnp.zeros(L, jnp.int32),
        feats=feats, radius=jnp.full(L, 4.0), ratio=0.8, max_dist=100,
        octave_lo=-1, octave_hi=1).idx)
    print(f"search_by_projection [{L}x{N}]: {timeit(sbp):8.2f} ms")

    # --- full fused step against a populated mirror ---
    sys_ = System(cfg=cfg, pipelined=True, async_mapping=False)
    from os1_tpu.pipeline import tracking_fused
    sys_.tracker._fused = tracking_fused.make_fused_tracker(cfg)
    mir = sys_.mirror
    intr = jnp.asarray(cfg.intr)
    eye = jnp.eye(4)
    fused = sys_.tracker._fused

    def run_fused():
        out = fused(
            mir.pt_xyz, mir.pt_desc, mir.pt_valid, mir.pt_normal,
            mir.pt_min_dist, mir.pt_max_dist,
            mir.kf_desc, mir.kf_angle, mir.kf_obs_point,
            frame, cam, intr,
            eye, eye, jnp.full(N, -1, jnp.int32), frame.feats.octave,
            jnp.int32(0), jnp.bool_(False),
            jnp.zeros(L, jnp.int32), jnp.zeros(L, bool), jnp.bool_(True),
        )
        return out["packed"]
    print(f"fused step (empty mirror, has_vel): {timeit(run_fused):8.2f} ms")

    # populated: realistic binds so the motion branch does real work
    lb = jnp.asarray(rng.integers(0, 4096, N).astype(np.int32))
    lv = jnp.ones(L, bool)
    li = jnp.asarray(rng.integers(0, 16384, L).astype(np.int32))

    def run_fused2():
        out = fused(
            mir.pt_xyz, mir.pt_desc, mir.pt_valid, mir.pt_normal,
            mir.pt_min_dist, mir.pt_max_dist,
            mir.kf_desc, mir.kf_angle, mir.kf_obs_point,
            frame, cam, intr,
            eye, eye, lb, frame.feats.octave,
            jnp.int32(0), jnp.bool_(True),
            li, lv, jnp.bool_(True),
        )
        return out["packed"]
    print(f"fused step (binds+local ids): {timeit(run_fused2):8.2f} ms")

    # --- e2e: build + fused + readback, pipelined-style ---
    def e2e():
        f = build(jnp.asarray(img), cam)
        out = fused(
            mir.pt_xyz, mir.pt_desc, mir.pt_valid, mir.pt_normal,
            mir.pt_min_dist, mir.pt_max_dist,
            mir.kf_desc, mir.kf_angle, mir.kf_obs_point,
            f, cam, intr,
            eye, eye, lb, f.feats.octave,
            jnp.int32(0), jnp.bool_(True),
            li, lv, jnp.bool_(True),
        )
        return np.asarray(out["packed"])
    ms = timeit(e2e, n=30)
    print(f"e2e build+fused+readback sync: {ms:8.2f} ms  ({1e3/ms:.1f} fps ceiling)")


if __name__ == "__main__":
    main()
