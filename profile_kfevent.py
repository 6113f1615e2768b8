"""Isolated device timings of the keyframe-event programs on the real TPU:
triangulation batch, fuse batch (both buckets), local-BA buckets, and the
fused sim3 candidate program. These run on the mapping/loop workers but
share the single chip with the tracker — their device time directly stalls
frames."""
import time

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, n=10, warm=2):
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
    from os1_tpu.pipeline.config import SlamConfig
    from os1_tpu.pipeline import tracking_kernels as tk

    H, W = 480, 640
    cam = Camera.make(fx=400.0, fy=400.0, cx=320.0, cy=240.0, width=W, height=H)
    cfg = SlamConfig(
        camera=cam,
        orb=OrbConfig(height=H, width=W, n_features=1024, n_levels=8),
        map=MapConfig(max_keyframes=128, max_points=16384, n_features=1024),
    )
    N = cfg.orb.n_features
    NB = cfg.th.triangulation_neighbors
    rng = np.random.default_rng(0)

    K3 = jnp.asarray(np.array([[400.0, 0, 320], [0, 400, 240], [0, 0, 1]], np.float32))
    sigma2 = jnp.asarray(cfg.sigma2_table)

    def rand_T():
        th = rng.normal(0, 0.1, 3)
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = rng.normal(0, 0.5, 3)
        return T

    # --- triangulation batch ---
    T_new = jnp.asarray(rand_T())
    T_nb = jnp.asarray(np.stack([rand_T() for _ in range(NB)]))
    xy = jnp.asarray(rng.uniform(0, 600, (N, 2)).astype(np.float32))
    desc = jnp.asarray(rng.integers(0, 2**32, (N, 8), dtype=np.uint64).astype(np.uint32))
    ang = jnp.asarray(rng.uniform(-3, 3, N).astype(np.float32))
    octv = jnp.asarray(rng.integers(0, 8, N).astype(np.int32))
    unb = jnp.asarray(rng.random(N) < 0.7)
    nb_xy = jnp.asarray(rng.uniform(0, 600, (NB, N, 2)).astype(np.float32))
    nb_desc = jnp.asarray(rng.integers(0, 2**32, (NB, N, 8), dtype=np.uint64).astype(np.uint32))
    nb_ang = jnp.asarray(rng.uniform(-3, 3, (NB, N)).astype(np.float32))
    nb_oct = jnp.asarray(rng.integers(0, 8, (NB, N)).astype(np.int32))
    nb_unb = jnp.asarray(rng.random((NB, N)) < 0.7)

    def tri():
        return tk.triangulate_with_neighbors_batch(
            T_new, T_nb, xy, desc, ang, octv, unb,
            nb_xy, nb_desc, nb_ang, nb_oct, nb_unb,
            K3, sigma2, jnp.float32(1.0),
        )[1]
    print(f"triangulate NB={NB} N={N}:   {timeit(tri):8.2f} ms")

    # --- fuse batch, both buckets ---
    T_FUSE = 46
    for C in (1024, 4096):
        S = C
        tgt_T = jnp.asarray(np.stack([rand_T() for _ in range(T_FUSE)]))
        tgt_xy = jnp.asarray(rng.uniform(0, 600, (T_FUSE, N, 2)).astype(np.float32))
        tgt_angle = jnp.asarray(rng.uniform(-3, 3, (T_FUSE, N)).astype(np.float32))
        tgt_oct = jnp.asarray(rng.integers(0, 8, (T_FUSE, N)).astype(np.int32))
        tgt_desc = jnp.asarray(rng.integers(0, 2**32, (T_FUSE, N, 8), dtype=np.uint64).astype(np.uint32))
        tgt_valid = jnp.asarray(np.ones((T_FUSE, N), bool))
        cand_idx = jnp.asarray(rng.integers(0, S, (T_FUSE, C)).astype(np.int32))
        cand_valid = jnp.asarray(np.ones((T_FUSE, C), bool))
        sl_xyz = jnp.asarray(rng.normal(0, 2, (S, 3)).astype(np.float32))
        sl_desc = jnp.asarray(rng.integers(0, 2**32, (S, 8), dtype=np.uint64).astype(np.uint32))
        sl_max = jnp.asarray(np.full(S, 10.0, np.float32))

        def fuse():
            return tk.fuse_batch(
                tgt_T, tgt_xy, tgt_angle, tgt_oct, tgt_desc, tgt_valid,
                cand_idx, cand_valid, sl_xyz, sl_desc, sl_max,
                jnp.asarray(cfg.intr), jnp.float32(W), jnp.float32(H),
                jnp.float32(cfg.orb.scale_factor), n_levels=cfg.orb.n_levels,
            )
        print(f"fuse T=46 C={C}:        {timeit(fuse):8.2f} ms")

    # --- local BA buckets ---
    from os1_tpu.optim import ba_begin, ba_iterate, ba_result
    from os1_tpu.optim.ba_core import BAProblem

    for (P, C) in ((2048, 32), (8192, 64)):
        O = 8
        pts = rng.normal(0, 2, (P, 3)).astype(np.float32)
        prob = BAProblem(
            cam_T=jnp.asarray(np.stack([rand_T() for _ in range(C)])),
            cam_fixed=jnp.asarray(np.arange(C) < 2),
            points=jnp.asarray(pts),
            point_valid=jnp.ones(P, bool),
            obs_cam=jnp.asarray(rng.integers(0, C, (P, O)).astype(np.int32)),
            obs_uv=jnp.asarray(rng.uniform(0, 600, (P, O, 2)).astype(np.float32)),
            obs_sigma2=jnp.ones((P, O)),
            obs_valid=jnp.asarray(rng.random((P, O)) < 0.5),
            intr=jnp.asarray(cfg.intr),
        )
        st = jax.jit(ba_begin)(prob)
        it = jax.jit(ba_iterate, static_argnames=("n",))

        def ba5():
            return it(prob, st, n=5)
        print(f"local BA P={P} C={C} 5it: {timeit(ba5):8.2f} ms")

    # --- sim3 candidate program ---
    from os1_tpu.pipeline import loop_closing as lc

    snap = dict(
        desc1=desc, bound1=unb, angle1=ang, xy1=xy, oct1=octv,
        feat_valid1=jnp.ones(N, bool),
        xyz1=jnp.asarray(rng.normal(0, 2, (N, 3)).astype(np.float32)),
        desc2=nb_desc[0], bound2=nb_unb[0], angle2=nb_ang[0], xy2=nb_xy[0],
        oct2=nb_oct[0],
        xyz2=jnp.asarray(rng.normal(0, 2, (N, 3)).astype(np.float32)),
        region_desc=jnp.asarray(rng.integers(0, 2**32, (lc.PROJ_CAP, 8), dtype=np.uint64).astype(np.uint32)),
        region_xyz=jnp.asarray(rng.normal(0, 2, (lc.PROJ_CAP, 3)).astype(np.float32)),
        region_ok=jnp.ones(lc.PROJ_CAP, bool),
        T_lw=jnp.asarray(rand_T()),
    )
    key = jax.random.PRNGKey(0)

    def sim3():
        return lc._sim3_candidate_program(
            **snap, intr=jnp.asarray(cfg.intr), sigma2_table=sigma2, key=key
        )[0]
    print(f"sim3 candidate program:  {timeit(sim3):8.2f} ms")


if __name__ == "__main__":
    main()
