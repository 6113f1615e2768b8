"""Isolate tunnel h2d/d2h latency vs device compute in the frame path."""
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
    from os1_tpu.pipeline.config import SlamConfig
    from os1_tpu.map.store import MapConfig
    from os1_tpu.pipeline.frame import make_frame_builder

    H, W = 480, 640
    cam = Camera.make(fx=400.0, fy=400.0, cx=320.0, cy=240.0, width=W, height=H)
    cfg = SlamConfig(camera=cam, orb=OrbConfig(height=H, width=W, n_features=1024, n_levels=8),
                     map=MapConfig(max_keyframes=128, max_points=16384, n_features=1024))
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (H, W), np.uint8)

    # h2d of the image alone
    print(f"h2d 307KB uint8 (device_put, blocked): {timeit(lambda: jax.device_put(img)):8.2f} ms")
    small = np.zeros(16, np.int32)
    print(f"h2d 64B (device_put, blocked):         {timeit(lambda: jax.device_put(small)):8.2f} ms")

    dimg = jax.device_put(img)
    jax.block_until_ready(dimg)

    build = make_frame_builder(cfg.orb)
    # device-resident input: pure extract compute time
    print(f"extract (input on device):             {timeit(lambda: build(dimg, cam).feats.desc):8.2f} ms")

    frame = build(dimg, cam)
    jax.block_until_ready(frame.feats.desc)

    # d2h of small arrays
    packed = jnp.zeros(1189, jnp.int32)  # packed result size
    jax.block_until_ready(packed)
    print(f"d2h 4.7KB (np.asarray):                {timeit(lambda: np.asarray(packed) + 0):8.2f} ms")
    hp = frame.host_pack
    jax.block_until_ready(hp)
    print(f"d2h host_pack {hp.nbytes/1024:.0f}KB:                  {timeit(lambda: np.asarray(hp)[0]):8.2f} ms")

    # dispatch latency: trivial jit with device input
    f = jax.jit(lambda x: x + 1)
    print(f"trivial jit dispatch+wait:             {timeit(lambda: f(packed)):8.2f} ms")

    # pipelined: how much overlap do we get if we DON'T block?
    def pipelined(n=60):
        t0 = time.perf_counter()
        prev = None
        for _ in range(n):
            d = jax.device_put(img)
            fr = build(d, cam)
            if prev is not None:
                np.asarray(prev)
            prev = fr.feats.desc
        np.asarray(prev)
        return (time.perf_counter() - t0) / n * 1e3
    print(f"extract pipelined (1 in flight):       {pipelined():8.2f} ms/frame")


if __name__ == "__main__":
    main()
