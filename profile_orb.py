"""Stage-level timing of the ORB extractor on the real TPU."""
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
    from os1_tpu.features import orb
    from os1_tpu.ops import fast, image, topk, hamming

    cfg = orb.OrbConfig(height=480, width=640, n_features=1024, n_levels=8)
    rng = np.random.default_rng(0)
    img = jax.device_put(rng.integers(0, 255, (480, 640)).astype(np.float32))
    jax.block_until_ready(img)

    sizes = cfg.level_sizes
    L = cfg.n_levels
    n_max = max(cfg.features_per_level)
    Ry, Rx = (jnp.asarray(a) for a in image.pyramid_matrices(cfg.height, cfg.width, sizes))
    hb = jnp.asarray(np.array([h for h, _ in sizes], np.int32))
    wb = jnp.asarray(np.array([w for _, w in sizes], np.int32))

    pyr_f = jax.jit(lambda im: image.build_pyramid_stack(im, Ry, Rx))
    print(f"pyramid_stack:        {timeit(lambda: pyr_f(img)):8.2f} ms")
    pyr = pyr_f(img); jax.block_until_ready(pyr)

    fast_f = jax.jit(lambda p: fast.nms3x3(fast.fast_with_fallback(img=p, hi=20., lo=7., bounds=(hb, wb))))
    print(f"fast+fallback+nms:    {timeit(lambda: fast_f(pyr)):8.2f} ms")
    scores = fast_f(pyr); jax.block_until_ready(scores)

    topk_f = jax.jit(lambda s: topk.balanced_cell_topk_batch(s, cfg.cell, cfg.k_per_cell, n_max))
    print(f"balanced_topk:        {timeit(lambda: topk_f(scores)[0]):8.2f} ms")
    xy, resp, valid = topk_f(scores); jax.block_until_ready(xy)

    rep_f = jax.jit(lambda p: image.replicate_level_edges(p, hb, wb))
    print(f"replicate_edges:      {timeit(lambda: rep_f(pyr)):8.2f} ms")
    rep = rep_f(pyr); jax.block_until_ready(rep)

    blur_f = jax.jit(image.gaussian_blur)
    print(f"gaussian_blur:        {timeit(lambda: blur_f(rep)):8.2f} ms")
    blurred = blur_f(rep); jax.block_until_ready(blurred)

    # patch + onehot stages (current extractor design)
    budgets = cfg.features_per_level
    oct_o = jnp.concatenate([jnp.full(budgets[l], l, jnp.int32) for l in range(L)], 0)
    xy_o = jnp.concatenate([xy[l, :budgets[l]] for l in range(L)], axis=0)
    sample_table = jnp.asarray(orb._rotated_patch_table(cfg.seed))
    wx_np, wy_np = orb._ic_patch_weights()
    ic_wx, ic_wy = jnp.asarray(wx_np.reshape(-1)), jnp.asarray(wy_np.reshape(-1))
    PS, PC = orb.PS, orb._PC

    @jax.jit
    def patch_f(blurred, xy_o):
        cx = jnp.round(xy_o[:, 0]).astype(jnp.int32)
        cy = jnp.round(xy_o[:, 1]).astype(jnp.int32)
        def one(l, y, x):
            return jax.lax.dynamic_slice(blurred, (l, y - PC, x - PC), (1, PS, PS))[0]
        return jax.vmap(one)(oct_o, cy, cx)
    print(f"patches dynslice:     {timeit(lambda: patch_f(blurred, xy_o)):8.2f} ms  ({xy_o.shape[0]}x{PS}x{PS})")
    patches = patch_f(blurred, xy_o); jax.block_until_ready(patches)

    @jax.jit
    def orient(patches):
        pflat = patches.reshape(-1, PS * PS)
        return jnp.arctan2(pflat @ ic_wy, pflat @ ic_wx)
    print(f"orientation dense:    {timeit(lambda: orient(patches)):8.2f} ms")
    angle = orient(patches); jax.block_until_ready(angle)

    @jax.jit
    def descr(patches, angle):
        two_pi = 2.0 * jnp.pi
        abin = (jnp.round(jnp.mod(angle, two_pi) * (orb.N_ORIENT / two_pi)).astype(jnp.int32)) % orb.N_ORIENT
        idx = sample_table[abin]
        ir, ic = idx // PS, idx % PS
        lanes = jnp.arange(PS, dtype=jnp.int32)
        ohr = (ir[:, :, None] == lanes).astype(jnp.bfloat16)
        T = jnp.einsum("nsr,nrc->nsc", ohr, patches.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        samples = jnp.sum(jnp.where(ic[:, :, None] == lanes, T, 0.0), axis=-1)
        samples = samples.reshape(-1, hamming.BITS, 2)
        return hamming.pack_bits(samples[..., 0] < samples[..., 1])
    print(f"descriptor onehot:    {timeit(lambda: descr(patches, angle)):8.2f} ms")

    ext = orb.make_extractor(cfg)
    print(f"full extract:         {timeit(lambda: ext(img).desc):8.2f} ms")

    # frame builder (extract + undistort + host_pack)
    from os1_tpu.pipeline.frame import make_frame_builder
    from os1_tpu.geometry.camera import Camera
    cam = Camera.make(fx=400.0, fy=400.0, cx=320.0, cy=240.0, width=640, height=480)
    build = make_frame_builder(cfg)
    print(f"frame_builder total:  {timeit(lambda: build(img, cam).feats.desc):8.2f} ms")


if __name__ == "__main__":
    main()
