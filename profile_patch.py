"""Benchmark patch-extraction + descriptor-sampling strategies on TPU."""
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, n=30, warm=3):
    for _ in range(warm):
        jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


L, H, W = 8, 480, 640
N = 1024  # compacted keypoints
PS = 32   # patch size

rng = np.random.default_rng(0)
stack = jax.device_put(rng.normal(size=(L, H, W)).astype(np.float32))
lvl = jnp.asarray(rng.integers(0, L, N).astype(np.int32))
cy = jnp.asarray(rng.integers(19, H - 19, N).astype(np.int32))
cx = jnp.asarray(rng.integers(19, W - 19, N).astype(np.int32))
jax.block_until_ready((stack, lvl, cy, cx))


# (a) vmap dynamic_slice
@jax.jit
def patches_dynslice(stack, lvl, cy, cx):
    def one(l, y, x):
        return jax.lax.dynamic_slice(stack, (l, y - 15, x - 15), (1, PS, PS))[0]
    return jax.vmap(one)(lvl, cy, cx)


# (b) row gather: slice (1,1,PS) rows
@jax.jit
def patches_rowgather(stack, lvl, cy, cx):
    dy = jnp.arange(PS, dtype=jnp.int32) - 15
    rows_l = jnp.repeat(lvl, PS)                       # [N*PS]
    rows_y = (cy[:, None] + dy[None, :]).reshape(-1)   # [N*PS]
    rows_x = jnp.repeat(cx - 15, PS)
    starts = jnp.stack([rows_l, rows_y, rows_x], -1)   # [N*PS, 3]
    out = jax.lax.gather(
        stack, starts,
        jax.lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(0, 1),
            start_index_map=(0, 1, 2)),
        slice_sizes=(1, 1, PS),
    )
    return out.reshape(N, PS, PS)


# (c) scalar flat gather (current approach, for reference)
@jax.jit
def patches_scalar(stack, lvl, cy, cx):
    flat = stack.reshape(-1)
    dy = jnp.arange(PS, dtype=jnp.int32) - 15
    dx = jnp.arange(PS, dtype=jnp.int32) - 15
    off = (dy[:, None] * W + dx[None, :]).reshape(-1)
    base = (lvl * H + cy) * W + cx
    return flat[jnp.clip(base[:, None] + off[None, :], 0, flat.shape[0] - 1)].reshape(N, PS, PS)


# (d) pallas DMA
def _dma_kernel(kps_ref, stack_ref, out_ref, scratch, sems):
    B = out_ref.shape[0]
    i = pl.program_id(0)
    def issue(j, _):
        l = kps_ref[i * B + j, 0]
        y = kps_ref[i * B + j, 1]
        x = kps_ref[i * B + j, 2]
        pltpu.make_async_copy(
            stack_ref.at[l, pl.ds(y - 15, PS), pl.ds(x - 15, PS)],
            scratch.at[j], sems.at[j],
        ).start()
        return 0
    jax.lax.fori_loop(0, B, issue, 0)
    def wait(j, _):
        pltpu.make_async_copy(
            stack_ref.at[0, pl.ds(0, PS), pl.ds(0, PS)], scratch.at[j], sems.at[j]
        ).wait()
        return 0
    jax.lax.fori_loop(0, B, wait, 0)
    out_ref[:] = scratch[:]


def make_pallas_patches(B=128):
    grid = N // B
    return pl.pallas_call(
        _dma_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((B, PS, PS), lambda i, k: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((B, PS, PS), jnp.float32),
                pltpu.SemaphoreType.DMA((B,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((N, PS, PS), jnp.float32),
    )


@jax.jit
def patches_pallas(stack, lvl, cy, cx):
    kps = jnp.stack([lvl, cy, cx], -1)
    return make_pallas_patches()(kps, stack)


print("patch extraction:")
for name, fn in [("dynslice", patches_dynslice), ("rowgather", patches_rowgather),
                 ("scalar", patches_scalar), ("pallas_dma", patches_pallas)]:
    try:
        p = fn(stack, lvl, cy, cx)
        ref = patches_scalar(stack, lvl, cy, cx)
        err = float(jnp.abs(p - ref).max())
        ms = timeit(lambda: fn(stack, lvl, cy, cx))
        print(f"  {name:12s} {ms:8.2f} ms  maxerr {err:.1e}")
    except Exception as e:
        print(f"  {name:12s} FAILED: {type(e).__name__} {str(e)[:200]}")


# ---- descriptor sampling from patches ----
S = 512
table = jnp.asarray(rng.integers(0, PS * PS, (64, S)).astype(np.int32))
abin = jnp.asarray(rng.integers(0, 64, N).astype(np.int32))
patches = patches_scalar(stack, lvl, cy, cx)
jax.block_until_ready(patches)


@jax.jit
def sample_gather(patches, abin):
    flat = patches.reshape(N, PS * PS)
    idx = table[abin]  # [N, S]
    return jnp.take_along_axis(flat, idx, axis=1)


@jax.jit
def sample_onehot(patches, abin):
    idx = table[abin]
    ir = idx // PS
    ic = idx % PS
    iota = jnp.arange(PS, dtype=jnp.int32)
    ohr = (ir[:, :, None] == iota).astype(jnp.bfloat16)   # [N, S, PS]
    T = jnp.einsum("bsr,brc->bsc", ohr, patches.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)
    ohc = ic[:, :, None] == iota
    return jnp.sum(jnp.where(ohc, T, 0.0), axis=-1)


print("descriptor sampling (from patches):")
for name, fn in [("take_along", sample_gather), ("onehot_mxu", sample_onehot)]:
    try:
        s = fn(patches, abin)
        ref = sample_gather(patches, abin)
        err = float(jnp.abs(s - ref).max())
        ms = timeit(lambda: fn(patches, abin))
        print(f"  {name:12s} {ms:8.2f} ms  maxerr {err:.1e}")
    except Exception as e:
        print(f"  {name:12s} FAILED: {type(e).__name__} {str(e)[:200]}")


# ---- in-pallas take_along_axis probe ----
def _gather_kernel(x_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(x_ref[:], idx_ref[:], axis=1)

@jax.jit
def pallas_take(patches, abin):
    flat = patches.reshape(N, PS * PS)
    idx = table[abin]
    return pl.pallas_call(
        _gather_kernel,
        out_shape=jax.ShapeDtypeStruct((N, S), jnp.float32),
        in_specs=[pl.BlockSpec((128, PS * PS), lambda i: (i, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((128, S), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((128, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
        grid=(N // 128,),
    )(flat, idx)

try:
    s = pallas_take(patches, abin)
    ref = sample_gather(patches, abin)
    err = float(jnp.abs(s - ref).max())
    ms = timeit(lambda: pallas_take(patches, abin))
    print(f"  pallas_take  {ms:8.2f} ms  maxerr {err:.1e}")
except Exception as e:
    print(f"  pallas_take  FAILED: {type(e).__name__} {str(e)[:300]}")
