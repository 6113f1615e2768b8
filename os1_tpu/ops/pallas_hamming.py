"""Pallas TPU kernel: tiled XOR+popcount Hamming distance table.

The matching engine's primitive (reference ORBmatcher::DescriptorDistance,
ORBmatcher.cc:1605-1621) as a VMEM-resident kernel: descriptor blocks are
tiled into VMEM, XOR+popcount accumulates over the 8 packed words on the
VPU, and the [tile, M] distance block is written once — no ±1 unpacking and
no [N, 256] int8 intermediates (the MXU formulation materializes both).
SURVEY.md §7 names Hamming-in-VMEM as one of the required native compute
paths.

Use :func:`hamming_matrix_pallas` as a drop-in for
``ops.hamming.hamming_matrix_mxu`` on TPU; matching/core.distance_matrix
selects the best available implementation.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N = 256  # query rows per grid step (sublane-aligned)


def _kernel(a_ref, bt_ref, out_ref):
    """a_ref [TILE_N, 8] u32; bt_ref [8, M] u32; out_ref [TILE_N, M] i32."""
    acc = jnp.zeros(out_ref.shape, jnp.int32)
    for w in range(8):  # static unroll over the packed words
        x = jnp.bitwise_xor(a_ref[:, w][:, None], bt_ref[w, :][None, :])
        acc = acc + jax.lax.population_count(x).astype(jnp.int32)
    out_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("interpret",))
def hamming_matrix_pallas(a: jnp.ndarray, b: jnp.ndarray,
                          interpret: bool = False) -> jnp.ndarray:
    """Packed [N, 8] x [M, 8] uint32 -> [N, M] int32 Hamming distances.

    N is padded to the row tile; M must be a multiple of 128 (every matcher
    shape here is a power of two >= 512)."""
    n, _ = a.shape
    m, _ = b.shape
    n_pad = -(-n // TILE_N) * TILE_N
    if n_pad != n:
        a = jnp.pad(a, ((0, n_pad - n), (0, 0)))
    bt = b.T  # [8, M] — lanes along M
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((n_pad, m), jnp.int32),
        grid=(n_pad // TILE_N,),
        in_specs=[
            pl.BlockSpec((TILE_N, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_N, m), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * m * 8, bytes_accessed=(n_pad + m) * 32 + n_pad * m * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(a, bt)
    return out[:n]
