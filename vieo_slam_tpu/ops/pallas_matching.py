"""Pallas TPU kernel: fused masked Hamming distance + best-2 selection.

The hot inner loop of every matcher (ops/matching.py) is
  dist = popcount(xor(desc_a, desc_b))  -> masked argmin/top-2
As separate XLA ops this materializes an [M, N, 8] uint32 XOR expansion
(~40 MB at production sizes) and — on the axon backend — the lowered
program additionally flips the process into a degraded execution mode
(TODO.md). This kernel keeps everything in VMEM: each grid step loads a
row-tile of descriptors, streams the full candidate set, computes SWAR
popcounts (explicit bit-twiddling: portable across Mosaic versions), and
reduces best/second/argbest in-register.

Outputs match ops/matching.masked_best2 semantics: masked-out rows get
best >= INF_DIST.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF_DIST = 1e9


def _popcount_u32(v):
    """SWAR popcount on uint32 (no multiply: byte-fold by shifts)."""
    v = v - ((v >> 1) & jnp.uint32(0x55555555))
    v = (v & jnp.uint32(0x33333333)) + ((v >> 2) & jnp.uint32(0x33333333))
    v = (v + (v >> 4)) & jnp.uint32(0x0F0F0F0F)
    v = v + (v >> 8)
    v = v + (v >> 16)
    return v & jnp.uint32(0x3F)


def _kernel(a_ref, b_ref, mask_ref, idx_ref, best_ref, second_ref):
    a = a_ref[...]                       # [TM, 8] uint32
    b = b_ref[...]                       # [N, 8] uint32
    mask = mask_ref[...]                 # [TM, N] float32 (1 = allowed)
    TM = a.shape[0]
    N = b.shape[0]

    dist_u = jnp.zeros((TM, N), jnp.uint32)
    for w in range(a.shape[1]):          # 8 words, static unroll
        x = a[:, w][:, None] ^ b[:, w][None, :]
        dist_u = dist_u + _popcount_u32(x)
    # Mosaic lacks uint32->float32 casts; go through int32 (values <=256).
    dist = pltpu.bitcast(dist_u, jnp.int32).astype(jnp.float32)

    d = jnp.where(mask > 0, dist, INF_DIST)
    best = jnp.min(d, axis=1)
    ibest = jnp.argmin(d, axis=1).astype(jnp.int32)
    cols = jax.lax.broadcasted_iota(jnp.int32, (TM, N), 1)
    d2 = jnp.where(cols == ibest[:, None], INF_DIST, d)
    second = jnp.min(d2, axis=1)

    idx_ref[...] = ibest[:, None]
    best_ref[...] = best[:, None]
    second_ref[...] = second[:, None]


@functools.partial(jax.jit, static_argnames=("tile_m",))
def hamming_best2(desc_a: jax.Array, desc_b: jax.Array,
                  mask: jax.Array, *, tile_m: int = 256):
    """Fused masked Hamming + best2.

    desc_a [M, 8] uint32, desc_b [N, 8] uint32, mask [M, N] float32.
    Returns (best_idx [M] int32, best [M] int32, second [M] int32) with
    masked-out rows producing best >= 2**30 (matching masked_best2).
    """
    M = desc_a.shape[0]
    N = desc_b.shape[0]
    TM = min(tile_m, M)
    grid = (pl.cdiv(M, TM),)
    idx, best, second = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TM, desc_a.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N, desc_b.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, N), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TM, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((M, 1), jnp.int32),
            jax.ShapeDtypeStruct((M, 1), jnp.float32),
            jax.ShapeDtypeStruct((M, 1), jnp.float32),
        ],
    )(desc_a, desc_b, mask)
    big = jnp.int32(1 << 30)
    best_i = jnp.where(best[:, 0] >= INF_DIST * 0.5, big,
                       best[:, 0].astype(jnp.int32))
    second_i = jnp.where(second[:, 0] >= INF_DIST * 0.5, big,
                         second[:, 0].astype(jnp.int32))
    return idx[:, 0], best_i, second_i
