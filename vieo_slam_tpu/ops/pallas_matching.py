"""Pallas TPU kernel: fused masked Hamming distance + best-2 + column-best.

The hot inner loop of every matcher (ops/matching.py) is
  dist = popcount(xor(desc_a, desc_b))  -> masked argmin/top-2 (rows)
                                        -> masked argmin (columns, for the
                                           one-to-one mutual filter)
As separate XLA ops this materializes an [M, N, 8] uint32 XOR expansion
(~40 MB at production sizes) and — on the axon backend — the lowered
Hamming+selection program additionally flips the whole process into a
degraded ~75 ms/execution mode (TODO.md bisection). This kernel keeps
everything in VMEM: each grid step loads a row-tile of descriptors,
streams the full candidate set, computes SWAR popcounts, and reduces
best/second/argbest per row plus a running column-minimum across tiles —
so the [M, N] distance matrix never exists outside VMEM and the XLA
program contains no Hamming or top-k at all.

Outputs match the XLA fallback in ops/matching._best2_xla: masked-out
rows get best = INF (1 << 30); ties break to the lowest index (argmin
semantics on rows; strict < tile combining preserves lowest-row ties on
columns).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF_DIST = 1e9
INF_I32 = 1 << 30


def _popcount_u32(v):
    """SWAR popcount on uint32 (no multiply: byte-fold by shifts)."""
    v = v - ((v >> 1) & jnp.uint32(0x55555555))
    v = (v & jnp.uint32(0x33333333)) + ((v >> 2) & jnp.uint32(0x33333333))
    v = (v + (v >> 4)) & jnp.uint32(0x0F0F0F0F)
    v = v + (v >> 8)
    v = v + (v >> 16)
    return v & jnp.uint32(0x3F)


def _kernel(a_ref, b_ref, mask_ref, idx_ref, best_ref, second_ref,
            colbest_ref, colrow_ref):
    i = pl.program_id(0)
    a = a_ref[...]                       # [TM, 8] uint32
    b = b_ref[...]                       # [N, 8] uint32
    mask = mask_ref[...]                 # [TM, N] float32 (1 = allowed)
    TM = a.shape[0]
    N = b.shape[0]

    dist_u = jnp.zeros((TM, N), jnp.uint32)
    for w in range(a.shape[1]):          # 8 words, static unroll
        x = a[:, w][:, None] ^ b[:, w][None, :]
        dist_u = dist_u + _popcount_u32(x)
    # Mosaic lacks uint32->float32 casts; go through int32 (values <= 256).
    dist = pltpu.bitcast(dist_u, jnp.int32).astype(jnp.float32)

    d = jnp.where(mask > 0, dist, INF_DIST)

    # --- per-row best / second-best -----------------------------------
    # Tie-breaking must be to the LOWEST index to match the XLA argmin
    # fallback; Mosaic's argmin lowering does not guarantee that on
    # hardware (verified mismatch on TPU v5e), so select the index
    # explicitly: min over column ids where the min is attained.
    cols = jax.lax.broadcasted_iota(jnp.int32, (TM, N), 1)
    best = jnp.min(d, axis=1)
    ibest = jnp.min(jnp.where(d == best[:, None], cols, N), axis=1)
    ibest = ibest.astype(jnp.int32)
    d2 = jnp.where(cols == ibest[:, None], INF_DIST, d)
    second = jnp.min(d2, axis=1)

    idx_ref[...] = ibest[:, None]
    best_ref[...] = best[:, None]
    second_ref[...] = second[:, None]

    # --- running per-column best row (for the mutual one-to-one filter) --
    rows = jax.lax.broadcasted_iota(jnp.int32, (TM, N), 0)
    cmin = jnp.min(d, axis=0)                                    # [N]
    carg = jnp.min(jnp.where(d == cmin[None, :], rows, TM),
                   axis=0).astype(jnp.int32) + i * TM            # global row

    @pl.when(i == 0)
    def _():
        colbest_ref[...] = cmin[None, :]
        colrow_ref[...] = carg[None, :]

    @pl.when(i > 0)
    def _():
        prev = colbest_ref[...]
        better = cmin[None, :] < prev                # strict: keep low rows
        colbest_ref[...] = jnp.where(better, cmin[None, :], prev)
        colrow_ref[...] = jnp.where(better, carg[None, :], colrow_ref[...])


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _proj_kernel(a_ref, b_ref, am_ref, bm_ref, tol_ref,
                 idx_ref, best_ref, second_ref, colbest_ref, colrow_ref):
    """fused_best2 with the projection-search mask built IN-kernel.

    am: [TM, 4] f32 = (u, v, search_radius, level); radius < 0 = invalid.
    bm: [N, 4] f32 = (u, v, level, valid).
    Folding the window test into the kernel removes the [M, N] f32
    distance + bool mask intermediates (XLA materializes ~25 MB at the
    4096x1200 production shape) — the mask never exists outside VMEM.
    """
    i = pl.program_id(0)
    a = a_ref[...]
    b = b_ref[...]
    am = am_ref[...]
    bm = bm_ref[...]
    tol = tol_ref[0, 0]
    TM = a.shape[0]
    N = b.shape[0]

    du = am[:, 0][:, None] - bm[:, 0][None, :]
    dv = am[:, 1][:, None] - bm[:, 1][None, :]
    r = am[:, 2]
    within = du * du + dv * dv <= (r * r)[:, None]
    lvl_ok = jnp.abs(am[:, 3][:, None] - bm[:, 2][None, :]) <= tol
    ok = within & lvl_ok & (r[:, None] >= 0) & (bm[:, 3][None, :] > 0)

    dist_u = jnp.zeros((TM, N), jnp.uint32)
    for w in range(a.shape[1]):
        x = a[:, w][:, None] ^ b[:, w][None, :]
        dist_u = dist_u + _popcount_u32(x)
    dist = pltpu.bitcast(dist_u, jnp.int32).astype(jnp.float32)
    d = jnp.where(ok, dist, INF_DIST)

    cols = jax.lax.broadcasted_iota(jnp.int32, (TM, N), 1)
    best = jnp.min(d, axis=1)
    ibest = jnp.min(jnp.where(d == best[:, None], cols, N),
                    axis=1).astype(jnp.int32)
    d2 = jnp.where(cols == ibest[:, None], INF_DIST, d)
    second = jnp.min(d2, axis=1)

    idx_ref[...] = ibest[:, None]
    best_ref[...] = best[:, None]
    second_ref[...] = second[:, None]

    rows = jax.lax.broadcasted_iota(jnp.int32, (TM, N), 0)
    cmin = jnp.min(d, axis=0)
    carg = jnp.min(jnp.where(d == cmin[None, :], rows, TM),
                   axis=0).astype(jnp.int32) + i * TM

    @pl.when(i == 0)
    def _():
        colbest_ref[...] = cmin[None, :]
        colrow_ref[...] = carg[None, :]

    @pl.when(i > 0)
    def _():
        prev = colbest_ref[...]
        better = cmin[None, :] < prev
        colbest_ref[...] = jnp.where(better, cmin[None, :], prev)
        colrow_ref[...] = jnp.where(better, carg[None, :], colrow_ref[...])


@functools.partial(jax.jit, static_argnames=("tile_m", "interpret"))
def fused_projection_best2(
        desc_a: jax.Array, desc_b: jax.Array,
        uv_a: jax.Array, radius_a: jax.Array, level_a: jax.Array,
        valid_a: jax.Array,
        uv_b: jax.Array, level_b: jax.Array, valid_b: jax.Array,
        level_tolerance: jax.Array | float,
        *, tile_m: int = 256, interpret: bool = False):
    """search_by_projection's candidate scoring as one fused kernel:
    spatial window + level gate + masked Hamming + row best2 + column
    best-row, no [M, N] intermediates in HBM.

    radius_a: [M] per-row search radius in pixels (already level-scaled).
    Returns (best_idx [M] i32, best [M] i32, second [M] i32,
    col_best_row [N] i32) matching fused_best2's contract.
    """
    M = desc_a.shape[0]
    N = desc_b.shape[0]
    Mp = _round_up(M, 8)
    Np = _round_up(N, 128)
    TM = min(tile_m, Mp)
    Mp = _round_up(Mp, TM)
    am = jnp.stack([
        uv_a[:, 0], uv_a[:, 1],
        jnp.where(valid_a, radius_a, -1.0).astype(jnp.float32),
        level_a.astype(jnp.float32),
    ], axis=1)
    bm = jnp.stack([
        uv_b[:, 0], uv_b[:, 1],
        level_b.astype(jnp.float32),
        valid_b.astype(jnp.float32),
    ], axis=1)
    if Mp != M:
        desc_a = jnp.pad(desc_a, ((0, Mp - M), (0, 0)))
        am = jnp.pad(am, ((0, Mp - M), (0, 0)),
                     constant_values=-1.0)
    if Np != N:
        desc_b = jnp.pad(desc_b, ((0, Np - N), (0, 0)))
        bm = jnp.pad(bm, ((0, Np - N), (0, 0)))
    tol = jnp.asarray(level_tolerance, jnp.float32).reshape(1, 1)
    grid = (Mp // TM,)
    idx, best, second, _colbest, colrow = pl.pallas_call(
        _proj_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TM, desc_a.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Np, desc_b.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Np, 4), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((TM, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Np), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Np), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Mp, 1), jnp.int32),
            jax.ShapeDtypeStruct((Mp, 1), jnp.float32),
            jax.ShapeDtypeStruct((Mp, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, Np), jnp.float32),
            jax.ShapeDtypeStruct((1, Np), jnp.int32),
        ],
        interpret=interpret,
    )(desc_a, desc_b, am, bm, tol)
    big = jnp.int32(INF_I32)
    best_i = jnp.where(best[:M, 0] >= INF_DIST * 0.5, big,
                       best[:M, 0].astype(jnp.int32))
    second_i = jnp.where(second[:M, 0] >= INF_DIST * 0.5, big,
                         second[:M, 0].astype(jnp.int32))
    return idx[:M, 0], best_i, second_i, colrow[0, :N]


@functools.partial(jax.jit, static_argnames=("tile_m", "interpret"))
def fused_best2(desc_a: jax.Array, desc_b: jax.Array, mask: jax.Array,
                *, tile_m: int = 256, interpret: bool = False):
    """Fused masked Hamming + row best2 + column best-row.

    desc_a [M, 8] uint32, desc_b [N, 8] uint32, mask [M, N] bool.
    Returns (best_idx [M] i32, best [M] i32, second [M] i32,
    col_best_row [N] i32) with masked-out rows producing best = 1 << 30
    and col_best_row[c] = argmin over masked rows of column c.
    """
    M, N = mask.shape
    Mp = _round_up(M, 8)
    Np = _round_up(N, 128)
    TM = min(tile_m, Mp)
    Mp = _round_up(Mp, TM)
    if (Mp, Np) != (M, N):
        desc_a = jnp.pad(desc_a, ((0, Mp - M), (0, 0)))
        desc_b = jnp.pad(desc_b, ((0, Np - N), (0, 0)))
        mask = jnp.pad(mask, ((0, Mp - M), (0, Np - N)))
    maskf = mask.astype(jnp.float32)
    grid = (Mp // TM,)
    idx, best, second, _colbest, colrow = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TM, desc_a.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Np, desc_b.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, Np), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TM, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Np), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Np), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Mp, 1), jnp.int32),
            jax.ShapeDtypeStruct((Mp, 1), jnp.float32),
            jax.ShapeDtypeStruct((Mp, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, Np), jnp.float32),
            jax.ShapeDtypeStruct((1, Np), jnp.int32),
        ],
        interpret=interpret,
    )(desc_a, desc_b, maskf)
    big = jnp.int32(INF_I32)
    best_i = jnp.where(best[:M, 0] >= INF_DIST * 0.5, big,
                       best[:M, 0].astype(jnp.int32))
    second_i = jnp.where(second[:M, 0] >= INF_DIST * 0.5, big,
                         second[:M, 0].astype(jnp.int32))
    return idx[:M, 0], best_i, second_i, colrow[0, :N]
