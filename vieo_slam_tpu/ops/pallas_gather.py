"""Pallas patch-gather kernel: [N, d, d] windows at arbitrary centers.

The XLA tail path (ops/orb.gather_patches, mxu=True) selects patch rows
and columns with one-hot MXU contractions whose operands round-trip HBM:
for 1200 keypoints x 53x53 patches the [N, d, Hp] bf16 one-hot plus the
[N, d, Wp] f32 intermediate move ~200 MB per frame — ~40% of the v5e HBM
roofline and the largest slice of the measured 0.52 ms extraction tail
(TODO.md r4 breakdown; patch-bytes floor is ~0.07 ms).

This kernel keeps the whole (padded) level image resident in VMEM and
gathers each patch with zero HBM intermediates:

  window  — one dynamic VMEM slice per keypoint, aligned down to the
            (8, 128) tile grid: rows ya = 8*floor(y0/8) (Mosaic requires
            sublane-aligned dynamic starts), cols xa = 128*floor(x0/128);
            a [64, 256] window covers any 53x53 patch with the residual
            offset (dy in [0,8), dx in [0,128)) inside it;
  select  — two tiny in-register one-hot matmuls peel the misaligned
            patch out of the aligned window:
            P_r [d, 64] @ win [64, 256] @ P_c [256, LANE] -> [d, LANE]
            (single-nonzero rows/cols => exact in f32; built from iota
            compares, never materialized in HBM);
  store   — patches land as [N, d, 128] (lane-padded, cols >= d zero);
            the caller slices [:, :, :d].

Numerics: bit-exact vs gather_patches(mxu=False) — each output element
is one f32 image value copied through two exact one-hot products (the
XLA mxu=True path quantizes to bf16; this kernel does not need to).

Provenance: replaces the data movement of ORBextractor.cc's per-keypoint
patch reads (IC_Angle :55, computeOrbDescriptor :105) for the fused
extraction tail (ops/orb.extract_tail_fused).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CHUNK = 8        # keypoints per grid step (amortizes grid overhead)
_WROWS = 64       # aligned window rows  (8*ceil(8/8)  + d <= 64 for d<=53)
_WCOLS = 256      # aligned window cols  (128 residual + d <= 256 for d<=128)
_LANE = 128


def _kernel(yx_ref, img_ref, out_ref, *, d):
    pid = pl.program_id(0)
    riota_r = jax.lax.broadcasted_iota(jnp.int32, (d, _WROWS), 1)
    riota_d = jax.lax.broadcasted_iota(jnp.int32, (d, _WROWS), 0)
    ciota_r = jax.lax.broadcasted_iota(jnp.int32, (_WCOLS, _LANE), 0)
    ciota_d = jax.lax.broadcasted_iota(jnp.int32, (_WCOLS, _LANE), 1)
    for j in range(_CHUNK):
        n = pid * _CHUNK + j
        ya = pl.multiple_of(yx_ref[n, 0], 8)
        xa = pl.multiple_of(yx_ref[n, 1], _LANE)
        dy = yx_ref[n, 2]
        dx = yx_ref[n, 3]
        win = img_ref[pl.ds(ya, _WROWS), pl.ds(xa, _WCOLS)]
        # P_r[i, s] = (s == dy + i): picks window row dy+i as patch row i.
        p_r = (riota_r == dy + riota_d).astype(jnp.float32)
        tmp = jnp.dot(p_r, win, preferred_element_type=jnp.float32)
        # P_c[s, i] = (s == dx + i) for i < d (lane cols >= d stay zero).
        p_c = ((ciota_r == dx + ciota_d) & (ciota_d < d)).astype(jnp.float32)
        out_ref[j] = jnp.dot(tmp, p_c, preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("radius", "interpret"))
def gather_patches_kernel(img: jax.Array, centers: jax.Array, radius: int,
                          interpret: bool = False) -> jax.Array:
    """[N, 2r+1, 2r+1] patches around integer (x, y) centers.

    Drop-in for ops/orb.gather_patches for IN-IMAGE centers (the only
    centers the pipeline produces): out-of-range taps clamp
    (edge-padding by r+1, same as the XLA path). Exact f32.  Centers
    are clamped into [0, W) x [0, H) first — a fully off-image center
    (which the XLA path would resolve by walking taps further into the
    edge padding) yields the nearest in-image patch instead, keeping
    every selected tap inside the edge-padded core rather than the
    zero alignment margin."""
    H, W = img.shape
    N = centers.shape[0]
    d = 2 * radius + 1
    if d > _WROWS - 8 + 1 or d > _WCOLS - _LANE + 1 or d > _LANE:
        raise ValueError(f"patch size {d} exceeds kernel window")
    pad = radius + 1
    # Core edge-pad (clamp semantics) + zero alignment margin so every
    # aligned [64, 256] window is an in-bounds VMEM read. The margin is
    # loaded but never selected (dy+d-1 <= 7+52 < 64 only reaches core
    # rows; see module docstring).
    Hp = -(-(H + 2 * pad + _WROWS) // 8) * 8
    Wp = -(-(W + 2 * pad + _WCOLS) // _LANE) * _LANE
    padded = jnp.pad(img.astype(jnp.float32), ((pad, pad), (pad, pad)),
                     mode="edge")
    padded = jnp.pad(padded, ((0, Hp - H - 2 * pad), (0, Wp - W - 2 * pad)))
    # Top-left of each patch in padded coords, split into an aligned
    # start + residual (computed in XLA; int32 throughout).
    # Clamp centers into the image so the worst-case tap x0 + d - 1 =
    # (W-1) + pad + radius stays inside the edge-padded core (width
    # W + 2*pad) and never reads the zero alignment margin.
    x0 = jnp.clip(centers[:, 0], 0, W - 1) + pad - radius
    y0 = jnp.clip(centers[:, 1], 0, H - 1) + pad - radius
    ya = (y0 // 8) * 8
    xa = (x0 // _LANE) * _LANE
    yx = jnp.stack([ya, xa, y0 - ya, x0 - xa], axis=-1).astype(jnp.int32)
    n_pad = -(-N // _CHUNK) * _CHUNK
    yx = jnp.pad(yx, ((0, n_pad - N), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_kernel, d=d),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_pad // _CHUNK,),
            in_specs=[pl.BlockSpec((Hp, Wp), lambda i, yx: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((_CHUNK, d, _LANE),
                                   lambda i, yx: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, d, _LANE), jnp.float32),
        interpret=interpret,
    )(yx, padded)
    return out[:N, :, :d]


def _np_reference(img: np.ndarray, centers: np.ndarray, radius: int):
    """Plain-numpy oracle for the equivalence test."""
    pad = radius + 1
    padded = np.pad(img, pad, mode="edge")
    d = 2 * radius + 1
    dy = np.arange(d) - radius
    rows = centers[:, 1, None, None] + dy[None, :, None] + pad
    cols = centers[:, 0, None, None] + dy[None, None, :] + pad
    return padded[rows, cols]
