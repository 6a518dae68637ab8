"""Fused FAST-9/16 + NMS + threshold-blend Pallas kernel.

The XLA path (ops/orb.fast_score_maps + nms3 + blend) materializes a
[16, H, W] shifted circle stack plus per-threshold score maps — ~25 HBM
round-trips of the image per pyramid level, and the TPU profile shows
ORB extraction is resolution-bound, not keypoint-bound (375-feat
extract 1.43 ms vs 1.69 ms at 1200 feats). This kernel reads the padded
image into VMEM once and produces the final blended score map
(reference semantics: ORBextractor.cc iniThFAST/minThFAST two-pass,
evaluated jointly) with ONE read + ONE write of image-sized data:

  corner test  — run-length of consecutive circle exceedances >= 9,
                 computed with a wrapped 24-step counter recurrence
                 instead of storing 16 boolean maps (VMEM budget);
  score        — max(sum positive exceedance, sum negative exceedance);
  NMS          — 3x3 max-compare on a 1-pixel halo, out-of-image
                 neighbors zeroed (reduce_window SAME semantics);
  blend        — strict-threshold winners boosted by +1e4, permissive
                 scores elsewhere (ops/orb.extract_orb's selection rule).

Mosaic constraints shaped the layout (hard-won):
  - dynamic ref slices must start at a sublane multiple: the row tile
    starts at r0 (a _TILE multiple, hinted via pl.multiple_of) and the
    ±3 circle shifts are STATIC slices of the loaded tile value;
  - the fully-unrolled 24-step loop at _TILE=64 blew the 16 MB scoped
    VMEM stack (20.1 MB) — _TILE=32 keeps the live set under it.

Matches the XLA composition bit-for-bit on f32 (same adds/maxes on the
same values; equivalence-tested in interpret mode on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .orb import FAST_CIRCLE

_P = 4          # 3 circle halo + 1 NMS halo
_TILE = 32      # output rows per grid step


def _kernel(img_ref, out_ref, *, H, W, WS, th_hi, th_lo, boost):
    r0 = pl.multiple_of(pl.program_id(0) * _TILE, 8)
    tile = img_ref[pl.ds(r0, _TILE + 2 * _P), :]        # [TILE+8, Wp]
    SH = _TILE + 2                                      # score rows+halo
    center = tile[3:3 + SH, 3:3 + WS]

    zero = jnp.zeros_like(center)
    cb_hi = cd_hi = cb_lo = cd_lo = zero                # run counters
    ok_hi = ok_lo = zero                                # corner flags
    sb_hi = sd_hi = sb_lo = sd_lo = zero                # score sums
    for i in range(16 + 8):
        dx, dy = FAST_CIRCLE[i % 16]
        d = tile[3 + dy:3 + dy + SH, 3 + dx:3 + dx + WS] - center
        cb_hi = jnp.where(d > th_hi, cb_hi + 1.0, 0.0)
        cd_hi = jnp.where(d < -th_hi, cd_hi + 1.0, 0.0)
        cb_lo = jnp.where(d > th_lo, cb_lo + 1.0, 0.0)
        cd_lo = jnp.where(d < -th_lo, cd_lo + 1.0, 0.0)
        ok_hi = jnp.maximum(ok_hi, jnp.maximum(cb_hi, cd_hi))
        ok_lo = jnp.maximum(ok_lo, jnp.maximum(cb_lo, cd_lo))
        if i < 16:
            sb_hi += jnp.maximum(d - th_hi, 0.0)
            sd_hi += jnp.maximum(-d - th_hi, 0.0)
            sb_lo += jnp.maximum(d - th_lo, 0.0)
            sd_lo += jnp.maximum(-d - th_lo, 0.0)

    # Zero scores outside the true image so halo rows/cols of the
    # edge-padded input can never win or suppress in the NMS compare
    # (XLA reduce_window "SAME" = implicit -inf outside the image).
    rowi = jax.lax.broadcasted_iota(jnp.int32, (SH, WS), 0) + r0 - 1
    coli = jax.lax.broadcasted_iota(jnp.int32, (SH, WS), 1) - 1
    inside = ((rowi >= 0) & (rowi < H) & (coli >= 0)
              & (coli < W)).astype(center.dtype)
    s_hi = jnp.where(ok_hi >= 9.0, jnp.maximum(sb_hi, sd_hi), 0.0) * inside
    s_lo = jnp.where(ok_lo >= 9.0, jnp.maximum(sb_lo, sd_lo), 0.0) * inside

    def nms(s):
        m = s[0:_TILE, 0:WS - 2]
        for dy2 in range(3):
            for dx2 in range(3):
                m = jnp.maximum(m, s[dy2:dy2 + _TILE, dx2:dx2 + WS - 2])
        c = s[1:1 + _TILE, 1:1 + WS - 2]
        return jnp.where(c >= m, c, 0.0)

    n_hi = nms(s_hi)
    n_lo = nms(s_lo)
    out_ref[:, 0:WS - 2] = jnp.where(n_hi > 0.0, n_hi + boost, n_lo)
    out_ref[:, WS - 2:] = jnp.zeros((_TILE, out_ref.shape[1] - (WS - 2)),
                                    out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("th_hi", "th_lo", "boost",
                                             "interpret"))
def fast_nms_blend(img: jax.Array, th_hi: float, th_lo: float,
                   boost: float = 1e4, interpret: bool = False):
    """Blended keypoint-score map [H, W] for one pyramid level.

    Equivalent to
      hi, lo = fast_score_maps(img, (th_hi, th_lo))
      where(nms3(hi) > 0, nms3(hi) + boost, nms3(lo))
    in one fused pass."""
    H, W = img.shape
    n_tiles = -(-H // _TILE)
    Hp = n_tiles * _TILE
    WS = W + 2                                   # score cols incl. halo
    Wp = -(-(W + 2 * _P) // 128) * 128
    padded = jnp.pad(img, ((_P, _P + Hp - H), (_P, Wp - W - _P)),
                     mode="edge")
    out = pl.pallas_call(
        functools.partial(_kernel, H=H, W=W, WS=WS,
                          th_hi=float(th_hi), th_lo=float(th_lo),
                          boost=float(boost)),
        grid=(n_tiles,),
        out_shape=jax.ShapeDtypeStruct((Hp, Wp), img.dtype),
        in_specs=[pl.BlockSpec((Hp + 2 * _P, Wp), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((_TILE, Wp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(padded)
    return out[:H, :W]
