"""Fully-fused ORB extraction tail kernel: patch gather + in-patch
Gaussian blur + IC-angle + rotated-BRIEF taps, one Pallas program.

The XLA fused tail (ops/orb.extract_tail_fused) still round-trips HBM
between its stages: the [N, 53, 53] raw patches, the [N, 47, 47]
blurred patches, and — dominating — the BRIEF tap one-hots
([N, 256, 2, 47] selector plus its [N, 256, 2, 47] row-select
intermediate ≈ 170 MB/frame at N=1200). The per-stage roofline puts the
whole tail's irreducible traffic at ~0.07 ms; the XLA path achieves
~0.5 ms.

This kernel keeps everything for a keypoint in VMEM/registers:

  window   — aligned [64, 256] dynamic VMEM slice (rows 8-aligned,
             cols 128-aligned; Mosaic constraint), residual offset
             peeled by two in-register one-hot matmuls -> patch
             [53, 128] (cols >= 53 zero); same construction as
             ops/pallas_gather.py.
  IC-angle — masked-disc moment sums over the central 31x31
             (ORBextractor.cc IC_Angle :55); scalar atan2.
  blur     — separable 7-tap valid conv, horizontal then vertical,
             SAME order/taps as orb._blur7_patch -> [47, 122] (+zero
             lane pad to 128).
  BRIEF    — rotate the 256-pair pattern by the angle (round + clip,
             same ops as orb.brief_from_patches), then tap via an
             in-register one-hot matmul [512, 47] @ blur and a
             lane-select reduce; emit the 256 compare bits as f32.

Outputs: angle [N] and raw bits [N, 256] f32; the caller packs bits to
8 uint32 words in XLA (exact) and discards nothing else. Numerics match
the XLA fused tail up to reduction-order ULPs (angles ~1e-6 rad;
descriptor bits flip only at blur FMA ties, <0.5% — equivalence-tested
in interpret mode and gated like the fused-tail tests).

Provenance: ORBextractor.cc IC_Angle :55, computeOrbDescriptor :105,
GaussianBlur call :1012-1024.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .orb import (BRIEF_PATTERN, BRIEF_R, PATCH_RADIUS, _TAIL_R,
                  _disc_mask)

_CHUNK = 8
_WROWS = 64
_WCOLS = 256
_LANE = 128
_D = 2 * _TAIL_R + 1          # 53 raw patch
_DB = 2 * BRIEF_R + 1         # 47 blurred patch
_C0 = _TAIL_R - PATCH_RADIUS  # 11: central 31x31 offset


def _blur_taps(sigma: float = 2.0) -> np.ndarray:
    x = np.arange(-3, 4, dtype=np.float32)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def _kernel(yx_ref, img_ref, mom_ref, pat_ref, ang_ref, bits_ref):
    # moment weights / BRIEF pattern arrive as inputs (Pallas forbids
    # captured array constants); scalar blur taps may be captured.
    wx = mom_ref[0]                                        # weight * x
    wy = mom_ref[1]                                        # weight * y
    k7 = _blur_taps()
    px = pat_ref[0]                                        # [512]
    py = pat_ref[1]
    riota_r = jax.lax.broadcasted_iota(jnp.int32, (_D, _WROWS), 1)
    riota_d = jax.lax.broadcasted_iota(jnp.int32, (_D, _WROWS), 0)
    ciota_r = jax.lax.broadcasted_iota(jnp.int32, (_WCOLS, _LANE), 0)
    ciota_d = jax.lax.broadcasted_iota(jnp.int32, (_WCOLS, _LANE), 1)
    tap_r = jax.lax.broadcasted_iota(jnp.int32, (512, _DB), 1)
    tap_c = jax.lax.broadcasted_iota(jnp.int32, (512, _LANE), 1)

    pid = pl.program_id(0)
    for j in range(_CHUNK):
        n = pid * _CHUNK + j
        ya = pl.multiple_of(yx_ref[n, 0], 8)
        xa = pl.multiple_of(yx_ref[n, 1], _LANE)
        dy = yx_ref[n, 2]
        dx = yx_ref[n, 3]
        win = img_ref[pl.ds(ya, _WROWS), pl.ds(xa, _WCOLS)]
        p_r = (riota_r == dy + riota_d).astype(jnp.float32)
        tmp = jnp.dot(p_r, win, preferred_element_type=jnp.float32)
        p_c = ((ciota_r == dx + ciota_d)
               & (ciota_d < _D)).astype(jnp.float32)
        patch = jnp.dot(tmp, p_c, preferred_element_type=jnp.float32)
        # [53, 128]; cols >= 53 zero

        # IC angle over the central 31x31 (same single-rounding product
        # order as orb.ic_angle: patch * (mask*coord)).
        cen = patch[_C0:_C0 + 2 * PATCH_RADIUS + 1,
                    _C0:_C0 + 2 * PATCH_RADIUS + 1]
        m10 = jnp.sum(cen * wx)
        m01 = jnp.sum(cen * wy)
        # Mosaic has no atan2: rotate with cos/sin = m10/r, m01/r (ULP
        # of cos(atan2(...))) and emit the raw moments — the caller
        # reconstructs the angle with an exact XLA atan2.
        r2 = m10 * m10 + m01 * m01
        inv = jnp.where(r2 > 0, jax.lax.rsqrt(r2), 0.0)
        ca = jnp.where(r2 > 0, m10 * inv, 1.0)
        sa = m01 * inv

        # Separable valid blur, horizontal then vertical (orb._blur7_patch
        # order); [53,128] -> [53,122] -> [47,122], lane-pad back to 128.
        h = sum(patch[:, i:i + _LANE - 6] * k7[i] for i in range(7))
        v = sum(h[i:i + _D - 6, :] * k7[i] for i in range(7))  # [47, 122]
        blur = jnp.pad(v, ((0, 0), (0, 6)))                    # [47, 128]

        # Rotated BRIEF taps (same round/clip ops as brief_from_patches).
        ix = jnp.clip(jnp.round(ca * px - sa * py).astype(jnp.int32)
                      + BRIEF_R, 0, _DB - 1)                   # [512]
        iy = jnp.clip(jnp.round(sa * px + ca * py).astype(jnp.int32)
                      + BRIEF_R, 0, _DB - 1)
        oh_y = (tap_r == iy[:, None]).astype(jnp.float32)      # [512, 47]
        rows = jnp.dot(oh_y, blur,
                       preferred_element_type=jnp.float32)     # [512, 128]
        oh_x = (tap_c == ix[:, None]).astype(jnp.float32)
        vals = jnp.sum(rows * oh_x, axis=1)                    # [512]
        # tap order is [all first points | all second points] (strided
        # 1D slices lower to an unsupported gather on Mosaic)
        bits = (vals[:256] < vals[256:]).astype(jnp.float32)   # [256]
        lane = jax.lax.broadcasted_iota(jnp.int32, (_LANE,), 0)
        ang_ref[j] = jnp.where(lane == 0, m10,
                               jnp.where(lane == 1, m01, 0.0))
        bits_ref[j] = bits


def _call_kernel(padded: jax.Array, yx: jax.Array, n_pad: int,
                 interpret: bool):
    """One pallas_call over pre-padded image data + precomputed aligned
    starts/residuals [n_pad, 4] (ya, xa, dy, dx)."""
    Hp, Wp = padded.shape
    mask = _disc_mask(PATCH_RADIUS)
    coords = np.arange(-PATCH_RADIUS, PATCH_RADIUS + 1, dtype=np.float32)
    moments = jnp.asarray(np.stack([mask * coords[None, :],
                                    mask * coords[:, None]]))
    pat = BRIEF_PATTERN.astype(np.float32)   # [256, 2, 2] (pair, pt, xy)
    pattern = jnp.asarray(np.stack([
        np.concatenate([pat[:, 0, 0], pat[:, 1, 0]]),   # x: firsts|seconds
        np.concatenate([pat[:, 0, 1], pat[:, 1, 1]]),   # y: firsts|seconds
    ]))
    return pl.pallas_call(
        _kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_pad // _CHUNK,),
            in_specs=[pl.BlockSpec((Hp, Wp), lambda i, yx: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((2, 31, 31), lambda i, yx: (0, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((2, 512), lambda i, yx: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=[
                pl.BlockSpec((_CHUNK, _LANE), lambda i, yx: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((_CHUNK, 256), lambda i, yx: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
        ),
        out_shape=[jax.ShapeDtypeStruct((n_pad, _LANE), jnp.float32),
                   jax.ShapeDtypeStruct((n_pad, 256), jnp.float32)],
        interpret=interpret,
    )(yx, padded, moments, pattern)


def _pack_desc(bits: jax.Array) -> jax.Array:
    b = bits.astype(jnp.uint32).reshape(bits.shape[0], 8, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(b << shifts[None, None, :], axis=-1, dtype=jnp.uint32)


def tail_fused_multi_kernel(level_imgs: list, level_uvs: list,
                            interpret: bool = False):
    """Whole-frame fused tail: ONE kernel invocation for every keypoint
    of every pyramid level.

    The level images are edge-padded individually (so clamp semantics
    stay per-level), right-padded to a common lane-aligned width, and
    stacked into one row atlas; keypoint coords shift by their level's
    row offset. Returns [(angle, desc), ...] per level."""
    pad = _TAIL_R + 1
    blocks, offs, wmax = [], [], 0
    for im in level_imgs:
        H, W = im.shape
        p = jnp.pad(im.astype(jnp.float32), ((pad, pad), (pad, pad)),
                    mode="edge")
        blocks.append(p)
        wmax = max(wmax, W + 2 * pad)
    Wp = -(-(wmax + _WCOLS) // _LANE) * _LANE
    rows = 0
    padded_blocks = []
    for p in blocks:
        h, w = p.shape
        offs.append(rows)
        padded_blocks.append(jnp.pad(p, ((0, 0), (0, Wp - w))))
        rows += h
    Hp = -(-(rows + _WROWS) // 8) * 8
    atlas = jnp.concatenate(
        padded_blocks + [jnp.zeros((Hp - rows, Wp), jnp.float32)], axis=0)
    yxs = []
    for im, uv, off in zip(level_imgs, level_uvs, offs):
        H, W = im.shape
        x0 = jnp.clip(uv[:, 0], -pad, W + pad) + pad - _TAIL_R
        y0 = jnp.clip(uv[:, 1], -pad, H + pad) + pad - _TAIL_R + off
        ya = (y0 // 8) * 8
        xa = (x0 // _LANE) * _LANE
        yxs.append(jnp.stack([ya, xa, y0 - ya, x0 - xa], axis=-1))
    yx = jnp.concatenate(yxs).astype(jnp.int32)
    N = yx.shape[0]
    n_pad = -(-N // _CHUNK) * _CHUNK
    yx = jnp.pad(yx, ((0, n_pad - N), (0, 0)))
    mom, bits = _call_kernel(atlas, yx, n_pad, interpret)
    angle = jnp.arctan2(mom[:, 1], mom[:, 0])   # exact atan2 in XLA
    out, o = [], 0
    for uv in level_uvs:
        n = uv.shape[0]
        out.append((angle[o:o + n], _pack_desc(bits[o:o + n])))
        o += n
    return out


@functools.partial(jax.jit, static_argnames=("interpret",))
def tail_fused_kernel(img: jax.Array, centers: jax.Array,
                      interpret: bool = False):
    """(angle [N], desc [N, 8] uint32) — the whole extraction tail for
    one level image in one Pallas program. Drop-in for
    orb.extract_tail_fused's per-level math."""
    (ang, desc), = tail_fused_multi_kernel([img], [centers],
                                           interpret=interpret)
    return ang, desc
