"""Batched ORB feature extraction: pyramid, FAST, orientation, rBRIEF.

TPU-native equivalent of src/ORBextractor.cc (`operator()` ORBextractor.cc:968,
ComputePyramid :1060, ComputeKeyPointsOctTree :723, DistributeOctTree :518,
IC_Angle :55, computeOrbDescriptor :83).

Design (deliberately different from the reference's per-pixel scalar loops):
  - Everything is whole-image array math with static shapes: FAST is a
    16-way shifted-image mask reduction, NMS is a max-pool compare, the
    quadtree keypoint distribution is replaced by a deterministic
    per-cell top-k + global top-N selection (SURVEY.md §7 "hard parts"),
    which keeps spatial spread while being a fixed-shape `top_k`.
  - Per-level keypoint capacity is fixed (geometric series over levels like
    the reference), with validity masks instead of dynamic sizes.
  - The rBRIEF sampling pattern is our own deterministically generated
    Gaussian pattern (BRIEF-style, seed-fixed) — NOT the OpenCV learned
    table; vocabulary/matching all use the same pattern so the system is
    self-consistent.
  - The descriptor is produced directly as 8 x uint32 words so Hamming
    matching is XOR + `lax.population_count`.

All functions are jit-safe; a full extraction compiles into one XLA program
per (image-size, config).
"""

from __future__ import annotations

import dataclasses
import functools
import math
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# 16-point Bresenham circle of radius 3 (clockwise from 12 o'clock),
# (dx, dy) with x right / y down — the standard FAST-9/16 test set.
FAST_CIRCLE = np.array(
    [
        (0, -3), (1, -3), (2, -2), (3, -1),
        (3, 0), (3, 1), (2, 2), (1, 3),
        (0, 3), (-1, 3), (-2, 2), (-3, 1),
        (-3, 0), (-3, -1), (-2, -2), (-1, -3),
    ],
    dtype=np.int32,
)

PATCH_RADIUS = 15          # IC_Angle circular patch (HALF_PATCH_SIZE in ref)
DESC_BITS = 256
DESC_WORDS = DESC_BITS // 32


def _make_brief_pattern(seed: int = 7) -> np.ndarray:
    """Generate 256 (p, q) point pairs for rBRIEF, i.i.d. N(0, (patch/5)^2)
    clipped to the 31x31 patch (BRIEF G-II sampling from the original
    paper). Returns int32 [256, 2, 2] as ((x1, y1), (x2, y2))."""
    rng = np.random.RandomState(seed)
    sigma = (2 * PATCH_RADIUS + 1) / 5.0
    pts = rng.randn(DESC_BITS, 2, 2) * sigma
    pts = np.clip(np.round(pts), -PATCH_RADIUS + 1, PATCH_RADIUS - 1)
    return pts.astype(np.int32)


BRIEF_PATTERN = _make_brief_pattern()


def _disc_mask(radius: int) -> np.ndarray:
    """Circular patch mask like the reference's umax per-row extents."""
    d = 2 * radius + 1
    yy, xx = np.mgrid[-radius:radius + 1, -radius:radius + 1]
    return (xx * xx + yy * yy <= radius * radius).astype(np.float32)


@dataclasses.dataclass(frozen=True)
class OrbConfig:
    n_features: int = 1200
    n_levels: int = 8
    scale_factor: float = 1.2
    fast_threshold: float = 20.0
    fast_min_threshold: float = 7.0
    cell_size: int = 32          # spatial-binning cell for distribution
    cell_topk: int = 4           # candidates kept per cell before global topk
    border: int = 19             # EDGE_THRESHOLD-ish: valid-keypoint border

    @functools.cached_property
    def level_scales(self) -> np.ndarray:
        return self.scale_factor ** np.arange(self.n_levels)

    @functools.cached_property
    def features_per_level(self) -> np.ndarray:
        """Geometric allocation over levels (ORBextractor ctor logic)."""
        inv = 1.0 / self.scale_factor
        w = inv ** np.arange(self.n_levels)
        n = np.floor(self.n_features * w / w.sum()).astype(np.int32)
        n[-1] = max(self.n_features - int(n[:-1].sum()), 0)
        return n


class OrbFeatures(NamedTuple):
    """Fixed-capacity extraction result (capacity N = cfg.n_features).

    uv:     [N, 2] level-0 pixel coordinates (x, y)
    level:  [N]    pyramid level (int32)
    angle:  [N]    orientation (radians)
    score:  [N]    FAST response
    desc:   [N, 8] packed 256-bit descriptors (uint32)
    valid:  [N]    bool mask
    """

    uv: jax.Array
    level: jax.Array
    angle: jax.Array
    score: jax.Array
    desc: jax.Array
    valid: jax.Array

    @property
    def n(self) -> jax.Array:
        return jnp.sum(self.valid.astype(jnp.int32))


# ---------------------------------------------------------------------------
# Pyramid
# ---------------------------------------------------------------------------


def build_pyramid(img: jax.Array, cfg: OrbConfig) -> list[jax.Array]:
    """[..., H, W] float32 -> list of per-level images (ComputePyramid).

    Each level resizes from the PREVIOUS level (like the reference's
    cv::resize chain, ORBextractor.cc:1060) — ~30% less resampling work
    than resizing every level from level 0. Leading batch dims pass
    through (the stereo-pair extractor batches both images)."""
    h, w = img.shape[-2:]
    levels = [img]
    for lv in range(1, cfg.n_levels):
        s = float(cfg.level_scales[lv])
        nh, nw = round(h / s), round(w / s)
        levels.append(
            jax.image.resize(levels[-1], (*img.shape[:-2], nh, nw),
                             method="bilinear")
        )
    return levels


# ---------------------------------------------------------------------------
# FAST with score + NMS
# ---------------------------------------------------------------------------


def fast_score_map(img: jax.Array, threshold: float,
                   min_threshold: float | None = None) -> jax.Array:
    """FAST-9/16 response map at one threshold; 0 where not a corner."""
    del min_threshold  # blending handled by per-cell selection
    return fast_score_maps(img, (threshold,))[0]


def fast_score_maps(img: jax.Array, thresholds) -> list[jax.Array]:
    """FAST-9/16 response maps at several thresholds from ONE shifted
    stack (the [16, H, W] circle tensor is the expensive part — memory
    traffic — so the reference's iniThFAST/minThFAST two-pass becomes a
    shared-diff dual evaluation).

    Response: max of summed positive / negative exceedances (common
    GPU-FAST scoring; deterministic ranking for NMS + top-k).
    """
    pad = 3
    padded = jnp.pad(
        img, [(0, 0)] * (img.ndim - 2) + [(pad, pad), (pad, pad)],
        mode="edge")
    h, w = img.shape[-2:]
    # [16, ..., H, W] circle values via static slices of the padded image.
    circ = jnp.stack(
        [padded[..., 3 + dy: 3 + dy + h, 3 + dx: 3 + dx + w]
         for dx, dy in FAST_CIRCLE]
    )
    diff = circ - img[None]

    def arc9(m):
        # AND over 9 consecutive circle positions, any start: doubling trick.
        r = m & jnp.roll(m, -1, 0)        # runs of 2
        r = r & jnp.roll(r, -2, 0)        # 4
        r = r & jnp.roll(r, -4, 0)        # 8
        r = r & jnp.roll(m, -8, 0)        # 9
        return jnp.any(r, axis=0)

    out = []
    for threshold in thresholds:
        is_corner = arc9(diff > threshold) | arc9(diff < -threshold)
        score_b = jnp.sum(jnp.maximum(diff - threshold, 0.0), axis=0)
        score_d = jnp.sum(jnp.maximum(-diff - threshold, 0.0), axis=0)
        score = jnp.maximum(score_b, score_d)
        out.append(jnp.where(is_corner, score, 0.0))
    return out


# FAST+NMS+blend backend: "auto" uses the fused Pallas kernel on TPU
# (ops/pallas_fast — one HBM round-trip instead of the [16,H,W] circle
# stack); "on"/"off" force a path. Validated on v5e (2026-08-19,
# scripts/validate_pallas_fast.py): correct at every pyramid shape
# (1-ulp score drift from summation order, keypoint selection overlap
# 1.0000) and 1.97x faster STANDALONE at 480x752 (0.43 vs 0.85 ms).
# Inside the full extract program it was a wash at the August-19
# measurement, but the 2026-08-20 full-frame A/B (bench.py, 60-frame
# chains, two runs each way) shows a consistent win once the rest of
# the pipeline got faster: 375-feat frame 3.67 -> 3.49/3.52 ms (3.15x
# of the reference 11 ms), 1200-feat 5.38 -> 5.18/5.20 ms (6.76x of
# 35 ms) — so the default is now "auto" (Pallas on TPU, XLA elsewhere).
# ORB_FAST_KERNEL overrides for A/Bs (the image-wide FAST/blend share
# grows as the feature budget shrinks, so the crossover is per-config).


def _env_mode(name: str, extra: tuple = ()) -> str:
    """Validated auto/on/off env switch: these gate TPU numerics and
    performance, so a typo ('ON', 'true') must fail loudly instead of
    silently disabling the kernel."""
    v = os.environ.get(name, "auto").strip().lower()
    if v not in ("auto", "on", "off") + extra:
        raise ValueError(
            f"{name}={os.environ.get(name)!r}: expected "
            f"auto|on|off{''.join('|' + e for e in extra)}")
    return v


FAST_KERNEL_MODE = _env_mode("ORB_FAST_KERNEL")


def _use_pallas_fast() -> bool:
    if FAST_KERNEL_MODE == "auto":
        return jax.default_backend() == "tpu"
    return FAST_KERNEL_MODE == "on"


def _blended_score(im: jax.Array, cfg: "OrbConfig") -> jax.Array:
    """Strict/permissive blended, NMS'd FAST score map (the selection
    input of extract_orb): iniThFAST winners boosted above every
    minThFAST score, reference ORBextractor.cc per-cell fallback."""
    if _use_pallas_fast():
        from . import pallas_fast
        return pallas_fast.fast_nms_blend(
            im, cfg.fast_threshold, cfg.fast_min_threshold)
    s_hi, s_lo = fast_score_maps(
        im, (cfg.fast_threshold, cfg.fast_min_threshold))
    score = nms3(s_hi)
    score_lo = nms3(s_lo)
    return jnp.where(score > 0, score + 1e4, score_lo)


def nms3(score: jax.Array) -> jax.Array:
    """3x3 non-maximum suppression via max-pool compare (batch dims
    pass through)."""
    ones = (1,) * (score.ndim - 2)
    m = jax.lax.reduce_window(
        score, -jnp.inf, jax.lax.max, ones + (3, 3),
        ones + (1, 1), "SAME"
    )
    return jnp.where(score >= m, score, 0.0)


def select_keypoints(score: jax.Array, n_keep: int, cfg: OrbConfig):
    """Deterministic spatially-distributed top-N (DistributeOctTree stand-in).

    Per-cell top-k caps how many keypoints one textured region contributes,
    then a global top-N ranks the survivors by response.

    Returns (uv [n_keep, 2] int32 in-level coords, score [n_keep], valid).
    """
    h, w = score.shape
    c = cfg.cell_size
    gy, gx = -(-h // c), -(-w // c)
    padded = jnp.pad(score, ((0, gy * c - h), (0, gx * c - w)))
    cells = padded.reshape(gy, c, gx, c).transpose(0, 2, 1, 3).reshape(
        gy * gx, c * c
    )
    k = min(cfg.cell_topk, c * c)
    cell_scores, cell_idx = jax.lax.top_k(cells, k)          # [G, k]
    cy = jnp.arange(gy * gx, dtype=jnp.int32)[:, None] // gx
    cx = jnp.arange(gy * gx, dtype=jnp.int32)[:, None] % gx
    ys = cy * c + cell_idx // c                               # [G, k]
    xs = cx * c + cell_idx % c
    flat_scores = cell_scores.reshape(-1)
    flat_y = ys.reshape(-1)
    flat_x = xs.reshape(-1)
    n_keep = min(n_keep, flat_scores.shape[0])
    top_scores, top_i = jax.lax.top_k(flat_scores, n_keep)
    uv = jnp.stack([flat_x[top_i], flat_y[top_i]], axis=-1)
    # Border + positivity validity.
    b = cfg.border
    valid = (
        (top_scores > 0)
        & (uv[:, 0] >= b) & (uv[:, 0] < w - b)
        & (uv[:, 1] >= b) & (uv[:, 1] < h - b)
    )
    return uv, top_scores, valid


def select_keypoints_batched(scores: list, n_keeps: list, cfg: OrbConfig):
    """Cross-level batched select_keypoints: identical results, ONE pair
    of top-k programs for all pyramid levels instead of one per level.

    Each level's per-cell candidate table is padded to the largest
    level's cell count and stacked, so the per-cell top-k and the global
    top-N run as single batched sorts ([L, Gmax, c*c] / [L, Gmax*k]) —
    the 8 small per-level sorts are latency-bound on TPU (r4 profile:
    0.33 ms of the 1.31 ms extraction total). Pad rows carry score 0 and
    sit AFTER every real cell, so lax.top_k's stable tie order prefers
    real entries and the selected set matches the per-level path
    exactly; pad picks (only when a level has fewer cells*k than its
    budget) come out with score 0 => valid=False, same as the unbatched
    shortfall path.

    Returns [(uv, score, valid), ...] per level, shapes [n_keep_l, ...].
    """
    c = cfg.cell_size
    k = min(cfg.cell_topk, c * c)
    dims = []
    cell_rows = []
    for score in scores:
        h, w = score.shape
        gy, gx = -(-h // c), -(-w // c)
        padded = jnp.pad(score, ((0, gy * c - h), (0, gx * c - w)))
        cells = padded.reshape(gy, c, gx, c).transpose(0, 2, 1, 3).reshape(
            gy * gx, c * c)
        dims.append((h, w, gx, gy * gx))
        cell_rows.append(cells)
    g_max = max(d[3] for d in dims)
    stacked = jnp.stack([jnp.pad(r, ((0, g_max - r.shape[0]), (0, 0)))
                         for r in cell_rows])                # [L, Gmax, c*c]
    cell_scores, cell_idx = jax.lax.top_k(stacked, k)        # [L, Gmax, k]
    flat_scores = cell_scores.reshape(len(scores), -1)       # [L, Gmax*k]
    n_max = min(max(n_keeps), g_max * k)
    top_scores, top_i = jax.lax.top_k(flat_scores, n_max)    # [L, n_max]
    g_sel = top_i // k                                       # cell of pick
    in_cell = jnp.take_along_axis(
        cell_idx.reshape(len(scores), -1), top_i, axis=-1)
    out = []
    for lv, (h, w, gx, g_l) in enumerate(dims):
        n_l = min(n_keeps[lv], g_max * k)
        s = top_scores[lv, :n_l]
        g = g_sel[lv, :n_l]
        ic = in_cell[lv, :n_l]
        uv = jnp.stack([(g % gx) * c + ic % c,
                        (g // gx) * c + ic // c], axis=-1).astype(jnp.int32)
        b = cfg.border
        valid = ((s > 0) & (g < g_l)
                 & (uv[:, 0] >= b) & (uv[:, 0] < w - b)
                 & (uv[:, 1] >= b) & (uv[:, 1] < h - b))
        # Pad picks (g >= g_l, budget beyond this level's real cell
        # count) carry another level's cell geometry in uv — zero them
        # so invalid rows match the unbatched shortfall path exactly.
        uv = jnp.where(valid[:, None], uv, 0)
        out.append((uv, s, valid))
    return out


def select_keypoints_concat(scores: list, n_keeps: list, cfg: OrbConfig):
    """Cross-level selection with the per-cell top-k CONCATENATED.

    The r4 batched variant padded every level's cell table to the
    level-0 cell count before one big sort — measured 2.5x overwork on
    v5e (the recorded negative result above).  This version concatenates
    the REAL cells of all levels into one [G_tot, c*c] table (G_tot ~
    1.33 G_0 for a 1.2-scale pyramid vs L*G_0 padded), runs the
    dominant per-cell top-k as ONE sort with zero pad rows, then does
    the small per-level global top-N on slices.  Per-level results are
    bit-identical to select_keypoints (same candidates, same stable
    top_k order).

    Returns [(uv, score, valid), ...] per level, shapes [n_keep_l, ...].
    """
    c = cfg.cell_size
    k = min(cfg.cell_topk, c * c)
    rows, metas, offs = [], [], [0]
    for score in scores:
        h, w = score.shape
        gy, gx = -(-h // c), -(-w // c)
        padded = jnp.pad(score, ((0, gy * c - h), (0, gx * c - w)))
        cells = padded.reshape(gy, c, gx, c).transpose(0, 2, 1, 3).reshape(
            gy * gx, c * c)
        rows.append(cells)
        metas.append((h, w, gx, gy * gx))
        offs.append(offs[-1] + gy * gx)
    big = jnp.concatenate(rows)                          # [G_tot, c*c]
    cell_scores, cell_idx = jax.lax.top_k(big, k)        # ONE sort
    out = []
    for lv, (h, w, gx, g_l) in enumerate(metas):
        s_flat = cell_scores[offs[lv]:offs[lv + 1]].reshape(-1)  # [G_l*k]
        i_flat = cell_idx[offs[lv]:offs[lv + 1]].reshape(-1)
        n_l = min(n_keeps[lv], g_l * k)
        top_scores, top_i = jax.lax.top_k(s_flat, n_l)
        g = top_i // k
        ic = i_flat[top_i]
        uv = jnp.stack([(g % gx) * c + ic % c,
                        (g // gx) * c + ic // c], axis=-1).astype(jnp.int32)
        b = cfg.border
        valid = ((top_scores > 0)
                 & (uv[:, 0] >= b) & (uv[:, 0] < w - b)
                 & (uv[:, 1] >= b) & (uv[:, 1] < h - b))
        uv = jnp.where(valid[:, None], uv, 0)
        out.append((uv, top_scores, valid))
    return out


# ---------------------------------------------------------------------------
# Orientation + descriptors
# ---------------------------------------------------------------------------


def _use_mxu_gather() -> bool:
    """On TPU, XLA `gather` over per-keypoint patch indices lowers to a
    serialized scalar loop — measured 43 of the 45 ms/image of round-1
    ORB extraction. Exact one-hot matmul contractions put the same data
    movement on the MXU instead (~30x faster). CPU keeps plain gathers
    (faster there, and the test mesh is CPU)."""
    return jax.default_backend() == "tpu"


def gather_patches(img: jax.Array, centers: jax.Array, radius: int,
                   mxu: bool | None = None):
    """Gather [N, 2r+1, 2r+1] square patches around integer centers (x, y).

    Centers may be anywhere; the image is edge-padded so out-of-range taps
    clamp (callers gate validity by border anyway).

    Two equivalent implementations (bit-exact: one-hot rows select exactly
    one element each, and f32 HIGHEST matmul of 0/1 weights is exact):
    XLA gather (CPU) or separable one-hot MXU contraction (TPU).
    """
    if mxu is None:
        mxu = _use_mxu_gather()
    pad = radius + 1
    padded = jnp.pad(img, pad, mode="edge")
    d = 2 * radius + 1
    dy = jnp.arange(d, dtype=jnp.int32) - radius
    if not mxu:
        rows = centers[:, 1, None, None] + dy[None, :, None] + pad
        cols = centers[:, 0, None, None] + dy[None, None, :] + pad
        return padded[rows, cols]
    # bf16 MXU passes (4x the f32 rate on v5e): each one-hot row has
    # EXACTLY one nonzero, so the contraction has no accumulation at
    # all — the only effect is quantizing image intensities to bf16
    # (integers up to 256 are exact in bf16; resize/blur fractions round
    # at ~0.4%, below sensor noise).  Round-3 A/B: extract 2.7 -> 1.0 ms.
    hp, wp = padded.shape
    pb = padded.astype(jnp.bfloat16)
    rows = centers[:, 1, None] + dy[None, :] + pad          # [N, d]
    cols = centers[:, 0, None] + dy[None, :] + pad          # [N, d]
    oh_r = (rows[..., None] == jnp.arange(hp, dtype=rows.dtype)
            ).astype(jnp.bfloat16)                          # [N, d, Hp]
    tmp = jnp.einsum("ndh,hw->ndw", oh_r, pb,
                     preferred_element_type=jnp.float32)    # [N, d, Wp]
    oh_c = (cols[..., None] == jnp.arange(wp, dtype=cols.dtype)
            ).astype(jnp.bfloat16)                          # [N, d, Wp]
    return jnp.einsum("nrw,ncw->nrc", tmp.astype(jnp.bfloat16), oh_c,
                      preferred_element_type=jnp.float32)   # [N, d, d]


def ic_angle(patches: jax.Array) -> jax.Array:
    """Intensity-centroid orientation over the circular patch
    (ORBextractor.cc IC_Angle :55). patches: [N, 31, 31] -> radians [N]."""
    radius = (patches.shape[-1] - 1) // 2
    mask = jnp.asarray(_disc_mask(radius))
    coords = jnp.arange(-radius, radius + 1, dtype=patches.dtype)
    weighted = patches * mask
    m10 = jnp.einsum("nyx,x->n", weighted, coords)
    m01 = jnp.einsum("nyx,y->n", weighted, coords)
    return jnp.arctan2(m01, m10)


def gaussian_blur7(img: jax.Array, sigma: float = 2.0) -> jax.Array:
    """Separable 7x7 Gaussian (reference blurs before descriptors,
    ORBextractor.cc:1012-1024)."""
    x = np.arange(-3, 4, dtype=np.float32)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    k /= k.sum()
    k = jnp.asarray(k, img.dtype)
    nb = img.ndim - 2
    pad = jnp.pad(img, [(0, 0)] * nb + [(3, 3), (3, 3)], mode="edge")
    # Horizontal then vertical 1-D convs (XLA fuses these fine).
    h = sum(pad[..., 3:-3, i:i + img.shape[-1]] * k[i] for i in range(7))
    hpad = jnp.pad(h, [(0, 0)] * nb + [(3, 3), (0, 0)], mode="edge")
    v = sum(hpad[..., i:i + img.shape[-2], :] * k[i] for i in range(7))
    return v


# Rotation can push BRIEF taps to PATCH_RADIUS*sqrt(2): the descriptor
# patch must cover that.
BRIEF_R = int(math.ceil(PATCH_RADIUS * math.sqrt(2.0))) + 1   # 23


def brief_descriptors(img_blur: jax.Array, centers: jax.Array,
                      angles: jax.Array) -> jax.Array:
    """Rotated-BRIEF 256-bit descriptors packed as [N, 8] uint32.

    Equivalent of computeOrbDescriptor (ORBextractor.cc:83): the sampling
    pattern is rotated by the keypoint angle with rounded (nearest-pixel)
    taps, bits are I(p) < I(q).
    """
    patches = gather_patches(img_blur, centers, BRIEF_R)    # [N, 47, 47]
    return brief_from_patches(patches, angles)


def brief_from_patches(patches: jax.Array, angles: jax.Array) -> jax.Array:
    """Rotated-BRIEF bits from pre-gathered blurred patches
    [N, 2*BRIEF_R+1, 2*BRIEF_R+1] centered on each keypoint."""
    r = BRIEF_R
    d = 2 * r + 1
    assert patches.shape[-1] == d

    pat = jnp.asarray(BRIEF_PATTERN, jnp.float32)           # [256, 2, 2]
    ca, sa = jnp.cos(angles), jnp.sin(angles)               # [N]
    px, py = pat[..., 0], pat[..., 1]                       # [256, 2]
    # Rotated integer offsets per keypoint: [N, 256, 2]
    rx = jnp.round(ca[:, None, None] * px - sa[:, None, None] * py).astype(
        jnp.int32
    )
    ry = jnp.round(sa[:, None, None] * px + ca[:, None, None] * py).astype(
        jnp.int32
    )
    iy = jnp.clip(ry + r, 0, d - 1)
    ix = jnp.clip(rx + r, 0, d - 1)
    if not _use_mxu_gather():
        flat = patches.reshape(patches.shape[0], -1)        # [N, d*d]
        idx = iy * d + ix                                   # [N, 256, 2]
        vals = jnp.take_along_axis(
            flat[:, None, :], idx.reshape(idx.shape[0], -1)[:, None, :],
            axis=-1,
        ).reshape(idx.shape)                                # [N, 256, 2]
    else:
        # Separable one-hot taps on the MXU in bf16 (single-nonzero rows
        # => no accumulation; see gather_patches).
        ar = jnp.arange(d, dtype=iy.dtype)
        oh_y = (iy[..., None] == ar).astype(jnp.bfloat16)   # [N,256,2,d]
        rowsel = jnp.einsum("nbpy,nyx->nbpx", oh_y,
                            patches.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
        oh_x = (ix[..., None] == ar).astype(patches.dtype)
        vals = jnp.sum(rowsel * oh_x, axis=-1)              # [N, 256, 2]
    bits = (vals[..., 0] < vals[..., 1]).astype(jnp.uint32)  # [N, 256]
    # Pack 256 bits -> 8 uint32 words.
    bits = bits.reshape(bits.shape[0], DESC_WORDS, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(bits << shifts[None, None, :], axis=-1, dtype=jnp.uint32)


# Extraction-tail backend: "auto" fuses the orientation + descriptor
# stages on TPU. The unfused path gathers TWO patches per keypoint
# (raw 31x31 for IC angle, blurred 47x47 for BRIEF) and Gaussian-blurs
# the WHOLE image at every pyramid level just to read 512 taps per
# keypoint from it. The fused path gathers ONE 53x53 raw patch, takes
# the IC angle from its center, blurs INSIDE the patch (7-tap separable
# over [N,53,53] — a few hundred kFLOP vs 14 ops/pixel x H x W x 8
# levels x 2 images), and samples BRIEF from the in-patch blur. Interior
# keypoints are bit-exact vs the unfused path (same kernel, same
# summation order) up to FMA-contraction ULP ties; keypoints whose
# 53x53 window crosses the image edge see clamp-then-blur instead of
# blur-then-clamp on the out-of-image taps (sub-noise differences).
# Measured v5e 2026-08-20: selection identical, angles exact, 0.21%
# descriptor-bit drift (bf16-quantization ties); full-frame bench
# 375-feat 3.47 -> 3.36 ms (3.27x of the reference 11 ms), 1200-feat
# 5.17 -> 5.09 ms (6.88x of 35 ms).
FUSED_TAIL_MODE = _env_mode("ORB_FUSED_TAIL")
# Patch gather backend inside the fused tail: "auto" routes the 53x53
# raw-patch gather through the Pallas aligned-window kernel on TPU
# (ops/pallas_gather.py — zero HBM intermediates vs the one-hot
# contraction's ~200 MB/frame; exact f32, no bf16 quantization).
GATHER_KERNEL_MODE = _env_mode("ORB_GATHER_KERNEL")
_BLUR_HALO = 3
_TAIL_R = BRIEF_R + _BLUR_HALO           # 26 -> 53x53 raw patch


def _use_fused_tail() -> bool:
    if FUSED_TAIL_MODE == "auto":
        return jax.default_backend() == "tpu"
    return FUSED_TAIL_MODE == "on"


# v5e A/B (scripts/ab_extract_modes.py + /tmp/ab2 rerun, 2026-08-20,
# cross-level tail): the Pallas gather wins the 1200-feat/8-level
# extract (1.590 vs 1.699 ms) but loses the 375-feat/4-level one
# (0.474 vs 0.412) — its per-call image pad/copy overhead outweighs the
# avoided one-hot HBM traffic when the keypoint total is small. "auto"
# uses it on TPU only above the measured crossover.
# Whole-tail Pallas kernel (ops/pallas_tail.py): the entire keypoint
# tail — patch gather, in-patch blur, IC-angle, rotated-BRIEF taps —
# for ALL levels in ONE kernel over a stacked level atlas; zero HBM
# intermediates. Exact vs the XLA fused tail to reduction-order ULPs
# (measured 0.009% descriptor bits). MEASURED SLOWER on v5e
# (/tmp/ab3 2026-08-20: 1200-feat extract 2.95 vs 1.71 ms, 375-feat
# 1.00 vs 0.58): the per-keypoint [512,47]x[47,128] tap matmuls are too
# small to fill the MXU and Mosaic runs the unrolled chunk serially,
# while XLA's one-hot tail, though HBM-heavy on paper, fuses well.
# Kept off-by-default as the recorded negative result; "auto" = off.
TAIL_KERNEL_MODE = _env_mode("ORB_TAIL_KERNEL")


def _use_tail_kernel() -> bool:
    return TAIL_KERNEL_MODE == "on"


_GATHER_KERNEL_MIN_TOTAL = 800


def _use_gather_kernel(n_total: int | None = None) -> bool:
    if GATHER_KERNEL_MODE == "auto":
        return (jax.default_backend() == "tpu"
                and (n_total is None
                     or n_total >= _GATHER_KERNEL_MIN_TOTAL))
    return GATHER_KERNEL_MODE == "on"


# Cross-level batched selection (select_keypoints_batched): measured a
# REGRESSION on v5e (scripts/ab_extract_modes.py 2026-08-20: 1200-feat
# extract 2.37 ms vs 1.59, 375-feat 0.755 vs 0.546) — padding every
# level to the level-0 cell count does ~2.5x the sort work, and the
# per-level top-k sorts turn out NOT to be latency-bound at these
# sizes. Kept behind an off-by-default switch as the recorded negative
# result; "auto" = off everywhere.  "concat" selects the r5
# select_keypoints_concat variant: one zero-padding per-cell sort over
# the concatenated real cells of all levels (see its docstring) —
# ALSO a measured regression on v5e (scripts/ab_extract_modes.py r5,
# real-mode-flip fixed): 1200-feat extract 1.745 ms vs 1.639 per-level,
# 375-feat 0.766 vs 0.559 (one-hot gather both).  Third negative
# result on selection batching: even with zero pad overwork the single
# concatenated [G_tot, c*c] sort loses to L small per-level sorts —
# per-level top_k at these shapes is bandwidth-efficient and XLA
# overlaps the small sorts, while the concat forces one big
# synchronization point.  Selection is NOT program-count-bound.
BATCHED_SELECT_MODE = _env_mode("ORB_BATCHED_SELECT", ("concat",))


def _use_batched_select() -> bool:
    return BATCHED_SELECT_MODE == "on"


def _use_concat_select() -> bool:
    return BATCHED_SELECT_MODE == "concat"


def _blur7_patch(patches: jax.Array, sigma: float = 2.0) -> jax.Array:
    """Valid-region separable 7x7 Gaussian over [N, D, D] patches ->
    [N, D-6, D-6]; identical taps/order to gaussian_blur7's interior."""
    x = np.arange(-3, 4, dtype=np.float32)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    k /= k.sum()
    k = jnp.asarray(k, patches.dtype)
    dd = patches.shape[-1]
    h = sum(patches[:, :, i:i + dd - 6] * k[i] for i in range(7))
    v = sum(h[:, i:i + dd - 6, :] * k[i] for i in range(7))
    return v


def _gather_tail_patches(im: jax.Array, uv: jax.Array,
                         n_total: int | None = None) -> jax.Array:
    """[N, 53, 53] raw tail patches via the configured gather backend.

    `n_total` is the whole-frame keypoint count (all levels), used by
    the auto-mode crossover; None = this call is the whole frame."""
    if _use_gather_kernel(uv.shape[0] if n_total is None else n_total):
        from . import pallas_gather
        return pallas_gather.gather_patches_kernel(im, uv, _TAIL_R)
    return gather_patches(im, uv, _TAIL_R)


def _tail_from_big(big: jax.Array):
    """(angle, desc) from pre-gathered [N, 53, 53] raw patches."""
    c0 = _TAIL_R - PATCH_RADIUS
    ang = ic_angle(big[:, c0:c0 + 2 * PATCH_RADIUS + 1,
                       c0:c0 + 2 * PATCH_RADIUS + 1])
    blurp = _blur7_patch(big)                               # [N, 47, 47]
    desc = brief_from_patches(blurp, ang)
    return ang, desc


def extract_tail_fused(im: jax.Array, uv: jax.Array):
    """Fused orientation + descriptor tail: ONE patch gather per keypoint.

    Returns (angle [N], desc [N, 8]). `im` is the RAW (unblurred) level
    image, matching the reference (IC_Angle on the pyramid image,
    descriptors on the blurred one, ORBextractor.cc:1012-1024)."""
    return _tail_from_big(_gather_tail_patches(im, uv))


def extract_tail_fused_multi(level_imgs: list, level_uvs: list,
                             crossover_total: int | None = None):
    """Cross-level fused tail: per-level patch gathers (images differ in
    size), then ONE concatenated blur + IC-angle + BRIEF program for all
    levels — identical per-row math to extract_tail_fused, but the 8
    per-level keypoint-tail op groups (each latency-bound at a few
    hundred rows) collapse into one.

    `crossover_total` overrides the keypoint total used by the auto
    gather-backend crossover: extract_orb_batch passes its PER-IMAGE
    total so batch and stacked single-image extraction always pick the
    same gather backend (the two differ bit-wise: Pallas gathers exact
    f32, the one-hot fallback bf16).

    Returns [(angle, desc), ...] per level, in input order."""
    if _use_tail_kernel():
        from . import pallas_tail
        return pallas_tail.tail_fused_multi_kernel(level_imgs, level_uvs)
    n_total = sum(int(uv.shape[0]) for uv in level_uvs) \
        if crossover_total is None else crossover_total
    bigs = [_gather_tail_patches(im, uv, n_total)
            for im, uv in zip(level_imgs, level_uvs)]
    ang, desc = _tail_from_big(jnp.concatenate(bigs))
    out = []
    o = 0
    for b in bigs:
        n = b.shape[0]
        out.append((ang[o:o + n], desc[o:o + n]))
        o += n
    return out


# ---------------------------------------------------------------------------
# Full extraction
# ---------------------------------------------------------------------------


def extract_orb(img: jax.Array, cfg: OrbConfig) -> OrbFeatures:
    """Full ORB pipeline on one grayscale image [H, W] float32.

    Compiles to one XLA program; per-level work has static shapes.
    """
    pyramid = build_pyramid(img, cfg)
    per_level = cfg.features_per_level

    levels = [(lv, pyramid[lv]) for lv in range(len(pyramid))
              if int(per_level[lv]) > 0]
    # Strict threshold with permissive fallback (reference
    # iniThFAST->minThFAST per cell); blended maps keep selection
    # fixed-shape. Fused Pallas kernel on TPU, XLA elsewhere.
    scores = [_blended_score(im, cfg) for _, im in levels]
    if _use_batched_select():
        sels = select_keypoints_batched(
            scores, [int(per_level[lv]) for lv, _ in levels], cfg)
    elif _use_concat_select():
        sels = select_keypoints_concat(
            scores, [int(per_level[lv]) for lv, _ in levels], cfg)
    else:
        sels = [select_keypoints(s, int(per_level[lv]), cfg)
                for s, (lv, _) in zip(scores, levels)]
    sels2 = []
    for (uv, s, valid), (lv, _) in zip(sels, levels):
        n_l = int(per_level[lv])
        if uv.shape[0] < n_l:  # tiny levels: pad capacity
            padn = n_l - uv.shape[0]
            uv = jnp.pad(uv, ((0, padn), (0, 0)))
            s = jnp.pad(s, (0, padn))
            valid = jnp.pad(valid, (0, padn))
        sels2.append((uv, s, valid))
    if _use_fused_tail():
        tails = extract_tail_fused_multi(
            [im for _, im in levels], [uv for uv, _, _ in sels2])
    else:
        tails = []
        for (lv, im), (uv, _, _) in zip(levels, sels2):
            patches = gather_patches(im, uv, PATCH_RADIUS)
            ang = ic_angle(patches)
            blur = gaussian_blur7(im)
            tails.append((ang, brief_descriptors(blur, uv, ang)))

    uts, lvls, angs, scs, descs, vals = [], [], [], [], [], []
    for (lv, im), (uv, s, valid), (ang, desc) in zip(levels, sels2, tails):
        n_l = int(per_level[lv])
        scale = float(cfg.level_scales[lv])
        uts.append(uv.astype(jnp.float32) * scale)
        lvls.append(jnp.full((n_l,), lv, jnp.int32))
        angs.append(ang)
        scs.append(jnp.where(valid, s, 0.0))
        descs.append(desc)
        vals.append(valid)

    return OrbFeatures(
        uv=jnp.concatenate(uts),
        level=jnp.concatenate(lvls),
        angle=jnp.concatenate(angs),
        score=jnp.concatenate(scs),
        desc=jnp.concatenate(descs),
        valid=jnp.concatenate(vals),
    )


def extract_orb_batch(imgs: jax.Array, cfg: OrbConfig) -> OrbFeatures:
    """ORB on a batch of same-sized images [B, H, W] (the stereo pair).

    The image-wide stages — pyramid resize, the [16, B, h, w] FAST
    circle stack, NMS, and the descriptor blur — run batched in one
    program, giving the VPU full tiles where two separate 375-feature
    extractions leave it half-idle; the keypoint-level tail (selection,
    patch gathers, BRIEF) stays per-image because its one-hot MXU
    contractions are already square-ish (a vmap over the whole pipeline
    measured SLOWER on v5e than two sequential programs — the batched
    gathers triple the one-hot row count without improving tiling).

    Returns OrbFeatures with a leading [B] axis on every field;
    numerically identical to stacking per-image `extract_orb` calls.
    """
    B = imgs.shape[0]
    pyramid = build_pyramid(imgs, cfg)
    per_level = cfg.features_per_level
    fused_tail = _use_fused_tail()

    fields: list[list] = [[] for _ in range(B)]
    # Per-(level, image) selection inputs, flattened so that batched
    # selection and the cross-level fused tail each run as ONE program
    # over all levels AND both images.
    sel_scores, sel_meta = [], []          # meta: (lv, b, im_b, blur_b)
    for lv, im in enumerate(pyramid):
        n_l = int(per_level[lv])
        if n_l == 0:
            continue
        if _use_pallas_fast():
            from . import pallas_fast
            score_all = jnp.stack([
                pallas_fast.fast_nms_blend(
                    im[b], cfg.fast_threshold, cfg.fast_min_threshold)
                for b in range(B)])
        else:
            s_hi, s_lo = fast_score_maps(
                im, (cfg.fast_threshold, cfg.fast_min_threshold))
            score_b = nms3(s_hi)
            score_lo_b = nms3(s_lo)
            score_all = jnp.where(score_b > 0, score_b + 1e4, score_lo_b)
        blur_all = None if fused_tail else gaussian_blur7(im)
        for b in range(B):
            sel_scores.append(score_all[b])
            sel_meta.append((lv, b, im[b],
                             None if fused_tail else blur_all[b]))
    if _use_batched_select():
        sels = select_keypoints_batched(
            sel_scores, [int(per_level[lv]) for lv, *_ in sel_meta], cfg)
    elif _use_concat_select():
        sels = select_keypoints_concat(
            sel_scores, [int(per_level[lv]) for lv, *_ in sel_meta], cfg)
    else:
        sels = [select_keypoints(s, int(per_level[lv]), cfg)
                for s, (lv, *_) in zip(sel_scores, sel_meta)]
    sels2 = []
    for (uv, s, valid), (lv, *_) in zip(sels, sel_meta):
        n_l = int(per_level[lv])
        if uv.shape[0] < n_l:
            padn = n_l - uv.shape[0]
            uv = jnp.pad(uv, ((0, padn), (0, 0)))
            s = jnp.pad(s, (0, padn))
            valid = jnp.pad(valid, (0, padn))
        sels2.append((uv, s, valid))
    if fused_tail:
        # Per-image crossover total (not the B-image sum) so the gather
        # backend matches stacked per-image extract_orb calls bit-wise.
        per_img_total = sum(int(per_level[lv])
                            for lv, b, *_ in sel_meta if b == 0)
        tails = extract_tail_fused_multi(
            [m[2] for m in sel_meta], [uv for uv, _, _ in sels2],
            crossover_total=per_img_total)
    else:
        tails = []
        for (lv, b, im_b, blur_b), (uv, _, _) in zip(sel_meta, sels2):
            patches = gather_patches(im_b, uv, PATCH_RADIUS)
            ang = ic_angle(patches)
            tails.append((ang, brief_descriptors(blur_b, uv, ang)))
    for (lv, b, *_), (uv, s, valid), (ang, desc) in zip(
            sel_meta, sels2, tails):
        n_l = int(per_level[lv])
        scale = float(cfg.level_scales[lv])
        fields[b].append((
            uv.astype(jnp.float32) * scale,
            jnp.full((n_l,), lv, jnp.int32),
            ang, jnp.where(valid, s, 0.0), desc, valid))

    def cat(b, i):
        return jnp.concatenate([t[i] for t in fields[b]])

    return OrbFeatures(
        uv=jnp.stack([cat(b, 0) for b in range(B)]),
        level=jnp.stack([cat(b, 1) for b in range(B)]),
        angle=jnp.stack([cat(b, 2) for b in range(B)]),
        score=jnp.stack([cat(b, 3) for b in range(B)]),
        desc=jnp.stack([cat(b, 4) for b in range(B)]),
        valid=jnp.stack([cat(b, 5) for b in range(B)]),
    )
