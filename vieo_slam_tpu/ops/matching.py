"""Batched binary-descriptor matching: the TPU replacement for ORBmatcher.

Equivalent surface of src/ORBmatcher.cc (SearchByProjection x4, SearchByBoW,
SearchForInitialization, SearchForTriangulation, Fuse, DescriptorDistance
ORBmatcher.h:25-101) — redesigned as dense masked Hamming-distance matrices:

  - The reference walks per-feature grid buckets; on TPU the whole
    candidate-generation + scoring step is one [M, N] popcount(XOR) matrix
    with spatial/level/epipolar masks folded in, then masked argmin.  A
    1200x1200 problem is ~11 M popcounts — microseconds on the VPU and
    fully fused by XLA; the pointer-chasing grid walk would be serial.
  - Rotation-histogram consistency (ORBmatcher CheckOrientation, 30 bins,
    keep top-3) is a fixed-shape bincount + top-k mask.

All matchers return fixed-capacity index arrays with -1 for "no match".
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from . import pallas_matching

# Python int, NOT a device scalar: module-level jnp constants get
# closure-captured by jits and force a trace-time device->host read
# (permanently degrades the axon relay; TODO.md).
INF = 1 << 30

_BACKEND = None


def _use_pallas() -> bool:
    """True when the fused Pallas Hamming kernel should be used (TPU).

    The XLA-lowered Hamming+selection program flips the axon backend into
    a ~75 ms/execution degraded mode (TODO.md bisection); the Pallas
    kernel bypasses that lowering entirely and keeps the [M, N] distance
    matrix in VMEM. On CPU (the test mesh) the XLA path is used unless
    VIEO_FORCE_PALLAS=1 (which runs the kernel in interpret mode).
    """
    global _BACKEND
    force = os.environ.get("VIEO_FORCE_PALLAS")
    if force is not None:
        return force == "1"
    if _BACKEND is None:
        _BACKEND = jax.default_backend()
    return _BACKEND == "tpu"


def _best2(desc_a, desc_b, mask):
    """Fused masked Hamming + row-best2 + column-best dispatch.

    Returns (best_idx [Na] i32, best [Na] i32, second [Na] i32,
    col_best_row [Nb] i32). Masked-out rows give best = INF.
    """
    if _use_pallas():
        interpret = jax.default_backend() != "tpu"
        return pallas_matching.fused_best2(desc_a, desc_b, mask,
                                           interpret=interpret)
    dist = hamming_matrix(desc_a, desc_b)
    best_idx, best, second = masked_best2(dist, mask)
    d = jnp.where(mask, dist, INF)
    col_best_row = jnp.argmin(d, axis=0).astype(jnp.int32)
    return best_idx, best, second, col_best_row


def _mutual(col_best_row, best_idx, valid):
    """One-to-one filter: keep row a's match to column b only if a is also
    the best row of column b (ties to lowest row via argmin semantics)."""
    rows = jnp.arange(best_idx.shape[0], dtype=jnp.int32)
    return valid & (col_best_row[jnp.clip(best_idx, 0)] == rows)


def lookup_small(table: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather-free small-table lookup: table[clip(idx, 0, T-1)].

    Gathers from SMALL tables (the 8-entry pyramid scale/sigma tables)
    lower into a pathological program on the axon TPU relay — one such op
    degrades every subsequent program execution in the process ~400x
    (measured; big-table gathers, take, and segment_sum are clean). An
    8-wide one-hot contraction is exact and VPU-trivial.
    """
    T = table.shape[0]
    ids = jnp.arange(T, dtype=jnp.int32)
    idc = jnp.clip(idx, 0, T - 1).astype(jnp.int32)
    oh = (idc[..., None] == ids)                # [..., T]
    return jnp.sum(jnp.where(oh, table, jnp.zeros_like(table)), axis=-1)

# Reference thresholds (ORBmatcher.h TH_LOW/TH_HIGH, HISTO_LENGTH).
TH_LOW = 50
TH_HIGH = 100
HISTO_BINS = 30


def hamming_matrix(desc_a: jax.Array, desc_b: jax.Array) -> jax.Array:
    """[Na, 8] x [Nb, 8] packed uint32 -> [Na, Nb] int32 Hamming distances.

    DescriptorDistance (ORBmatcher.cc:25) for all pairs at once.
    """
    x = desc_a[:, None, :] ^ desc_b[None, :, :]
    return jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.int32)


def masked_best2(dist: jax.Array, mask: jax.Array):
    """Per-row best and second-best over masked columns.

    Returns (best_idx [Na], best [Na], second [Na]); masked-out columns get
    INF so rows with no candidates produce best >= INF.
    """
    # top_k on int32 degrades EVERY subsequent program execution ~400x on
    # the axon backend (measured; float top_k is fine). Hamming distances
    # are <= 256 so float32 is exact.
    d = jnp.where(mask, dist, INF).astype(jnp.float32)
    neg, idx = jax.lax.top_k(-d, 2)
    return (idx[:, 0], (-neg[:, 0]).astype(jnp.int32),
            (-neg[:, 1]).astype(jnp.int32))


def rotation_consistency_mask(
    angle_a: jax.Array, angle_b: jax.Array, match_idx: jax.Array,
    valid: jax.Array,
) -> jax.Array:
    """Keep only matches whose angle difference falls in the 3 dominant
    histogram bins (ORBmatcher's rotHist check). Returns bool [Na]."""
    d = angle_a - angle_b[jnp.clip(match_idx, 0)]
    two_pi = 2.0 * jnp.pi
    frac = (d / two_pi) % 1.0
    bins = jnp.clip((frac * HISTO_BINS).astype(jnp.int32), 0, HISTO_BINS - 1)
    hist = jnp.zeros((HISTO_BINS,), jnp.int32).at[bins].add(
        valid.astype(jnp.int32)
    )
    _, top3 = jax.lax.top_k(hist, 3)
    in_top = (bins[:, None] == top3[None, :]).any(axis=-1)
    return valid & in_top


def mutual_filter(best_idx: jax.Array, na: int, nb: int,
                  valid: jax.Array) -> jax.Array:
    """Keep a->b matches that are the best for that b too (one-to-one).

    Ties are broken by row order via scatter-min on row index.
    (Scatter variant — prefer mutual_from_dist inside matchers: scatter
    ops degrade every subsequent program execution ~400x on the axon
    backend, see TODO.md.)
    """
    owner = jnp.full((nb,), na, jnp.int32)
    rows = jnp.arange(na, dtype=jnp.int32)
    owner = owner.at[jnp.clip(best_idx, 0)].min(
        jnp.where(valid, rows, na)
    )
    return valid & (owner[jnp.clip(best_idx, 0)] == rows)


def mutual_from_dist(dist: jax.Array, mask: jax.Array,
                     best_idx: jax.Array, valid: jax.Array) -> jax.Array:
    """Scatter-free one-to-one filter: keep row a's match to column b only
    if a is also the argmin of column b (ties by lowest row index via
    argmin semantics). Uses the already-computed [Na, Nb] distance."""
    d = jnp.where(mask, dist, INF)
    col_best_row = jnp.argmin(d, axis=0)                  # [Nb]
    rows = jnp.arange(dist.shape[0], dtype=col_best_row.dtype)
    return valid & (col_best_row[jnp.clip(best_idx, 0)] == rows)


def match_descriptors(
    desc_a, desc_b, valid_a, valid_b, *,
    max_dist: int = TH_LOW,
    ratio: float = 0.9,
    angle_a=None, angle_b=None,
    extra_mask=None,
):
    """Generic one-to-one matcher (SearchForInitialization-style).

    Returns (idx [Na] int32 with -1 for unmatched, dist [Na] int32).
    """
    mask = valid_a[:, None] & valid_b[None, :]
    if extra_mask is not None:
        mask = mask & extra_mask
    best_idx, best, second, col_best = _best2(desc_a, desc_b, mask)
    ok = (best <= max_dist) & (best.astype(jnp.float32)
                               <= ratio * second.astype(jnp.float32))
    ok = _mutual(col_best, best_idx, ok)
    if angle_a is not None:
        ok = rotation_consistency_mask(angle_a, angle_b, best_idx, ok)
    return jnp.where(ok, best_idx, -1), jnp.where(ok, best, INF)


def search_by_projection(
    proj_uv, proj_level, proj_desc, proj_valid,
    kp_uv, kp_level, kp_desc, kp_valid,
    *,
    radius: float,
    level_scales,
    max_dist: int = TH_HIGH,
    ratio: float = 1.0,
    level_tolerance: int = 1,
):
    """Match projected map points against frame keypoints within a search
    window (ORBmatcher::SearchByProjection frame-frame / frame-localmap,
    ORBmatcher.h:41-61).

    Args:
      proj_uv: [M, 2] predicted pixel positions of map points.
      proj_level: [M] predicted octave (PredictScale equivalent).
      proj_desc: [M, 8] map-point representative descriptors.
      kp_*: frame keypoint arrays [N, ...].
      radius: base search radius in pixels (scaled by predicted level scale).
      level_scales: [L] per-level scale factors.
      ratio: best/second ratio test (1.0 disables).

    Returns (idx [M] -> keypoint index or -1, dist [M]).
    """
    level_scales = jnp.asarray(level_scales)
    r = radius * lookup_small(level_scales, proj_level)
    if _use_pallas():
        # Fully fused: window + level gate + Hamming + best2 in VMEM —
        # no [M, N] distance/mask intermediates in HBM.
        interpret = jax.default_backend() != "tpu"
        best_idx, best, second, col_best = \
            pallas_matching.fused_projection_best2(
                proj_desc, kp_desc, proj_uv, r, proj_level, proj_valid,
                kp_uv, kp_level, kp_valid,
                jnp.asarray(level_tolerance, jnp.float32),
                interpret=interpret)
    else:
        d2 = jnp.sum((proj_uv[:, None, :] - kp_uv[None, :, :]) ** 2,
                     axis=-1)
        within = d2 <= (r[:, None] ** 2)
        lvl_ok = jnp.abs(kp_level[None, :]
                         - proj_level[:, None]) <= level_tolerance
        mask = within & lvl_ok & proj_valid[:, None] & kp_valid[None, :]
        best_idx, best, second, col_best = _best2(proj_desc, kp_desc, mask)
    ok = best <= max_dist
    if ratio < 1.0:
        ok = ok & (best.astype(jnp.float32)
                   <= ratio * second.astype(jnp.float32))
    ok = _mutual(col_best, best_idx, ok)
    return jnp.where(ok, best_idx, -1), jnp.where(ok, best, INF)


def search_stereo_rectified(
    uv_l, level_l, desc_l, valid_l,
    uv_r, level_r, desc_r, valid_r,
    *,
    min_disp: float,
    max_disp: float,
    row_tol: float = 2.0,
    max_dist: int = TH_HIGH,
    level_scales=None,
):
    """Rectified-stereo matching (Frame::ComputeStereoMatches, Frame.cc:451):
    same-row search with disparity bounds, Hamming argmin, then parabolic
    sub-pixel refinement over neighbouring-disparity costs is approximated
    by weighted averaging of the best rival (cheap, fixed-shape).

    Returns (u_right [Nl] float32 with <0 for unmatched, idx_r [Nl]).
    """
    scale = 1.0
    if level_scales is not None:
        scale = lookup_small(jnp.asarray(level_scales), level_l)
    dv = jnp.abs(uv_l[:, None, 1] - uv_r[None, :, 1])
    row_ok = dv <= row_tol * (scale[:, None] if level_scales is not None else 1.0)
    disp = uv_l[:, None, 0] - uv_r[None, :, 0]
    disp_ok = (disp >= min_disp) & (disp <= max_disp)
    lvl_ok = jnp.abs(level_l[:, None] - level_r[None, :]) <= 1
    mask = row_ok & disp_ok & lvl_ok & valid_l[:, None] & valid_r[None, :]
    best_idx, best, _, col_best = _best2(desc_l, desc_r, mask)
    ok = best <= max_dist
    ok = _mutual(col_best, best_idx, ok)
    u_r = uv_r[jnp.clip(best_idx, 0), 0]
    return jnp.where(ok, u_r, -1.0), jnp.where(ok, best_idx, -1)


def fuse_candidates(
    proj_uv, proj_level, proj_desc, proj_valid,
    kp_uv, kp_level, kp_desc, kp_valid,
    *,
    radius: float,
    level_scales,
    max_dist: int = TH_LOW,
):
    """Fuse search (ORBmatcher::Fuse, ORBmatcher.h:93-101): like
    search_by_projection but tighter distance gate; the backend uses the
    result to merge duplicate landmarks."""
    return search_by_projection(
        proj_uv, proj_level, proj_desc, proj_valid,
        kp_uv, kp_level, kp_desc, kp_valid,
        radius=radius, level_scales=level_scales,
        max_dist=max_dist, ratio=1.0,
    )
