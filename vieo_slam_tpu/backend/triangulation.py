"""Two-view triangulation of new landmarks between keyframe pairs.

TPU-native equivalent of LocalMapping::CreateNewMapPoints
(src/LocalMapping.cc:650) + ORBmatcher::SearchForTriangulation
(ORBmatcher.h:80): unassociated keypoints of a new keyframe are matched to
unassociated keypoints of covisible keyframes under an epipolar gate, DLT-
triangulated, and filtered by parallax / depth / reprojection checks.

The reference walks BoW feature-vector buckets per pair; here the
candidate generation + epipolar gate + Hamming score is one dense masked
matrix per keyframe pair (one jitted program reused for every pair).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..cameras import models as cm
from ..ops.matching import lookup_small
from ..math import lie
from ..ops import matching


class TriangulationResult(NamedTuple):
    pw: jax.Array        # [N, 3] triangulated world points
    kp2: jax.Array       # [N] matched keypoint idx in KF2 (-1 invalid)
    good: jax.Array      # [N] all checks passed (N = keypoints of KF1)


@jax.jit
def triangulate_pair(
    Rcw1, tcw1, uv1, level1, desc1, free1,
    Rcw2, tcw2, uv2, level2, desc2, free2,
    inv_sigma2_tab, level_scales,
    cam: cm.Camera,
    *,
    max_dist: int = matching.TH_LOW,
    # NO Lowe ratio: ORBmatcher::SearchForTriangulation accepts the best
    # match under TH_LOW + the epipolar gate without a second-best test
    # (ORBmatcher.cc SearchForTriangulation, bestDist<TH_LOW) — repeated
    # texture is disambiguated by the epipolar line, and the ratio test
    # was halving mono landmark creation (53 -> 116 matches/pair
    # measured), starving the map until tracking died.
    ratio: float = 1.0,
    epipolar_sigma: float = 3.84,
    min_parallax_cos: float = 0.9998,
    max_depth: float = 60.0,
) -> TriangulationResult:
    """Match free keypoints of KF1 vs KF2 with an epipolar gate and
    triangulate. All inputs fixed-capacity; returns per-KF1-keypoint slots.
    """
    rays1 = cm.unproject(cam, uv1)                    # [N1, 3]
    rays2 = cm.unproject(cam, uv2)                    # [N2, 3]

    # Relative pose 2<-1: T21 = Tcw2 * Twc1.
    R21 = Rcw2 @ Rcw1.T
    t21 = tcw2 - jnp.einsum("ij,j->i", R21, tcw1)
    # Essential matrix E = [t]x R; epipolar line in normalized plane of 2.
    E = lie.hat(t21) @ R21
    l2 = jnp.einsum("ij,nj->ni", E, rays1)            # [N1, 3] lines
    # Distance of each KF2 ray to each KF1 epipolar line (normalized plane),
    # converted to pixels with the focal length.
    num = jnp.abs(jnp.einsum("ni,mi->nm", l2, rays2))  # [N1, N2]
    den = jnp.sqrt(l2[:, 0] ** 2 + l2[:, 1] ** 2)[:, None] + 1e-12
    f = 0.5 * (cam.fx + cam.fy)
    epi_px = f * num / den
    sig = lookup_small(level_scales, level2)[None, :]
    epi_ok = epi_px <= jnp.sqrt(epipolar_sigma) * sig

    idx, dist = matching.match_descriptors(
        desc1, desc2, free1, free2,
        max_dist=max_dist, ratio=ratio, extra_mask=epi_ok,
    )
    matched = idx >= 0
    kp2 = jnp.clip(idx, 0)

    # DLT triangulation per matched pair.
    rays = jnp.stack([rays1, rays2[kp2]], axis=1)      # [N1, 2, 3]
    Rs = jnp.broadcast_to(jnp.stack([Rcw1, Rcw2]), (uv1.shape[0], 2, 3, 3))
    ts = jnp.broadcast_to(jnp.stack([tcw1, tcw2]), (uv1.shape[0], 2, 3))
    pw = cm.triangulate_dlt(rays, Rs, ts)

    # Checks (camera_base.h TriangulateMatches semantics).
    pc1 = jnp.einsum("ij,nj->ni", Rcw1, pw) + tcw1
    pc2 = jnp.einsum("ij,nj->ni", Rcw2, pw) + tcw2
    depth_ok = (pc1[:, 2] > 0.05) & (pc2[:, 2] > 0.05) \
        & (pc1[:, 2] < max_depth)
    # Parallax between the two observation rays (in world frame).
    d1 = jnp.einsum("ji,nj->ni", Rcw1, rays1)          # R^T ray
    d2 = jnp.einsum("ji,nj->ni", Rcw2, rays2[kp2])
    cosp = jnp.sum(d1 * d2, axis=-1) / (
        jnp.linalg.norm(d1, axis=-1) * jnp.linalg.norm(d2, axis=-1) + 1e-12)
    parallax_ok = cosp < min_parallax_cos
    # Reprojection errors.
    uvh1 = cm.project(cam, pc1)
    uvh2 = cm.project(cam, pc2)
    e1 = jnp.sum((uvh1 - uv1) ** 2, axis=-1) \
        * lookup_small(inv_sigma2_tab, level1)
    e2 = jnp.sum((uvh2 - uv2[kp2]) ** 2, axis=-1) \
        * lookup_small(inv_sigma2_tab, level2[kp2])
    reproj_ok = (e1 < 5.991) & (e2 < 5.991)

    good = matched & depth_ok & parallax_ok & reproj_ok
    return TriangulationResult(pw=pw, kp2=jnp.where(good, kp2, -1),
                               good=good)
