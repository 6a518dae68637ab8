"""Sim3/SE3 3D-3D alignment: batched Horn closed form + RANSAC.

TPU-native equivalent of src/Sim3Solver.cc (Sim3Solver::iterate/ComputeSim3,
Sim3Solver.h:16-103) and the relocalization solver role of PnPsolver
(EPnP RANSAC) for stereo/RGB-D, where keypoints carry metric depth and the
2D-3D problem reduces to 3D-3D.

Where the reference draws one random triplet per iteration in a serial
loop, all RANSAC hypotheses are evaluated at once: [H] triplets -> vmapped
Horn -> [H, N] inlier matrices -> argmax, one fixed-shape program.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..math import lie


def horn_alignment(p_src: jax.Array, p_dst: jax.Array,
                   w: jax.Array | None = None, *, with_scale: bool = True):
    """Closed-form similarity aligning src -> dst ([..., N, 3]).

    Returns (R [...,3,3], t [...,3], s [...]): dst ~= s R src + t.
    (Horn 1987 quaternion method via SVD of the cross-covariance.)
    """
    if w is None:
        w = jnp.ones(p_src.shape[:-1], p_src.dtype)
    wsum = jnp.sum(w, axis=-1, keepdims=True)
    mu_s = jnp.sum(p_src * w[..., None], axis=-2) / wsum
    mu_d = jnp.sum(p_dst * w[..., None], axis=-2) / wsum
    xs = p_src - mu_s[..., None, :]
    xd = p_dst - mu_d[..., None, :]
    cov = jnp.einsum("...ni,...n,...nj->...ij", xd, w, xs) / wsum[..., None]
    U, D, Vt = jnp.linalg.svd(cov)
    det = jnp.linalg.det(U @ Vt)
    fix = jnp.stack([jnp.ones_like(det), jnp.ones_like(det), det], axis=-1)
    R = (U * fix[..., None, :]) @ Vt
    if with_scale:
        var_s = jnp.sum(w[..., None] * xs * xs, axis=(-2, -1)) / wsum[..., 0]
        s = jnp.sum(D * fix, axis=-1) / jnp.maximum(var_s, 1e-12)
    else:
        s = jnp.ones_like(det)
    t = mu_d - s[..., None] * jnp.einsum("...ij,...j->...i", R, mu_s)
    return R, t, s


class Sim3RansacResult(NamedTuple):
    R: jax.Array
    t: jax.Array
    s: jax.Array
    inliers: jax.Array      # [N] bool
    n_inliers: jax.Array


def sim3_ransac(
    p_src: jax.Array,
    p_dst: jax.Array,
    valid: jax.Array,
    key: jax.Array,
    *,
    n_hyp: int = 128,
    inlier_thresh: float = 0.05,
    with_scale: bool = True,
    refine: bool = True,
) -> Sim3RansacResult:
    """RANSAC Horn alignment of matched 3D pairs.

    p_src/p_dst: [N, 3] matched points; valid: [N]; inlier_thresh in
    dst-frame metric units (the reference thresholds chi2 in pixels; a
    metric gate suits the 3D-3D formulation and stereo depth noise).
    """
    N = p_src.shape[0]
    # [H, 3] random triplets biased to valid entries.
    logits = jnp.where(valid, 0.0, -1e9)
    idx = jax.random.categorical(key, logits, shape=(n_hyp, 3))
    tri_src = p_src[idx]                     # [H, 3, 3]
    tri_dst = p_dst[idx]
    R, t, s = horn_alignment(tri_src, tri_dst, with_scale=with_scale)

    pred = s[:, None, None] * jnp.einsum("hij,nj->hni", R, p_src) + t[:, None]
    err = jnp.linalg.norm(pred - p_dst[None], axis=-1)        # [H, N]
    inl = (err < inlier_thresh) & valid[None, :]
    counts = jnp.sum(inl, axis=-1)
    best = jnp.argmax(counts)
    inliers = inl[best]

    if refine:
        # Weighted Horn on the best inlier set (1 reference refinement).
        R_f, t_f, s_f = horn_alignment(
            p_src, p_dst, w=inliers.astype(p_src.dtype),
            with_scale=with_scale)
        pred = s_f * (p_src @ R_f.T) + t_f
        err = jnp.linalg.norm(pred - p_dst, axis=-1)
        inliers = (err < inlier_thresh) & valid
        return Sim3RansacResult(R=R_f, t=t_f, s=s_f, inliers=inliers,
                                n_inliers=jnp.sum(inliers.astype(jnp.int32)))
    return Sim3RansacResult(R=R[best], t=t[best], s=s[best],
                            inliers=inliers,
                            n_inliers=counts[best])
