"""Batched PnP RANSAC: camera pose from 2D-3D matches, all hypotheses in
one fixed-shape program.

Equivalent of the reference's EPnP-based P4P RANSAC used for monocular
relocalization (src/PnPsolver.cc, class at include/PnPsolver.h:44 —
`PnPsolver::iterate` runs sequential EPnP minimal samples + inlier
counting).  TPU-native redesign: H six-point DLT hypotheses solved as one
batched SVD (a [H,12,12] eigenproblem maps onto the MXU; sequential EPnP
does not), inlier counting as one [H,N] masked reduction, then a
weighted all-inlier DLT refit.  Six-point samples need a few times more
hypotheses than minimal P3P for the same confidence — batching makes
hypotheses ~free, unlike the reference's serial loop.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class PnPResult(NamedTuple):
    Rcw: jax.Array        # [3,3]
    tcw: jax.Array        # [3]
    inliers: jax.Array    # [N]
    n_inliers: jax.Array  # scalar int
    ok: jax.Array         # scalar bool


def _dlt_rows(xy: jax.Array, pw: jax.Array, w=None):
    """Per-correspondence 2x12 DLT rows. xy: [..., N, 2] unit-plane
    observations; pw: [..., N, 3] world points; w: optional [..., N]
    weights. Returns [..., 2N, 12]."""
    N = pw.shape[-2]
    X = jnp.concatenate([pw, jnp.ones(pw.shape[:-1] + (1,), pw.dtype)],
                        axis=-1)                        # [..., N, 4]
    z = jnp.zeros_like(X)
    x = xy[..., 0:1]
    y = xy[..., 1:2]
    r1 = jnp.concatenate([X, z, -x * X], axis=-1)       # [..., N, 12]
    r2 = jnp.concatenate([z, X, -y * X], axis=-1)
    if w is not None:
        r1 = r1 * w[..., None]
        r2 = r2 * w[..., None]
    return jnp.concatenate([r1, r2], axis=-2)           # [..., 2N, 12]


def _pose_from_p(P: jax.Array):
    """[..., 3, 4] projective camera -> (R, t) with R in SO(3).

    Sign is fixed so det(R) = +1 after scaling by the mean singular
    value of M = P[:, :3]; depth-positivity is handled by the caller
    (count inliers for +P, the DLT null vector's sign is arbitrary)."""
    M = P[..., :3]
    U, S, Vt = jnp.linalg.svd(M)
    detUV = jnp.linalg.det(U @ Vt)
    D = jnp.stack([jnp.ones_like(detUV), jnp.ones_like(detUV), detUV],
                  axis=-1)
    R = U @ (D[..., None] * Vt)
    scale = jnp.mean(S, axis=-1) * jnp.sign(detUV)
    t = P[..., 3] / jnp.where(jnp.abs(scale) < 1e-12, 1e-12, scale)[..., None]
    return R, t


def _reproj_errors(R, t, pw, xy):
    """[..., N] unit-plane reprojection error + depth sign."""
    pc = jnp.einsum("...ij,...nj->...ni", R, pw) + t[..., None, :]
    z = pc[..., 2]
    good_z = z > 1e-6
    pred = pc[..., :2] / jnp.where(good_z, z, 1.0)[..., None]
    err = jnp.linalg.norm(pred - xy, axis=-1)
    return jnp.where(good_z, err, jnp.inf)


def pnp_ransac(
    rays: jax.Array,
    pw: jax.Array,
    valid: jax.Array,
    key: jax.Array,
    *,
    n_hyp: int = 256,
    thresh: float = 0.01,
    min_inliers: int = 12,
) -> PnPResult:
    """RANSAC pose from bearing rays and world points.

    rays: [N, 3] camera-frame rays (any positive scale; unit-plane
      normalized internally) — from cm.unproject, so distorted models
      are already handled.
    pw:   [N, 3] matched world points.
    valid: [N] match validity.
    thresh: inlier gate on the unit plane (pixels / focal length).
    """
    N = rays.shape[0]
    dtype = rays.dtype
    xy = rays[:, :2] / jnp.where(jnp.abs(rays[:, 2:]) < 1e-9, 1e-9,
                                 rays[:, 2:])

    logits = jnp.where(valid, 0.0, -1e9).astype(dtype)
    idx = jax.random.categorical(key, logits, shape=(n_hyp, 6))
    xy_h = xy[idx]                                      # [H, 6, 2]
    pw_h = pw[idx]                                      # [H, 6, 3]

    A = _dlt_rows(xy_h, pw_h)                           # [H, 12, 12]
    _, _, Vt = jnp.linalg.svd(A)
    P = Vt[..., -1, :].reshape(-1, 3, 4)                # [H, 3, 4]
    R, t = _pose_from_p(P)

    err = _reproj_errors(R, t, pw[None], xy[None])      # [H, N]
    inl = (err < thresh) & valid[None]
    counts = jnp.sum(inl, axis=-1)
    best = jnp.argmax(counts)

    # all-inlier weighted refit (one more DLT over the full set)
    w = inl[best].astype(dtype)
    A_all = _dlt_rows(xy, pw, w=w)                      # [2N, 12]
    _, _, Vt2 = jnp.linalg.svd(A_all[None])
    P2 = Vt2[0, -1, :].reshape(3, 4)
    R2, t2 = _pose_from_p(P2)
    err2 = _reproj_errors(R2, t2, pw, xy)
    inl2 = (err2 < thresh) & valid
    n2 = jnp.sum(inl2)

    use_refit = n2 >= counts[best]
    R_out = jnp.where(use_refit, R2, R[best])
    t_out = jnp.where(use_refit, t2, t[best])
    inl_out = jnp.where(use_refit, inl2, inl[best])
    n_out = jnp.maximum(n2, counts[best])
    return PnPResult(Rcw=R_out, tcw=t_out, inliers=inl_out,
                     n_inliers=n_out, ok=n_out >= min_inliers)


def pnp_ransac_3d3d(
    p_cam: jax.Array,
    rays: jax.Array,
    pw: jax.Array,
    valid3d: jax.Array,
    valid: jax.Array,
    key: jax.Array,
    *,
    n_hyp: int = 1024,
    thresh: float = 0.0125,
    min_inliers: int = 12,
) -> PnPResult:
    """RANSAC pose from 3-point Horn hypotheses, REPROJECTION-scored.

    Depth-sensor relocalization (stereo/RGB-D): the frame's own stereo
    depth gives camera-frame 3D per keypoint, so a minimal sample is 3
    points (Horn closed form) instead of the 6 a DLT needs — at the
    ~35% match purity a kidnapped-frame BoW match yields, the clean-
    sample probability rises from 0.35^6 ~ 0.2% to 0.35^3 ~ 4.3%.
    Hypotheses are SCORED by unit-plane reprojection of the landmark
    set (thresh ~ px/fx), NOT 3D point distance: single-view stereo
    depth carries sigma_z ~ z^2 sigma_d/bf noise that a metric 3D gate
    mis-rejects (the round-4 Horn reloc path failed exactly there),
    while reprojection only sees the 3 sampled points' noise through
    the pose.  A weighted all-inlier DLT refit polishes the winner.

    p_cam:   [N, 3] camera-frame keypoint 3D (ray * stereo depth)
    rays:    [N, 3] camera-frame bearing rays (for scoring)
    pw:      [N, 3] matched landmark world positions
    valid3d: [N] rows usable for hypothesis sampling (have depth)
    valid:   [N] rows usable for scoring (all matches)
    """
    dtype = rays.dtype
    xy = rays[:, :2] / jnp.where(jnp.abs(rays[:, 2:]) < 1e-9, 1e-9,
                                 rays[:, 2:])
    logits = jnp.where(valid3d, 0.0, -1e9).astype(dtype)
    idx = jax.random.categorical(key, logits, shape=(n_hyp, 3))
    src = pw[idx]                                      # [H, 3, 3] world
    dst = p_cam[idx]                                   # [H, 3, 3] camera

    # batched 3-point Horn: R, t with dst ~ R @ src + t
    cs = jnp.mean(src, axis=1, keepdims=True)
    cd = jnp.mean(dst, axis=1, keepdims=True)
    H = jnp.einsum("hni,hnj->hij", dst - cd, src - cs)
    U, _, Vt = jnp.linalg.svd(H)
    detUV = jnp.linalg.det(U @ Vt)
    D = jnp.stack([jnp.ones_like(detUV), jnp.ones_like(detUV), detUV],
                  axis=-1)
    R = U @ (D[..., None] * Vt)                        # [H, 3, 3]
    t = cd[:, 0] - jnp.einsum("hij,hj->hi", R, cs[:, 0])

    err = _reproj_errors(R, t, pw[None], xy[None])     # [H, N]
    inl = (err < thresh) & valid[None]
    counts = jnp.sum(inl, axis=-1)
    best = jnp.argmax(counts)

    # weighted all-inlier DLT refit
    w = inl[best].astype(dtype)
    A_all = _dlt_rows(xy, pw, w=w)
    _, _, Vt2 = jnp.linalg.svd(A_all[None])
    P2 = Vt2[0, -1, :].reshape(3, 4)
    R2, t2 = _pose_from_p(P2)
    err2 = _reproj_errors(R2, t2, pw, xy)
    inl2 = (err2 < thresh) & valid
    n2 = jnp.sum(inl2)

    use_refit = n2 >= counts[best]
    R_out = jnp.where(use_refit, R2, R[best])
    t_out = jnp.where(use_refit, t2, t[best])
    inl_out = jnp.where(use_refit, inl2, inl[best])
    n_out = jnp.maximum(n2, counts[best])
    return PnPResult(Rcw=R_out, tcw=t_out, inliers=inl_out,
                     n_inliers=n_out, ok=n_out >= min_inliers)
