"""Monocular two-view initialization: batched essential-matrix RANSAC.

Equivalent of src/Initializer.cc (parallel H/F-model scoring +
triangulation checks, Initializer.h:24-43). Design difference: instead of
the H-vs-F model race, a normalized 8-point essential-matrix RANSAC runs
ALL hypotheses as one batched SVD ([H, 8, 9] -> [H] Sampson scores), the
best model is decomposed into the 4 (R, t) candidates, and cheirality +
parallax voting over every match picks the transform — fixed shapes end
to end. (Pure-rotation/planar degenerate scenes score few cheirality
inliers and are rejected, which matches the reference's parallax gates.)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..cameras import models as cm
from ..math import lie


class MonoInitResult(NamedTuple):
    ok: jax.Array          # bool
    R21: jax.Array         # [3,3] second-from-first rotation
    t21: jax.Array         # [3] unit-norm translation
    pw: jax.Array          # [N,3] triangulated points (frame-1 coords)
    good: jax.Array        # [N] triangulation validity
    n_good: jax.Array


def _essential_from_8(rays1, rays2):
    """8-point linear solve, batched: [..., 8, 3] x2 -> [..., 3, 3]."""
    x1, y1 = rays1[..., 0], rays1[..., 1]
    x2, y2 = rays2[..., 0], rays2[..., 1]
    ones = jnp.ones_like(x1)
    A = jnp.stack([x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2,
                   x1, y1, ones], axis=-1)            # [..., 8, 9]
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    E = Vt[..., -1, :].reshape(*A.shape[:-2], 3, 3)
    # Project to the essential manifold: singular values (1, 1, 0).
    U, _, Vt2 = jnp.linalg.svd(E)
    S = jnp.zeros_like(E).at[..., 0, 0].set(1.0).at[..., 1, 1].set(1.0)
    return U @ S @ Vt2


def _sampson(E, rays1, rays2):
    """Squared Sampson distance on the normalized plane.
    E [..., 3, 3], rays [N, 3] -> [..., N]."""
    Ex1 = jnp.einsum("...ij,nj->...ni", E, rays1)
    Etx2 = jnp.einsum("...ji,nj->...ni", E, rays2)
    x2tEx1 = jnp.einsum("ni,...ni->...n", rays2, Ex1)
    denom = (Ex1[..., 0] ** 2 + Ex1[..., 1] ** 2
             + Etx2[..., 0] ** 2 + Etx2[..., 1] ** 2)
    return x2tEx1 ** 2 / jnp.maximum(denom, 1e-12)


def monocular_init(
    uv1: jax.Array, uv2: jax.Array, valid: jax.Array,
    cam: cm.Camera, key: jax.Array,
    *,
    n_hyp: int = 256,
    sampson_px: float = 1.5,
    min_inliers: int = 60,
    min_parallax_cos: float = 0.99995,
) -> MonoInitResult:
    """Two-view relative pose + structure from matched pixels.

    uv1/uv2: [N, 2] matched keypoints of the two frames; valid: [N].
    Scale convention: |t21| = 1 (caller rescales by median depth).
    """
    N = uv1.shape[0]
    rays1 = cm.unproject(cam, uv1)
    rays2 = cm.unproject(cam, uv2)
    f = 0.5 * (cam.fx + cam.fy)
    thresh = (sampson_px / f) ** 2

    logits = jnp.where(valid, 0.0, -1e9)
    idx = jax.random.categorical(key, logits, shape=(n_hyp, 8))
    E = _essential_from_8(rays1[idx], rays2[idx])        # [H, 3, 3]
    d = _sampson(E, rays1, rays2)                        # [H, N]
    inl = (d < thresh) & valid[None, :]
    counts = jnp.sum(inl, axis=-1)
    best = jnp.argmax(counts)
    E_b = E[best]
    inliers = inl[best]

    # Decompose E into the 4 candidates (U W V^T / U W^T V^T, +-u3).
    U, _, Vt = jnp.linalg.svd(E_b)
    # keep proper rotations
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = jnp.asarray([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]],
                    E_b.dtype)
    R_a = U @ W @ Vt
    R_b = U @ W.T @ Vt
    t_u = U[:, 2]
    cands_R = jnp.stack([R_a, R_a, R_b, R_b])
    cands_t = jnp.stack([t_u, -t_u, t_u, -t_u])

    eye = jnp.eye(3, dtype=E_b.dtype)
    zero = jnp.zeros(3, E_b.dtype)

    def score(Rt):
        R21, t21 = Rt
        rays = jnp.stack([rays1, rays2], axis=1)             # [N, 2, 3]
        Rcw = jnp.broadcast_to(jnp.stack([eye, R21]), (N, 2, 3, 3))
        tcw = jnp.broadcast_to(jnp.stack([zero, t21]), (N, 2, 3))
        pw = cm.triangulate_dlt(rays, Rcw, tcw)
        z1 = pw[:, 2]
        p2 = jnp.einsum("ij,nj->ni", R21, pw) + t21
        z2 = p2[:, 2]
        # parallax between rays
        c2 = -R21.T @ t21
        d1 = pw
        d2 = pw - c2
        cosp = jnp.sum(d1 * d2, axis=-1) / jnp.maximum(
            jnp.linalg.norm(d1, axis=-1) * jnp.linalg.norm(d2, axis=-1),
            1e-12)
        # Reprojection consistency in both views (Initializer::CheckRT):
        # kills the near-zero-depth garbage a degenerate (pure-rotation)
        # model produces through the ridge-regularized DLT.
        uvh1 = cm.project(cam, pw)
        uvh2 = cm.project(cam, p2)
        e1 = jnp.sum((uvh1 - uv1) ** 2, axis=-1)
        e2 = jnp.sum((uvh2 - uv2) ** 2, axis=-1)
        reproj_ok = (e1 < 4.0 * sampson_px ** 2) \
            & (e2 < 4.0 * sampson_px ** 2)
        good = inliers & (z1 > 0) & (z2 > 0) \
            & (cosp < min_parallax_cos) & reproj_ok
        return jnp.sum(good), pw, good

    scores, pws, goods = jax.vmap(score)((cands_R, cands_t))
    b = jnp.argmax(scores)
    n_good = scores[b]
    ok = n_good >= min_inliers
    return MonoInitResult(
        ok=ok, R21=cands_R[b], t21=cands_t[b],
        pw=pws[b], good=goods[b], n_good=n_good,
    )
