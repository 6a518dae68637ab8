"""Monocular two-view initialization: batched E + H model race.

Equivalent of src/Initializer.cc (parallel H/F-model scoring +
triangulation checks, Initializer.h:24-43). Both models run as single
batched SVDs over all RANSAC hypotheses at once ([Hyp, 8, 9] systems),
are scored with robust truncated costs, and race by the reference's
RH = S_H / (S_H + S_F) ratio (Initializer.cc: RH > 0.40 selects the
homography).  The winner's motion candidates (4 from the essential
decomposition, 8 from the Faugeras homography decomposition) go through
the same cheirality + parallax + reprojection voting.  The H path makes
planar scenes — where E is degenerate — initializable.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..cameras import models as cm


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


def _homography_from_4(rays1, rays2):
    """4-point DLT homography on the normalized plane, batched:
    [..., 4, 3] x2 -> [..., 3, 3] with H x1 ~ x2."""
    x1, y1 = rays1[..., 0], rays1[..., 1]
    x2, y2 = rays2[..., 0], rays2[..., 1]
    o = jnp.ones_like(x1)
    z = jnp.zeros_like(x1)
    r1 = jnp.stack([x1, y1, o, z, z, z, -x2 * x1, -x2 * y1, -x2], -1)
    r2 = jnp.stack([z, z, z, x1, y1, o, -y2 * x1, -y2 * y1, -y2], -1)
    A = jnp.concatenate([r1, r2], axis=-2)               # [..., 8, 9]
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    return Vt[..., -1, :].reshape(*A.shape[:-2], 3, 3)


def _h_transfer(Hm, rays1, rays2):
    """Symmetric squared transfer error of H on the normalized plane.
    Hm [..., 3, 3], rays [N, 3] -> [..., N]."""
    Hinv = jnp.linalg.inv(Hm)

    def fwd(M, a, b):
        pb = jnp.einsum("...ij,nj->...ni", M, a)
        pb = pb[..., :2] / jnp.where(
            jnp.abs(pb[..., 2:]) > 1e-12, pb[..., 2:], 1e-12)
        return jnp.sum((pb - b[..., :2]) ** 2, axis=-1)

    return fwd(Hm, rays1, rays2) + fwd(Hinv, rays2, rays1)


def _decompose_homography(Hm):
    """Faugeras SVD decomposition of a normalized-plane homography into
    8 (R, t) motion candidates (Initializer::ReconstructH semantics,
    src/Initializer.cc; t is scaled by the plane distance — returned
    unit-normalized like the E path)."""
    U, s, Vt = jnp.linalg.svd(Hm)
    d1, d2, d3 = s[0], s[1], s[2]
    sdet = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    V = Vt.T
    eps = 1e-12
    x1 = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2)
                              / jnp.maximum(d1 * d1 - d3 * d3, eps), 0.0))
    x3 = jnp.sqrt(jnp.maximum((d2 * d2 - d3 * d3)
                              / jnp.maximum(d1 * d1 - d3 * d3, eps), 0.0))
    e1 = jnp.asarray([1.0, -1.0, 1.0, -1.0], Hm.dtype)
    e3 = jnp.asarray([1.0, 1.0, -1.0, -1.0], Hm.dtype)

    # case d' = +d2
    st = jnp.sqrt(jnp.maximum(
        (d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)) \
        / jnp.maximum((d1 + d3) * d2, eps)
    ct = (d2 * d2 + d1 * d3) / jnp.maximum((d1 + d3) * d2, eps)

    def build_pos(i):
        stheta = e1[i] * e3[i] * st
        Rp = jnp.asarray(
            [[ct, 0.0, -stheta], [0.0, 1.0, 0.0], [stheta, 0.0, ct]],
            Hm.dtype)
        tp = (d1 - d3) * jnp.asarray(
            [e1[i] * x1, 0.0, -e3[i] * x3], Hm.dtype)
        R = sdet * U @ Rp @ Vt
        t = U @ tp
        return R, t

    # case d' = -d2
    sp = jnp.sqrt(jnp.maximum(
        (d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)) \
        / jnp.maximum((d1 - d3) * d2, eps)
    cp = (d1 * d3 - d2 * d2) / jnp.maximum((d1 - d3) * d2, eps)

    def build_neg(i):
        sphi = e1[i] * e3[i] * sp
        Rp = jnp.asarray(
            [[cp, 0.0, sphi], [0.0, -1.0, 0.0], [sphi, 0.0, -cp]],
            Hm.dtype)
        tp = (d1 + d3) * jnp.asarray(
            [e1[i] * x1, 0.0, e3[i] * x3], Hm.dtype)
        R = sdet * U @ Rp @ Vt
        t = U @ tp
        return R, t

    Rs, ts = [], []
    for i in range(4):
        R, t = build_pos(i)
        Rs.append(R), ts.append(t)
    for i in range(4):
        R, t = build_neg(i)
        Rs.append(R), ts.append(t)
    R8 = jnp.stack(Rs)
    t8 = jnp.stack(ts)
    t8 = t8 / jnp.maximum(jnp.linalg.norm(t8, axis=-1, keepdims=True),
                          eps)
    return R8, t8


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

    # --- essential model (8-point) ---------------------------------
    E = _essential_from_8(rays1[idx], rays2[idx])        # [H, 3, 3]
    d = _sampson(E, rays1, rays2)                        # [H, N]
    inl = (d < thresh) & valid[None, :]
    # robust truncated score (Initializer::CheckFundamental analogue)
    sc = jnp.sum(jnp.where(inl, 1.0 - d / thresh, 0.0), axis=-1)
    best = jnp.argmax(sc)
    E_b = E[best]
    inl_e = inl[best]
    score_e = sc[best]

    # --- homography model (4-point) ---------------------------------
    Hm = _homography_from_4(rays1[idx[:, :4]], rays2[idx[:, :4]])
    dh = _h_transfer(Hm, rays1, rays2)
    th_h = 2.0 * thresh                # symmetric two-view transfer sum
    inl_h_all = (dh < th_h) & valid[None, :]
    sc_h = jnp.sum(jnp.where(inl_h_all, 1.0 - dh / th_h, 0.0), axis=-1)
    best_h = jnp.argmax(sc_h)
    H_b = Hm[best_h]
    inl_h = inl_h_all[best_h]
    score_h = sc_h[best_h]

    # --- model race (Initializer.cc: RH = SH/(SH+SF), > 0.40 -> H) ---
    use_h = score_h / jnp.maximum(score_h + score_e, 1e-9) > 0.45

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
    cands_R_e = jnp.stack([R_a, R_a, R_b, R_b, R_a, R_a, R_b, R_b])
    cands_t_e = jnp.stack([t_u, -t_u, t_u, -t_u,
                           t_u, -t_u, t_u, -t_u])

    # Faugeras 8-candidate decomposition of H.
    cands_R_h, cands_t_h = _decompose_homography(H_b)

    cands_R = jnp.where(use_h, cands_R_h, cands_R_e)
    cands_t = jnp.where(use_h, cands_t_h, cands_t_e)
    inliers = jnp.where(use_h, inl_h, inl_e)

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
