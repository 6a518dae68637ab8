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

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..cameras import models as cm
from ..math import lie
from .lm import huber_cost, huber_weight, lm_solve


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


class OptimizeSim3Result(NamedTuple):
    R: jax.Array          # refined S_ck rotation
    t: jax.Array
    s: jax.Array
    inliers: jax.Array    # [N] bool (both directions pass chi2)
    n_inliers: jax.Array


CHI2_SIM3 = 10.0   # reference th2 = 10 (Optimizer.cc:2760 deltaHuber^2)


@functools.partial(jax.jit,
                   static_argnames=("fix_scale", "rounds", "iters"))
def optimize_sim3(
    R0: jax.Array, t0: jax.Array, s0: jax.Array,
    p_k: jax.Array, p_c: jax.Array,
    uv_k: jax.Array, uv_c: jax.Array,
    inv_sigma2_k: jax.Array, inv_sigma2_c: jax.Array,
    valid: jax.Array,
    cam: cm.Camera,
    *,
    fix_scale: bool = True,
    rounds: int = 2,
    iters: int = 8,
) -> OptimizeSim3Result:
    """Reprojection-based Sim3 refinement (Optimizer::OptimizeSim3,
    src/Optimizer.cc:2689-2920): one Sim3 vertex S_ck with two-sided
    projection edges — p_k projected through S_ck against the c-image
    observation, p_c projected through S_ck^-1 against the k-image
    observation — Huber at chi2 = 10, with outlier re-classification
    between rounds (the reference removes chi2>10 edges and re-optimizes).

    Where the reference's g2o types hand-derive the 7D Sim3 Jacobians
    (g2o/types_seven_dof_expmap.cpp), the Jacobians here are autodiff
    through the left-multiplicative retraction S <- Exp(dx) S — one
    vmapped jacfwd over the [N] edge set.

    p_k: [N,3] matched landmark positions in KF k's camera frame.
    p_c: [N,3] the same landmarks' counterparts in KF c's camera frame.
    uv_k/uv_c: [N,2] observed keypoint pixels in each image.
    Returns the refined S_ck and the two-sided inlier set.
    """
    dt = t0.dtype
    D = 6 if fix_scale else 7

    def residuals(x):
        R, t, s = x

        def edge(pk, pc, uk, uc):
            pred_c = cm.project(cam, lie.sim3_apply(R, t, s, pk))
            Ri, ti, si = lie.sim3_inverse(R, t, s)
            pred_k = cm.project(cam, lie.sim3_apply(Ri, ti, si, pc))
            return jnp.concatenate([uc - pred_c, uk - pred_k])

        return jax.vmap(edge)(p_k, p_c, uv_k, uv_c)     # [N, 4]

    def chi2_of(x):
        r = residuals(x)
        c_c = jnp.sum(r[:, :2] ** 2, axis=-1) * inv_sigma2_c
        c_k = jnp.sum(r[:, 2:] ** 2, axis=-1) * inv_sigma2_k
        return c_c, c_k

    def retract(x, dx):
        # NO normalize_rotation here: this function is jacfwd'd at dx=0
        # and the SVD projection is non-differentiable at orthogonal R
        # (singular values all 1) — it silently corrupts the Jacobian
        # and stalls LM ~0.4 deg from the optimum.  Rotations are
        # re-projected onto SO(3) between rounds instead.
        R, t, s = x
        if fix_scale:
            dx = jnp.concatenate([dx, jnp.zeros(1, dx.dtype)])
        dR, dtr, ds = lie.sim3_exp(dx)
        return lie.sim3_compose(dR, dtr, ds, R, t, s)

    def make_fns(active):
        w_act = (active & valid).astype(dt)

        def system_fn(x):
            def r_of_dx(dx):
                return residuals(retract(x, dx))

            r0 = residuals(x)
            J = jax.jacfwd(r_of_dx)(jnp.zeros(D, dt))   # [N, 4, D]
            c_c, c_k = chi2_of(x)
            w_c = huber_weight(c_c, CHI2_SIM3) * inv_sigma2_c * w_act
            w_k = huber_weight(c_k, CHI2_SIM3) * inv_sigma2_k * w_act
            w = jnp.concatenate(
                [jnp.repeat(w_c[:, None], 2, 1),
                 jnp.repeat(w_k[:, None], 2, 1)], axis=1)      # [N, 4]
            H = jnp.einsum("nri,nr,nrj->ij", J, w, J)
            b = -jnp.einsum("nri,nr,nr->i", J, w, r0)
            return H, b, cost_fn(x)

        def cost_fn(x):
            c_c, c_k = chi2_of(x)
            rho = huber_cost(c_c, CHI2_SIM3) + huber_cost(c_k, CHI2_SIM3)
            return jnp.sum(rho * w_act)

        return system_fn, cost_fn

    x = (R0.astype(dt), t0, jnp.asarray(s0, dt))
    active = jnp.ones_like(valid)
    for _ in range(rounds):
        system_fn, cost_fn = make_fns(active)
        x, _, _ = lm_solve(system_fn, cost_fn, retract, x, iters=iters)
        x = (lie.normalize_rotation(x[0]), x[1], x[2])
        c_c, c_k = chi2_of(x)
        active = (c_c <= CHI2_SIM3) & (c_k <= CHI2_SIM3)

    inliers = active & valid
    return OptimizeSim3Result(
        R=x[0], t=x[1], s=x[2], inliers=inliers,
        n_inliers=jnp.sum(inliers.astype(jnp.int32)))
