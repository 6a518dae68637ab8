"""VIO motion-only bundle adjustment: PVR+bias states with IMU/encoder
factors and sliding marginal priors.

TPU-native equivalent of the templated PoseOptimization for VIO/VIEO
(include/Optimizer.h:208-816): vertices {current frame PVR+Bias, last
KF/frame PVR+Bias}, edges {IMU preintegration (EdgeNavStatePVR), bias
random walk (EdgeNavStateBias), optional encoder edge, fixed-landmark
reprojection on the current frame, 15D marginal prior on the last frame}
— followed by explicit Schur marginalization of the last state to produce
the current frame's 15x15 prior Hessian (Optimizer.h:126-206 FillCovInv +
663-813), which the next frame consumes.

Design: the joint state is 30D (two 15D tangents); residuals are whitened
(Cholesky of each factor's information) and stacked, Jacobians come from
forward-mode autodiff through the NavState retraction (exact; the
reference's 700 lines of hand Jacobians exist because C++ lacks jacfwd),
and the dense 30x30 LM runs as a fixed-iteration jit-compilable loop with
Huber IRLS on the reprojection block.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..cameras import models as cm
from ..math.navstate import NavState, tcw_from_navstate
from ..math.preintegration import EncPreint, ImuPreint
from . import imu_factors
from .lm import huber_cost, huber_weight
from .motion_ba import CHI2_MONO, CHI2_STEREO, PoseObs


class VioOptResult(NamedTuple):
    ns: NavState              # optimized current state
    ns_last: NavState         # optimized (or untouched) last state
    inliers: jax.Array        # [N] reprojection inliers
    n_inliers: jax.Array
    prior_info: jax.Array     # [15,15] marginal prior info for the NEXT call
    H_joint: jax.Array        # [30,30] full joint GN Hessian


# Per-iteration tangent-step caps [dp, dv, dphi, dbg, dba] (see the
# trust-region note at the solve site).
_STEP_CAP = (1.0, 2.0, 0.5, 0.05, 0.5)


def _clamp_blocks(dx):
    """Clamp each 3D block of one or more stacked 15D tangents."""
    dtype = dx.dtype
    caps = jnp.asarray(
        [_STEP_CAP[0]] * 3 + [_STEP_CAP[1]] * 3 + [_STEP_CAP[2]] * 3
        + [_STEP_CAP[3]] * 3 + [_STEP_CAP[4]] * 3, dtype)
    n = dx.shape[-1] // 15
    caps = jnp.tile(caps, n)
    return jnp.clip(dx, -caps, caps)


def _reproj_terms(ns: NavState, obs: PoseObs, cam, Rcb, tcb, bf):
    Rcw, tcw = tcw_from_navstate(ns, Rcb, tcb)
    pc = jnp.einsum("ij,nj->ni", Rcw, obs.pw) + tcw
    uv_hat = cm.project(cam, pc)
    z = pc[:, 2]
    depth_ok = z > 1e-3
    inv_z = 1.0 / jnp.where(depth_ok, z, 1.0)
    stereo = obs.ur >= 0
    r_uv = obs.uv - uv_hat
    ur_hat = uv_hat[:, 0] - bf * inv_z
    r_ur = jnp.where(stereo, obs.ur - ur_hat, 0.0)
    r = jnp.concatenate([r_uv, r_ur[:, None]], axis=-1)
    chi2 = jnp.sum(r * r, axis=-1) * obs.inv_sigma2
    delta2 = jnp.where(stereo, CHI2_STEREO, CHI2_MONO).astype(chi2.dtype)
    return r, chi2, delta2, depth_ok


def vio_pose_optimization(
    ns_last: NavState,
    ns_cur0: NavState,
    pre: ImuPreint,
    obs: PoseObs,
    cam: cm.Camera,
    Rcb: jax.Array,
    tcb: jax.Array,
    bf,
    *,
    prior_info: Optional[jax.Array] = None,
    enc_pre: Optional[EncPreint] = None,
    Rbe: Optional[jax.Array] = None,
    tbe: Optional[jax.Array] = None,
    sigma_bg_rw: float = 2e-4,
    sigma_ba_rw: float = 2e-3,
    gravity=imu_factors.GRAVITY,
    rounds: int = 4,
    iters_per_round: int = 8,
    last_fixed: Optional[bool] = None,
) -> VioOptResult:
    """Jointly refine (last, current) NavStates against vision + odometry.

    If `prior_info` is None the last state is held fixed (the reference's
    PoseOptimization with bComputeMarg when no prior exists yet); otherwise
    both states float and the last carries its 15D prior.
    """
    dtype = ns_cur0.p.dtype
    bf = jnp.asarray(bf, dtype)
    if last_fixed is None:
        last_fixed = prior_info is None

    info_imu = imu_factors.imu_info_prv(pre)
    L_imu = jnp.linalg.cholesky(info_imu).swapaxes(-1, -2)   # upper: L^T r
    info_b = imu_factors.bias_rw_info(sigma_bg_rw, sigma_ba_rw, pre.dt,
                                      dtype)
    L_b = jnp.sqrt(jnp.diagonal(info_b))
    if prior_info is not None:
        pi = 0.5 * (prior_info + prior_info.T) \
            + 1e-8 * jnp.eye(15, dtype=dtype)
        L_prior = jnp.linalg.cholesky(pi).swapaxes(-1, -2)
    if enc_pre is not None:
        info_e = jnp.linalg.inv(
            enc_pre.cov + 1e-9 * jnp.eye(6, dtype=dtype))
        L_enc = jnp.linalg.cholesky(
            0.5 * (info_e + info_e.T)).swapaxes(-1, -2)

    ns_prior_ref = ns_last  # linearization point of the prior
    zero30 = jnp.zeros(30, dtype)

    def cost_at(ns_l, ns_c, active):
        parts_cost = jnp.sum(_smooth_of(ns_l, ns_c) ** 2)
        r, chi2, delta2, depth_ok = _reproj_terms(ns_c, obs, cam, Rcb, tcb,
                                                  bf)
        return parts_cost + jnp.sum(
            huber_cost(chi2, delta2) * (active & obs.valid) * depth_ok)

    def _smooth_of(nl, nc):
        parts = [L_imu @ imu_factors.imu_residual_prv(nl, nc, pre, gravity),
                 L_b * imu_factors.bias_rw_residual(nl, nc)]
        if prior_info is not None:
            parts.append(L_prior @ imu_factors.prior_residual(
                nl, ns_prior_ref))
        if enc_pre is not None:
            parts.append(L_enc @ imu_factors.encoder_residual(
                nl, nc, enc_pre, Rbe, tbe))
        return jnp.concatenate(parts)

    # --- LM over (ns_last, ns_cur) with re-retraction each iteration ---
    def lm_rounds(ns_l, ns_c, active):
        def one_iter(carry, _):
            ns_l, ns_c, lam, cost = carry
            # Rebind closures to current linearization point.
            nonlocal_refs = (ns_l, ns_c)

            def smooth_r(dx):
                dxl, dxc = dx[:15], dx[15:]
                nl = nonlocal_refs[0] if last_fixed \
                    else nonlocal_refs[0].inc_pvr_bias(dxl)
                nc = nonlocal_refs[1].inc_pvr_bias(dxc)
                return _smooth_of(nl, nc)

            def reproj_r(dx):
                nc = nonlocal_refs[1].inc_pvr_bias(dx[15:])
                r, chi2, delta2, depth_ok = _reproj_terms(
                    nc, obs, cam, Rcb, tcb, bf)
                return r, chi2, delta2, depth_ok

            r_s = smooth_r(zero30)
            J_s = jax.jacfwd(smooth_r)(zero30)
            r_p, chi2, delta2, depth_ok = reproj_r(zero30)
            w = (huber_weight(chi2, delta2) * obs.inv_sigma2
                 * (active & obs.valid) * depth_ok)
            J_p = jax.jacfwd(lambda dx: reproj_r(dx)[0].reshape(-1))(
                zero30).reshape(-1, 3, 30)
            H = J_s.T @ J_s + jnp.einsum("nri,n,nrj->ij", J_p, w, J_p)
            b = -(J_s.T @ r_s) - jnp.einsum("nri,n,nr->i", J_p, w, r_p)
            if last_fixed:
                mask = jnp.concatenate(
                    [jnp.zeros(15, dtype), jnp.ones(15, dtype)])
                H = H * mask[:, None] * mask[None, :] \
                    + jnp.diag(1.0 - mask)
                b = b * mask
            A = H + lam * jnp.eye(30, dtype=dtype)
            dx = jnp.linalg.solve(A, b)
            # Per-block trust region: the rotation-via-bias correction
            # Exp(Jg_R dbg) WRAPS at 2pi, so a near-unconstrained joint
            # bias direction lets LM take a |dbg|~2pi*k/|Jg| step that
            # lowers cost by wrapping (observed: bg jumped to 220 rad/s
            # = 14 full turns through Jg~ -0.4).  Clamping each tangent
            # block per iteration removes the wrapped minima without
            # affecting legitimate convergence (32 iterations x caps
            # covers any physical correction).
            dx = _clamp_blocks(dx)
            nl_new = ns_l if last_fixed else ns_l.inc_pvr_bias(dx[:15])
            nc_new = ns_c.inc_pvr_bias(dx[15:])
            # dtype-stable under jax_enable_x64 (scan carry).
            nl_new = jax.tree.map(
                lambda a, ref: a.astype(ref.dtype), nl_new, ns_l)
            nc_new = jax.tree.map(
                lambda a, ref: a.astype(ref.dtype), nc_new, ns_c)
            new_cost = cost_at(nl_new, nc_new, active).astype(dtype)
            accept = (new_cost < cost) & jnp.isfinite(new_cost)
            ns_l = jax.tree.map(
                lambda a, b_: jnp.where(accept, a, b_), nl_new, ns_l)
            ns_c = jax.tree.map(
                lambda a, b_: jnp.where(accept, a, b_), nc_new, ns_c)
            lam = jnp.where(accept, lam * 0.5, lam * 4.0).astype(dtype)
            cost = jnp.where(accept, new_cost, cost)
            return (ns_l, ns_c, lam, cost), None

        lam0 = jnp.asarray(1e-3, dtype)
        c0 = cost_at(ns_l, ns_c, active).astype(dtype)
        (ns_l, ns_c, _, _), _ = jax.lax.scan(
            one_iter, (ns_l, ns_c, lam0, c0), None, length=iters_per_round)
        return ns_l, ns_c

    ns_l, ns_c = ns_last, ns_cur0
    active = jnp.ones_like(obs.valid)
    for _ in range(rounds):
        ns_l, ns_c = lm_rounds(ns_l, ns_c, active)
        _, chi2, delta2, depth_ok = _reproj_terms(ns_c, obs, cam, Rcb, tcb,
                                                  bf)
        active = (chi2 <= delta2) & depth_ok

    # --- final joint Hessian + marginalization of the last state ---
    refs = (ns_l, ns_c)

    def smooth_final(dx):
        dxl, dxc = dx[:15], dx[15:]
        nl = refs[0].inc_pvr_bias(dxl)   # last floats for marginalization
        nc = refs[1].inc_pvr_bias(dxc)
        return _smooth_of(nl, nc)

    def reproj_final(dx):
        nc = refs[1].inc_pvr_bias(dx[15:])
        r, chi2, delta2, depth_ok = _reproj_terms(nc, obs, cam, Rcb, tcb, bf)
        return r, chi2, delta2, depth_ok

    J_s = jax.jacfwd(smooth_final)(zero30)
    r_p, chi2, delta2, depth_ok = reproj_final(zero30)
    w = (huber_weight(chi2, delta2) * obs.inv_sigma2
         * (active & obs.valid) * depth_ok)
    J_p = jax.jacfwd(lambda dx: reproj_final(dx)[0].reshape(-1))(
        zero30).reshape(-1, 3, 30)
    H = J_s.T @ J_s + jnp.einsum("nri,n,nrj->ij", J_p, w, J_p)
    # Schur: prior info on current = H_cc - H_cl H_ll^-1 H_lc
    H_ll = H[:15, :15] + 1e-6 * jnp.eye(15, dtype=dtype)
    H_cl = H[15:, :15]
    prior_next = H[15:, 15:] - H_cl @ jnp.linalg.solve(H_ll, H_cl.T)
    prior_next = 0.5 * (prior_next + prior_next.T)

    inliers = active & obs.valid
    return VioOptResult(
        ns=ns_c, ns_last=ns_l, inliers=inliers,
        n_inliers=jnp.sum(inliers.astype(jnp.int32)),
        prior_info=prior_next, H_joint=H,
    )
