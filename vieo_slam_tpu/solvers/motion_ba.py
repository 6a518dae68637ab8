"""Motion-only bundle adjustment (vision): one pose vs. fixed landmarks.

TPU-native equivalent of Optimizer::PoseOptimization (vision variant,
src/Optimizer.cc:1611-1875): a single SE3 vertex with unary mono/stereo
reprojection edges to fixed map points, Huber kernels at the chi-square
95% quantiles (delta^2 = 5.991 mono / 7.815 stereo), run as 4 rounds of
10 LM iterations with outlier re-classification between rounds — except
here the whole thing is one jitted program over fixed-capacity padded
observation arrays, and "rounds" re-evaluate the inlier mask from scratch
each time (matching the reference's re-inclusion semantics,
Optimizer.cc:1832-1856).

Pose parametrization: Tcw with left-multiplicative update
Tcw <- Exp(dxi) Tcw (same as g2o SE3Quat vertices), so
d(pc)/d(dxi) = [ I | -hat(pc) ].
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..cameras import models as cm
from ..math import lie
from .lm import huber_cost, huber_weight, lm_solve, lm_solve_parallel

CHI2_MONO = 5.991
CHI2_STEREO = 7.815


class PoseObs(NamedTuple):
    """Fixed-capacity observation set for one frame.

    pw:        [N, 3] landmark positions (world).
    uv:        [N, 2] measured pixel.
    ur:        [N]    right-image u for stereo obs (<0 => mono).
    inv_sigma2:[N]    information scale (1/sigma^2 of the octave).
    valid:     [N]    bool.
    """

    pw: jax.Array
    uv: jax.Array
    ur: jax.Array
    inv_sigma2: jax.Array
    valid: jax.Array


def _residuals(Rcw, tcw, obs: PoseObs, cam: cm.Camera, bf):
    """Returns (r [N, 3], J [N, 3, 6], stereo_mask [N], depth_ok [N]).

    Third residual row is the stereo u_r channel (zeroed for mono).
    """
    pc = jnp.einsum("ij,nj->ni", Rcw, obs.pw) + tcw
    uv_hat, Jproj = cm.project_jacobian(cam, pc)          # [N,2], [N,2,3]
    z = pc[:, 2]
    depth_ok = z > 1e-3
    stereo = obs.ur >= 0

    r_uv = obs.uv - uv_hat                                 # [N, 2]
    inv_z = 1.0 / jnp.where(depth_ok, z, 1.0)
    ur_hat = uv_hat[:, 0] - bf * inv_z
    r_ur = jnp.where(stereo, obs.ur - ur_hat, 0.0)         # [N]

    # d(pc)/d(dxi) for Tcw <- Exp(dxi) Tcw: [I | -hat(pc)]
    N = pc.shape[0]
    Jpc = jnp.concatenate(
        [jnp.broadcast_to(jnp.eye(3, dtype=pc.dtype), (N, 3, 3)),
         -lie.hat(pc)], axis=-1)                           # [N, 3, 6]
    Juv_dxi = Jproj @ Jpc                                  # [N, 2, 6]
    J_uv = -Juv_dxi
    # u_r row: d(ur_hat)/d(dxi) = d(u)/d(dxi) + bf/z^2 * d(z)/d(dxi)
    J_ur = -(Juv_dxi[:, 0, :] + bf * (inv_z ** 2)[:, None] * Jpc[:, 2, :])
    J_ur = jnp.where(stereo[:, None], J_ur, 0.0)           # [N, 6]

    r = jnp.concatenate([r_uv, r_ur[:, None]], axis=-1)    # [N, 3]
    J = jnp.concatenate([J_uv, J_ur[:, None, :]], axis=-2)  # [N, 3, 6]
    return r, J, stereo, depth_ok


def _chi2(r, inv_sigma2, stereo):
    """Per-obs squared Mahalanobis error (2D mono / 3D stereo)."""
    sq = jnp.sum(r * r, axis=-1)
    return sq * inv_sigma2


def _robust_cost(chi2, delta2, w_active, depth_ok):
    """Huber total with a saturation penalty for behind-camera points
    (zero-weighting them lets degenerate poses score 0 and win)."""
    penalty = huber_cost(jnp.asarray(1e4, chi2.dtype), delta2)
    return jnp.sum(huber_cost(chi2, delta2) * w_active * depth_ok) \
        + jnp.sum(penalty * w_active * (~depth_ok))


class PoseOptResult(NamedTuple):
    Rcw: jax.Array
    tcw: jax.Array
    inliers: jax.Array    # [N] bool
    n_inliers: jax.Array
    H: jax.Array          # [6, 6] Gauss-Newton Hessian at the solution


def pose_optimization(
    Rcw0: jax.Array,
    tcw0: jax.Array,
    obs: PoseObs,
    cam: cm.Camera,
    bf: jax.Array | float = 0.0,
    *,
    rounds: int = 4,
    iters_per_round: int = 10,
    mode: str = "lm",
) -> PoseOptResult:
    """Optimize one camera pose against fixed landmarks.

    Mirrors the reference's 4x10 schedule with chi2 gating at 5.991/7.815
    between rounds (Optimizer.cc:1777-1860). Fully jit-compilable.
    """
    bf = jnp.asarray(bf, tcw0.dtype)

    def chi2_of(pose, active):
        R, t = pose
        r, _, stereo, depth_ok = _residuals(R, t, obs, cam, bf)
        chi2 = _chi2(r, obs.inv_sigma2, stereo)
        delta2 = jnp.where(stereo, CHI2_STEREO, CHI2_MONO).astype(chi2.dtype)
        return chi2, delta2, depth_ok

    def make_fns(active):
        w_active = (active & obs.valid).astype(tcw0.dtype)

        def system_fn(pose):
            R, t = pose
            r, J, stereo, depth_ok = _residuals(R, t, obs, cam, bf)
            chi2 = _chi2(r, obs.inv_sigma2, stereo)
            delta2 = jnp.where(stereo, CHI2_STEREO,
                               CHI2_MONO).astype(chi2.dtype)
            w = (huber_weight(chi2, delta2) * obs.inv_sigma2
                 * w_active * depth_ok)
            H = jnp.einsum("nri,n,nrj->ij", J, w, J)
            b = -jnp.einsum("nri,n,nr->i", J, w, r)
            cost = _robust_cost(chi2, delta2, w_active, depth_ok)
            return H, b, cost

        def cost_fn(pose):
            chi2, delta2, depth_ok = chi2_of(pose, active)
            return _robust_cost(chi2, delta2, w_active, depth_ok)

        return system_fn, cost_fn

    def retract(pose, dx):
        R, t = pose
        dR, dt = lie.se3_exp(dx)
        return dR @ R, dR @ t + dt

    pose = (Rcw0, tcw0)
    active = jnp.ones_like(obs.valid)
    H = jnp.zeros((6, 6), tcw0.dtype)
    for _ in range(rounds):
        system_fn, cost_fn = make_fns(active)
        if mode == "gn":
            # Latency mode: fixed-damping Gauss-Newton, no accept/reject
            # (one residual evaluation per step, half the serial chain on
            # TPU). Tracking converges in 2-3 steps from the motion-model
            # prediction; the chi2 rounds still provide robustness.
            def gn_step(p, _):
                Hs, b, _ = system_fn(p)
                A = Hs + 1e-4 * jnp.diagonal(Hs).max() \
                    * jnp.eye(6, dtype=Hs.dtype)
                dx = jnp.linalg.solve(A, b)
                return retract(p, dx), None

            pose, _ = jax.lax.scan(gn_step, pose, None,
                                   length=iters_per_round)
            H, _, _ = system_fn(pose)
        elif mode == "plm":
            # Parallel-lambda LM: same serial depth per iteration as LM
            # but no rejected-step waste — supports shorter schedules.
            pose, _, H = lm_solve_parallel(system_fn, cost_fn, retract,
                                           pose, iters=iters_per_round)
        else:
            pose, _, H = lm_solve(system_fn, cost_fn, retract, pose,
                                  iters=iters_per_round)
        chi2, delta2, depth_ok = chi2_of(pose, active)
        active = (chi2 <= delta2) & depth_ok

    inliers = active & obs.valid
    return PoseOptResult(
        Rcw=pose[0], tcw=pose[1], inliers=inliers,
        n_inliers=jnp.sum(inliers.astype(jnp.int32)), H=H,
    )


def pose_optimization_with_prior(
    Rcw0: jax.Array,
    tcw0: jax.Array,
    obs: PoseObs,
    cam: cm.Camera,
    bf: jax.Array | float,
    R_prior: jax.Array,
    t_prior: jax.Array,
    prior_info: jax.Array,
    *,
    rounds: int = 2,
    iters_per_round: int = 4,
    mode: str = "lm",
) -> PoseOptResult:
    """Vision motion BA plus a 6D SE3 prior on the camera pose.

    The encoder-only (VEO) motion solve: with the last pose held fixed,
    the preintegrated wheel-odometry delta (EdgeEncNavState,
    src/Odom/g2otypes.h:590, used by PoseOptimization when
    mode==ENCODER) predicts T_prior for the current camera with
    information `prior_info` [6, 6] in the left-multiplicative tangent of
    Tcw, ordered [rho, phi].  The prior residual
    r = log(Tcw ∘ T_prior⁻¹) enters every LM system with Jacobian ≈ I
    (exact to first order), so the wheel odometry pulls the solve exactly
    the way the reference's encoder edge does — and carries it entirely
    through visual degradation (few inliers → vision terms underdetermine
    the pose; the prior keeps it bounded).
    """
    bf = jnp.asarray(bf, tcw0.dtype)

    def prior_terms(pose):
        R, t = pose
        Rd = R @ R_prior.T
        td = t - Rd @ t_prior
        r6 = lie.se3_log(Rd, td)                      # [6] = [rho, phi]
        cost = r6 @ prior_info @ r6
        return r6, cost

    def chi2_of(pose, active):
        R, t = pose
        r, _, stereo, depth_ok = _residuals(R, t, obs, cam, bf)
        chi2 = _chi2(r, obs.inv_sigma2, stereo)
        delta2 = jnp.where(stereo, CHI2_STEREO,
                           CHI2_MONO).astype(chi2.dtype)
        return chi2, delta2, depth_ok

    def make_fns(active):
        w_active = (active & obs.valid).astype(tcw0.dtype)

        def system_fn(pose):
            R, t = pose
            r, J, stereo, depth_ok = _residuals(R, t, obs, cam, bf)
            chi2 = _chi2(r, obs.inv_sigma2, stereo)
            delta2 = jnp.where(stereo, CHI2_STEREO,
                               CHI2_MONO).astype(chi2.dtype)
            w = (huber_weight(chi2, delta2) * obs.inv_sigma2
                 * w_active * depth_ok)
            H = jnp.einsum("nri,n,nrj->ij", J, w, J)
            b = -jnp.einsum("nri,n,nr->i", J, w, r)
            r6, pcost = prior_terms(pose)
            H = H + prior_info
            b = b - prior_info @ r6
            cost = _robust_cost(chi2, delta2, w_active, depth_ok) + pcost
            return H, b, cost

        def cost_fn(pose):
            chi2, delta2, depth_ok = chi2_of(pose, active)
            _, pcost = prior_terms(pose)
            return _robust_cost(chi2, delta2, w_active, depth_ok) + pcost

        return system_fn, cost_fn

    def retract(pose, dx):
        R, t = pose
        dR, dt = lie.se3_exp(dx)
        return dR @ R, dR @ t + dt

    pose = (Rcw0, tcw0)
    active = jnp.ones_like(obs.valid)
    H = jnp.zeros((6, 6), tcw0.dtype)
    for _ in range(rounds):
        system_fn, cost_fn = make_fns(active)
        if mode == "plm":
            pose, _, H = lm_solve_parallel(system_fn, cost_fn, retract,
                                           pose, iters=iters_per_round)
        else:
            pose, _, H = lm_solve(system_fn, cost_fn, retract, pose,
                                  iters=iters_per_round)
        chi2, delta2, depth_ok = chi2_of(pose, active)
        active = (chi2 <= delta2) & depth_ok

    inliers = active & obs.valid
    return PoseOptResult(
        Rcw=pose[0], tcw=pose[1], inliers=inliers,
        n_inliers=jnp.sum(inliers.astype(jnp.int32)), H=H,
    )
