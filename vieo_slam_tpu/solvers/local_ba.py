"""Windowed bundle adjustment with dense landmark Schur complement.

TPU-native replacement for Optimizer::LocalBundleAdjustment
(src/Optimizer.cc:1876-2308) and — with all keyframes in the window — for
GlobalBundleAdjustment (Optimizer.cc:1346-1610).  Where the reference hands
a general sparse graph to g2o's BlockSolverX + Eigen sparse Cholesky, this
exploits the BA structure directly, which is the TPU-friendly shape
(SURVEY.md §2.3 replacement plan):

  camera system  S = Hpp - W V^-1 W^T   — dense [6F, 6F], F = free poses
  landmark block V                      — [M, 3, 3] block diagonal
  coupling       W                      — grouped by landmark, [M, O, 6, 3]

Observations are stored grouped-by-landmark in fixed-capacity [M, O]
tensors: every per-landmark reduction is a masked `einsum`, the pose-pair
Schur fill is one [M, O, O, 6, 6] batched product scatter-added with
`segment_sum`, and the reduced system is solved with dense Cholesky on the
MXU.  A few hundred free poses (EuRoC-scale global BA) is a <=3k x 3k dense
solve — microseconds-scale on TPU, with none of g2o's pointer-chasing.

Robustness follows the reference: Huber kernels at chi2 quantiles, two
optimization stages with outlier re-classification in between
(Optimizer.cc:2157-2215 LBA: 5 iters, reclassify, 10 iters).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..cameras import models as cm
from ..math import lie
from .lm import huber_cost, huber_weight
from .motion_ba import CHI2_MONO, CHI2_STEREO


# Reduction strategy for the by-keyframe sums in `_ba_iteration`:
# "auto" picks one-hot MXU contractions on TPU (scatter serializes there)
# and segment_sum elsewhere; "on"/"off" force a path (tests use this to
# check the two are equivalent on CPU). Trace-time constant — flipping it
# after a solve has been jitted has no effect on the cached program.
# Measured on v5e (scripts/ab_local_ba_tpu.py, 2026-08-20), ms/15-iter
# solve one-hot vs scatter: K=16/M=4k 78 vs 364 (4.7x), K=48/M=8k 167 vs
# 750 (4.5x), K=128/M=16k 368 vs 1528 (4.2x) — one-hot wins at every
# window and GBA size, so "auto" stays by-backend with no K threshold.
ONEHOT_MODE = "auto"


class BAProblem(NamedTuple):
    """Fixed-capacity BA problem, observations grouped by landmark.

    Rcw, tcw: [K, 3, 3], [K, 3] keyframe poses (world->cam).
    fixed:    [K] bool — poses kept constant (covisible ring / first KF).
    pw:       [M, 3] landmark positions.
    lm_valid: [M] bool.
    obs_kf:   [M, O] int32 keyframe index of each observation (-1 = pad).
    obs_uv:   [M, O, 2] measured pixels.
    obs_ur:   [M, O] right-u for stereo (<0 = mono).
    obs_inv_sigma2: [M, O].
    obs_valid:[M, O] bool.
    """

    Rcw: jax.Array
    tcw: jax.Array
    fixed: jax.Array
    pw: jax.Array
    lm_valid: jax.Array
    obs_kf: jax.Array
    obs_uv: jax.Array
    obs_ur: jax.Array
    obs_inv_sigma2: jax.Array
    obs_valid: jax.Array


class BAResult(NamedTuple):
    Rcw: jax.Array
    tcw: jax.Array
    pw: jax.Array
    obs_inlier: jax.Array   # [M, O] final inlier classification
    cost: jax.Array


def _obs_terms(Rcw, tcw, pw, prob: BAProblem, cam, bf):
    """Per-observation residual [M,O,3], pose Jac [M,O,3,6], landmark Jac
    [M,O,3,3], chi2 [M,O], delta2 [M,O], geometric validity [M,O]."""
    kf = jnp.clip(prob.obs_kf, 0)
    R = Rcw[kf]                                 # [M, O, 3, 3]
    t = tcw[kf]                                 # [M, O, 3]
    pc = jnp.einsum("moij,mj->moi", R, pw) + t  # [M, O, 3]
    uv_hat, Jproj = cm.project_jacobian(cam, pc)
    z = pc[..., 2]
    depth_ok = z > 1e-3
    inv_z = 1.0 / jnp.where(depth_ok, z, 1.0)
    stereo = prob.obs_ur >= 0

    r_uv = prob.obs_uv - uv_hat
    ur_hat = uv_hat[..., 0] - bf * inv_z
    r_ur = jnp.where(stereo, prob.obs_ur - ur_hat, 0.0)
    r = jnp.concatenate([r_uv, r_ur[..., None]], axis=-1)      # [M,O,3]

    M, O = z.shape
    eye = jnp.broadcast_to(jnp.eye(3, dtype=z.dtype), (M, O, 3, 3))
    Jpc_pose = jnp.concatenate([eye, -lie.hat(pc)], axis=-1)   # [M,O,3,6]
    Juv_pose = Jproj @ Jpc_pose                                # [M,O,2,6]
    Jur_pose = Juv_pose[..., 0, :] + bf * (inv_z ** 2)[..., None] \
        * Jpc_pose[..., 2, :]
    Jur_pose = jnp.where(stereo[..., None], Jur_pose, 0.0)
    Jp = -jnp.concatenate([Juv_pose, Jur_pose[..., None, :]], axis=-2)

    Juv_lm = Jproj @ R                                          # [M,O,2,3]
    Jur_lm = Juv_lm[..., 0, :] + bf * (inv_z ** 2)[..., None] * R[..., 2, :]
    Jur_lm = jnp.where(stereo[..., None], Jur_lm, 0.0)
    Jl = -jnp.concatenate([Juv_lm, Jur_lm[..., None, :]], axis=-2)

    chi2 = jnp.sum(r * r, axis=-1) * prob.obs_inv_sigma2
    delta2 = jnp.where(stereo, CHI2_STEREO, CHI2_MONO).astype(chi2.dtype)
    return r, Jp, Jl, chi2, delta2, depth_ok


def _total_cost(Rcw, tcw, pw, prob, cam, bf, active):
    _, _, _, chi2, delta2, depth_ok = _obs_terms(Rcw, tcw, pw, prob, cam, bf)
    w_act = (active & prob.obs_valid).astype(chi2.dtype)
    w = w_act * depth_ok
    # Behind-camera observations must COST, not vanish — otherwise a
    # candidate that throws the map behind the cameras scores a perfect
    # zero and LM accepts it (observed failure mode).
    penalty = huber_cost(jnp.asarray(1e4, chi2.dtype), delta2)
    return jnp.sum(huber_cost(chi2, delta2) * w) \
        + jnp.sum(penalty * w_act * (~depth_ok))


@jax.jit
def landmark_refit_chi2(prob: BAProblem, cam, bf):
    """Best-static-point consistency per landmark.

    Refit every landmark position ALONE (3 damped GN steps on its 3x3
    system, poses fixed), then return the MEDIAN per-observation chi2 at
    the refit position.  A static landmark with a stale position refits
    to ~sub-pixel residuals; a MOVING landmark (dynamic scene content)
    admits NO single 3D point that explains its observations, so its
    median chi2 stays large — the discriminator the pre-GBA moving-
    object cull uses (the reference sheds moving objects through its
    found-ratio/outlier-erase churn; a global free-scale mono BA that
    reconciles such observations warps the whole solution).

    Returns (med_chi2 [M], n_obs [M])."""
    Rcw, tcw = prob.Rcw, prob.tcw
    use0 = prob.obs_valid & (prob.obs_kf >= 0)

    def refit(pw, _):
        r, _, Jl, chi2, delta2, depth_ok = _obs_terms(
            Rcw, tcw, pw, prob, cam, bf)
        w = huber_weight(chi2, delta2) * prob.obs_inv_sigma2 \
            * (use0 & depth_ok)
        V = jnp.einsum("mori,mo,morj->mij", Jl, w, Jl)
        bl = -jnp.einsum("mori,mo,mor->mi", Jl, w, r)
        tr = jnp.maximum(jnp.trace(V, axis1=-2, axis2=-1), 1e-8)
        Vd = V + (1e-3 * tr)[:, None, None] \
            * jnp.broadcast_to(jnp.eye(3, dtype=V.dtype), V.shape)
        dl = jnp.einsum("mij,mj->mi", inv3x3(Vd), bl)
        has = jnp.sum(w, axis=-1) > 0
        return pw + jnp.where(has[:, None], dl, 0.0), None

    pw_fit, _ = jax.lax.scan(refit, prob.pw, None, length=3)
    _, _, _, chi2, _, depth_ok = _obs_terms(
        Rcw, tcw, pw_fit, prob, cam, bf)
    valid = use0 & depth_ok
    n_obs = jnp.sum(valid, axis=-1)
    # masked median: sort invalid slots to +inf, take the (n-1)//2-th
    c = jnp.where(valid, chi2, jnp.inf)
    c = jnp.sort(c, axis=-1)
    idx = jnp.clip((n_obs - 1) // 2, 0, c.shape[-1] - 1)
    med = jnp.take_along_axis(c, idx[:, None], axis=-1)[:, 0]
    med = jnp.where(n_obs > 0, med, 0.0)
    return med, n_obs


def inv3x3(V: jax.Array) -> jax.Array:
    """Closed-form batched 3x3 inverse (adjugate / det).

    TPU lowers batched `jnp.linalg.inv` through LU with tiny serialized
    panels — measured +52 ms per BA iteration on a 65k-landmark block
    vs. ~free for the cofactor formula (pure VPU elementwise math)."""
    a, b, c = V[..., 0, 0], V[..., 0, 1], V[..., 0, 2]
    d, e, f = V[..., 1, 0], V[..., 1, 1], V[..., 1, 2]
    g, h, i = V[..., 2, 0], V[..., 2, 1], V[..., 2, 2]
    A = e * i - f * h
    B = c * h - b * i
    C = b * f - c * e
    D = f * g - d * i
    E = a * i - c * g
    F = c * d - a * f
    G = d * h - e * g
    H = b * g - a * h
    I = a * e - b * d
    det = a * A + b * D + c * G
    inv = jnp.stack([
        jnp.stack([A, B, C], -1),
        jnp.stack([D, E, F], -1),
        jnp.stack([G, H, I], -1)], -2)
    return inv / det[..., None, None]


def _ba_iteration(Rcw, tcw, pw, prob: BAProblem, cam, bf, active, lam):
    """One damped Schur step. Returns (Rcw', tcw', pw') candidates."""
    K = Rcw.shape[0]
    r, Jp, Jl, chi2, delta2, depth_ok = _obs_terms(
        Rcw, tcw, pw, prob, cam, bf)
    use = active & prob.obs_valid & depth_ok & (prob.obs_kf >= 0)
    w = huber_weight(chi2, delta2) * prob.obs_inv_sigma2 * use
    # Observations on fixed poses contribute to landmarks but their pose
    # Jacobian is dropped.
    free = ~prob.fixed
    obs_free = free[jnp.clip(prob.obs_kf, 0)] & use
    wp = jnp.where(obs_free, w, 0.0)

    # By-keyframe reductions: scatter (segment_sum) on CPU, one-hot MXU
    # contractions on TPU where scatter serializes (the ops/orb.py
    # lesson; the one-hot pair fill scales with K^2, so only below the
    # window-BA size — global BA keeps the scatter path).
    if ONEHOT_MODE == "auto":
        onehot = jax.default_backend() == "tpu" and K <= 64
    else:
        onehot = ONEHOT_MODE == "on"
    kf_i = jnp.clip(prob.obs_kf, 0)
    A = ((kf_i[..., None] == jnp.arange(K, dtype=kf_i.dtype))
         .astype(r.dtype) if onehot else None)

    # Pose-diagonal H and gradient.
    Hpp_d = jnp.einsum("mori,mo,morj->moij", Jp, wp, Jp)       # [M,O,6,6]
    bp_o = -jnp.einsum("mori,mo,mor->moi", Jp, wp, r)          # [M,O,6]
    kf_flat = kf_i.reshape(-1)
    if onehot:
        Hpp = jnp.einsum("mok,moij->kij", A, Hpp_d)
        bp = jnp.einsum("mok,moi->ki", A, bp_o)
    else:
        Hpp = jax.ops.segment_sum(
            Hpp_d.reshape(-1, 6, 6), kf_flat, num_segments=K)  # [K,6,6]
        bp = jax.ops.segment_sum(bp_o.reshape(-1, 6), kf_flat,
                                 num_segments=K)

    # Landmark blocks.
    V = jnp.einsum("mori,mo,morj->mij", Jl, w, Jl)             # [M,3,3]
    bl = -jnp.einsum("mori,mo,mor->mi", Jl, w, r)              # [M,3]
    lam_V = lam * jnp.maximum(
        jnp.diagonal(V, axis1=-2, axis2=-1), 1e-10)
    V_d = V + jax.vmap(jnp.diag)(lam_V)
    # Landmarks with no valid obs: make block identity so inverse is finite.
    has_obs = jnp.sum(w, axis=-1) > 0
    V_d = jnp.where(has_obs[:, None, None], V_d,
                    jnp.broadcast_to(jnp.eye(3, dtype=V.dtype), V_d.shape))
    V_inv = inv3x3(V_d)

    Wc = jnp.einsum("mori,mo,morj->moij", Jp, wp, Jl)          # [M,O,6,3]
    Y = Wc @ V_inv[:, None]                                    # [M,O,6,3]

    # Schur fill over observation pairs of the same landmark.
    Yb = jnp.einsum("moij,mj->moi", Y, bl)                     # [M,O,6]
    if onehot:
        B = jnp.einsum("mok,moic->mkic", A, Y)
        C = jnp.einsum("mok,mojc->mkjc", A, Wc)
        S = jnp.einsum("mkic,mljc->klij", B, C)
        rhs_red = bp - jnp.einsum("mok,moi->ki", A, Yb)
    else:
        S_pairs = jnp.einsum("moik,mpjk->mopij", Y, Wc)        # [M,O,O,6,6]
        pair_idx = (kf_i[:, :, None] * K + kf_i[:, None, :]).reshape(-1)
        S = jax.ops.segment_sum(
            S_pairs.reshape(-1, 6, 6), pair_idx, num_segments=K * K
        ).reshape(K, K, 6, 6)
        rhs_red = bp - jax.ops.segment_sum(
            Yb.reshape(-1, 6), kf_flat, num_segments=K)

    # Assemble the damped reduced camera system over ALL K poses, then mask
    # fixed ones to identity rows/cols (keeps shapes static).
    lam_H = lam * jnp.maximum(
        jnp.diagonal(Hpp, axis1=-2, axis2=-1), 1e-10)          # [K,6]
    Hpp_d6 = Hpp + jax.vmap(jnp.diag)(lam_H)
    S_full = -S.transpose(0, 2, 1, 3).reshape(K * 6, K * 6)
    # Add Hpp (pose-diagonal) onto the block diagonal.
    ii = jnp.arange(K)
    S_full = S_full.reshape(K, 6, K, 6)
    S_full = S_full.at[ii, :, ii, :].add(Hpp_d6)
    S_full = S_full.reshape(K * 6, K * 6)

    free_mask6 = jnp.repeat(free, 6)
    fm = free_mask6.astype(S_full.dtype)
    S_masked = S_full * fm[:, None] * fm[None, :] + jnp.diag(1.0 - fm)
    rhs_masked = rhs_red.reshape(-1) * fm

    dx = jnp.linalg.solve(S_masked, rhs_masked).reshape(K, 6)
    dx = jnp.where(free[:, None], dx, 0.0)

    # Back-substitute landmarks: dl = V^-1 (bl - sum_o W^T dx_{kf_o}).
    dx_o = jnp.einsum("mok,ki->moi", A, dx) if onehot \
        else dx[kf_i]                                          # [M,O,6]
    Wt_dx = jnp.einsum("moij,moi->mj", Wc, dx_o)               # [M,3]
    dl = jnp.einsum("mij,mj->mi", V_inv, bl - Wt_dx)
    dl = jnp.where((has_obs & prob.lm_valid)[:, None], dl, 0.0)

    dRs, dts = lie.se3_exp(dx)
    Rcw_n = dRs @ Rcw
    tcw_n = jnp.einsum("kij,kj->ki", dRs, tcw) + dts
    pw_n = pw + dl
    # dtype-stable under jax_enable_x64 (scan carry must not promote).
    return (Rcw_n.astype(Rcw.dtype), tcw_n.astype(tcw.dtype),
            pw_n.astype(pw.dtype))


def local_ba(
    prob: BAProblem,
    cam: cm.Camera,
    bf: jax.Array | float = 0.0,
    *,
    stage_iters: tuple = (5, 10),
    init_lambda: float = 1e-4,
    init_active=None,
) -> BAResult:
    """Run the two-stage robust BA (5 iters, reclassify, 10 iters) as one
    jitted program. `stage_iters` mirrors the reference schedule.
    `init_active` seeds the inlier mask (callers that split a long solve
    into abort-checkable chunks pass the previous chunk's obs_inlier so
    the outlier classification carries across chunks)."""
    bf = jnp.asarray(bf, prob.tcw.dtype)

    def lm_stage(Rcw, tcw, pw, active, n_iters):
        def body(carry, _):
            Rcw, tcw, pw, lam, cost = carry
            cand = _ba_iteration(Rcw, tcw, pw, prob, cam, bf, active, lam)
            new_cost = _total_cost(*cand, prob, cam, bf, active).astype(
                prob.tcw.dtype)
            accept = (new_cost < cost) & jnp.isfinite(new_cost)
            Rcw = jnp.where(accept, cand[0], Rcw)
            tcw = jnp.where(accept, cand[1], tcw)
            pw = jnp.where(accept, cand[2], pw)
            lam = jnp.where(accept, lam * 0.5, lam * 4.0)
            cost = jnp.where(accept, new_cost, cost)
            return (Rcw, tcw, pw, lam, cost), None

        cost0 = _total_cost(Rcw, tcw, pw, prob, cam, bf, active).astype(
            prob.tcw.dtype)
        lam0 = jnp.asarray(init_lambda, prob.tcw.dtype)
        (Rcw, tcw, pw, _, cost), _ = jax.lax.scan(
            body, (Rcw, tcw, pw, lam0, cost0), None, length=n_iters)
        return Rcw, tcw, pw, cost

    Rcw, tcw, pw = prob.Rcw, prob.tcw, prob.pw
    active = (jnp.ones_like(prob.obs_valid) if init_active is None
              else init_active)
    cost = jnp.asarray(0.0, tcw.dtype)
    for n in stage_iters:
        Rcw, tcw, pw, cost = lm_stage(Rcw, tcw, pw, active, n)
        _, _, _, chi2, delta2, depth_ok = _obs_terms(
            Rcw, tcw, pw, prob, cam, bf)
        gated = (chi2 <= delta2) & depth_ok
        # Degenerate-gating guard: if the previous stage hasn't converged
        # (e.g. a freshly loop-corrected map where every residual is still
        # large), the chi2 cut would deactivate nearly everything and leave
        # the next stage unconstrained (NaN). Keep the full set in that
        # case and let Huber weights do the down-weighting.
        frac = jnp.sum((gated & prob.obs_valid).astype(jnp.float32)) \
            / jnp.maximum(jnp.sum(prob.obs_valid.astype(jnp.float32)), 1.0)
        active = jnp.where(frac > 0.2, gated, prob.obs_valid)

    return BAResult(
        Rcw=Rcw, tcw=tcw, pw=pw,
        obs_inlier=active & prob.obs_valid, cost=cost,
    )
