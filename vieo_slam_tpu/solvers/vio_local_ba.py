"""VIO backend bundle adjustment: NavState windows with IMU/encoder chains.

TPU-native equivalent of the reference's PRV backend solves:
  - LocalBundleAdjustmentNavStatePRV (src/Optimizer.cc:21-770): temporal
    sliding window of KFs as PR+V+Bias vertices, the KF before the window
    fixed, covisible KFs fixed-PR, IMU preintegration (EdgeNavStatePRV)
    + bias random-walk (EdgeNavStateBias) + optional encoder
    (EdgeEncNavStatePR) chains between consecutive KFs, and mono/stereo
    reprojection edges.
  - GlobalBundleAdjustmentNavStatePRV (src/Optimizer.cc:771-1345): all
    KFs, optional scale vertex (VertexScale) and gravity-direction vertex
    (VertexGThetaXYRwI, EdgeNavStatePRVG) + initial-bias prior edge for
    the VI-init follow-up GBA (LoopClosing.cc:737-744).

Design (one engine for all three):
  - State: one 15D tangent per keyframe in NavState.inc_pvr_bias order
    [dp, dv, dphi, dbg, dba]; 3 optional global extras
    [dtheta_x, dtheta_y, dlog_s] for gravity direction + scale.
  - Vision: reprojection touches only the [dp, dphi] slots; the landmark
    block is Schur-eliminated exactly as in solvers/local_ba (dense
    reduced camera system via segment_sum) in 6D, then embedded into the
    [15K(+3)] dense system. Landmarks are back-substituted per iteration.
  - Chains: whitened IMU(9D)+bias(6D)+encoder(6D) residuals per
    consecutive-KF pair; Jacobians by vmapped forward-mode autodiff
    through the retraction (exact; replaces g2otypes.h:772+ hand
    Jacobians). Huber IRLS at the reference's chi2 deltas (16.919 / 9DoF,
    12.592 / 6DoF).
  - Scale gauge (deliberate difference with identical DoF): the reference
    keeps NavState positions metric and scales landmarks in the
    reprojection (EdgeReprojectPRS, g2otypes.h:355); here the visual
    frame is kept and the IMU residual sees p_metric = s * p_visual, so
    the vision system is scale-invariant and stays Schur-reducible
    without global coupling. The caller rescales the map by s* after the
    solve (as VI init does at IMUInitialization.cpp:1413+).
  - Gravity: g(theta) = Rwi Exp([tx, ty, 0]) [0, 0, |g|] with Rwi chosen
    so theta = 0 reproduces the current gravity estimate.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..cameras import models as cm
from ..math import lie
from ..math.navstate import NavState
from ..math.preintegration import EncPreint, ImuPreint
from . import imu_factors
from .lm import huber_cost, huber_weight
from .motion_ba import CHI2_MONO, CHI2_STEREO
from .vio_ba import _clamp_blocks

CHI2_IMU9 = 16.919    # chi2(0.05, 9) — thHuberNavStatePRV^2
CHI2_BIAS6 = 12.592   # chi2(0.05, 6) — thHuberNavStateBias^2
CHI2_ENC6 = 12.592

# Vision tangent slots within the 15D navstate tangent [dp, dv, dphi, ...].
_VIDX = np.asarray([0, 1, 2, 6, 7, 8])


class VioBAProblem(NamedTuple):
    """Fixed-capacity VIO BA problem.

    ns:        NavState batched [K] (window KFs first, then fixed ring).
    fixed_pr:  [K] bool — pose (p, R) held constant.
    fixed_vb:  [K] bool — velocity + bias held constant.
    Vision block (identical layout to local_ba.BAProblem):
    pw [M,3], lm_valid [M], obs_kf [M,O], obs_uv [M,O,2], obs_ur [M,O],
    obs_inv_sigma2 [M,O], obs_valid [M,O].
    Chains (consecutive-KF factors, local indices):
    chain_i/chain_j [C] int32, chain_valid [C] bool, imu_pre: ImuPreint[C],
    chain_weight [C] — 1e-2 down-weight when the i-side bias is fixed
    (Optimizer.cc:969-972).
    Encoder (optional — zero-filled with enc_valid=False when unused):
    enc_pre: EncPreint[C], enc_valid [C] bool.
    Bias prior (init-GBA, Optimizer.cc:1030-1060): unary on KF
    prior_idx with diag info prior_info6 (zeros disable).
    """

    ns: NavState
    fixed_pr: jax.Array
    fixed_vb: jax.Array
    pw: jax.Array
    lm_valid: jax.Array
    obs_kf: jax.Array
    obs_uv: jax.Array
    obs_ur: jax.Array
    obs_inv_sigma2: jax.Array
    obs_valid: jax.Array
    chain_i: jax.Array
    chain_j: jax.Array
    chain_valid: jax.Array
    chain_weight: jax.Array
    imu_pre: ImuPreint
    enc_pre: EncPreint
    enc_valid: jax.Array
    prior_idx: jax.Array
    prior_info6: jax.Array


class VioBAConfig(NamedTuple):
    Rcb: jax.Array
    tcb: jax.Array
    bf: jax.Array
    gravity: jax.Array           # current gw estimate [3]
    sigma_bg_rw: float = 2e-4
    sigma_ba_rw: float = 2e-3
    Rbe: Optional[jax.Array] = None   # encoder extrinsics (body-from-enc)
    tbe: Optional[jax.Array] = None


class VioBAResult(NamedTuple):
    ns: NavState
    pw: jax.Array
    obs_inlier: jax.Array
    cost: jax.Array
    scale: jax.Array          # exp(dlog_s): 1.0 unless opt_scale
    gravity: jax.Array        # refined gw (== input unless opt_gdir)


def _gravity_frame(gw: jax.Array):
    """Rwi with Rwi @ [0,0,|g|] == gw (VertexGThetaXYRwI origin)."""
    gnorm = jnp.linalg.norm(gw)
    gI = jnp.asarray([0.0, 0.0, 1.0], gw.dtype)
    gdir = gw / jnp.maximum(gnorm, 1e-9)
    v = jnp.cross(gI, gdir)
    s = jnp.linalg.norm(v)
    c = jnp.dot(gI, gdir)
    # Rodrigues from axis*sin, cos; degenerate (parallel) -> identity/flip.
    vx = lie.hat(v)
    R = jnp.eye(3, dtype=gw.dtype) + vx + vx @ vx * ((1 - c)
                                                     / jnp.maximum(s * s,
                                                                   1e-12))
    R = jnp.where(s < 1e-8,
                  jnp.where(c > 0, jnp.eye(3, dtype=gw.dtype),
                            jnp.diag(jnp.asarray([1., -1., -1.], gw.dtype))),
                  R)
    return R, gnorm


def _vision_terms(ns: NavState, pw, prob: VioBAProblem, cam, cfg):
    """Per-observation residual/Jacobians wrt the navstate [dp, dphi]
    tangent. pc = Rcb (Rwb^T (pw - pwb)) + tcb; under the retraction
    {p <- p + R dp, R <- R Exp(dphi)}: dpc/ddp = -Rcb,
    dpc/ddphi = Rcb hat(q) with q = Rwb^T (pw - pwb)."""
    kf = jnp.clip(prob.obs_kf, 0)
    Rwb = ns.R[kf]                               # [M,O,3,3]
    pwb = ns.p[kf]                               # [M,O,3]
    q = jnp.einsum("moji,moj->moi", Rwb, pw[:, None, :] - pwb)
    Rcb = cfg.Rcb
    pc = jnp.einsum("ij,moj->moi", Rcb, q) + cfg.tcb
    uv_hat, Jproj = cm.project_jacobian(cam, pc)
    z = pc[..., 2]
    depth_ok = z > 1e-3
    inv_z = 1.0 / jnp.where(depth_ok, z, 1.0)
    stereo = prob.obs_ur >= 0
    bf = cfg.bf

    r_uv = prob.obs_uv - uv_hat
    ur_hat = uv_hat[..., 0] - bf * inv_z
    r_ur = jnp.where(stereo, prob.obs_ur - ur_hat, 0.0)
    r = jnp.concatenate([r_uv, r_ur[..., None]], axis=-1)      # [M,O,3]

    M, O = z.shape
    Rcb_b = jnp.broadcast_to(Rcb, (M, O, 3, 3))
    Jpc_pose = jnp.concatenate([-Rcb_b, Rcb @ lie.hat(q)], axis=-1)
    Juv_pose = Jproj @ Jpc_pose                                 # [M,O,2,6]
    Jur_pose = Juv_pose[..., 0, :] + bf * (inv_z ** 2)[..., None] \
        * Jpc_pose[..., 2, :]
    Jur_pose = jnp.where(stereo[..., None], Jur_pose, 0.0)
    Jp = -jnp.concatenate([Juv_pose, Jur_pose[..., None, :]], axis=-2)

    Rcw = Rcb @ jnp.swapaxes(Rwb, -1, -2)                       # [M,O,3,3]
    Juv_lm = Jproj @ Rcw
    Jur_lm = Juv_lm[..., 0, :] + bf * (inv_z ** 2)[..., None] * Rcw[..., 2, :]
    Jur_lm = jnp.where(stereo[..., None], Jur_lm, 0.0)
    Jl = -jnp.concatenate([Juv_lm, Jur_lm[..., None, :]], axis=-2)

    chi2 = jnp.sum(r * r, axis=-1) * prob.obs_inv_sigma2
    delta2 = jnp.where(stereo, CHI2_STEREO, CHI2_MONO).astype(chi2.dtype)
    return r, Jp, Jl, chi2, delta2, depth_ok


def _chain_residual(dxi, dxj, dg, ns_i: NavState, ns_j: NavState,
                    pre: ImuPreint, enc: EncPreint,
                    L_imu, L_bias, L_enc, enc_on,
                    cfg: VioBAConfig, Rwi, gnorm,
                    opt_scale: bool, opt_gdir: bool, use_enc: bool):
    """Whitened 21D chain residual [imu(9), bias(6), enc(6)] at tangent
    increments (dxi, dxj) and global extras dg = [tx, ty, dlog_s]."""
    ni = ns_i.inc_pvr_bias(dxi)
    nj = ns_j.inc_pvr_bias(dxj)
    dtype = dxi.dtype
    if opt_gdir:
        th = jnp.concatenate([dg[:2], jnp.zeros(1, dtype)])
        gw = Rwi @ lie.so3_exp(th) @ jnp.asarray([0.0, 0.0, 1.0],
                                                 dtype) * gnorm
    else:
        gw = cfg.gravity.astype(dtype)
    if opt_scale:
        s = jnp.exp(dg[2])
        ni = ni._replace(p=ni.p * s)
        nj = nj._replace(p=nj.p * s)
    r_imu = imu_factors.imu_residual_prv(ni, nj, pre, gw)
    r_bias = imu_factors.bias_rw_residual(ni, nj)
    parts = [L_imu @ r_imu, L_bias * r_bias]
    if use_enc:
        r_enc = imu_factors.encoder_residual(ni, nj, enc, cfg.Rbe, cfg.tbe)
        parts.append(enc_on * (L_enc @ r_enc))
    else:
        parts.append(jnp.zeros(6, dtype))
    return jnp.concatenate(parts)


def _chain_system(ns, dg0, prob: VioBAProblem, cfg, Rwi, gnorm,
                  opt_scale, opt_gdir, use_enc, *, irls=False):
    """Per-chain GN blocks: H [C,33,33], b [C,33], chi2 parts for cost."""
    dtype = ns.p.dtype
    ns_i = jax.tree.map(lambda a: a[prob.chain_i], ns)
    ns_j = jax.tree.map(lambda a: a[prob.chain_j], ns)
    info_imu = imu_factors.imu_info_prv(prob.imu_pre)
    L_imu = jnp.linalg.cholesky(
        info_imu + 1e-12 * jnp.eye(9, dtype=dtype)).swapaxes(-1, -2)
    dt = jnp.maximum(prob.imu_pre.dt, 1e-6)
    ig = 1.0 / (cfg.sigma_bg_rw ** 2 * dt)
    ia = 1.0 / (cfg.sigma_ba_rw ** 2 * dt)
    L_bias = jnp.sqrt(jnp.concatenate(
        [jnp.broadcast_to(ig[..., None], ig.shape + (3,)),
         jnp.broadcast_to(ia[..., None], ia.shape + (3,))], axis=-1))
    if use_enc:
        info_e = jnp.linalg.inv(
            prob.enc_pre.cov + 1e-9 * jnp.eye(6, dtype=dtype))
        L_enc = jnp.linalg.cholesky(
            0.5 * (info_e + jnp.swapaxes(info_e, -1, -2))
            + 1e-12 * jnp.eye(6, dtype=dtype)).swapaxes(-1, -2)
        enc_on = prob.enc_valid.astype(dtype)
    else:
        L_enc = jnp.zeros((prob.chain_i.shape[0], 6, 6), dtype)
        enc_on = jnp.zeros_like(prob.chain_i, dtype)

    z15 = jnp.zeros(15, dtype)

    def one(nsi, nsj, pre, enc, Li, Lb, Le, eo, w_c):
        def f(d):
            return _chain_residual(d[:15], d[15:30], d[30:33], nsi, nsj,
                                   pre, enc, Li, Lb, Le, eo, cfg, Rwi,
                                   gnorm, opt_scale, opt_gdir, use_enc)
        d0 = jnp.concatenate([z15, z15, dg0])
        r = f(d0)
        J = jax.jacfwd(f)(d0)                                   # [21,33]
        chi_imu = jnp.sum(r[:9] ** 2)
        chi_b = jnp.sum(r[9:15] ** 2)
        chi_e = jnp.sum(r[15:21] ** 2)
        # The reference adds its PRV/bias edges WITHOUT robust kernels
        # in the backend solves (Optimizer.cc "here false" markers); a
        # Huber on heavily-violated chains (e.g. scale-off init-GBA)
        # saturates the gradient and stalls convergence.
        if irls:
            w9 = huber_weight(chi_imu, jnp.asarray(CHI2_IMU9, dtype))
            w6 = huber_weight(chi_b, jnp.asarray(CHI2_BIAS6, dtype))
            we = huber_weight(chi_e, jnp.asarray(CHI2_ENC6, dtype))
        else:
            w9 = w6 = we = jnp.asarray(1.0, dtype)
        sw = jnp.sqrt(jnp.concatenate([
            jnp.full((9,), w9), jnp.full((6,), w6), jnp.full((6,), we)
        ]).astype(dtype)) * jnp.sqrt(w_c)
        rw = r * sw
        Jw = J * sw[:, None]
        H = Jw.T @ Jw
        b = -Jw.T @ rw
        if irls:
            cost = (huber_cost(chi_imu, jnp.asarray(CHI2_IMU9, dtype))
                    + huber_cost(chi_b, jnp.asarray(CHI2_BIAS6, dtype))
                    + huber_cost(chi_e, jnp.asarray(CHI2_ENC6, dtype))) * w_c
        else:
            cost = (chi_imu + chi_b + chi_e) * w_c
        return H, b, cost

    H, b, cost = jax.vmap(one)(ns_i, ns_j, prob.imu_pre, prob.enc_pre,
                               L_imu, L_bias, L_enc, enc_on,
                               prob.chain_weight.astype(dtype))
    cv = prob.chain_valid.astype(dtype)
    return H * cv[:, None, None], b * cv[:, None], jnp.sum(cost * cv)


def _chain_cost(ns, dg, prob, cfg, Rwi, gnorm, opt_scale, opt_gdir,
                use_enc, robust):
    _, _, cost = _chain_system(ns, dg, prob, cfg, Rwi, gnorm,
                               opt_scale, opt_gdir, use_enc,
                               irls=robust)
    return cost


def _prior_terms(ns: NavState, prob: VioBAProblem):
    """Initial-bias prior residual (6D) on KF prior_idx."""
    i = prob.prior_idx
    r = jnp.concatenate([ns.bg[i] + ns.dbg[i], ns.ba[i] + ns.dba[i]])
    return r


def _vision_cost(ns, pw, prob, cam, cfg, active):
    _, _, _, chi2, delta2, depth_ok = _vision_terms(ns, pw, prob, cam, cfg)
    w_act = (active & prob.obs_valid).astype(chi2.dtype)
    w = w_act * depth_ok
    penalty = huber_cost(jnp.asarray(1e4, chi2.dtype), delta2)
    return jnp.sum(huber_cost(chi2, delta2) * w) \
        + jnp.sum(penalty * w_act * (~depth_ok))


def _total_cost(ns, pw, dg, prob, cam, cfg, active, Rwi, gnorm,
                opt_scale, opt_gdir, use_enc, robust):
    c = _vision_cost(ns, pw, prob, cam, cfg, active)
    c = c + _chain_cost(ns, dg, prob, cfg, Rwi, gnorm, opt_scale,
                        opt_gdir, use_enc, robust)
    rp = _prior_terms(ns, prob)
    c = c + jnp.sum(rp * prob.prior_info6 * rp)
    return c


def _iteration(ns, pw, dg, prob: VioBAProblem, cam, cfg, active, lam,
               Rwi, gnorm, opt_scale, opt_gdir, use_enc, robust):
    """One damped Schur step over the [15K+3] system."""
    K = ns.p.shape[0]
    dtype = ns.p.dtype
    D = 15 * K + 3

    # ---------------- vision: 6D reduced camera system -------------------
    r, Jp, Jl, chi2, delta2, depth_ok = _vision_terms(ns, pw, prob, cam,
                                                      cfg)
    use = active & prob.obs_valid & depth_ok & (prob.obs_kf >= 0)
    w = huber_weight(chi2, delta2) * prob.obs_inv_sigma2 * use
    free_pose = ~prob.fixed_pr
    obs_free = free_pose[jnp.clip(prob.obs_kf, 0)] & use
    wp = jnp.where(obs_free, w, 0.0)

    Hpp_d = jnp.einsum("mori,mo,morj->moij", Jp, wp, Jp)
    bp_o = -jnp.einsum("mori,mo,mor->moi", Jp, wp, r)
    kf_flat = jnp.clip(prob.obs_kf, 0).reshape(-1)
    Hpp = jax.ops.segment_sum(Hpp_d.reshape(-1, 6, 6), kf_flat,
                              num_segments=K)
    bp = jax.ops.segment_sum(bp_o.reshape(-1, 6), kf_flat, num_segments=K)

    V = jnp.einsum("mori,mo,morj->mij", Jl, w, Jl)
    bl = -jnp.einsum("mori,mo,mor->mi", Jl, w, r)
    lam_V = lam * jnp.maximum(jnp.diagonal(V, axis1=-2, axis2=-1), 1e-10)
    V_d = V + jax.vmap(jnp.diag)(lam_V)
    has_obs = jnp.sum(w, axis=-1) > 0
    V_d = jnp.where(has_obs[:, None, None], V_d,
                    jnp.broadcast_to(jnp.eye(3, dtype=dtype), V_d.shape))
    V_inv = jnp.linalg.inv(V_d)

    Wc = jnp.einsum("mori,mo,morj->moij", Jp, wp, Jl)
    Y = Wc @ V_inv[:, None]
    S_pairs = jnp.einsum("moik,mpjk->mopij", Y, Wc)
    kf_i = jnp.clip(prob.obs_kf, 0)
    pair_idx = (kf_i[:, :, None] * K + kf_i[:, None, :]).reshape(-1)
    S6 = jax.ops.segment_sum(S_pairs.reshape(-1, 6, 6), pair_idx,
                             num_segments=K * K).reshape(K, K, 6, 6)
    Yb = jnp.einsum("moij,mj->moi", Y, bl)
    rhs6 = bp - jax.ops.segment_sum(Yb.reshape(-1, 6), kf_flat,
                                    num_segments=K)

    # ---------------- chains -------------------------------------------
    Hc, bc, _ = _chain_system(ns, dg, prob, cfg, Rwi, gnorm, opt_scale,
                              opt_gdir, use_enc, irls=robust)

    # ---------------- assemble [15K+3] dense system ---------------------
    big = jnp.zeros((K, 15, K, 15), dtype)
    # vision: Hpp on block diagonal, -S6 off... (reduced system is
    # Hpp - S6 with S6 containing the diagonal pair terms too)
    vis_block = -S6
    ii = jnp.arange(K)
    vis_block = vis_block.at[ii, ii].add(Hpp)
    vi = _VIDX
    # Advanced-index update: the two vi index arrays broadcast to (6, 6)
    # and land in FRONT of the sliced K axes, so the update operand must
    # be laid out (6, 6, K, K).
    big = big.at[:, vi[:, None], :, vi[None, :]].add(
        vis_block.transpose(2, 3, 0, 1))
    rhs = jnp.zeros((K, 15), dtype)
    rhs = rhs.at[:, vi].add(rhs6)

    # chains: scatter the 15x15 blocks.
    ci, cj = prob.chain_i, prob.chain_j
    pair_ii = ci * K + ci
    pair_ij = ci * K + cj
    pair_ji = cj * K + ci
    pair_jj = cj * K + cj
    big_flat = big.transpose(0, 2, 1, 3).reshape(K * K, 15, 15)
    for pidx, sl_r, sl_c in ((pair_ii, slice(0, 15), slice(0, 15)),
                             (pair_ij, slice(0, 15), slice(15, 30)),
                             (pair_ji, slice(15, 30), slice(0, 15)),
                             (pair_jj, slice(15, 30), slice(15, 30))):
        big_flat = big_flat + jax.ops.segment_sum(
            Hc[:, sl_r, sl_c], pidx, num_segments=K * K,
            indices_are_sorted=False)
    rhs = rhs + jax.ops.segment_sum(bc[:, 0:15], ci, num_segments=K)
    rhs = rhs + jax.ops.segment_sum(bc[:, 15:30], cj, num_segments=K)

    # global extras coupling.
    Hgg = jnp.sum(Hc[:, 30:33, 30:33], axis=0)                   # [3,3]
    Hig = jax.ops.segment_sum(Hc[:, 0:15, 30:33], ci, num_segments=K)
    Hjg = jax.ops.segment_sum(Hc[:, 15:30, 30:33], cj, num_segments=K)
    Hkg = Hig + Hjg                                              # [K,15,3]
    bg_extra = jnp.sum(bc[:, 30:33], axis=0)

    # bias prior (unary): info on slots 9:15 of prior_idx.
    rp = _prior_terms(ns, prob)
    pi = prob.prior_idx
    big4 = big_flat.reshape(K, K, 15, 15)
    big4 = big4.at[pi, pi, 9:15, 9:15].add(jnp.diag(prob.prior_info6))
    rhs = rhs.at[pi, 9:15].add(-prob.prior_info6 * rp)

    A = jnp.zeros((D, D), dtype)
    A = A.at[:15 * K, :15 * K].set(
        big4.transpose(0, 2, 1, 3).reshape(15 * K, 15 * K))
    A = A.at[:15 * K, 15 * K:].set(Hkg.reshape(15 * K, 3))
    A = A.at[15 * K:, :15 * K].set(Hkg.reshape(15 * K, 3).T)
    A = A.at[15 * K:, 15 * K:].set(Hgg)
    rhs_full = jnp.concatenate([rhs.reshape(-1), bg_extra])

    # damping + free-mask.
    diagA = jnp.diagonal(A)
    A = A + jnp.diag(lam * jnp.maximum(diagA, 1e-8))
    # Per-KF free mask (shape [K,15]) in [dp, dv, dphi, dbg, dba] order.
    fpr = (~prob.fixed_pr)[:, None]
    fvb = (~prob.fixed_vb)[:, None]
    m15 = jnp.concatenate([
        jnp.broadcast_to(fpr, (K, 3)),
        jnp.broadcast_to(fvb, (K, 3)),
        jnp.broadcast_to(fpr, (K, 3)),
        jnp.broadcast_to(fvb, (K, 6)),
    ], axis=1)
    gmask = jnp.asarray([opt_gdir, opt_gdir, opt_scale])
    fm = jnp.concatenate([m15.reshape(-1), gmask]).astype(dtype)
    A = A * fm[:, None] * fm[None, :] + jnp.diag(1.0 - fm)
    rhs_full = rhs_full * fm

    dx = jnp.linalg.solve(A, rhs_full)
    # Same per-block trust region as the motion solve (see vio_ba): the
    # bias->rotation correction wraps at 2pi, so weakly-constrained bias
    # directions admit huge wrapped steps.
    dx_kf = _clamp_blocks(dx[:15 * K].reshape(K, 15)) * m15
    dgx = dx[15 * K:] * gmask.astype(dtype)

    # landmark back-substitution with the 6D vision slice.
    dx6 = dx_kf[:, vi]
    dx_o = dx6[kf_i]
    Wt_dx = jnp.einsum("moij,moi->mj", Wc, dx_o)
    dl = jnp.einsum("mij,mj->mi", V_inv, bl - Wt_dx)
    dl = jnp.where((has_obs & prob.lm_valid)[:, None], dl, 0.0)

    ns_new = ns.inc_pvr_bias(dx_kf)
    ns_new = jax.tree.map(lambda a, ref: a.astype(ref.dtype), ns_new, ns)
    return ns_new, (pw + dl).astype(pw.dtype), (dg + dgx).astype(dg.dtype)


def vio_ba(
    prob: VioBAProblem,
    cam: cm.Camera,
    cfg: VioBAConfig,
    *,
    stage_iters: tuple = (5, 10),
    init_lambda: float = 1e-4,
    opt_scale: bool = False,
    opt_gdir: bool = False,
    use_enc: bool = False,
    robust_chains: bool = False,
) -> VioBAResult:
    """Two-stage robust VIO BA (reclassify reprojection outliers between
    stages, as the reference's 5+10 LBA schedule)."""
    dtype = prob.ns.p.dtype
    Rwi, gnorm = _gravity_frame(cfg.gravity.astype(dtype))

    def lm_stage(ns, pw, dg, active, n_iters):
        def body(carry, _):
            ns, pw, dg, lam, cost = carry
            cand = _iteration(ns, pw, dg, prob, cam, cfg, active, lam,
                              Rwi, gnorm, opt_scale, opt_gdir, use_enc,
                              robust_chains)
            new_cost = _total_cost(cand[0], cand[1], cand[2], prob, cam,
                                   cfg, active, Rwi, gnorm, opt_scale,
                                   opt_gdir, use_enc,
                                   robust_chains).astype(dtype)
            accept = (new_cost < cost) & jnp.isfinite(new_cost)
            ns = jax.tree.map(lambda a, b: jnp.where(accept, a, b),
                              cand[0], ns)
            pw = jnp.where(accept, cand[1], pw)
            dg = jnp.where(accept, cand[2], dg)
            lam = jnp.where(accept, lam * 0.5, lam * 4.0)
            cost = jnp.where(accept, new_cost, cost)
            return (ns, pw, dg, lam, cost), None

        cost0 = _total_cost(ns, pw, dg, prob, cam, cfg, active, Rwi,
                            gnorm, opt_scale, opt_gdir, use_enc,
                            robust_chains).astype(dtype)
        lam0 = jnp.asarray(init_lambda, dtype)
        (ns, pw, dg, _, cost), _ = jax.lax.scan(
            body, (ns, pw, dg, lam0, cost0), None, length=n_iters)
        return ns, pw, dg, cost

    ns, pw = prob.ns, prob.pw
    dg = jnp.zeros(3, dtype)
    active = jnp.ones_like(prob.obs_valid)
    cost = jnp.asarray(0.0, dtype)
    for n in stage_iters:
        ns, pw, dg, cost = lm_stage(ns, pw, dg, active, n)
        _, _, _, chi2, delta2, depth_ok = _vision_terms(ns, pw, prob, cam,
                                                        cfg)
        gated = (chi2 <= delta2) & depth_ok
        frac = jnp.sum((gated & prob.obs_valid).astype(jnp.float32)) \
            / jnp.maximum(jnp.sum(prob.obs_valid.astype(jnp.float32)), 1.0)
        active = jnp.where(frac > 0.2, gated, prob.obs_valid)

    th = jnp.concatenate([dg[:2], jnp.zeros(1, dtype)])
    gw_out = jnp.where(
        opt_gdir,
        Rwi @ lie.so3_exp(th) @ jnp.asarray([0., 0., 1.], dtype) * gnorm,
        cfg.gravity.astype(dtype))
    return VioBAResult(
        ns=ns, pw=pw, obs_inlier=active & prob.obs_valid, cost=cost,
        scale=jnp.where(opt_scale, jnp.exp(dg[2]), jnp.asarray(1.0, dtype)),
        gravity=gw_out,
    )
