"""Visual-inertial initialization: gyro bias, scale, gravity, velocities.

TPU-native equivalent of src/Odom/IMUInitialization.cpp TryInitVIO
(:1068; steps at :1138 gyro-bias GN, :1151 linear s+gw solve, :1227
gravity-magnitude refinement with accel bias, :1413 velocity recovery)
following VI-ORBSLAM IV-A..D.

Design difference (deliberate): where the reference eliminates velocities
by hand to obtain small reduced systems (A[3(N-2)x4], C[3(N-2)x6]), this
solves the FULL linear systems with all per-keyframe velocities as
unknowns via one dense least-squares on the MXU — [3+3N+...] unknowns is
tiny for a TPU, the elimination buys nothing, and the velocities (the
reference's separate step 4) fall out of the same solve.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..math import lie
from ..math.preintegration import ImuPreint

G_MAG = 9.810


class VioInit(NamedTuple):
    bg: jax.Array        # [3] gyro bias
    ba: jax.Array        # [3] accel bias
    scale: jax.Array     # scalar (1.0 for stereo/RGB-D)
    gw: jax.Array        # [3] gravity in world frame
    v: jax.Array         # [N, 3] per-KF body velocities
    cond: jax.Array      # conditioning diagnostic of the linear solve


def solve_gyro_bias(R_wb: jax.Array, pre: ImuPreint, *, iters: int = 4):
    """Gyro-bias Gauss-Newton (OptimizeInitialGyroBias, Optimizer.h:819):
    minimize sum_i || Log( (dR_i Exp(Jg_i bg))^T R_i^T R_{i+1} ) ||^2.

    R_wb: [N, 3, 3] body orientations from vision; pre: preintegrations
    between consecutive KFs (batched leading dim N-1, integrated at bg=0).
    """
    dR_vis = jnp.einsum("nji,njk->nik", R_wb[:-1].transpose(0, 2, 1),
                        R_wb[1:])  # placeholder to keep shapes clear
    dR_vis = jnp.swapaxes(R_wb[:-1], -1, -2) @ R_wb[1:]

    def residual(bg):
        corr = pre.dR @ lie.so3_exp(
            jnp.einsum("nij,j->ni", pre.Jg_R, bg))
        return lie.so3_log(
            jnp.swapaxes(corr, -1, -2) @ dR_vis).reshape(-1)

    def body(bg, _):
        r = residual(bg)
        J = jax.jacfwd(residual)(bg)
        H = J.T @ J + 1e-9 * jnp.eye(3, dtype=bg.dtype)
        bg = bg - jnp.linalg.solve(H, J.T @ r)
        return bg, None

    bg0 = jnp.zeros(3, R_wb.dtype)
    bg, _ = jax.lax.scan(body, bg0, None, length=iters)
    return bg


def linear_alignment(
    t_kf: jax.Array,
    R_wb: jax.Array,
    p_wc: jax.Array,
    R_wc: jax.Array,
    pcb: jax.Array,
    pre: ImuPreint,
    *,
    solve_scale: bool = True,
):
    """Linear solve for [scale, gw, v_0..v_{N-1}] (VI-ORBSLAM IV-B + IV-D).

    Body positions relate to camera positions by p_wb = s p_wc + R_wc pcb.
    For each consecutive pair (dt, dR, dv, dp):
       pos: s(pc_{j} - pc_i) + (Rwc_j - Rwc_i) pcb
            = v_i dt + .5 gw dt^2 + Rwb_i dp
       vel: v_j - v_i = gw dt + Rwb_i dv
    All unknowns appear linearly; one lstsq yields everything.
    """
    dtype = p_wc.dtype
    N = p_wc.shape[0]
    M = N - 1
    dt = pre.dt                                       # [M]
    n_unk = (1 if solve_scale else 0) + 3 + 3 * N
    off_g = 1 if solve_scale else 0
    off_v = off_g + 3

    A = jnp.zeros((6 * M, n_unk), dtype)
    b = jnp.zeros((6 * M,), dtype)
    rows_p = jnp.arange(M) * 6
    eye3 = jnp.eye(3, dtype=dtype)

    dpc = p_wc[1:] - p_wc[:-1]                        # [M, 3]
    dRwc_pcb = jnp.einsum("mij,j->mi", R_wc[1:] - R_wc[:-1], pcb)
    Rdp = jnp.einsum("mij,mj->mi", R_wb[:-1], pre.dp)
    Rdv = jnp.einsum("mij,mj->mi", R_wb[:-1], pre.dv)

    def fill(m, A, b):
        rp = 6 * m
        rv = 6 * m + 3
        # position rows
        if solve_scale:
            A = jax.lax.dynamic_update_slice(
                A, dpc[m].reshape(3, 1), (rp, 0))
        A = jax.lax.dynamic_update_slice(
            A, (-0.5 * dt[m] ** 2) * eye3, (rp, off_g))
        A = jax.lax.dynamic_update_slice(
            A, -dt[m] * eye3, (rp, off_v + 3 * m))
        # With known scale the s*dpc term moves to the RHS.
        rhs_p = Rdp[m] - dRwc_pcb[m] - (0.0 if solve_scale else 1.0) * dpc[m]
        b = jax.lax.dynamic_update_slice(b, rhs_p, (rp,))
        # velocity rows
        A = jax.lax.dynamic_update_slice(A, -dt[m] * eye3, (rv, off_g))
        A = jax.lax.dynamic_update_slice(
            A, -eye3, (rv, off_v + 3 * m))
        A = jax.lax.dynamic_update_slice(
            A, eye3, (rv, off_v + 3 * (m + 1)))
        b = jax.lax.dynamic_update_slice(b, Rdv[m], (rv,))
        return A, b

    def body(carry, m):
        A, b = carry
        A, b = fill(m, A, b)
        return (A, b), None

    (A, b), _ = jax.lax.scan(body, (A, b), jnp.arange(M))
    sol, _, _, sv = jnp.linalg.lstsq(A, b)
    cond = sv[0] / jnp.maximum(sv[-1], 1e-12)
    if solve_scale:
        s = sol[0]
        gw = sol[1:4]
        v = sol[4:].reshape(N, 3)
    else:
        s = jnp.asarray(1.0, dtype)
        gw = sol[0:3]
        v = sol[3:].reshape(N, 3)
    return s, gw, v, cond


def refine_with_gravity_mag(
    t_kf, R_wb, p_wc, R_wc, pcb, pre: ImuPreint, gw0,
    *, solve_scale: bool = True,
):
    """Step 3 (IV-C): enforce |g| = G and solve accel bias.

    Parametrize gw = G * Exp(hat(S dxy)) ghat0 with S spanning the tangent
    orthogonal to ghat0 (2 dof), linearized: gw ~ gw0 - G [ghat0]x S dxy.
    Bias enters through the preintegration Jacobians Ja_p / Ja_v.
    Unknowns: [s?, dxy(2), ba(3), v(3N)].
    """
    dtype = p_wc.dtype
    N = p_wc.shape[0]
    M = N - 1
    dt = pre.dt
    ghat = gw0 / jnp.linalg.norm(gw0)
    # Tangent basis orthogonal to ghat.
    ref = jnp.where(jnp.abs(ghat[0]) < 0.9,
                    jnp.asarray([1.0, 0, 0], dtype),
                    jnp.asarray([0, 1.0, 0], dtype))
    b1 = jnp.cross(ghat, ref)
    b1 = b1 / jnp.linalg.norm(b1)
    b2 = jnp.cross(ghat, b1)
    S = jnp.stack([b1, b2], axis=1)                   # [3, 2]
    Gg = G_MAG * ghat
    dG = -G_MAG * lie.hat(ghat) @ S                   # [3, 2]

    n_s = 1 if solve_scale else 0
    off_th = n_s
    off_ba = off_th + 2
    off_v = off_ba + 3
    n_unk = off_v + 3 * N

    dpc = p_wc[1:] - p_wc[:-1]
    dRwc_pcb = jnp.einsum("mij,j->mi", R_wc[1:] - R_wc[:-1], pcb)
    Rdp = jnp.einsum("mij,mj->mi", R_wb[:-1], pre.dp)
    Rdv = jnp.einsum("mij,mj->mi", R_wb[:-1], pre.dv)
    RJa_p = R_wb[:-1] @ pre.Ja_p                      # [M, 3, 3]
    RJa_v = R_wb[:-1] @ pre.Ja_v

    A = jnp.zeros((6 * M, n_unk), dtype)
    b = jnp.zeros((6 * M,), dtype)
    eye3 = jnp.eye(3, dtype=dtype)

    def fill(m, A, b):
        rp, rv = 6 * m, 6 * m + 3
        if solve_scale:
            A = jax.lax.dynamic_update_slice(A, dpc[m].reshape(3, 1),
                                             (rp, 0))
        A = jax.lax.dynamic_update_slice(
            A, (-0.5 * dt[m] ** 2) * dG, (rp, off_th))
        A = jax.lax.dynamic_update_slice(A, -RJa_p[m], (rp, off_ba))
        A = jax.lax.dynamic_update_slice(A, -dt[m] * eye3,
                                         (rp, off_v + 3 * m))
        rhs_p = (Rdp[m] - dRwc_pcb[m] + 0.5 * dt[m] ** 2 * Gg
                 - (0.0 if solve_scale else 1.0) * dpc[m])
        b = jax.lax.dynamic_update_slice(b, rhs_p, (rp,))
        A = jax.lax.dynamic_update_slice(A, -dt[m] * dG, (rv, off_th))
        A = jax.lax.dynamic_update_slice(A, -RJa_v[m], (rv, off_ba))
        A = jax.lax.dynamic_update_slice(A, -eye3, (rv, off_v + 3 * m))
        A = jax.lax.dynamic_update_slice(A, eye3,
                                         (rv, off_v + 3 * (m + 1)))
        b = jax.lax.dynamic_update_slice(b, Rdv[m] + dt[m] * Gg, (rv,))
        return A, b

    def body(carry, m):
        A, b = carry
        return fill(m, A, b), None

    (A, b), _ = jax.lax.scan(body, (A, b), jnp.arange(M))
    sol, _, _, sv = jnp.linalg.lstsq(A, b)
    cond = sv[0] / jnp.maximum(sv[-1], 1e-12)
    if solve_scale:
        s = sol[0]
        th = sol[1:3]
        ba = sol[3:6]
        v = sol[6:].reshape(N, 3)
    else:
        s = jnp.asarray(1.0, dtype)
        th = sol[0:2]
        ba = sol[2:5]
        v = sol[5:].reshape(N, 3)
    gw = G_MAG * (lie.so3_exp(S @ th) @ ghat)
    return s, gw, ba, v, cond


def try_init_vio(
    t_kf: jax.Array,
    R_wc: jax.Array,
    p_wc: jax.Array,
    Rcb: jax.Array,
    tcb: jax.Array,
    gyro_w, acc_w, dt_w, mask_w,
    sigma_g: float, sigma_a: float,
    *,
    solve_scale: bool = True,
) -> VioInit:
    """Full VI initialization from per-KF vision poses + raw IMU windows.

    gyro_w/acc_w/dt_w/mask_w: [N-1, T, ...] padded IMU windows between
    consecutive keyframes. Runs: preintegrate at bg=0 -> gyro-bias GN ->
    re-preintegrate at bg* (the reference's recompute, vmapped) ->
    linear alignment -> gravity-magnitude refinement.
    """
    from ..math.preintegration import preintegrate_imu

    dtype = p_wc.dtype
    Rcb = jnp.asarray(Rcb, dtype)
    tcb = jnp.asarray(tcb, dtype)
    R_wc = jnp.asarray(R_wc, dtype)
    Rbc = jnp.swapaxes(Rcb, -1, -2)
    pcb = -jnp.einsum("ij,j->i", Rbc, tcb)            # camera->body offset
    R_wb = R_wc @ jnp.broadcast_to(Rcb, R_wc.shape)   # Rwb = Rwc Rcb

    zeros3 = jnp.zeros(3, p_wc.dtype)
    pre0 = jax.vmap(
        lambda g, a, d, m: preintegrate_imu(
            g, a, d, zeros3, zeros3, sigma_g, sigma_a, mask=m)
    )(gyro_w, acc_w, dt_w, mask_w)

    bg = solve_gyro_bias(R_wb, pre0)

    pre1 = jax.vmap(
        lambda g, a, d, m: preintegrate_imu(
            g, a, d, bg, zeros3, sigma_g, sigma_a, mask=m)
    )(gyro_w, acc_w, dt_w, mask_w)

    s1, gw1, v1, cond1 = linear_alignment(
        t_kf, R_wb, p_wc, R_wc, pcb, pre1, solve_scale=solve_scale)
    s2, gw2, ba, v2, cond2 = refine_with_gravity_mag(
        t_kf, R_wb, p_wc, R_wc, pcb, pre1, gw1, solve_scale=solve_scale)
    return VioInit(bg=bg, ba=ba, scale=s2, gw=gw2, v=v2,
                   cond=jnp.maximum(cond1, cond2))


def recompute_bias_navstate(
    t_kf, R_wc, p_wc, Rcb, tcb,
    gyro_w, acc_w, dt_w, mask_w,
    gw0, sigma_g: float, sigma_a: float,
) -> VioInit:
    """Post-relocalization bias + NavState recompute
    (Tracking::RecomputeIMUBiasAndCurrentNavstate, src/Tracking.cc:548-684,
    VIORBSLAM IV-E): the same gyro-bias GN + re-preintegration + linear
    accel-bias/velocity solve as VI init, but over the ~20 frames tracked
    since relocalization and with the gravity vector KEPT from the
    original initialization (scale is known, gravity already converged —
    only bg, ba, and velocities are unknowns)."""
    from ..math.preintegration import preintegrate_imu

    dtype = p_wc.dtype
    Rcb = jnp.asarray(Rcb, dtype)
    tcb = jnp.asarray(tcb, dtype)
    R_wc = jnp.asarray(R_wc, dtype)
    Rbc = jnp.swapaxes(Rcb, -1, -2)
    pcb = -jnp.einsum("ij,j->i", Rbc, tcb)
    R_wb = R_wc @ jnp.broadcast_to(Rcb, R_wc.shape)

    zeros3 = jnp.zeros(3, dtype)
    pre0 = jax.vmap(
        lambda g, a, d, m: preintegrate_imu(
            g, a, d, zeros3, zeros3, sigma_g, sigma_a, mask=m)
    )(gyro_w, acc_w, dt_w, mask_w)
    bg = solve_gyro_bias(R_wb, pre0)
    pre1 = jax.vmap(
        lambda g, a, d, m: preintegrate_imu(
            g, a, d, bg, zeros3, sigma_g, sigma_a, mask=m)
    )(gyro_w, acc_w, dt_w, mask_w)
    _, gw, ba, v, cond = refine_with_gravity_mag(
        t_kf, R_wb, p_wc, R_wc, pcb, pre1, jnp.asarray(gw0, dtype),
        solve_scale=False)
    return VioInit(bg=bg, ba=ba, scale=jnp.asarray(1.0, dtype), gw=gw,
                   v=v, cond=cond)
