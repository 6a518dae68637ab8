"""On-manifold IMU and wheel-encoder preintegration as `lax.scan` programs.

TPU-native equivalent of `src/Odom/OdomPreIntegrator.{h,cpp}`:
  - IMUPreIntegratorBase::PreIntegration/update (OdomPreIntegrator.h:227/432):
    midpoint integration of {dR, dv, dp}, 9x9 covariance, bias Jacobians
    Jg (dR, dv, dp wrt gyro bias) and Ja (dv, dp wrt accel bias).
  - EncPreIntegrator::PreIntegration (OdomPreIntegrator.cpp:22):
    differential-drive SE(2) integration lifted to a 6D {dphi, dp} delta with
    a 6x6 covariance.

Design differences from the reference (deliberate, TPU-first):
  - The reference integrates sample-by-sample inside a mutexed std::list;
    here a measurement window is a fixed-capacity padded array and the whole
    integration is one `lax.scan` (compiled once, re-used for every window).
  - Padding is expressed with a per-sample validity mask; masked samples
    integrate with dt = 0, which is an exact no-op for every quantity.
  - Everything carries arbitrary leading batch dims via vmap (e.g. one
    preintegration per keyframe pair when the VI initializer re-integrates
    after a bias update — the reference loops; we vmap).

Covariance state ordering is (phi, v, p) internally; accessors convert to the
reference's PRV = (p, R, v) and PVR = (p, v, R) orderings used by the edges
(g2otypes.h: EdgeNavStatePRV / EdgeNavStatePVR).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import lie


class ImuPreint(NamedTuple):
    """Result of IMU preintegration over a window [i, j].

    dR:   [..., 3, 3]  Delta rotation  R_i^b -> b_j  (body_i from body_j)
    dv:   [..., 3]     Delta velocity (in body_i frame)
    dp:   [..., 3]     Delta position (in body_i frame)
    cov:  [..., 9, 9]  covariance, (phi, v, p) ordering
    Jg_R: [..., 3, 3]  d(dR)/d(bg)
    Jg_v: [..., 3, 3]  d(dv)/d(bg)
    Ja_v: [..., 3, 3]  d(dv)/d(ba)
    Jg_p: [..., 3, 3]  d(dp)/d(bg)
    Ja_p: [..., 3, 3]  d(dp)/d(ba)
    dt:   [...]        total integrated time
    bg:   [..., 3]     gyro bias linearization point used
    ba:   [..., 3]     accel bias linearization point used
    """

    dR: jax.Array
    dv: jax.Array
    dp: jax.Array
    cov: jax.Array
    Jg_R: jax.Array
    Jg_v: jax.Array
    Ja_v: jax.Array
    Jg_p: jax.Array
    Ja_p: jax.Array
    dt: jax.Array
    bg: jax.Array
    ba: jax.Array

    @property
    def cov_prv(self) -> jax.Array:
        """Reorder covariance to the reference's PRV = (p, phi, v) order
        (used by EdgeNavStatePRV, g2otypes.h:704 with NV=5)."""
        return _reorder_cov(self.cov, (2, 0, 1))

    @property
    def cov_pvr(self) -> jax.Array:
        """PVR = (p, v, phi) order (EdgeNavStatePVR)."""
        return _reorder_cov(self.cov, (2, 1, 0))

    def corrected(self, dbg: jax.Array, dba: jax.Array):
        """First-order bias-corrected deltas (dR', dv', dp').

        Matches the correction terms used when evaluating IMU edges
        (g2otypes.cpp EdgeNavStateI::computeError):
          dR' = dR Exp(Jg_R dbg), dv' = dv + Jg_v dbg + Ja_v dba, ...
        """
        dR = self.dR @ lie.so3_exp(jnp.einsum("...ij,...j->...i", self.Jg_R, dbg))
        dv = self.dv + jnp.einsum("...ij,...j->...i", self.Jg_v, dbg) + jnp.einsum(
            "...ij,...j->...i", self.Ja_v, dba
        )
        dp = self.dp + jnp.einsum("...ij,...j->...i", self.Jg_p, dbg) + jnp.einsum(
            "...ij,...j->...i", self.Ja_p, dba
        )
        return dR, dv, dp


def _reorder_cov(cov: jax.Array, block_order) -> jax.Array:
    idx = jnp.concatenate(
        [jnp.arange(3) + 3 * b for b in block_order]
    )
    return cov[..., idx, :][..., :, idx]


def preintegrate_imu(
    gyro: jax.Array,
    acc: jax.Array,
    dt: jax.Array,
    bg: jax.Array,
    ba: jax.Array,
    sigma_g: jax.Array | float,
    sigma_a: jax.Array | float,
    *,
    mask: jax.Array | None = None,
    integrate_midpoint: bool = True,
) -> ImuPreint:
    """Preintegrate a window of IMU samples.

    Args:
      gyro: [T, 3] angular velocity samples (rad/s), body frame.
      acc:  [T, 3] specific-force samples (m/s^2), body frame.
      dt:   [T] per-sample integration interval; the k-th sample is applied
            over dt[k]. Padded samples must carry dt == 0 (or use `mask`).
      bg, ba: [3] bias linearization points.
      sigma_g, sigma_a: continuous-time noise densities (rad/s/sqrt(Hz),
            m/s^2/sqrt(Hz)); per-sample discrete covariance is sigma^2 / dt,
            matching the reference's default (IMUDataBase covariance setup,
            OdomData.h:22-128 with dt_cov scaling).
      mask: [T] optional bool validity; False rows are no-ops.
      integrate_midpoint: average consecutive samples (k, k+1) like the
            reference's midpoint scheme (OdomPreIntegrator.h:432+); when
            False, uses the k-th sample over the whole interval.

    Returns an ImuPreint (scalar batch).
    """
    dtype = gyro.dtype
    if mask is not None:
        dt = jnp.where(mask, dt, 0.0)
    if integrate_midpoint:
        # Midpoint: pair sample k with k+1 (last sample pairs with itself).
        gyro_next = jnp.concatenate([gyro[1:], gyro[-1:]], axis=0)
        acc_next = jnp.concatenate([acc[1:], acc[-1:]], axis=0)
        if mask is not None:
            # Do not average into padded neighbours.
            m_next = jnp.concatenate([mask[1:], mask[-1:]], axis=0)[:, None]
            gyro_next = jnp.where(m_next, gyro_next, gyro)
            acc_next = jnp.where(m_next, acc_next, acc)
        gyro_mid = 0.5 * (gyro + gyro_next)
        acc_mid = 0.5 * (acc + acc_next)
    else:
        gyro_mid, acc_mid = gyro, acc

    w = gyro_mid - bg[None, :]
    a = acc_mid - ba[None, :]

    sigma_g = jnp.asarray(sigma_g, dtype)
    sigma_a = jnp.asarray(sigma_a, dtype)

    class Carry(NamedTuple):
        dR: jax.Array
        dv: jax.Array
        dp: jax.Array
        cov: jax.Array
        Jg_R: jax.Array
        Jg_v: jax.Array
        Ja_v: jax.Array
        Jg_p: jax.Array
        Ja_p: jax.Array
        t: jax.Array

    eye3 = jnp.eye(3, dtype=dtype)
    zero3 = jnp.zeros((3, 3), dtype=dtype)
    init = Carry(
        dR=eye3, dv=jnp.zeros(3, dtype), dp=jnp.zeros(3, dtype),
        cov=jnp.zeros((9, 9), dtype),
        Jg_R=zero3, Jg_v=zero3, Ja_v=zero3, Jg_p=zero3, Ja_p=zero3,
        t=jnp.zeros((), dtype),
    )

    def step(c: Carry, x):
        w_k, a_k, dt_k = x
        # f64 inputs (timestamps / sensor streams) would promote the
        # A/cov scatter updates under jax_enable_x64 (a hard error in
        # future JAX); integrate in the carry dtype.
        w_k = w_k.astype(dtype)
        a_k = a_k.astype(dtype)
        dt_k = dt_k.astype(dtype)
        dR_k = lie.so3_exp(w_k * dt_k)
        Jr_k = lie.so3_jr(w_k * dt_k)
        Ra = c.dR @ hat_a(a_k)
        dt2 = dt_k * dt_k

        # State update (order matters: p uses old v/R; v uses old R).
        dp = c.dp + c.dv * dt_k + 0.5 * (c.dR @ a_k) * dt2
        dv = c.dv + (c.dR @ a_k) * dt_k
        dR = c.dR @ dR_k

        # Bias Jacobians (Forster et al. / VIORBSLAM eq. set; reference
        # OdomPreIntegrator.h update of _J_g/_J_a blocks).
        Jg_p = c.Jg_p + c.Jg_v * dt_k - 0.5 * Ra @ c.Jg_R * dt2
        Ja_p = c.Ja_p + c.Ja_v * dt_k - 0.5 * c.dR * dt2
        Jg_v = c.Jg_v - Ra @ c.Jg_R * dt_k
        Ja_v = c.Ja_v - c.dR * dt_k
        Jg_R = dR_k.T @ c.Jg_R - Jr_k * dt_k

        # Covariance propagation, (phi, v, p) ordering.
        A = jnp.zeros((9, 9), dtype)
        A = A.at[0:3, 0:3].set(dR_k.T)
        A = A.at[3:6, 0:3].set(-Ra * dt_k)
        A = A.at[3:6, 3:6].set(eye3)
        A = A.at[6:9, 0:3].set(-0.5 * Ra * dt2)
        A = A.at[6:9, 3:6].set(eye3 * dt_k)
        A = A.at[6:9, 6:9].set(eye3)
        # Discrete sample noise: sigma^2 / dt (guard dt == 0 padding).
        inv_dt = jnp.where(dt_k > 0, 1.0 / jnp.maximum(dt_k, 1e-12), 0.0)
        sg2 = sigma_g * sigma_g * inv_dt
        sa2 = sigma_a * sigma_a * inv_dt
        Bg = Jr_k * dt_k                  # phi <- gyro noise
        Bv = c.dR * dt_k                  # v   <- acc noise
        Bp = 0.5 * c.dR * dt2             # p   <- acc noise
        cov = A @ c.cov @ A.T
        cov = cov.at[0:3, 0:3].add(sg2 * (Bg @ Bg.T))
        cov = cov.at[3:6, 3:6].add(sa2 * (Bv @ Bv.T))
        cov = cov.at[6:9, 6:9].add(sa2 * (Bp @ Bp.T))
        cov = cov.at[3:6, 6:9].add(sa2 * (Bv @ Bp.T))
        cov = cov.at[6:9, 3:6].add(sa2 * (Bp @ Bv.T))

        out = Carry(dR, dv, dp, cov, Jg_R, Jg_v, Ja_v, Jg_p, Ja_p,
                    c.t + dt_k)
        # dtype-stable under jax_enable_x64.
        return jax.tree.map(lambda x_, ref: x_.astype(ref.dtype), out, c), \
            None

    def hat_a(a_k):
        return lie.hat(a_k)

    final, _ = jax.lax.scan(step, init, (w, a, dt))
    return ImuPreint(
        dR=final.dR, dv=final.dv, dp=final.dp, cov=final.cov,
        Jg_R=final.Jg_R, Jg_v=final.Jg_v, Ja_v=final.Ja_v,
        Jg_p=final.Jg_p, Ja_p=final.Ja_p, dt=final.t, bg=bg, ba=ba,
    )


class EncPreint(NamedTuple):
    """Differential-drive encoder preintegration result (6D delta).

    dR:  [..., 3, 3]  yaw-only delta rotation in the encoder frame
    dp:  [..., 3]     planar delta position (z = 0) in the encoder frame
    cov: [..., 6, 6]  covariance of (phi, p)
    dt:  [...]        total time
    """

    dR: jax.Array
    dp: jax.Array
    cov: jax.Array
    dt: jax.Array


def preintegrate_encoder(
    v_left: jax.Array,
    v_right: jax.Array,
    dt: jax.Array,
    half_track: jax.Array | float,
    sigma_v: jax.Array | float,
    *,
    sigma_eta: float = 1e-4,
    mask: jax.Array | None = None,
) -> EncPreint:
    """Preintegrate wheel-speed samples into a 6D {dphi, dp} delta.

    Mirrors EncPreIntegrator::PreIntegration (OdomPreIntegrator.cpp:22):
    differential-drive kinematics v = (vl + vr)/2, w = (vr - vl)/(2 rc),
    integrated on SE(2) and embedded into 3D (rotation about z, motion in
    the x-y plane of the encoder frame).

    Args:
      v_left, v_right: [T] wheel linear velocities (m/s, already scaled).
      dt: [T] per-sample intervals (0 for padding).
      half_track: rc, half the wheel distance (Encoder.rc in the yaml).
      sigma_v: wheel-speed noise density.
      sigma_eta: small regularizing noise on the out-of-plane dims so the
        6x6 covariance is invertible (the reference adds plane-constraint
        noise similarly through its eta terms).
      mask: [T] optional validity mask.
    """
    dtype = v_left.dtype
    if mask is not None:
        dt = jnp.where(mask, dt, 0.0)
    half_track = jnp.asarray(half_track, dtype)
    sigma_v = jnp.asarray(sigma_v, dtype)

    v = 0.5 * (v_left + v_right)
    w = (v_right - v_left) / (2.0 * half_track)

    def step(carry, x):
        theta, px, py, cov, t = carry
        v_k, w_k, dt_k = x
        # Midpoint heading for the translation update.
        theta_mid = theta + 0.5 * w_k * dt_k
        c, s = jnp.cos(theta_mid), jnp.sin(theta_mid)
        px_n = px + v_k * c * dt_k
        py_n = py + v_k * s * dt_k
        theta_n = theta + w_k * dt_k

        # 3x3 SE(2) covariance (theta, x, y) propagation.
        F = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]],
                      dtype=dtype)
        F = F.at[1, 0].set(-v_k * s * dt_k)
        F = F.at[2, 0].set(v_k * c * dt_k)
        # Noise enters via vl, vr: v = (vl+vr)/2, w = (vr-vl)/(2rc).
        # d(theta)/d(vl,vr) = (-1, 1) dt/(2rc); d(x)/d(vl,vr) = (c, c) dt/2...
        G = jnp.stack(
            [
                jnp.stack([-dt_k / (2 * half_track), dt_k / (2 * half_track)]),
                jnp.stack([0.5 * c * dt_k, 0.5 * c * dt_k]),
                jnp.stack([0.5 * s * dt_k, 0.5 * s * dt_k]),
            ]
        )
        inv_dt = jnp.where(dt_k > 0, 1.0 / jnp.maximum(dt_k, 1e-12), 0.0)
        q = sigma_v * sigma_v * inv_dt
        cov_n = F @ cov @ F.T + q * (G @ G.T)
        return (theta_n, px_n, py_n, cov_n, t + dt_k), None

    init = (
        jnp.zeros((), dtype), jnp.zeros((), dtype), jnp.zeros((), dtype),
        jnp.zeros((3, 3), dtype), jnp.zeros((), dtype),
    )
    (theta, px, py, cov2, total_t), _ = jax.lax.scan(step, init, (v, w, dt))

    c, s = jnp.cos(theta), jnp.sin(theta)
    zero = jnp.zeros_like(theta)
    one = jnp.ones_like(theta)
    dR = jnp.stack(
        [
            jnp.stack([c, -s, zero], axis=-1),
            jnp.stack([s, c, zero], axis=-1),
            jnp.stack([zero, zero, one], axis=-1),
        ],
        axis=-2,
    )
    dp = jnp.stack([px, py, zero], axis=-1)

    # Lift (theta, x, y) cov into 6x6 (phi, p) with plane-regularization.
    cov6 = jnp.zeros((6, 6), dtype)
    cov6 = cov6.at[2, 2].set(cov2[0, 0])          # phi_z
    cov6 = cov6.at[3:5, 3:5].set(cov2[1:3, 1:3])  # x, y
    cov6 = cov6.at[2, 3:5].set(cov2[0, 1:3])
    cov6 = cov6.at[3:5, 2].set(cov2[1:3, 0])
    reg = jnp.asarray(sigma_eta, dtype) ** 2 * (1.0 + total_t)
    cov6 = cov6.at[0, 0].add(reg)  # phi_x
    cov6 = cov6.at[1, 1].add(reg)  # phi_y
    cov6 = cov6.at[5, 5].add(reg)  # z
    return EncPreint(dR=dR, dp=dp, cov=cov6, dt=total_t)
