"""IMU / encoder / prior factor residuals on NavState pairs.

TPU-native equivalent of src/Odom/g2otypes.{h,cpp}: EdgeNavStateI (the
PRV/PVR preintegration edge, g2otypes.h:704, error :726), EdgeNavStateBias
(bias random walk, :895), EdgeEncNavState (:590), and the 15D prior edges
EdgeNavStatePriorPRVBias (:908).

Residual conventions (PRV order = eP, eR, eV to match the reference's
information matrices):

  eR = Log( (dR Exp(Jg_R dbg))^T R_i^T R_j )
  eV = R_i^T (v_j - v_i - g dt)            - (dv + Jg_v dbg + Ja_v dba)
  eP = R_i^T (p_j - p_i - v_i dt - .5 g dt^2) - (dp + Jg_p dbg + Ja_p dba)

Jacobians are obtained by forward-mode autodiff on the 15D tangent
increments of each state (inc via NavState.inc_pvr_bias) — exact, and
cheap at these dimensions; the reference's hand-derived Jacobians
(g2otypes.h:772+) exist because C++ lacks the transform.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..math import lie
from ..math.navstate import NavState
from ..math.preintegration import EncPreint, ImuPreint

GRAVITY = np.asarray([0.0, 0.0, -9.81], np.float32)


def imu_residual_prv(ns_i: NavState, ns_j: NavState, pre: ImuPreint,
                     gravity=GRAVITY) -> jax.Array:
    """9D preintegration residual [eP, eR, eV] (EdgeNavStatePRV error)."""
    g = jnp.asarray(gravity, ns_i.p.dtype)
    dt = pre.dt
    dbg = ns_i.bg + ns_i.dbg - pre.bg
    dba = ns_i.ba + ns_i.dba - pre.ba
    dR_c, dv_c, dp_c = pre.corrected(dbg, dba)
    Ri_T = jnp.swapaxes(ns_i.R, -1, -2)
    eR = lie.so3_log(jnp.swapaxes(dR_c, -1, -2) @ Ri_T @ ns_j.R)
    eV = Ri_T @ (ns_j.v - ns_i.v - g * dt) - dv_c
    eP = Ri_T @ (ns_j.p - ns_i.p - ns_i.v * dt - 0.5 * g * dt * dt) - dp_c
    return jnp.concatenate([eP, eR, eV], axis=-1)


def bias_rw_residual(ns_i: NavState, ns_j: NavState) -> jax.Array:
    """6D bias random-walk residual (EdgeNavStateBias): full bias
    difference between consecutive states."""
    ebg = (ns_j.bg + ns_j.dbg) - (ns_i.bg + ns_i.dbg)
    eba = (ns_j.ba + ns_j.dba) - (ns_i.ba + ns_i.dba)
    return jnp.concatenate([ebg, eba], axis=-1)


def bias_rw_info(sigma_bg_rw, sigma_ba_rw, dt, dtype=jnp.float32):
    """Information of the bias RW over dt (reference scales by 1/dt,
    IMUDataBase covariance usage)."""
    dt = jnp.maximum(dt, 1e-6)
    ig = 1.0 / (sigma_bg_rw ** 2 * dt)
    ia = 1.0 / (sigma_ba_rw ** 2 * dt)
    d = jnp.concatenate([jnp.full((3,), ig), jnp.full((3,), ia)])
    return jnp.diag(d.astype(dtype))


def encoder_residual(ns_i: NavState, ns_j: NavState, pre: EncPreint,
                     Rbe: jax.Array, tbe: jax.Array) -> jax.Array:
    """6D encoder residual [ePhi, eP] (EdgeEncNavState semantics).

    The encoder measures the SE(2) motion of the encoder frame E;
    Tbe = body-from-encoder extrinsic. Predicted delta:
      T_ei_ej = T_be^-1 T_bi_w T_w_bj T_be
    """
    Reb = jnp.swapaxes(Rbe, -1, -2)
    Rij = jnp.swapaxes(ns_i.R, -1, -2) @ ns_j.R          # body i<-j
    pij = jnp.swapaxes(ns_i.R, -1, -2) @ (ns_j.p - ns_i.p)
    R_e = Reb @ Rij @ Rbe
    p_e = Reb @ (Rij @ tbe + pij - tbe)
    ePhi = lie.so3_log(jnp.swapaxes(pre.dR, -1, -2) @ R_e)
    eP = p_e - pre.dp
    return jnp.concatenate([ePhi, eP], axis=-1)


def prior_residual(ns: NavState, ns_prior: NavState) -> jax.Array:
    """15D prior residual [eP, eV, eR, ebg, eba] (PVR+bias ordering of
    EdgeNavStatePriorPVRBias) between a state and its marginal prior."""
    Rp_T = jnp.swapaxes(ns_prior.R, -1, -2)
    eP = Rp_T @ (ns.p - ns_prior.p)
    eV = ns.v - ns_prior.v
    eR = lie.so3_log(Rp_T @ ns.R)
    ebg = (ns.bg + ns.dbg) - (ns_prior.bg + ns_prior.dbg)
    eba = (ns.ba + ns.dba) - (ns_prior.ba + ns_prior.dba)
    return jnp.concatenate([eP, eV, eR, ebg, eba], axis=-1)


def reorder_prv_to_internal(info_prv: jax.Array) -> jax.Array:
    """(eP,eR,eV) info — identity helper kept for call-site clarity."""
    return info_prv


def imu_info_prv(pre: ImuPreint, *, eps: float = 1e-8) -> jax.Array:
    """Information = pseudo-inverse of the (P,R,V)-ordered covariance with
    symmetric regularization (the reference runs the same through its
    kRatioIMUSigma scaling; config.h:26-30)."""
    cov = pre.cov_prv
    cov = 0.5 * (cov + jnp.swapaxes(cov, -1, -2))
    cov = cov + eps * jnp.eye(9, dtype=cov.dtype)
    return jnp.linalg.inv(cov)
