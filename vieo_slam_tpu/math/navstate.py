"""NavState: the 15D navigation state used by the VIO backend.

TPU-native equivalent of `src/Odom/NavState.h` in the reference: the state is
{Rwb in SO(3), pwb, vwb, bg + dbg, ba + dba} with a manifold retraction
`inc_small` matching the reference's `IncSmall` with USE_P_PLUS_RDP
(NavState.h:8): position is updated right-disturbance style, p <- p + R @ dp.

Represented as a NamedTuple pytree of arrays so it can carry arbitrary
leading batch dimensions (one NavState per keyframe in the backend windows)
and pass through jit/vmap/scan untouched.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import lie


class NavState(NamedTuple):
    """Batched navigation state.

    R:  [..., 3, 3] world-from-body rotation (Rwb)
    p:  [..., 3]    body position in world (pwb)
    v:  [..., 3]    body velocity in world (vwb)
    bg: [..., 3]    gyroscope bias linearization point
    ba: [..., 3]    accelerometer bias linearization point
    dbg:[..., 3]    gyro bias delta (optimized increment on top of bg)
    dba:[..., 3]    accel bias delta
    """

    R: jax.Array
    p: jax.Array
    v: jax.Array
    bg: jax.Array
    ba: jax.Array
    dbg: jax.Array
    dba: jax.Array

    @staticmethod
    def identity(batch_shape=(), dtype=jnp.float32) -> "NavState":
        z3 = jnp.zeros(batch_shape + (3,), dtype)
        return NavState(
            R=jnp.broadcast_to(jnp.eye(3, dtype=dtype), batch_shape + (3, 3)),
            p=z3, v=z3, bg=z3, ba=z3, dbg=z3, dba=z3,
        )

    @property
    def bg_full(self) -> jax.Array:
        return self.bg + self.dbg

    @property
    def ba_full(self) -> jax.Array:
        return self.ba + self.dba

    def inc_small(self, dx: jax.Array) -> "NavState":
        """Retraction for the 9D (PR V) tangent [dp, dphi, dv].

        Matches NavState::IncSmall (NavState.h:27-56) with USE_P_PLUS_RDP:
          p <- p + R dp ; R <- R Exp(dphi) ; v <- v + dv
        """
        dp, dphi, dv = dx[..., 0:3], dx[..., 3:6], dx[..., 6:9]
        return self._replace(
            p=self.p + jnp.einsum("...ij,...j->...i", self.R, dp),
            R=self.R @ lie.so3_exp(dphi),
            v=self.v + dv,
        )

    def inc_bias(self, dbias: jax.Array) -> "NavState":
        """6D bias-delta increment [dbg, dba] (NavState::IncSmallBias)."""
        return self._replace(
            dbg=self.dbg + dbias[..., 0:3],
            dba=self.dba + dbias[..., 3:6],
        )

    def inc_pvr_bias(self, dx: jax.Array) -> "NavState":
        """Full 15D increment [dp, dv, dphi, dbg, dba] (PVR + bias order)."""
        dp, dv, dphi = dx[..., 0:3], dx[..., 3:6], dx[..., 6:9]
        out = self._replace(
            p=self.p + jnp.einsum("...ij,...j->...i", self.R, dp),
            v=self.v + dv,
            R=self.R @ lie.so3_exp(dphi),
        )
        return out.inc_bias(dx[..., 9:15])


def tcw_from_navstate(ns: NavState, Rcb: jax.Array, tcb: jax.Array):
    """Camera-from-world pose from a NavState given the camera-from-body
    extrinsic Tcb (Frame::UpdatePoseFromNS, Frame.h:43).

    Tcw = Tcb * Tbw;  Rbw = Rwb^T, tbw = -Rbw pwb.
    """
    Rbw = jnp.swapaxes(ns.R, -1, -2)
    tbw = -jnp.einsum("...ij,...j->...i", Rbw, ns.p)
    Rcw = Rcb @ Rbw
    tcw = jnp.einsum("...ij,...j->...i", Rcb, tbw) + tcb
    return Rcw, tcw


def navstate_from_tcw(Rcw, tcw, Rcb, tcb, v=None):
    """Inverse of tcw_from_navstate (Frame::UpdateNavStatePVRFromTcw)."""
    Rbc = jnp.swapaxes(Rcb, -1, -2)
    tbc = -jnp.einsum("...ij,...j->...i", Rbc, tcb)
    # Twb = Twc * Tcb^-1 ; Twc = Tcw^-1
    Rwc = jnp.swapaxes(Rcw, -1, -2)
    twc = -jnp.einsum("...ij,...j->...i", Rwc, tcw)
    Rwb = Rwc @ Rbc
    pwb = jnp.einsum("...ij,...j->...i", Rwc, tbc) + twc
    if v is None:
        v = jnp.zeros_like(pwb)
    z = jnp.zeros_like(pwb)
    return NavState(R=Rwb, p=pwb, v=v, bg=z, ba=z, dbg=z, dba=z)
