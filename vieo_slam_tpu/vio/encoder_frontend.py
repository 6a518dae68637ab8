"""VEO frontend: wheel-encoder-fused tracking without an IMU.

The reference supports a pure vision+encoder mode (mode ENCODER in
Tracking::CacheOdom, src/Tracking.cc:31-72): the encoder provides the
motion prediction (GetVelocityByEnc :218), carries the pose through
visual dropouts (TrackWithOnlyOdom :79 → ODOMOK), and contributes an
SE(2)-preintegrated relative-pose factor to the optimization
(EdgeEncNavState, src/Odom/g2otypes.h:590).  Unlike VIO there is no
initialization phase — wheel odometry is metric and gravity-free, so
fusion is active from the first tracked frame.

TPU-native shape: the encoder ring feeds the jitted SE(2) preintegration
scan (math/preintegration.preintegrate_encoder); the per-frame fusion is
one jitted vision+prior motion BA (solvers/motion_ba.
pose_optimization_with_prior) where the wheel delta enters as a 6D pose
prior with information from the preintegrated covariance.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..math.lie import normalize_rotation_np
from ..math.preintegration import preintegrate_encoder
from ..native import OdomRing
from ..solvers.motion_ba import PoseObs, pose_optimization_with_prior
from ..system import System


@functools.partial(jax.jit, static_argnames=("rounds", "iters"))
def _enc_fused_solve(R0, t0, obs, cam, bf, R_prior, t_prior, prior_info,
                     rounds=2, iters=4):
    return pose_optimization_with_prior(
        R0, t0, obs, cam, bf, R_prior, t_prior, prior_info,
        rounds=rounds, iters_per_round=iters)


@dataclasses.dataclass
class EncoderConfig:
    enc_half_track: float = 0.28     # Encoder.rc
    enc_sigma_v: float = 0.01        # wheel-speed noise density
    window_cap: int = 64             # samples per frame gap
    # body-from-encoder extrinsic Tbe (Camera.Tce in the reference yaml)
    enc_Rbe: object = None
    enc_tbe: object = None
    fuse: bool = True                # joint vision+encoder motion solve
    # floor on the per-axis prior std (residual extrinsic/kinematic
    # model error: wheel slip, track-width error) so a near-noiseless
    # preintegration can't out-vote vision
    min_sigma_rot: float = 2e-3      # rad
    min_sigma_trans: float = 2e-3    # m
    # sensor-timing robustness: delay-poll (Camera.delayForPolling,
    # Tracking.cc:966-981) + ZOH tail fill for late wheel packets
    delay_for_polling: float = 0.02
    odom_gap_tol: float = 0.02
    # Full anisotropic transport of the 6x6 preintegrated SE(2)
    # covariance into the camera tangent (the reference's EdgeEncNavState
    # uses the full information matrix, src/Odom/g2otypes.h:591).  A
    # differential drive is precisely anisotropic — tight lateral/yaw,
    # loose longitudinal under wheel slip — and the round-3 worst-axis
    # isotropic collapse threw away the encoder's best constraint.
    # False restores the isotropic collapse (A/B + regression tests).
    full_cov: bool = True


class EncoderFrontend:
    """System wrapper adding wheel-encoder fusion (VEO, no IMU)."""

    def __init__(self, system: System, Rcb=None, tcb=None,
                 cfg: Optional[EncoderConfig] = None):
        self.sys = system
        self.cfg = cfg or EncoderConfig()
        self.Rcb = np.eye(3, dtype=np.float32) if Rcb is None else \
            np.asarray(Rcb, np.float32)
        self.tcb = np.zeros(3, np.float32) if tcb is None else \
            np.asarray(tcb, np.float32)
        self.Rbe = np.eye(3, dtype=np.float32) \
            if self.cfg.enc_Rbe is None \
            else np.asarray(self.cfg.enc_Rbe, np.float32)
        self.tbe = np.zeros(3, np.float32) \
            if self.cfg.enc_tbe is None \
            else np.asarray(self.cfg.enc_tbe, np.float32)
        self.enc_ring = OdomRing(1 << 14)
        self.last_t: Optional[float] = None
        self._last_body: Optional[tuple] = None   # (R_wb, p_wb)
        self._pred: Optional[tuple] = None        # (Rcw, tcw, info6)

    # ------------------------------------------------------------------

    def track_encoder(self, t: float, v_left: float, v_right: float):
        """System::TrackOdom, mode ENCODER (Tracking::CacheOdom)."""
        v = np.zeros(6, np.float32)
        v[0], v[1] = v_left, v_right
        self.enc_ring.push(t, v)

    # ------------------------------------------------------------------

    def _body_from_tracker(self):
        """Current body pose from the tracker's camera pose:
        T_wb = T_wc ∘ T_cb."""
        tr = self.sys.tracker
        Rwc = tr.Rcw.T
        twc = -Rwc @ tr.tcw
        R_wb = Rwc @ self.Rcb
        p_wb = Rwc @ self.tcb + twc
        return R_wb.astype(np.float32), p_wb.astype(np.float32)

    def _predict(self, t0: float, t1: float):
        """Encoder dead-reckoning T_w_bj = T_w_bi · T_be · ΔT_e · T_be⁻¹
        (GetVelocityByEnc) plus the prior information for the fusion
        solve.  Returns (Rcw_pred, tcw_pred, info6) or None."""
        from ..utils.metrics import metrics

        if not self.enc_ring.wait_until(
                t1 - self.cfg.odom_gap_tol, self.cfg.delay_for_polling):
            metrics.count("enc_poll_timeout")
        ev, edts, emask, n, lag = self.enc_ring.window_filled(
            t0, t1, self.cfg.window_cap, tail_tol=self.cfg.odom_gap_tol)
        if lag > 0:
            metrics.count("enc_window_zoh_filled")
        if n == 0 or n > self.cfg.window_cap:
            return None
        enc = preintegrate_encoder(
            jnp.asarray(ev[:, 0]), jnp.asarray(ev[:, 1]),
            jnp.asarray(edts), self.cfg.enc_half_track,
            self.cfg.enc_sigma_v, mask=jnp.asarray(emask))
        dR_e = np.asarray(enc.dR)
        dp_e = np.asarray(enc.dp)
        cov = np.asarray(enc.cov)            # 6x6, (phi, p) order
        R_i, p_i = self._last_body
        Rbe, tbe = self.Rbe, self.tbe
        R_j = R_i @ Rbe @ dR_e @ Rbe.T
        p_j = p_i + R_i @ (tbe + Rbe @ dp_e) - R_j @ tbe
        # camera pose: Tcw = T_cb ∘ T_bw
        R_bw = R_j.T
        Rcw = self.Rcb @ R_bw
        tcw = -Rcw @ p_j + self.tcb
        if self.cfg.full_cov:
            # Full anisotropic transport (EdgeEncNavState semantics,
            # g2otypes.h:591).  The delta's (phi, p) covariance lives in
            # the tangent at the interval-start encoder frame E_i; a
            # left perturbation xi of the delta maps to the camera-left
            # tangent (the prior residual's frame, r = log(Tcw∘Tp^-1))
            # as delta = -Ad_{T_cj_ei} xi, so
            #   Sigma_c = Ad_{T_cj_ei} Sigma_xi Ad^T,
            # with T_cj_ei = Tcw_j ∘ T_w_bi ∘ T_be.  The model-error
            # floor (slip, track-width, extrinsic error) is ADDED as a
            # per-axis variance lower bound, not a replacement — the
            # plane constraint and the tight lateral/yaw axes survive.
            Pm = np.zeros((6, 6), np.float64)  # (phi,p) -> (rho,phi)
            Pm[:3, :3] = cov[3:, 3:]
            Pm[:3, 3:] = cov[3:, :3]
            Pm[3:, :3] = cov[:3, 3:]
            Pm[3:, 3:] = cov[:3, :3]
            R_wei = R_i @ Rbe
            p_wei = p_i + R_i @ tbe
            R_ce = Rcw @ R_wei
            t_ce = Rcw @ p_wei + tcw
            hat_t = np.array([[0, -t_ce[2], t_ce[1]],
                              [t_ce[2], 0, -t_ce[0]],
                              [-t_ce[1], t_ce[0], 0]], np.float64)
            Ad = np.zeros((6, 6), np.float64)
            Ad[:3, :3] = R_ce
            Ad[3:, 3:] = R_ce
            Ad[:3, 3:] = hat_t @ R_ce
            Sig = Ad @ Pm @ Ad.T
            Sig[:3, :3] += np.eye(3) * self.cfg.min_sigma_trans ** 2
            Sig[3:, 3:] += np.eye(3) * self.cfg.min_sigma_rot ** 2
            info = np.linalg.inv(Sig).astype(np.float32)
            # symmetrize against inversion round-off
            info = 0.5 * (info + info.T)
        else:
            # Round-3 conservative collapse: per-block worst axis + the
            # floor as a replacement — kept for A/B; discards the
            # anisotropy (see EncoderConfig.full_cov).
            var_phi = max(float(np.max(np.diag(cov[:3, :3]))),
                          self.cfg.min_sigma_rot ** 2)
            var_p = max(float(np.max(np.diag(cov[3:, 3:]))),
                        self.cfg.min_sigma_trans ** 2)
            info = np.diag(np.concatenate([
                np.full(3, 1.0 / var_p), np.full(3, 1.0 / var_phi)])
            ).astype(np.float32)
        return (normalize_rotation_np(Rcw).astype(np.float32),
                tcw.astype(np.float32), info)

    # ------------------------------------------------------------------

    def track_frame(self, frame):
        t = float(frame.timestamp)
        tr = self.sys.tracker
        self._pred = None
        if self.last_t is not None and self._last_body is not None:
            pred = self._predict(self.last_t, t)
            if pred is not None:
                Rcw_p, tcw_p, info = pred
                tr.external_prediction = (Rcw_p, tcw_p)
                self._pred = pred

        state = self.sys.track_frame(frame)

        if state.name == "OK" and self.cfg.fuse and self._pred is not None:
            self._fuse(frame)
        if state.name in ("OK", "ODOMOK"):
            self._last_body = self._body_from_tracker()
            self._store_kf_navstate()
        self.last_t = t
        return state

    def _fuse(self, frame):
        """Joint vision + encoder motion solve (the reference's
        PoseOptimization with the encoder edge): re-solve the current
        pose over the tracker's matched observations with the wheel
        delta as an SE3 prior, then adopt the fused pose."""
        tr = self.sys.tracker
        res = tr.last_result
        if res is None or tr.last_slab is None:
            return
        pw, lm_ids = tr.last_slab
        match = np.asarray(res.lm_match)
        inl = np.asarray(res.inlier)
        kp = np.clip(match, 0, None)
        obs = PoseObs(
            pw=jnp.asarray(pw),
            uv=jnp.asarray(np.asarray(frame.uv)[kp]),
            ur=jnp.asarray(np.asarray(frame.ur)[kp]),
            inv_sigma2=jnp.asarray(self.sys.map.inv_sigma2[
                np.clip(np.asarray(frame.level)[kp], 0, None)]),
            valid=jnp.asarray((match >= 0) & inl),
        )
        Rcw_p, tcw_p, info = self._pred
        out = _enc_fused_solve(
            jnp.asarray(tr.Rcw), jnp.asarray(tr.tcw), obs, self.sys.cam,
            jnp.asarray(self.sys.bf, jnp.float32),
            jnp.asarray(Rcw_p), jnp.asarray(tcw_p), jnp.asarray(info))
        Rcw = np.asarray(out.Rcw)
        tcw = np.asarray(out.tcw)
        if not (np.isfinite(Rcw).all() and np.isfinite(tcw).all()):
            return
        tr.Rcw = normalize_rotation_np(Rcw)
        tr.tcw = tcw.astype(np.float32)

    def _store_kf_navstate(self):
        """Record the body pose on a keyframe created this frame so map
        save/load and trajectory-NavState outputs carry it."""
        tr = self.sys.tracker
        k = tr.last_new_kf
        if k is None or self._last_body is None:
            return
        m = self.sys.map
        R_wb, p_wb = self._last_body
        with m.lock:
            m.kf_Rwb[k] = R_wb
            m.kf_pwb[k] = p_wb
