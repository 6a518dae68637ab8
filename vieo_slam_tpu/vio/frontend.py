"""VIO frontend: IMU-fused tracking around the visual System.

The orchestration equivalent of the reference's VIO paths in Tracking
(TrackWithIMU :261, PredictNavStateByIMU :385, PreIntegration scheduling
:157, TrackLocalMapWithIMU :453) plus the IMUInitialization thread
(src/Odom/IMUInitialization.cpp): odometry ingest goes to the native ring
buffer (System::TrackOdom / CacheOdom), per-frame IMU windows are
preintegrated by the jitted scan kernel, the IMU propagation provides the
pose prediction, and after visual tracking the 30D joint VIO motion BA
(solvers/vio_ba) fuses vision + IMU and carries the 15D marginal prior
frame to frame. VI initialization (vio/initialization) fires once enough
keyframe baseline has accumulated.

Wheel-encoder samples ride the same machinery (a second ring + encoder
preintegration fed to the same joint solve) — the VEO/VIEO modes.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..math.navstate import NavState, navstate_from_tcw, tcw_from_navstate
from ..math.preintegration import preintegrate_imu, preintegrate_encoder
from ..native import OdomRing
from ..solvers.motion_ba import PoseObs
from ..solvers.vio_ba import vio_pose_optimization

import functools


@functools.partial(jax.jit, static_argnames=("sigma_bg_rw", "sigma_ba_rw"))
def _fused_solve(ns_last, ns_cur0, pre, obs, cam, Rcb, tcb, bf,
                 prior_info, gravity, sigma_bg_rw, sigma_ba_rw):
    """Jitted joint VIO solve; the prior is always present (a negligible
    1e-6*I before the first marginalization) so one compiled program
    serves every frame."""
    return vio_pose_optimization(
        ns_last, ns_cur0, pre, obs, cam, Rcb, tcb, bf,
        prior_info=prior_info, last_fixed=False,
        sigma_bg_rw=sigma_bg_rw, sigma_ba_rw=sigma_ba_rw,
        gravity=gravity)


@functools.partial(jax.jit, static_argnames=("sigma_bg_rw", "sigma_ba_rw"))
def _fused_solve_enc(ns_last, ns_cur0, pre, obs, cam, Rcb, tcb, bf,
                     prior_info, gravity, enc_pre, Rbe, tbe,
                     sigma_bg_rw, sigma_ba_rw):
    """Jitted VIEO joint solve: the VIO solve plus the wheel-encoder
    SE(2) factor (EdgeEncNavState, src/Odom/g2otypes.h:590)."""
    return vio_pose_optimization(
        ns_last, ns_cur0, pre, obs, cam, Rcb, tcb, bf,
        prior_info=prior_info, last_fixed=False,
        enc_pre=enc_pre, Rbe=Rbe, tbe=tbe,
        sigma_bg_rw=sigma_bg_rw, sigma_ba_rw=sigma_ba_rw,
        gravity=gravity)
from ..system import System
from .initialization import try_init_vio


@dataclasses.dataclass
class VioConfig:
    sigma_g: float = 1.7e-4
    sigma_a: float = 2e-3
    sigma_bg_rw: float = 2e-4
    sigma_ba_rw: float = 2e-3
    window_cap: int = 64            # IMU samples per frame gap
    init_window_cap: int = 512      # IMU samples per KF gap at init
    init_min_kfs: int = 12
    init_min_span: float = 4.0      # provisional init span (starts fusion)
    # Final-acceptance span (IMU.FinalTime, reference default 15 s): the
    # init solves re-run on every new KF over ALL keyframes until this
    # much baseline exists — the linear ba estimate has error
    # ~2*pose_err/dt^2 per KF pair, so only averaging over many
    # BA-refined KFs makes it trustworthy.  The PRV keyframe backend
    # engages only at final acceptance (IMUInitialization.cpp:1343-1351).
    init_final_span: float = 15.0
    solve_scale: bool = False       # stereo/RGB-D
    # encoder (VEO/VIEO)
    use_encoder: bool = False
    enc_half_track: float = 0.28
    enc_sigma_v: float = 0.01
    # body-from-encoder extrinsic Tbe (Camera.Tce / Encoder frame in the
    # reference yaml); None = identity
    enc_Rbe: object = None
    enc_tbe: object = None
    # keyframe backend (PRV sliding-window local BA + init-GBA)
    use_backend: bool = True
    backend_window: int = 10
    run_init_gba: bool = True
    # Initial-bias prior inside the init-GBA (the reference's
    # EdgeNavStateBias on the first bias vertex, Optimizer.cc:1028-1061).
    # Default OFF: A/B-measured on the multi-lap circle (r5,
    # scripts/debug_vio_loop.py DBG_NO_INITPRIOR): pinning bias_0 to the
    # linear-init estimate (ba error ~0.036 m/s^2 at 6-15 s spans)
    # freezes the whole RW-chained bias sequence on the wrong value and
    # the init-GBA warps poses to compensate — KF ATE 0.0040 -> 0.0750
    # with the prior vs 0.0040 -> 0.0023 without (gravity-direction
    # refinement kept on in both).  The r4 "vio_loop drifts 5.6x worse
    # than stereo" was this transient caught by the preLC snapshot.
    init_gba_bias_prior: bool = False
    # Sensor-timing robustness (the reference's delay-poll,
    # Camera.delayForPolling, src/Tracking.cc:966-981): wait up to this
    # many wall-clock seconds for odometry covering the frame timestamp
    # before preintegrating (free when a harness pre-feeds samples — the
    # poll short-circuits).  After the wait, a window that still ends
    # short of the frame (late/dropped packets) is zero-order-hold
    # filled (OdomRing.window_filled) with covariance growing over the
    # held span — graceful degradation instead of a silently short
    # preintegration window.
    delay_for_polling: float = 0.02
    odom_gap_tol: float = 0.02      # tail gap (s) before ZOH fill kicks in


class VioFrontend:
    """System wrapper adding IMU (+ optional encoder) fusion."""

    def __init__(self, system: System, Rcb=None, tcb=None,
                 cfg: Optional[VioConfig] = None):
        self.sys = system
        self.cfg = cfg or VioConfig()
        self.Rcb = np.eye(3, dtype=np.float32) if Rcb is None else \
            np.asarray(Rcb, np.float32)
        self.tcb = np.zeros(3, np.float32) if tcb is None else \
            np.asarray(tcb, np.float32)
        self.ring = OdomRing(1 << 16)
        self.enc_ring = OdomRing(1 << 14) if self.cfg.use_encoder else None
        self.Rbe = np.eye(3, dtype=np.float32) \
            if self.cfg.enc_Rbe is None \
            else np.asarray(self.cfg.enc_Rbe, np.float32)
        self.tbe = np.zeros(3, np.float32) \
            if self.cfg.enc_tbe is None \
            else np.asarray(self.cfg.enc_tbe, np.float32)
        self.inited = False             # provisional: per-frame fusion on
        self.final_inited = False       # accepted: PRV backend engaged
        self.gw = np.array([0.0, 0.0, -9.81], np.float32)
        self.bg = np.zeros(3, np.float32)
        self.ba = np.zeros(3, np.float32)
        self.ns_last: Optional[NavState] = None
        self.prior_info = None
        self.last_t: Optional[float] = None
        self.kf_times: list[tuple[int, float]] = []   # (kf_id, timestamp)
        self.backend = None           # VioBackend, created at VI init
        # post-relocalization bias-recompute collection
        # (RecomputeIMUBiasAndCurrentNavstate, Tracking.cc:548-684):
        # list of (t, Rcw, tcw) vision-only frames; fusion suspended
        # while it fills.
        self._reloc_frames: Optional[list] = None
        self.reloc_recompute_n = 20
        # Async-pipeline integration (SystemConfig.async_mapping): the
        # frontend takes over keyframe dispatch so the fused NavState
        # lands on the KF before the worker sees it, runs the PRV window
        # BA as the worker's post-hook, and follows map-gauge corrections
        # like the tracker does (pending correction applied at the next
        # frame boundary).
        self._pending_ns_corr = None     # (dR, dt), guarded by map.lock
        if system.cfg.async_mapping:
            system.defer_kf_dispatch = True
            system.correction_sinks.append(self)

    # ------------------------------------------------------------------

    def track_odom(self, t: float, gyro, acc):
        """System::TrackOdom / Tracking::CacheOdom."""
        self.ring.push(t, np.concatenate([gyro, acc]).astype(np.float32))

    def track_encoder(self, t: float, v_left: float, v_right: float):
        v = np.zeros(6, np.float32)
        v[0], v[1] = v_left, v_right
        self.enc_ring.push(t, v)

    # ------------------------------------------------------------------

    def _preintegrate(self, t0: float, t1: float, cap: int,
                      bg=None, ba=None):
        from ..utils.metrics import metrics

        vals, dts, mask, _, lag = self.ring.window_filled(
            t0, t1, cap, tail_tol=self.cfg.odom_gap_tol)
        if lag > 0:
            metrics.count("imu_window_zoh_filled")
        bg = self.bg if bg is None else bg
        ba = self.ba if ba is None else ba
        return preintegrate_imu(
            jnp.asarray(vals[:, :3]), jnp.asarray(vals[:, 3:]),
            jnp.asarray(dts), jnp.asarray(bg), jnp.asarray(ba),
            self.cfg.sigma_g, self.cfg.sigma_a, mask=jnp.asarray(mask),
        )

    def _propagate(self, ns: NavState, pre) -> NavState:
        """IMU state propagation (Tracking::PredictNavStateByIMU)."""
        g = jnp.asarray(self.gw)
        dt = pre.dt
        dbg = ns.bg + ns.dbg - pre.bg
        dba = ns.ba + ns.dba - pre.ba
        dR, dv, dp = pre.corrected(dbg, dba)
        R_j = ns.R @ dR
        v_j = ns.v + g * dt + ns.R @ dv
        p_j = ns.p + ns.v * dt + 0.5 * g * dt * dt + ns.R @ dp
        return ns._replace(R=R_j, v=v_j, p=p_j)

    def _propagate_enc(self, ns: NavState, t0: float, t1: float):
        """Encoder dead-reckoning of the body pose over [t0, t1]
        (Tracking::GetVelocityByEnc :218 / TrackWithOnlyOdom :79 prefer
        the encoder when present: wheel odometry doesn't double-integrate
        accelerometer noise, so its short-horizon pose is far tighter
        than IMU propagation on planar robots).

        T_w_bj = T_w_bi · T_be · ΔT_e · T_be⁻¹.  Returns (R_j, p_j) numpy
        or None if the window holds no samples."""
        ev, edts, emask, n, _ = self.enc_ring.window_filled(
            t0, t1, self.cfg.window_cap, tail_tol=self.cfg.odom_gap_tol)
        if n == 0:
            return None
        enc = preintegrate_encoder(
            jnp.asarray(ev[:, 0]), jnp.asarray(ev[:, 1]),
            jnp.asarray(edts), self.cfg.enc_half_track,
            self.cfg.enc_sigma_v, mask=jnp.asarray(emask))
        dR_e = np.asarray(enc.dR)
        dp_e = np.asarray(enc.dp)
        R_i = np.asarray(ns.R)
        p_i = np.asarray(ns.p)
        Rbe, tbe = self.Rbe, self.tbe
        R_j = R_i @ Rbe @ dR_e @ Rbe.T
        p_j = (p_i + R_i @ (tbe + Rbe @ dp_e) - R_j @ tbe)
        return R_j.astype(np.float32), p_j.astype(np.float32)

    # ------------------------------------------------------------------

    def push_correction(self, R_old, t_old, R_new, t_new):
        """Map-gauge correction from the mapping worker (same convention
        as Tracker.push_correction; called under map.lock): dT composes
        on the camera side, applied to the NavState at the next frame."""
        dR = R_old.T @ R_new
        dt = R_old.T @ (t_new - t_old)
        if self._pending_ns_corr is not None:
            Ra, ta = self._pending_ns_corr
            dR, dt = Ra @ dR, Ra @ dt + ta
        self._pending_ns_corr = (dR.astype(np.float32),
                                 dt.astype(np.float32))

    def _apply_ns_correction(self):
        """Re-anchor the fused NavState in the worker-corrected map gauge
        (the reference's bMapUpdated handling in TrackWithIMU: the motion
        prior re-anchors on the corrected KF, Tracking.cc:983-990)."""
        with self.sys.map.lock:
            corr, self._pending_ns_corr = self._pending_ns_corr, None
        if corr is None or self.ns_last is None:
            return
        from ..math.lie import normalize_rotation_np

        dR, dt = corr
        Rcw, tcw = tcw_from_navstate(
            self.ns_last, jnp.asarray(self.Rcb), jnp.asarray(self.tcb))
        Rcw, tcw = np.asarray(Rcw), np.asarray(tcw)
        Rcw2 = normalize_rotation_np(Rcw @ dR)
        tcw2 = Rcw @ dt + tcw
        ns2 = navstate_from_tcw(
            jnp.asarray(Rcw2), jnp.asarray(tcw2),
            jnp.asarray(self.Rcb), jnp.asarray(self.tcb))
        # World-frame velocity follows the body-rotation change; biases
        # are gauge-invariant.
        W = np.asarray(ns2.R) @ np.asarray(self.ns_last.R).T
        self.ns_last = self.ns_last._replace(
            R=ns2.R, p=ns2.p, v=jnp.asarray(W @ np.asarray(self.ns_last.v)))
        # The prior's linearization point moved: replace it with the
        # moderate rebase prior rather than carrying a stale Hessian.
        if self.prior_info is not None:
            self.prior_info = self._fresh_prior()

    def _backend_worker_step(self, k: int):
        """Worker post-hook: PRV sliding-window BA for keyframe k (the
        slot LocalBundleAdjustmentNavStatePRV occupies inside the
        reference's LocalMapping thread, LocalMapping.cc:129-147).  The
        worker captures the KF pose delta around this and pushes the
        gauge correction to the tracker and to this frontend."""
        self.backend.run_local_ba(k)

    def _dispatch_deferred(self):
        """Hand the frame's new keyframe (if any) to the mapping worker,
        now that the fused NavState is stored on it."""
        if not self.sys.defer_kf_dispatch:
            return
        post = self._backend_worker_step \
            if (self.final_inited and self.backend is not None) else None
        self.sys.dispatch_keyframe(post_hook=post)

    def track_frame(self, frame):
        t = float(frame.timestamp)
        tr = self.sys.tracker
        self._apply_ns_correction()
        pre = None
        if self.inited and self.last_t is not None:
            # delay-poll: give a live odometry feeder the chance to
            # deliver samples covering this frame (Tracking.cc:966-981)
            if not self.ring.wait_until(
                    t - self.cfg.odom_gap_tol, self.cfg.delay_for_polling):
                from ..utils.metrics import metrics
                metrics.count("imu_poll_timeout")
            pre = self._preintegrate(self.last_t, t, self.cfg.window_cap)
            ns_pred = self._propagate(self.ns_last, pre)
            if self.cfg.use_encoder and self.enc_ring is not None:
                # Wheel odometry gives the tighter short-horizon pose
                # (GetVelocityByEnc preference, Tracking.cc:218); keep
                # the IMU-propagated velocity/biases.
                enc_pose = self._propagate_enc(self.ns_last, self.last_t, t)
                if enc_pose is not None:
                    ns_pred = ns_pred._replace(
                        R=jnp.asarray(enc_pose[0]),
                        p=jnp.asarray(enc_pose[1]))
            Rcw, tcw = tcw_from_navstate(
                ns_pred, jnp.asarray(self.Rcb), jnp.asarray(self.tcb))
            tr.external_prediction = (np.asarray(Rcw), np.asarray(tcw))

        state = self.sys.track_frame(frame)

        if state.name == "ODOMOK" and pre is not None:
            # Visual dropout bridged by dead-reckoning: carry the
            # propagated NavState forward (TrackWithOnlyOdom keeps the
            # IMU state alive through the outage, Tracking.cc:79-155;
            # with an encoder the pose comes from wheel odometry).
            self.ns_last = ns_pred
            # ODOMOK keyframes (the reference's c3 insertion) carry the
            # dead-reckoned NavState so backend preintegration chains
            # stay unbroken across the dropout.
            if tr.last_new_kf is not None:
                self.kf_times.append((tr.last_new_kf, t))
                self._store_kf_navstate(tr.last_new_kf)
            self.last_t = t
            self._dispatch_deferred()
            return state

        if getattr(tr, "just_relocalized", False):
            tr.just_relocalized = False
            if self.inited:
                # Kidnapped: the stale NavState/prior are wrong in the
                # relocalized frame — track vision-only for N frames,
                # then recompute bg/ba/velocity (Tracking.cc:548-684).
                self._reloc_frames = []
                self.prior_info = None

        if state.name in ("OK",):
            if self._reloc_frames is not None:
                self._reloc_frames.append(
                    (t, tr.Rcw.copy(), tr.tcw.copy()))
                # keep a vision-anchored NavState so ODOMOK/predict work
                self.ns_last = navstate_from_tcw(
                    jnp.asarray(tr.Rcw), jnp.asarray(tr.tcw),
                    jnp.asarray(self.Rcb),
                    jnp.asarray(self.tcb))._replace(
                    v=jnp.zeros(3), bg=jnp.asarray(self.bg),
                    ba=jnp.asarray(self.ba))
                if tr.last_new_kf is not None:
                    # mapping continues during the collection window;
                    # KFs take the vision-anchored NavState
                    self.kf_times.append((tr.last_new_kf, t))
                    self._store_kf_navstate(tr.last_new_kf)
                if len(self._reloc_frames) >= self.reloc_recompute_n:
                    self._recompute_bias_after_reloc()
                self.last_t = t
                self._dispatch_deferred()
                return state
            if self.inited and pre is not None:
                self._fuse(frame, pre)
            else:
                # Maintain a vision-only NavState (R, p from pose).
                ns = navstate_from_tcw(
                    jnp.asarray(tr.Rcw), jnp.asarray(tr.tcw),
                    jnp.asarray(self.Rcb), jnp.asarray(self.tcb))
                v = jnp.zeros(3) if self.ns_last is None else (
                    (ns.p - self.ns_last.p)
                    / max(t - (self.last_t or t) or 1e-3, 1e-3))
                self.ns_last = ns._replace(
                    v=v, bg=jnp.asarray(self.bg), ba=jnp.asarray(self.ba))
            if tr.last_new_kf is not None:
                self.kf_times.append((tr.last_new_kf, t))
                self._store_kf_navstate(tr.last_new_kf)
                if not self.final_inited:
                    # run (or re-run) the VI init solves over ALL KFs —
                    # the reference's 1 s TryInitVIO polling loop
                    # (IMUInitialization.cpp:116-155) collapsed to
                    # keyframe cadence.  In async mode mapping of this KF
                    # dispatches first; _maybe_init drains the worker
                    # before touching the whole map (the reference's
                    # stop-LocalMapping handshake around the rescale,
                    # IMUInitialization.cpp:1413).
                    self._dispatch_deferred()
                    self._maybe_init()
                elif self.backend is not None:
                    # PRV sliding-window local BA at keyframe cadence
                    # (LocalMapping's LocalBundleAdjustmentNavStatePRV once
                    # VINS is initialized, LocalMapping.cc:129-147).  In
                    # async mode it runs on the worker as the dispatch
                    # post-hook; gauge corrections come back through
                    # push_correction instead of the synchronous rebase.
                    if self.sys.defer_kf_dispatch:
                        self._dispatch_deferred()
                    elif self.backend.run_local_ba(tr.last_new_kf):
                        self._rebase_from_kf(tr.last_new_kf)
        self._dispatch_deferred()
        self.last_t = t
        return state

    def _recompute_bias_after_reloc(self):
        """RecomputeIMUBiasAndCurrentNavstate (Tracking.cc:548-684): gyro
        bias GN + linear ba/velocity solve over the collected post-reloc
        frames, gravity kept from the original initialization; on success
        the fused tracking resumes from the recomputed NavState."""
        from .initialization import recompute_bias_navstate

        frames = self._reloc_frames
        self._reloc_frames = None
        ts = np.asarray([f[0] for f in frames], np.float64)
        Rcw = np.stack([f[1] for f in frames])
        tcw = np.stack([f[2] for f in frames])
        R_wc = np.swapaxes(Rcw, -1, -2)
        p_wc = -np.einsum("kij,kj->ki", R_wc, tcw)
        N = len(frames)
        T = self.cfg.window_cap
        gyro_w = np.zeros((N - 1, T, 3), np.float32)
        acc_w = np.zeros((N - 1, T, 3), np.float32)
        dt_w = np.zeros((N - 1, T), np.float32)
        mask_w = np.zeros((N - 1, T), bool)
        for i in range(N - 1):
            vals, dts, mask, n = self.ring.window(ts[i], ts[i + 1], T)
            if n > T:
                return      # cannot recompute; stay vision-anchored
            gyro_w[i] = vals[:, :3]
            acc_w[i] = vals[:, 3:]
            dt_w[i] = dts
            mask_w[i] = mask
        out = recompute_bias_navstate(
            jnp.asarray(ts.astype(np.float32)), jnp.asarray(R_wc),
            jnp.asarray(p_wc.astype(np.float32)),
            jnp.asarray(self.Rcb), jnp.asarray(self.tcb),
            jnp.asarray(gyro_w), jnp.asarray(acc_w), jnp.asarray(dt_w),
            jnp.asarray(mask_w), self.gw, self.cfg.sigma_g,
            self.cfg.sigma_a)
        bg = np.asarray(out.bg, np.float32)
        ba = np.asarray(out.ba, np.float32)
        v = np.asarray(out.v, np.float32)
        if not (np.isfinite(bg).all() and np.isfinite(ba).all()
                and np.isfinite(v).all()) or np.linalg.norm(bg) > 0.5 \
                or np.linalg.norm(ba) > 3.0:
            return
        self.bg, self.ba = bg, ba
        Rbc = self.Rcb.T
        pcb = -Rbc @ self.tcb
        self.ns_last = NavState(
            R=jnp.asarray(R_wc[-1] @ self.Rcb),
            p=jnp.asarray((p_wc[-1] + R_wc[-1] @ pcb).astype(np.float32)),
            v=jnp.asarray(v[-1]),
            bg=jnp.asarray(bg), ba=jnp.asarray(ba),
            dbg=jnp.zeros(3), dba=jnp.zeros(3))
        self.prior_info = self._fresh_prior()

    def _rebase_from_kf(self, k: int):
        """Continue tracking from the backend-optimized keyframe state:
        pose, NavState, and a fresh (empty) marginal prior — the window BA
        re-linearized everything the prior summarized (the reference's
        bMapUpdated path anchors the next motion BA on the last KeyFrame
        instead of the prior, Optimizer.h:208 template switch)."""
        m = self.sys.map
        self.sys.tracker.rebase_to_keyframe(k)
        z = jnp.zeros(3, jnp.float32)
        self.ns_last = NavState(
            R=jnp.asarray(m.kf_Rwb[k]), p=jnp.asarray(m.kf_pwb[k]),
            v=jnp.asarray(m.kf_vwb[k]), bg=jnp.asarray(m.kf_bg[k]),
            ba=jnp.asarray(m.kf_ba[k]), dbg=z, dba=z)
        self.prior_info = self._fresh_prior()

    @staticmethod
    def _fresh_prior() -> np.ndarray:
        """Moderate diagonal prior for a state just (re)based on a
        solved keyframe: velocity and biases are trustworthy there, pose
        stays loose (vision anchors it).  A 1e-6 free-float instead
        opens the joint-bias null direction the motion solve can wander
        along (see the trust-region note in solvers/vio_ba).  PVR+bias
        order [p, v, phi, bg, ba]."""
        return np.diag(np.concatenate([
            np.full(3, 1e-2), np.full(3, 4e2), np.full(3, 1e-2),
            np.full(3, 1e4), np.full(3, 1e2)])).astype(np.float32)

    # ------------------------------------------------------------------

    def _fuse(self, frame, pre):
        """Joint VIO motion BA + marginal prior carry (TrackWithIMU)."""
        tr = self.sys.tracker
        res = tr.last_result
        if res is None or tr.last_slab is None:
            return
        pw, lm_ids = tr.last_slab
        match = np.asarray(res.lm_match)
        inl = np.asarray(res.inlier)
        kp = np.clip(match, 0, None)
        f_uv = np.asarray(frame.uv)[kp]
        f_ur = np.asarray(frame.ur)[kp]
        f_lvl = np.asarray(frame.level)[kp]
        valid = (match >= 0) & inl
        obs = PoseObs(
            pw=jnp.asarray(pw),
            uv=jnp.asarray(f_uv),
            ur=jnp.asarray(f_ur),
            inv_sigma2=jnp.asarray(
                self.sys.map.inv_sigma2[np.clip(f_lvl, 0, None)]),
            valid=jnp.asarray(valid),
        )
        ns_vis = navstate_from_tcw(
            jnp.asarray(tr.Rcw), jnp.asarray(tr.tcw),
            jnp.asarray(self.Rcb), jnp.asarray(self.tcb))
        ns_cur0 = ns_vis._replace(
            v=self._propagate(self.ns_last, pre).v,
            bg=self.ns_last.bg, ba=self.ns_last.ba,
            dbg=self.ns_last.dbg, dba=self.ns_last.dba)
        enc_pre = None
        if self.cfg.use_encoder and self.enc_ring is not None \
                and self.last_t is not None:
            ev, edts, emask, _ = self.enc_ring.window(
                self.last_t, float(frame.timestamp), self.cfg.window_cap)
            enc_pre = preintegrate_encoder(
                jnp.asarray(ev[:, 0]), jnp.asarray(ev[:, 1]),
                jnp.asarray(edts), self.cfg.enc_half_track,
                self.cfg.enc_sigma_v, mask=jnp.asarray(emask))
        prior = self.prior_info if self.prior_info is not None \
            else 1e-6 * np.eye(15, dtype=np.float32)
        if enc_pre is not None:
            # Encoder path (VEO/VIEO): jitted like the IMU-only path.
            out = _fused_solve_enc(
                self.ns_last, ns_cur0, pre, obs, self.sys.cam,
                jnp.asarray(self.Rcb), jnp.asarray(self.tcb),
                jnp.asarray(self.sys.bf, jnp.float32),
                jnp.asarray(prior), jnp.asarray(self.gw),
                enc_pre, jnp.asarray(self.Rbe), jnp.asarray(self.tbe),
                self.cfg.sigma_bg_rw, self.cfg.sigma_ba_rw,
            )
        else:
            out = _fused_solve(
                self.ns_last, ns_cur0, pre, obs, self.sys.cam,
                jnp.asarray(self.Rcb), jnp.asarray(self.tcb),
                jnp.asarray(self.sys.bf, jnp.float32),
                jnp.asarray(prior), jnp.asarray(self.gw),
                self.cfg.sigma_bg_rw, self.cfg.sigma_ba_rw,
            )
        if not np.isfinite(np.asarray(out.ns.p)).all():
            return
        # Physical sanity gate (the reference's forced-on asserts class):
        # a solve that claims |bg| > 0.5 rad/s or |ba| > 3 m/s^2 has run
        # away — keep the previous state rather than poisoning the chain.
        bg_n = float(np.linalg.norm(np.asarray(out.ns.bg + out.ns.dbg)))
        ba_n = float(np.linalg.norm(np.asarray(out.ns.ba + out.ns.dba)))
        if bg_n > 0.5 or ba_n > 3.0:
            return
        # Write the fused pose back into the tracker (and its velocity
        # model continues from it).  Rotations are re-projected onto
        # SO(3) at this boundary — per-frame retraction products
        # otherwise compound off-manifold geometrically (see
        # lie.normalize_rotation_np).
        from ..math.lie import normalize_rotation_np

        ns = out.ns._replace(
            R=jnp.asarray(normalize_rotation_np(np.asarray(out.ns.R))))
        Rcw, tcw = tcw_from_navstate(
            ns, jnp.asarray(self.Rcb), jnp.asarray(self.tcb))
        tr.Rcw = normalize_rotation_np(np.asarray(Rcw, np.float32))
        tr.tcw = np.asarray(tcw, np.float32)
        self.ns_last = ns
        self.prior_info = np.asarray(out.prior_info)

    # ------------------------------------------------------------------

    def _store_kf_navstate(self, k: int):
        m = self.sys.map
        ns = self.ns_last
        if ns is None:
            return
        with m.lock:
            self._store_kf_navstate_locked(m, ns, k)

    def _store_kf_navstate_locked(self, m, ns, k: int):
        m.kf_Rwb[k] = np.asarray(ns.R)
        m.kf_pwb[k] = np.asarray(ns.p)
        m.kf_vwb[k] = np.asarray(ns.v)
        m.kf_bg[k] = np.asarray(ns.bg + ns.dbg)
        m.kf_ba[k] = np.asarray(ns.ba + ns.dba)
        if self.inited:
            # The joint VIO motion BA ran after KF creation; give the KF
            # the fused pose (the reference's KeyFrame takes the
            # post-PoseOptimization frame pose).
            Rcw, tcw = tcw_from_navstate(
                ns, jnp.asarray(self.Rcb), jnp.asarray(self.tcb))
            m.kf_Rcw[k] = np.asarray(Rcw, np.float32)
            m.kf_tcw[k] = np.asarray(tcw, np.float32)

    def _maybe_init(self):
        cfg = self.cfg
        if len(self.kf_times) < cfg.init_min_kfs:
            return
        span = self.kf_times[-1][1] - self.kf_times[0][1]
        if span < cfg.init_min_span:
            return
        # Exclusive map access for the init solves + rescale: drain the
        # mapping worker (the reference stops LocalMapping and takes the
        # scale-update lock around TryInitVIO's write-back,
        # IMUInitialization.cpp:1413-1455), then flush pending gauge
        # corrections so they aren't applied a second time after the
        # init rewrites poses/NavStates from the map.
        self.sys.wait_idle()
        m = self.sys.map
        with m.lock:
            self.sys.tracker._apply_pending_correction()
        self._apply_ns_correction()
        kf_ids = [k for k, _ in self.kf_times if m.kf_valid[k]]
        ts = np.asarray([t for k, t in self.kf_times if m.kf_valid[k]],
                        np.float64)
        if len(kf_ids) < cfg.init_min_kfs:
            return
        N = len(kf_ids)
        Rcw = m.kf_Rcw[kf_ids]
        tcw = m.kf_tcw[kf_ids]
        R_wc = np.swapaxes(Rcw, -1, -2)
        p_wc = -np.einsum("kij,kj->ki", R_wc, tcw)
        T = cfg.init_window_cap
        gyro_w = np.zeros((N - 1, T, 3), np.float32)
        acc_w = np.zeros((N - 1, T, 3), np.float32)
        dt_w = np.zeros((N - 1, T), np.float32)
        mask_w = np.zeros((N - 1, T), bool)
        for i in range(N - 1):
            vals, dts, mask, n = self.ring.window(ts[i], ts[i + 1], T)
            if n > T:
                return  # window capacity insufficient; wait for re-KF
            gyro_w[i] = vals[:, :3]
            acc_w[i] = vals[:, 3:]
            dt_w[i] = dts
            mask_w[i] = mask
        out = try_init_vio(
            jnp.asarray(ts.astype(np.float32)),
            jnp.asarray(R_wc),  # Rwc; Rcb applied inside try_init_vio
            jnp.asarray(p_wc.astype(np.float32)),
            jnp.asarray(self.Rcb), jnp.asarray(self.tcb),
            jnp.asarray(gyro_w), jnp.asarray(acc_w), jnp.asarray(dt_w),
            jnp.asarray(mask_w),
            cfg.sigma_g, cfg.sigma_a, solve_scale=cfg.solve_scale,
        )
        gw = np.asarray(out.gw)
        if not np.isfinite(gw).all() or \
                abs(np.linalg.norm(gw) - 9.81) > 0.5:
            return
        self.gw = gw.astype(np.float32)
        self.bg = np.asarray(out.bg, np.float32)
        self.ba = np.asarray(out.ba, np.float32)
        scale = float(out.scale)
        if cfg.solve_scale and np.isfinite(scale) and scale > 0:
            # Rescale the whole map (monocular; TryInitVIO step at
            # IMUInitialization.cpp:1413+ UpdateScale).
            m.lm_pw[m.lm_valid] *= scale
            m.kf_tcw[m.kf_valid] *= scale
            tr = self.sys.tracker
            tr.tcw = tr.tcw * scale
        # Per-KF NavStates + velocities.
        v = np.asarray(out.v)
        Rwb_all = R_wc @ self.Rcb  # Rwb = Rwc Rcb
        pcb = -self.Rcb.T @ self.tcb
        for i, k in enumerate(kf_ids):
            m.kf_Rwb[k] = Rwb_all[i]
            m.kf_pwb[k] = (p_wc[i] * (scale if cfg.solve_scale else 1.0)
                           + R_wc[i] @ pcb)
            m.kf_vwb[k] = v[i]
            m.kf_bg[k] = self.bg
            m.kf_ba[k] = self.ba
        # Current NavState from the latest KF.
        k_last = kf_ids[-1]
        self.ns_last = NavState(
            R=jnp.asarray(m.kf_Rwb[k_last]),
            p=jnp.asarray(m.kf_pwb[k_last]),
            v=jnp.asarray(m.kf_vwb[k_last]),
            bg=jnp.asarray(self.bg), ba=jnp.asarray(self.ba),
            dbg=jnp.zeros(3), dba=jnp.zeros(3),
        )
        self.prior_info = self._fresh_prior()
        self.inited = True
        self.sys.mapper.vio_active = True
        if span >= cfg.init_final_span:
            # Final acceptance (mdFinalTime reached): freeze the init,
            # engage the PRV keyframe backend + init-GBA.
            self.final_inited = True
            if cfg.use_backend:
                self._attach_backend()

    def _attach_backend(self):
        """Create the PRV keyframe backend and run the init-GBA
        (LoopClosing.cc:720-744: GlobalBundleAdjustmentNavStatePRV with
        the gravity-direction vertex + initial bias prior)."""
        from .backend import VioBackend, VioBackendConfig

        cfg = self.cfg
        self.backend = VioBackend(
            self.sys.map, self.sys.cam, self.sys.bf, self.ring,
            self.Rcb, self.tcb,
            cfg=VioBackendConfig(window_size=cfg.backend_window,
                                 sigma_g=cfg.sigma_g, sigma_a=cfg.sigma_a,
                                 sigma_bg_rw=cfg.sigma_bg_rw,
                                 sigma_ba_rw=cfg.sigma_ba_rw),
            enc_ring=self.enc_ring, Rbe=self.Rbe, tbe=self.tbe,
            enc_half_track=cfg.enc_half_track,
            enc_sigma_v=cfg.enc_sigma_v)
        self.backend.gravity = self.gw.copy()
        # Vision-only local BA stops here; the PRV window BA replaces it.
        self.sys.mapper.skip_local_ba = True
        if cfg.run_init_gba:
            if self.backend.run_global_ba(
                    opt_scale=cfg.solve_scale, opt_gdir=True,
                    init_prior=cfg.init_gba_bias_prior):
                self.gw = self.backend.gravity.copy()
                kfs = self.sys.map.keyframe_ids()
                if len(kfs):
                    self._rebase_from_kf(int(kfs[-1]))
