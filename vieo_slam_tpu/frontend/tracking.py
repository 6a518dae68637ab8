"""Tracking: per-frame pose estimation state machine.

TPU-native redesign of src/Tracking.cc (Track :950, TrackWithMotionModel
:1844, TrackReferenceKeyFrame :1722, TrackLocalMap :1930, NeedNewKeyFrame
:2010, StereoInitialization :1391, Relocalization :2529): the host runs the
(tiny) state machine and window selection; every per-frame heavy step —
projecting the local map, windowed Hamming association, motion-only BA —
is a single jitted device program over fixed-capacity landmark slabs.

The constant-velocity model, the two-stage track (frame-to-map coarse
association at the predicted pose, then TrackLocalMap-style re-association
+ re-optimization), chi2 gating and keyframe decision thresholds follow the
reference's semantics.
"""

from __future__ import annotations

import dataclasses
import enum
import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..cameras import models as cm
from ..map.map_state import MapState
from ..math.lie import normalize_rotation_np
from ..ops import matching
from ..solvers.motion_ba import PoseObs, pose_optimization
from .frame import Frame
from ..ops import matching as _matching


class TrackState(enum.Enum):
    NOT_INITIALIZED = 0
    OK = 1
    LOST = 2
    ODOMOK = 3      # odometry dead-reckoning bridge (reference ODOMOK)


@dataclasses.dataclass
class TrackerConfig:
    local_landmark_cap: int = 4096   # device slab for the local map
    match_radius_coarse: float = 15.0
    match_radius_fine: float = 6.0
    min_matches_track: int = 12
    min_inliers_ok: int = 25
    kf_tracked_ratio: float = 0.9    # NeedNewKeyFrame 90% rule
    kf_min_interval: int = 1         # frames between KFs (min)
    kf_max_interval: int = 4         # force KF after this many frames
    lost_retry_radius: float = 80.0  # wide re-search before giving up
    # Adaptive stage-1 radius under rotational acceleration: the
    # constant-velocity model's error per frame is the CHANGE in
    # inter-frame rotation; fx * that angle is its pixel displacement
    # at the image centre.  The coarse window widens by this much
    # (capped) so yaw-acceleration spikes (the reference's V103/MH05
    # regime) stay inside the association window — the reference gets
    # the same effect from PredictNavStateByIMU + its th=15 vs th=7
    # window split (Tracking.cc:385, ORBmatcher th arguments).
    adaptive_radius_gain: float = 1.5
    adaptive_radius_max: float = 60.0
    odomok_max_frames: int = 50      # dead-reckoning bridge length cap
    use_predicted_scale: bool = False  # PredictScale-driven search radii
    th_depth: float = 4.0            # mThDepth: init/creation depth gate
    max_level_tolerance: int = 8     # disables level gating when large
    # (stage1 rounds, stage1 iters, stage2 rounds, stage2 iters):
    # latency/accuracy knob; each LM iteration is serial device latency.
    # Default = the round-3 TPU A/B winner: parallel-lambda LM at
    # (2,2,1,2) matches lm(3,6,2,4) quality (CPU equivalence,
    # solvers/lm.lm_solve_parallel) at 4.4 -> 1.7 ms track-kernel
    # latency on v5e (BENCH_r03).
    schedule: tuple = (2, 2, 1, 2)
    opt_mode: str = "plm"            # "gn" = latency mode (see motion_ba)


class TrackKernelResult(NamedTuple):
    Rcw: jax.Array
    tcw: jax.Array
    lm_match: jax.Array     # [LC] keypoint idx per local landmark (-1)
    inlier: jax.Array       # [LC] inlier flags after pose opt
    n_inliers: jax.Array
    in_frustum: jax.Array   # [LC] landmark projected into the image


@functools.partial(jax.jit, static_argnames=("schedule", "opt_mode"))
def _track_kernel(
    Rcw0, tcw0,
    lm_pw, lm_desc, lm_level, lm_valid,
    frame: Frame,
    inv_sigma2_tab,
    level_scales,
    radius_coarse, radius_fine,
    bf,
    cam: cm.Camera,
    schedule: tuple = (2, 3, 2, 2),
    opt_mode: str = "lm",
):
    """Two-stage frame tracking against a local-landmark slab.

    Stage 1: project at predicted pose, wide-radius association, pose opt.
    Stage 2: re-project at refined pose, tight-radius association, pose opt.
    (TrackWithMotionModel + TrackLocalMap collapsed into one program.)
    """
    def associate_and_optimize(Rcw, tcw, radius, level_tol,
                               max_hamming, ratio, rounds, iters):
        pc = jnp.einsum("ij,nj->ni", Rcw, lm_pw) + tcw
        uv_proj = cm.project(cam, pc)
        vis = lm_valid & (pc[:, 2] > 0.1) & cm.in_image(cam, uv_proj, 1.0)
        del pc
        idx, dist = matching.search_by_projection(
            uv_proj, lm_level, lm_desc, vis,
            frame.uv, frame.level, frame.desc, frame.valid,
            radius=radius, level_scales=level_scales,
            max_dist=max_hamming, ratio=ratio,
            level_tolerance=level_tol,
        )
        matched = idx >= 0
        kp = jnp.clip(idx, 0)
        obs = PoseObs(
            pw=lm_pw,
            uv=frame.uv[kp],
            ur=frame.ur[kp],
            inv_sigma2=matching.lookup_small(inv_sigma2_tab,
                                             frame.level[kp]),
            valid=matched,
        )
        res = pose_optimization(Rcw, tcw, obs, cam, bf,
                                rounds=rounds, iters_per_round=iters,
                                mode=opt_mode)
        return res, idx, vis

    # Stricter gates than the reference's TH_HIGH: prediction-consistent
    # wrong matches inside the search window create a false pose minimum
    # along the weakly-observable sightline direction (measured: ~20 wrong
    # matches displace the optimum by ~8 cm), so the Hamming/ratio bar is
    # set high and stage 2 re-searches tightly at the refined pose.
    # The schedule is short by TPU design: each LM iteration is a serial
    # dependency on the chip (measured ~1.2 ms of latency per iteration on
    # v5e through the full [slab x kp] association program), and tracking
    # converges in 2-3 GN steps from the motion-model prediction; the
    # reference's 4x10 schedule is a CPU-era safety margin.
    s1r, s1i, s2r, s2i = schedule
    res1, idx1, _ = associate_and_optimize(Rcw0, tcw0, radius_coarse, 8,
                                           75, 0.8, s1r, s1i)
    res2, idx2, vis2 = associate_and_optimize(res1.Rcw, res1.tcw,
                                              radius_fine, 8, 50, 0.8,
                                              s2r, s2i)
    return TrackKernelResult(
        Rcw=res2.Rcw, tcw=res2.tcw, lm_match=idx2,
        inlier=res2.inliers, n_inliers=res2.n_inliers, in_frustum=vis2,
    )


class Tracker:
    """Host-side tracking orchestrator."""

    def __init__(self, cam: cm.Camera, bf: float, map_state: MapState,
                 cfg: Optional[TrackerConfig] = None):
        self.cam = cam
        self.bf = float(bf)
        self.map = map_state
        self.cfg = cfg or TrackerConfig()
        self.state = TrackState.NOT_INITIALIZED
        self.Rcw = np.eye(3, dtype=np.float32)
        self.tcw = np.zeros(3, np.float32)
        self.velocity = None         # (dR, dt): Tcw_k ∘ Tcw_{k-1}^-1
        self._prev_vel_rot = None    # previous frame's dR (rot-accel est)
        self.last_kf_id = -1
        self.frames_since_kf = 0
        self.frame_id = 0
        self.ref_tracked = 0         # inlier count at last KF creation
        self.last_result: Optional[TrackKernelResult] = None
        self.last_lm_ids: Optional[np.ndarray] = None
        self.last_new_kf: Optional[int] = None  # KF created this frame
        self.external_prediction = None  # (Rcw, tcw) from IMU propagation
        self._last_pred_external = None  # prediction used this frame
        self.odomok_frames = 0           # consecutive ODOMOK frames
        self.just_relocalized = False    # set by relocalization, read+
                                         # cleared by the VIO frontend
        self.last_slab = None            # (pw, lm_ids) of the last track
        self._mono_init_frame: Optional[Frame] = None
        # Async-mapping handoff (the reference's bMapUpdated rebase for a
        # mapping thread that finishes while tracking has moved on): the
        # mapper publishes dT = Tcw_old_k^-1 ∘ Tcw_new_k of the keyframe
        # it just corrected (composed under map.lock if several KFs are
        # processed between frames); the tracker applies
        # Tcw <- Tcw ∘ dT at the next frame boundary.
        self.pending_correction = None   # (dR [3,3], dt [3]) or None
        # trajectory log: (timestamp, Rcw, tcw, state)
        self.trajectory = []
        # (timestamp, ref_kf, R_cr, t_cr, state) — see track()
        self.trajectory_rel = []

    # ------------------------------------------------------------------

    def _local_landmark_slab(self):
        """Select local-map landmarks (covisibility of last KF + its
        neighbours, Tracking::UpdateLocalPoints) into a fixed slab."""
        cap = self.cfg.local_landmark_cap
        m = self.map
        if self.last_kf_id >= 0:
            neigh, _ = m.covisible_keyframes(self.last_kf_id,
                                             min_shared=5)
            kfs = np.concatenate([[self.last_kf_id], neigh[:20]])
            # Priority order: the reference KF's own landmarks first,
            # then neighbours by covisibility weight.  When the union
            # exceeds the slab capacity, the truncation must keep the
            # landmarks most likely in the CURRENT view — id-sorted
            # truncation (round-4 behavior) kept the OLDEST landmarks,
            # which under fast rotational sweep (duplicate churn grows
            # the union past the cap) starved the slab of exactly the
            # leading-edge landmarks tracking needed: measured on the
            # lemniscate row, slab coverage collapsed 544 -> 10 over
            # ~10 frames while prediction error stayed at 1-2 degrees,
            # and tracking died (scripts/debug_lemniscate.py).
            lm_all = np.concatenate([
                m.kf_lm_idx[kf][m.kf_kp_valid[kf] & (m.kf_lm_idx[kf] >= 0)]
                for kf in kfs])
            _, first_idx = np.unique(lm_all, return_index=True)
            lm_ids = lm_all[np.sort(first_idx)]
        else:
            lm_ids = np.nonzero(m.lm_valid)[0]
        lm_ids = lm_ids[m.lm_valid[lm_ids]][:cap]
        M = len(lm_ids)
        pw = np.zeros((cap, 3), np.float32)
        desc = np.zeros((cap, 8), np.uint32)
        level = np.zeros(cap, np.int32)
        valid = np.zeros(cap, bool)
        pw[:M] = self.map.lm_pw[lm_ids]
        desc[:M] = self.map.lm_desc[lm_ids]
        valid[:M] = True
        if self.cfg.use_predicted_scale:
            # PredictScale from the current camera centre: scales the
            # search radius per landmark (MapPoint::PredictScale).  Only
            # meaningful when keypoint octaves are physical (image-level
            # ORB); the feature-level simulator assigns levels randomly,
            # where this would just loosen the windows.
            cam_center = -self.Rcw.T @ self.tcw
            level[:M] = self.map.predict_scale(lm_ids, cam_center)
        ids = np.full(cap, -1, np.int64)
        ids[:M] = lm_ids
        return pw, desc, level, valid, ids

    def rebase_to_keyframe(self, k: int):
        """Re-read the current pose from the (BA-corrected) keyframe just
        created from this frame — the reference's bMapUpdated rebase
        (Tracking.cc recomputes last-frame pose from the corrected ref KF
        after LocalMapping/GBA moves the map)."""
        self.Rcw = self.map.kf_Rcw[k].copy()
        self.tcw = self.map.kf_tcw[k].copy()

    def _predict_pose(self):
        if self.external_prediction is not None:
            R, t = self.external_prediction
            self.external_prediction = None
            self._last_pred_external = (R.astype(np.float32),
                                        t.astype(np.float32))
            return self._last_pred_external
        if self.velocity is None:
            return self.Rcw, self.tcw
        dR, dt = self.velocity
        return dR @ self.Rcw, dR @ self.tcw + dt

    # ------------------------------------------------------------------

    def track(self, frame: Frame) -> TrackState:
        """Main per-frame entry (Tracking::Track)."""
        self.last_new_kf = None
        if self.state == TrackState.NOT_INITIALIZED:
            has_depth = int((np.asarray(frame.depth) > 0).sum())
            if has_depth >= 100:
                self._stereo_initialization(frame)
            else:
                self._monocular_initialization(frame)
        else:
            self._track_frame(frame)
        self.trajectory.append(
            (float(frame.timestamp), self.Rcw.copy(), self.tcw.copy(),
             self.state.name)
        )
        # Relative trajectory (the reference's lRit/lpRefs lists,
        # System::SaveTrajectoryTUM src/System.cc:780-860): store the
        # frame pose RELATIVE to its reference keyframe so later map
        # optimization (local BA, loop closing, final GBA) improves the
        # recovered trajectory retroactively.
        ref = self.last_kf_id
        if ref >= 0 and self.map.kf_valid[ref]:
            R_ref, t_ref = self.map.kf_Rcw[ref], self.map.kf_tcw[ref]
            R_cr = self.Rcw @ R_ref.T
            t_cr = self.tcw - R_cr @ t_ref
            self.trajectory_rel.append(
                (float(frame.timestamp), int(ref), R_cr.astype(np.float32),
                 t_cr.astype(np.float32), self.state.name))
        else:
            self.trajectory_rel.append(
                (float(frame.timestamp), -1, self.Rcw.copy(),
                 self.tcw.copy(), self.state.name))
        self.frame_id += 1
        return self.state

    # ------------------------------------------------------------------

    def _stereo_initialization(self, frame: Frame):
        """Tracking::StereoInitialization — need >= 100 stereo-depth kps."""
        depth = np.asarray(frame.depth)
        valid = np.asarray(frame.valid)
        # Depth-gated like the reference (z < mThDepth): far single-view
        # stereo depth is quadratically noisy and poisons the initial map.
        good = valid & (depth > 0) & (depth < self.cfg.th_depth)
        if good.sum() < 100:
            good = valid & (depth > 0) & (depth < 2.0 * self.cfg.th_depth)
        if good.sum() < 100:
            return
        self.Rcw = np.eye(3, dtype=np.float32)
        self.tcw = np.zeros(3, np.float32)
        kp_idx = np.nonzero(good)[0]
        uv = np.asarray(frame.uv)[kp_idx]
        z = depth[kp_idx]
        rays = np.asarray(cm.unproject(self.cam, jnp.asarray(uv)))
        pw = rays * z[:, None]
        lm_ids = self.map.add_landmarks(
            pw.astype(np.float32),
            np.asarray(frame.desc)[kp_idx], first_kf=0)
        lm_idx_full = np.full(valid.shape[0], -1, np.int32)
        lm_idx_full[kp_idx] = lm_ids
        k = self._insert_keyframe(frame, lm_idx_full)
        self.last_kf_id = k
        self.last_new_kf = k
        self.ref_tracked = len(kp_idx)
        self.state = TrackState.OK

    def _monocular_initialization(self, frame: Frame):
        """Two-view init (Tracking::MonocularInitialization +
        Initializer::Initialize): essential-matrix RANSAC between a held
        reference frame and the current one; on success the map scale is
        normalized to unit median depth (CreateInitialMapMonocular)."""
        from ..solvers.initializer import monocular_init

        if self._mono_init_frame is None:
            if int(np.asarray(frame.valid).sum()) >= 100:
                self._mono_init_frame = frame
            return
        f0 = self._mono_init_frame
        idx, _ = _matching.match_descriptors(
            f0.desc, frame.desc, f0.valid, frame.valid,
            max_dist=60, ratio=0.8)
        idx = np.asarray(idx)
        rows = np.nonzero(idx >= 0)[0]
        if rows.size < 100:
            # too little overlap: re-anchor on the current frame
            self._mono_init_frame = frame
            return
        n_cap = f0.uv.shape[0]
        uv1 = np.zeros((n_cap, 2), np.float32)
        uv2 = np.zeros((n_cap, 2), np.float32)
        val = np.zeros(n_cap, bool)
        m = rows.size
        uv1[:m] = np.asarray(f0.uv)[rows]
        uv2[:m] = np.asarray(frame.uv)[idx[rows]]
        val[:m] = True
        res = monocular_init(
            jnp.asarray(uv1), jnp.asarray(uv2), jnp.asarray(val),
            self.cam, jax.random.PRNGKey(self.frame_id))
        if not bool(res.ok):
            return
        good = np.asarray(res.good)[:m]
        pw = np.asarray(res.pw)[:m]
        # Normalize scale: unit median depth (reference invMedianDepth).
        med = float(np.median(pw[good, 2])) if good.any() else 1.0
        if not np.isfinite(med) or med <= 1e-6:
            return
        inv = 1.0 / med
        pw = pw * inv
        R21 = np.asarray(res.R21, np.float32)
        t21 = np.asarray(res.t21, np.float32) * inv

        kp0 = rows[good]
        kp1 = idx[rows][good]
        lm_ids = self.map.add_landmarks(
            pw[good].astype(np.float32),
            np.asarray(f0.desc)[kp0], first_kf=0)
        lm0 = np.full(n_cap, -1, np.int32)
        lm1 = np.full(frame.uv.shape[0], -1, np.int32)
        lm0[kp0] = lm_ids
        lm1[kp1] = lm_ids
        # KF 0 at identity, KF 1 at (R21, t21).
        self.Rcw = np.eye(3, dtype=np.float32)
        self.tcw = np.zeros(3, np.float32)
        self.map.add_keyframe(
            Rcw=self.Rcw, tcw=self.tcw, timestamp=float(f0.timestamp),
            frame_id=self.frame_id - 1,
            uv=np.asarray(f0.uv), level=np.asarray(f0.level),
            desc=np.asarray(f0.desc), ur=np.asarray(f0.ur),
            depth=np.asarray(f0.depth), kp_valid=np.asarray(f0.valid),
            lm_idx=lm0)
        self.Rcw = normalize_rotation_np(R21)
        self.tcw = t21
        k1 = self._insert_keyframe(frame, lm1)
        self.last_kf_id = k1
        self.last_new_kf = k1
        self.ref_tracked = int(good.sum())
        self.state = TrackState.OK
        self._mono_init_frame = None

    # ------------------------------------------------------------------

    def push_correction(self, R_old, t_old, R_new, t_new):
        """Record a map-gauge correction dT = T_old^-1 ∘ T_new from the
        mapping worker; composes with any not-yet-applied correction
        (call under map.lock)."""
        dR = R_old.T @ R_new
        dt = R_old.T @ (t_new - t_old)
        if self.pending_correction is not None:
            # T·dA then ·dB  ==  T·(dA·dB): R = Ra Rb, t = Ra tb + ta
            Ra, ta = self.pending_correction
            dR, dt = Ra @ dR, Ra @ dt + ta
        self.pending_correction = (dR.astype(np.float32),
                                   dt.astype(np.float32))

    def _apply_pending_correction(self):
        corr = self.pending_correction
        if corr is None:
            return
        self.pending_correction = None
        dR, dt = corr
        # Tcw <- Tcw ∘ dT keeps the frame-to-KF relative pose while
        # adopting the BA-corrected map gauge: R' = R dR, t' = R dt + t.
        R_cur = self.Rcw
        self.Rcw = normalize_rotation_np(R_cur @ dR)
        self.tcw = (R_cur @ dt + self.tcw).astype(np.float32)

    def _track_frame(self, frame: Frame):
        with self.map.lock:
            self._apply_pending_correction()
            pw, desc, level, valid, lm_ids = self._local_landmark_slab()
        used_external = self.external_prediction is not None
        R0, t0 = self._predict_pose()
        # Tight window by default (wide windows re-admit the mismatches
        # that pin the pose valley); under rotational ACCELERATION the
        # constant-velocity prediction is off by fx*dω px, so the coarse
        # window widens with the measured rotation-rate change.  An
        # external (IMU/encoder) prediction tracks rotation directly —
        # its error does not grow with ω̇, so it keeps the tight window.
        coarse_r = self.cfg.match_radius_coarse
        if (not used_external and self.velocity is not None
                and self._prev_vel_rot is not None):
            dacc = self.velocity[0] @ self._prev_vel_rot.T
            cosang = np.clip((np.trace(dacc) - 1.0) / 2.0, -1.0, 1.0)
            ang = float(np.arccos(cosang))
            fx = float(getattr(self.cam, "fx", 400.0))
            coarse_r = min(
                coarse_r + self.cfg.adaptive_radius_gain * fx * ang,
                self.cfg.adaptive_radius_max)
        res = _track_kernel(
            jnp.asarray(R0), jnp.asarray(t0),
            jnp.asarray(pw), jnp.asarray(desc), jnp.asarray(level),
            jnp.asarray(valid),
            frame,
            jnp.asarray(self.map.inv_sigma2),
            jnp.asarray(self.map.level_scales.astype(np.float32)),
            jnp.asarray(coarse_r, jnp.float32),
            jnp.asarray(self.cfg.match_radius_fine, jnp.float32),
            jnp.asarray(self.bf, jnp.float32),
            self.cam,
            schedule=self.cfg.schedule,
            opt_mode=self.cfg.opt_mode,
        )
        n_inl = int(res.n_inliers)
        if n_inl < self.cfg.min_inliers_ok:
            # Wide-radius retries (recently-lost recovery, Tracking.h
            # time_recently_lost semantics): first from the PREDICTED
            # pose — under sustained rotation the last pose is a full
            # frame's rotation (fx*ω px) behind, while the prediction is
            # off only by the acceleration term — then from the last
            # known-good pose (covers a bad velocity/prediction spike).
            starts = [(R0, t0), (self.Rcw, self.tcw)]
            for Rr, tr_ in starts:
                res = _track_kernel(
                    jnp.asarray(Rr), jnp.asarray(tr_),
                    jnp.asarray(pw), jnp.asarray(desc), jnp.asarray(level),
                    jnp.asarray(valid),
                    frame,
                    jnp.asarray(self.map.inv_sigma2),
                    jnp.asarray(self.map.level_scales.astype(np.float32)),
                    jnp.asarray(self.cfg.lost_retry_radius, jnp.float32),
                    jnp.asarray(self.cfg.match_radius_fine, jnp.float32),
                    jnp.asarray(self.bf, jnp.float32),
                    self.cam,
                    schedule=self.cfg.schedule,
                    opt_mode=self.cfg.opt_mode,
                )
                n_inl = int(res.n_inliers)
                if n_inl >= self.cfg.min_inliers_ok:
                    break
        if n_inl < self.cfg.min_inliers_ok:
            # ODOMOK bridge (Tracking::TrackWithOnlyOdom, src/Tracking.cc
            # :79): a healthy odometry prediction carries the pose through
            # a visual dropout instead of going LOST; each frame retries
            # vision from the dead-reckoned pose.  Degrades to LOST after
            # odomok_max_frames.
            if (self._last_pred_external is not None
                    and self.odomok_frames < self.cfg.odomok_max_frames):
                self.Rcw, self.tcw = self._last_pred_external
                self._last_pred_external = None
                self.velocity = None
                self.odomok_frames += 1
                self.state = TrackState.ODOMOK
                # The reference's c3 keyframe condition (Tracking.cc:2145,
                # :2181): ODOMOK frames with enough close stereo depth
                # STILL insert keyframes at the dead-reckoned pose — this
                # is how unmapped territory swept during a visual dropout
                # (or a fast rotation through fresh structure) gets
                # landmarks, so vision can re-acquire instead of staying
                # blind until relocalization.  Local mapping creates the
                # points from the KF's depth (CreateNewKeyFrame's close-
                # point loop runs for ODOMOK too, Tracking.cc:2290).
                depth = np.asarray(frame.depth)
                kp_valid = np.asarray(frame.valid)
                n_close = int((kp_valid & (depth > 0)
                               & (depth < 2.0 * self.cfg.th_depth)).sum())
                if self.frames_since_kf >= 2 and n_close > 70:
                    with self.map.lock:
                        lm_idx_full = np.full(kp_valid.shape[0], -1,
                                              np.int32)
                        k = self._insert_keyframe(frame, lm_idx_full)
                        self.last_kf_id = k
                        self.last_new_kf = k
                        self.frames_since_kf = 0
                else:
                    self.frames_since_kf += 1
                return
            self.state = TrackState.LOST
            self.velocity = None
            self._prev_vel_rot = None
            self._last_pred_external = None
            return
        self.odomok_frames = 0
        self._last_pred_external = None
        R_prev, t_prev = self.Rcw.copy(), self.tcw.copy()
        # Re-project onto SO(3): the velocity model amplifies any
        # off-manifold residue geometrically (see normalize_rotation_np).
        self.Rcw = normalize_rotation_np(np.asarray(res.Rcw))
        self.tcw = np.asarray(res.tcw)
        # velocity: Tcw_k ∘ Twc_{k-1}
        dR = self.Rcw @ R_prev.T
        dt = self.tcw - dR @ t_prev
        self._prev_vel_rot = self.velocity[0] \
            if self.velocity is not None else None
        self.velocity = (dR.astype(np.float32), dt.astype(np.float32))
        self.state = TrackState.OK
        self.last_result = res
        self.last_lm_ids = lm_ids
        self.last_slab = (pw, lm_ids)
        self.frames_since_kf += 1
        # found/visible bookkeeping (MapPoint::IncreaseVisible/Found): the
        # ratio cull kills landmarks that keep failing association (bad
        # depth / duplicates).
        vis_ids = lm_ids[np.asarray(res.in_frustum) & (lm_ids >= 0)]
        fnd_ids = lm_ids[np.asarray(res.inlier) & (lm_ids >= 0)]
        with self.map.lock:
            np.add.at(self.map.lm_visible, vis_ids, 1)
            np.add.at(self.map.lm_found, fnd_ids, 1)

            if self._need_new_keyframe(n_inl):
                lm_idx_full = self._frame_landmark_assoc(
                    res, lm_ids, np.asarray(frame.valid))
                k = self._insert_keyframe(frame, lm_idx_full)
                self.last_kf_id = k
                self.last_new_kf = k
                self.ref_tracked = n_inl
                self.frames_since_kf = 0

    # ------------------------------------------------------------------

    def _frame_landmark_assoc(self, res: TrackKernelResult,
                              lm_ids: np.ndarray, kp_valid: np.ndarray):
        """[N]-sized landmark id per keypoint from the track result."""
        lm_match = np.asarray(res.lm_match)     # [LC] -> kp idx
        inlier = np.asarray(res.inlier)
        n_kp = kp_valid.shape[0]
        out = np.full(n_kp, -1, np.int32)
        ok = (lm_match >= 0) & inlier & (lm_ids >= 0)
        # async mapping: a slab landmark may have been culled by the
        # mapper between the slab snapshot and this KF insertion
        ok &= self.map.lm_valid[np.clip(lm_ids, 0, None)]
        out[lm_match[ok]] = lm_ids[ok]
        return out

    def _need_new_keyframe(self, n_inliers: int) -> bool:
        """NeedNewKeyFrame (Tracking.cc:2010) simplified: 90% rule +
        min/max frame intervals."""
        if self.frames_since_kf < self.cfg.kf_min_interval:
            return False
        if self.frames_since_kf >= self.cfg.kf_max_interval:
            return True
        return n_inliers < self.cfg.kf_tracked_ratio * max(self.ref_tracked, 1)

    def _insert_keyframe(self, frame: Frame, lm_idx_full: np.ndarray) -> int:
        f_uv = np.asarray(frame.uv)
        n = f_uv.shape[0]
        k = self.map.add_keyframe(
            Rcw=self.Rcw, tcw=self.tcw,
            timestamp=float(frame.timestamp), frame_id=self.frame_id,
            uv=f_uv, level=np.asarray(frame.level),
            desc=np.asarray(frame.desc), ur=np.asarray(frame.ur),
            depth=np.asarray(frame.depth),
            kp_valid=np.asarray(frame.valid), lm_idx=lm_idx_full,
        )
        return k
