"""VIO backend: PRV sliding-window local BA + PRV global/init GBA.

Orchestration equivalent of the reference's backend IMU solves — the
LocalMapping thread's call into LocalBundleAdjustmentNavStatePRV
(src/LocalMapping.cc:129-147 -> src/Optimizer.cc:21) once VINS is
initialized, and LoopClosing's init-GBA
(LoopClosing.cc:720-744 -> GlobalBundleAdjustmentNavStatePRV with the
gravity-direction vertex and bias prior). Problem assembly is host-side
numpy against the MapState arrays; the solve is one jitted program
(solvers/vio_local_ba.vio_ba).

IMU raw measurements live in the frontend's ring buffer keyed by time;
chains between consecutive keyframes are re-preintegrated on demand at
the KFs' current bias linearization points (the reference splices raw
measurement lists into KeyFrames for the same purpose, KeyFrame.h:94-123).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..map.map_state import MapState
from ..math.navstate import NavState, tcw_from_navstate
from ..math.preintegration import EncPreint, preintegrate_imu
from ..solvers.vio_local_ba import VioBAConfig, VioBAProblem, vio_ba


@dataclasses.dataclass
class VioBackendConfig:
    window_size: int = 10         # temporal window (LocalWindowSize)
    fixed_covis: int = 12         # covisible fixed-PR KFs cap (ref: 200)
    chain_sample_cap: int = 256   # IMU samples per KF-KF chain
    sigma_g: float = 1.7e-4
    sigma_a: float = 2e-3
    sigma_bg_rw: float = 2e-4
    sigma_ba_rw: float = 2e-3
    kf_pad: int = 4
    lm_pad: int = 1024
    stage_iters: tuple = (4, 6)
    gba_stage_iters: tuple = (6, 10)
    # Zero-mean bias prior applied to the newest window KF in the local
    # BA (spreads through the stiff bias-RW chains).  Bias components
    # unobservable in low-excitation segments (e.g. the gravity-axis
    # accel bias under yaw-only motion) otherwise absorb velocity error
    # and bend every window — this bounds them at the prior scale.
    window_prior_sigma_bg: float = 0.02
    window_prior_sigma_ba: float = 0.12


@functools.partial(jax.jit, static_argnames=("stage_iters", "opt_scale",
                                              "opt_gdir", "use_enc"))
def _vio_ba_jit(prob, cam, cfg, stage_iters, opt_scale, opt_gdir, use_enc):
    return vio_ba(prob, cam, cfg, stage_iters=stage_iters,
                  opt_scale=opt_scale, opt_gdir=opt_gdir, use_enc=use_enc)


class VioBackend:
    """Builds and runs NavState-window BAs against the MapState."""

    def __init__(self, map_state: MapState, cam, bf: float, ring,
                 Rcb, tcb, cfg: Optional[VioBackendConfig] = None,
                 enc_ring=None, Rbe=None, tbe=None,
                 enc_half_track: float = 0.28, enc_sigma_v: float = 0.01):
        self.map = map_state
        self.cam = cam
        self.bf = float(bf)
        self.ring = ring                    # native OdomRing (IMU)
        self.enc_ring = enc_ring
        self.Rcb = np.asarray(Rcb, np.float32)
        self.tcb = np.asarray(tcb, np.float32)
        self.Rbe = np.eye(3, dtype=np.float32) if Rbe is None else \
            np.asarray(Rbe, np.float32)
        self.tbe = np.zeros(3, np.float32) if tbe is None else \
            np.asarray(tbe, np.float32)
        self._enc_half_track = float(enc_half_track)
        self._enc_sigma_v = float(enc_sigma_v)
        self.cfg = cfg or VioBackendConfig()
        self.gravity = np.array([0, 0, -9.81], np.float32)

    # ------------------------------------------------------------------

    def _navstates(self, kf_ids: np.ndarray) -> NavState:
        """NavStates for KFs: R, p from the CURRENT optimized Tcw (vision
        BAs move Tcw; Rwb/pwb snapshots go stale), v/bg/ba from storage."""
        m = self.map
        Rcw = m.kf_Rcw[kf_ids]
        tcw = m.kf_tcw[kf_ids]
        Rwc = np.swapaxes(Rcw, -1, -2)
        twc = -np.einsum("kij,kj->ki", Rwc, tcw)
        Rbc = self.Rcb.T
        tbc = -Rbc @ self.tcb
        Rwb = Rwc @ self.Rcb
        pwb = np.einsum("kij,j->ki", Rwc, tbc) + twc
        z = np.zeros((len(kf_ids), 3), np.float32)
        return NavState(
            R=jnp.asarray(Rwb.astype(np.float32)),
            p=jnp.asarray(pwb.astype(np.float32)),
            v=jnp.asarray(m.kf_vwb[kf_ids]),
            bg=jnp.asarray(m.kf_bg[kf_ids]),
            ba=jnp.asarray(m.kf_ba[kf_ids]),
            dbg=jnp.asarray(z), dba=jnp.asarray(z),
        )

    def _chains(self, kf_ids: np.ndarray):
        """Batched IMU (+encoder) preintegrations between consecutive
        kf_ids, re-integrated at each i-side KF's bias."""
        m = self.map
        T = self.cfg.chain_sample_cap
        C = len(kf_ids) - 1
        gyro = np.zeros((C, T, 3), np.float32)
        acc = np.zeros((C, T, 3), np.float32)
        dts = np.zeros((C, T), np.float32)
        mask = np.zeros((C, T), bool)
        bg = np.zeros((C, 3), np.float32)
        ba = np.zeros((C, 3), np.float32)
        valid = np.zeros(C, bool)
        for c in range(C):
            t0 = float(m.kf_timestamp[kf_ids[c]])
            t1 = float(m.kf_timestamp[kf_ids[c + 1]])
            vals, d, mk, n = self.ring.window(t0, t1, T)
            if n == 0 or n > T:
                continue
            gyro[c], acc[c] = vals[:, :3], vals[:, 3:]
            dts[c], mask[c] = d, mk
            bg[c] = m.kf_bg[kf_ids[c]]
            ba[c] = m.kf_ba[kf_ids[c]]
            valid[c] = True
        pre = jax.vmap(
            lambda g, a, d, b1, b2, mk: preintegrate_imu(
                g, a, d, b1, b2, self.cfg.sigma_g, self.cfg.sigma_a,
                mask=mk)
        )(jnp.asarray(gyro), jnp.asarray(acc), jnp.asarray(dts),
          jnp.asarray(bg), jnp.asarray(ba), jnp.asarray(mask))
        return pre, valid

    def _empty_enc(self, C: int):
        return EncPreint(
            dR=jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (C, 3, 3)),
            dp=jnp.zeros((C, 3), jnp.float32),
            cov=jnp.broadcast_to(jnp.eye(6, dtype=jnp.float32), (C, 6, 6)),
            dt=jnp.zeros(C, jnp.float32)), np.zeros(C, bool)

    # ------------------------------------------------------------------

    def _build(self, window: np.ndarray, fixed_pr_kfs: np.ndarray,
               lm_ids: np.ndarray, *, fix_vb_of_fixed=True,
               prior_bias: Optional[np.ndarray] = None,
               prior_dt: float = 0.0):
        """Assemble a padded VioBAProblem.

        Keyframe order: [window..., fixed...]; chains run along the
        temporal sequence inside `window` (which must be time-ordered and
        include the anchor KF first).
        """
        m = self.map
        cfg = self.cfg
        kf_order = np.concatenate([window, fixed_pr_kfs]).astype(int)
        K = len(kf_order)
        Kp = -(-K // cfg.kf_pad) * cfg.kf_pad
        prob_np, _, lm_ids = m.build_ba_problem(window, fixed_pr_kfs,
                                                lm_ids)
        M = prob_np["pw"].shape[0]
        Mp = -(-M // cfg.lm_pad) * cfg.lm_pad

        ns = self._navstates(kf_order)
        # pad states to Kp with identity
        def padk(a, fill=0.0):
            pad = [(0, Kp - K)] + [(0, 0)] * (a.ndim - 1)
            return np.pad(np.asarray(a), pad, constant_values=fill)
        R_p = padk(ns.R)
        R_p[K:] = np.eye(3, dtype=np.float32)
        ns_p = NavState(
            R=jnp.asarray(R_p), p=jnp.asarray(padk(ns.p)),
            v=jnp.asarray(padk(ns.v)), bg=jnp.asarray(padk(ns.bg)),
            ba=jnp.asarray(padk(ns.ba)), dbg=jnp.asarray(padk(ns.dbg)),
            dba=jnp.asarray(padk(ns.dba)))

        fixed_pr = np.ones(Kp, bool)
        fixed_pr[:len(window)] = False
        fixed_pr[0] = True               # gauge anchor: first window KF...
        # ...unless there are enough other fixed poses (covisible ring).
        if len(fixed_pr_kfs) > 0:
            fixed_pr[0] = False
        fixed_vb = np.ones(Kp, bool)
        fixed_vb[:len(window)] = False
        if not fix_vb_of_fixed and len(fixed_pr_kfs) > 0:
            fixed_vb[len(window):K] = False

        # temporal chains inside the window
        pre, cvalid = self._chains(window)
        C = len(window) - 1
        Cp = max(C, 1)
        chain_i = np.arange(Cp, dtype=np.int32)
        chain_j = np.arange(1, Cp + 1, dtype=np.int32)
        if C == 0:
            cvalid = np.zeros(1, bool)
            pre = jax.tree.map(
                lambda a: jnp.zeros((1,) + a.shape[1:], a.dtype), pre)
        cweight = np.ones(Cp, np.float32)
        # down-weight chains whose i-side bias is fixed (Optimizer.cc:969)
        cweight[fixed_vb[chain_i]] = 1e-2

        enc_pre, enc_valid = self._empty_enc(Cp)
        if self.enc_ring is not None:
            from ..math.preintegration import preintegrate_encoder
            ev = np.zeros((Cp, self.cfg.chain_sample_cap, 2), np.float32)
            ed = np.zeros((Cp, self.cfg.chain_sample_cap), np.float32)
            em = np.zeros((Cp, self.cfg.chain_sample_cap), bool)
            for c in range(C):
                t0 = float(m.kf_timestamp[window[c]])
                t1 = float(m.kf_timestamp[window[c + 1]])
                vals, d, mk, n = self.enc_ring.window(
                    t0, t1, self.cfg.chain_sample_cap)
                if n == 0 or n > self.cfg.chain_sample_cap:
                    continue
                ev[c] = vals[:, :2]
                ed[c], em[c] = d, mk
                enc_valid[c] = True
            if enc_valid.any():
                enc_pre = jax.vmap(
                    lambda vl, vr, d, mk: preintegrate_encoder(
                        vl, vr, d, self._enc_half_track,
                        self._enc_sigma_v, mask=mk)
                )(jnp.asarray(ev[..., 0]), jnp.asarray(ev[..., 1]),
                  jnp.asarray(ed), jnp.asarray(em))

        if prior_bias is not None:
            dt = max(prior_dt, 1e-3)
            info6 = np.concatenate([
                np.full(3, 1.0 / (self.cfg.sigma_bg_rw ** 2 * dt)),
                np.full(3, 1.0 / (self.cfg.sigma_ba_rw ** 2 * dt)),
            ]).astype(np.float32)
        else:
            info6 = np.zeros(6, np.float32)

        def padm(a, n, fill=0):
            w = [(0, n - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
            return np.pad(a, w, constant_values=fill)

        prob = VioBAProblem(
            ns=ns_p,
            fixed_pr=jnp.asarray(fixed_pr),
            fixed_vb=jnp.asarray(fixed_vb),
            pw=jnp.asarray(padm(prob_np["pw"], Mp)),
            lm_valid=jnp.asarray(padm(prob_np["lm_valid"], Mp, False)),
            obs_kf=jnp.asarray(padm(prob_np["obs_kf"], Mp, -1)),
            obs_uv=jnp.asarray(padm(prob_np["obs_uv"], Mp)),
            obs_ur=jnp.asarray(padm(prob_np["obs_ur"], Mp, -1.0)),
            obs_inv_sigma2=jnp.asarray(
                padm(prob_np["obs_inv_sigma2"], Mp, 1.0)),
            obs_valid=jnp.asarray(padm(prob_np["obs_valid"], Mp, False)),
            chain_i=jnp.asarray(chain_i), chain_j=jnp.asarray(chain_j),
            chain_valid=jnp.asarray(cvalid),
            chain_weight=jnp.asarray(cweight),
            imu_pre=pre,
            enc_pre=enc_pre, enc_valid=jnp.asarray(enc_valid),
            prior_idx=jnp.asarray(0, jnp.int32),
            prior_info6=jnp.asarray(info6),
        )
        return prob, kf_order, lm_ids

    # ------------------------------------------------------------------

    def _solve_cfg(self):
        return VioBAConfig(
            Rcb=jnp.asarray(self.Rcb), tcb=jnp.asarray(self.tcb),
            bf=jnp.asarray(self.bf, jnp.float32),
            gravity=jnp.asarray(self.gravity),
            sigma_bg_rw=self.cfg.sigma_bg_rw,
            sigma_ba_rw=self.cfg.sigma_ba_rw,
            Rbe=jnp.asarray(self.Rbe), tbe=jnp.asarray(self.tbe),
        )

    def _apply(self, res, kf_order, lm_ids, n_free: int) -> bool:
        """Write optimized NavStates back: Tcw + NavState fields."""
        m = self.map
        ns = jax.tree.map(np.asarray, res.ns)
        if not (np.isfinite(ns.p[:n_free]).all()
                and np.isfinite(ns.R[:n_free]).all()
                and np.isfinite(ns.v[:n_free]).all()):
            return False
        Rcw, tcw = tcw_from_navstate(
            jax.tree.map(jnp.asarray, res.ns),
            jnp.asarray(self.Rcb), jnp.asarray(self.tcb))
        Rcw, tcw = np.asarray(Rcw), np.asarray(tcw)
        free = kf_order[:n_free]
        from ..math.lie import normalize_rotation_np

        # re-project onto SO(3) at the write-back boundary (see
        # lie.normalize_rotation_np for the amplification mechanism)
        m.kf_Rcw[free] = normalize_rotation_np(Rcw[:n_free])
        m.kf_tcw[free] = tcw[:n_free]
        m.kf_Rwb[free] = normalize_rotation_np(ns.R[:n_free])
        m.kf_pwb[free] = ns.p[:n_free]
        m.kf_vwb[free] = ns.v[:n_free]
        m.kf_bg[free] = (ns.bg + ns.dbg)[:n_free]
        m.kf_ba[free] = (ns.ba + ns.dba)[:n_free]
        pw = np.asarray(res.pw)[:len(lm_ids)]
        pw_ok = np.isfinite(pw).all(axis=1)
        m.lm_pw[lm_ids[pw_ok]] = pw[pw_ok]
        m.version += 1
        return True

    # ------------------------------------------------------------------

    def run_local_ba(self, k: int) -> bool:
        """PRV sliding-window local BA around keyframe k
        (LocalBundleAdjustmentNavStatePRV, Optimizer.cc:21-770).

        Runs in the tracking thread; map.lock scopes the problem build
        and the write-back against the async-mapping worker."""
        m = self.map
        cfg = self.cfg
        with m.lock:
            # temporal window: walk kf_prev from k
            window = [k]
            cur = k
            while len(window) < cfg.window_size + 1:
                p = int(m.kf_prev[cur])
                if p < 0:
                    break
                window.append(p)
                cur = p
            window = np.asarray(window[::-1], int)  # oldest first
            if len(window) < 3:
                return False
            lm_ids = m.landmarks_in_keyframes(window)
            lm_ids = lm_ids[m.lm_valid[lm_ids]]
            if lm_ids.size < 10:
                return False
            obs_any = np.isin(m.kf_lm_idx, lm_ids) & (m.kf_lm_idx >= 0)
            ring = np.nonzero(obs_any.any(axis=1) & m.kf_valid)[0]
            ring = np.setdiff1d(ring, window)[: cfg.fixed_covis]
            # The oldest window KF is the temporal anchor: fixed PR +
            # fixed V/Bias (the reference fixes the N+1-th KF entirely).
            prob, kf_order, lm_ids = self._build(window, ring, lm_ids)
        n_window = len(window)
        fixed_pr = np.asarray(prob.fixed_pr).copy()
        fixed_vb = np.asarray(prob.fixed_vb).copy()
        fixed_pr[0] = True
        fixed_vb[0] = True
        # CRITICAL: chains whose i-side V/bias is frozen must be
        # down-weighted (Optimizer.cc:969's 1e-2 on the N+1-th KF's
        # chain).  The anchor's stored velocity carries estimation error;
        # at full weight the solver explains it with a fictitious accel
        # bias (dba ~ v_err/dt) that then bends every window — the
        # round-2 systematic-drift bug.
        cw = np.asarray(prob.chain_weight).copy()
        ci = np.asarray(prob.chain_i)
        cw[fixed_vb[ci]] = 1e-2
        info6 = np.concatenate([
            np.full(3, 1.0 / self.cfg.window_prior_sigma_bg ** 2),
            np.full(3, 1.0 / self.cfg.window_prior_sigma_ba ** 2),
        ]).astype(np.float32)
        prob = prob._replace(fixed_pr=jnp.asarray(fixed_pr),
                             fixed_vb=jnp.asarray(fixed_vb),
                             chain_weight=jnp.asarray(cw),
                             prior_idx=jnp.asarray(n_window - 1, jnp.int32),
                             prior_info6=jnp.asarray(info6))
        res = _vio_ba_jit(prob, self.cam, self._solve_cfg(),
                          cfg.stage_iters, False, False,
                          bool(self.enc_ring is not None))
        with m.lock:
            return self._apply(res, kf_order, lm_ids, n_free=n_window)

    def run_global_ba(self, *, opt_scale=False, opt_gdir=False,
                      init_prior=False) -> bool:
        """PRV global BA over all keyframes; with opt_scale/opt_gdir and
        the initial-bias prior this is the VI-init follow-up GBA
        (GlobalBundleAdjustmentNavStatePRV + VertexGThetaXYRwI)."""
        m = self.map
        with m.lock:
            kfs = m.keyframe_ids()
            if len(kfs) < 4:
                return False
            window = kfs                   # all free except gauge below
            lm_ids = m.landmarks_in_keyframes(kfs)
            lm_ids = lm_ids[m.lm_valid[lm_ids]]
            if lm_ids.size < 10:
                return False
            prior_bias = None
            prior_dt = 0.0
            if init_prior:
                prior_bias = np.concatenate(
                    [m.kf_bg[kfs[0]], m.kf_ba[kfs[0]]])
                prior_dt = float(m.kf_timestamp[kfs[-1]]
                                 - m.kf_timestamp[kfs[0]])
            prob, kf_order, lm_ids = self._build(
                window, np.zeros(0, int), lm_ids,
                prior_bias=prior_bias, prior_dt=prior_dt)
        # gauge: first KF fixed PR; V/Bias free iff init mode
        fixed_pr = np.asarray(prob.fixed_pr).copy()
        fixed_vb = np.asarray(prob.fixed_vb).copy()
        fixed_pr[0] = True
        fixed_vb[0] = not init_prior
        prob = prob._replace(fixed_pr=jnp.asarray(fixed_pr),
                             fixed_vb=jnp.asarray(fixed_vb))
        res = _vio_ba_jit(prob, self.cam, self._solve_cfg(),
                          self.cfg.gba_stage_iters, opt_scale, opt_gdir,
                          bool(self.enc_ring is not None))
        with m.lock:
            ok = self._apply(res, kf_order, lm_ids, n_free=len(window))
            if not ok:
                return False
            s = float(res.scale)
            if opt_scale and np.isfinite(s) and abs(s - 1.0) > 1e-4:
                # apply the residual metric scale to the whole map (the
                # solver's scale gauge: p_metric = s * p_visual).
                m.lm_pw[m.lm_valid] *= s
                sel = m.kf_valid
                m.kf_tcw[sel] *= s
                m.kf_pwb[sel] *= s
                m.version += 1
            if opt_gdir:
                self.gravity = np.asarray(res.gravity, np.float32)
            m.big_change_idx += 1
        return True
