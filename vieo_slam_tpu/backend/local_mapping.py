"""Local mapping: keyframe processing, landmark creation/culling, local BA.

TPU-native equivalent of src/LocalMapping.cc (Run :56, ProcessNewKeyFrame
:233, MapPointCulling :351, CreateNewMapPoints :650, SearchInNeighbors :833,
KeyFrameCulling :383) — run synchronously after keyframe insertion instead
of on a 3 ms-polling thread; the map's version counter gives tracking the
same bMapUpdated signal the reference derives from change indices.

Heavy steps (triangulation, fuse matching, windowed BA) are jitted device
programs; window selection and bookkeeping are host-side numpy.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..cameras import models as cm
from ..map.map_state import MapState
from ..ops import matching
from ..solvers.local_ba import BAProblem, local_ba
from .triangulation import triangulate_pair


@dataclasses.dataclass
class LocalMappingConfig:
    window_size: int = 8          # optimized covisible KFs (LocalWindowSize)
    fixed_ring: int = 8           # pose-fixed first-ring cap
    max_new_points: int = 300     # per-KF new landmark cap (close stereo)
    close_depth: float = 4.0      # depth gate for direct stereo creation
                                  # (~35 x baseline, Tracking mThDepth)
    triangulate_neighbors: int = 4  # KF pairs tried per new KF
    cull_min_found_ratio: float = 0.25
    cull_obs_window: int = 3      # KFs within which a LM must earn >=3 obs
    ba_kf_pad: int = 4            # pad K to a multiple (compile reuse)
    ba_lm_pad: int = 1024         # pad M to a multiple
    kf_cull_redundancy: float = 0.9
    kf_cull_max_per_pass: int = 1   # at most N culled per new KF
    kf_cull_min_age: int = 6        # never cull the most recent KFs
    kf_cull_min_map: int = 16       # keep small maps intact
    # Never cull a KF whose removal leaves a temporal hole longer than
    # this between its chain neighbours (seconds). The reference relies
    # on its scale condition to keep a skeleton; a slow rig revisiting
    # one texture-rich region can still serially cull an entire
    # trajectory arc (observed: mono circle kept KFs only at t<3.6 and
    # the revisit, a 15 s hole no GBA can bridge). Applies to vision;
    # VIO additionally bounds the gap by vio_timespan_cap.
    kf_cull_max_gap: float = 2.0
    # Pre-GBA moving-object cull: erase landmarks whose refit median
    # chi2 exceeds this (no single static 3D point explains their
    # observations — dynamic scene content; static landmarks refit to
    # chi2 ~1, moving ones to hundreds).  A global BA — especially the
    # free-scale mono one — that reconciles such observations warps the
    # whole solution (measured: mono fullBA 0.0055->0.0076 with 2%
    # dynamic landmarks, improvement without them).  0 disables.
    gba_moving_cull_chi2: float = 20.0
    gba_moving_cull_min_obs: int = 4


# A single jitted BA entry per padded shape; the pad sizes keep the number
# of compiled variants small across a run.
@functools.partial(jax.jit, static_argnames=("stage_iters",))
def _ba_jit(prob: BAProblem, cam: cm.Camera, bf, stage_iters=(5, 10),
            init_active=None):
    return local_ba(prob, cam, bf, stage_iters=stage_iters,
                    init_active=init_active)


class LocalMapper:
    def __init__(self, cam: cm.Camera, bf: float, map_state: MapState,
                 cfg: LocalMappingConfig | None = None):
        self.cam = cam
        self.bf = float(bf)
        self.map = map_state
        self.cfg = cfg or LocalMappingConfig()
        self.recent_lms: list[tuple[int, np.ndarray]] = []  # (kf, lm_ids)
        # Once VIO is initialized the keyframe backend solve is the PRV
        # sliding-window BA run by vio.backend.VioBackend (the reference
        # switches LocalMapping to LocalBundleAdjustmentNavStatePRV,
        # LocalMapping.cc:129-147); the VioFrontend sets this flag so the
        # vision-only local BA stops competing with it.
        self.skip_local_ba = False
        # set by the VIO frontend once odometry is fused: enables the
        # KF-culling timespan rule
        self.vio_active = False
        self.vio_timespan_cap = 0.5

    # ------------------------------------------------------------------

    def process_keyframe(self, k: int):
        """Full LocalMapping::Run body for one new keyframe.

        Lock discipline (async pipeline, SURVEY §2.4 host-side pipeline
        concurrency): every host-side map mutation runs under map.lock in
        short bursts; the local-BA device solve — the dominant latency —
        runs UNLOCKED so tracking proceeds concurrently (run_local_ba
        splits prep / solve / write-back itself)."""
        from ..utils.metrics import metrics

        m = self.map
        with metrics.timer("lm.create_points"), m.lock:
            new_ids = self.create_close_landmarks(k)
            tri_ids = self.triangulate_new_landmarks(k)
        new_ids = np.concatenate([new_ids, tri_ids])
        metrics.count("landmarks_created", int(new_ids.size))
        if new_ids.size:
            self.recent_lms.append((k, new_ids))
        with metrics.timer("lm.cull"), m.lock:
            self.cull_landmarks(k)
        if not self.skip_local_ba:
            with metrics.timer("lm.local_ba"):
                self.run_local_ba(k)
        with metrics.timer("lm.kf_cull"), m.lock:
            self.cull_keyframes(k)
        # MapPoint maintenance (distinctive descriptor, normal, scale
        # band) over everything this KF touches — src/MapPoint.cc
        # ComputeDistinctiveDescriptors / UpdateNormalAndDepth.
        with m.lock:
            touched = m.kf_lm_idx[k]
            m.update_landmark_geometry(touched[touched >= 0])

    # ------------------------------------------------------------------

    def create_close_landmarks(self, k: int) -> np.ndarray:
        """Create landmarks from stereo/RGB-D depth for untracked keypoints
        (CreateNewKeyFrame close-MP creation, Tracking.cc:2196-2294), with a
        fuse-first pass (ORBmatcher::Fuse semantics): an unassociated
        keypoint that matches an existing local landmark adopts it instead
        of spawning a duplicate — duplicates otherwise compete in matching
        and corrode the map."""
        m = self.map
        depth = m.kf_depth[k]
        self._fuse_into_keyframe(k)
        unassoc = (m.kf_lm_idx[k] < 0) & m.kf_kp_valid[k] & (depth > 0)
        kp_idx = np.nonzero(unassoc)[0]
        if kp_idx.size == 0:
            return np.zeros(0, np.int64)
        # Reference semantics (Tracking::CreateNewKeyFrame): take close
        # points (z < thDepth) in depth order; if fewer than 100, keep
        # adding far ones by depth — far coverage beats no coverage when
        # the view turns toward distant structure.
        order = np.argsort(depth[kp_idx], kind="stable")
        kp_idx = kp_idx[order]
        n_close = int((depth[kp_idx] < self.cfg.close_depth).sum())
        n_take = min(max(n_close, 100), self.cfg.max_new_points)
        kp_idx = kp_idx[:n_take]
        uv = m.kf_uv[k, kp_idx]
        z = depth[kp_idx]
        rays = np.asarray(cm.unproject(self.cam, jnp.asarray(uv)))
        pc = rays * z[:, None]
        Rwc = m.kf_Rcw[k].T
        pw = pc @ Rwc.T + (-Rwc @ m.kf_tcw[k])
        lm_ids = m.add_landmarks(
            pw.astype(np.float32), m.kf_desc[k, kp_idx], first_kf=k)
        m.kf_lm_idx[k, kp_idx] = lm_ids
        np.add.at(m.lm_n_obs, lm_ids, 1)
        m.version += 1
        return lm_ids

    def _fuse_into_keyframe(self, k: int):
        """Associate existing covisible landmarks with this KF's
        still-unmatched keypoints (SearchInNeighbors direction 1)."""
        m = self.map
        neigh, _ = m.covisible_keyframes(k, min_shared=5)
        kfs = np.concatenate([[k], neigh[:10]])
        lm_ids = m.landmarks_in_keyframes(kfs)
        lm_ids = lm_ids[m.lm_valid[lm_ids]]
        already = set(int(x) for x in m.kf_lm_idx[k] if x >= 0)
        lm_ids = np.asarray([l for l in lm_ids if int(l) not in already],
                            dtype=np.int64)
        if lm_ids.size == 0:
            return
        free_kp = (m.kf_lm_idx[k] < 0) & m.kf_kp_valid[k]
        pc = m.lm_pw[lm_ids] @ m.kf_Rcw[k].T + m.kf_tcw[k]
        uv_proj = np.array(cm.project(self.cam, jnp.asarray(pc)))
        vis = (pc[:, 2] > 0.1) \
            & np.array(cm.in_image(self.cam, jnp.asarray(uv_proj), 1.0))
        idx, dist = matching.fuse_candidates(
            jnp.asarray(uv_proj), jnp.zeros(len(lm_ids), jnp.int32),
            jnp.asarray(m.lm_desc[lm_ids]), jnp.asarray(vis),
            jnp.asarray(m.kf_uv[k]), jnp.asarray(m.kf_level[k]),
            jnp.asarray(m.kf_desc[k]), jnp.asarray(free_kp),
            radius=4.0,
            level_scales=jnp.asarray(
                m.level_scales.astype(np.float32)),
        )
        idx = np.asarray(idx)
        ok = idx >= 0
        m.kf_lm_idx[k, idx[ok]] = lm_ids[ok]
        np.add.at(m.lm_n_obs, lm_ids[ok], 1)
        m.version += 1

    def triangulate_new_landmarks(self, k: int) -> np.ndarray:
        """Two-view triangulation vs covisible neighbours
        (CreateNewMapPoints, LocalMapping.cc:650): far structure enters the
        map only once enough baseline has accumulated — the parallax gate
        rejects pairs whose baseline/depth ratio is hopeless, which is what
        keeps far-landmark error bounded (single-view stereo depth at range
        is quadratically worse)."""
        m = self.map
        neigh, _ = m.covisible_keyframes(k, min_shared=5)
        neigh = neigh[: self.cfg.triangulate_neighbors]
        created = []
        scales = jnp.asarray(m.level_scales.astype(np.float32))
        is2 = jnp.asarray(m.inv_sigma2)
        for n in neigh:
            free_k = (m.kf_lm_idx[k] < 0) & m.kf_kp_valid[k]
            free_n = (m.kf_lm_idx[n] < 0) & m.kf_kp_valid[n]
            if free_k.sum() < 10 or free_n.sum() < 10:
                continue
            res = triangulate_pair(
                jnp.asarray(m.kf_Rcw[k]), jnp.asarray(m.kf_tcw[k]),
                jnp.asarray(m.kf_uv[k]), jnp.asarray(m.kf_level[k]),
                jnp.asarray(m.kf_desc[k]), jnp.asarray(free_k),
                jnp.asarray(m.kf_Rcw[n]), jnp.asarray(m.kf_tcw[n]),
                jnp.asarray(m.kf_uv[n]), jnp.asarray(m.kf_level[n]),
                jnp.asarray(m.kf_desc[n]), jnp.asarray(free_n),
                is2, scales, self.cam,
            )
            good = np.asarray(res.good)
            kp1 = np.nonzero(good)[0]
            if kp1.size == 0:
                continue
            kp2 = np.asarray(res.kp2)[kp1]
            pw = np.asarray(res.pw)[kp1]
            ids = m.add_landmarks(pw.astype(np.float32),
                                  m.kf_desc[k, kp1], first_kf=k)
            m.kf_lm_idx[k, kp1] = ids
            m.kf_lm_idx[int(n), kp2] = ids
            np.add.at(m.lm_n_obs, ids, 2)
            m.version += 1
            created.append(ids)
        if not created:
            return np.zeros(0, np.int64)
        return np.concatenate(created)

    # ------------------------------------------------------------------

    def cull_landmarks(self, k: int):
        """MapPointCulling (LocalMapping.cc:351): drop recently created
        landmarks that failed to earn observations.

        Both culls apply ONLY to the probation set (the reference
        iterates mlpRecentAddedMapPoints; a point that survives its
        first cull_obs_window keyframes graduates and is never
        ratio-culled again).  Round 4 applied the found-ratio cull
        globally — under fast rotational sweep the per-frame match rate
        sits near the 0.25 threshold, and the global cull erased
        ESTABLISHED landmarks as fast as new ones were created
        (measured on the lemniscate: 4196 created, live count falling
        1061 -> 802 while coverage collapsed; scripts/debug_lemniscate)."""
        m = self.map
        keep = []
        drop = []
        for kf_born, ids in self.recent_lms:
            age = k - kf_born
            ids = ids[m.lm_valid[ids]]
            if ids.size == 0:
                continue
            # found-ratio cull, probation only (GetFoundRatio < 0.25)
            vis = m.lm_visible[ids]
            ratio = m.lm_found[ids] / np.maximum(vis, 1)
            bad_r = (vis >= 8) & (ratio < self.cfg.cull_min_found_ratio)
            if bad_r.any():
                drop.append(ids[bad_r])
                ids = ids[~bad_r]
            if age >= self.cfg.cull_obs_window:
                bad = ids[m.lm_n_obs[ids] < 3]
                drop.append(bad)
                # survivors graduate out of the probation list
            else:
                keep.append((kf_born, ids))
        self.recent_lms = keep
        if drop:
            bad = np.concatenate(drop)
            if bad.size:
                m.erase_landmarks(bad)

    # ------------------------------------------------------------------

    def run_local_ba(self, k: int):
        """Windowed BA around keyframe k (LocalBundleAdjustment).

        Prep and write-back run under map.lock; the device solve (the
        long pole) runs unlocked so tracking overlaps it."""
        m = self.map
        cfg = self.cfg
        with m.lock:
            neigh, _ = m.covisible_keyframes(k, min_shared=5)
            window = np.concatenate([[k], neigh[: cfg.window_size - 1]])
            window = np.unique(window)
            if m.n_keyframes() <= 2:
                return
            lm_ids = m.landmarks_in_keyframes(window)
            lm_ids = lm_ids[m.lm_valid[lm_ids]]
            if lm_ids.size < 10:
                return
            # fixed ring: KFs observing window landmarks but not in window.
            obs_any = np.isin(m.kf_lm_idx, lm_ids) & (m.kf_lm_idx >= 0)
            ring = np.nonzero(obs_any.any(axis=1) & m.kf_valid)[0]
            ring = np.setdiff1d(ring, window)[: cfg.fixed_ring]
            # The earliest window KF is fixed if there is no ring (gauge).
            if ring.size == 0:
                ring = window[:1]
                window = window[1:]
                if window.size == 0:
                    return
            prob_np, kf_order, lm_ids = m.build_ba_problem(
                window, ring, lm_ids)
        prob = self._pad_problem(prob_np)
        res = _ba_jit(prob, self.cam, jnp.asarray(self.bf, jnp.float32))
        K, M = len(kf_order), len(lm_ids)
        # force the device solve to completion OUTSIDE the lock
        Rcw = np.asarray(res.Rcw)[:K]
        tcw = np.asarray(res.tcw)[:K]
        pw = np.asarray(res.pw)[:M]
        inl = np.asarray(res.obs_inlier)[:M]
        with m.lock:
            m.apply_ba_result(kf_order, lm_ids, Rcw, tcw, pw,
                              n_free=len(window))
            # Outlier observation removal (reference erases edges post-BA).
            obs_kf, obs_kp = m.landmark_observations(lm_ids)
            bad = (obs_kf >= 0) & np.isin(obs_kf, kf_order) & ~inl
            mm, oo = np.nonzero(bad)
            if mm.size:
                m.kf_lm_idx[obs_kf[mm, oo], obs_kp[mm, oo]] = -1
                np.add.at(m.lm_n_obs, lm_ids[mm], -1)
                m.version += 1

    # ------------------------------------------------------------------

    def run_global_ba(self, *, stage_iters=(8, 12), distributed=None,
                      abort=None, correction_sinks=None) -> bool:
        """Full-map BA (GlobalBundleAdjustment, Optimizer.cc:1346): all
        keyframes free except the first (gauge), all landmarks. Invoked
        after loop closing (the reference's GBA thread) and by
        System.final_global_ba.

        Lock discipline mirrors run_local_ba: problem assembly and
        write-back run under map.lock in short bursts; the device solve —
        seconds at scale — runs UNLOCKED so tracking/mapping proceed.
        Keyframes and landmarks created while the solve ran are corrected
        at write-back by re-anchoring them on their temporal-chain
        predecessor, the reference's spanning-tree GBA propagation
        (LoopClosing::RunGlobalBundleAdjustment, LoopClosing.cc:779-824).

        abort: optional threading.Event — the reference's mnFullBAIdx
        abort protocol (LoopClosing.cc:504-516): checked between solve
        chunks and before write-back; an aborted GBA discards its result
        and returns False.

        distributed: route through parallel.dist_ba (landmark-sharded
        Schur over the device mesh).  None = auto: engage when more than
        one device exists and the landmark block is large enough that the
        Schur fill dominates the per-iteration psum."""
        m = self.map

        def aborted():
            return abort is not None and abort.is_set()

        with m.lock:
            kfs = m.keyframe_ids()
            if len(kfs) < 3:
                return False
            window = kfs[1:]
            ring = kfs[:1]
            lm_ids = m.landmarks_in_keyframes(kfs)
            lm_ids = lm_ids[m.lm_valid[lm_ids]]
            if lm_ids.size < 10:
                return False
            prob_np, kf_order, lm_ids = m.build_ba_problem(
                window, ring, lm_ids)
            snap_next_kf = m._next_kf
        prob = self._pad_problem(prob_np)
        K, M = len(kf_order), len(lm_ids)
        if self.cfg.gba_moving_cull_chi2 > 0:
            from ..solvers.local_ba import landmark_refit_chi2
            from ..utils.metrics import metrics

            med, n_obs = landmark_refit_chi2(
                prob, self.cam, jnp.asarray(self.bf, jnp.float32))
            med = np.asarray(med)[:M]
            n_obs = np.asarray(n_obs)[:M]
            bad = (med > self.cfg.gba_moving_cull_chi2) \
                & (n_obs >= self.cfg.gba_moving_cull_min_obs)
            if bad.any():
                metrics.count("gba_moving_culled", int(bad.sum()))
                with m.lock:
                    m.erase_landmarks(lm_ids[bad])
                mask = np.ones(prob.pw.shape[0], bool)
                mask[:M][bad] = False
                mj = jnp.asarray(mask)
                prob = prob._replace(
                    lm_valid=prob.lm_valid & mj,
                    obs_valid=prob.obs_valid & mj[:, None])
        n_dev = len(jax.devices())
        if distributed is None:
            distributed = n_dev > 1 and prob.pw.shape[0] >= 8192
        if distributed and n_dev > 1:
            from ..parallel.dist_ba import distributed_ba, make_ba_mesh

            # pad M to a device multiple for the even shard
            Mp = -(-prob.pw.shape[0] // n_dev) * n_dev
            if Mp != prob.pw.shape[0]:
                pad = Mp - prob.pw.shape[0]

                def padm(a, fill=0):
                    w = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
                    return jnp.asarray(np.pad(np.asarray(a), w,
                                              constant_values=fill))
                prob = prob._replace(
                    pw=padm(prob.pw), lm_valid=padm(prob.lm_valid, False),
                    obs_kf=padm(prob.obs_kf, -1), obs_uv=padm(prob.obs_uv),
                    obs_ur=padm(prob.obs_ur, -1.0),
                    obs_inv_sigma2=padm(prob.obs_inv_sigma2, 1.0),
                    obs_valid=padm(prob.obs_valid, False))
            mesh = make_ba_mesh()
            # Chunked like the single-device branch: one distributed
            # solve per stage with the abort flag checked in between —
            # a loop closure during a 512-KF distributed GBA must be
            # able to supersede it (the reference's mnFullBAIdx abort,
            # LoopClosing.cc:504-516); the r3 single uninterruptible
            # iters=sum(stage_iters) call was the exact mapping outage
            # that protocol exists to prevent.  (Unlike the chunked
            # single-device path the chi2 classification is not carried
            # across chunks — distributed_ba re-derives robust weights
            # from its Huber loss each iteration.)
            out = None
            for it in stage_iters:
                if aborted():
                    return False
                out = distributed_ba(
                    prob, self.cam, jnp.asarray(self.bf, jnp.float32),
                    mesh, iters=it)
                prob = prob._replace(Rcw=out[0], tcw=out[1], pw=out[2])
            Rcw = np.asarray(out[0])[:K]
            tcw = np.asarray(out[1])[:K]
            pw = np.asarray(out[2])[:M]
        else:
            # Chunked solve: one jitted stage per chunk, abort checked in
            # between (a mid-solve forceStop like g2o's, at stage
            # granularity).
            res = None
            active = None
            for it in stage_iters:
                if aborted():
                    return False
                res = _ba_jit(prob, self.cam,
                              jnp.asarray(self.bf, jnp.float32),
                              stage_iters=(it,), init_active=active)
                prob = prob._replace(Rcw=res.Rcw, tcw=res.tcw, pw=res.pw)
                # carry the outlier classification into the next chunk —
                # re-entering with all observations active would undo the
                # chi2 gate between the reference's two GBA stages
                active = res.obs_inlier
            Rcw = np.asarray(res.Rcw)[:K]
            tcw = np.asarray(res.tcw)[:K]
            pw = np.asarray(res.pw)[:M]
        if aborted():
            return False
        with m.lock:
            return self._apply_gba_result(
                kf_order, lm_ids, Rcw, tcw, pw,
                n_free=len(window), snap_next_kf=snap_next_kf,
                correction_sinks=correction_sinks)

    def _apply_gba_result(self, kf_order, lm_ids, Rcw, tcw, pw, *,
                          n_free: int, snap_next_kf: int,
                          correction_sinks=None) -> bool:
        """GBA write-back + propagation to during-solve creations (the
        reference's spanning-tree propagation of mTcwGBA/mPosGBA to
        keyframes/landmarks born while GBA ran, LoopClosing.cc:779-862).
        Caller holds map.lock."""
        m = self.map
        R_before = m.kf_Rcw.copy()
        t_before = m.kf_tcw.copy()
        if not m.apply_ba_result(kf_order, lm_ids, Rcw, tcw, pw,
                                 n_free=n_free):
            return False
        corrected = set(int(x) for x in kf_order)
        new_kfs = [int(k) for k in m.keyframe_ids() if k >= snap_next_kf]
        for k in new_kfs:
            a = int(m.kf_prev[k])
            while a >= 0 and a not in corrected:
                a = int(m.kf_prev[a])
            if a < 0:
                continue
            # Tcw_k relative to the anchor's pre-GBA pose, re-attached to
            # the anchor's corrected pose (Tchildc = Tchild * Tparent^-1;
            # mTcwGBA = Tchildc * parent->mTcwGBA).
            R_rel = m.kf_Rcw[k] @ R_before[a].T
            t_rel = m.kf_tcw[k] - R_rel @ t_before[a]
            R_old = m.kf_Rcw[k].copy()
            t_old = m.kf_tcw[k].copy()
            from ..math.lie import normalize_rotation_np
            m.kf_Rcw[k] = normalize_rotation_np(
                (R_rel @ m.kf_Rcw[a])[None])[0]
            m.kf_tcw[k] = R_rel @ m.kf_tcw[a] + t_rel
            m.apply_gauge_correction([k], R_old[None], t_old[None])
        # Landmarks not in the solved set (created during the solve, or
        # unobserved by the snapshot) follow their reference keyframe.
        other = np.setdiff1d(np.nonzero(m.lm_valid)[0], lm_ids)
        if other.size:
            ref = m.lm_ref_kf[other]
            ok = ref >= 0
            other, ref = other[ok], ref[ok]
            pc = (np.einsum("kij,kj->ki", R_before[ref], m.lm_pw[other])
                  + t_before[ref])
            m.lm_pw[other] = np.einsum(
                "kji,kj->ki", m.kf_Rcw[ref],
                pc - m.kf_tcw[ref]).astype(np.float32)
        # In background mode the tracker's live pose hangs off the newest
        # keyframe: hand every sink that KF's old->new delta so the next
        # frame re-anchors in the corrected gauge (the reference's
        # bMapUpdated handling after GBA).
        if correction_sinks:
            last = int(m.keyframe_ids()[-1])
            for s in correction_sinks:
                s.push_correction(R_before[last], t_before[last],
                                  m.kf_Rcw[last].copy(),
                                  m.kf_tcw[last].copy())
        m.big_change_idx += 1
        return True

    # ------------------------------------------------------------------

    def _pad_problem(self, p: dict) -> BAProblem:
        cfg = self.cfg
        K = p["Rcw"].shape[0]
        M = p["pw"].shape[0]
        Kp = -(-K // cfg.ba_kf_pad) * cfg.ba_kf_pad
        Mp = -(-M // cfg.ba_lm_pad) * cfg.ba_lm_pad
        O = p["obs_kf"].shape[1]

        def pad(a, n, fill=0):
            w = [(0, n - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
            return np.pad(a, w, constant_values=fill)

        Rcw = pad(p["Rcw"], Kp)
        Rcw[K:] = np.eye(3, dtype=np.float32)
        return BAProblem(
            Rcw=jnp.asarray(Rcw),
            tcw=jnp.asarray(pad(p["tcw"], Kp)),
            fixed=jnp.asarray(pad(p["fixed"], Kp, True)),
            pw=jnp.asarray(pad(p["pw"], Mp)),
            lm_valid=jnp.asarray(pad(p["lm_valid"], Mp, False)),
            obs_kf=jnp.asarray(pad(p["obs_kf"], Mp, -1)),
            obs_uv=jnp.asarray(pad(p["obs_uv"], Mp)),
            obs_ur=jnp.asarray(pad(p["obs_ur"], Mp, -1.0)),
            obs_inv_sigma2=jnp.asarray(pad(p["obs_inv_sigma2"], Mp, 1.0)),
            obs_valid=jnp.asarray(pad(p["obs_valid"], Mp, False)),
        )

    # ------------------------------------------------------------------

    def cull_keyframes(self, k: int):
        """KeyFrameCulling (LocalMapping.cc:383): erase covisible KFs
        whose landmarks are >=90% observed by >=3 other KFs (scale
        condition simplified to observation count).

        VIO timespan rule (VIORBSLAM III-B): once odometry is fused, a
        KF may only be culled if the temporal gap it leaves between its
        prev/next chain neighbours stays below `vio_timespan_cap` —
        longer gaps degrade preintegration accuracy.  The reference
        re-splices raw measurement lists into the surviving KF
        (KeyFrame.h:94-123); here chains are re-preintegrated on demand
        from the time-keyed ring buffer, so erasure needs no splicing.
        """
        m = self.map
        if m.n_keyframes() <= self.cfg.kf_cull_min_map:
            return
        neigh, _ = m.covisible_keyframes(k, min_shared=15)
        n_culled = 0
        for kf in neigh:
            if kf == 0 or kf == k:
                continue
            # Age guard + per-pass cap: the reference culls from an idle
            # mapping thread a few KFs at a time; culling every recent KF
            # of a slow-moving rig collapses the local window and wrecks
            # the vision BA (observed: pre-init ATE 0.09 -> 0.64).
            if k - kf < self.cfg.kf_cull_min_age:
                continue
            if n_culled >= self.cfg.kf_cull_max_per_pass:
                break
            prev, nxt = int(m.kf_prev[kf]), int(m.kf_next[kf])
            if prev >= 0 and nxt >= 0:
                gap = m.kf_timestamp[nxt] - m.kf_timestamp[prev]
                cap = min(self.vio_timespan_cap, self.cfg.kf_cull_max_gap) \
                    if self.vio_active else self.cfg.kf_cull_max_gap
                if gap > cap:
                    continue
            elif self.vio_active:
                continue
            kp_sel = np.nonzero(m.kf_lm_idx[kf] >= 0)[0]
            lms = m.kf_lm_idx[kf, kp_sel]
            if lms.size == 0:
                m.erase_keyframe(int(kf))
                n_culled += 1
                continue
            # Scale-aware redundancy (KeyFrameCulling, LocalMapping.cc:383):
            # a landmark counts as redundant only if >=3 OTHER keyframes
            # observe it at the same or finer octave (level <= level+1).
            # The pure-count rule culled serially around texture-rich
            # scenes: every landmark hits 4 observations in a few frames.
            obs_kf, obs_kp = m.landmark_observations(lms)
            lev = m.kf_level[np.clip(obs_kf, 0, None),
                             np.clip(obs_kp, 0, None)]
            lvl_self = m.kf_level[kf, kp_sel]
            others = (obs_kf >= 0) & (obs_kf != kf)
            cnt = (others & (lev <= lvl_self[:, None] + 1)).sum(axis=1)
            redundant = (cnt >= 3).mean()
            if redundant > self.cfg.kf_cull_redundancy:
                m.erase_keyframe(int(kf))
                n_culled += 1
