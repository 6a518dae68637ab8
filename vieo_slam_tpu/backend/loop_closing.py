"""Loop closing: detection, Sim3 verification, map correction, pose graph.

TPU-native equivalent of src/LoopClosing.cc (Run :93, DetectLoop :153,
ComputeSim3 :308, CorrectLoop :491, SearchAndFuse :682) run synchronously
at keyframe cadence: BoW scoring against the dense keyframe database,
temporal consistency across consecutive keyframes (the reference's
consistency groups, simplified to covisibility-group persistence),
batched Hamming matching + 3D-3D Sim3 RANSAC for geometric verification,
then whole-graph Sim3 pose-graph optimization with landmark correction —
no GBA thread/abort protocol: the pose graph + (optional) global BA run
to completion inside the keyframe step, with the map version counter
signalling the big change (Map::InformNewBigChange).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..cameras import models as cm
from ..loop.keyframe_db import KeyFrameDatabase
from ..loop.vocabulary import Vocabulary, train_vocabulary, transform
from ..map.map_state import MapState
from ..math import lie
from ..ops import matching
from ..solvers.pose_graph import (
    PoseGraphProblem, correct_landmarks, optimize_pose_graph,
)
from ..solvers.sim3_solver import optimize_sim3, sim3_ransac


@dataclasses.dataclass
class LoopClosingConfig:
    min_kf_gap: int = 10            # KFs between query and candidates
    consistency_needed: int = 2     # consecutive detections required
    min_sim3_inliers: int = 20      # ComputeSim3 acceptance
    inlier_thresh: float = 0.10     # metric 3D-3D gate
    fix_scale: bool = True          # stereo/RGB-D
    covis_edge_min: int = 30        # covisibility edges >= N shared
    # k^L leaf words.  8^4 = 4096 trains in ~2.6 s on 30k descriptors;
    # the 512-word default of round 1 under-discriminated larger maps
    # (ORBvoc is 10^6 words for lifetime reuse — a per-session map needs
    # far fewer, and load_dbow_text ingests a full ORBvoc when provided).
    voc_k: int = 8
    voc_L: int = 4
    voc_train_after: int = 3        # train vocab once N KFs exist
    max_pose_graph_kfs: int = 512


class LoopCloser:
    def __init__(self, cam: cm.Camera, bf: float, map_state: MapState,
                 cfg: LoopClosingConfig | None = None,
                 vocabulary: Vocabulary | None = None):
        self.cam = cam
        self.bf = float(bf)
        self.map = map_state
        self.cfg = cfg or LoopClosingConfig()
        self.voc = vocabulary
        self.db: KeyFrameDatabase | None = None
        self.kf_bow: dict[int, np.ndarray] = {}
        self.last_loop_kf = -10 ** 9
        self._pending: dict[int, int] = {}   # candidate -> streak count
        self.loop_edges: list[tuple[int, int, np.ndarray, np.ndarray]] = []
        self.n_loops_closed = 0
        self.last_fuse_count = 0        # SearchAndFuse merges+additions
        self.total_fuse_count = 0

    # ------------------------------------------------------------------

    def _ensure_vocabulary(self):
        if self.voc is not None:
            return True
        m = self.map
        kfs = m.keyframe_ids()
        if len(kfs) < self.cfg.voc_train_after:
            return False
        descs = []
        for k in kfs:
            d = m.kf_desc[k][m.kf_kp_valid[k]]
            descs.append(d)
        alld = np.concatenate(descs)
        if len(alld) < 500:
            return False
        self.voc = train_vocabulary(alld, k=self.cfg.voc_k,
                                    L=self.cfg.voc_L, seed=0)
        return True

    def rebuild_database(self):
        """Re-create the vocabulary + inverted file from the CURRENT map
        (map reuse: System::LoadMap re-adds every KF so relocalization
        and loop detection work against the loaded keyframes)."""
        self.kf_bow = {}
        self.db = None
        self.voc = None
        self._pending = {}
        if not self._ensure_vocabulary():
            return False
        self.db = KeyFrameDatabase(self.voc.n_words,
                                   capacity=self.map.cfg.max_keyframes)
        for k in self.map.keyframe_ids():
            self.db.add(int(k), self._bow_of(int(k)))
        return True

    def _bow_of(self, k: int) -> np.ndarray:
        if k not in self.kf_bow:
            m = self.map
            bow, _ = transform(
                self.voc, jnp.asarray(m.kf_desc[k]),
                jnp.asarray(m.kf_kp_valid[k]))
            self.kf_bow[k] = np.asarray(bow)
        return self.kf_bow[k]

    # ------------------------------------------------------------------

    def process_keyframe(self, k: int) -> bool:
        """DetectLoop + ComputeSim3 + CorrectLoop for one new KF.
        Returns True if a loop was closed."""
        if not self._ensure_vocabulary():
            return False
        if self.db is None:
            self.db = KeyFrameDatabase(self.voc.n_words,
                                       capacity=self.map.cfg.max_keyframes)
        m = self.map
        # Purge culled keyframes from the inverted file (the reference's
        # KeyFrameDatabase::erase call in KeyFrame::SetBadFlag): a dead
        # KF left in the database keeps scoring as a candidate — it is
        # absent from keyframe_ids() so the min_kf_gap/covisibility
        # exclusions never see it, and its landmarks are invalid, so it
        # wastes the consistency streak on lm_pairs=0 closures (the
        # r4 mono_loop no-closure diagnosis).
        nk = min(len(self.db.present), len(m.kf_valid))
        stale = np.nonzero(self.db.present[:nk] & ~m.kf_valid[:nk])[0]
        for kf in stale:
            self.db.erase(int(kf))
            self.kf_bow.pop(int(kf), None)
        bow = self._bow_of(k)
        closed = False
        if k - self.last_loop_kf >= self.cfg.min_kf_gap:
            neigh, _ = m.covisible_keyframes(k, min_shared=5)
            connected = np.concatenate([[k], neigh]).astype(int)
            recent = np.asarray(
                [kf for kf in m.keyframe_ids()
                 if k - kf < self.cfg.min_kf_gap], int)
            excl = np.unique(np.concatenate([connected, recent]))
            cands = self.db.detect_loop_candidates(
                bow, k, excl,
                lambda c: m.covisible_keyframes(int(c), min_shared=5)[0],
            )
            cands = self._consistency_filter(cands)
            for c in cands:
                if self._try_close(k, int(c)):
                    closed = True
                    break
        self.db.add(k, bow)
        return closed

    def _consistency_filter(self, cands: np.ndarray) -> np.ndarray:
        """Candidate must persist `consistency_needed` consecutive KFs
        (DetectLoop consistency groups, LoopClosing.cc:226-305 simplified:
        a candidate or its covisible ring counts as the same group)."""
        m = self.map
        out = []
        new_pending: dict[int, int] = {}
        for c in cands:
            group = set(
                int(x) for x in
                np.concatenate([[c], m.covisible_keyframes(
                    int(c), min_shared=5)[0]]))
            streak = 1
            for prev, cnt in self._pending.items():
                if prev in group:
                    streak = cnt + 1
                    break
            new_pending[int(c)] = streak
            if streak >= self.cfg.consistency_needed:
                out.append(int(c))
        self._pending = new_pending
        return np.asarray(out, int)

    # ------------------------------------------------------------------

    def _matched_landmark_pairs(self, k: int, c: int):
        """Descriptor-match keypoints of k vs c where both carry landmarks;
        returns their landmark positions in each KF's camera frame."""
        m = self.map
        idx, _ = matching.match_descriptors(
            jnp.asarray(m.kf_desc[k]), jnp.asarray(m.kf_desc[c]),
            jnp.asarray(m.kf_kp_valid[k] & (m.kf_lm_idx[k] >= 0)),
            jnp.asarray(m.kf_kp_valid[c] & (m.kf_lm_idx[c] >= 0)),
            max_dist=60, ratio=0.85,
        )
        idx = np.asarray(idx)
        rows = np.nonzero(idx >= 0)[0]
        if rows.size == 0:
            return None
        lm_k = m.kf_lm_idx[k, rows]
        lm_c = m.kf_lm_idx[c, idx[rows]]
        ok = (lm_k >= 0) & (lm_c >= 0) & m.lm_valid[lm_k] & m.lm_valid[lm_c]
        rows, lm_k, lm_c = rows[ok], lm_k[ok], lm_c[ok]
        if rows.size < 3:
            return None
        p_k = m.lm_pw[lm_k] @ m.kf_Rcw[k].T + m.kf_tcw[k]   # in k frame
        p_c = m.lm_pw[lm_c] @ m.kf_Rcw[c].T + m.kf_tcw[c]   # in c frame
        return p_k.astype(np.float32), p_c.astype(np.float32), lm_k, lm_c

    def _search_by_sim3(self, k: int, c: int, S_ck):
        """ORBmatcher::SearchBySim3 (src/ORBmatcher.cc, used by
        LoopClosing::ComputeSim3 after the RANSAC seed): project each
        KF's landmarks through the Sim3 estimate into the OTHER image and
        window-match against its landmark-carrying keypoints; keep pairs
        that agree in both directions.  Returns (lm_k, lm_c, kp_k, kp_c)
        index arrays of the newly-supported pairs."""
        m = self.map
        R_ck, t_ck, s_ck = S_ck
        Ri, ti, si = lie.sim3_inverse(jnp.asarray(R_ck), jnp.asarray(t_ck),
                                      jnp.asarray(s_ck))
        R_kc, t_kc, s_kc = np.asarray(Ri), np.asarray(ti), float(si)

        def project_side(src, dst, R, t, s):
            """Project src-KF landmarks into dst-KF's image, match."""
            lm = m.kf_lm_idx[src]
            has = m.kf_kp_valid[src] & (lm >= 0)
            has = has & m.lm_valid[np.clip(lm, 0, None)]
            p_src = (m.lm_pw[np.clip(lm, 0, None)] @ m.kf_Rcw[src].T
                     + m.kf_tcw[src])
            p_dst = float(s) * (p_src @ np.asarray(R).T) + np.asarray(t)
            uv = np.asarray(cm.project(self.cam, jnp.asarray(
                p_dst.astype(np.float32))))
            idx, _ = matching.search_by_projection(
                jnp.asarray(uv.astype(np.float32)),
                jnp.asarray(m.kf_level[src]),
                jnp.asarray(m.kf_desc[src]),
                jnp.asarray(has & (p_dst[:, 2] > 0.05)),
                jnp.asarray(m.kf_uv[dst]), jnp.asarray(m.kf_level[dst]),
                jnp.asarray(m.kf_desc[dst]),
                jnp.asarray(m.kf_kp_valid[dst] & (m.kf_lm_idx[dst] >= 0)),
                radius=10.0, level_scales=self.map.level_scales,
                max_dist=60, ratio=1.0, level_tolerance=8)
            return np.asarray(idx)

        idx_kc = project_side(k, c, R_ck, t_ck, s_ck)   # kp_k -> kp_c
        idx_ck = project_side(c, k, R_kc, t_kc, s_kc)   # kp_c -> kp_k
        rows_k = np.nonzero(idx_kc >= 0)[0]
        # mutual agreement (the reference keeps two-directional finds)
        mutual = idx_ck[idx_kc[rows_k]] == rows_k
        rows_k = rows_k[mutual]
        rows_c = idx_kc[rows_k]
        lm_k = m.kf_lm_idx[k, rows_k]
        lm_c = m.kf_lm_idx[c, rows_c]
        return lm_k, lm_c, rows_k, rows_c

    def _try_close(self, k: int, c: int) -> bool:
        pairs = self._matched_landmark_pairs(k, c)
        if pairs is None:
            return False
        p_k, p_c, lm_k, lm_c = pairs
        cap = 512
        n = min(len(p_k), cap)
        src = np.zeros((cap, 3), np.float32)
        dst = np.zeros((cap, 3), np.float32)
        val = np.zeros(cap, bool)
        src[:n], dst[:n], val[:n] = p_k[:n], p_c[:n], True
        res = sim3_ransac(
            jnp.asarray(src), jnp.asarray(dst), jnp.asarray(val),
            jax.random.PRNGKey(k),
            inlier_thresh=self.cfg.inlier_thresh,
            with_scale=not self.cfg.fix_scale,
        )
        if int(res.n_inliers) < self.cfg.min_sim3_inliers:
            return False
        # S_ck: maps k-frame points onto c-frame points.
        S_ck = (np.asarray(res.R), np.asarray(res.t), float(res.s))
        # ComputeSim3's second half (LoopClosing.cc:308): widen the match
        # set by projecting through the RANSAC seed (SearchBySim3), then
        # refine S_ck on two-sided reprojection (OptimizeSim3); the
        # refined inlier count is the acceptance gate.
        m = self.map
        inl0 = np.asarray(res.inliers)[:n]
        pair_k = lm_k[:n][inl0]
        pair_c = lm_c[:n][inl0]
        xk, xc, _, _ = self._search_by_sim3(k, c, S_ck)
        pair_k = np.concatenate([pair_k, xk])
        pair_c = np.concatenate([pair_c, xc])
        # de-duplicate pairs
        key = pair_k.astype(np.int64) * (1 << 32) + pair_c
        _, uniq = np.unique(key, return_index=True)
        pair_k, pair_c = pair_k[uniq], pair_c[uniq]
        ok = m.lm_valid[pair_k] & m.lm_valid[pair_c]
        pair_k, pair_c = pair_k[ok], pair_c[ok]
        refined = self._refine_sim3(k, c, S_ck, pair_k, pair_c)
        if refined is None:
            return False
        S_ck, inl_pairs = refined
        self._correct_loop(k, c, S_ck)
        self.last_loop_kf = k
        self.n_loops_closed += 1
        # fuse the matched duplicates (the Sim3-inlier pairs) ...
        with m.lock:
            for a, b in zip(*inl_pairs):
                if a != b and m.lm_valid[a] and m.lm_valid[b]:
                    m.replace_landmark(int(a), int(b))
        # ... then the full-breadth SearchAndFuse: project the loop-side
        # landmark set through the corrected poses into the current-side
        # covisibility neighborhood and fuse there too.
        self.last_fuse_count = self._search_and_fuse(k, c)
        self.total_fuse_count += self.last_fuse_count
        return True

    def _search_and_fuse(self, k: int, c: int) -> int:
        """LoopClosing::SearchAndFuse (src/LoopClosing.cc:682-718, called
        from CorrectLoop :617-627): project ALL loop-side map points
        (those of KF c and its covisibility ring) through the CORRECTED
        poses into every current-side keyframe (k and its covisibility
        ring) and fuse — a matched keypoint that already carries a
        landmark has it replaced by the loop-side point; a free matched
        keypoint gains a new cross-lap observation.  This is what welds
        the two laps together beyond the handful of Sim3-inlier pairs:
        the many added cross-lap observations let the follow-up GBA pull
        the whole revisited neighborhood onto the loop-side structure.

        Runs after _correct_loop, so current-side poses are already
        corrected (the reference fuses with its propagated mg2oScw for
        the same reason).  Returns the number of fused keypoints."""
        m = self.map
        from ..utils.metrics import metrics

        n_fused = 0
        with m.lock:
            neigh_c, _ = m.covisible_keyframes(c, min_shared=5)
            loop_kfs = np.concatenate([[c], neigh_c]).astype(int)
            lm_loop = m.landmarks_in_keyframes(loop_kfs)
            lm_loop = lm_loop[m.lm_valid[lm_loop]]
            if lm_loop.size == 0:
                return 0
            neigh_k, _ = m.covisible_keyframes(k, min_shared=5)
            cur_kfs = np.concatenate([[k], neigh_k]).astype(int)
            # fixed landmark capacity so the dense association program
            # compiles once per (cap, n_kp) shape pair
            cap = -(-len(lm_loop) // 1024) * 1024
            scales = jnp.asarray(m.level_scales.astype(np.float32))
            for kf in cur_kfs:
                kf = int(kf)
                if not m.kf_valid[kf]:
                    continue
                lm_cur = lm_loop[m.lm_valid[lm_loop]]
                if lm_cur.size == 0:
                    break
                # skip loop points this KF already observes
                # (MapPoint::IsInKeyFrame gate in ORBmatcher::Fuse)
                seen = np.isin(lm_cur, m.kf_lm_idx[kf][
                    m.kf_kp_valid[kf] & (m.kf_lm_idx[kf] >= 0)])
                pc = m.lm_pw[lm_cur] @ m.kf_Rcw[kf].T + m.kf_tcw[kf]
                uv_proj = np.zeros((cap, 2), np.float32)
                desc_p = np.zeros((cap, 8), np.uint32)
                vis = np.zeros(cap, bool)
                npts = len(lm_cur)
                uv_proj[:npts] = np.asarray(cm.project(
                    self.cam, jnp.asarray(pc.astype(np.float32))))
                desc_p[:npts] = m.lm_desc[lm_cur]
                vis[:npts] = ((pc[:, 2] > 0.1) & ~seen
                              & np.asarray(cm.in_image(
                                  self.cam,
                                  jnp.asarray(uv_proj[:npts]), 1.0)))
                idx, _ = matching.fuse_candidates(
                    jnp.asarray(uv_proj),
                    jnp.zeros(cap, jnp.int32),
                    jnp.asarray(desc_p), jnp.asarray(vis),
                    jnp.asarray(m.kf_uv[kf]), jnp.asarray(m.kf_level[kf]),
                    jnp.asarray(m.kf_desc[kf]),
                    jnp.asarray(m.kf_kp_valid[kf]),
                    radius=6.0, level_scales=scales)
                idx = np.asarray(idx)[:npts]
                for li, kp in zip(*(lm_cur[idx >= 0], idx[idx >= 0])):
                    li, kp = int(li), int(kp)
                    if not m.lm_valid[li]:
                        continue
                    existing = int(m.kf_lm_idx[kf, kp])
                    if existing == li:
                        continue
                    if existing >= 0 and m.lm_valid[existing]:
                        # duplicate: the loop-side point replaces the
                        # current-side one everywhere (pRep->Replace)
                        m.replace_landmark(existing, li)
                        n_fused += 1
                    else:
                        m.kf_lm_idx[kf, kp] = li
                        m.lm_n_obs[li] += 1
                        n_fused += 1
            m.version += 1
        metrics.count("loop_fused_points", n_fused)
        return n_fused

    def _refine_sim3(self, k: int, c: int, S_ck, pair_k, pair_c):
        """OptimizeSim3 wrapper: build padded per-pair observation arrays
        (positions in each camera frame + the observing keypoint pixels)
        and run the jitted two-sided reprojection refinement."""
        m = self.map
        if len(pair_k) < 3:
            return None
        # observing keypoint of each landmark in its own KF
        kp_k = self._kp_of_landmarks(k, pair_k)
        kp_c = self._kp_of_landmarks(c, pair_c)
        ok = (kp_k >= 0) & (kp_c >= 0)
        pair_k, pair_c = pair_k[ok], pair_c[ok]
        kp_k, kp_c = kp_k[ok], kp_c[ok]
        if len(pair_k) < 3:
            return None
        cap = 512
        nn = min(len(pair_k), cap)
        pk = np.zeros((cap, 3), np.float32)
        pc = np.zeros((cap, 3), np.float32)
        uk = np.zeros((cap, 2), np.float32)
        uc = np.zeros((cap, 2), np.float32)
        isk = np.ones(cap, np.float32)
        isc = np.ones(cap, np.float32)
        vv = np.zeros(cap, bool)
        pk[:nn] = (m.lm_pw[pair_k[:nn]] @ m.kf_Rcw[k].T + m.kf_tcw[k])
        pc[:nn] = (m.lm_pw[pair_c[:nn]] @ m.kf_Rcw[c].T + m.kf_tcw[c])
        uk[:nn] = m.kf_uv[k, kp_k[:nn]]
        uc[:nn] = m.kf_uv[c, kp_c[:nn]]
        isk[:nn] = m.inv_sigma2[m.kf_level[k, kp_k[:nn]]]
        isc[:nn] = m.inv_sigma2[m.kf_level[c, kp_c[:nn]]]
        vv[:nn] = True
        R0, t0, s0 = S_ck
        out = optimize_sim3(
            jnp.asarray(R0.astype(np.float32)),
            jnp.asarray(t0.astype(np.float32)), jnp.asarray(s0),
            jnp.asarray(pk), jnp.asarray(pc), jnp.asarray(uk),
            jnp.asarray(uc), jnp.asarray(isk), jnp.asarray(isc),
            jnp.asarray(vv), self.cam,
            fix_scale=self.cfg.fix_scale)
        if int(out.n_inliers) < self.cfg.min_sim3_inliers:
            return None
        inl = np.asarray(out.inliers)[:nn]
        S = (np.asarray(out.R), np.asarray(out.t), float(out.s))
        return S, (pair_k[:nn][inl], pair_c[:nn][inl])

    def _kp_of_landmarks(self, kf: int, lm_ids: np.ndarray) -> np.ndarray:
        """Keypoint index of each landmark id in KF kf (-1 if unseen)."""
        m = self.map
        inv = np.full(int(m.lm_pw.shape[0]), -1, np.int64)
        lm = m.kf_lm_idx[kf]
        rows = np.nonzero(m.kf_kp_valid[kf] & (lm >= 0))[0]
        inv[lm[rows]] = rows
        return inv[lm_ids]

    # ------------------------------------------------------------------

    def _correct_loop(self, k: int, c: int, S_ck):
        """CorrectLoop: pose-graph over all KFs with the new loop edge.

        Runs entirely under map.lock (the reference holds
        Map::mMutexMapUpdate through CorrectLoop's propagation,
        LoopClosing.cc:535-627) — a loop correction is rare and the
        pose-graph solve is small, so stalling tracking for its duration
        is the correct trade against torn pose/landmark state."""
        with self.map.lock:
            self._correct_loop_locked(k, c, S_ck)

    def _correct_loop_locked(self, k: int, c: int, S_ck):
        m = self.map
        cfg = self.cfg
        all_kfs = m.keyframe_ids()
        if len(all_kfs) > cfg.max_pose_graph_kfs:
            # Hierarchical skeleton (replaces round-2's silent
            # truncation): optimize a temporally-uniform subsample plus
            # every loop-edge endpoint; the remaining keyframes re-attach
            # rigidly to their nearest preceding skeleton KF afterwards,
            # so every KF and landmark still gets corrected (the
            # reference solves all KFs — Optimizer.cc:2309 — which a
            # dense [7K,7K] device solve cannot scale to unboundedly).
            stride = -(-len(all_kfs) // cfg.max_pose_graph_kfs)
            keep = set(int(x) for x in all_kfs[::stride])
            keep.update((int(k), int(c), int(all_kfs[-1])))
            for (a, b, *_rest) in self.loop_edges:
                keep.update((int(a), int(b)))
            kfs = np.asarray(
                sorted(x for x in keep if m.kf_valid[x]), int)
        else:
            kfs = all_kfs
        K = len(kfs)
        local = {int(kf): i for i, kf in enumerate(kfs)}

        R = m.kf_Rcw[kfs].astype(np.float32)
        t = m.kf_tcw[kfs].astype(np.float32)
        s = np.ones(K, np.float32)

        ei, ej, eR, et, es, ew = [], [], [], [], [], []

        def add_edge(i, j, Rm=None, tm=None, sm=1.0, w=1.0):
            ei.append(i); ej.append(j)
            if Rm is None:  # measurement from current estimates
                Rm_, tm_, sm_ = lie.sim3_compose(
                    jnp.asarray(R[i]), jnp.asarray(t[i]), jnp.asarray(1.0),
                    *lie.sim3_inverse(jnp.asarray(R[j]), jnp.asarray(t[j]),
                                      jnp.asarray(1.0)))
                Rm, tm, sm = np.asarray(Rm_), np.asarray(tm_), float(sm_)
            eR.append(Rm); et.append(tm); es.append(sm); ew.append(w)

        # temporal chain edges
        for a, b in zip(kfs[:-1], kfs[1:]):
            add_edge(local[int(a)], local[int(b)])
        # covisibility edges, weighted by shared-landmark count (the
        # reference keeps all >=100-shared edges in the essential graph;
        # uniform weights under-constrain the mid-trajectory, which
        # showed as ~0.3 m residual drift on loop tests)
        for kf in kfs:
            neigh, wts = m.covisible_keyframes(int(kf),
                                               min_shared=cfg.covis_edge_min)
            for nb, ws in list(zip(neigh, wts))[:8]:
                i, j = local[int(kf)], local.get(int(nb))
                if j is None or i >= j:
                    continue
                add_edge(i, j, w=min(float(ws) / cfg.covis_edge_min, 4.0))
        # previous loop edges
        for (a, b, Rm, tm) in self.loop_edges:
            if int(a) in local and int(b) in local:
                add_edge(local[int(a)], local[int(b)], Rm, tm, 1.0, w=3.0)
        # the NEW loop edge: S_kc maps c-frame to k-frame: measurement for
        # (i=k, j=c) is S_k_w * S_c_w^-1 which should equal S_kc = S_ck^-1.
        R_ck, t_ck, s_ck = S_ck
        R_kc, t_kc, s_kc = lie.sim3_inverse(
            jnp.asarray(R_ck), jnp.asarray(t_ck), jnp.asarray(s_ck))
        add_edge(local[k], local[c], np.asarray(R_kc), np.asarray(t_kc),
                 float(s_kc), w=5.0)
        self.loop_edges.append(
            (k, c, np.asarray(R_kc), np.asarray(t_kc)))

        E = len(ei)
        prob = PoseGraphProblem(
            R=jnp.asarray(R), t=jnp.asarray(t), s=jnp.asarray(s),
            fixed=jnp.asarray(
                [i == local[c] for i in range(K)]),  # anchor loop KF
            edge_i=jnp.asarray(ei, jnp.int32),
            edge_j=jnp.asarray(ej, jnp.int32),
            edge_R=jnp.asarray(np.stack(eR)),
            edge_t=jnp.asarray(np.stack(et)),
            edge_s=jnp.asarray(es, jnp.float32),
            edge_w=jnp.asarray(ew, jnp.float32),
        )
        # Host offload on TPU: the pose graph is a rare, small,
        # autodiff-heavy solve (tiny Sim3 chains per edge) that maps
        # badly onto the chip — measured 24 s (scatter+LU), 11.8 s
        # (one-hot A^T A + CG) per K=512 closure on v5e vs a couple of
        # seconds on host LAPACK.  A 512-KF closure happens once per
        # loop; holding map.lock for the chip solve would stall
        # tracking (the r4 weak-#7 latency gap, now measured).
        if jax.default_backend() == "tpu":
            try:
                cpu = jax.devices("cpu")[0]
                with jax.default_device(cpu):
                    out = optimize_pose_graph(
                        jax.device_put(prob, cpu), iters=20,
                        fix_scale=cfg.fix_scale, backend="cpu")
            except RuntimeError:
                out = optimize_pose_graph(prob, iters=20,
                                          fix_scale=cfg.fix_scale)
        else:
            out = optimize_pose_graph(prob, iters=20,
                                      fix_scale=cfg.fix_scale)
        R_new = np.asarray(out.R)
        t_new = np.asarray(out.t)
        s_new = np.asarray(out.s)

        # Expand the skeleton solution to EVERY valid keyframe: skeleton
        # KFs take the solver pose; others re-attach rigidly to their
        # nearest preceding skeleton KF (T_rel from the old poses).
        R_all_new = np.zeros((len(all_kfs), 3, 3), np.float32)
        t_all_new = np.zeros((len(all_kfs), 3), np.float32)
        s_all_new = np.ones(len(all_kfs), np.float32)
        all_local = {int(kf): i for i, kf in enumerate(all_kfs)}
        in_skel = np.asarray([int(kf) in local for kf in all_kfs])
        skel_rows = np.asarray(
            [local[int(kf)] for kf in all_kfs[in_skel]], int)
        R_all_new[in_skel] = R_new[skel_rows]
        t_all_new[in_skel] = t_new[skel_rows]
        s_all_new[in_skel] = s_new[skel_rows]
        if not in_skel.all():
            # nearest preceding skeleton index per KF (ids are temporal)
            anchor_pos = np.maximum.accumulate(
                np.where(in_skel, np.arange(len(all_kfs)), -1))
            # leading non-skeleton KFs (before the first skeleton one)
            # anchor forward instead
            first = int(np.argmax(in_skel))
            anchor_pos[anchor_pos < 0] = first
            for i in np.nonzero(~in_skel)[0]:
                a = int(anchor_pos[i])
                kf_i, kf_a = int(all_kfs[i]), int(all_kfs[a])
                R_rel = m.kf_Rcw[kf_i] @ m.kf_Rcw[kf_a].T
                t_rel = m.kf_tcw[kf_i] - R_rel @ m.kf_tcw[kf_a]
                # S_new = T_rel ∘ S_anchor_new, T_rel lifted to Sim3 with
                # s=1 (the reference's g2oSic * mg2oScw product,
                # LoopClosing.cc:550-560): s inherited from the anchor.
                R_all_new[i] = R_rel @ R_all_new[a]
                t_all_new[i] = R_rel @ t_all_new[a] + t_rel
                s_all_new[i] = s_all_new[a]

        # correct landmarks with their reference KFs (old/new Sim3 of
        # every KF now known), then write back.
        lm_ids = np.nonzero(m.lm_valid)[0]
        ref = m.lm_ref_kf[lm_ids]
        ref_local = np.asarray([all_local.get(int(r), 0) for r in ref],
                               np.int32)
        pw_new = correct_landmarks(
            jnp.asarray(m.lm_pw[lm_ids]), jnp.asarray(ref_local),
            jnp.asarray(m.kf_Rcw[all_kfs].astype(np.float32)),
            jnp.asarray(m.kf_tcw[all_kfs].astype(np.float32)),
            jnp.asarray(np.ones(len(all_kfs), np.float32)),
            jnp.asarray(R_all_new), jnp.asarray(t_all_new),
            jnp.asarray(s_all_new))
        m.lm_pw[lm_ids] = np.asarray(pw_new)
        # scale-normalize rotations back onto SE3 for storage.
        from ..math.lie import normalize_rotation_np

        R_old_cw = m.kf_Rcw[all_kfs].copy()
        t_old_cw = m.kf_tcw[all_kfs].copy()
        m.kf_Rcw[all_kfs] = normalize_rotation_np(R_all_new)
        m.kf_tcw[all_kfs] = t_all_new / np.maximum(
            s_all_new[:, None], 1e-9)
        # NavStates follow the same per-KF gauge change (velocities
        # rotated, body poses moved — CorrectLoop updates NavStates
        # alongside poses, LoopClosing.cc:535-627).
        m.apply_gauge_correction(all_kfs, R_old_cw, t_old_cw)
        m.big_change_idx += 1
        m.version += 1
