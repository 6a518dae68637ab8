"""Relocalization: recover a lost tracker against the keyframe database.

Equivalent of Tracking::Relocalization (src/Tracking.cc:2529): BoW query
for candidate keyframes (KeyFrameDatabase::DetectRelocalizationCandidates),
descriptor matching against each candidate's landmarks, minimal-solver
RANSAC, then projection-based pose refinement.

Solver: batched DLT PnP RANSAC (solvers/pnp_solver) on 2D keypoint rays
vs matched landmark 3D — the reference's EPnP P4P RANSAC equivalent
(src/PnPsolver.cc), used for ALL sensors exactly as the reference's
Tracking::Relocalization does.  An earlier revision routed stereo/RGB-D
frames through 3D-3D Horn RANSAC on the frame's own stereo depth; at
image level that depth carries sigma_z = z^2 sigma_d / bf ~ 0.1-0.2 m at
3-5 m range, so the 0.10 m metric inlier gate rejected TRUE matches and
relocalization never fired (measured: 15-30 descriptor matches, 2-4
Horn inliers on every blackout-recovery frame).  Reprojection-gated PnP
is insensitive to target-side depth noise.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..cameras import models as cm
from ..ops import matching
from ..solvers.motion_ba import PoseObs, pose_optimization
from ..solvers.pnp_solver import pnp_ransac, pnp_ransac_3d3d



def try_relocalize(system, loop_closer, frame) -> bool:
    """Attempt relocalization of `frame`; on success the tracker pose and
    state are reset. Returns True on success."""
    import os
    dbg = os.environ.get("RELOC_DEBUG", "0") == "1"
    if loop_closer is None or loop_closer.voc is None \
            or loop_closer.db is None:
        if dbg:
            print("  reloc: no voc/db", flush=True)
        return False
    m = system.map
    tr = system.tracker
    from ..loop.vocabulary import transform

    bow, _ = transform(loop_closer.voc, frame.desc, frame.valid)
    cands = loop_closer.db.detect_reloc_candidates(np.asarray(bow), top_n=5)

    frame_valid = np.asarray(frame.valid)
    depth = np.asarray(frame.depth)
    rays = np.array(cm.unproject(system.cam, frame.uv))
    f_valid = frame_valid
    if f_valid.sum() < 30:
        if dbg:
            print(f"  reloc: too few valid kps ({int(f_valid.sum())})",
                  flush=True)
        return False
    if dbg:
        print(f"  reloc: cands={list(map(int, cands))} "
              f"nval={int(f_valid.sum())}", flush=True)

    key = jax.random.PRNGKey(int(frame.timestamp * 1e3) & 0x7FFFFFFF)
    lvl_f = np.asarray(frame.level)
    for c in cands:
        c = int(c)
        kp_has_lm = m.kf_kp_valid[c] & (m.kf_lm_idx[c] >= 0)
        # Level-consistency gate (|octave diff| <= 1): the candidate's
        # landmarks were detected at a scale the kidnapped view should
        # roughly reproduce; random descriptor collisions spread over
        # all octave pairs, so this multiplies match purity — the
        # reference gets its purity from vocabulary-node restriction +
        # orientation histogram in SearchByBoW (ORBmatcher.cc).
        extra = jnp.asarray(
            np.abs(lvl_f[:, None] - m.kf_level[c][None, :]) <= 1)
        idx, _ = matching.match_descriptors(
            frame.desc, jnp.asarray(m.kf_desc[c]),
            jnp.asarray(f_valid), jnp.asarray(kp_has_lm),
            max_dist=60, ratio=0.85, extra_mask=extra,
        )
        idx = np.asarray(idx)
        rows = np.nonzero(idx >= 0)[0]
        if rows.size < 15:
            if dbg:
                print(f"  reloc c={c}: only {rows.size} desc matches",
                      flush=True)
            continue
        lm = m.kf_lm_idx[c, idx[rows]]
        ok = (lm >= 0) & m.lm_valid[lm]
        rows, lm = rows[ok], lm[ok]
        if rows.size < 15:
            if dbg:
                print(f"  reloc c={c}: only {rows.size} lm matches",
                      flush=True)
            continue
        cap = 512
        n = min(rows.size, cap)
        dst = np.zeros((cap, 3), np.float32)
        val = np.zeros(cap, bool)
        dst[:n] = m.lm_pw[lm[:n]]
        val[:n] = True

        # Coarse pose: PnP RANSAC.  The inlier gate is 5 px (not the
        # tracking-time 2.5): the landmark 3D positions carry
        # single-view stereo depth noise that reprojects 3-8 px from a
        # ~30-degree-different viewpoint, so a tight gate rejects TRUE
        # matches (measured in scripts/debug_reloc_matches.py).  2048
        # hypotheses: at ~35% match purity a clean 6-point DLT sample
        # has p~1.5e-3, so 2048 draws give >95% success.
        src_rays = np.zeros((cap, 3), np.float32)
        src_rays[:, 2] = 1.0
        src_rays[:n] = rays[rows[:n]]
        d_rows = depth[rows[:n]]
        has3d = np.zeros(cap, bool)
        has3d[:n] = d_rows > 0
        if has3d.sum() >= 10:
            # depth sensor: 3-point Horn hypotheses, reprojection-scored
            p_cam = np.zeros((cap, 3), np.float32)
            p_cam[:n] = rays[rows[:n]] * np.maximum(d_rows, 0)[:, None]
            res = pnp_ransac_3d3d(
                jnp.asarray(p_cam), jnp.asarray(src_rays),
                jnp.asarray(dst), jnp.asarray(has3d), jnp.asarray(val),
                key, n_hyp=1024, thresh=5.0 / float(system.cam.fx),
                min_inliers=10)
        else:
            res = pnp_ransac(
                jnp.asarray(src_rays), jnp.asarray(dst), jnp.asarray(val),
                key, n_hyp=2048, thresh=5.0 / float(system.cam.fx),
                min_inliers=10)
        if not bool(res.ok):
            if dbg:
                print(f"  reloc c={c}: pnp failed ({n} matches)",
                      flush=True)
            continue
        Rcw = np.asarray(res.Rcw, np.float32)
        tcw = np.asarray(res.tcw, np.float32)

        # Harvest step (the reference's second SearchByProjection inside
        # Relocalization, Tracking.cc:2600+): project the candidate's
        # covisible landmark set at the coarse pose and window-match —
        # turns the handful of RANSAC inliers into a full local-map
        # association — then optimize the pose on the harvested set.
        neigh, _ = m.covisible_keyframes(c, min_shared=5)
        kfs_c = np.concatenate([[c], neigh[:10]])
        lm_ids = m.landmarks_in_keyframes(kfs_c)
        lm_ids = lm_ids[m.lm_valid[lm_ids]][:2048]
        hcap = 2048
        pw_h = np.zeros((hcap, 3), np.float32)
        desc_h = np.zeros((hcap, 8), np.uint32)
        vis_h = np.zeros(hcap, bool)
        nlm = len(lm_ids)
        pw_h[:nlm] = m.lm_pw[lm_ids]
        desc_h[:nlm] = m.lm_desc[lm_ids]
        pc = pw_h[:nlm] @ Rcw.T + tcw
        uv_h = np.zeros((hcap, 2), np.float32)
        uv_h[:nlm] = np.asarray(cm.project(
            system.cam, jnp.asarray(pc)))
        vis_h[:nlm] = (pc[:, 2] > 0.1) & np.asarray(cm.in_image(
            system.cam, jnp.asarray(uv_h[:nlm]), 1.0))
        hidx, _ = matching.search_by_projection(
            jnp.asarray(uv_h), jnp.zeros(hcap, jnp.int32),
            jnp.asarray(desc_h), jnp.asarray(vis_h),
            frame.uv, frame.level, frame.desc, frame.valid,
            radius=10.0,
            level_scales=jnp.asarray(
                m.level_scales.astype(np.float32)),
            max_dist=60, ratio=0.9, level_tolerance=8)
        hidx = np.asarray(hidx)
        matched = hidx >= 0
        kp = np.clip(hidx, 0, None)
        obs = PoseObs(
            pw=jnp.asarray(pw_h),
            uv=frame.uv[kp],
            ur=frame.ur[kp],
            inv_sigma2=jnp.asarray(
                m.inv_sigma2[np.clip(np.asarray(frame.level)[kp], 0,
                                     None)]),
            valid=jnp.asarray(matched),
        )
        ref = pose_optimization(
            jnp.asarray(Rcw), jnp.asarray(tcw),
            obs, system.cam, system.bf, rounds=2, iters_per_round=5)
        if int(ref.n_inliers) < 20:
            if dbg:
                print(f"  reloc c={c}: harvest {int(matched.sum())} "
                      f"refine inl={int(ref.n_inliers)}", flush=True)
            continue
        from ..math.lie import normalize_rotation_np

        tr.Rcw = normalize_rotation_np(np.asarray(ref.Rcw, np.float32))
        tr.tcw = np.asarray(ref.tcw, np.float32)
        tr.velocity = None
        tr.last_kf_id = c
        from .tracking import TrackState

        tr.state = TrackState.OK
        # signals the VIO frontend to run the post-reloc bias recompute
        # (RecomputeIMUBiasAndCurrentNavstate, Tracking.cc:548)
        tr.just_relocalized = True
        return True
    return False
