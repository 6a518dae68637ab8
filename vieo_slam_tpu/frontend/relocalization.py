"""Relocalization: recover a lost tracker against the keyframe database.

Equivalent of Tracking::Relocalization (src/Tracking.cc:2529): BoW query
for candidate keyframes (KeyFrameDatabase::DetectRelocalizationCandidates),
descriptor matching against each candidate's landmarks, minimal-solver
RANSAC, then projection-based pose refinement.

Two solver paths, chosen by available depth:
  - stereo/RGB-D frames carry metric depth per keypoint, so the 2D-3D
    problem is solved as batched 3D-3D Horn RANSAC (solvers/sim3_solver
    with the scale pinned);
  - monocular frames (no depth) use the batched DLT PnP RANSAC
    (solvers/pnp_solver) — the reference's EPnP P4P RANSAC equivalent
    (src/PnPsolver.cc).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..cameras import models as cm
from ..ops import matching
from ..solvers.motion_ba import PoseObs, pose_optimization
from ..solvers.pnp_solver import pnp_ransac
from ..solvers.sim3_solver import sim3_ransac


def try_relocalize(system, loop_closer, frame) -> bool:
    """Attempt relocalization of `frame`; on success the tracker pose and
    state are reset. Returns True on success."""
    if loop_closer is None or loop_closer.voc is None \
            or loop_closer.db is None:
        return False
    m = system.map
    tr = system.tracker
    from ..loop.vocabulary import transform

    bow, _ = transform(loop_closer.voc, frame.desc, frame.valid)
    cands = loop_closer.db.detect_reloc_candidates(np.asarray(bow), top_n=5)

    depth = np.asarray(frame.depth)
    frame_valid = np.asarray(frame.valid)
    depth_valid = frame_valid & (depth > 0)
    rays = np.array(cm.unproject(system.cam, frame.uv))
    use_pnp = depth_valid.sum() < 30        # monocular / depth-poor frame
    f_valid = frame_valid if use_pnp else depth_valid
    if f_valid.sum() < 30:
        return False
    p_frame = rays * depth[:, None]         # keypoint 3D (depth path)

    key = jax.random.PRNGKey(int(frame.timestamp * 1e3) & 0x7FFFFFFF)
    for c in cands:
        c = int(c)
        kp_has_lm = m.kf_kp_valid[c] & (m.kf_lm_idx[c] >= 0)
        idx, _ = matching.match_descriptors(
            frame.desc, jnp.asarray(m.kf_desc[c]),
            jnp.asarray(f_valid), jnp.asarray(kp_has_lm),
            max_dist=60, ratio=0.85,
        )
        idx = np.asarray(idx)
        rows = np.nonzero(idx >= 0)[0]
        if rows.size < 15:
            continue
        lm = m.kf_lm_idx[c, idx[rows]]
        ok = (lm >= 0) & m.lm_valid[lm]
        rows, lm = rows[ok], lm[ok]
        if rows.size < 15:
            continue
        cap = 512
        n = min(rows.size, cap)
        dst = np.zeros((cap, 3), np.float32)
        val = np.zeros(cap, bool)
        dst[:n] = m.lm_pw[lm[:n]]
        val[:n] = True

        if use_pnp:
            src_rays = np.zeros((cap, 3), np.float32)
            src_rays[:, 2] = 1.0
            src_rays[:n] = rays[rows[:n]]
            res = pnp_ransac(
                jnp.asarray(src_rays), jnp.asarray(dst), jnp.asarray(val),
                key, thresh=2.5 / float(system.cam.fx), min_inliers=12)
            if not bool(res.ok):
                continue
            Rcw = np.asarray(res.Rcw, np.float64)
            tcw = np.asarray(res.tcw, np.float64)
            inl = np.asarray(res.inliers)
        else:
            src = np.zeros((cap, 3), np.float32)
            src[:n] = p_frame[rows[:n]]
            res = sim3_ransac(
                jnp.asarray(src), jnp.asarray(dst), jnp.asarray(val),
                key, inlier_thresh=0.10, with_scale=False,
            )
            if int(res.n_inliers) < 15:
                continue
            R_wf = np.asarray(res.R)    # frame->world
            t_wf = np.asarray(res.t)
            Rcw = R_wf.T
            tcw = -R_wf.T @ t_wf
            inl = np.asarray(res.inliers)

        # Refine against the matched landmarks by projection.
        obs = PoseObs(
            pw=jnp.asarray(dst),
            uv=jnp.asarray(
                np.pad(np.asarray(frame.uv)[rows[:n]],
                       ((0, cap - n), (0, 0)))),
            ur=jnp.asarray(
                np.pad(np.asarray(frame.ur)[rows[:n]], (0, cap - n),
                       constant_values=-1.0)),
            inv_sigma2=jnp.ones(cap, jnp.float32),
            valid=jnp.asarray(val & inl),
        )
        ref = pose_optimization(
            jnp.asarray(Rcw.astype(np.float32)),
            jnp.asarray(tcw.astype(np.float32)),
            obs, system.cam, system.bf, rounds=2, iters_per_round=5)
        if int(ref.n_inliers) < 15:
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
