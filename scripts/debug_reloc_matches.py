"""Measure frame<->KF descriptor match quality in the blackout-recovery
regime: run the stereo circle to just past the blackout, then compare a
post-blackout frame against the best candidate KF at several
(max_dist, ratio) gates, with ground-truth landmark ids from the
renderer-side world geometry (nearest projected landmark per keypoint).

Run: PYTHONPATH=/root/repo python scripts/debug_reloc_matches.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from vieo_slam_tpu.backend.loop_closing import (  # noqa: E402
    LoopCloser, LoopClosingConfig)
from vieo_slam_tpu.cameras import models as cm  # noqa: E402
from vieo_slam_tpu.frontend.frame import build_stereo_frame  # noqa: E402
from vieo_slam_tpu.frontend.tracking import TrackerConfig  # noqa: E402
from vieo_slam_tpu.ops import matching, orb  # noqa: E402
from vieo_slam_tpu.sim.world import (  # noqa: E402
    SyntheticWorld, WorldConfig, circle_trajectory, trajectory_to_tcw)
from vieo_slam_tpu.system import System, SystemConfig  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples"))
from evaluate_ntimes import _gain_bias, NOISE_SIGMA, DYNAMIC_FRAC  # noqa: E402

SEED = 11
N = 50          # run to frame 50 (blackout 36-47 in the 60-frame row)


def main():
    BASELINE = 0.2
    fx = 400.0
    cam = cm.make_pinhole(fx, fx, 320.0, 240.0, 640, 480)
    bf = fx * BASELINE
    world = SyntheticWorld(WorldConfig(
        n_landmarks=2200, seed=4, extent=(6.0, 4.5, 3.0),
        dynamic_frac=DYNAMIC_FRAC))
    ts = np.arange(60) * 0.1
    Rwc, twc, _, _ = circle_trajectory(ts, radius=1.0, omega=0.35,
                                       look_outward=True)
    Rcw, tcw = trajectory_to_tcw(Rwc, twc)
    ocfg = orb.OrbConfig(n_features=600, n_levels=4)
    rng = np.random.RandomState(SEED)
    sys_ = System(cam, bf, SystemConfig(
        tracker=TrackerConfig(use_predicted_scale=True)))
    sys_.loop_closer = LoopCloser(cam, bf, sys_.map,
                                  LoopClosingConfig(min_kf_gap=8))
    build = jax.jit(lambda l, r, t: build_stereo_frame(
        l, r, ocfg, bf=bf, min_depth=0.3, max_depth=15.0, timestamp=t))
    frames = {}
    for i in range(N + 1):
        t = float(ts[i])
        g, b = _gain_bias(t)
        img_l, img_r = world.render_stereo(
            cam, Rcw[i], tcw[i], BASELINE, t=t, noise_sigma=NOISE_SIGMA,
            gain=g, bias=b, rng=rng)
        if 36 <= i < 48:
            img_l = np.zeros_like(img_l)
            img_r = np.zeros_like(img_r)
        frame = build(jnp.asarray(img_l), jnp.asarray(img_r),
                      jnp.asarray(t, jnp.float64))
        frames[i] = frame
        sys_.track_frame(frame)
        print(f"[{i}] {sys_.tracker.state.name} kf={sys_.map.n_keyframes()}",
              flush=True)

    m = sys_.map
    frame = frames[N]
    f_valid = np.asarray(frame.valid)
    f_desc = np.asarray(frame.desc)
    kfs = m.keyframe_ids()
    # candidate = the KF whose view direction best matches frame N's —
    # IN THE MAP GAUGE (anchored at frame 0): axis of frame N in map
    # gauge is row 2 of R_true = Rcw[N] Rcw[0]^T.
    R_true_N = Rcw[N] @ Rcw[0].T
    best_c, best_dot = None, -2
    for k in kfs:
        d = float(m.kf_Rcw[k][2] @ R_true_N[2])
        if d > best_dot:
            best_c, best_dot = int(k), d
    c = best_c
    print(f"frame {N} vs KF {c} (axis dot {best_dot:.3f}, "
          f"t_kf={m.kf_timestamp[c]:.1f})")
    kp_has_lm = m.kf_kp_valid[c] & (m.kf_lm_idx[c] >= 0)
    print(f"frame valid kps: {f_valid.sum()}  "
          f"KF lm-carrying kps: {kp_has_lm.sum()}")
    for max_dist, ratio in ((60, 0.85), (60, 1.0), (80, 0.85), (80, 1.0),
                            (100, 1.0), (256, 1.0)):
        idx, dist = matching.match_descriptors(
            jnp.asarray(f_desc), jnp.asarray(m.kf_desc[c]),
            jnp.asarray(f_valid), jnp.asarray(kp_has_lm),
            max_dist=max_dist, ratio=ratio)
        idx = np.asarray(idx)
        nm = int((idx >= 0).sum())
        # geometric check: matched pairs whose pixel positions agree
        # after projecting the KF keypoint's landmark into frame N's
        # TRUE pose (within 4 px = true correspondence)
        rows = np.nonzero(idx >= 0)[0]
        lm = m.kf_lm_idx[c, idx[rows]]
        ok = lm >= 0
        pw = m.lm_pw[np.clip(lm, 0, None)]
        # map gauge == world gauge anchored at frame 0 identity
        R_true = Rcw[N] @ Rcw[0].T
        t_true = tcw[N] - R_true @ tcw[0]
        pc = pw @ R_true.T + t_true
        uvp = np.asarray(cm.project(cam, jnp.asarray(pc)))
        err = np.linalg.norm(uvp - np.asarray(frame.uv)[rows], axis=1)
        good = int(((err < 4.0) & ok).sum())
        print(f"  max_dist={max_dist:3d} ratio={ratio:4.2f}: "
              f"matches={nm:4d} geom-consistent={good:4d}")
    # Hamming distance distribution of geometrically-true pairs:
    # project every valid KF landmark into frame N, find the nearest
    # frame keypoint within 2 px, record the descriptor distance.
    lmv = m.kf_lm_idx[c][kp_has_lm]
    kpv = np.nonzero(kp_has_lm)[0]
    pw = m.lm_pw[lmv]
    R_true = Rcw[N] @ Rcw[0].T
    t_true = tcw[N] - R_true @ tcw[0]
    pc = pw @ R_true.T + t_true
    uvp = np.asarray(cm.project(cam, jnp.asarray(pc)))
    fuv = np.asarray(frame.uv)
    dists = []
    for j in range(len(kpv)):
        if pc[j, 2] < 0.1:
            continue
        d2 = np.linalg.norm(fuv - uvp[j], axis=1)
        d2[~f_valid] = 1e9
        nb = int(np.argmin(d2))
        if d2[nb] < 2.0:
            a = np.asarray(
                f_desc[nb], np.uint32) ^ np.asarray(
                m.kf_desc[c, kpv[j]], np.uint32)
            ham = sum(bin(int(x)).count("1") for x in a)
            dists.append(ham)
    dists = np.asarray(dists)
    print(f"geometrically-true pairs: {len(dists)}; hamming "
          f"p10/p50/p90 = {np.percentile(dists, [10, 50, 90])}"
          if len(dists) else "no true pairs found")


if __name__ == "__main__":
    main()
