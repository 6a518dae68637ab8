"""Diagnose the multicam_kb8 accuracy row (VERDICT r3 weak #4: 6x worse
than rectified stereo on the same trajectory).

Stage 1 — depth quality: render one rig pair, build the multicam frame,
compare every triangulated keypoint depth against the ground-truth depth
map at its detected pixel (match-outlier rate + depth noise), for each
config variant.

Stage 2 — short-sequence ATE A/B over the variants:
  base       : KB8 rig, dist coeffs on, baseline 0.11 (the failing row)
  nodist     : KB8 with zero polynomial coeffs (pure equidistant)
  pinrig     : pinhole cameras through the SAME multicam path
               (isolates epipolar matching + DLT from the camera model)
  wide       : KB8 rig with the stereo row's geometry (fx 400, B=0.2)
  tol3       : base with epipolar_tol tightened 0.01 -> 0.003

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/debug_multicam_kb8.py
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from vieo_slam_tpu.cameras import models as cm  # noqa: E402
from vieo_slam_tpu.frontend.frame import build_multicam_frame  # noqa: E402
from vieo_slam_tpu.frontend.tracking import TrackerConfig  # noqa: E402
from vieo_slam_tpu.io.evaluate import ate  # noqa: E402
from vieo_slam_tpu.ops import orb  # noqa: E402
from vieo_slam_tpu.sim.world import (  # noqa: E402
    SyntheticWorld, WorldConfig, circle_trajectory, trajectory_to_tcw)
from vieo_slam_tpu.system import System, SystemConfig  # noqa: E402

N_FRAMES = int(os.environ.get("DBG_FRAMES", "60"))
NOISE_SIGMA = 2.0


def make_rig(variant):
    KB8_DIST = [0.02, 0.002, -0.001, 0.0005]
    fx, B = 300.0, 0.11
    dist = KB8_DIST
    tol = 0.01
    if variant == "nodist":
        dist = [0.0, 0.0, 0.0, 0.0]
    elif variant == "wide":
        fx, B = 400.0, 0.2
    elif variant == "tol3":
        tol = 0.003
    if variant == "pinrig":
        cam0 = cm.make_pinhole(fx, fx, 320.0, 240.0, 640, 480)
        cam1 = cm.make_pinhole(fx, fx, 320.0, 240.0, 640, 480,
                               Rcr=np.eye(3, dtype=np.float32),
                               tcr=np.asarray([-B, 0, 0], np.float32))
    else:
        cam0 = cm.make_kb8(fx, fx, 320.0, 240.0, dist, 640, 480)
        cam1 = cm.make_kb8(fx, fx, 320.0, 240.0, dist, 640, 480,
                           Rcr=np.eye(3, dtype=np.float32),
                           tcr=np.asarray([-B, 0, 0], np.float32))
    geom = cm.make_pinhole(fx, fx, 320.0, 240.0, 640, 480)
    return cam0, cam1, geom, fx * B, tol


def depth_quality(variant, seed=11):
    cam0, cam1, geom, bf, tol = make_rig(variant)
    world = SyntheticWorld(WorldConfig(
        n_landmarks=2200, seed=4, extent=(6.0, 4.5, 3.0),
        dynamic_frac=0.0))
    ts = np.arange(8) * 0.1
    Rwc, twc, _, _ = circle_trajectory(ts, radius=1.0, omega=0.35,
                                      look_outward=True)
    Rcw, tcw = trajectory_to_tcw(Rwc, twc)
    ocfg = orb.OrbConfig(n_features=600, n_levels=4)
    rng = np.random.RandomState(seed)
    build = jax.jit(functools.partial(
        build_multicam_frame, cams=[cam0, cam1], cfg=ocfg, geom_cam=geom,
        virt_bf=bf, max_depth=15.0, epipolar_tol=tol))
    errs, gts, n_d, n_kp = [], [], 0, 0
    for i in range(len(ts)):
        img0, gt_depth = world.render_view(
            cam0, Rcw[i], tcw[i], noise_sigma=NOISE_SIGMA, rng=rng,
            return_depth=True)
        R1 = cam1.Rcr @ Rcw[i]
        t1 = cam1.Rcr @ tcw[i] + cam1.tcr
        img1 = world.render_view(cam1, R1, t1, noise_sigma=NOISE_SIGMA,
                                 rng=rng)
        f = build([jnp.asarray(img0), jnp.asarray(img1)])
        depth = np.asarray(f.depth)
        valid = np.asarray(f.valid)
        # detected pixel in cam0's DISTORTED image: re-project uv_g back
        uv0 = np.asarray(cm.project(cam0, cm.unproject(
            geom, jnp.asarray(np.asarray(f.uv)))))
        n_kp += int(valid.sum())
        for j in np.nonzero(valid & (depth > 0))[0]:
            u, v = int(round(uv0[j, 0])), int(round(uv0[j, 1]))
            if 0 <= v < 480 and 0 <= u < 640 and gt_depth[v, u] > 0:
                errs.append(depth[j] - gt_depth[v, u])
                gts.append(gt_depth[v, u])
                n_d += 1
    errs = np.asarray(errs)
    gts = np.asarray(gts)
    rel = np.abs(errs) / gts
    out = int((rel > 0.1).sum())
    print(f"{variant:>8}: kp={n_kp} depth_pts={n_d} "
          f"med|dz|={np.median(np.abs(errs)):.3f} m "
          f"outliers(>10%)={out} ({100.0 * out / max(n_d, 1):.1f}%) "
          f"med_gt_z={np.median(gts):.2f} max_gt_z={gts.max():.2f}",
          flush=True)


def run_ate(variant, seed=11):
    cam0, cam1, geom, bf, tol = make_rig(variant)
    world = SyntheticWorld(WorldConfig(
        n_landmarks=2200, seed=4, extent=(6.0, 4.5, 3.0),
        dynamic_frac=0.02))
    ts = np.arange(N_FRAMES) * 0.1
    Rwc, twc, _, _ = circle_trajectory(ts, radius=1.0, omega=0.35,
                                      look_outward=True)
    Rcw, tcw = trajectory_to_tcw(Rwc, twc)
    ocfg = orb.OrbConfig(n_features=600, n_levels=4)
    rng = np.random.RandomState(seed)
    sys_ = System(geom, bf, SystemConfig(
        tracker=TrackerConfig(use_predicted_scale=True)))
    build = jax.jit(functools.partial(
        build_multicam_frame, cams=[cam0, cam1], cfg=ocfg, geom_cam=geom,
        virt_bf=bf, max_depth=15.0, epipolar_tol=tol))
    for i in range(N_FRAMES):
        t = float(ts[i])
        g = 1.0 + 0.10 * np.sin(0.5 * t)
        b = 8.0 * np.sin(0.3 * t)
        hard = dict(t=t, noise_sigma=NOISE_SIGMA, gain=g, bias=b, rng=rng)
        img0 = world.render_view(cam0, Rcw[i], tcw[i], **hard)
        R1 = cam1.Rcr @ Rcw[i]
        t1 = cam1.Rcr @ tcw[i] + cam1.tcr
        img1 = world.render_view(cam1, R1, t1, **hard)
        f = build([jnp.asarray(img0), jnp.asarray(img1)])
        f = f._replace(timestamp=jnp.asarray(t, jnp.float32))
        sys_.track_frame(f)
    m = sys_.map
    kfs = m.keyframe_ids()
    p = np.stack([-(m.kf_Rcw[k].T @ m.kf_tcw[k]) for k in kfs])
    res = ate(m.kf_timestamp[kfs], p, ts, twc)
    print(f"{variant:>8}: ATE rmse={res['rmse']:.4f} max={res['max']:.4f} "
          f"KFs={len(kfs)}", flush=True)
    return res


def main():
    variants = os.environ.get(
        "DBG_VARIANTS", "base,nodist,pinrig,wide,tol3").split(",")
    print("== stage 1: triangulated depth vs ground truth ==")
    for v in variants:
        depth_quality(v)
    print("== stage 2: short-sequence ATE ==")
    for v in variants:
        run_ate(v)
        jax.clear_caches()


if __name__ == "__main__":
    main()
