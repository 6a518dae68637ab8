"""Diagnose tracking failure on the lemniscate (yaw-acceleration spikes).

VERDICT r4 #1: the reference's hard sequences (V103/MH05) are
aggressive-rotation runs and its VIO path exists to survive them
(PredictNavStateByIMU, /root/reference/src/Tracking.cc:385).  The r4
measurement says image-level tracking dies at the lobe ends at any
feature budget; this script instruments WHERE and WHY:

  per frame: state, n_inliers, yaw rate (deg/frame), yaw accel,
  prediction error of the pose model actually used (CV or IMU) in
  pixels at the image centre.

Modes (env):
  MODE=stereo   plain stereo, constant-velocity prediction (baseline)
  MODE=vio      stereo+IMU: IMU propagation feeds the projection search
  LEM_A/LEM_B   lemniscate half-axes (default 3.0/1.0)
  FRAMES        default 200 (just past the first lobe end)
  ADAPT=1       adaptive search radius on predicted rotation rate

Run: PYTHONPATH=/root/repo python scripts/debug_lemniscate.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from vieo_slam_tpu.cameras import models as cm  # noqa: E402
from vieo_slam_tpu.frontend.frame import build_stereo_frame  # noqa: E402
from vieo_slam_tpu.frontend.tracking import TrackerConfig  # noqa: E402
from vieo_slam_tpu.io.evaluate import ate  # noqa: E402
from vieo_slam_tpu.ops import orb  # noqa: E402
from vieo_slam_tpu.sim.world import (  # noqa: E402
    SyntheticWorld, WorldConfig, figure_eight_trajectory,
    make_imu_samples, trajectory_to_tcw)
from vieo_slam_tpu.system import System, SystemConfig  # noqa: E402
from vieo_slam_tpu.vio.frontend import VioConfig, VioFrontend  # noqa: E402

MODE = os.environ.get("MODE", "stereo")
FRAMES = int(os.environ.get("FRAMES", "200"))
SEED = int(os.environ.get("SEED", "11"))
A = float(os.environ.get("LEM_A", "3.0"))
B = float(os.environ.get("LEM_B", "1.0"))
NOISE_SIGMA = 2.0


def main():
    BASELINE = 0.2
    fx = 400.0
    cam = cm.make_pinhole(fx, fx, 320.0, 240.0, 640, 480)
    bf = fx * BASELINE
    world = SyntheticWorld(WorldConfig(
        n_landmarks=4000, seed=4, extent=(10.0, 7.0, 3.0)))
    ts = np.arange(FRAMES) * 0.1
    omega = 2 * np.pi / (180 * 0.1)    # 180 frames/lap
    Rwc, twc, v_w, a_w = figure_eight_trajectory(
        ts, a=A, b=B, omega=omega)
    Rcw, tcw = trajectory_to_tcw(Rwc, twc)
    ocfg = orb.OrbConfig(n_features=600, n_levels=4)
    rng = np.random.RandomState(SEED)
    sys_ = System(cam, bf, SystemConfig(
        tracker=TrackerConfig(use_predicted_scale=True)))

    vio = None
    imu = None
    if MODE == "vio":
        bg = np.array([0.01, -0.02, 0.015], np.float32)
        ba = np.array([0.05, 0.03, -0.04], np.float32)
        t_imu, gyro, acc = make_imu_samples(
            ts, Rwc.astype(np.float64), v_w, a_w, rate_hz=200.0,
            bg=bg, ba=ba, noise_g=1e-4, noise_a=1e-3, seed=SEED + 100)
        vio = VioFrontend(sys_, cfg=VioConfig(init_min_kfs=10,
                                              init_min_span=3.0))
        imu = (t_imu, gyro, acc)

    build = jax.jit(lambda l, r, t: build_stereo_frame(
        l, r, ocfg, bf=bf, min_depth=0.3, max_depth=15.0, timestamp=t))

    # per-frame yaw rate/accel of the ground truth
    yaw = np.unwrap(np.arctan2(Rwc[:, 1, 2], Rwc[:, 0, 2]))
    yaw_rate = np.degrees(np.diff(yaw, prepend=yaw[0]))
    yaw_acc = np.diff(yaw_rate, prepend=yaw_rate[0])

    tr = sys_.tracker
    imu_i = 0
    for i in range(FRAMES):
        t = float(ts[i])
        if vio is not None:
            ti_, gy_, ac_ = imu
            while imu_i < len(ti_) and ti_[imu_i] <= t:
                vio.track_odom(ti_[imu_i], gy_[imu_i], ac_[imu_i])
                imu_i += 1
        img_l, img_r = world.render_stereo(
            cam, Rcw[i], tcw[i], BASELINE, t=t, noise_sigma=NOISE_SIGMA,
            rng=rng)
        frame = build(jnp.asarray(img_l), jnp.asarray(img_r),
                      jnp.asarray(t, jnp.float64))
        # peek (without consuming) the prediction the tracker will use
        if tr.external_prediction is not None:
            pred = "imu"
            R_pred, t_pred = tr.external_prediction
        elif tr.velocity is not None:
            pred = "cv"
            dRv, dtv = tr.velocity
            R_pred, t_pred = dRv @ tr.Rcw, dRv @ tr.tcw + dtv
        else:
            pred = "none"
            R_pred = t_pred = None
        # ground truth mapped into the SLAM gauge (first KF at identity):
        # T_slam(i) = T_cw(i) ∘ T_cw(0)^-1
        R_true = Rcw[i] @ Rcw[0].T
        t_true = tcw[i] - R_true @ tcw[0]
        # prediction error split into rotation (deg) and translation (m)
        rerr = terr = float("nan")
        if R_pred is not None:
            cosang = (np.trace(R_pred @ R_true.T) - 1) / 2
            rerr = float(np.degrees(np.arccos(np.clip(cosang, -1, 1))))
            c_pred = -R_pred.T @ t_pred
            c_true = -R_true.T @ t_true
            terr = float(np.linalg.norm(c_pred - c_true))
        # slab coverage: how many CURRENT slab landmarks project into the
        # image at the TRUE pose (is there anything to match at all?)
        with sys_.map.lock:
            pw_s, _, _, valid_s, _ = tr._local_landmark_slab()
        pc_s = pw_s[valid_s] @ R_true.T + t_true
        uv_s = np.asarray(cm.project(cam, jnp.asarray(pc_s)))
        cov = int(((pc_s[:, 2] > 0.1)
                   & (uv_s[:, 0] >= 0) & (uv_s[:, 0] < 640)
                   & (uv_s[:, 1] >= 0) & (uv_s[:, 1] < 480)).sum())
        if vio is not None:
            vio.track_frame(frame)
        else:
            sys_.track_frame(frame)
        ninl = int(tr.last_result.n_inliers) \
            if tr.last_result is not None and tr.state.name == "OK" else 0
        nmatch = int((np.asarray(tr.last_result.lm_match) >= 0).sum()) \
            if tr.last_result is not None else 0
        from vieo_slam_tpu.utils.metrics import metrics as _mx
        created = _mx.counters.get("landmarks_created", 0)
        n_kp_valid = int(np.asarray(frame.valid).sum())
        n_kp_depth = int((np.asarray(frame.depth) > 0).sum())
        m_ = sys_.map
        print(f"[{i:3d}] {tr.state.name:7s} inl={ninl:3d} match={nmatch:3d} "
              f"cov={cov:4d} kf={m_.n_keyframes():3d} "
              f"lm={m_.n_landmarks():5d} made={created:5d} "
              f"kp={n_kp_valid:3d}/{n_kp_depth:3d} "
              f"yaw_rate={yaw_rate[i]:+6.2f} pred={pred} "
              f"rerr={rerr:5.2f}deg terr={terr:5.3f}m", flush=True)
        if tr.state.name == "LOST" and i > 150:
            break

    sys_.wait_idle()
    m = sys_.map
    kfs = m.keyframe_ids()
    if len(kfs) > 2:
        p = np.stack([-(m.kf_Rcw[k].T @ m.kf_tcw[k]) for k in kfs])
        print("final kf_ate:", ate(m.kf_timestamp[kfs], p, ts, twc)["rmse"])
    sys_.shutdown()


if __name__ == "__main__":
    main()
