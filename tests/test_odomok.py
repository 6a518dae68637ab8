"""ODOMOK dead-reckoning bridge: a visual dropout with healthy IMU must
bridge through ODOMOK and re-acquire, not go LOST
(Tracking::TrackWithOnlyOdom, src/Tracking.cc:79-155)."""

import numpy as np
import pytest

from vieo_slam_tpu.cameras import models as cm
from vieo_slam_tpu.frontend.frame import make_frame_from_features
from vieo_slam_tpu.io.evaluate import ate
from vieo_slam_tpu.sim.world import (
    SyntheticWorld, WorldConfig, circle_trajectory, make_imu_samples,
    trajectory_to_tcw,
)
from vieo_slam_tpu.system import System, SystemConfig
from vieo_slam_tpu.vio.frontend import VioConfig, VioFrontend

pytestmark = pytest.mark.slow

BG = np.array([0.01, -0.02, 0.015], np.float32)
BA = np.array([0.05, 0.03, -0.04], np.float32)
DROP = range(55, 63)      # frames with no usable vision


def test_visual_dropout_bridges_through_odomok():
    cam = cm.make_pinhole(400.0, 400.0, 320.0, 240.0, 640, 480)
    bf = 400.0 * 0.2
    world = SyntheticWorld(WorldConfig(n_landmarks=4000, seed=3,
                                       extent=(6.0, 4.5, 3.0)))
    n_frames = 90
    ts = np.arange(n_frames) * 0.1
    Rwc, twc, v_w, a_w = circle_trajectory(ts, radius=1.0, omega=0.25,
                                           look_outward=True)
    Rcw, tcw = trajectory_to_tcw(Rwc, twc)
    t_imu, gyro, acc = make_imu_samples(
        ts, Rwc.astype(np.float64), v_w, a_w, rate_hz=200.0,
        bg=BG, ba=BA, noise_g=1e-4, noise_a=1e-3, seed=5)

    sys_ = System(cam, bf, SystemConfig())
    vio = VioFrontend(sys_, cfg=VioConfig(init_min_kfs=10,
                                          init_min_span=3.0))
    rng = np.random.RandomState(11)
    imu_i = 0
    states = []
    for i in range(n_frames):
        while imu_i < len(t_imu) and t_imu[imu_i] <= ts[i]:
            vio.track_odom(t_imu[imu_i], gyro[imu_i], acc[imu_i])
            imu_i += 1
        obs = world.observe(
            Rcw[i], tcw[i], cam, bf=bf, n_kp=500, pixel_noise=0.25,
            bit_flips=4, clutter=50, rng=rng, max_depth=10.0,
        )
        valid = obs["valid"]
        if i in DROP:
            valid = np.zeros_like(valid)      # lens covered
        frame = make_frame_from_features(
            obs["uv"], obs["level"], obs["angle"], obs["desc"],
            valid, ur=obs["ur"], depth=obs["depth"], timestamp=ts[i],
        )
        states.append(vio.track_frame(frame))

    names = [s.name for s in states]
    assert vio.inited
    assert "LOST" not in names, names
    assert any(n == "ODOMOK" for n in (names[i] for i in DROP)), \
        [names[i] for i in DROP]
    # re-acquired after the dropout
    assert all(n == "OK" for n in names[max(DROP) + 3:]), \
        names[max(DROP) + 1:]

    traj = sys_.tracker.trajectory
    t_est = np.asarray([x[0] for x in traj])
    p_est = np.asarray([-(x[1].T @ x[2]) for x in traj])
    res = ate(t_est, p_est, ts, twc)
    assert res["rmse"] < 0.15, res
