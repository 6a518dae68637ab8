"""End-to-end stereo VIO: IMU ingest -> VI init -> fused tracking
(the headline Stereo-VIO configuration on the synthetic world)."""

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


@pytest.fixture(scope="module")
def vio_run():
    cam = cm.make_pinhole(400.0, 400.0, 320.0, 240.0, 640, 480)
    bf = 400.0 * 0.2
    world = SyntheticWorld(WorldConfig(n_landmarks=4000, seed=3,
                                       extent=(6.0, 4.5, 3.0)))
    n_frames = 120
    ts = np.arange(n_frames) * 0.1
    Rwc, twc, v_w, a_w = circle_trajectory(ts, radius=1.0, omega=0.25,
                                           look_outward=True)
    Rcw, tcw = trajectory_to_tcw(Rwc, twc)
    # Rcb = I: body == camera; IMU samples in the camera/body frame.
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
        # Feed IMU up to the frame timestamp (the odomRun feeder thread).
        while imu_i < len(t_imu) and t_imu[imu_i] <= ts[i]:
            vio.track_odom(t_imu[imu_i], gyro[imu_i], acc[imu_i])
            imu_i += 1
        obs = world.observe(
            Rcw[i], tcw[i], cam, bf=bf, n_kp=500, pixel_noise=0.25,
            bit_flips=4, clutter=50, rng=rng, max_depth=10.0,
        )
        frame = make_frame_from_features(
            obs["uv"], obs["level"], obs["angle"], obs["desc"],
            obs["valid"], ur=obs["ur"], depth=obs["depth"],
            timestamp=ts[i],
        )
        states.append(vio.track_frame(frame))
    return sys_, vio, states, ts, twc


class TestStereoVio:
    def test_initializes(self, vio_run):
        sys_, vio, states, ts, twc = vio_run
        assert vio.inited

    def test_gravity_and_bias_recovered(self, vio_run):
        sys_, vio, *_ = vio_run
        np.testing.assert_allclose(
            np.linalg.norm(vio.gw), 9.81, atol=0.05)
        # Gravity direction: the world frame here is cam0 = body at t0.
        np.testing.assert_allclose(vio.bg, BG, atol=1.2e-2)

    def test_tracking_quality(self, vio_run):
        sys_, vio, states, ts, twc = vio_run
        lost = sum(s.name == "LOST" for s in states)
        assert lost == 0
        traj = sys_.tracker.trajectory
        t_est = np.asarray([x[0] for x in traj])
        p_est = np.asarray([-(x[1].T @ x[2]) for x in traj])
        res = ate(t_est, p_est, ts, twc)
        assert res["rmse"] < 0.08, res

    def test_fused_states_finite(self, vio_run):
        sys_, vio, *_ = vio_run
        assert np.isfinite(np.asarray(vio.ns_last.p)).all()
        assert np.isfinite(np.asarray(vio.ns_last.v)).all()
        if vio.prior_info is not None:
            assert np.isfinite(vio.prior_info).all()
