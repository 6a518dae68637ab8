"""End-to-end VIEO (vision + IMU + wheel encoder) — the system's
namesake configuration (README.md:14-20; src/Odom/OdomPreIntegrator.cpp:22
encoder preintegration; g2otypes.h:590 EdgeEncNavState; Tracking.cc:79
TrackWithOnlyOdom encoder preference).

A planar differential-drive circle with a mid-sequence visual dropout:
the encoder must (a) ride the joint motion solve without degrading ATE,
and (b) bridge the dropout with wheel dead-reckoning far tighter than
IMU double-integration."""

import numpy as np
import pytest

from vieo_slam_tpu.cameras import models as cm
from vieo_slam_tpu.frontend.frame import make_frame_from_features
from vieo_slam_tpu.io.evaluate import ate
from vieo_slam_tpu.sim.world import (
    SyntheticWorld, WorldConfig, circle_trajectory, make_encoder_samples,
    make_imu_samples, trajectory_to_tcw,
)
from vieo_slam_tpu.system import System, SystemConfig
from vieo_slam_tpu.vio.frontend import VioConfig, VioFrontend

pytestmark = pytest.mark.slow

BG = np.array([0.01, -0.02, 0.015], np.float32)
BA = np.array([0.05, 0.03, 0.02], np.float32)
N_FRAMES = 90
# Long visual dropout (3 s) + consumer-grade IMU noise: IMU-only
# dead-reckoning error grows ~t^2 through the outage while wheel
# odometry grows ~t, which is exactly the regime the encoder exists
# for (a 1 s outage with converged biases is bridged equally well by
# IMU double-integration alone).
DROP = range(45, 75)
NOISE_G = 1e-3
NOISE_A = 1.5e-2


def _run(use_encoder: bool):
    cam = cm.make_pinhole(400.0, 400.0, 320.0, 240.0, 640, 480)
    bf = 400.0 * 0.2
    world = SyntheticWorld(WorldConfig(n_landmarks=4000, seed=3,
                                       extent=(6.0, 4.5, 3.0)))
    ts = np.arange(N_FRAMES) * 0.1
    Rwc, twc, v_w, a_w = circle_trajectory(ts, radius=1.0, omega=0.4,
                                           look_outward=True)
    Rcw, tcw = trajectory_to_tcw(Rwc, twc)
    # Rcb = I: body == camera.  Encoder frame: x = direction of travel,
    # z = world up, derived numerically from the trajectory at t0 (the
    # rig geometry is constant on a differential-drive circle).
    x_e = Rwc[0].T @ (v_w[0] / np.linalg.norm(v_w[0]))
    z_e = Rwc[0].T @ np.array([0.0, 0.0, 1.0])
    y_e = np.cross(z_e, x_e)
    Rbe = np.stack([x_e, y_e, z_e], axis=-1).astype(np.float64)
    tbe = np.zeros(3)

    t_imu, gyro, acc = make_imu_samples(
        ts, Rwc.astype(np.float64), v_w, a_w, rate_hz=200.0,
        bg=BG, ba=BA, noise_g=NOISE_G, noise_a=NOISE_A, seed=5)
    t_enc, v_l, v_r = make_encoder_samples(
        ts, Rwc.astype(np.float64), twc.astype(np.float64), Rbe, tbe,
        rate_hz=100.0, half_track=0.28, noise_v=2e-3, seed=7)

    sys_ = System(cam, bf, SystemConfig())
    vio = VioFrontend(sys_, cfg=VioConfig(
        init_min_kfs=10, init_min_span=3.0, init_final_span=4.5,
        use_encoder=use_encoder, enc_half_track=0.28, enc_sigma_v=5e-3,
        enc_Rbe=Rbe, enc_tbe=tbe))
    rng = np.random.RandomState(11)
    imu_i = enc_i = 0
    states = []
    for i in range(N_FRAMES):
        while imu_i < len(t_imu) and t_imu[imu_i] <= ts[i]:
            vio.track_odom(t_imu[imu_i], gyro[imu_i], acc[imu_i])
            imu_i += 1
        if use_encoder:
            while enc_i < len(t_enc) and t_enc[enc_i] <= ts[i]:
                vio.track_encoder(t_enc[enc_i], v_l[enc_i], v_r[enc_i])
                enc_i += 1
        obs = world.observe(
            Rcw[i], tcw[i], cam, bf=bf, n_kp=500, pixel_noise=0.25,
            bit_flips=4, clutter=50, rng=rng, max_depth=10.0)
        valid = obs["valid"] & (i not in DROP)      # dropout: no features
        frame = make_frame_from_features(
            obs["uv"], obs["level"], obs["angle"], obs["desc"],
            valid, ur=obs["ur"], depth=obs["depth"], timestamp=ts[i])
        states.append(vio.track_frame(frame))
    traj = sys_.tracker.trajectory
    t_est = np.asarray([x[0] for x in traj])
    p_est = np.asarray([-(x[1].T @ x[2]) for x in traj])
    res = ate(t_est, p_est, ts, twc)
    # Bridge quality: GROWTH of the world-frame error across the outage.
    # (The init-GBA's gravity-direction refinement legitimately rotates
    # the world gauge — the reference's VertexGThetaXYRwI does the same —
    # so absolute error carries a constant gauge offset; dead-reckoning
    # quality is the error added BETWEEN entering and leaving the
    # dropout.)  est world = camera-0 frame.
    p_world = p_est @ Rwc[0].T + twc[0]
    err = np.linalg.norm(p_world - twc[: len(p_world)], axis=1)
    bridge_err = float(err[DROP[-1]] - err[DROP[0] - 1])
    return sys_, vio, states, res, bridge_err


@pytest.fixture(scope="module")
def vieo_runs():
    imu_only = _run(use_encoder=False)
    vieo = _run(use_encoder=True)
    return imu_only, vieo


class TestVieo:
    def test_initializes_and_survives(self, vieo_runs):
        (_, vio_a, st_a, *_), (_, vio_b, st_b, *_) = vieo_runs
        assert vio_a.inited and vio_b.inited
        assert sum(s.name == "LOST" for s in st_b) == 0
        # the dropout frames bridge through ODOMOK, not LOST
        assert any(s.name == "ODOMOK" for s in st_b)

    def test_encoder_tightens_bridge(self, vieo_runs):
        (_, _, _, res_a, bridge_a), (_, _, _, res_b, bridge_b) = vieo_runs
        # wheel dead-reckoning must beat IMU double-integration through
        # the outage, and the overall ATE must not degrade
        assert bridge_b < max(bridge_a, 0.02), (bridge_a, bridge_b)
        assert res_b["rmse"] < max(1.2 * res_a["rmse"], 0.06), \
            (res_a["rmse"], res_b["rmse"])

    def test_vieo_absolute_quality(self, vieo_runs):
        _, (_, vio, _, res, bridge) = vieo_runs
        assert res["rmse"] < 0.10, res
        assert bridge < 0.05, bridge
        assert np.isfinite(np.asarray(vio.ns_last.p)).all()
