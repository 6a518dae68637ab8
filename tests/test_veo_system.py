"""End-to-end VEO (vision + wheel encoder, NO IMU) — the reference's
mode ENCODER (Tracking::CacheOdom src/Tracking.cc:31-72): encoder motion
prediction (GetVelocityByEnc :218), encoder+vision joint motion solve
(PoseOptimization with EdgeEncNavState edges), and wheel dead-reckoning
through visual dropouts (TrackWithOnlyOdom :79 → ODOMOK).

A vision+encoder robot with no IMU must be able to use the encoder from
frame one — there is no initialization phase to wait for."""

import numpy as np
import pytest

from vieo_slam_tpu.cameras import models as cm
from vieo_slam_tpu.frontend.frame import make_frame_from_features
from vieo_slam_tpu.io.evaluate import ate
from vieo_slam_tpu.sim.world import (
    SyntheticWorld, WorldConfig, circle_trajectory, make_encoder_samples,
    trajectory_to_tcw,
)
from vieo_slam_tpu.system import System, SystemConfig
from vieo_slam_tpu.vio.encoder_frontend import EncoderConfig, EncoderFrontend

pytestmark = pytest.mark.slow

N_FRAMES = 80
DROP = range(40, 60)     # 2 s visual dropout


def _run(use_encoder: bool, drop=DROP):
    cam = cm.make_pinhole(400.0, 400.0, 320.0, 240.0, 640, 480)
    bf = 400.0 * 0.2
    world = SyntheticWorld(WorldConfig(n_landmarks=4000, seed=3,
                                       extent=(6.0, 4.5, 3.0)))
    ts = np.arange(N_FRAMES) * 0.1
    Rwc, twc, v_w, a_w = circle_trajectory(ts, radius=1.0, omega=0.4,
                                           look_outward=True)
    Rcw, tcw = trajectory_to_tcw(Rwc, twc)
    # Encoder frame: x = direction of travel, z = world up (rig geometry
    # constant on a differential-drive circle); body == camera.
    x_e = Rwc[0].T @ (v_w[0] / np.linalg.norm(v_w[0]))
    z_e = Rwc[0].T @ np.array([0.0, 0.0, 1.0])
    y_e = np.cross(z_e, x_e)
    Rbe = np.stack([x_e, y_e, z_e], axis=-1).astype(np.float64)
    tbe = np.zeros(3)
    t_enc, v_l, v_r = make_encoder_samples(
        ts, Rwc.astype(np.float64), twc.astype(np.float64), Rbe, tbe,
        rate_hz=100.0, half_track=0.28, noise_v=2e-3, seed=7)

    sys_ = System(cam, bf, SystemConfig())
    veo = None
    if use_encoder:
        veo = EncoderFrontend(sys_, cfg=EncoderConfig(
            enc_half_track=0.28, enc_sigma_v=5e-3,
            enc_Rbe=Rbe, enc_tbe=tbe))
    rng = np.random.RandomState(11)
    enc_i = 0
    states = []
    for i in range(N_FRAMES):
        if use_encoder:
            while enc_i < len(t_enc) and t_enc[enc_i] <= ts[i]:
                veo.track_encoder(t_enc[enc_i], v_l[enc_i], v_r[enc_i])
                enc_i += 1
        obs = world.observe(
            Rcw[i], tcw[i], cam, bf=bf, n_kp=500, pixel_noise=0.25,
            bit_flips=4, clutter=50, rng=rng, max_depth=10.0)
        valid = obs["valid"] & (i not in drop)
        frame = make_frame_from_features(
            obs["uv"], obs["level"], obs["angle"], obs["desc"],
            valid, ur=obs["ur"], depth=obs["depth"], timestamp=ts[i])
        if use_encoder:
            states.append(veo.track_frame(frame))
        else:
            states.append(sys_.track_frame(frame))
    traj = sys_.tracker.trajectory
    t_est = np.asarray([x[0] for x in traj])
    p_est = np.asarray([-(x[1].T @ x[2]) for x in traj])
    res = ate(t_est, p_est, ts, twc)
    # error growth across the dropout in the estimate's world gauge
    p_world = p_est @ Rwc[0].T + twc[0]
    err = np.linalg.norm(p_world - twc[: len(p_world)], axis=1)
    bridge_err = float(err[drop[-1]] - err[drop[0] - 1]) \
        if len(drop) and len(err) > drop[-1] else 0.0
    return sys_, states, res, bridge_err


@pytest.fixture(scope="module")
def veo_runs():
    vision_only = _run(use_encoder=False)
    veo = _run(use_encoder=True)
    return vision_only, veo


class TestVeo:
    def test_no_init_needed_and_bridges_dropout(self, veo_runs):
        (_, st_a, *_), (_, st_b, *_) = veo_runs
        # vision-only loses track in the dropout; VEO bridges via ODOMOK
        assert any(s.name == "ODOMOK" for s in st_b)
        assert sum(s.name == "LOST" for s in st_b) == 0
        assert sum(s.name == "LOST" for s in st_a) > 0

    def test_veo_accuracy_cm_level(self, veo_runs):
        _, veo = veo_runs
        _, _, res, bridge = veo
        # full-trajectory ATE at cm level despite the 2 s outage
        assert res["rmse"] < 0.05, res
        # wheel dead-reckoning across the outage adds < 10 cm
        assert bridge < 0.10, bridge

    def test_fusion_does_not_degrade_clean_tracking(self):
        _, states, res, _ = _run(use_encoder=True, drop=range(0))
        assert all(s.name in ("OK", "NOT_INITIALIZED") for s in states)
        assert res["rmse"] < 0.02, res
