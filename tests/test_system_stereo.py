"""End-to-end stereo odometry on a synthetic world: tracking + mapping +
local BA, measured by ATE (the golden-trajectory integration test of
SURVEY.md §4)."""

import numpy as np
import pytest

from vieo_slam_tpu.cameras import models as cm
from vieo_slam_tpu.frontend.frame import make_frame_from_features
from vieo_slam_tpu.frontend.tracking import TrackState
from vieo_slam_tpu.io.evaluate import ate
from vieo_slam_tpu.sim.world import (
    SyntheticWorld, WorldConfig, circle_trajectory, trajectory_to_tcw,
)
from vieo_slam_tpu.system import System, SystemConfig

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def run_sequence():
    # Robot-stereo geometry: 20 cm baseline, structure at 1-4 m, so
    # single-view stereo depth is decent (sigma_z ~ 2-3 cm) like EuRoC
    # rooms; this gates pipeline correctness, not long-range robustness.
    cam = cm.make_pinhole(400.0, 400.0, 320.0, 240.0, 640, 480)
    bf = 400.0 * 0.2
    world = SyntheticWorld(WorldConfig(n_landmarks=4000, seed=3,
                                   extent=(6.0, 4.5, 3.0)))
    n_frames = 60
    ts = np.arange(n_frames) * 0.1
    Rwc, twc, _, _ = circle_trajectory(ts, radius=1.0, omega=0.25,
                                   look_outward=True)
    Rcw, tcw = trajectory_to_tcw(Rwc, twc)

    sys_ = System(cam, bf, SystemConfig())
    states = []
    rng = np.random.RandomState(11)
    for i in range(n_frames):
        obs = world.observe(
            Rcw[i], tcw[i], cam, bf=bf, n_kp=500, pixel_noise=0.25,
            bit_flips=4, clutter=50, rng=rng, max_depth=10.0,
        )
        frame = make_frame_from_features(
            obs["uv"], obs["level"], obs["angle"], obs["desc"],
            obs["valid"], ur=obs["ur"], depth=obs["depth"],
            timestamp=ts[i],
        )
        states.append(sys_.track_frame(frame))
    return sys_, states, ts, Rcw, tcw, twc


class TestStereoPipeline:
    def test_no_tracking_loss(self, run_sequence):
        sys_, states, *_ = run_sequence
        assert states[0] == TrackState.OK  # stereo init on first frame
        lost = sum(s == TrackState.LOST for s in states)
        assert lost == 0

    def test_keyframes_and_landmarks_created(self, run_sequence):
        sys_, *_ = run_sequence
        assert sys_.map.n_keyframes() >= 4
        assert sys_.map.n_landmarks() > 300

    def test_ate_within_tolerance(self, run_sequence):
        sys_, states, ts, Rcw, tcw, twc = run_sequence
        traj = sys_.tracker.trajectory
        t_est = np.asarray([x[0] for x in traj])
        p_est = np.asarray([-(x[1].T @ x[2]) for x in traj])  # twc
        result = ate(t_est, p_est, ts, twc)
        # Machinery-correctness gate at the stereo noise floor.
        assert result["rmse"] < 0.05, result

    def test_trajectory_tum_format(self, run_sequence):
        sys_, *_ = run_sequence
        txt = sys_.trajectory_tum()
        lines = txt.strip().split("\n")
        assert len(lines) == 60
        assert len(lines[0].split()) == 8

    def test_map_observations_consistent(self, run_sequence):
        sys_, *_ = run_sequence
        m = sys_.map
        # lm_n_obs matches the actual count of references in kf_lm_idx.
        for l in np.nonzero(m.lm_valid)[0][:200]:
            actual = int((m.kf_lm_idx == l).sum())
            assert actual == m.lm_n_obs[l], l
