"""RGB-D mode: depth-keyed virtual-stereo tracking end to end
(Frame::ComputeStereoFromRGBD path)."""

import numpy as np

from vieo_slam_tpu.cameras import models as cm
from vieo_slam_tpu.frontend.frame import make_frame_from_features
from vieo_slam_tpu.io.evaluate import ate
from vieo_slam_tpu.sim.world import (
    SyntheticWorld, WorldConfig, circle_trajectory, trajectory_to_tcw,
)
from vieo_slam_tpu.system import System, SystemConfig

import pytest

pytestmark = pytest.mark.slow


def test_rgbd_end_to_end():
    cam = cm.make_pinhole(400.0, 400.0, 320.0, 240.0, 640, 480)
    bf = 400.0 * 0.12          # virtual baseline (RGB-D convention)
    world = SyntheticWorld(WorldConfig(n_landmarks=4000, seed=3,
                                       extent=(6.0, 4.5, 3.0)))
    n = 50
    ts = np.arange(n) * 0.1
    Rwc, twc, _, _ = circle_trajectory(ts, radius=1.0, omega=0.25,
                                       look_outward=True)
    Rcw, tcw = trajectory_to_tcw(Rwc, twc)
    sys_ = System(cam, bf, SystemConfig())
    rng = np.random.RandomState(11)
    for i in range(n):
        obs = world.observe(Rcw[i], tcw[i], cam, bf=0.0, n_kp=500,
                            pixel_noise=0.25, bit_flips=4, clutter=40,
                            rng=rng, max_depth=10.0)
        # RGB-D: metric depth sensor (small multiplicative noise), virtual
        # right coordinate ur = u - bf/z.
        lm = obs["lm_id"]
        depth = np.full(len(lm), -1.0, np.float32)
        vis = lm >= 0
        z = (world.pw[lm[vis]] @ Rcw[i].T + tcw[i])[:, 2]
        depth[vis] = z * (1 + rng.randn(vis.sum()) * 0.005)
        ur = np.where(depth > 0, obs["uv"][:, 0] - bf / np.maximum(
            depth, 1e-3), -1.0).astype(np.float32)
        frame = make_frame_from_features(
            obs["uv"], obs["level"], obs["angle"], obs["desc"],
            obs["valid"], ur=ur, depth=depth, timestamp=ts[i])
        sys_.track_frame(frame)
    traj = sys_.tracker.trajectory
    t_est = np.asarray([x[0] for x in traj])
    p_est = np.asarray([-(x[1].T @ x[2]) for x in traj])
    res = ate(t_est, p_est, ts, twc)
    # RGB-D currently lands ~0.15 on this circuit (one mid-run drift
    # episode the stereo twin avoids; see TODO.md robustness backlog).
    assert res["rmse"] < 0.2, res
