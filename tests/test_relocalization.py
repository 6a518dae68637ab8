"""Relocalization test: kidnapped-robot recovery against the keyframe
database (Tracking::Relocalization parity for stereo)."""

import numpy as np
import pytest

from vieo_slam_tpu.backend.loop_closing import LoopCloser, LoopClosingConfig
from vieo_slam_tpu.cameras import models as cm
from vieo_slam_tpu.frontend.frame import make_frame_from_features
from vieo_slam_tpu.frontend.tracking import TrackState
from vieo_slam_tpu.sim.world import (
    SyntheticWorld, WorldConfig, circle_trajectory, trajectory_to_tcw,
)
from vieo_slam_tpu.system import System, SystemConfig

pytestmark = pytest.mark.slow


def test_kidnap_recovery():
    cam = cm.make_pinhole(400.0, 400.0, 320.0, 240.0, 640, 480)
    bf = 400.0 * 0.2
    world = SyntheticWorld(WorldConfig(n_landmarks=4000, seed=6,
                                       extent=(6.0, 4.5, 3.0)))
    ts = np.arange(80) * 0.1
    Rwc, twc, _, _ = circle_trajectory(ts, radius=1.0, omega=0.25,
                                       look_outward=True)
    Rcw, tcw = trajectory_to_tcw(Rwc, twc)
    sys_ = System(cam, bf, SystemConfig())
    sys_.loop_closer = LoopCloser(cam, bf, sys_.map, LoopClosingConfig())
    rng = np.random.RandomState(31)

    def frame_at(i):
        obs = world.observe(Rcw[i], tcw[i], cam, bf=bf, n_kp=500,
                            pixel_noise=0.25, bit_flips=4, clutter=40,
                            rng=rng, max_depth=10.0)
        return make_frame_from_features(
            obs["uv"], obs["level"], obs["angle"], obs["desc"],
            obs["valid"], ur=obs["ur"], depth=obs["depth"],
            timestamp=ts[i])

    # Track frames 0..39 normally.
    for i in range(40):
        sys_.track_frame(frame_at(i))
    assert sys_.map.n_keyframes() >= 5
    R0, t0 = Rcw[0], tcw[0]

    # KIDNAP: jump back to the view of frame 4 (mapped area) while the
    # tracker believes it is at frame 39's pose with stale velocity.
    st = None
    for attempt in range(3):
        st = sys_.track_frame(frame_at(4 + attempt))
        if st == TrackState.OK:
            break
    assert st == TrackState.OK, "relocalization failed"
    # Recovered pose must be near the true (frame ~4) pose in map frame.
    i = 4 + attempt
    Rg = Rcw[i] @ R0.T
    tg = tcw[i] - Rg @ t0
    terr = np.linalg.norm(sys_.tracker.tcw - tg)
    assert terr < 0.2, terr
