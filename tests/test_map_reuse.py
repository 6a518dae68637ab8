"""Map save/load + MAP_REUSE relocalization + localization-only mode
(System.cc:69-270 LoadMap, :578-586 MAP_REUSE, :636-711 mode switches)."""

import os

import numpy as np
import pytest

from vieo_slam_tpu.backend.loop_closing import (LoopCloser,
                                                LoopClosingConfig)
from vieo_slam_tpu.cameras import models as cm
from vieo_slam_tpu.frontend.frame import make_frame_from_features
from vieo_slam_tpu.sim.world import (
    SyntheticWorld, WorldConfig, circle_trajectory, trajectory_to_tcw,
)
from vieo_slam_tpu.system import System, SystemConfig, TrackState

pytestmark = pytest.mark.slow


def test_map_reuse_relocalize(tmp_path):
    cam = cm.make_pinhole(400.0, 400.0, 320.0, 240.0, 640, 480)
    bf = 400.0 * 0.2
    world = SyntheticWorld(WorldConfig(n_landmarks=4000, seed=3,
                                       extent=(6.0, 4.5, 3.0)))
    n_frames = 40
    ts = np.arange(n_frames) * 0.1
    Rwc, twc, _, _ = circle_trajectory(ts, radius=1.0, omega=0.25,
                                       look_outward=True)
    Rcw, tcw = trajectory_to_tcw(Rwc, twc)
    rng = np.random.RandomState(11)

    def frame_at(i):
        obs = world.observe(Rcw[i], tcw[i], cam, bf=bf, n_kp=500,
                            pixel_noise=0.25, bit_flips=4, clutter=50,
                            rng=rng, max_depth=10.0)
        return make_frame_from_features(
            obs["uv"], obs["level"], obs["angle"], obs["desc"],
            obs["valid"], ur=obs["ur"], depth=obs["depth"],
            timestamp=ts[i])

    sys_ = System(cam, bf, SystemConfig())
    sys_.loop_closer = LoopCloser(cam, bf, sys_.map,
                                  LoopClosingConfig())
    est1 = {}
    for i in range(n_frames):
        sys_.track_frame(frame_at(i))
        est1[i] = -sys_.tracker.Rcw.T @ sys_.tracker.tcw
    assert sys_.map.n_keyframes() >= 5

    path = os.path.join(tmp_path, "map.npz")
    sys_.save_map(path)

    # Fresh system, loaded map, localization-only: the first frame must
    # relocalize (MAP_REUSE), and the map must stay frozen.
    sys2 = System(cam, bf, SystemConfig())
    sys2.loop_closer = LoopCloser(cam, bf, sys2.map, LoopClosingConfig())
    sys2.load_map(path)
    sys2.set_localization_mode(True)
    assert sys2.map.n_keyframes() == sys_.map.n_keyframes()
    assert sys2.tracker.state == TrackState.LOST

    n_kf_before = sys2.map.n_keyframes()
    ok_states = []
    for i in (20, 21, 22):
        st = sys2.track_frame(frame_at(i))
        ok_states.append(st)
    assert any(s == TrackState.OK for s in ok_states), ok_states
    # Pose consistent with the loaded map after reloc: compare against
    # the FIRST run's own estimate at the same frame (the map's
    # coordinate frame carries the first run's drift; relocalization
    # recovers the map frame, not ground truth).
    i_ok = (20, 21, 22)[max(j for j, s in enumerate(ok_states)
                            if s == TrackState.OK)]
    p_est = -sys2.tracker.Rcw.T @ sys2.tracker.tcw
    # 0.15 m: the weak-baseline map carries ~0.6 m of internal drift
    # (landmark/pose inconsistency), so a fresh-noise frame relocalizing
    # against a drifted map cannot be pinned tighter than the map's own
    # local inconsistency scale.
    assert np.linalg.norm(p_est - est1[i_ok]) < 0.15, (p_est, est1[i_ok])
    # localization mode froze the map
    assert sys2.map.n_keyframes() == n_kf_before
