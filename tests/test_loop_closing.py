"""End-to-end loop closing on a synthetic revisit trajectory: detection via
BoW, Sim3 verification, pose-graph correction reduce drift."""

import numpy as np
import pytest

from vieo_slam_tpu.backend.loop_closing import LoopCloser, LoopClosingConfig
from vieo_slam_tpu.cameras import models as cm
from vieo_slam_tpu.frontend.frame import make_frame_from_features
from vieo_slam_tpu.io.evaluate import ate
from vieo_slam_tpu.sim.world import (
    SyntheticWorld, WorldConfig, circle_trajectory, trajectory_to_tcw,
)
from vieo_slam_tpu.system import System, SystemConfig

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def loop_run():
    cam = cm.make_pinhole(400.0, 400.0, 320.0, 240.0, 640, 480)
    bf = 400.0 * 0.2
    world = SyntheticWorld(WorldConfig(n_landmarks=5000, seed=4,
                                       extent=(6.0, 4.5, 3.0)))
    n_frames = 200
    ts = np.arange(n_frames) * 0.1
    # Full circle: omega*T = 0.35 * 20 = 7 rad > 2*pi — revisits the start.
    Rwc, twc, _, _ = circle_trajectory(ts, radius=1.0, omega=0.35,
                                       look_outward=True)
    Rcw, tcw = trajectory_to_tcw(Rwc, twc)

    sys_ = System(cam, bf, SystemConfig())
    sys_.loop_closer = LoopCloser(cam, bf, sys_.map,
                                  LoopClosingConfig(min_kf_gap=8))
    rng = np.random.RandomState(21)
    for i in range(n_frames):
        obs = world.observe(
            Rcw[i], tcw[i], cam, bf=bf, n_kp=500, pixel_noise=0.25,
            bit_flips=4, clutter=40, rng=rng, max_depth=10.0,
        )
        frame = make_frame_from_features(
            obs["uv"], obs["level"], obs["angle"], obs["desc"],
            obs["valid"], ur=obs["ur"], depth=obs["depth"], timestamp=ts[i],
        )
        sys_.track_frame(frame)
    return sys_, ts, twc


class TestLoopClosing:
    def test_loop_detected_and_closed(self, loop_run):
        sys_, ts, twc = loop_run
        assert sys_.loop_closer.n_loops_closed >= 1

    def test_map_marked_big_change(self, loop_run):
        sys_, ts, twc = loop_run
        assert sys_.map.big_change_idx >= 1

    def test_keyframe_trajectory_consistent_after_loop(self, loop_run):
        """After correction the KEYFRAME trajectory aligns with ground truth
        (per-frame log still contains pre-correction poses)."""
        sys_, ts, twc = loop_run
        m = sys_.map
        kfs = m.keyframe_ids()
        t_kf = m.kf_timestamp[kfs]
        p_kf = np.stack([-(m.kf_Rcw[k].T @ m.kf_tcw[k]) for k in kfs])
        res = ate(t_kf, p_kf, ts, twc)
        # One loop edge + odometry chain fixes global consistency (loop
        # endpoints land within cm), but a mid-trajectory tracking outage
        # leaves residual local drift only denser loop edges / stronger
        # GBA coverage can remove (TODO.md).
        assert res["rmse"] < 0.5, res


class TestCulledKeyframePurge:
    def test_culled_kf_leaves_database(self, loop_run):
        """A culled keyframe must be purged from the BoW inverted file
        (KeyFrameDatabase::erase from KeyFrame::SetBadFlag): a dead KF
        left behind keeps scoring as a loop candidate, escapes the
        min_kf_gap/covisibility exclusions (it is absent from
        keyframe_ids()), and burns the consistency streak on
        lm_pairs=0 closure attempts — the r4 mono_loop failure."""
        sys_, *_ = loop_run
        lc = sys_.loop_closer
        m = sys_.map
        assert lc.db is not None
        kfs = m.keyframe_ids()
        victim = int(kfs[len(kfs) // 2])
        with m.lock:
            m.erase_keyframe(victim)
        lc.process_keyframe(int(kfs[-1]))
        assert not lc.db.present[victim]
        assert victim not in lc.kf_bow
