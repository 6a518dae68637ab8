"""Async mapping pipeline: tracking and local mapping/loop closing run
concurrently (the reference's Tracking/LocalMapping/LoopClosing thread
split, src/LocalMapping.cc:56 / src/LoopClosing.cc:93 / SURVEY §2.4
"host-side pipeline concurrency"), with map.lock guarding short host
mutations and BA device solves running unlocked.

The async run must match the synchronous run's tracking quality: same
scenario, ATE gate, zero losses, worker-applied corrections
(pending_correction) keeping the tracker map-consistent."""

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


def _run(async_mapping: bool, n_frames: int = 60, lockstep: bool = False):
    cam = cm.make_pinhole(400.0, 400.0, 320.0, 240.0, 640, 480)
    bf = 400.0 * 0.2
    world = SyntheticWorld(WorldConfig(n_landmarks=4000, seed=3,
                                       extent=(6.0, 4.5, 3.0)))
    ts = np.arange(n_frames) * 0.1
    Rwc, twc, _, _ = circle_trajectory(ts, radius=1.0, omega=0.25,
                                       look_outward=True)
    Rcw, tcw = trajectory_to_tcw(Rwc, twc)
    sys_ = System(cam, bf, SystemConfig(async_mapping=async_mapping))
    states = []
    rng = np.random.RandomState(11)
    for i in range(n_frames):
        obs = world.observe(
            Rcw[i], tcw[i], cam, bf=bf, n_kp=500, pixel_noise=0.25,
            bit_flips=4, clutter=50, rng=rng, max_depth=10.0)
        frame = make_frame_from_features(
            obs["uv"], obs["level"], obs["angle"], obs["desc"],
            obs["valid"], ur=obs["ur"], depth=obs["depth"],
            timestamp=ts[i])
        states.append(sys_.track_frame(frame))
        if lockstep and sys_._kf_queue is not None:
            sys_._kf_queue.join()
    sys_.wait_idle()
    traj = sys_.tracker.trajectory
    t_est = np.asarray([x[0] for x in traj])
    p_est = np.asarray([-(x[1].T @ x[2]) for x in traj])
    res = ate(t_est, p_est, ts, twc)
    sys_.shutdown()
    return sys_, states, res


@pytest.fixture(scope="module")
def runs():
    return _run(False), _run(True)


class TestAsyncPipeline:
    def test_async_tracks_cleanly(self, runs):
        _, (sys_a, states, res) = runs
        assert sum(s == TrackState.LOST for s in states) == 0
        assert states[0] == TrackState.OK

    def test_async_matches_sync_quality(self, runs):
        (_, _, res_sync), (_, _, res_async) = runs
        assert res_async["rmse"] < max(2.0 * res_sync["rmse"], 0.02), \
            (res_sync["rmse"], res_async["rmse"])

    def test_lockstep_async_equals_sync(self, runs):
        """Correction-path exactness (the r3 stereo_async regression's
        diagnosis, scripts/debug_async_gap.py): draining the worker
        after every frame removes concurrency lag while still exercising
        the full worker + push_correction/pending_correction machinery —
        the result must match the synchronous pipeline almost exactly.
        Any composition error in the correction rebase would surface
        here; the residual free-running async gap is therefore pipeline
        LAG (keyframes created before the previous keyframe's BA
        correction lands), the cost paid for the 5x p99 latency win
        (test_async_gba.test_async_tail_latency_beats_sync)."""
        (_, _, res_sync), _ = runs
        _, _, res_lock = _run(True, lockstep=True)
        assert res_lock["rmse"] < 1.1 * res_sync["rmse"] + 5e-4, \
            (res_sync["rmse"], res_lock["rmse"])

    def test_worker_processed_all_keyframes(self, runs):
        _, (sys_a, _, _) = runs
        # mapping actually ran: landmarks were created beyond the
        # bootstrap set and local BA bumped the map version
        assert sys_a.map.n_keyframes() >= 10
        assert sys_a.map.version > sys_a.map.n_keyframes()

    def test_worker_error_surfaces(self):
        cam = cm.make_pinhole(400.0, 400.0, 320.0, 240.0, 640, 480)
        sys_ = System(cam, 80.0, SystemConfig(async_mapping=True))

        def boom(k):
            raise RuntimeError("worker exploded")

        sys_.mapper.process_keyframe = boom
        sys_._kf_queue.put((0, None))     # hand the worker a keyframe
        with pytest.raises(RuntimeError, match="worker exploded"):
            sys_.wait_idle()
        sys_.shutdown()


class TestAsyncVio:
    """VIO frontend over an async-mapping System: the PRV window backend
    (tracking thread) and the mapper worker interleave through map.lock."""

    def test_vio_with_async_mapping(self):
        from vieo_slam_tpu.sim.world import make_imu_samples
        from vieo_slam_tpu.vio.frontend import VioConfig, VioFrontend

        cam = cm.make_pinhole(400.0, 400.0, 320.0, 240.0, 640, 480)
        bf = 400.0 * 0.2
        world = SyntheticWorld(WorldConfig(n_landmarks=4000, seed=3,
                                           extent=(6.0, 4.5, 3.0)))
        n_frames = 120
        ts = np.arange(n_frames) * 0.1
        Rwc, twc, v_w, a_w = circle_trajectory(ts, radius=1.0, omega=0.25,
                                               look_outward=True)
        Rcw, tcw = trajectory_to_tcw(Rwc, twc)
        t_imu, gyro, acc = make_imu_samples(
            ts, Rwc.astype(np.float64), v_w, a_w, rate_hz=200.0,
            bg=np.array([0.01, -0.02, 0.015], np.float32),
            ba=np.array([0.05, 0.03, -0.04], np.float32),
            noise_g=1e-4, noise_a=1e-3, seed=5)
        sys_ = System(cam, bf, SystemConfig(async_mapping=True))
        # init_final_span short enough that the PRV keyframe backend
        # engages mid-run: its window BA then executes on the mapping
        # worker as the dispatch post-hook.
        vio = VioFrontend(sys_, cfg=VioConfig(init_min_kfs=10,
                                              init_min_span=3.0,
                                              init_final_span=6.0))
        rng = np.random.RandomState(11)
        imu_i = 0
        states = []
        for i in range(n_frames):
            while imu_i < len(t_imu) and t_imu[imu_i] <= ts[i]:
                vio.track_odom(t_imu[imu_i], gyro[imu_i], acc[imu_i])
                imu_i += 1
            obs = world.observe(
                Rcw[i], tcw[i], cam, bf=bf, n_kp=500, pixel_noise=0.25,
                bit_flips=4, clutter=50, rng=rng, max_depth=10.0)
            frame = make_frame_from_features(
                obs["uv"], obs["level"], obs["angle"], obs["desc"],
                obs["valid"], ur=obs["ur"], depth=obs["depth"],
                timestamp=ts[i])
            states.append(vio.track_frame(frame))
        sys_.wait_idle()
        assert vio.inited
        assert vio.final_inited and vio.backend is not None
        assert sum(s.name == "LOST" for s in states) == 0
        traj = sys_.tracker.trajectory
        p_est = np.asarray([-(x[1].T @ x[2]) for x in traj])
        res = ate(np.asarray([x[0] for x in traj]), p_est, ts, twc)
        assert np.isfinite(res["rmse"]) and res["rmse"] < 0.10, res
        sys_.shutdown()
