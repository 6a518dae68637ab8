"""Observability subsystem: stage timers, counters, leveled logging
(common/mlog/log.h:109-155 mlog::Timer + PRINT_* macro equivalents)."""

import io
import time

from vieo_slam_tpu.utils.metrics import (LOG_DEBUG, LOG_ERROR, Registry,
                                         metrics)


def test_timer_accumulates():
    r = Registry()
    for _ in range(3):
        with r.timer("stage_a"):
            time.sleep(0.01)
    s = r.stages["stage_a"]
    assert s.count == 3
    assert 0.008 < s.mean < 0.2
    assert s.max >= s.mean >= 0
    rep = r.report()
    assert rep["stages_ms"]["stage_a"]["count"] == 3
    assert rep["stages_ms"]["stage_a"]["mean"] > 5


def test_counters_and_gauges():
    r = Registry()
    r.count("kf")
    r.count("kf", 4)
    r.set_gauge("landmarks", 123)
    assert r.report()["counters"] == {"kf": 5, "landmarks": 123}
    r.reset()
    assert r.report()["counters"] == {}


def test_log_levels_filter():
    sink = io.StringIO()
    r = Registry(level=LOG_ERROR, sink=sink)
    r.error("boom")
    r.debug("hidden")
    out = sink.getvalue()
    assert "boom" in out and "hidden" not in out
    sink2 = io.StringIO()
    r2 = Registry(level=LOG_DEBUG, sink=sink2)
    r2.debug("visible")
    assert "visible" in sink2.getvalue()


def test_file_sink(tmp_path):
    p = str(tmp_path / "track.log")
    r = Registry(level=LOG_ERROR)
    r.info("to file only", file=p)
    r.close()
    assert "to file only" in open(p).read()


def test_format_report_table():
    r = Registry()
    with r.timer("x"):
        pass
    r.count("events")
    txt = r.format_report()
    assert "x" in txt and "events" in txt and "mean ms" in txt


def test_system_wires_metrics():
    """System.track_frame populates the global registry."""
    import numpy as np

    from vieo_slam_tpu.cameras import models as cm
    from vieo_slam_tpu.frontend.frame import make_frame_from_features
    from vieo_slam_tpu.sim.world import (SyntheticWorld, WorldConfig,
                                         circle_trajectory,
                                         trajectory_to_tcw)
    from vieo_slam_tpu.system import System, SystemConfig

    metrics.reset()
    cam = cm.make_pinhole(400.0, 400.0, 320.0, 240.0, 640, 480)
    bf = 400.0 * 0.2
    world = SyntheticWorld(WorldConfig(n_landmarks=4000, seed=5,
                                       extent=(6.0, 4.5, 3.0)))
    ts = np.arange(6) * 0.1
    Rwc, twc, _, _ = circle_trajectory(ts, radius=1.0, omega=0.25,
                                       look_outward=True)
    Rcw, tcw = trajectory_to_tcw(Rwc, twc)
    rng = np.random.RandomState(2)
    sys_ = System(cam, bf, SystemConfig())
    for i in range(6):
        obs = world.observe(Rcw[i], tcw[i], cam, bf=bf, n_kp=500,
                            pixel_noise=0.25, bit_flips=2, clutter=20,
                            rng=rng, max_depth=10.0)
        sys_.track_frame(make_frame_from_features(
            obs["uv"], obs["level"], obs["angle"], obs["desc"],
            obs["valid"], ur=obs["ur"], depth=obs["depth"],
            timestamp=ts[i]))
    rep = sys_.metrics_report()
    assert rep["stages_ms"]["frame"]["count"] == 6
    assert rep["stages_ms"]["track"]["count"] == 6
    assert rep["counters"]["keyframes"] >= 1
    assert rep["counters"]["map_keyframes"] >= 1
    assert "lm.create_points" in rep["stages_ms"]
