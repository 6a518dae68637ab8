"""Viewer smoke test: headless Map/FrameDrawer PNG snapshots render
without error (the reference's Pangolin viewer + FrameDrawer overlay,
src/Viewer.cc / FrameDrawer.cc, redesigned as matplotlib offscreen)."""

import os

import numpy as np
import pytest

mpl = pytest.importorskip("matplotlib")

from vieo_slam_tpu.map.map_state import MapConfig, MapState
from vieo_slam_tpu.viz.viewer import FrameDrawer, MapDrawer, Viewer


def _tiny_map():
    m = MapState(MapConfig(max_keyframes=8, max_landmarks=64, max_kp=16))
    N = 16
    for i in range(3):
        m.add_keyframe(
            Rcw=np.eye(3, dtype=np.float32),
            tcw=np.asarray([0.1 * i, 0, 0], np.float32),
            timestamp=0.1 * i, frame_id=i,
            uv=np.random.RandomState(i).rand(N, 2).astype(np.float32) * 64,
            level=np.zeros(N, np.int32), desc=np.zeros((N, 8), np.uint32),
            ur=np.full(N, -1.0, np.float32),
            depth=np.full(N, -1.0, np.float32),
            kp_valid=np.ones(N, bool), lm_idx=np.full(N, -1, np.int32))
    m.add_landmarks(np.random.RandomState(0).rand(20, 3).astype(np.float32),
                    np.zeros((20, 8), np.uint32), first_kf=0)
    return m


def test_map_drawer_writes_png(tmp_path):
    m = _tiny_map()
    out = str(tmp_path / "map.png")
    MapDrawer().draw(m, out,
                     trajectory=[(0.0, np.eye(3, dtype=np.float32),
                                  np.zeros(3, np.float32), "OK")])
    assert os.path.getsize(out) > 1000


def test_frame_drawer_writes_png(tmp_path):
    out = str(tmp_path / "frame.png")
    img = np.random.RandomState(1).rand(48, 64).astype(np.float32) * 255
    uv = np.random.RandomState(2).rand(30, 2).astype(np.float32) * [64, 48]
    FrameDrawer().draw(out, img, uv,
                       tracked_mask=np.arange(30) % 2 == 0)
    assert os.path.getsize(out) > 1000


def test_viewer_poll(tmp_path):
    class SysStub:
        map = _tiny_map()

        class tracker:
            trajectory = [(0.0, np.eye(3, dtype=np.float32),
                           np.zeros(3, np.float32), "OK")]
            Rcw = np.eye(3, dtype=np.float32)
            tcw = np.zeros(3, np.float32)

    v = Viewer(str(tmp_path), every_n_kf=1)
    p = v.poll(SysStub())
    assert p is None or os.path.exists(p)
