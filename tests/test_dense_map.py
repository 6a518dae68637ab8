"""Dense RGB-D map export (map/pcl/map_sl.cpp equivalent) and the
headless viewer (Viewer/MapDrawer/FrameDrawer)."""

import numpy as np

from vieo_slam_tpu.cameras import models as cm
from vieo_slam_tpu.io.dense_map import (DenseMapper, load_pcd, save_pcd,
                                        statistical_outlier_removal,
                                        voxel_downsample)
from vieo_slam_tpu.map.map_state import MapConfig, MapState


def _flat_map(n_kf=3):
    m = MapState(MapConfig(max_keyframes=8, max_landmarks=64, max_kp=8))
    for j in range(n_kf):
        n = 8
        m.add_keyframe(
            Rcw=np.eye(3, dtype=np.float32),
            tcw=np.asarray([0.1 * j, 0, 0], np.float32),
            timestamp=j * 0.5, frame_id=j,
            uv=np.zeros((n, 2), np.float32),
            level=np.zeros(n, np.int32), desc=np.zeros((n, 8), np.uint32),
            ur=np.full(n, -1.0, np.float32),
            depth=np.full(n, -1.0, np.float32),
            kp_valid=np.ones(n, bool),
            lm_idx=np.full(n, -1, np.int64))
    return m


def test_pcd_roundtrip(tmp_path):
    pts = np.random.RandomState(0).randn(100, 3).astype(np.float32)
    cols = np.random.RandomState(1).randint(
        0, 256, (100, 3)).astype(np.uint8)
    p = str(tmp_path / "c.pcd")
    save_pcd(p, pts, cols)
    pts2, cols2 = load_pcd(p)
    np.testing.assert_array_equal(pts, pts2)
    np.testing.assert_array_equal(cols, cols2)


def test_voxel_downsample_merges():
    pts = np.asarray([[0.0, 0, 0], [0.01, 0, 0],       # same 5cm voxel
                      [1.0, 1.0, 1.0]], np.float32)
    cols = np.asarray([[0, 0, 0], [200, 200, 200],
                       [50, 60, 70]], np.uint8)
    p2, c2 = voxel_downsample(pts, cols, leaf=0.05)
    assert len(p2) == 2
    i = int(np.argmin(p2[:, 0]))
    np.testing.assert_allclose(p2[i], [0.005, 0, 0], atol=1e-6)
    assert c2[i][0] == 100


def test_statistical_outlier_removal():
    rng = np.random.RandomState(0)
    cluster = rng.randn(500, 3).astype(np.float32) * 0.1
    outlier = np.asarray([[30.0, 30.0, 30.0]], np.float32)
    pts = np.concatenate([cluster, outlier])
    keep = statistical_outlier_removal(pts, k=20, std_mul=1.0)
    assert not keep[-1]
    assert keep[:-1].mean() > 0.6


def test_dense_export_geometry(tmp_path):
    """Back-projected flat-depth planes land at the right world z and the
    export pipeline runs end to end."""
    cam = cm.make_pinhole(100.0, 100.0, 32.0, 24.0, 64, 48)
    m = _flat_map(n_kf=3)
    dm = DenseMapper(max_depth=7.0, stride=2, leaf=0.05)
    rng = np.random.RandomState(2)
    for k in range(3):
        depth = np.full((48, 64), 2.0, np.float32)
        depth += rng.randn(48, 64).astype(np.float32) * 1e-3
        color = np.full((48, 64, 3), 128, np.uint8)
        dm.add_keyframe(k, color, depth)
    path = str(tmp_path / "dense.pcd")
    n = dm.save(m, cam, path)
    assert n > 100
    pts, cols = load_pcd(path)
    # all points near the z=2 plane (identity rotations, x-offset KFs)
    assert np.abs(pts[:, 2] - 2.0).max() < 0.05
    # deep pixels beyond max_depth are dropped
    dm2 = DenseMapper(max_depth=1.0)
    dm2.add_keyframe(0, np.zeros((48, 64, 3), np.uint8),
                     np.full((48, 64), 2.0, np.float32))
    p2, _ = dm2.build_cloud(m, cam)
    assert len(p2) == 0


def test_viewer_and_drawers(tmp_path):
    from vieo_slam_tpu.viz import FrameDrawer, MapDrawer

    m = _flat_map(n_kf=2)
    m.add_landmarks(np.random.RandomState(0).randn(20, 3).astype(
        np.float32), np.zeros((20, 8), np.uint32), first_kf=0)
    p = MapDrawer().draw(m, str(tmp_path / "map.png"),
                         current_pose=(np.eye(3, dtype=np.float32),
                                       np.zeros(3, np.float32)),
                         title="t")
    assert np.fromfile(p, np.uint8).size > 1000
    img = np.random.RandomState(1).randint(
        0, 255, (48, 64)).astype(np.uint8)
    uv = np.random.RandomState(2).rand(30, 2) * [64, 48]
    mask = np.zeros(30, bool)
    mask[:10] = True
    p2 = FrameDrawer().draw(str(tmp_path / "frame.png"), img, uv, mask,
                            state="OK", n_tracked=10)
    assert np.fromfile(p2, np.uint8).size > 1000
