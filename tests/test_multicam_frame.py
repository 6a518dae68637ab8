"""Distorted / multi-camera frontend (VERDICT missing #2).

Covers Frame::ComputeStereoFishEyeMatches (src/Frame.cc:613: descriptor
match + TriangulateMatches through rig extrinsics) and UndistortKeyPoints
(:418) via build_multicam_frame on rendered KB8 images, plus the TUM-VI
config surface (Camera.type KannalaBrandt8, Camera2.* + Trc, IMU.sigma).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vieo_slam_tpu.cameras import models as cm
from vieo_slam_tpu.frontend.frame import (build_multicam_frame,
                                          build_undistorted_mono_frame)
from vieo_slam_tpu.ops import orb
from vieo_slam_tpu.sim.world import (
    SyntheticWorld, WorldConfig, circle_trajectory, trajectory_to_tcw,
)

KB8_DIST = [0.02, 0.002, -0.001, 0.0005]
BASE = 0.11


@pytest.fixture(scope="module")
def rig():
    cam0 = cm.make_kb8(300.0, 300.0, 320.0, 240.0, KB8_DIST, 640, 480)
    cam1 = cm.make_kb8(300.0, 300.0, 320.0, 240.0, KB8_DIST, 640, 480,
                       Rcr=np.eye(3, dtype=np.float32),
                       tcr=np.asarray([-BASE, 0, 0], np.float32))
    geom = cm.make_pinhole(300.0, 300.0, 320.0, 240.0, 640, 480)
    return cam0, cam1, geom


def test_multicam_kb8_depth(rig):
    cam0, cam1, geom = rig
    world = SyntheticWorld(WorldConfig(n_landmarks=1200, seed=5,
                                       extent=(6.0, 4.5, 3.0)))
    ts = np.arange(1) * 0.1
    Rwc, twc, _, _ = circle_trajectory(ts, radius=1.0, omega=0.25,
                                       look_outward=True)
    Rcw, tcw = trajectory_to_tcw(Rwc, twc)
    img0 = world.render_view(cam0, Rcw[0], tcw[0])
    # cam1 pose: x_c1 = Rcr x_rig + tcr with rig = cam0 frame
    R1 = cam1.Rcr @ Rcw[0]
    t1 = cam1.Rcr @ tcw[0] + cam1.tcr
    img1 = world.render_view(cam1, R1, t1)

    cfg = orb.OrbConfig(n_features=500, n_levels=4)
    frame = jax.jit(lambda a, b: build_multicam_frame(
        [a, b], [cam0, cam1], cfg, geom_cam=geom,
        virt_bf=300.0 * BASE, max_depth=15.0))(
        jnp.asarray(img0), jnp.asarray(img1))

    uv = np.asarray(frame.uv)
    depth = np.asarray(frame.depth)
    valid = np.asarray(frame.valid)
    has_d = valid & (depth > 0)
    assert has_d.sum() > 100, int(has_d.sum())

    # ground truth: project world landmarks through the undistorted
    # geometry camera.  Keypoints fire anywhere inside a landmark's
    # rendered 12px texture patch, so 'near' means within the patch
    # radius, not at its centre.
    pc = world.pw @ Rcw[0].T + tcw[0]
    uv_true = np.asarray(cm.project(geom, jnp.asarray(pc, jnp.float32)))
    vis = pc[:, 2] > 0.2
    d2 = np.sum((uv[has_d][:, None, :] - uv_true[None, :, :]) ** 2, -1)
    d2[:, ~vis] = 1e9
    nn = np.argmin(d2, axis=1)
    near = np.sqrt(d2[np.arange(len(nn)), nn]) < 12.0
    assert near.mean() > 0.6, near.mean()
    z_err = np.abs(depth[has_d][near] - pc[nn[near], 2]) / pc[nn[near], 2]
    assert np.median(z_err) < 0.08, np.median(z_err)


def test_undistorted_mono_frame(rig):
    cam0, _, geom = rig
    world = SyntheticWorld(WorldConfig(n_landmarks=1200, seed=5,
                                       extent=(6.0, 4.5, 3.0)))
    ts = np.arange(1) * 0.1
    Rwc, twc, _, _ = circle_trajectory(ts, radius=1.0, omega=0.25,
                                       look_outward=True)
    Rcw, tcw = trajectory_to_tcw(Rwc, twc)
    img0 = world.render_view(cam0, Rcw[0], tcw[0])
    cfg = orb.OrbConfig(n_features=400, n_levels=4)
    frame = jax.jit(lambda a: build_undistorted_mono_frame(
        a, cam0, cfg, geom_cam=geom))(jnp.asarray(img0))
    uv = np.asarray(frame.uv)
    valid = np.asarray(frame.valid)
    assert valid.sum() > 150
    # keypoints must land near true undistorted projections
    pc = world.pw @ Rcw[0].T + tcw[0]
    uv_true = np.asarray(cm.project(geom, jnp.asarray(pc, jnp.float32)))
    vis = pc[:, 2] > 0.2
    d2 = np.sum((uv[valid][:, None, :] - uv_true[None, :, :]) ** 2, -1)
    d2[:, ~vis] = 1e9
    near = np.sqrt(d2.min(axis=1)) < 12.0
    assert near.mean() > 0.6, near.mean()


TUMVI_YAML = """%YAML:1.0
Camera.type: "KannalaBrandt8"
Camera.fx: 190.978
Camera.fy: 190.973
Camera.cx: 254.931
Camera.cy: 256.897
Camera.k1: 0.00348
Camera.k2: 0.00071
Camera.k3: -0.00205
Camera.k4: 0.00020
Camera.width: 512
Camera.height: 512
Camera.bf: 19.3
Camera.fps: 20.0
Camera2.fx: 190.442
Camera2.fy: 190.434
Camera2.cx: 252.599
Camera2.cy: 254.917
Camera2.k1: 0.00340
Camera2.k2: 0.00176
Camera2.k3: -0.00266
Camera2.k4: 0.00032
Camera2.Trc: !!opencv-matrix
  rows: 3
  cols: 4
  dt: f
  data: [0.9999994, 0.0007916, 0.0006940, 0.1010634,
         -0.0007877, 0.9999841, -0.0055828, -0.0019849,
         -0.0006984, 0.0055822, 0.9999841, -0.0004790]
IMU.sigma:
  [1.6e-4, 2.8e-3, 2.2e-5, 8.6e-4]
IMU.freq_hz: 200.0
IMU.FinalTime: 15
LocalMapping.LocalWindowSize: 10
ORBextractor.nFeatures: 350
ORBextractor.scaleFactor: 1.2
ORBextractor.nLevels: 8
ORBextractor.iniThFAST: 20
ORBextractor.minThFAST: 7
GBA.NoLoopClosing: 1
"""


def test_tumvi_config_parse_and_build(tmp_path):
    path = os.path.join(tmp_path, "tumvi.yaml")
    with open(path, "w") as f:
        f.write(TUMVI_YAML)
    from vieo_slam_tpu.io.config import build_system, load_settings

    s = load_settings(path)
    assert s.model == "kb8"
    assert s.dist == (0.00348, 0.00071, -0.00205, 0.00020)
    assert s.cam2 is not None
    assert abs(s.cam2["Trc"][0, 3] - 0.1010634) < 1e-6
    assert s.imu_sigma_g == pytest.approx(1.6e-4)
    assert s.imu_sigma_ba == pytest.approx(8.6e-4)
    assert s.imu_init_final_time == 15.0
    assert s.n_features == 350

    sys_ = build_system(s, sensor="stereo")
    assert sys_.loop_closer is None          # GBA.NoLoopClosing: 1
    assert callable(sys_.frame_builder)
    # drive the builder once on small random images (shape-level check)
    rng = np.random.RandomState(0)
    img = rng.rand(512, 512).astype(np.float32) * 255
    frame = sys_.frame_builder(img, img, 0.0)
    assert frame.uv.shape[0] == 350
