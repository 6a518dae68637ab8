"""IO tests: map save/load round trip, trajectory formats, EuRoC CSV
parsing, reference-format YAML settings."""

import os

import numpy as np

from vieo_slam_tpu.io.euroc import EurocSequence, imu_window, load_euroc
from vieo_slam_tpu.io.config import SlamSettings, build_system, load_settings
from vieo_slam_tpu.io.serialization import (
    load_map, save_map, write_trajectory_kitti, write_trajectory_tum,
)
from vieo_slam_tpu.map.map_state import MapConfig, MapState


def small_map():
    m = MapState(MapConfig(max_keyframes=8, max_landmarks=64, max_kp=16))
    rng = np.random.RandomState(0)
    for k in range(3):
        m.add_keyframe(
            Rcw=np.eye(3, dtype=np.float32),
            tcw=rng.randn(3).astype(np.float32),
            timestamp=0.1 * k, frame_id=k,
            uv=rng.rand(16, 2).astype(np.float32) * 100,
            level=np.zeros(16, np.int32),
            desc=rng.randint(0, 2 ** 32, (16, 8), np.uint64).astype(
                np.uint32),
            ur=np.full(16, -1.0, np.float32),
            depth=np.full(16, 2.0, np.float32),
            kp_valid=np.ones(16, bool),
            lm_idx=np.full(16, -1, np.int32),
        )
    m.add_landmarks(rng.randn(10, 3).astype(np.float32),
                    rng.randint(0, 2 ** 32, (10, 8), np.uint64).astype(
                        np.uint32), first_kf=0)
    return m


class TestMapSerialization:
    def test_roundtrip(self, tmp_path):
        m = small_map()
        p = str(tmp_path / "map.npz")
        save_map(m, p)
        m2 = load_map(p)
        assert m2.n_keyframes() == m.n_keyframes()
        assert m2.n_landmarks() == m.n_landmarks()
        np.testing.assert_array_equal(m2.kf_tcw, m.kf_tcw)
        np.testing.assert_array_equal(m2.lm_desc, m.lm_desc)
        np.testing.assert_array_equal(m2.kf_lm_idx, m.kf_lm_idx)
        assert m2.cfg.max_kp == 16
        assert m2._next_kf == m._next_kf


class TestTrajectoryFormats:
    def _traj(self):
        rng = np.random.RandomState(1)
        out = []
        for i in range(5):
            out.append((0.1 * i, np.eye(3, dtype=np.float32),
                        rng.randn(3).astype(np.float32), "OK"))
        return out

    def test_tum(self, tmp_path):
        p = str(tmp_path / "t.txt")
        write_trajectory_tum(p, self._traj())
        lines = open(p).read().strip().split("\n")
        assert len(lines) == 5 and len(lines[0].split()) == 8

    def test_kitti(self, tmp_path):
        p = str(tmp_path / "k.txt")
        write_trajectory_kitti(p, self._traj())
        lines = open(p).read().strip().split("\n")
        assert len(lines) == 5 and len(lines[0].split()) == 12


class TestEuroc:
    def _mk_sequence(self, root):
        mav = root / "mav0"
        for c in ["cam0", "cam1"]:
            (mav / c / "data").mkdir(parents=True)
            with open(mav / c / "data.csv", "w") as f:
                f.write("#timestamp [ns],filename\n")
                for i in range(4):
                    f.write(f"{int(1e9 * (100 + 0.05 * i))},{i}.png\n")
        (mav / "imu0").mkdir(parents=True)
        with open(mav / "imu0" / "data.csv", "w") as f:
            f.write("#timestamp,wx,wy,wz,ax,ay,az\n")
            for i in range(40):
                t = int(1e9 * (100 + 0.005 * i))
                f.write(f"{t},0.1,0.2,0.3,0.0,0.0,9.81\n")
        return root

    def test_load_and_window(self, tmp_path):
        self._mk_sequence(tmp_path)
        seq = load_euroc(str(tmp_path))
        assert len(seq.cam0_paths) == 4
        assert abs(seq.t_cam[1] - seq.t_cam[0] - 0.05) < 1e-9
        g, a, dts, mask = imu_window(seq, seq.t_cam[0], seq.t_cam[1], 32)
        # ~10 samples at 200 Hz within 50 ms
        assert 8 <= mask.sum() <= 12
        assert abs(dts[mask].sum() - 0.05) < 1e-6


class TestSettings:
    def test_reference_yaml(self, tmp_path):
        """Parse an OpenCV-format YAML with the reference's keys."""
        y = tmp_path / "s.yaml"
        y.write_text(
            "%YAML:1.0\n"
            "Camera.fx: 435.2\nCamera.fy: 435.2\n"
            "Camera.cx: 367.4\nCamera.cy: 252.2\n"
            "Camera.k1: -0.28\nCamera.k2: 0.07\n"
            "Camera.p1: 0.0002\nCamera.p2: 0.00002\n"
            "Camera.width: 752\nCamera.height: 480\n"
            "Camera.bf: 47.9\nCamera.fps: 20.0\n"
            "ORBextractor.nFeatures: 375\n"
            "ORBextractor.scaleFactor: 1.2\n"
            "ORBextractor.nLevels: 8\n"
            "ORBextractor.iniThFAST: 20\n"
            "ORBextractor.minThFAST: 7\n"
            "LocalMapping.LocalWindowSize: 10\n"
            "GBA.NoLoopClosing: 1\n"
            "IMU.sigma_g: 0.00017\nIMU.sigma_a: 0.002\n"
        )
        s = load_settings(str(y))
        assert s.fx == 435.2
        assert s.model == "radtan"
        assert s.n_features == 375
        assert s.local_window_size == 10
        assert s.gba_no_loop_closing
        assert abs(s.imu_sigma_g - 0.00017) < 1e-12

    def test_build_system(self, tmp_path):
        s = SlamSettings(n_features=128)
        sys_ = build_system(s, "stereo")
        assert sys_.map.cfg.max_kp == 128
        assert sys_.loop_closer is not None
        s2 = SlamSettings(gba_no_loop_closing=True)
        sys2 = build_system(s2, "stereo")
        assert sys2.loop_closer is None
