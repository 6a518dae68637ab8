"""Run configuration: the reference's OpenCV-YAML settings surface.

Equivalent of the per-run `cv::FileStorage` YAML the reference parses all
over (Tracking.cc:698-880 ParseCamParamFile + IMU/Encoder noise,
LoopClosing.cc:44-84, IMUInitialization.cpp:47-75; full example
Examples/Stereo/EuRoC/EuRoC_VIO_dist_fast.yaml): camera intrinsics/
distortion/extrinsics (multi-cam `Camera2.*` + `.Trc`), `Camera.Tbc`,
IMU/Encoder noise, ORB extractor parameters, local-window/GBA knobs.

Reads the reference's own yaml files verbatim via cv2.FileStorage (they
carry the `%YAML:1.0` header and opencv-matrix nodes PyYAML rejects) and
builds the framework objects from them.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class SlamSettings:
    # camera
    fx: float = 458.654
    fy: float = 457.296
    cx: float = 367.215
    cy: float = 248.375
    width: int = 752
    height: int = 480
    dist: tuple = (0.0, 0.0, 0.0, 0.0)
    model: str = "pinhole"          # pinhole | radtan | kb8
    bf: float = 47.9
    fps: float = 20.0
    th_depth_factor: float = 35.0   # ThDepth in baselines
    # second camera (stereo rig; identity Trc means rectified)
    cam2: dict | None = None
    # body-from-camera extrinsic
    Tbc: np.ndarray | None = None
    # IMU
    imu_sigma_g: float = 1.7e-4
    imu_sigma_a: float = 2e-3
    imu_sigma_bg: float = 1.9e-5
    imu_sigma_ba: float = 3e-3
    imu_freq_hz: float = 200.0
    # Encoder
    enc_scale: float = 1.0
    enc_rc: float = 0.28
    enc_sigma: float = 0.01
    Tbe: np.ndarray | None = None
    # ORB
    n_features: int = 1200
    scale_factor: float = 1.2
    n_levels: int = 8
    ini_th_fast: float = 20.0
    min_th_fast: float = 7.0
    # backend
    local_window_size: int = 8
    gba_no_loop_closing: bool = False
    gba_final_iterations: int = 15
    imu_init_final_time: float = 15.0   # IMU.FinalTime (VI-init span)


def _fs_read(fs, key, default=None):
    import cv2

    node = fs.getNode(key)
    if node.empty():
        return default
    if node.isInt() or node.isReal():
        return node.real()
    if node.isString():
        return node.string()
    if node.isSeq():
        # plain YAML list (e.g. IMU.sigma) — node.mat() asserts on
        # non-map nodes in OpenCV 5
        return np.asarray([node.at(i).real()
                           for i in range(node.size())])
    m = node.mat()
    return m if m is not None else default


def load_settings(path: str) -> SlamSettings:
    """Parse a reference-format OpenCV YAML settings file."""
    import cv2

    fs = cv2.FileStorage(path, cv2.FILE_STORAGE_READ)
    if not fs.isOpened():
        raise FileNotFoundError(path)
    s = SlamSettings()
    g = lambda k, d=None: _fs_read(fs, k, d)

    s.fx = float(g("Camera.fx", s.fx))
    s.fy = float(g("Camera.fy", s.fy))
    s.cx = float(g("Camera.cx", s.cx))
    s.cy = float(g("Camera.cy", s.cy))
    s.width = int(g("Camera.width", s.width))
    s.height = int(g("Camera.height", s.height))
    s.bf = float(g("Camera.bf", s.bf))
    s.fps = float(g("Camera.fps", s.fps))
    s.th_depth_factor = float(g("ThDepth", s.th_depth_factor))

    cam_type = g("Camera.type")
    is_kb8 = isinstance(cam_type, str) and "KannalaBrandt" in cam_type
    k1 = g("Camera.k1")
    if k1 is not None:
        if is_kb8:
            # KB8 stores k1..k4 (TUM_VI_512_VIO_dist_fast.yaml:69-73)
            s.dist = (float(k1), float(g("Camera.k2", 0.0)),
                      float(g("Camera.k3", 0.0)), float(g("Camera.k4", 0.0)))
        else:
            s.dist = (float(k1), float(g("Camera.k2", 0.0)),
                      float(g("Camera.p1", 0.0)), float(g("Camera.p2", 0.0)))
            if any(abs(d) > 1e-12 for d in s.dist):
                s.model = "radtan"
    if is_kb8:
        s.model = "kb8"

    Tbc = g("Camera.Tbc")
    if Tbc is not None:
        s.Tbc = np.asarray(Tbc, np.float32).reshape(4, 4)

    fx2 = g("Camera2.fx")
    if fx2 is not None:
        if is_kb8:
            dist2 = (float(g("Camera2.k1", 0.0)), float(g("Camera2.k2", 0.0)),
                     float(g("Camera2.k3", 0.0)), float(g("Camera2.k4", 0.0)))
        else:
            dist2 = (float(g("Camera2.k1", 0.0)), float(g("Camera2.k2", 0.0)),
                     float(g("Camera2.p1", 0.0)), float(g("Camera2.p2", 0.0)))
        Trc_raw = g("Camera2.Trc")
        Trc = np.eye(4, dtype=np.float32)
        if Trc_raw is not None:
            Trc_raw = np.asarray(Trc_raw, np.float32)
            # stored as 3x4 opencv-matrix in the reference configs
            Trc[:Trc_raw.reshape(-1, 4).shape[0]] = Trc_raw.reshape(-1, 4)
        s.cam2 = dict(
            fx=float(fx2), fy=float(g("Camera2.fy", fx2)),
            cx=float(g("Camera2.cx", 0.0)), cy=float(g("Camera2.cy", 0.0)),
            dist=dist2, Trc=Trc,
        )

    sig = g("IMU.sigma")
    if sig is None:
        sig = g("IMU.SigmaI")
    if sig is not None:
        sig = np.asarray(sig).reshape(-1)
        # [sigma_g, sigma_a, sigma_bg, sigma_ba]
        # (TUM_VI_512_VIO_dist_fast.yaml:10-11)
        if sig.size >= 2:
            s.imu_sigma_g, s.imu_sigma_a = float(sig[0]), float(sig[1])
        if sig.size >= 4:
            s.imu_sigma_bg, s.imu_sigma_ba = float(sig[2]), float(sig[3])
    for key, attr in [("IMU.sigma_g", "imu_sigma_g"),
                      ("IMU.sigma_a", "imu_sigma_a"),
                      ("IMU.sigma_bg", "imu_sigma_bg"),
                      ("IMU.sigma_ba", "imu_sigma_ba"),
                      ("IMU.freq_hz", "imu_freq_hz"),
                      ("Encoder.scale", "enc_scale"),
                      ("Encoder.rc", "enc_rc")]:
        v = g(key)
        if v is not None:
            setattr(s, attr, float(v))
    Tbe = g("Camera.Tce")
    if Tbe is not None:
        s.Tbe = np.asarray(Tbe, np.float32).reshape(4, 4)

    s.n_features = int(g("ORBextractor.nFeatures", s.n_features))
    s.scale_factor = float(g("ORBextractor.scaleFactor", s.scale_factor))
    s.n_levels = int(g("ORBextractor.nLevels", s.n_levels))
    s.ini_th_fast = float(g("ORBextractor.iniThFAST", s.ini_th_fast))
    s.min_th_fast = float(g("ORBextractor.minThFAST", s.min_th_fast))

    lws = g("LocalMapping.LocalWindowSize")
    if lws is not None:
        s.local_window_size = int(lws)
    nlc = g("GBA.NoLoopClosing")
    if nlc is not None:
        s.gba_no_loop_closing = bool(int(nlc))
    fit = g("GBA.finalIterations")
    if fit is not None:
        s.gba_final_iterations = int(fit)
    ft = g("IMU.FinalTime")
    if ft is not None:
        s.imu_init_final_time = float(ft)
    fs.release()
    return s


def build_system(settings: SlamSettings, sensor: str = "stereo"):
    """Construct a System (+ optional LoopCloser) from settings —
    the System::System constructor role."""
    from ..backend.local_mapping import LocalMappingConfig
    from ..backend.loop_closing import LoopCloser, LoopClosingConfig
    from ..cameras import models as cm
    from ..frontend.tracking import TrackerConfig
    from ..map.map_state import MapConfig
    from ..system import SensorMode, System, SystemConfig

    s = settings
    # All map/tracking geometry runs in an undistorted virtual pinhole
    # frame (Frame::UndistortKeyPoints semantics, src/Frame.cc:418);
    # distorted physical cameras live in the frame builder below.
    cam = cm.make_pinhole(s.fx, s.fy, s.cx, s.cy, s.width, s.height)

    cfg = SystemConfig(
        sensor={"mono": SensorMode.MONOCULAR, "stereo": SensorMode.STEREO,
                "rgbd": SensorMode.RGBD}[sensor],
        map=MapConfig(max_kp=s.n_features, n_levels=s.n_levels,
                      scale_factor=s.scale_factor),
        tracker=TrackerConfig(
            th_depth=s.bf / s.fx * s.th_depth_factor),
        mapper=LocalMappingConfig(
            window_size=max(s.local_window_size, 4),
            close_depth=s.bf / s.fx * s.th_depth_factor),
    )
    sys_ = System(cam, s.bf, cfg)
    if not s.gba_no_loop_closing:
        sys_.loop_closer = LoopCloser(cam, s.bf, sys_.map,
                                      LoopClosingConfig())
    sys_.frame_builder = make_frame_builder(s, geom_cam=cam)
    return sys_


def make_frame_builder(s: SlamSettings, geom_cam=None):
    """Image->Frame closure for this configuration.

    Rectified pinhole -> build_stereo_frame row search; distorted
    (radtan EuRoC-dist / KB8 TUM-VI, with Camera2.Trc extrinsics) ->
    build_multicam_frame (descriptor match + DLT triangulation through
    the rig, Frame.cc:613).  The returned callable is jitted per shape:
    builder(img_left, img_right, timestamp) -> Frame.
    """
    import jax
    import jax.numpy as jnp

    from ..cameras import models as cm
    from ..frontend import frame as fr
    from ..ops import orb

    if geom_cam is None:
        geom_cam = cm.make_pinhole(s.fx, s.fy, s.cx, s.cy,
                                   s.width, s.height)
    ocfg = orb.OrbConfig(n_features=s.n_features,
                         scale_factor=s.scale_factor, n_levels=s.n_levels,
                         fast_threshold=s.ini_th_fast,
                         fast_min_threshold=s.min_th_fast)
    make = {"radtan": cm.make_radtan, "kb8": cm.make_kb8}

    if s.model == "pinhole":
        build = jax.jit(lambda l, r, t: fr.build_stereo_frame(
            l, r, ocfg, bf=s.bf, timestamp=t))
        return lambda l, r, t: build(jnp.asarray(l), jnp.asarray(r),
                                     jnp.asarray(t, jnp.float64))

    cam0 = make[s.model](s.fx, s.fy, s.cx, s.cy, list(s.dist),
                         s.width, s.height)
    cams = [cam0]
    if s.cam2 is not None:
        c2 = s.cam2
        Trc = np.asarray(c2["Trc"], np.float32)
        cams.append(make[s.model](
            c2["fx"], c2["fy"], c2["cx"], c2["cy"], list(c2["dist"]),
            s.width, s.height, Rcr=Trc[:3, :3], tcr=Trc[:3, 3]))
        build = jax.jit(lambda l, r, t: fr.build_multicam_frame(
            [l, r], cams, ocfg, geom_cam=geom_cam, virt_bf=s.bf,
            timestamp=t))
        return lambda l, r, t: build(jnp.asarray(l), jnp.asarray(r),
                                     jnp.asarray(t, jnp.float64))
    # distorted mono
    build = jax.jit(lambda im, t: fr.build_undistorted_mono_frame(
        im, cam0, ocfg, geom_cam=geom_cam, timestamp=t))
    return lambda im, t: build(jnp.asarray(im),
                               jnp.asarray(t, jnp.float64))
