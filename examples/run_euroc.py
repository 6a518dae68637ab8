"""Run stereo(-VIO) SLAM on a EuRoC sequence directory.

Usage:
  PYTHONPATH=. python examples/run_euroc.py <sequence_dir> <settings.yaml> \
      [--vio] [--out traj.txt]

Equivalent of Examples/Stereo/stereo_euroc.cc: loads images + IMU with the
ASL layout, feeds odometry ahead of each frame (the reference's odomRun
feeder thread), writes TUM trajectories before and after the final GBA
(the *_NO_FULLBA.txt A/B outputs).
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("sequence")
    ap.add_argument("settings")
    ap.add_argument("--vio", action="store_true")
    ap.add_argument("--out", default="traj.txt")
    ap.add_argument("--max-frames", type=int, default=0)
    args = ap.parse_args()

    from vieo_slam_tpu.frontend.frame import build_stereo_frame
    from vieo_slam_tpu.io.config import build_system, load_settings
    from vieo_slam_tpu.io.euroc import load_euroc, load_image_gray
    from vieo_slam_tpu.io.serialization import write_trajectory_tum
    from vieo_slam_tpu.ops import orb
    from vieo_slam_tpu.vio.frontend import VioConfig, VioFrontend

    import jax
    import jax.numpy as jnp

    settings = load_settings(args.settings)
    seq = load_euroc(args.sequence)
    sys_ = build_system(settings, sensor="stereo")
    cfg = orb.OrbConfig(
        n_features=settings.n_features, n_levels=settings.n_levels,
        scale_factor=settings.scale_factor,
        fast_threshold=settings.ini_th_fast,
        fast_min_threshold=settings.min_th_fast)

    front = sys_
    if args.vio:
        Rcb = tcb = None
        if settings.Tbc is not None:
            Tcb = np.linalg.inv(settings.Tbc)
            Rcb, tcb = Tcb[:3, :3], Tcb[:3, 3]
        front = VioFrontend(sys_, Rcb=Rcb, tcb=tcb, cfg=VioConfig(
            sigma_g=settings.imu_sigma_g, sigma_a=settings.imu_sigma_a))

    frame_fn = jax.jit(
        lambda l, r: build_stereo_frame(l, r, cfg, bf=settings.bf))

    n = len(seq.t_cam) if not args.max_frames else \
        min(args.max_frames, len(seq.t_cam))
    imu_i = 0
    t0 = time.time()
    for i in range(n):
        t = seq.t_cam[i]
        if args.vio:
            while imu_i < len(seq.t_imu) and seq.t_imu[imu_i] <= t:
                front.track_odom(seq.t_imu[imu_i], seq.gyro[imu_i],
                                 seq.acc[imu_i])
                imu_i += 1
        img_l = jnp.asarray(load_image_gray(seq.cam0_paths[i]))
        img_r = jnp.asarray(load_image_gray(seq.cam1_paths[i]))
        frame = frame_fn(img_l, img_r)._replace(
            timestamp=jnp.asarray(t))
        st = front.track_frame(frame)
        if i % 50 == 0:
            print(f"frame {i}/{n} state={st.name} "
                  f"kfs={sys_.map.n_keyframes()}", flush=True)
    print(f"done: {n} frames in {time.time() - t0:.1f}s")

    # with/without-full-BA A/B (stereo_euroc.cc:346-360): both recovered
    # via ref-KF relative composition so the final GBA improves the
    # second output retroactively.
    write_trajectory_tum(args.out.replace(".txt", "_NO_FULLBA.txt"),
                         sys_.trajectory())
    sys_.final_global_ba()
    write_trajectory_tum(args.out, sys_.trajectory())
    print(f"trajectories -> {args.out} (+ _NO_FULLBA A/B)")


if __name__ == "__main__":
    main()
