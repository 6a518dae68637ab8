"""Sequence-scale demonstration (VERDICT missing #5 done-criterion):
a multi-revolution synthetic run far beyond the old 512-KF/20k-landmark
capacity ceilings, showing (a) no capacity errors — the map grows and
culls; (b) roughly flat host time per frame as the map saturates.

Round-4 re-validation (VERDICT r3 weak #8): runs on CURRENT defaults
(plm track schedule, scale-aware KF culling + max-gap guard, FAST kernel
auto) with --async-mapping for the concurrent pipeline and --mode vio
for a sustained VIO (IMU-fused) longrun.

Run: PYTHONPATH=. python scripts/long_run.py [--frames 1500]
     [--async-mapping] [--mode vision|vio] [--out LONGRUN_r04.json]
Prints per-block timing + map size and a final JSON line.
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=1500)
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--async-mapping", action="store_true")
    ap.add_argument("--mode", default="vision", choices=["vision", "vio"])
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")

    from vieo_slam_tpu.backend.loop_closing import (
        LoopCloser, LoopClosingConfig)
    from vieo_slam_tpu.cameras import models as cm
    from vieo_slam_tpu.frontend.frame import make_frame_from_features
    from vieo_slam_tpu.io.evaluate import ate
    from vieo_slam_tpu.sim.world import (
        SyntheticWorld, WorldConfig, circle_trajectory, make_imu_samples,
        trajectory_to_tcw)
    from vieo_slam_tpu.system import System, SystemConfig
    from vieo_slam_tpu.vio.frontend import VioConfig, VioFrontend

    cam = cm.make_pinhole(400.0, 400.0, 320.0, 240.0, 640, 480)
    bf = 400.0 * 0.2
    world = SyntheticWorld(WorldConfig(n_landmarks=8000, seed=4,
                                       extent=(6.0, 4.5, 3.0)))
    n = args.frames
    ts = np.arange(n) * 0.1
    # ~8 revolutions: constant revisit pressure on the loop closer and
    # sustained landmark/KF churn for the lifecycle machinery.
    Rwc, twc, v_w, a_w = circle_trajectory(ts, radius=1.0, omega=0.35,
                                           look_outward=True)
    Rcw, tcw = trajectory_to_tcw(Rwc, twc)
    sys_ = System(cam, bf, SystemConfig(
        async_mapping=args.async_mapping))
    sys_.loop_closer = LoopCloser(cam, bf, sys_.map,
                                  LoopClosingConfig(min_kf_gap=8))
    vio = None
    imu = None
    imu_i = 0
    if args.mode == "vio":
        t_imu, gyro, acc = make_imu_samples(
            ts, Rwc.astype(np.float64), v_w, a_w, rate_hz=200.0,
            bg=np.array([0.01, -0.02, 0.015], np.float32),
            ba=np.array([0.05, 0.03, -0.04], np.float32),
            noise_g=1e-4, noise_a=1e-3, seed=5)
        imu = (t_imu, gyro, acc)
        vio = VioFrontend(sys_, cfg=VioConfig(init_min_kfs=10,
                                              init_min_span=3.0))
    rng = np.random.RandomState(21)
    block = 100
    blocks = []
    t0 = time.time()
    for i in range(n):
        obs = world.observe(Rcw[i], tcw[i], cam, bf=bf, n_kp=500,
                            pixel_noise=0.25, bit_flips=4, clutter=40,
                            rng=rng, max_depth=10.0)
        frame = make_frame_from_features(
            obs["uv"], obs["level"], obs["angle"], obs["desc"],
            obs["valid"], ur=obs["ur"], depth=obs["depth"],
            timestamp=ts[i])
        if vio is not None:
            t_imu, gyro, acc = imu
            while imu_i < len(t_imu) and t_imu[imu_i] <= ts[i]:
                vio.track_odom(t_imu[imu_i], gyro[imu_i], acc[imu_i])
                imu_i += 1
            vio.track_frame(frame)
        else:
            sys_.track_frame(frame)
        if (i + 1) % block == 0:
            dt = time.time() - t0
            t0 = time.time()
            m = sys_.map
            blocks.append({
                "frame": i + 1, "s_per_block": round(dt, 1),
                "kfs": int(m.n_keyframes()), "lms": int(m.n_landmarks()),
                "loops": sys_.loop_closer.n_loops_closed})
            print(blocks[-1], flush=True)

    sys_.wait_idle()
    traj = sys_.tracker.trajectory
    p_est = np.asarray([-(x[1].T @ x[2]) for x in traj])
    res = ate(np.asarray([x[0] for x in traj]), p_est, ts, twc)
    # flatness: late blocks must not blow up vs the steady-state median
    times = np.asarray([b["s_per_block"] for b in blocks[2:]])
    flat = float(times[-3:].mean() / np.median(times))
    out = {"frames": n, "mode": args.mode,
           "async_mapping": bool(args.async_mapping),
           "ate_rmse": round(float(res["rmse"]), 4),
           "kfs": blocks[-1]["kfs"], "lms": blocks[-1]["lms"],
           "loops": blocks[-1]["loops"],
           "vio_inited": bool(vio.inited) if vio is not None else None,
           "late_vs_median_time_ratio": round(flat, 2),
           "blocks": blocks}
    sys_.shutdown()
    print(json.dumps({k: v for k, v in out.items() if k != "blocks"}))
    if args.out:
        import os
        prev = {}
        if os.path.exists(args.out):
            with open(args.out) as f:
                prev = json.load(f)
        key = f"{args.mode}{'_async' if args.async_mapping else ''}"
        prev[key] = out
        with open(args.out, "w") as f:
            json.dump(prev, f, indent=1)


if __name__ == "__main__":
    main()
