"""N-run ATE evaluation harness over the synthetic scenario matrix — the
equivalent of the reference's headline benchmark pipeline
(Examples/RunEuRoC/EvaluateEuRoC_Ntimes.sh -> RunEuRoCVIO.sh ->
EvaluateEuRoC_Evaluate.sh -> printResultATE.sh gawk aggregation,
SURVEY.md §4.1): run each sensor configuration N times with different
noise seeds, record ATE rmse/max both WITH and WITHOUT the final global
BA (the reference's dual-output A/B, stereo_euroc.cc:346-360), and print
an avg/median table.

Run: PYTHONPATH=. python examples/evaluate_ntimes.py [--n 3] [--frames 120]
"""

import argparse
import json

import numpy as np


def run_once(scenario: str, seed: int, n_frames: int):
    from vieo_slam_tpu.backend.loop_closing import (
        LoopCloser, LoopClosingConfig)
    from vieo_slam_tpu.cameras import models as cm
    from vieo_slam_tpu.frontend.frame import make_frame_from_features
    from vieo_slam_tpu.io.evaluate import ate
    from vieo_slam_tpu.sim.world import (
        SyntheticWorld, WorldConfig, circle_trajectory,
        make_encoder_samples, make_imu_samples, trajectory_to_tcw)
    from vieo_slam_tpu.system import System, SystemConfig
    from vieo_slam_tpu.vio.frontend import VioConfig, VioFrontend

    cam = cm.make_pinhole(400.0, 400.0, 320.0, 240.0, 640, 480)
    bf = 400.0 * 0.2
    world = SyntheticWorld(WorldConfig(n_landmarks=5000, seed=4,
                                       extent=(6.0, 4.5, 3.0)))
    ts = np.arange(n_frames) * 0.1
    Rwc, twc, v_w, a_w = circle_trajectory(ts, radius=1.0, omega=0.35,
                                           look_outward=True)
    Rcw, tcw = trajectory_to_tcw(Rwc, twc)

    sys_ = System(cam, bf, SystemConfig())
    sys_.loop_closer = LoopCloser(cam, bf, sys_.map,
                                  LoopClosingConfig(min_kf_gap=8))
    vio = None
    enc = None
    if scenario in ("stereo_vio", "vieo"):
        bg = np.array([0.01, -0.02, 0.015], np.float32)
        ba = np.array([0.05, 0.03, -0.04], np.float32)
        t_imu, gyro, acc = make_imu_samples(
            ts, Rwc.astype(np.float64), v_w, a_w, rate_hz=200.0,
            bg=bg, ba=ba, noise_g=1e-4, noise_a=1e-3, seed=seed + 100)
        cfg = VioConfig(init_min_kfs=10, init_min_span=3.0)
        if scenario == "vieo":
            x_e = Rwc[0].T @ (v_w[0] / np.linalg.norm(v_w[0]))
            z_e = Rwc[0].T @ np.array([0.0, 0.0, 1.0])
            y_e = np.cross(z_e, x_e)
            Rbe = np.stack([x_e, y_e, z_e], axis=-1).astype(np.float64)
            cfg = VioConfig(init_min_kfs=10, init_min_span=3.0,
                            use_encoder=True, enc_half_track=0.28,
                            enc_sigma_v=5e-3, enc_Rbe=Rbe,
                            enc_tbe=np.zeros(3))
            t_enc, v_l, v_r = make_encoder_samples(
                ts, Rwc.astype(np.float64), twc.astype(np.float64),
                Rbe, np.zeros(3), rate_hz=100.0, half_track=0.28,
                noise_v=2e-3, seed=seed + 200)
            enc = (t_enc, v_l, v_r)
        vio = VioFrontend(sys_, cfg=cfg)
        imu = (t_imu, gyro, acc)

    rng = np.random.RandomState(seed)
    imu_i = enc_i = 0
    for i in range(n_frames):
        if vio is not None:
            t_imu, gyro, acc = imu
            while imu_i < len(t_imu) and t_imu[imu_i] <= ts[i]:
                vio.track_odom(t_imu[imu_i], gyro[imu_i], acc[imu_i])
                imu_i += 1
            if enc is not None:
                t_enc, v_l, v_r = enc
                while enc_i < len(t_enc) and t_enc[enc_i] <= ts[i]:
                    vio.track_encoder(t_enc[enc_i], v_l[enc_i], v_r[enc_i])
                    enc_i += 1
        obs = world.observe(
            Rcw[i], tcw[i], cam, bf=bf if scenario != "mono" else 0.0,
            n_kp=500, pixel_noise=0.25, bit_flips=4, clutter=40,
            rng=rng, max_depth=10.0)
        depth = obs["depth"]
        ur = obs["ur"]
        if scenario == "rgbd":
            ur = np.full_like(ur, -1.0)
        if scenario == "mono":
            frame = make_frame_from_features(
                obs["uv"], obs["level"], obs["angle"], obs["desc"],
                obs["valid"], timestamp=ts[i])
        else:
            frame = make_frame_from_features(
                obs["uv"], obs["level"], obs["angle"], obs["desc"],
                obs["valid"], ur=ur, depth=depth, timestamp=ts[i])
        if vio is not None:
            vio.track_frame(frame)
        else:
            sys_.track_frame(frame)

    def kf_ate():
        m = sys_.map
        kfs = m.keyframe_ids()
        p = np.stack([-(m.kf_Rcw[k].T @ m.kf_tcw[k]) for k in kfs])
        # mono: similarity (scale-free) alignment, like the reference's
        # mono evaluation
        return ate(m.kf_timestamp[kfs], p, ts, twc,
                   with_scale=(scenario == "mono"))

    pre = kf_ate()
    sys_.final_global_ba()
    post = kf_ate()
    return {"rmse_noFullBA": pre["rmse"], "max_noFullBA": pre["max"],
            "rmse_fullBA": post["rmse"], "max_fullBA": post["max"]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--scenarios", default="stereo,rgbd,stereo_vio,vieo")
    args = ap.parse_args()

    import jax
    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")

    table = {}
    for sc in args.scenarios.split(","):
        rows = []
        for run in range(args.n):
            r = run_once(sc, seed=11 + run * 7, n_frames=args.frames)
            rows.append(r)
            print(f"{sc} run {run}: " + " ".join(
                f"{k}={v:.4f}" for k, v in r.items()), flush=True)
            # Drop compiled executables between runs: thousands of live
            # LLVM JIT programs exhaust the process's mmap regions
            # (vm.max_map_count) and later compilations die with
            # "LLVM compilation error: Cannot allocate memory".
            jax.clear_caches()
        agg = {}
        for k in rows[0]:
            vals = np.asarray([r[k] for r in rows])
            agg[f"avg_{k}"] = round(float(vals.mean()), 4)
            agg[f"med_{k}"] = round(float(np.median(vals)), 4)
        table[sc] = agg

    print("\n== aggregate (m) ==")
    hdr = ["scenario", "avg_rmse_fullBA", "med_rmse_fullBA",
           "avg_rmse_noFullBA", "avg_max_fullBA"]
    print(" | ".join(f"{h:>18}" for h in hdr))
    for sc, agg in table.items():
        print(" | ".join([f"{sc:>18}"] + [
            f"{agg.get(h, float('nan')):>18.4f}" for h in hdr[1:]]))
    print(json.dumps(table))


if __name__ == "__main__":
    main()
