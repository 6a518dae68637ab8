"""N-run IMAGE-LEVEL ATE evaluation harness over the scenario matrix —
the equivalent of the reference's headline benchmark pipeline
(Examples/RunEuRoC/EvaluateEuRoC_Ntimes.sh -> RunEuRoCVIO.sh ->
EvaluateEuRoC_Evaluate.sh -> printResultATE.sh gawk aggregation,
SURVEY.md §4.1): run each sensor configuration N times with different
noise seeds, record ATE rmse/max both WITH and WITHOUT the final global
BA (the reference's dual-output A/B, stereo_euroc.cc:346-360), and print
an avg/median table.

EVERY scenario runs pixels -> ORB -> matching -> tracking (no
feature-level shortcuts): the renderer stamps per-landmark texture
patches and is hardened with photometric noise, brightness drift, depth
outliers (RGB-D), and dynamic landmarks, so the full perception stack is
under test — the "ORB exactness vs ATE" risk SURVEY §7 flags.

Scenarios: stereo | rgbd | mono | stereo_vio | vieo | veo | multicam_kb8

Run: PYTHONPATH=. python examples/evaluate_ntimes.py [--n 3] [--frames 60]
"""

import argparse
import json

import numpy as np

# Photometric hardening applied to every rendered frame.
NOISE_SIGMA = 2.0
DYNAMIC_FRAC = 0.02
DEPTH_OUTLIER_FRAC = 0.07


def _gain_bias(t):
    """Slow brightness drift (exposure wander on real cameras)."""
    return 1.0 + 0.10 * np.sin(0.5 * t), 8.0 * np.sin(0.3 * t)


def run_once(scenario: str, seed: int, n_frames: int):
    import jax
    import jax.numpy as jnp

    from vieo_slam_tpu.backend.loop_closing import (
        LoopCloser, LoopClosingConfig)
    from vieo_slam_tpu.cameras import models as cm
    from vieo_slam_tpu.frontend.frame import (
        build_mono_frame, build_multicam_frame, build_rgbd_frame,
        build_stereo_frame)
    from vieo_slam_tpu.frontend.tracking import TrackerConfig
    from vieo_slam_tpu.io.evaluate import ate
    from vieo_slam_tpu.ops import orb
    from vieo_slam_tpu.sim.world import (
        SyntheticWorld, WorldConfig, circle_trajectory,
        make_encoder_samples, make_imu_samples, trajectory_to_tcw)
    from vieo_slam_tpu.system import System, SystemConfig
    from vieo_slam_tpu.vio.encoder_frontend import (
        EncoderConfig, EncoderFrontend)
    from vieo_slam_tpu.vio.frontend import VioConfig, VioFrontend

    BASELINE = 0.2
    fx = 400.0
    cam = cm.make_pinhole(fx, fx, 320.0, 240.0, 640, 480)
    bf = fx * BASELINE
    world = SyntheticWorld(WorldConfig(
        n_landmarks=2200, seed=4, extent=(6.0, 4.5, 3.0),
        dynamic_frac=DYNAMIC_FRAC))
    ts = np.arange(n_frames) * 0.1
    Rwc, twc, v_w, a_w = circle_trajectory(ts, radius=1.0, omega=0.35,
                                           look_outward=True)
    Rcw, tcw = trajectory_to_tcw(Rwc, twc)
    # mono has no direct depth: it lives on cross-frame matching, so it
    # runs with the reference's mono feature budget (EuRoC mono yaml:
    # ORBextractor.nFeatures 1000; stereo modes keep 600 for runtime)
    ocfg = orb.OrbConfig(n_features=1000 if scenario == "mono" else 600,
                         n_levels=4)
    rng = np.random.RandomState(seed)

    # KB8 rig (multicam scenario)
    if scenario == "multicam_kb8":
        KB8_DIST = [0.02, 0.002, -0.001, 0.0005]
        cam0 = cm.make_kb8(300.0, 300.0, 320.0, 240.0, KB8_DIST, 640, 480)
        cam1 = cm.make_kb8(300.0, 300.0, 320.0, 240.0, KB8_DIST, 640, 480,
                           Rcr=np.eye(3, dtype=np.float32),
                           tcr=np.asarray([-0.11, 0, 0], np.float32))
        geom = cm.make_pinhole(300.0, 300.0, 320.0, 240.0, 640, 480)
        cam, bf = geom, 300.0 * 0.11

    # Octaves are physical at image level: predicted-scale search radii on.
    # stereo_async runs the concurrent tracking/mapping pipeline (worker
    # thread + map.lock + correction sinks) as a first-class accuracy row.
    scfg = SystemConfig(tracker=TrackerConfig(use_predicted_scale=True),
                        async_mapping=(scenario == "stereo_async"))
    sys_ = System(cam, bf, scfg)
    # mono: Sim3 loop closure with FREE scale (the reference's
    # mbFixScale = sensor != MONOCULAR) — mono scale drift is exactly
    # what the 7-DoF closure must absorb.
    sys_.loop_closer = LoopCloser(
        cam, bf, sys_.map,
        LoopClosingConfig(min_kf_gap=8,
                          fix_scale=(scenario != "mono")))
    vio = None
    veo = None
    enc = imu = None
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
    elif scenario == "veo":
        x_e = Rwc[0].T @ (v_w[0] / np.linalg.norm(v_w[0]))
        z_e = Rwc[0].T @ np.array([0.0, 0.0, 1.0])
        y_e = np.cross(z_e, x_e)
        Rbe = np.stack([x_e, y_e, z_e], axis=-1).astype(np.float64)
        veo = EncoderFrontend(sys_, cfg=EncoderConfig(
            enc_half_track=0.28, enc_sigma_v=5e-3,
            enc_Rbe=Rbe, enc_tbe=np.zeros(3)))
        t_enc, v_l, v_r = make_encoder_samples(
            ts, Rwc.astype(np.float64), twc.astype(np.float64),
            Rbe, np.zeros(3), rate_hz=100.0, half_track=0.28,
            noise_v=2e-3, seed=seed + 200)
        enc = (t_enc, v_l, v_r)

    # jitted frame builders (compile once per scenario)
    if scenario in ("stereo", "stereo_async", "stereo_vio", "vieo", "veo"):
        build = jax.jit(lambda l, r, t: build_stereo_frame(
            l, r, ocfg, bf=bf, min_depth=0.3, max_depth=15.0, timestamp=t))
    elif scenario == "rgbd":
        build = jax.jit(lambda im, d, t: build_rgbd_frame(
            im, d, ocfg, bf=bf, timestamp=t))
    elif scenario == "mono":
        build = jax.jit(lambda im, t: build_mono_frame(
            im, ocfg, timestamp=t))
    elif scenario == "multicam_kb8":
        build = jax.jit(lambda a, b, t: build_multicam_frame(
            [a, b], [cam0, cam1], ocfg, geom_cam=geom,
            virt_bf=bf, max_depth=15.0, timestamp=t))

    imu_i = enc_i = 0
    for i in range(n_frames):
        t = float(ts[i])
        if vio is not None:
            t_imu, gyro, acc = imu
            while imu_i < len(t_imu) and t_imu[imu_i] <= t:
                vio.track_odom(t_imu[imu_i], gyro[imu_i], acc[imu_i])
                imu_i += 1
        if enc is not None:
            tgt = vio if vio is not None else veo
            t_enc, v_l, v_r = enc
            while enc_i < len(t_enc) and t_enc[enc_i] <= t:
                tgt.track_encoder(t_enc[enc_i], v_l[enc_i], v_r[enc_i])
                enc_i += 1
        g, b = _gain_bias(t)
        hard = dict(t=t, noise_sigma=NOISE_SIGMA, gain=g, bias=b, rng=rng)
        if scenario in ("stereo", "stereo_async", "stereo_vio", "vieo",
                        "veo"):
            img_l, img_r = world.render_stereo(
                cam, Rcw[i], tcw[i], BASELINE, **hard)
            frame = build(jnp.asarray(img_l), jnp.asarray(img_r),
                          jnp.asarray(t, jnp.float64))
        elif scenario == "rgbd":
            img, dm = world.render_view(
                cam, Rcw[i], tcw[i], return_depth=True,
                depth_outlier_frac=DEPTH_OUTLIER_FRAC, **hard)
            frame = build(jnp.asarray(img), jnp.asarray(dm),
                          jnp.asarray(t, jnp.float64))
        elif scenario == "mono":
            img = world.render_view(cam, Rcw[i], tcw[i], **hard)
            frame = build(jnp.asarray(img), jnp.asarray(t, jnp.float64))
        elif scenario == "multicam_kb8":
            img0 = world.render_view(cam0, Rcw[i], tcw[i], **hard)
            R1 = cam1.Rcr @ Rcw[i]
            t1 = cam1.Rcr @ tcw[i] + cam1.tcr
            img1 = world.render_view(cam1, R1, t1, **hard)
            frame = build(jnp.asarray(img0), jnp.asarray(img1),
                          jnp.asarray(t, jnp.float64))
        if vio is not None:
            vio.track_frame(frame)
        elif veo is not None:
            veo.track_frame(frame)
        else:
            sys_.track_frame(frame)

    from vieo_slam_tpu.io.evaluate import ate  # noqa: F811

    def kf_ate():
        m = sys_.map
        kfs = m.keyframe_ids()
        p = np.stack([-(m.kf_Rcw[k].T @ m.kf_tcw[k]) for k in kfs])
        # mono: similarity (scale-free) alignment, like the reference's
        # mono evaluation
        return ate(m.kf_timestamp[kfs], p, ts, twc,
                   with_scale=(scenario == "mono"))

    sys_.wait_idle()
    pre = kf_ate()
    sys_.final_global_ba()
    post = kf_ate()
    sys_.shutdown()
    return {"rmse_noFullBA": pre["rmse"], "max_noFullBA": pre["max"],
            "rmse_fullBA": post["rmse"], "max_fullBA": post["max"]}


ALL = "stereo,stereo_async,rgbd,mono,stereo_vio,vieo,veo,multicam_kb8"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--scenarios", default=ALL)
    ap.add_argument("--out", default=None,
                    help="write the aggregate table as JSON")
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
        agg = {"image_level": True}
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
    if args.out:
        meta = {"n_runs": args.n, "frames": args.frames,
                "renderer_hardening": {
                    "noise_sigma": NOISE_SIGMA,
                    "brightness_drift": "gain 1±0.10, bias ±8",
                    "dynamic_landmark_frac": DYNAMIC_FRAC,
                    "rgbd_depth_outlier_frac": DEPTH_OUTLIER_FRAC}}
        with open(args.out, "w") as f:
            json.dump({"meta": meta, "scenarios": table}, f, indent=1)


if __name__ == "__main__":
    main()
