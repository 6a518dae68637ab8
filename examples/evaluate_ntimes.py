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
| multicam4_kb8 (the reference's 4-fisheye maximum, README.md:18)
plus the multi-lap loop-closure rows (stereo_loop | mono_loop | vio_loop):
an outward-looking circle re-traversed for several laps — the heading
sweeps 360° per lap, so each revisit genuinely requires place
recognition (the reference's whole-sequence evaluation regime where
loop closing + final GBA visibly cut ATE, README.md:44-63 fullBA vs
noFullBA columns); these rows also
record the keyframe ATE immediately BEFORE and AFTER the first loop
correction, isolating the closure's own contribution from the final GBA.

Run: PYTHONPATH=. python examples/evaluate_ntimes.py [--n 3] [--frames 60]
     [--loop-frames 360]
"""

import argparse
import json

import numpy as np

# Photometric hardening applied to every rendered frame.
NOISE_SIGMA = 2.0
DYNAMIC_FRAC = 0.02
DEPTH_OUTLIER_FRAC = 0.07

# Multi-lap loop rows: outward-looking circle, several laps.  Constant
# 2 deg/frame yaw at 180 frames/lap — the heading sweeps the full 360°
# per lap so covisibility to the previous lap breaks and the revisit
# genuinely requires place recognition, while the constant yaw RATE
# keeps the velocity model exact.  (The lemniscate alternative
# concentrates yaw ACCELERATION at its lobes/crossing — measured: it
# breaks image-level tracking at both 600 and 1000 features, so the
# multi-lap evidence uses the circle; the lemniscate's heading-specific
# place-recognition FP test lives in test_place_recognition_scale.)
LOOP_RADIUS = 1.5
LOOP_FRAMES_PER_LAP = 180


def _gain_bias(t):
    """Slow brightness drift (exposure wander on real cameras)."""
    return 1.0 + 0.10 * np.sin(0.5 * t), 8.0 * np.sin(0.3 * t)


def run_once(scenario: str, seed: int, n_frames: int):
    import os
    verbose = os.environ.get("EVAL_VERBOSE", "0") == "1"
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
        make_encoder_samples, make_imu_samples,
        trajectory_to_tcw)
    from vieo_slam_tpu.system import System, SystemConfig
    from vieo_slam_tpu.vio.encoder_frontend import (
        EncoderConfig, EncoderFrontend)
    from vieo_slam_tpu.vio.frontend import VioConfig, VioFrontend

    from vieo_slam_tpu.utils.metrics import metrics

    BASELINE = 0.2
    fx = 400.0
    cam = cm.make_pinhole(fx, fx, 320.0, 240.0, 640, 480)
    bf = fx * BASELINE
    # Loop rows re-traverse the multi-lap circle; blackout rows corrupt a
    # mid-run frame span (visual dropout -> LOST -> relocalization, or
    # ODOMOK dead-reckoning for odometry-carrying rows); map_reuse saves
    # the map mid-run, reloads it into a FRESH system and relocalizes
    # against it (System::LoadMap + MAP_REUSE); the other rows run the
    # 1/3-circle plumbing scenario.  `base` is the sensor pipeline.
    is_lem = scenario.endswith("_lem")
    is_loop = scenario.endswith("_loop") or is_lem
    is_blackout = scenario.endswith("_blackout")
    base = {"stereo_loop": "stereo", "mono_loop": "mono",
            "vio_loop": "stereo_vio",
            "stereo_lem": "stereo", "vio_lem": "stereo_vio",
            "stereo_blackout": "stereo", "vio_blackout": "stereo_vio",
            "map_reuse": "stereo",
            "multicam4_kb8": "multicam_kb8"}.get(scenario, scenario)
    # Blackout span: 12 consecutive frames mid-run (the reference's
    # robustness regime: Tracking goes LOST and must come back through
    # Relocalization, src/Tracking.cc:2529, or bridge on odometry,
    # TrackWithOnlyOdom :79-155).
    # at 3/5 of the run: past VIO final-init for the vio row, with
    # enough post-recovery frames left to gate the recovered ATE on
    bo_start, bo_end = ((3 * n_frames) // 5, (3 * n_frames) // 5 + 12) \
        if is_blackout else (-1, -1)
    reuse_at = (3 * n_frames) // 5 if scenario == "map_reuse" else -1
    # per-run counter deltas (metrics is process-global)
    _ctr_keys = ("state_LOST", "state_ODOMOK", "reloc_success")
    ctr0 = {key: metrics.counters.get(key, 0) for key in _ctr_keys}
    n_rig_cams = 4 if scenario == "multicam4_kb8" else 2
    ts = np.arange(n_frames) * 0.1
    if is_lem:
        # Lemniscate (figure-eight), tangent heading: yaw RATE swings
        # between -4.8 and +4.8 deg/frame with yaw-ACCELERATION spikes
        # at the lobe ends — the reference's hard-sequence motion class
        # (V103/MH05, README.md:48-58).  The constant-velocity model is
        # wrong by the acceleration term here, so the row exercises the
        # adaptive search radius, the IMU-propagated prediction
        # (PredictNavStateByIMU parity), and — for the stereo row —
        # LOST->Relocalization recovery.  Each lap revisits every pose:
        # loop closures fire once per lap.
        from vieo_slam_tpu.sim.world import figure_eight_trajectory
        world = SyntheticWorld(WorldConfig(
            n_landmarks=4000, seed=4, extent=(10.0, 7.0, 3.0),
            dynamic_frac=DYNAMIC_FRAC))
        omega = 2 * np.pi / (LOOP_FRAMES_PER_LAP * 0.1)
        Rwc, twc, v_w, a_w = figure_eight_trajectory(
            ts, a=3.0, b=1.0, omega=omega)
    elif is_loop:
        # Room sized so walls sit 2.5-4.3 m from the circling camera:
        # far enough to accumulate drift, close enough for monocular
        # parallax (at a 12 m room mono triangulation starves and loses
        # track — walls 4.5-7.5 m away at this translation speed).
        world = SyntheticWorld(WorldConfig(
            n_landmarks=4000, seed=4, extent=(8.0, 6.0, 3.0),
            dynamic_frac=DYNAMIC_FRAC))
        omega = 2 * np.pi / (LOOP_FRAMES_PER_LAP * 0.1)
        Rwc, twc, v_w, a_w = circle_trajectory(
            ts, radius=LOOP_RADIUS, omega=omega, look_outward=True)
    else:
        world = SyntheticWorld(WorldConfig(
            n_landmarks=2200, seed=4, extent=(6.0, 4.5, 3.0),
            dynamic_frac=DYNAMIC_FRAC))
        Rwc, twc, v_w, a_w = circle_trajectory(ts, radius=1.0, omega=0.35,
                                               look_outward=True)
    Rcw, tcw = trajectory_to_tcw(Rwc, twc)
    # mono has no direct depth: it lives on cross-frame matching, so it
    # runs with the reference's mono feature budget (EuRoC mono yaml:
    # ORBextractor.nFeatures 1000; stereo modes keep 600 for runtime)
    ocfg = orb.OrbConfig(n_features=1000 if base == "mono" else 600,
                         n_levels=4)
    rng = np.random.RandomState(seed)

    # KB8 rig (multicam scenario) at the SAME geometry as the stereo row
    # (fx 400, baseline 0.2): the r3 rig (fx 300, B 0.11) was 6x worse
    # purely from intrinsic depth noise (sigma_z ~ z^2 sigma_d / (fx B),
    # 2.4x the stereo row's), which buried the camera-model comparison;
    # at matched geometry the KB8 multicam path measures 0.0025 rmse =
    # parity with rectified stereo (scripts/debug_multicam_kb8.py).
    if base == "multicam_kb8":
        KB8_DIST = [0.02, 0.002, -0.001, 0.0005]
        # 2-cam: one horizontal pair.  4-cam (the reference's max,
        # README.md:18, Frame.cc:613): two stereo pairs — a second pair
        # displaced vertically, giving cam0 three partners with
        # orthogonal epipolar directions.
        offsets = [np.zeros(3), np.asarray([-BASELINE, 0, 0])]
        if n_rig_cams == 4:
            offsets += [np.asarray([0, -0.5 * BASELINE, 0]),
                        np.asarray([-BASELINE, -0.5 * BASELINE, 0])]
        rig_cams = [cm.make_kb8(fx, fx, 320.0, 240.0, KB8_DIST, 640, 480,
                                Rcr=np.eye(3, dtype=np.float32),
                                tcr=off.astype(np.float32))
                    for off in offsets]
        geom = cm.make_pinhole(fx, fx, 320.0, 240.0, 640, 480)
        cam, bf = geom, fx * BASELINE

    # Octaves are physical at image level: predicted-scale search radii on.
    # stereo_async runs the concurrent tracking/mapping pipeline (worker
    # thread + map.lock + correction sinks) as a first-class accuracy row.
    scfg = SystemConfig(tracker=TrackerConfig(use_predicted_scale=True),
                        async_mapping=(base == "stereo_async"))
    sys_ = System(cam, bf, scfg)
    # mono: Sim3 loop closure with FREE scale (the reference's
    # mbFixScale = sensor != MONOCULAR) — mono scale drift is exactly
    # what the 7-DoF closure must absorb.  Loop rows raise min_kf_gap so
    # only a genuine lap-old revisit can close (one lap back is ~50-90
    # KFs at this keyframe cadence).
    sys_.loop_closer = LoopCloser(
        cam, bf, sys_.map,
        LoopClosingConfig(min_kf_gap=30 if is_loop else 8,
                          fix_scale=(base != "mono")))

    # Loop rows: snapshot the keyframe ATE immediately before/after each
    # loop correction — the closure's own contribution, separate from
    # the final-GBA A/B the reference publishes.
    def kf_ate(t_min: float = -1.0):
        m = sys_.map
        kfs = m.keyframe_ids()
        if t_min > 0:
            kfs = kfs[m.kf_timestamp[kfs] > t_min]
        if len(kfs) < 2:
            # no keyframes in the window (e.g. recovery never happened):
            # NaN rather than crash — the n_relocs gate flags the failure
            return {"rmse": float("nan"), "max": float("nan")}
        p = np.stack([-(m.kf_Rcw[k].T @ m.kf_tcw[k]) for k in kfs])
        # mono: similarity (scale-free) alignment, like the reference's
        # mono evaluation
        return ate(m.kf_timestamp[kfs], p, ts, twc,
                   with_scale=(base == "mono"))

    lc_events = []
    if is_loop:
        _orig_correct = sys_.loop_closer._correct_loop

        def _hooked_correct(k, c, S_ck):
            pre = kf_ate()
            _orig_correct(k, c, S_ck)
            lc_events.append((pre["rmse"], kf_ate()["rmse"]))

        sys_.loop_closer._correct_loop = _hooked_correct
    vio = None
    veo = None
    enc = imu = None
    if base in ("stereo_vio", "vieo"):
        bg = np.array([0.01, -0.02, 0.015], np.float32)
        ba = np.array([0.05, 0.03, -0.04], np.float32)
        t_imu, gyro, acc = make_imu_samples(
            ts, Rwc.astype(np.float64), v_w, a_w, rate_hz=200.0,
            bg=bg, ba=ba, noise_g=1e-4, noise_a=1e-3, seed=seed + 100)
        cfg = VioConfig(init_min_kfs=10, init_min_span=3.0)
        if base == "vieo":
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
    elif base == "veo":
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
    if base in ("stereo", "stereo_async", "stereo_vio", "vieo", "veo"):
        build = jax.jit(lambda l, r, t: build_stereo_frame(
            l, r, ocfg, bf=bf, min_depth=0.3, max_depth=15.0, timestamp=t))
    elif base == "rgbd":
        build = jax.jit(lambda im, d, t: build_rgbd_frame(
            im, d, ocfg, bf=bf, timestamp=t))
    elif base == "mono":
        build = jax.jit(lambda im, t: build_mono_frame(
            im, ocfg, timestamp=t))
    elif base == "multicam_kb8":
        build = jax.jit(lambda ims, t: build_multicam_frame(
            list(ims), rig_cams, ocfg, geom_cam=geom,
            virt_bf=bf, max_depth=15.0, timestamp=t, return_stats=True))
    pv_acc = []   # per-frame per-view triangulation stats (multicam)

    imu_i = enc_i = 0
    for i in range(n_frames):
        t = float(ts[i])
        if i == reuse_at:
            # MAP_REUSE (System.cc:69-270, :578-586): persist the map,
            # stand up a FRESH system, load the checkpoint, rebuild the
            # place-recognition DB, and continue — the next frames must
            # relocalize against the loaded map before tracking resumes.
            import os as _os
            import tempfile
            fd, mpath = tempfile.mkstemp(suffix=".npz")
            _os.close(fd)
            sys_.save_map(mpath)
            sys_.shutdown()
            sys_ = System(cam, bf, scfg)
            sys_.loop_closer = LoopCloser(
                cam, bf, sys_.map,
                LoopClosingConfig(min_kf_gap=8, fix_scale=True))
            sys_.load_map(mpath)
            _os.unlink(mpath)
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
        if base in ("stereo", "stereo_async", "stereo_vio", "vieo",
                    "veo"):
            img_l, img_r = world.render_stereo(
                cam, Rcw[i], tcw[i], BASELINE, **hard)
            if bo_start <= i < bo_end:
                # visual dropout: sensor blackout (lens cover / exposure
                # failure) — featureless frames
                img_l = np.zeros_like(img_l)
                img_r = np.zeros_like(img_r)
            frame = build(jnp.asarray(img_l), jnp.asarray(img_r),
                          jnp.asarray(t, jnp.float64))
        elif base == "rgbd":
            img, dm = world.render_view(
                cam, Rcw[i], tcw[i], return_depth=True,
                depth_outlier_frac=DEPTH_OUTLIER_FRAC, **hard)
            frame = build(jnp.asarray(img), jnp.asarray(dm),
                          jnp.asarray(t, jnp.float64))
        elif base == "mono":
            img = world.render_view(cam, Rcw[i], tcw[i], **hard)
            frame = build(jnp.asarray(img), jnp.asarray(t, jnp.float64))
        elif base == "multicam_kb8":
            imgs = []
            for ci in rig_cams:
                Ri = ci.Rcr @ Rcw[i]
                ti_ = ci.Rcr @ tcw[i] + ci.tcr
                imgs.append(jnp.asarray(
                    world.render_view(ci, Ri, ti_, **hard)))
            frame, pv = build(tuple(imgs), jnp.asarray(t, jnp.float64))
            pv_acc.append([(float(s["matches"]), float(s["accepted"]),
                            float(s["mean_err2"])) for s in pv])
        if vio is not None:
            vio.track_frame(frame)
        elif veo is not None:
            veo.track_frame(frame)
        else:
            sys_.track_frame(frame)
        if verbose:
            print(f"  [{i:3d}] {sys_.tracker.state.name:7s} "
                  f"kf={sys_.map.n_keyframes():3d}", flush=True)

    sys_.wait_idle()
    pre = kf_ate()
    sys_.final_global_ba()
    post = kf_ate()
    sys_.shutdown()
    out = {"rmse_noFullBA": pre["rmse"], "max_noFullBA": pre["max"],
           "rmse_fullBA": post["rmse"], "max_fullBA": post["max"]}
    if pv_acc:
        # per-view (partner camera) triangulation health: a regression
        # in ONE camera of the rig surfaces as that view's accepted
        # count collapsing / its reprojection error growing, instead of
        # hiding inside the rig-aggregate ATE (per-view chi2 columns).
        arr = np.asarray(pv_acc)              # [frames, views, 3]
        for v in range(arr.shape[1]):
            out[f"view{v + 1}_tri_per_frame"] = float(arr[:, v, 1].mean())
            out[f"view{v + 1}_mean_err2"] = float(
                np.nanmean(np.where(arr[:, v, 1] > 0, arr[:, v, 2],
                                    np.nan)))
    if is_loop:
        out["loops_closed"] = float(len(lc_events))
        # first closure: the drifted map the detector fired on vs the
        # corrected map — the closure's own ATE cut, before any GBA.
        out["rmse_preLC"] = lc_events[0][0] if lc_events else float("nan")
        out["rmse_postLC"] = lc_events[0][1] if lc_events else float("nan")
        # SearchAndFuse breadth: cross-lap fuses (merges + added
        # observations) across all closures this run
        out["fused_points"] = float(sys_.loop_closer.total_fuse_count)
    if is_lem:
        out["n_lost"] = float(
            metrics.counters.get("state_LOST", 0) - ctr0["state_LOST"])
        out["n_relocs"] = float(
            metrics.counters.get("reloc_success", 0)
            - ctr0["reloc_success"])
    if is_blackout or scenario == "map_reuse":
        # recovery bookkeeping: LOST frames, odometry-bridged frames,
        # successful relocalizations, and the ATE of the post-recovery
        # keyframes only (did the run actually come back healthy?)
        out["n_lost"] = float(
            metrics.counters.get("state_LOST", 0) - ctr0["state_LOST"])
        out["n_odomok"] = float(
            metrics.counters.get("state_ODOMOK", 0) - ctr0["state_ODOMOK"])
        out["n_relocs"] = float(
            metrics.counters.get("reloc_success", 0)
            - ctr0["reloc_success"])
        t_rec = float(ts[bo_end]) if is_blackout else float(ts[reuse_at])
        out["rmse_postRecovery"] = kf_ate(t_min=t_rec)["rmse"]
    return out


ALL = ("stereo,stereo_async,rgbd,mono,stereo_vio,vieo,veo,"
       "multicam_kb8,multicam4_kb8")
LOOP_SCENARIOS = "stereo_loop,mono_loop,vio_loop"
LEM_SCENARIOS = "stereo_lem,vio_lem"
RECOVERY_SCENARIOS = "stereo_blackout,vio_blackout,map_reuse"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("--seed0", type=int, default=11,
                    help="base seed (seed_i = seed0 + 7*i); lets one "
                         "row's N runs split across parallel processes")
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--loop-frames", type=int, default=360,
                    help="frames for *_loop scenarios (2 laps at 180/lap)")
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--scenarios", default=",".join(
        (ALL, LOOP_SCENARIOS, LEM_SCENARIOS, RECOVERY_SCENARIOS)))
    ap.add_argument("--out", default=None,
                    help="write the aggregate table as JSON")
    args = ap.parse_args()

    import jax
    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")

    table = {}
    for sc in args.scenarios.split(","):
        nf = args.loop_frames \
            if sc.endswith(("_loop", "_lem")) else args.frames
        rows = []
        for run in range(args.n):
            r = run_once(sc, seed=args.seed0 + run * 7, n_frames=nf)
            rows.append(r)
            print(f"{sc} run {run}: " + " ".join(
                f"{k}={v:.4f}" for k, v in r.items()), flush=True)
            # Drop compiled executables between runs: thousands of live
            # LLVM JIT programs exhaust the process's mmap regions
            # (vm.max_map_count) and later compilations die with
            # "LLVM compilation error: Cannot allocate memory".
            jax.clear_caches()
        agg = {"image_level": True}
        if sc.endswith("_loop"):
            agg["frames"] = nf
            agg["laps"] = round(nf / LOOP_FRAMES_PER_LAP, 2)
        for k in rows[0]:
            vals = np.asarray([r[k] for r in rows])
            # nan-aware: a loop row with zero closures reports NaN for
            # its pre/post-closure columns rather than poisoning the agg
            agg[f"avg_{k}"] = round(float(np.nanmean(vals)), 4)
            agg[f"med_{k}"] = round(float(np.nanmedian(vals)), 4)
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
                "loop_frames": args.loop_frames,
                "loop_frames_per_lap": LOOP_FRAMES_PER_LAP,
                "renderer_hardening": {
                    "noise_sigma": NOISE_SIGMA,
                    "brightness_drift": "gain 1±0.10, bias ±8",
                    "dynamic_landmark_frac": DYNAMIC_FRAC,
                    "rgbd_depth_outlier_frac": DEPTH_OUTLIER_FRAC}}
        with open(args.out, "w") as f:
            json.dump({"meta": meta, "scenarios": table}, f, indent=1)


if __name__ == "__main__":
    main()
