"""Diagnose the vio_loop pre-closure drift (ACCURACY_r04: preLC 0.091
vs stereo_loop's 0.016 on the same multi-lap circle).

Adding IMU should never make the same vision pipeline 5x worse; the
suspects are (a) VI-init estimates (gravity direction / bias / velocity)
feeding a confident-but-wrong prior into the fused motion solve,
(b) IMU noise weighting overpowering vision in the windowed PRV BA,
(c) the marginal-prior carry accumulating a biased constraint on the
constant-yaw circle (bias observability is weak when the specific force
direction barely changes in body frame).

Runs the EXACT evaluate_ntimes vio_loop pipeline with hooks:
  - at VI init: estimated gw / bg / ba / velocities vs simulation truth;
  - every KF: keyframe ATE, current bg/ba error norms;
  - A/B with VIO_OFF=1: same seed, same frames, plain stereo.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/debug_vio_loop.py
Env: DBG_FRAMES (360), DBG_SEED (11), VIO_OFF (0)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from vieo_slam_tpu.backend.loop_closing import (  # noqa: E402
    LoopCloser, LoopClosingConfig)
from vieo_slam_tpu.cameras import models as cm  # noqa: E402
from vieo_slam_tpu.frontend.frame import build_stereo_frame  # noqa: E402
from vieo_slam_tpu.frontend.tracking import TrackerConfig  # noqa: E402
from vieo_slam_tpu.io.evaluate import ate  # noqa: E402
from vieo_slam_tpu.ops import orb  # noqa: E402
from vieo_slam_tpu.sim.world import (  # noqa: E402
    SyntheticWorld, WorldConfig, circle_trajectory, make_imu_samples,
    trajectory_to_tcw)
from vieo_slam_tpu.system import System, SystemConfig  # noqa: E402
from vieo_slam_tpu.vio.frontend import VioConfig, VioFrontend  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples"))
from evaluate_ntimes import (  # noqa: E402
    _gain_bias, DYNAMIC_FRAC, LOOP_FRAMES_PER_LAP, LOOP_RADIUS,
    NOISE_SIGMA)

N_FRAMES = int(os.environ.get("DBG_FRAMES", "360"))
SEED = int(os.environ.get("DBG_SEED", "11"))
VIO_OFF = os.environ.get("VIO_OFF", "0") == "1"
# shrink the VI-init final-acceptance span so the init-GBA fires early
# (cheap A/B iterations on the init-GBA transient)
FINAL_SPAN = float(os.environ.get("DBG_FINAL_SPAN", "15.0"))

BG_TRUE = np.array([0.01, -0.02, 0.015], np.float32)
BA_TRUE = np.array([0.05, 0.03, -0.04], np.float32)
GW_TRUE = np.array([0.0, 0.0, -9.81], np.float32)


def main():
    BASELINE = 0.2
    fx = 400.0
    cam = cm.make_pinhole(fx, fx, 320.0, 240.0, 640, 480)
    bf = fx * BASELINE
    world = SyntheticWorld(WorldConfig(
        n_landmarks=4000, seed=4, extent=(8.0, 6.0, 3.0),
        dynamic_frac=DYNAMIC_FRAC))
    ts = np.arange(N_FRAMES) * 0.1
    omega = 2 * np.pi / (LOOP_FRAMES_PER_LAP * 0.1)
    Rwc, twc, v_w, a_w = circle_trajectory(
        ts, radius=LOOP_RADIUS, omega=omega, look_outward=True)
    Rcw, tcw = trajectory_to_tcw(Rwc, twc)
    ocfg = orb.OrbConfig(n_features=600, n_levels=4)
    rng = np.random.RandomState(SEED)
    sys_ = System(cam, bf, SystemConfig(
        tracker=TrackerConfig(use_predicted_scale=True)))
    sys_.loop_closer = LoopCloser(
        cam, bf, sys_.map,
        LoopClosingConfig(min_kf_gap=30, fix_scale=True))

    vio = None
    imu = None
    if not VIO_OFF:
        t_imu, gyro, acc = make_imu_samples(
            ts, Rwc.astype(np.float64), v_w, a_w, rate_hz=200.0,
            bg=BG_TRUE, ba=BA_TRUE, noise_g=1e-4, noise_a=1e-3,
            seed=SEED + 100)
        vio = VioFrontend(sys_, cfg=VioConfig(init_min_kfs=10,
                                              init_min_span=3.0,
                                              init_final_span=FINAL_SPAN))
        imu = (t_imu, gyro, acc)

        orig_final = vio._finalize_init if hasattr(vio, "_finalize_init") \
            else None
        del orig_final

    def kf_ate():
        m = sys_.map
        kfs = m.keyframe_ids()
        p = np.stack([-(m.kf_Rcw[k].T @ m.kf_tcw[k]) for k in kfs])
        return ate(m.kf_timestamp[kfs], p, ts, twc)["rmse"]

    build = jax.jit(lambda l, r, t: build_stereo_frame(
        l, r, ocfg, bf=bf, min_depth=0.3, max_depth=15.0, timestamp=t))

    if vio is not None:
        # Isolate the final-init phases: ATE after the linear-init
        # write-back (pre-attach) vs after the init-GBA (post-attach).
        orig_attach = vio._attach_backend

        def attach_hook():
            print(f"    ATE post-write-back(pre-GBA) = {kf_ate():.4f}",
                  flush=True)
            if os.environ.get("DBG_NO_INITGBA", "0") == "1":
                vio.cfg.run_init_gba = False
            orig_attach()
            print(f"    ATE post-attach(post-GBA)    = {kf_ate():.4f}",
                  flush=True)

        vio._attach_backend = attach_hook
        if os.environ.get("DBG_NO_GDIR") or os.environ.get(
                "DBG_NO_INITPRIOR"):
            import vieo_slam_tpu.vio.backend as vb
            _orig_gba = vb.VioBackend.run_global_ba

            def _gba(selfb, **kw):
                if os.environ.get("DBG_NO_GDIR", "0") == "1":
                    kw["opt_gdir"] = False
                if os.environ.get("DBG_NO_INITPRIOR", "0") == "1":
                    kw["init_prior"] = False
                return _orig_gba(selfb, **kw)

            vb.VioBackend.run_global_ba = _gba
        if os.environ.get("DBG_GBA_ITERS"):
            import vieo_slam_tpu.vio.backend as vb
            iters = tuple(int(x) for x in
                          os.environ["DBG_GBA_ITERS"].split(","))
            _orig_init = vb.VioBackendConfig.__init__

            def _patched(selfc, *a, **kw):
                _orig_init(selfc, *a, **kw)
                selfc.gba_stage_iters = iters

            vb.VioBackendConfig.__init__ = _patched

    inited_reported = [False]
    imu_i = 0
    n_kf_last = 0
    for i in range(N_FRAMES):
        t = float(ts[i])
        if vio is not None:
            ti_, gy_, ac_ = imu
            while imu_i < len(ti_) and ti_[imu_i] <= t:
                vio.track_odom(ti_[imu_i], gy_[imu_i], ac_[imu_i])
                imu_i += 1
        g, b = _gain_bias(t)
        img_l, img_r = world.render_stereo(
            cam, Rcw[i], tcw[i], BASELINE, t=t, noise_sigma=NOISE_SIGMA,
            gain=g, bias=b, rng=rng)
        frame = build(jnp.asarray(img_l), jnp.asarray(img_r),
                      jnp.asarray(t, jnp.float64))
        if vio is not None:
            vio.track_frame(frame)
        else:
            sys_.track_frame(frame)
        if vio is not None and vio.final_inited and not inited_reported[0]:
            inited_reported[0] = True
            gw = vio.gw
            gerr_deg = np.degrees(np.arccos(np.clip(
                gw @ GW_TRUE / (np.linalg.norm(gw) * 9.81), -1, 1)))
            print(f"[frame {i:3d}] VI-INIT |gw|={np.linalg.norm(gw):.4f} "
                  f"dir_err={gerr_deg:.3f} deg  "
                  f"bg_err={np.linalg.norm(vio.bg - BG_TRUE):.5f} "
                  f"ba_err={np.linalg.norm(vio.ba - BA_TRUE):.5f}")
        n_kf = len(sys_.map.keyframe_ids())
        if n_kf != n_kf_last and (n_kf % 5 == 0 or i == N_FRAMES - 1):
            n_kf_last = n_kf
            extra = ""
            if vio is not None and vio.final_inited:
                extra = (f" bg_err={np.linalg.norm(vio.bg - BG_TRUE):.5f}"
                         f" ba_err={np.linalg.norm(vio.ba - BA_TRUE):.5f}")
            print(f"[frame {i:3d}] KFs={n_kf:3d} ate={kf_ate():.4f}{extra}")

    sys_.wait_idle()
    print(f"FINAL pre-GBA ate={kf_ate():.4f} "
          f"({'stereo' if VIO_OFF else 'vio'})")
    sys_.shutdown()


if __name__ == "__main__":
    main()
