"""Debug harness: stereo-VIO synthetic run with backend toggles.

Usage: python scripts/debug_vio_backend.py [off|nogba|full]
Prints per-backend-solve keyframe ATE before/after, and final ATE.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from vieo_slam_tpu.cameras import models as cm
from vieo_slam_tpu.frontend.frame import make_frame_from_features
from vieo_slam_tpu.io.evaluate import ate
from vieo_slam_tpu.sim.world import (
    SyntheticWorld, WorldConfig, circle_trajectory, make_imu_samples,
    trajectory_to_tcw,
)
from vieo_slam_tpu.system import System, SystemConfig
from vieo_slam_tpu.vio.frontend import VioConfig, VioFrontend

BG = np.array([0.01, -0.02, 0.015], np.float32)
BA = np.array([0.05, 0.03, -0.04], np.float32)

mode = sys.argv[1] if len(sys.argv) > 1 else "full"


def kf_ate(m, ts, twc):
    kfs = m.keyframe_ids()
    if len(kfs) < 3:
        return None
    Rcw = m.kf_Rcw[kfs]
    tcw = m.kf_tcw[kfs]
    p = -np.einsum("kji,kj->ki", Rcw, tcw)
    t = m.kf_timestamp[kfs]
    return ate(t, p, ts, twc)["rmse"]


def main():
    cam = cm.make_pinhole(400.0, 400.0, 320.0, 240.0, 640, 480)
    bf = 400.0 * 0.2
    world = SyntheticWorld(WorldConfig(n_landmarks=4000, seed=3,
                                       extent=(6.0, 4.5, 3.0)))
    fps = float(os.environ.get("DBG_FPS", "10"))
    n_frames = int(os.environ.get("DBG_NFRAMES", "120"))
    ts = np.arange(n_frames) / fps
    omega = float(os.environ.get("DBG_OMEGA", "0.25"))
    z_amp = float(os.environ.get("DBG_ZAMP", "0.15"))
    pitch = float(os.environ.get("DBG_PITCH", "0.12"))
    Rwc, twc, v_w, a_w = circle_trajectory(
        ts, radius=1.0, omega=omega, look_outward=True,
        z_amp=z_amp, z_omega=2.0, pitch_amp=pitch, pitch_omega=1.3)
    Rcw, tcw = trajectory_to_tcw(Rwc, twc)
    t_imu, gyro, acc = make_imu_samples(
        ts, Rwc.astype(np.float64), v_w, a_w, rate_hz=200.0,
        bg=BG, ba=BA, noise_g=1e-4, noise_a=1e-3, seed=5)

    cfg = VioConfig(init_min_kfs=10, init_min_span=3.0,
                    init_final_span=8.0)
    if mode == "off":
        cfg.use_backend = False
    elif mode == "nogba":
        cfg.run_init_gba = False
    elif mode == "nolba":
        pass  # handled below: disable local BA only
    elif mode == "oracle":
        cfg.run_init_gba = False
    sys_ = System(cam, bf, SystemConfig())
    vio = VioFrontend(sys_, cfg=cfg)

    # ground-truth gravity in the SLAM world frame (= cam0 = body0)
    g_true_w = Rcw[0] @ np.array([0.0, 0.0, -9.81])

    def g_err_deg(gw):
        c = np.dot(gw, g_true_w) / (np.linalg.norm(gw)
                                    * np.linalg.norm(g_true_w))
        return np.degrees(np.arccos(np.clip(c, -1, 1)))

    if mode == "oracle":
        # Replace the init estimates with ground truth the moment init
        # succeeds: isolates "init quality" from "backend correctness".
        orig_init = vio._maybe_init

        def oracle_init():
            orig_init()
            if not vio.inited:
                return
            m = vio.sys.map
            vio.gw = g_true_w.astype(np.float32)
            vio.bg = BG.copy()
            vio.ba = BA.copy()
            kfs = m.keyframe_ids()
            m.kf_bg[kfs] = BG
            m.kf_ba[kfs] = BA
            vio.ns_last = vio.ns_last._replace(
                bg=jnp.asarray(BG), ba=jnp.asarray(BA),
                dbg=jnp.zeros(3, jnp.float32),
                dba=jnp.zeros(3, jnp.float32))
            if vio.backend is not None:
                vio.backend.gravity = g_true_w.astype(np.float32)
            print("  ORACLE init applied")
        vio._maybe_init = oracle_init

    # instrument the backend local BA
    orig_attach = vio._attach_backend

    def attach():
        # dump the pre-GBA state for offline dissection
        import pickle
        m0 = sys_.map
        state = dict(
            kf_Rcw=m0.kf_Rcw.copy(), kf_tcw=m0.kf_tcw.copy(),
            kf_vwb=m0.kf_vwb.copy(), kf_bg=m0.kf_bg.copy(),
            kf_ba=m0.kf_ba.copy(), kf_timestamp=m0.kf_timestamp.copy(),
            kf_valid=m0.kf_valid.copy(), kf_prev=m0.kf_prev.copy(),
            kf_lm_idx=m0.kf_lm_idx.copy(), kf_uv=m0.kf_uv.copy(),
            kf_ur=m0.kf_ur.copy(), kf_level=m0.kf_level.copy(),
            kf_kp_valid=m0.kf_kp_valid.copy(), lm_pw=m0.lm_pw.copy(),
            lm_valid=m0.lm_valid.copy(), gravity=vio.gw.copy(),
            bg=vio.bg.copy(), ba=vio.ba.copy(),
            ts=ts, twc=twc, Rcw=Rcw, tcw=tcw, vw=v_w,
        )
        with open("/tmp/live_initgba.pkl", "wb") as f:
            pickle.dump(state, f)
        np.savez("/tmp/live_imu.npz", t=t_imu, gyro=gyro, acc=acc)
        orig_attach()
        be = vio.backend
        if be is None:
            return
        print(f"  INIT: g_err={g_err_deg(vio.gw):.3f} deg  "
              f"bg_err={np.linalg.norm(vio.bg - BG):.4f}  "
              f"ba_err={np.linalg.norm(vio.ba - BA):.4f}")
        m = sys_.map
        kfs = m.keyframe_ids()
        ba_map = np.linalg.norm(m.kf_ba[kfs] - BA, axis=1).mean()
        bg_map = np.linalg.norm(m.kf_bg[kfs] - BG, axis=1).mean()
        print(f"  post-GBA: g_err={g_err_deg(be.gravity):.3f} deg "
              f"map bg_err={bg_map:.4f} ba_err={ba_map:.4f}")
        orig = be.run_local_ba

        def patched(k):
            pre = kf_ate(sys_.map, ts, twc)
            if mode == "nolba":
                return False
            if mode == "oracle" and not getattr(patched, "dumped", False):
                # capture the full solve input for offline dissection
                import pickle
                patched.dumped = True
                state = dict(
                    k=k,
                    kf_Rcw=sys_.map.kf_Rcw.copy(),
                    kf_tcw=sys_.map.kf_tcw.copy(),
                    kf_vwb=sys_.map.kf_vwb.copy(),
                    kf_bg=sys_.map.kf_bg.copy(),
                    kf_ba=sys_.map.kf_ba.copy(),
                    kf_timestamp=sys_.map.kf_timestamp.copy(),
                    kf_valid=sys_.map.kf_valid.copy(),
                    kf_prev=sys_.map.kf_prev.copy(),
                    kf_lm_idx=sys_.map.kf_lm_idx.copy(),
                    kf_uv=sys_.map.kf_uv.copy(),
                    kf_ur=sys_.map.kf_ur.copy(),
                    kf_level=sys_.map.kf_level.copy(),
                    kf_kp_valid=sys_.map.kf_kp_valid.copy(),
                    lm_pw=sys_.map.lm_pw.copy(),
                    lm_valid=sys_.map.lm_valid.copy(),
                    gravity=be.gravity.copy(),
                    ts=ts, twc=twc, Rcw=Rcw, tcw=tcw, vw=v_w,
                )
                with open("/tmp/live_problem.pkl", "wb") as f:
                    pickle.dump(state, f)
                # also dump raw ring contents
                import numpy as _np
                _np.savez("/tmp/live_imu.npz", t=t_imu, gyro=gyro, acc=acc)
            ok = orig(k)
            post = kf_ate(sys_.map, ts, twc)
            m = sys_.map
            bg_e = np.linalg.norm(m.kf_bg[k] - BG)
            ba_e = np.linalg.norm(m.kf_ba[k] - BA)
            print(f"  lba@kf{k}: ok={ok} kf_ate {pre:.4f} -> {post:.4f} "
                  f"bg_err={bg_e:.4f} ba_err={ba_e:.4f}")
            return ok
        be.run_local_ba = patched
    vio._attach_backend = attach

    rng = np.random.RandomState(11)
    imu_i = 0
    states = []
    for i in range(n_frames):
        while imu_i < len(t_imu) and t_imu[imu_i] <= ts[i]:
            vio.track_odom(t_imu[imu_i], gyro[imu_i], acc[imu_i])
            imu_i += 1
        obs = world.observe(
            Rcw[i], tcw[i], cam, bf=bf, n_kp=500, pixel_noise=0.25,
            bit_flips=4, clutter=50, rng=rng, max_depth=10.0,
        )
        frame = make_frame_from_features(
            obs["uv"], obs["level"], obs["angle"], obs["desc"],
            obs["valid"], ur=obs["ur"], depth=obs["depth"],
            timestamp=ts[i],
        )
        st = vio.track_frame(frame)
        states.append(st)
        if vio.inited and i % 20 == 0:
            ka = kf_ate(sys_.map, ts, twc)
            print(f"frame {i}: state={st.name} kf_ate="
                  f"{ka if ka is None else round(ka, 4)}")

    traj = sys_.tracker.trajectory
    t_est = np.asarray([x[0] for x in traj])
    p_est = np.asarray([-(x[1].T @ x[2]) for x in traj])
    res = ate(t_est, p_est, ts, twc)
    lost = sum(s.name == "LOST" for s in states)
    print(f"mode={mode} lost={lost} ATE rmse={res['rmse']:.4f} "
          f"max={res['max']:.4f} inited={vio.inited}")


if __name__ == "__main__":
    main()
