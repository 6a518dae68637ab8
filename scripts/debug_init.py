"""Isolate VI-init quality: feed GROUND TRUTH poses + sim IMU and check
recovered gravity / biases under flat vs excited trajectories."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from vieo_slam_tpu.native import OdomRing
from vieo_slam_tpu.sim.world import circle_trajectory, make_imu_samples
from vieo_slam_tpu.vio.initialization import try_init_vio

BG = np.array([0.01, -0.02, 0.015], np.float32)
BA = np.array([0.05, 0.03, -0.04], np.float32)


def run(name, **traj_kw):
    n_frames = 40                      # 4 s of KFs at 0.1 s
    ts = np.arange(n_frames) * 0.1
    Rwc, twc, v_w, a_w = circle_trajectory(ts, radius=1.0, omega=0.25,
                                           look_outward=True, **traj_kw)
    t_imu, gyro, acc = make_imu_samples(
        ts, Rwc.astype(np.float64), v_w, a_w, rate_hz=200.0,
        bg=BG, ba=BA, noise_g=1e-4, noise_a=1e-3, seed=5)
    ring = OdomRing(1 << 16)
    for i in range(len(t_imu)):
        ring.push(t_imu[i], np.concatenate([gyro[i], acc[i]]).astype(np.float32))

    # KFs every 3 frames, ground-truth poses in the SLAM world (= cam0)
    kf_is = np.arange(0, n_frames, 3)
    R0 = Rwc[0]
    Rwc_s = np.einsum("ij,tjk->tik", R0.T, Rwc)        # slam world poses
    p_s = np.einsum("ij,tj->ti", R0.T, twc - twc[0])
    kts = ts[kf_is]
    N = len(kf_is)
    T = 256
    gw_ = np.zeros((N - 1, T, 3), np.float32)
    ac_ = np.zeros((N - 1, T, 3), np.float32)
    dt_ = np.zeros((N - 1, T), np.float32)
    mk_ = np.zeros((N - 1, T), bool)
    for i in range(N - 1):
        vals, dts, mask, n = ring.window(kts[i], kts[i + 1], T)
        gw_[i], ac_[i] = vals[:, :3], vals[:, 3:]
        dt_[i], mk_[i] = dts, mask
    out = try_init_vio(
        jnp.asarray(kts.astype(np.float32)),
        jnp.asarray(Rwc_s[kf_is].astype(np.float32)),
        jnp.asarray(p_s[kf_is].astype(np.float32)),
        jnp.asarray(np.eye(3, dtype=np.float32)),
        jnp.asarray(np.zeros(3, np.float32)),
        jnp.asarray(gw_), jnp.asarray(ac_), jnp.asarray(dt_),
        jnp.asarray(mk_), 1.7e-4, 2e-3, solve_scale=False,
    )
    gw = np.asarray(out.gw)
    g_true = R0.T @ np.array([0, 0, -9.81])
    ang = np.degrees(np.arccos(np.clip(
        gw @ g_true / (np.linalg.norm(gw) * 9.81), -1, 1)))
    print(f"{name}: |gw|={np.linalg.norm(gw):.3f} g_ang={ang:.3f}deg "
          f"bg_err={np.linalg.norm(np.asarray(out.bg)-BG):.4f} "
          f"ba_err={np.linalg.norm(np.asarray(out.ba)-BA):.4f} "
          f"ba={np.round(np.asarray(out.ba),3)} scale={float(out.scale):.4f}")


run("flat     ")
run("excited  ", z_amp=0.15, pitch_amp=0.12)
run("excited+ ", z_amp=0.3, pitch_amp=0.25)
