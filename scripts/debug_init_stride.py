"""Linear VI-init on the live dump with KF subsampling: ba error should
fall ~1/dt^2 as stride grows (pose-noise amplification 2*p_err/dt^2)."""

import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from vieo_slam_tpu.native import OdomRing
from vieo_slam_tpu.vio.initialization import try_init_vio

BG = np.array([0.01, -0.02, 0.015], np.float32)
BA = np.array([0.05, 0.03, -0.04], np.float32)

with open("/tmp/live_initgba.pkl", "rb") as f:
    S = pickle.load(f)
imu = np.load("/tmp/live_imu.npz")
ring = OdomRing(1 << 16)
t_imu, gyro, acc = imu["t"], imu["gyro"], imu["acc"]
for i in range(len(t_imu)):
    ring.push(t_imu[i], np.concatenate([gyro[i], acc[i]]).astype(np.float32))

kfs = np.nonzero(S["kf_valid"])[0]
R0cw = S["Rcw"][0]
g_true = R0cw @ np.array([0, 0, -9.81])

for stride in (1, 2, 3, 4):
    sel = kfs[::stride]
    if len(sel) < 4:
        continue
    ts_k = S["kf_timestamp"][sel]
    Rcw = S["kf_Rcw"][sel]
    tcw = S["kf_tcw"][sel]
    Rwc = np.swapaxes(Rcw, -1, -2)
    pwc = -np.einsum("kij,kj->ki", Rwc, tcw)
    N = len(sel)
    T = 1024
    gw_ = np.zeros((N - 1, T, 3), np.float32)
    ac_ = np.zeros((N - 1, T, 3), np.float32)
    dt_ = np.zeros((N - 1, T), np.float32)
    mk_ = np.zeros((N - 1, T), bool)
    for i in range(N - 1):
        vals, dts, mask, n = ring.window(ts_k[i], ts_k[i + 1], T)
        if n > T:
            raise RuntimeError("cap")
        gw_[i], ac_[i] = vals[:, :3], vals[:, 3:]
        dt_[i], mk_[i] = dts, mask
    out = try_init_vio(
        jnp.asarray(ts_k.astype(np.float32)),
        jnp.asarray(Rwc.astype(np.float32)),
        jnp.asarray(pwc.astype(np.float32)),
        jnp.asarray(np.eye(3, dtype=np.float32)),
        jnp.asarray(np.zeros(3, np.float32)),
        jnp.asarray(gw_), jnp.asarray(ac_), jnp.asarray(dt_),
        jnp.asarray(mk_), 1.7e-4, 2e-3, solve_scale=False)
    gw = np.asarray(out.gw)
    ang = np.degrees(np.arccos(np.clip(
        gw @ g_true / (np.linalg.norm(gw) * 9.81), -1, 1)))
    print(f"stride={stride} N={N} dt~{np.diff(ts_k).mean():.2f}s: "
          f"|gw|={np.linalg.norm(gw):.3f} g_ang={ang:.3f} "
          f"bg_err={np.linalg.norm(np.asarray(out.bg)-BG):.4f} "
          f"ba_err={np.linalg.norm(np.asarray(out.ba)-BA):.4f}")
