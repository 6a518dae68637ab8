"""Evaluate the PRV chain residual at GROUND TRUTH states on the live
synthetic scenario: if nonzero, the sim IMU / ring / preintegration /
residual conventions are inconsistent; if ~zero, the backend solve is
at fault."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from vieo_slam_tpu.math.navstate import NavState
from vieo_slam_tpu.math.preintegration import preintegrate_imu
from vieo_slam_tpu.native import OdomRing
from vieo_slam_tpu.sim.world import circle_trajectory, make_imu_samples
from vieo_slam_tpu.solvers import imu_factors

BG = np.array([0.01, -0.02, 0.015], np.float32)
BA = np.array([0.05, 0.03, -0.04], np.float32)

n_frames = 120
ts = np.arange(n_frames) * 0.1
Rwc, twc, v_w, a_w = circle_trajectory(ts, radius=1.0, omega=0.25,
                                       look_outward=True)
t_imu, gyro, acc = make_imu_samples(
    ts, Rwc.astype(np.float64), v_w, a_w, rate_hz=200.0,
    bg=BG, ba=BA, noise_g=0.0, noise_a=0.0, seed=5)

ring = OdomRing(1 << 16)
for i in range(len(t_imu)):
    ring.push(t_imu[i], np.concatenate([gyro[i], acc[i]]).astype(np.float32))

# "KFs" every 4 frames, in the SIM world frame (ground truth everything).
kf_is = np.arange(0, n_frames, 4)
g_w = np.array([0.0, 0.0, -9.81], np.float32)

print("chain   dt      |eP|      |eR|      |eV|    dba_fit")
for a, b in zip(kf_is[:-1], kf_is[1:]):
    t0, t1 = ts[a], ts[b]
    vals, dts, mask, n = ring.window(t0, t1, 256)
    pre = preintegrate_imu(
        jnp.asarray(vals[:, :3]), jnp.asarray(vals[:, 3:]),
        jnp.asarray(dts), jnp.asarray(BG), jnp.asarray(BA),
        1.7e-4, 2e-3, mask=jnp.asarray(mask))
    z3 = jnp.zeros(3, jnp.float32)
    ns_i = NavState(R=jnp.asarray(Rwc[a]), p=jnp.asarray(twc[a]),
                    v=jnp.asarray(v_w[a].astype(np.float32)),
                    bg=jnp.asarray(BG), ba=jnp.asarray(BA),
                    dbg=z3, dba=z3)
    ns_j = NavState(R=jnp.asarray(Rwc[b]), p=jnp.asarray(twc[b]),
                    v=jnp.asarray(v_w[b].astype(np.float32)),
                    bg=jnp.asarray(BG), ba=jnp.asarray(BA),
                    dbg=z3, dba=z3)
    r = np.asarray(imu_factors.imu_residual_prv(ns_i, ns_j, pre,
                                                jnp.asarray(g_w)))
    # what dba would explain eP via Ja_p?  dba ~ -pinv(Ja_p) eP
    Ja_p = np.asarray(pre.Ja_p) if hasattr(pre, "Ja_p") else None
    dba_fit = (np.linalg.lstsq(Ja_p, -r[:3], rcond=None)[0]
               if Ja_p is not None else np.zeros(3))
    if a < 40 or a % 20 == 0:
        print(f"{a:3d}-{b:3d} {float(pre.dt):.3f} "
              f"{np.linalg.norm(r[:3]):.5f} {np.linalg.norm(r[3:6]):.5f} "
              f"{np.linalg.norm(r[6:9]):.5f}  {np.round(dba_fit, 4)}")
