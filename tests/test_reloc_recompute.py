"""Post-relocalization bias recompute
(Tracking::RecomputeIMUBiasAndCurrentNavstate, src/Tracking.cc:548-684):
given ~20 vision poses after a kidnap and the raw IMU between them, the
gyro bias, accel bias, and velocities are re-estimated with gravity held
from the original initialization."""

import numpy as np
import jax.numpy as jnp

from vieo_slam_tpu.sim.world import circle_trajectory, make_imu_samples
from vieo_slam_tpu.vio.initialization import recompute_bias_navstate

BG = np.array([0.012, -0.018, 0.01], np.float32)
BA = np.array([0.06, -0.04, 0.03], np.float32)


def test_recompute_bias_navstate():
    n = 20
    ts = np.arange(n) * 0.1
    # gently excited trajectory (vertical bobbing + nodding) so ba is
    # observable; the sim synthesizes gyro by per-frame finite
    # differences, so rates must vary slowly within a frame gap
    Rwc, twc, v_w, a_w = circle_trajectory(
        ts, radius=1.0, omega=0.4, z_amp=0.1, z_omega=0.9,
        pitch_amp=0.12, pitch_omega=0.7)
    t_imu, gyro, acc = make_imu_samples(
        ts, Rwc.astype(np.float64), v_w, a_w, rate_hz=200.0,
        bg=BG, ba=BA, noise_g=1e-4, noise_a=5e-4, seed=3)
    T = 64
    gyro_w = np.zeros((n - 1, T, 3), np.float32)
    acc_w = np.zeros((n - 1, T, 3), np.float32)
    dt_w = np.zeros((n - 1, T), np.float32)
    mask_w = np.zeros((n - 1, T), bool)
    for i in range(n - 1):
        sel = (t_imu >= ts[i]) & (t_imu < ts[i + 1])
        k = sel.sum()
        gyro_w[i, :k] = gyro[sel]
        acc_w[i, :k] = acc[sel]
        dt_w[i, :k] = 1.0 / 200.0
        mask_w[i, :k] = True

    Rcw = np.swapaxes(Rwc, -1, -2)
    out = recompute_bias_navstate(
        jnp.asarray(ts.astype(np.float32)), jnp.asarray(Rwc),
        jnp.asarray(twc), jnp.eye(3), jnp.zeros(3),
        jnp.asarray(gyro_w), jnp.asarray(acc_w), jnp.asarray(dt_w),
        jnp.asarray(mask_w),
        np.array([0.0, 0.0, -9.81], np.float32), 1.7e-4, 2e-3)
    assert Rcw is not None  # silence linter
    np.testing.assert_allclose(np.asarray(out.bg), BG, atol=5e-3)
    np.testing.assert_allclose(np.asarray(out.ba), BA, atol=3e-2)
    # velocity of the last frame close to truth
    np.testing.assert_allclose(np.asarray(out.v)[-1], v_w[-1], atol=0.02)
    # gravity refinement stays near the provided vector
    assert np.linalg.norm(np.asarray(out.gw)
                          - np.array([0, 0, -9.81])) < 0.2
