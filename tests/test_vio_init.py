"""VI initialization tests: recover gyro bias, gravity, scale, accel bias
and velocities from synthetic trajectories (IMUInitialization TryInitVIO
parity checks)."""

import jax
import jax.numpy as jnp
import numpy as np

from vieo_slam_tpu.math import lie
from vieo_slam_tpu.vio.initialization import (
    linear_alignment, solve_gyro_bias, try_init_vio,
)

G = np.array([0.0, 0.0, -9.81], np.float32)


def simulate(n_kf=12, kf_dt=0.25, imu_hz=200, bg=None, ba=None, seed=0,
             scale=1.0):
    """Rich 3D trajectory with analytic IMU; returns per-KF camera poses
    (scaled by 1/scale to mimic an unscaled monocular map) + raw IMU
    windows between keyframes."""
    rng = np.random.RandomState(seed)
    bg = np.zeros(3, np.float32) if bg is None else np.asarray(bg, np.float32)
    ba = np.zeros(3, np.float32) if ba is None else np.asarray(ba, np.float32)
    dt = 1.0 / imu_hz
    T_total = n_kf * kf_dt

    # Body rates/acc: smooth sinusoids (exciting all axes).
    def w_body(t):
        # Strong attitude excitation: g/ba separation needs large angle
        # coverage (the reference waits 15 s of KFs for the same reason).
        return np.array([0.9 * np.sin(1.1 * t), 0.8 * np.cos(0.9 * t),
                         0.7 * np.sin(0.7 * t + 1)], np.float32)

    def a_body(t):
        return np.array([0.8 * np.sin(1.3 * t), 0.6 * np.cos(1.7 * t),
                         0.4 * np.sin(2.1 * t)], np.float32)

    R = np.eye(3, dtype=np.float32)
    p = np.zeros(3, np.float32)
    v = np.zeros(3, np.float32)
    ts = np.arange(0, T_total + dt / 2, dt)
    Rs, ps, vs, gyr, acc = [], [], [], [], []
    for t in ts:
        Rs.append(R.copy()); ps.append(p.copy()); vs.append(v.copy())
        a_w = R @ a_body(t) + G          # total world accel (incl. gravity)
        gyr.append(w_body(t) + bg)
        # specific force f = R^T (a_w - g) = a_body exactly, + bias.
        acc.append(a_body(t) + ba)
        p = p + v * dt + 0.5 * a_w * dt * dt
        v = v + a_w * dt
        R = R @ np.asarray(lie.so3_exp(jnp.asarray(w_body(t) * dt)))
    Rs, ps = np.asarray(Rs), np.asarray(ps)
    gyr, acc = np.asarray(gyr), np.asarray(acc)

    stride = int(round(kf_dt / dt))
    kf_idx = np.arange(0, len(ts), stride)[:n_kf]
    t_kf = ts[kf_idx]
    R_wb = Rs[kf_idx]
    p_wb = ps[kf_idx]
    v_kf = np.asarray(vs)[kf_idx]

    # camera = body (Rcb = I, tcb = 0) with map scaled down by `scale`.
    R_wc = R_wb.copy()
    p_wc = p_wb / scale

    # IMU windows between consecutive KFs, padded.
    T = stride + 1
    gyro_w = np.zeros((n_kf - 1, T, 3), np.float32)
    acc_w = np.zeros((n_kf - 1, T, 3), np.float32)
    dt_w = np.zeros((n_kf - 1, T), np.float32)
    mask_w = np.zeros((n_kf - 1, T), bool)
    for m in range(n_kf - 1):
        sl = slice(kf_idx[m], kf_idx[m + 1])
        n = sl.stop - sl.start
        gyro_w[m, :n] = gyr[sl]
        acc_w[m, :n] = acc[sl]
        dt_w[m, :n] = dt
        mask_w[m, :n] = True
    return dict(
        t_kf=jnp.asarray(t_kf.astype(np.float32)),
        R_wb=jnp.asarray(R_wb), p_wb=jnp.asarray(p_wb),
        R_wc=jnp.asarray(R_wc), p_wc=jnp.asarray(p_wc.astype(np.float32)),
        v_kf=v_kf, gyro_w=jnp.asarray(gyro_w), acc_w=jnp.asarray(acc_w),
        dt_w=jnp.asarray(dt_w), mask_w=jnp.asarray(mask_w),
        bg=bg, ba=ba, scale=scale,
    )


class TestVioInit:
    def test_gyro_bias_recovery(self):
        bg = np.array([0.02, -0.015, 0.03], np.float32)
        sim = simulate(bg=bg)
        from vieo_slam_tpu.math.preintegration import preintegrate_imu
        z = jnp.zeros(3)
        pre0 = jax.vmap(lambda g, a, d, m: preintegrate_imu(
            g, a, d, z, z, 1.7e-4, 2e-3, mask=m))(
            sim["gyro_w"], sim["acc_w"], sim["dt_w"], sim["mask_w"])
        bg_est = solve_gyro_bias(sim["R_wb"], pre0)
        np.testing.assert_allclose(np.asarray(bg_est), bg, atol=2e-3)

    def test_full_init_stereo(self):
        """Known scale (stereo): recover gravity, biases, velocities."""
        bg = np.array([0.015, -0.02, 0.01], np.float32)
        ba = np.array([0.08, -0.05, 0.1], np.float32)
        sim = simulate(bg=bg, ba=ba, n_kf=40)
        out = try_init_vio(
            sim["t_kf"], sim["R_wc"], sim["p_wc"],
            jnp.eye(3), jnp.zeros(3),
            sim["gyro_w"], sim["acc_w"], sim["dt_w"], sim["mask_w"],
            1.7e-4, 2e-3, solve_scale=False,
        )
        np.testing.assert_allclose(np.asarray(out.bg), bg, atol=3e-3)
        np.testing.assert_allclose(np.asarray(out.gw), G, atol=0.08)
        np.testing.assert_allclose(np.asarray(out.ba), ba, atol=0.05)
        verr = np.linalg.norm(np.asarray(out.v) - sim["v_kf"], axis=1)
        assert np.median(verr) < 0.05

    def test_full_init_monocular_scale(self):
        """Unknown scale (mono): the map is 2.5x too small; recover it."""
        sim = simulate(n_kf=40, scale=2.5,
                       bg=np.array([0.01, 0.02, -0.01], np.float32))
        out = try_init_vio(
            sim["t_kf"], sim["R_wc"], sim["p_wc"],
            jnp.eye(3), jnp.zeros(3),
            sim["gyro_w"], sim["acc_w"], sim["dt_w"], sim["mask_w"],
            1.7e-4, 2e-3, solve_scale=True,
        )
        np.testing.assert_allclose(float(out.scale), 2.5, rtol=0.05)
        np.testing.assert_allclose(np.asarray(out.gw), G, atol=0.15)

    def test_gravity_magnitude_constraint(self):
        sim = simulate(n_kf=12)
        out = try_init_vio(
            sim["t_kf"], sim["R_wc"], sim["p_wc"],
            jnp.eye(3), jnp.zeros(3),
            sim["gyro_w"], sim["acc_w"], sim["dt_w"], sim["mask_w"],
            1.7e-4, 2e-3, solve_scale=False,
        )
        np.testing.assert_allclose(
            float(jnp.linalg.norm(out.gw)), 9.81, atol=1e-2)
