"""Tests for IMU/encoder preintegration vs. closed-form ground truth.

Mirrors SURVEY.md §4's plan: preintegration vs. closed-form trajectories
(constant angular rate + constant world acceleration), bias-Jacobian
first-order accuracy, padding invariance.
"""

import jax
import jax.numpy as jnp
import numpy as np

from vieo_slam_tpu.math import lie
from vieo_slam_tpu.math.preintegration import (
    preintegrate_imu,
    preintegrate_encoder,
)

jax.config.update("jax_enable_x64", True)

GRAVITY = np.array([0.0, 0.0, -9.81])


def simulate_static_imu(T, dt, bg, ba):
    """Body at rest: gyro = bg_true, acc = -g in body (R = I) + ba_true."""
    gyro = np.tile(bg, (T, 1))
    acc = np.tile(-GRAVITY + ba, (T, 1))
    dts = np.full(T, dt)
    return jnp.asarray(gyro), jnp.asarray(acc), jnp.asarray(dts)


class TestImuPreintegration:
    def test_static_zero_bias(self):
        gyro, acc, dts = simulate_static_imu(200, 0.005, np.zeros(3), np.zeros(3))
        out = preintegrate_imu(gyro, acc, dts, jnp.zeros(3), jnp.zeros(3),
                               1e-4, 1e-3)
        t = 1.0
        np.testing.assert_allclose(np.asarray(out.dt), t, atol=1e-12)
        np.testing.assert_allclose(np.asarray(out.dR), np.eye(3), atol=1e-12)
        # dv = integral of dR a dt = -g t; dp = -0.5 g t^2 (in body=world frame)
        np.testing.assert_allclose(np.asarray(out.dv), -GRAVITY * t, atol=1e-9)
        np.testing.assert_allclose(np.asarray(out.dp), -0.5 * GRAVITY * t * t,
                                   rtol=1e-3)

    def test_constant_rotation_rate(self):
        """Pure rotation about z at 1 rad/s for 1 s -> dR = Exp([0,0,1])."""
        T, dt = 1000, 0.001
        w = np.array([0.0, 0.0, 1.0])
        gyro = jnp.asarray(np.tile(w, (T, 1)))
        acc = jnp.zeros((T, 3))
        dts = jnp.full((T,), dt)
        out = preintegrate_imu(gyro, acc, dts, jnp.zeros(3), jnp.zeros(3),
                               1e-4, 1e-3)
        np.testing.assert_allclose(
            np.asarray(out.dR), np.asarray(lie.so3_exp(jnp.asarray(w))),
            atol=1e-6)

    def test_rotating_with_acceleration_closed_form(self):
        """Spin about z while accelerating along body x; compare with a dense
        numerical integration at 10x rate."""
        rate, acc_b = 0.7, np.array([0.3, -0.2, 0.1])
        T, dt = 500, 0.002

        def dense(dt_f, steps):
            R = np.eye(3)
            v = np.zeros(3)
            p = np.zeros(3)
            w = np.array([0.0, 0.3, rate])
            dRs = np.asarray(lie.so3_exp(jnp.asarray(w * dt_f)))
            for _ in range(steps):
                p = p + v * dt_f + 0.5 * R @ acc_b * dt_f**2
                v = v + R @ acc_b * dt_f
                R = R @ dRs
            return R, v, p

        gyro = jnp.asarray(np.tile([0.0, 0.3, rate], (T, 1)))
        acc = jnp.asarray(np.tile(acc_b, (T, 1)))
        dts = jnp.full((T,), dt)
        out = preintegrate_imu(gyro, acc, dts, jnp.zeros(3), jnp.zeros(3),
                               1e-4, 1e-3, integrate_midpoint=False)
        R_ref, v_ref, p_ref = dense(dt, T)
        np.testing.assert_allclose(np.asarray(out.dR), R_ref, atol=1e-9)
        np.testing.assert_allclose(np.asarray(out.dv), v_ref, atol=1e-9)
        np.testing.assert_allclose(np.asarray(out.dp), p_ref, atol=1e-9)

    def test_padding_is_noop(self):
        key = jax.random.PRNGKey(0)
        T = 64
        gyro = jax.random.normal(key, (T, 3), dtype=jnp.float64) * 0.3
        acc = jax.random.normal(jax.random.PRNGKey(1), (T, 3),
                                dtype=jnp.float64) * 2.0
        dts = jnp.full((T,), 0.01)
        full = preintegrate_imu(gyro, acc, dts, jnp.zeros(3), jnp.zeros(3),
                                1e-3, 1e-2)
        # Same measurements padded to 2T with masked garbage.
        pad = jnp.ones((T, 3), dtype=jnp.float64) * 123.0
        gyro_p = jnp.concatenate([gyro, pad])
        acc_p = jnp.concatenate([acc, pad])
        dts_p = jnp.concatenate([dts, jnp.full((T,), 0.5)])
        mask = jnp.concatenate([jnp.ones(T, bool), jnp.zeros(T, bool)])
        padded = preintegrate_imu(gyro_p, acc_p, dts_p, jnp.zeros(3),
                                  jnp.zeros(3), 1e-3, 1e-2, mask=mask)
        for a, b in [(full.dR, padded.dR), (full.dv, padded.dv),
                     (full.dp, padded.dp), (full.cov, padded.cov),
                     (full.Jg_R, padded.Jg_R), (full.Ja_p, padded.Ja_p)]:
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-12)

    def test_bias_jacobians_first_order(self):
        """corrected(dbg, dba) must match re-integration at bias+delta."""
        key = jax.random.PRNGKey(2)
        T = 128
        gyro = jax.random.normal(key, (T, 3), dtype=jnp.float64) * 0.5
        acc = jax.random.normal(jax.random.PRNGKey(3), (T, 3),
                                dtype=jnp.float64) * 3.0
        dts = jnp.full((T,), 0.005)
        bg = jnp.asarray([0.01, -0.02, 0.015])
        ba = jnp.asarray([0.1, 0.05, -0.08])
        out = preintegrate_imu(gyro, acc, dts, bg, ba, 1e-3, 1e-2,
                               integrate_midpoint=False)
        dbg = jnp.asarray([1e-4, -2e-4, 1.5e-4])
        dba = jnp.asarray([3e-4, -1e-4, 2e-4])
        dR_c, dv_c, dp_c = out.corrected(dbg, dba)
        out2 = preintegrate_imu(gyro, acc, dts, bg + dbg, ba + dba, 1e-3, 1e-2,
                                integrate_midpoint=False)
        np.testing.assert_allclose(np.asarray(dR_c), np.asarray(out2.dR),
                                   atol=1e-7)
        np.testing.assert_allclose(np.asarray(dv_c), np.asarray(out2.dv),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(dp_c), np.asarray(out2.dp),
                                   atol=1e-6)

    def test_covariance_psd_and_growth(self):
        gyro, acc, dts = simulate_static_imu(100, 0.01, np.zeros(3), np.zeros(3))
        out = preintegrate_imu(gyro, acc, dts, jnp.zeros(3), jnp.zeros(3),
                               1.7e-4, 2e-3)
        cov = np.asarray(out.cov)
        np.testing.assert_allclose(cov, cov.T, atol=1e-15)
        w = np.linalg.eigvalsh(cov)
        assert w.min() >= -1e-15
        # Rotation block should be ~ sigma_g^2 * t (random-walk growth).
        np.testing.assert_allclose(cov[0, 0], (1.7e-4) ** 2 * 1.0, rtol=0.05)
        # PRV / PVR reorderings preserve eigenvalues.
        np.testing.assert_allclose(
            np.linalg.eigvalsh(np.asarray(out.cov_prv)), w, atol=1e-18)
        np.testing.assert_allclose(
            np.linalg.eigvalsh(np.asarray(out.cov_pvr)), w, atol=1e-18)
        # PRV order = (p, phi, v): p-block is cov[6:9] of internal order.
        np.testing.assert_allclose(np.asarray(out.cov_prv)[:3, :3],
                                   cov[6:9, 6:9], atol=1e-18)

    def test_vmap_over_windows(self):
        """One preintegration per KF pair via vmap (VI-init style)."""
        B, T = 5, 32
        key = jax.random.PRNGKey(4)
        gyro = jax.random.normal(key, (B, T, 3), dtype=jnp.float64) * 0.2
        acc = jax.random.normal(jax.random.PRNGKey(5), (B, T, 3),
                                dtype=jnp.float64)
        dts = jnp.full((B, T), 0.005)
        f = jax.vmap(lambda g, a, d: preintegrate_imu(
            g, a, d, jnp.zeros(3), jnp.zeros(3), 1e-3, 1e-2))
        out = f(gyro, acc, dts)
        assert out.dR.shape == (B, 3, 3)
        single = preintegrate_imu(gyro[2], acc[2], dts[2], jnp.zeros(3),
                                  jnp.zeros(3), 1e-3, 1e-2)
        np.testing.assert_allclose(np.asarray(out.dp[2]),
                                   np.asarray(single.dp), atol=1e-15)


class TestEncoderPreintegration:
    def test_straight_line(self):
        T = 100
        v = jnp.full((T,), 0.5)
        dts = jnp.full((T,), 0.01)
        out = preintegrate_encoder(v, v, dts, half_track=0.3, sigma_v=0.01)
        np.testing.assert_allclose(np.asarray(out.dp), [0.5, 0.0, 0.0],
                                   atol=1e-9)
        np.testing.assert_allclose(np.asarray(out.dR), np.eye(3), atol=1e-12)

    def test_pure_rotation(self):
        """Opposite wheel speeds spin in place: w = vr/rc with vl = -vr."""
        T, rc = 100, 0.3
        vr = jnp.full((T,), 0.3)
        dts = jnp.full((T,), 0.01)
        out = preintegrate_encoder(-vr, vr, dts, half_track=rc, sigma_v=0.01)
        theta = 0.3 / rc * 1.0
        np.testing.assert_allclose(np.asarray(out.dp), 0.0, atol=1e-9)
        np.testing.assert_allclose(
            np.asarray(out.dR),
            np.asarray(lie.so3_exp(jnp.asarray([0.0, 0, theta]))), atol=1e-9)

    def test_arc(self):
        """Constant twist drives an exact circular arc."""
        T, rc = 1000, 0.25
        vl, vr = 0.4, 0.6
        v, w = (vl + vr) / 2, (vr - vl) / (2 * rc)
        dts = jnp.full((T,), 0.001)
        out = preintegrate_encoder(jnp.full((T,), vl), jnp.full((T,), vr),
                                   dts, half_track=rc, sigma_v=0.01)
        t = 1.0
        theta = w * t
        radius = v / w
        expect = np.array([radius * np.sin(theta),
                           radius * (1 - np.cos(theta)), 0.0])
        np.testing.assert_allclose(np.asarray(out.dp), expect, atol=1e-5)

    def test_cov_invertible(self):
        T = 50
        v = jnp.full((T,), 0.5)
        dts = jnp.full((T,), 0.01)
        out = preintegrate_encoder(v, v * 1.1, dts, half_track=0.3,
                                   sigma_v=0.01)
        w = np.linalg.eigvalsh(np.asarray(out.cov))
        assert w.min() > 0
