"""VIO factor and motion-BA tests: residual zeros at ground truth,
IMU-constrained pose recovery, bias estimation, marginal prior flow."""

import jax
import jax.numpy as jnp
import numpy as np

from vieo_slam_tpu.cameras import models as cm
from vieo_slam_tpu.math import lie
from vieo_slam_tpu.math.navstate import NavState, tcw_from_navstate
from vieo_slam_tpu.math.preintegration import preintegrate_imu
from vieo_slam_tpu.solvers import imu_factors
from vieo_slam_tpu.solvers.motion_ba import PoseObs
from vieo_slam_tpu.solvers.vio_ba import vio_pose_optimization

G = np.array([0.0, 0.0, -9.81], np.float32)


def simulate_segment(seed=0, T=40, dt=0.005, bg=None, ba=None):
    """Body accelerating+rotating between two states; exact integration at
    the sample rate so the preintegration matches the state evolution."""
    rng = np.random.RandomState(seed)
    bg = np.zeros(3, np.float32) if bg is None else bg
    ba = np.zeros(3, np.float32) if ba is None else ba
    w_body = np.array([0.1, -0.2, 0.4], np.float32)
    a_body = np.array([0.8, 0.3, -0.2], np.float32)

    R = np.eye(3, dtype=np.float32)
    p = np.zeros(3, np.float32)
    v = np.array([0.3, -0.1, 0.05], np.float32)
    gyro, acc = [], []
    for k in range(T):
        # measured = true body rates + bias; acc measures f = R^T(a_w - g)
        a_w = R @ a_body
        gyro.append(w_body + bg)
        acc.append(a_body - R.T @ G + ba)
        p = p + v * dt + 0.5 * a_w * dt * dt
        v = v + a_w * dt
        R = R @ np.asarray(lie.so3_exp(jnp.asarray(w_body * dt)))
    ns_i = NavState.identity()._replace(
        v=jnp.asarray([0.3, -0.1, 0.05]))
    ns_j = NavState.identity()._replace(
        R=jnp.asarray(R), p=jnp.asarray(p), v=jnp.asarray(v))
    return (jnp.asarray(np.array(gyro)), jnp.asarray(np.array(acc)),
            jnp.full((T,), dt, jnp.float32), ns_i, ns_j)


class TestImuResidual:
    def test_zero_at_truth(self):
        gyro, acc, dts, ns_i, ns_j = simulate_segment()
        pre = preintegrate_imu(gyro, acc, dts, jnp.zeros(3), jnp.zeros(3),
                               1e-4, 1e-3, integrate_midpoint=False)
        r = imu_factors.imu_residual_prv(ns_i, ns_j, pre)
        assert np.abs(np.asarray(r)).max() < 1e-4

    def test_bias_correction_in_residual(self):
        bg = np.array([0.02, -0.01, 0.015], np.float32)
        ba = np.array([0.15, -0.1, 0.05], np.float32)
        gyro, acc, dts, ns_i, ns_j = simulate_segment(bg=bg, ba=ba)
        # Preintegrate at zero bias, then carry the true bias in the state:
        pre = preintegrate_imu(gyro, acc, dts, jnp.zeros(3), jnp.zeros(3),
                               1e-4, 1e-3, integrate_midpoint=False)
        ns_i2 = ns_i._replace(bg=jnp.asarray(bg), ba=jnp.asarray(ba))
        r = imu_factors.imu_residual_prv(ns_i2, ns_j, pre)
        # First-order bias correction over a 0.2 s window: small residual.
        assert np.abs(np.asarray(r)).max() < 2e-3

    def test_nonzero_off_truth(self):
        gyro, acc, dts, ns_i, ns_j = simulate_segment()
        pre = preintegrate_imu(gyro, acc, dts, jnp.zeros(3), jnp.zeros(3),
                               1e-4, 1e-3, integrate_midpoint=False)
        ns_bad = ns_j._replace(p=ns_j.p + 0.1)
        r = imu_factors.imu_residual_prv(ns_i, ns_bad, pre)
        assert np.abs(np.asarray(r)).max() > 0.01


def make_vio_problem(seed=0, n=200, noise=0.2):
    rng = np.random.RandomState(seed)
    cam = cm.make_pinhole(450.0, 450.0, 320.0, 240.0, 640, 480)
    bf = 450.0 * 0.11
    Rcb = jnp.eye(3)
    tcb = jnp.zeros(3)
    gyro, acc, dts, ns_i, ns_j = simulate_segment(seed=seed)
    pre = preintegrate_imu(gyro, acc, dts, jnp.zeros(3), jnp.zeros(3),
                           1.7e-4, 2e-3, integrate_midpoint=False)
    pw = rng.randn(n, 3).astype(np.float32) * [2.0, 1.5, 1.0] + [0, 0, 6.0]
    Rcw, tcw = tcw_from_navstate(ns_j, Rcb, tcb)
    pc = pw @ np.asarray(Rcw).T + np.asarray(tcw)
    uv = np.array(cm.project(cam, jnp.asarray(pc))) + rng.randn(n, 2) * noise
    ur = uv[:, 0] - np.asarray(bf) / pc[:, 2] + rng.randn(n) * noise
    obs = PoseObs(
        pw=jnp.asarray(pw), uv=jnp.asarray(uv.astype(np.float32)),
        ur=jnp.asarray(ur.astype(np.float32)),
        inv_sigma2=jnp.ones(n, jnp.float32), valid=jnp.ones(n, bool),
    )
    return cam, bf, Rcb, tcb, pre, obs, ns_i, ns_j


class TestVioPoseOptimization:
    def test_recovers_perturbed_state(self):
        cam, bf, Rcb, tcb, pre, obs, ns_i, ns_j = make_vio_problem()
        dx = jnp.zeros(15).at[0:3].set(
            jnp.asarray([0.05, -0.03, 0.04])).at[6:9].set(
            jnp.asarray([0.02, 0.01, -0.03]))
        ns0 = ns_j.inc_pvr_bias(dx)
        res = jax.jit(
            lambda nl, nc: vio_pose_optimization(
                nl, nc, pre, obs, cam, Rcb, tcb, bf)
        )(ns_i, ns0)
        perr = np.linalg.norm(np.asarray(res.ns.p) - np.asarray(ns_j.p))
        dR = np.asarray(res.ns.R) @ np.asarray(ns_j.R).T
        ang = np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))
        assert perr < 5e-3
        assert ang < 2e-3
        # Velocity constrained by the IMU factor too.
        verr = np.linalg.norm(np.asarray(res.ns.v) - np.asarray(ns_j.v))
        assert verr < 5e-2
        assert int(res.n_inliers) > 190

    def test_prior_info_spd_and_informative(self):
        cam, bf, Rcb, tcb, pre, obs, ns_i, ns_j = make_vio_problem()
        res = vio_pose_optimization(ns_i, ns_j, pre, obs, cam, Rcb, tcb, bf)
        w = np.linalg.eigvalsh(np.asarray(res.prior_info))
        assert w.min() > -1e-3   # PSD up to regularization
        # Pose block should be strongly informative (many vision obs).
        assert np.asarray(res.prior_info)[0, 0] > 100.0

    def test_chained_prior(self):
        """Second solve consuming the first's marginal prior stays sane."""
        cam, bf, Rcb, tcb, pre, obs, ns_i, ns_j = make_vio_problem()
        r1 = vio_pose_optimization(ns_i, ns_j, pre, obs, cam, Rcb, tcb, bf)
        # Treat solved current as 'last' with its prior; same segment again.
        r2 = vio_pose_optimization(
            r1.ns, ns_j, pre, obs, cam, Rcb, tcb, bf,
            prior_info=r1.prior_info, last_fixed=False)
        assert np.isfinite(np.asarray(r2.ns.p)).all()
        assert int(r2.n_inliers) > 150

    def test_imu_constrains_velocity_without_vision(self):
        """With vision disabled, the state follows the IMU propagation."""
        cam, bf, Rcb, tcb, pre, obs, ns_i, ns_j = make_vio_problem()
        obs_off = obs._replace(valid=jnp.zeros_like(obs.valid))
        dx = jnp.zeros(15).at[3:6].set(jnp.asarray([0.3, -0.2, 0.1]))
        ns0 = ns_j.inc_pvr_bias(dx)   # velocity knocked off
        res = vio_pose_optimization(ns_i, ns0, pre, obs_off, cam, Rcb,
                                    tcb, bf)
        verr = np.linalg.norm(np.asarray(res.ns.v) - np.asarray(ns_j.v))
        assert verr < 2e-2
