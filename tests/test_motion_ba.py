"""Motion-only BA tests: recover a perturbed pose from synthetic
observations, robustness to outliers, stereo channel (SURVEY.md §4:
BA vs. reference residuals on synthetic worlds)."""

import jax
import jax.numpy as jnp
import numpy as np

from vieo_slam_tpu.cameras import models as cm
from vieo_slam_tpu.math import lie
from vieo_slam_tpu.solvers.motion_ba import PoseObs, pose_optimization


def synthetic_problem(seed=0, n=200, noise=0.3, outlier_frac=0.0,
                      stereo=False):
    rng = np.random.RandomState(seed)
    cam = cm.make_pinhole(458.0, 458.0, 376.0, 240.0, 752, 480)
    bf = 458.0 * 0.11
    pw = rng.randn(n, 3).astype(np.float32) * [2.0, 1.5, 1.0] + [0, 0, 6.0]
    # True pose: modest rotation + translation.
    xi = np.array([0.1, -0.05, 0.2, 0.03, -0.02, 0.05], np.float32)
    Rcw, tcw = lie.se3_exp(jnp.asarray(xi))
    pc = np.asarray(pw @ np.asarray(Rcw).T + np.asarray(tcw))
    uv = np.array(cm.project(cam, jnp.asarray(pc)))
    uv += rng.randn(n, 2) * noise
    ur = np.full(n, -1.0, np.float32)
    if stereo:
        ur = uv[:, 0] - bf / pc[:, 2] + rng.randn(n) * noise
    n_out = int(n * outlier_frac)
    if n_out:
        uv[:n_out] += rng.randn(n_out, 2) * 80 + 40
    obs = PoseObs(
        pw=jnp.asarray(pw), uv=jnp.asarray(uv, jnp.float32),
        ur=jnp.asarray(ur, jnp.float32),
        inv_sigma2=jnp.ones(n, jnp.float32),
        valid=jnp.ones(n, bool),
    )
    return cam, bf, obs, (Rcw, tcw), xi


def pose_error(R_est, t_est, R_true, t_true):
    dR = np.asarray(R_est) @ np.asarray(R_true).T
    ang = np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))
    dt = np.linalg.norm(np.asarray(t_est) - np.asarray(t_true))
    return ang, dt


class TestPoseOptimization:
    def test_converges_from_perturbed_init(self):
        cam, bf, obs, (R, t), xi = synthetic_problem(noise=0.2)
        dxi = jnp.asarray([0.03, -0.02, 0.04, 0.05, 0.02, -0.08])
        dR, dt = lie.se3_exp(dxi)
        res = jax.jit(
            lambda R0, t0: pose_optimization(R0, t0, obs, cam, bf)
        )(dR @ R, dR @ t + dt)
        ang, terr = pose_error(res.Rcw, res.tcw, R, t)
        assert ang < 2e-3 and terr < 5e-3
        assert int(res.n_inliers) > 190

    def test_outlier_rejection(self):
        cam, bf, obs, (R, t), xi = synthetic_problem(
            noise=0.2, outlier_frac=0.25)
        dxi = jnp.asarray([0.02, 0.01, -0.02, 0.04, -0.03, 0.05])
        dR, dt = lie.se3_exp(dxi)
        res = pose_optimization(dR @ R, dR @ t + dt, obs, cam, bf)
        ang, terr = pose_error(res.Rcw, res.tcw, R, t)
        assert ang < 3e-3 and terr < 8e-3
        inl = np.asarray(res.inliers)
        # The injected outliers (first 25%) must be flagged out.
        assert inl[: len(inl) // 4].mean() < 0.1
        assert inl[len(inl) // 4:].mean() > 0.9

    def test_stereo_observations(self):
        cam, bf, obs, (R, t), xi = synthetic_problem(noise=0.2, stereo=True)
        dxi = jnp.asarray([0.02, -0.01, 0.03, -0.04, 0.03, 0.06])
        dR, dt = lie.se3_exp(dxi)
        res = pose_optimization(dR @ R, dR @ t + dt, obs, cam, bf)
        ang, terr = pose_error(res.Rcw, res.tcw, R, t)
        assert ang < 2e-3 and terr < 5e-3

    def test_padding_invariance(self):
        cam, bf, obs, (R, t), xi = synthetic_problem(noise=0.2)
        # Pad with garbage marked invalid.
        pad = 64
        obs_p = PoseObs(
            pw=jnp.concatenate([obs.pw, jnp.full((pad, 3), 1e3)]),
            uv=jnp.concatenate([obs.uv, jnp.zeros((pad, 2))]),
            ur=jnp.concatenate([obs.ur, jnp.full((pad,), -1.0)]),
            inv_sigma2=jnp.concatenate([obs.inv_sigma2, jnp.ones(pad)]),
            valid=jnp.concatenate([obs.valid, jnp.zeros(pad, bool)]),
        )
        dxi = jnp.asarray([0.01, 0.02, -0.01, 0.03, 0.01, -0.02])
        dR, dt = lie.se3_exp(dxi)
        r1 = pose_optimization(dR @ R, dR @ t + dt, obs, cam, bf)
        r2 = pose_optimization(dR @ R, dR @ t + dt, obs_p, cam, bf)
        # The normal equations are bit-identical up to reduction order, but
        # 40 LM iterations amplify last-ulp f32 differences; both must land
        # on the same minimum to optical-noise precision.
        np.testing.assert_allclose(np.asarray(r1.Rcw), np.asarray(r2.Rcw),
                                   atol=2e-3)
        np.testing.assert_allclose(np.asarray(r1.tcw), np.asarray(r2.tcw),
                                   atol=5e-3)
        assert abs(int(r1.n_inliers) - int(r2.n_inliers)) <= 2
        # Padded garbage rows must never be inliers.
        assert not np.asarray(r2.inliers)[-64:].any()

    def test_hessian_information_scales_with_obs(self):
        cam, bf, obs, (R, t), xi = synthetic_problem(noise=0.1)
        res = pose_optimization(R, t, obs, cam, bf)
        w = np.linalg.eigvalsh(np.asarray(res.H))
        assert w.min() > 0  # full-rank pose information from 200 points
