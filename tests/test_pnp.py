"""Batched PnP RANSAC (solvers/pnp_solver) — the reference's EPnP P4P
RANSAC equivalent (src/PnPsolver.cc, PnPsolver.h:44)."""

import numpy as np

import jax
import jax.numpy as jnp

from vieo_slam_tpu.math import lie
from vieo_slam_tpu.solvers.pnp_solver import pnp_ransac


def make_case(seed=0, N=200, n_out=60, noise=0.001):
    rng = np.random.RandomState(seed)
    R = np.asarray(lie.so3_exp(jnp.asarray(rng.randn(3) * 0.5)))
    t = rng.randn(3) * 2
    pc = rng.randn(N, 3) * np.array([2, 2, 1.5]) + [0, 0, 6]
    pw = (pc - t) @ R                    # R @ pw + t = pc
    rays = pc / pc[:, 2:]
    rays = rays + np.concatenate(
        [rng.randn(N, 2) * noise, np.zeros((N, 1))], 1)
    rays[:n_out] = np.concatenate(
        [rng.randn(n_out, 2) * 0.5, np.ones((n_out, 1))], 1)
    return R, t, pw, rays, n_out


def test_pnp_recovers_pose_with_outliers():
    R, t, pw, rays, n_out = make_case()
    res = pnp_ransac(
        jnp.asarray(rays, jnp.float32), jnp.asarray(pw, jnp.float32),
        jnp.ones(len(pw), bool), jax.random.PRNGKey(1), thresh=0.01)
    assert bool(res.ok)
    assert int(res.n_inliers) >= 0.9 * (len(pw) - n_out)
    assert np.abs(np.asarray(res.Rcw) - R).max() < 5e-3
    assert np.abs(np.asarray(res.tcw) - t).max() < 5e-2
    # outlier rows must not be counted as inliers
    assert not np.asarray(res.inliers)[:n_out].any()


def test_pnp_jittable_and_failure_flag():
    R, t, pw, rays, _ = make_case(seed=3, N=64, n_out=0)
    f = jax.jit(lambda r, p, v, k: pnp_ransac(r, p, v, k, thresh=0.01))
    res = f(jnp.asarray(rays, jnp.float32), jnp.asarray(pw, jnp.float32),
            jnp.ones(len(pw), bool), jax.random.PRNGKey(0))
    assert bool(res.ok)
    # all-outlier case -> not ok
    rng = np.random.RandomState(9)
    junk = np.concatenate([rng.randn(64, 2) * 0.5, np.ones((64, 1))], 1)
    res2 = f(jnp.asarray(junk, jnp.float32), jnp.asarray(pw, jnp.float32),
             jnp.ones(len(pw), bool), jax.random.PRNGKey(0))
    assert int(res2.n_inliers) < 12 or not bool(res2.ok)


def test_pnp_3d3d_low_purity_noisy_depth():
    """The relocalization regime pnp_ransac_3d3d exists for: ~35% match
    purity and frame-side stereo depth with sigma_z ~ z^2 sigma_d / bf
    noise.  The 6-point DLT RANSAC fails here (clean-sample p ~ 0.2%,
    measured failing on every blackout-recovery frame, r5); the 3-point
    Horn + reprojection-scored path must recover the pose."""
    from vieo_slam_tpu.solvers.pnp_solver import pnp_ransac_3d3d

    rng = np.random.RandomState(5)
    N = 60
    R, _ = np.linalg.qr(rng.randn(3, 3))
    R = R * np.sign(np.linalg.det(R))
    t = np.array([0.3, -0.2, 0.5])
    # camera-frame cloud in front of the camera, world = R^T (pc - t)
    pc = rng.randn(N, 3) * [1.5, 1.0, 0.0] + [0, 0, 0]
    pc[:, 2] = 2.0 + rng.rand(N) * 6.0
    pw = (pc - t) @ R
    rays = pc / pc[:, 2:]
    # frame-side stereo depth: z^2-proportional noise (bf = 80)
    z = pc[:, 2]
    z_meas = z + rng.randn(N) * (z ** 2 * 0.5 / 80.0)
    p_cam = rays * z_meas[:, None]
    # corrupt 65% of the WORLD matches (wrong landmark associated)
    n_bad = int(0.65 * N)
    pw_noisy = pw.copy()
    pw_noisy[:n_bad] = pw[rng.permutation(N)[:n_bad]] + rng.randn(n_bad, 3)
    res = pnp_ransac_3d3d(
        jnp.asarray(p_cam, jnp.float32), jnp.asarray(rays, jnp.float32),
        jnp.asarray(pw_noisy, jnp.float32),
        jnp.ones(N, bool), jnp.ones(N, bool),
        jax.random.PRNGKey(2), n_hyp=1024, thresh=5.0 / 400.0,
        min_inliers=10)
    assert bool(res.ok)
    assert np.abs(np.asarray(res.Rcw) - R).max() < 2e-2
    assert np.abs(np.asarray(res.tcw) - t).max() < 0.15
    # the corrupted rows must be mostly rejected
    assert np.asarray(res.inliers)[:n_bad].mean() < 0.2
