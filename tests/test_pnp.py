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
