"""Unit tests for the Lie-group toolbox (vieo_slam_tpu/math/lie.py).

Strategy mirrors SURVEY.md §4: numerical unit tests per kernel — exp/log
round trips, Jacobian identities against finite differences, batched vs.
scalar consistency.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vieo_slam_tpu.math import lie

jax.config.update("jax_enable_x64", True)


def rand_phi(key, n, scale=1.0):
    return jax.random.normal(key, (n, 3), dtype=jnp.float64) * scale


class TestSO3:
    def test_exp_log_roundtrip(self):
        phi = rand_phi(jax.random.PRNGKey(0), 64, 1.0)
        R = lie.so3_exp(phi)
        # Valid rotations
        np.testing.assert_allclose(
            np.asarray(R @ jnp.swapaxes(R, -1, -2)),
            np.broadcast_to(np.eye(3), (64, 3, 3)), atol=1e-12)
        phi2 = lie.so3_log(R)
        np.testing.assert_allclose(np.asarray(phi2), np.asarray(phi), atol=1e-9)

    def test_log_small_angle(self):
        phi = rand_phi(jax.random.PRNGKey(1), 16, 1e-6)
        np.testing.assert_allclose(
            np.asarray(lie.so3_log(lie.so3_exp(phi))), np.asarray(phi), atol=1e-12)

    def test_log_near_pi(self):
        axis = np.array([[1.0, 0, 0], [0, 1, 0], [0, 0, 1],
                         [0.6, 0.8, 0.0], [-0.6, 0.0, 0.8]])
        for theta in [np.pi - 1e-4, np.pi - 1e-8, np.pi]:
            phi = jnp.asarray(axis * theta)
            R = lie.so3_exp(phi)
            phi2 = lie.so3_log(R)
            R2 = lie.so3_exp(phi2)
            # Compare rotations (phi may flip sign at exactly pi).
            np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-6)

    def test_right_jacobian_definition(self):
        """Exp(phi + d) ~ Exp(phi) Exp(Jr(phi) d)."""
        key = jax.random.PRNGKey(2)
        phi = rand_phi(key, 8, 1.5)
        d = rand_phi(jax.random.PRNGKey(3), 8, 1e-6)
        lhs = lie.so3_exp(phi + d)
        rhs = lie.so3_exp(phi) @ lie.so3_exp(
            jnp.einsum("nij,nj->ni", lie.so3_jr(phi), d))
        np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-10)

    def test_jr_inv(self):
        phi = rand_phi(jax.random.PRNGKey(4), 32, 2.0)
        J = lie.so3_jr(phi) @ lie.so3_jr_inv(phi)
        np.testing.assert_allclose(
            np.asarray(J), np.broadcast_to(np.eye(3), (32, 3, 3)), atol=1e-9)

    def test_jr_small_angle(self):
        phi = rand_phi(jax.random.PRNGKey(5), 8, 1e-7)
        np.testing.assert_allclose(
            np.asarray(lie.so3_jr(phi)),
            np.broadcast_to(np.eye(3), (8, 3, 3)), atol=1e-6)
        J = lie.so3_jr(phi) @ lie.so3_jr_inv(phi)
        np.testing.assert_allclose(
            np.asarray(J), np.broadcast_to(np.eye(3), (8, 3, 3)), atol=1e-10)

    def test_grad_safe_at_zero(self):
        g = jax.grad(lambda p: jnp.sum(lie.so3_exp(p)))(jnp.zeros(3))
        assert np.all(np.isfinite(np.asarray(g)))
        g2 = jax.grad(lambda p: jnp.sum(lie.so3_jr(p)))(jnp.zeros(3))
        assert np.all(np.isfinite(np.asarray(g2)))

    def test_normalize_rotation(self):
        R = lie.so3_exp(rand_phi(jax.random.PRNGKey(6), 4, 1.0))
        R_noisy = R + 1e-3 * jax.random.normal(jax.random.PRNGKey(7), R.shape,
                                               dtype=R.dtype)
        Rn = lie.normalize_rotation(R_noisy)
        np.testing.assert_allclose(
            np.asarray(Rn @ jnp.swapaxes(Rn, -1, -2)),
            np.broadcast_to(np.eye(3), (4, 3, 3)), atol=1e-12)
        np.testing.assert_allclose(np.asarray(jnp.linalg.det(Rn)), 1.0, atol=1e-12)


class TestQuat:
    def test_roundtrip(self):
        R = lie.so3_exp(rand_phi(jax.random.PRNGKey(8), 64, 2.0))
        q = lie.quat_from_rotmat(R)
        np.testing.assert_allclose(
            np.asarray(jnp.linalg.norm(q, axis=-1)), 1.0, atol=1e-12)
        R2 = lie.rotmat_from_quat(q)
        np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-9)

    def test_near_pi(self):
        phi = jnp.asarray([[np.pi - 1e-7, 0, 0], [0, 0, np.pi]])
        R = lie.so3_exp(phi)
        R2 = lie.rotmat_from_quat(lie.quat_from_rotmat(R))
        np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-7)


class TestSE3:
    def test_exp_log_roundtrip(self):
        xi = jax.random.normal(jax.random.PRNGKey(9), (32, 6), dtype=jnp.float64)
        R, t = lie.se3_exp(xi)
        xi2 = lie.se3_log(R, t)
        np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=1e-9)

    def test_inverse_compose(self):
        xi = jax.random.normal(jax.random.PRNGKey(10), (8, 6), dtype=jnp.float64)
        R, t = lie.se3_exp(xi)
        Ri, ti = lie.se3_inverse(R, t)
        Rc, tc = lie.se3_compose(R, t, Ri, ti)
        np.testing.assert_allclose(
            np.asarray(Rc), np.broadcast_to(np.eye(3), (8, 3, 3)), atol=1e-12)
        np.testing.assert_allclose(np.asarray(tc), 0.0, atol=1e-12)

    def test_apply(self):
        xi = jax.random.normal(jax.random.PRNGKey(11), (6,), dtype=jnp.float64)
        R, t = lie.se3_exp(xi)
        p = jax.random.normal(jax.random.PRNGKey(12), (5, 3), dtype=jnp.float64)
        np.testing.assert_allclose(
            np.asarray(lie.se3_apply(R, t, p)),
            np.asarray(p @ np.asarray(R).T + np.asarray(t)), atol=1e-12)


class TestSim3:
    def test_compose_inverse(self):
        key = jax.random.PRNGKey(13)
        xi = jax.random.normal(key, (8, 7), dtype=jnp.float64) * 0.5
        R, t, s = lie.sim3_exp(xi)
        Ri, ti, si = lie.sim3_inverse(R, t, s)
        Rc, tc, sc = lie.sim3_compose(R, t, s, Ri, ti, si)
        np.testing.assert_allclose(
            np.asarray(Rc), np.broadcast_to(np.eye(3), (8, 3, 3)), atol=1e-12)
        np.testing.assert_allclose(np.asarray(tc), 0.0, atol=1e-12)
        np.testing.assert_allclose(np.asarray(sc), 1.0, atol=1e-12)

    def test_exp_log_roundtrip(self):
        xi = jax.random.normal(jax.random.PRNGKey(14), (16, 7),
                               dtype=jnp.float64) * 0.7
        R, t, s = lie.sim3_exp(xi)
        xi2 = lie.sim3_log(R, t, s)
        np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=1e-6)

    def test_apply_scale(self):
        xi = jnp.zeros((7,), dtype=jnp.float64).at[6].set(jnp.log(2.0))
        R, t, s = lie.sim3_exp(xi)
        p = jnp.asarray([1.0, 2.0, 3.0])
        np.testing.assert_allclose(
            np.asarray(lie.sim3_apply(R, t, s, p)), [2.0, 4.0, 6.0], atol=1e-12)
