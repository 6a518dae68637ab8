"""Distributed BA tests on the virtual 8-device CPU mesh: numerical
equivalence of one landmark-sharded Schur step with the single-device
path, and end-to-end convergence (SURVEY.md §2.4 TPU mapping)."""

import jax
import jax.numpy as jnp
import numpy as np

from test_local_ba import make_world
from vieo_slam_tpu.parallel.dist_ba import (
    distributed_ba, distributed_ba_step, make_ba_mesh, shard_problem,
)
from vieo_slam_tpu.solvers.local_ba import _ba_iteration
from vieo_slam_tpu.math import lie


def _pad_problem_lms(prob, mult):
    """Pad landmark dim to a multiple of the mesh size."""
    M = prob.pw.shape[0]
    Mp = -(-M // mult) * mult
    pad = Mp - M

    def padlm(a, fill=0):
        w = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
        return jnp.asarray(np.pad(np.asarray(a), w, constant_values=fill))

    return prob._replace(
        pw=padlm(prob.pw), lm_valid=padlm(prob.lm_valid, False),
        obs_kf=padlm(prob.obs_kf, -1), obs_uv=padlm(prob.obs_uv),
        obs_ur=padlm(prob.obs_ur, -1.0),
        obs_inv_sigma2=padlm(prob.obs_inv_sigma2, 1.0),
        obs_valid=padlm(prob.obs_valid, False),
    )


class TestDistributedBA:
    def test_step_matches_single_device(self):
        cam, bf, prob, _ = make_world(K=4, M=40, O=3, noise=0.1)
        prob = _pad_problem_lms(prob, 8)
        mesh = make_ba_mesh()
        lam = jnp.asarray(1e-3, jnp.float32)
        active = prob.obs_valid
        bfj = jnp.asarray(bf, jnp.float32)
        R1, t1, p1 = _ba_iteration(prob.Rcw, prob.tcw, prob.pw, prob, cam,
                                   bfj, active, lam)
        sprob = shard_problem(prob, mesh)
        R2, t2, p2 = distributed_ba_step(sprob, cam, bfj,
                                         sprob.obs_valid, lam, mesh)
        np.testing.assert_allclose(np.asarray(R1), np.asarray(R2), atol=2e-5)
        np.testing.assert_allclose(np.asarray(t1), np.asarray(t2), atol=2e-4)
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=2e-4)

    def test_converges(self):
        cam, bf, prob, (R_t, t_t, pw_t) = make_world(K=5, M=64, O=5,
                                                     noise=0.1)
        rng = np.random.RandomState(5)
        dx = np.zeros((5, 6), np.float32)
        dx[1:] = rng.randn(4, 6) * 0.01
        dRs, dts = lie.se3_exp(jnp.asarray(dx))
        prob = prob._replace(
            Rcw=dRs @ prob.Rcw,
            tcw=jnp.einsum("kij,kj->ki", dRs, prob.tcw) + dts,
            pw=prob.pw + 0.03 * rng.randn(64, 3).astype(np.float32),
        )
        prob = _pad_problem_lms(prob, 8)
        mesh = make_ba_mesh()
        Rf, tf, pf = distributed_ba(prob, cam, jnp.asarray(bf, jnp.float32),
                                    mesh, iters=12)
        for k in range(1, 5):
            dR = np.asarray(Rf[k]) @ R_t[k].T
            ang = np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))
            assert ang < 1e-2, k
            assert np.linalg.norm(np.asarray(tf[k]) - t_t[k]) < 5e-2, k
        err = np.linalg.norm(np.asarray(pf)[:64] - pw_t, axis=1)
        assert np.median(err) < 6e-2


class TestPairfillModes:
    def test_scatter_matches_onehot(self):
        """The segment_sum Schur fill (large-K branch) must produce the
        same distributed step as the one-hot MXU fill."""
        from vieo_slam_tpu.parallel import dist_ba as dba
        cam, bf, prob, _ = make_world(K=6, M=48, O=4, noise=0.1)
        mesh = make_ba_mesh()
        args = (prob, cam, jnp.asarray(bf, jnp.float32),
                prob.obs_valid, 1e-3, mesh)
        try:
            dba.PAIRFILL_MODE = "onehot"
            ref = [np.asarray(x) for x in distributed_ba_step(*args)]
            dba.PAIRFILL_MODE = "scatter"
            got = [np.asarray(x) for x in distributed_ba_step(*args)]
        finally:
            dba.PAIRFILL_MODE = "auto"
        for g, r, tol in zip(got, ref, (1e-5, 1e-4, 1e-4)):
            np.testing.assert_allclose(g, r, atol=tol)
