"""Local/global BA tests: Schur solve vs dense reference on a tiny problem,
convergence from perturbation, fixed-pose invariants, outlier gating."""

import jax
import jax.numpy as jnp
import numpy as np

from vieo_slam_tpu.cameras import models as cm
from vieo_slam_tpu.math import lie
from vieo_slam_tpu.solvers.local_ba import (
    BAProblem, _ba_iteration, _obs_terms, local_ba,
)


def make_world(seed=0, K=5, M=60, O=5, noise=0.15, stereo=False):
    """K poses on an arc observing M landmarks; every landmark seen by O
    consecutive poses."""
    rng = np.random.RandomState(seed)
    cam = cm.make_pinhole(400.0, 400.0, 320.0, 240.0, 640, 480)
    bf = 400.0 * 0.1
    pw = rng.randn(M, 3).astype(np.float32) * [3.0, 2.0, 1.5] + [0, 0, 8.0]
    Rs, ts = [], []
    for k in range(K):
        xi = np.array([0.15 * k, 0.0, 0.0, 0.0, 0.02 * k, 0.0], np.float32)
        R, t = lie.se3_exp(jnp.asarray(xi))
        Rs.append(np.asarray(R)); ts.append(np.asarray(t))
    Rcw = np.stack(Rs); tcw = np.stack(ts)

    obs_kf = np.full((M, O), -1, np.int32)
    obs_uv = np.zeros((M, O, 2), np.float32)
    obs_ur = np.full((M, O), -1.0, np.float32)
    obs_valid = np.zeros((M, O), bool)
    for m in range(M):
        k0 = rng.randint(0, max(K - O + 1, 1))
        for o in range(O):
            k = min(k0 + o, K - 1)
            pc = Rcw[k] @ pw[m] + tcw[k]
            if pc[2] < 0.5:
                continue
            uv = np.array(cm.project(cam, jnp.asarray(pc)))
            if not (0 <= uv[0] < 640 and 0 <= uv[1] < 480):
                continue
            obs_kf[m, o] = k
            obs_uv[m, o] = uv + rng.randn(2) * noise
            obs_valid[m, o] = True
            if stereo:
                obs_ur[m, o] = uv[0] - bf / pc[2] + rng.randn() * noise
    prob = BAProblem(
        Rcw=jnp.asarray(Rcw), tcw=jnp.asarray(tcw),
        fixed=jnp.asarray([True] + [False] * (K - 1)),
        pw=jnp.asarray(pw), lm_valid=jnp.ones(M, bool),
        obs_kf=jnp.asarray(obs_kf), obs_uv=jnp.asarray(obs_uv),
        obs_ur=jnp.asarray(obs_ur),
        obs_inv_sigma2=jnp.ones((M, O), jnp.float32),
        obs_valid=jnp.asarray(obs_valid),
    )
    return cam, bf, prob, (Rcw, tcw, pw)


def dense_gn_step(prob, cam, bf, lam):
    """Brute-force damped GN step building the FULL (6K + 3M) system in
    numpy — ground truth for the Schur-complement implementation."""
    r, Jp, Jl, chi2, delta2, depth_ok = [
        np.asarray(x) for x in _obs_terms(
            prob.Rcw, prob.tcw, prob.pw, prob, cam,
            jnp.asarray(bf, jnp.float32))
    ]
    K = prob.Rcw.shape[0]
    M = prob.pw.shape[0]
    use = np.asarray(prob.obs_valid) & depth_ok & (np.asarray(prob.obs_kf) >= 0)
    w = np.where(use, np.asarray(prob.obs_inv_sigma2), 0.0)
    # Huber weights at current point.
    from vieo_slam_tpu.solvers.lm import huber_weight
    w = w * np.asarray(huber_weight(jnp.asarray(chi2), jnp.asarray(delta2)))
    free = ~np.asarray(prob.fixed)

    D = 6 * K + 3 * M
    H = np.zeros((D, D)); b = np.zeros(D)
    for m in range(M):
        for o in range(prob.obs_kf.shape[1]):
            if w[m, o] == 0:
                continue
            k = int(prob.obs_kf[m, o])
            Jpo = Jp[m, o] * free[k]          # drop fixed-pose Jacobian
            Jlo = Jl[m, o]
            ro = r[m, o]
            pi, li = 6 * k, 6 * K + 3 * m
            H[pi:pi+6, pi:pi+6] += w[m, o] * Jpo.T @ Jpo
            H[li:li+3, li:li+3] += w[m, o] * Jlo.T @ Jlo
            H[pi:pi+6, li:li+3] += w[m, o] * Jpo.T @ Jlo
            H[li:li+3, pi:pi+6] += w[m, o] * Jlo.T @ Jpo
            b[pi:pi+6] += -w[m, o] * Jpo.T @ ro
            b[li:li+3] += -w[m, o] * Jlo.T @ ro
    H += lam * np.diag(np.maximum(np.diag(H), 1e-10))
    # Fixed poses and empty rows -> identity.
    for k in range(K):
        if not free[k]:
            sl = slice(6 * k, 6 * k + 6)
            H[sl, :] = 0; H[:, sl] = 0; H[sl, sl] = np.eye(6); b[sl] = 0
    for m in range(M):
        sl = slice(6 * K + 3 * m, 6 * K + 3 * m + 3)
        if np.abs(H[sl, sl]).max() == 0:
            H[sl, sl] = np.eye(3)
    dx = np.linalg.solve(H, b)
    return dx[:6 * K].reshape(K, 6), dx[6 * K:].reshape(M, 3)


class TestSchurAlgebra:
    def test_step_matches_dense_reference(self):
        cam, bf, prob, _ = make_world(K=4, M=25, O=3, noise=0.0)
        # Perturb so the step is non-trivial.
        dx = np.zeros((4, 6), np.float32)
        dx[1:] = np.random.RandomState(1).randn(3, 6) * 0.02
        dRs, dts = lie.se3_exp(jnp.asarray(dx))
        prob = prob._replace(
            Rcw=dRs @ prob.Rcw,
            tcw=jnp.einsum("kij,kj->ki", dRs, prob.tcw) + dts,
            pw=prob.pw + 0.03 * np.random.RandomState(2).randn(25, 3)
            .astype(np.float32),
        )
        lam = 1e-3
        Rn, tn, pn = _ba_iteration(
            prob.Rcw, prob.tcw, prob.pw, prob, cam,
            jnp.asarray(bf, jnp.float32),
            jnp.ones_like(prob.obs_valid), jnp.asarray(lam, jnp.float32))
        dp_ref, dl_ref = dense_gn_step(prob, cam, bf, lam)
        dR_ref, dt_ref = lie.se3_exp(jnp.asarray(dp_ref, jnp.float32))
        Rn_ref = np.asarray(dR_ref @ prob.Rcw)
        tn_ref = np.asarray(
            jnp.einsum("kij,kj->ki", dR_ref, prob.tcw) + dt_ref)
        np.testing.assert_allclose(np.asarray(Rn), Rn_ref, atol=2e-4)
        np.testing.assert_allclose(np.asarray(tn), tn_ref, atol=2e-3)
        np.testing.assert_allclose(np.asarray(pn), np.asarray(prob.pw)
                                   + dl_ref, atol=2e-3)


class TestOnehotReduction:
    def test_onehot_matches_scatter(self):
        """The TPU one-hot MXU reduction path must produce the same step
        as the segment_sum path (exercised here on CPU via the override
        knob; on TPU `auto` picks one-hot for K<=64)."""
        from vieo_slam_tpu.solvers import local_ba as lba
        cam, bf, prob, _ = make_world(K=6, M=40, O=4, noise=0.1,
                                      stereo=True)
        rng = np.random.RandomState(7)
        prob = prob._replace(
            pw=prob.pw + 0.04 * rng.randn(40, 3).astype(np.float32))
        args = (prob.Rcw, prob.tcw, prob.pw, prob, cam,
                jnp.asarray(bf, jnp.float32),
                jnp.ones_like(prob.obs_valid),
                jnp.asarray(1e-3, jnp.float32))
        try:
            lba.ONEHOT_MODE = "off"
            ref = [np.asarray(x) for x in _ba_iteration(*args)]
            lba.ONEHOT_MODE = "on"
            got = [np.asarray(x) for x in _ba_iteration(*args)]
        finally:
            lba.ONEHOT_MODE = "auto"
        for g, r_, tol in zip(got, ref, (1e-5, 1e-4, 1e-4)):
            np.testing.assert_allclose(g, r_, atol=tol)


class TestLocalBA:
    def test_converges_from_perturbation(self):
        cam, bf, prob, (R_t, t_t, pw_t) = make_world(K=5, M=60, O=5,
                                                     noise=0.1)
        rng = np.random.RandomState(3)
        dx = np.zeros((5, 6), np.float32)
        dx[1:] = rng.randn(4, 6) * 0.02
        dRs, dts = lie.se3_exp(jnp.asarray(dx))
        prob_pert = prob._replace(
            Rcw=dRs @ prob.Rcw,
            tcw=jnp.einsum("kij,kj->ki", dRs, prob.tcw) + dts,
            pw=prob.pw + 0.05 * rng.randn(60, 3).astype(np.float32),
        )
        res = jax.jit(lambda p: local_ba(p, cam, bf))(prob_pert)
        # Free poses return close to ground truth.
        for k in range(1, 5):
            dR = np.asarray(res.Rcw[k]) @ R_t[k].T
            ang = np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))
            assert ang < 5e-3, k
            assert np.linalg.norm(np.asarray(res.tcw[k]) - t_t[k]) < 2e-2, k
        # Landmarks return to the triangulation noise floor
        # (~depth^2 / (f * baseline) * sigma_px ~ 0.03-0.05 m here).
        err = np.linalg.norm(np.asarray(res.pw) - pw_t, axis=1)
        assert np.median(err) < 6e-2
        # And BA improved over the injected 0.05-sigma perturbation.
        err0 = np.linalg.norm(np.asarray(prob_pert.pw) - pw_t, axis=1)
        assert np.median(err) < np.median(err0)

    def test_fixed_pose_unchanged(self):
        cam, bf, prob, _ = make_world()
        res = local_ba(prob, cam, bf)
        np.testing.assert_array_equal(np.asarray(res.Rcw[0]),
                                      np.asarray(prob.Rcw[0]))
        np.testing.assert_array_equal(np.asarray(res.tcw[0]),
                                      np.asarray(prob.tcw[0]))

    def test_outlier_observations_disabled(self):
        cam, bf, prob, truth = make_world(K=5, M=60, O=5, noise=0.1)
        # Corrupt ONE observation per landmark for the first 12 landmarks —
        # inconsistent with the rest, so it must be classified out (a whole
        # consistently-shifted landmark would just be re-triangulated).
        uv = np.array(prob.obs_uv)
        corrupted = []
        val = np.asarray(prob.obs_valid)
        for m in range(12):
            os_ = np.nonzero(val[m])[0]
            if len(os_) >= 3:
                uv[m, os_[0]] += 60.0
                corrupted.append((m, os_[0]))
        prob = prob._replace(obs_uv=jnp.asarray(uv))
        res = local_ba(prob, cam, bf)
        inl = np.asarray(res.obs_inlier)
        bad_kept = np.mean([inl[m, o] for m, o in corrupted])
        assert bad_kept < 0.2
        assert inl[12:][val[12:]].mean() > 0.9

    def test_stereo(self):
        cam, bf, prob, (R_t, t_t, pw_t) = make_world(noise=0.1, stereo=True)
        rng = np.random.RandomState(4)
        prob_pert = prob._replace(
            pw=prob.pw + 0.05 * rng.randn(*prob.pw.shape).astype(np.float32))
        res = local_ba(prob_pert, cam, bf)
        err = np.linalg.norm(np.asarray(res.pw) - pw_t, axis=1)
        assert np.median(err) < 2e-2


class TestMovingObjectRefit:
    def test_refit_chi2_separates_moving_from_static(self):
        """landmark_refit_chi2: a static landmark with a STALE position
        refits to ~sub-pixel residuals; a MOVING landmark (different true
        position per observing keyframe) admits no single static point,
        so its refit median chi2 stays large — the pre-GBA moving-object
        cull's discriminator."""
        from vieo_slam_tpu.solvers.local_ba import landmark_refit_chi2

        rng = np.random.RandomState(0)
        cam = cm.make_pinhole(400.0, 400.0, 320.0, 240.0, 640, 480)
        K, M, O = 8, 64, 6
        ang = np.linspace(0, np.pi / 2, K)
        twc = np.stack([2 * np.cos(ang), 2 * np.sin(ang),
                        np.zeros(K)], -1)
        fwd = -twc / np.linalg.norm(twc, axis=-1, keepdims=True)
        up = np.tile([0.0, 0.0, -1.0], (K, 1))
        right = np.cross(fwd, up)
        down = np.cross(fwd, right)
        Rwc = np.stack([right, down, fwd], -1)
        Rcw = np.swapaxes(Rwc, -1, -2)
        tcw = -np.einsum("kij,kj->ki", Rcw, twc)
        pw = (rng.rand(M, 3) - 0.5) * np.asarray([2.0, 2.0, 1.0])
        moving = np.zeros(M, bool)
        moving[: M // 4] = True
        obs_kf = np.stack([rng.permutation(K)[:O] for _ in range(M)])
        uv = np.zeros((M, O, 2), np.float32)
        for m_i in range(M):
            for o in range(O):
                k = obs_kf[m_i, o]
                p = pw[m_i].copy()
                if moving[m_i]:
                    # 0.3 m excursion, different at each observation
                    p = p + 0.3 * rng.randn(3)
                pc = Rcw[k] @ p + tcw[k]
                uv[m_i, o] = np.asarray(cm.project(
                    cam, jnp.asarray(pc.astype(np.float32))))
        prob = BAProblem(
            Rcw=jnp.asarray(Rcw.astype(np.float32)),
            tcw=jnp.asarray(tcw.astype(np.float32)),
            fixed=jnp.asarray([True] + [False] * (K - 1)),
            # stale positions: static landmarks must REFIT clean
            pw=jnp.asarray((pw + 0.05 * rng.randn(M, 3)).astype(
                np.float32)),
            lm_valid=jnp.ones(M, bool),
            obs_kf=jnp.asarray(obs_kf.astype(np.int32)),
            obs_uv=jnp.asarray(uv),
            obs_ur=jnp.full((M, O), -1.0, jnp.float32),
            obs_inv_sigma2=jnp.ones((M, O), jnp.float32),
            obs_valid=jnp.ones((M, O), bool),
        )
        med, n_obs = landmark_refit_chi2(
            prob, cam, jnp.asarray(80.0, jnp.float32))
        med = np.asarray(med)
        assert (n_obs == O).all()
        # every static landmark refits below the cull threshold
        assert med[~moving].max() < 20.0, med[~moving].max()
        # the vast majority of movers exceed it
        frac = (med[moving] > 20.0).mean()
        assert frac > 0.85, (frac, np.sort(med[moving])[:5])
