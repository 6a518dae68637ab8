"""Loop-closing component tests: Horn/Sim3 RANSAC, pose-graph optimization,
BoW vocabulary + keyframe database."""

import jax
import jax.numpy as jnp
import numpy as np

from vieo_slam_tpu.loop.keyframe_db import KeyFrameDatabase
from vieo_slam_tpu.loop.vocabulary import (
    score_l1, train_vocabulary, transform,
)
from vieo_slam_tpu.math import lie
from vieo_slam_tpu.solvers.pose_graph import (
    PoseGraphProblem, correct_landmarks, make_edge_measurements,
    optimize_pose_graph,
)
from vieo_slam_tpu.cameras import models as cm
from vieo_slam_tpu.solvers.sim3_solver import (
    horn_alignment, optimize_sim3, sim3_ransac,
)


class TestHorn:
    def test_exact_alignment(self):
        rng = np.random.RandomState(0)
        src = rng.randn(50, 3).astype(np.float32)
        R_true, t_true = lie.se3_exp(jnp.asarray(
            [0.2, -0.1, 0.3, 0.4, 0.1, -0.2], jnp.float32))
        s_true = 1.7
        dst = s_true * src @ np.asarray(R_true).T + np.asarray(t_true)
        R, t, s = horn_alignment(jnp.asarray(src), jnp.asarray(dst))
        np.testing.assert_allclose(np.asarray(R), np.asarray(R_true),
                                   atol=1e-5)
        np.testing.assert_allclose(float(s), s_true, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(t), np.asarray(t_true),
                                   atol=1e-5)

    def test_se3_mode(self):
        rng = np.random.RandomState(1)
        src = rng.randn(30, 3).astype(np.float32)
        R_true, t_true = lie.se3_exp(jnp.asarray(
            [0.1, 0.2, -0.1, -0.3, 0.2, 0.1], jnp.float32))
        dst = src @ np.asarray(R_true).T + np.asarray(t_true)
        R, t, s = horn_alignment(jnp.asarray(src), jnp.asarray(dst),
                                 with_scale=False)
        assert float(s) == 1.0
        np.testing.assert_allclose(np.asarray(R), np.asarray(R_true),
                                   atol=1e-5)

    def test_ransac_with_outliers(self):
        rng = np.random.RandomState(2)
        n = 120
        src = rng.randn(n, 3).astype(np.float32) * 2
        R_true, t_true = lie.se3_exp(jnp.asarray(
            [0.3, 0.1, -0.2, 1.0, -0.5, 0.3], jnp.float32))
        s_true = 0.8
        dst = s_true * src @ np.asarray(R_true).T + np.asarray(t_true)
        dst[:40] += rng.randn(40, 3) * 3.0      # 33% outliers
        dst += rng.randn(n, 3).astype(np.float32) * 0.01
        res = jax.jit(lambda a, b, v, k: sim3_ransac(
            a, b, v, k, inlier_thresh=0.08))(
            jnp.asarray(src), jnp.asarray(dst), jnp.ones(n, bool),
            jax.random.PRNGKey(0))
        assert int(res.n_inliers) > 70
        np.testing.assert_allclose(float(res.s), s_true, rtol=0.02)
        inl = np.asarray(res.inliers)
        assert inl[:40].mean() < 0.2 and inl[40:].mean() > 0.9


def ring_graph(K=12, drift=0.02, seed=0):
    """Ground-truth ring of poses; odometry edges with accumulated drift,
    plus one loop edge closing the ring."""
    rng = np.random.RandomState(seed)
    # ground truth: evenly spaced on a circle.
    ang = np.linspace(0, 2 * np.pi, K, endpoint=False)
    R_gt, t_gt = [], []
    for a in ang:
        R, t = lie.se3_exp(jnp.asarray(
            [np.cos(a) * 2, np.sin(a) * 2, 0, 0, 0, a], jnp.float32))
        R_gt.append(np.asarray(R)); t_gt.append(np.asarray(t))
    R_gt, t_gt = np.stack(R_gt), np.stack(t_gt)
    s_gt = np.ones(K, np.float32)
    # drifted estimates: accumulate noise along the chain.
    R_est, t_est = [R_gt[0]], [t_gt[0]]
    for k in range(1, K):
        dR = R_gt[k] @ R_gt[k - 1].T
        dt = t_gt[k] - dR @ t_gt[k - 1]
        noise = rng.randn(6).astype(np.float32) * drift
        nR, nt = lie.se3_exp(jnp.asarray(noise))
        R_est.append(np.asarray(nR) @ dR @ R_est[-1])
        t_est.append(np.asarray(nR) @ (dR @ t_est[-1] + dt) + np.asarray(nt))
    R_est, t_est = np.stack(R_est), np.stack(t_est)

    # edges: consecutive (from gt-free est at creation = drifted odometry),
    # plus loop edge K-1 -> 0 measured from GROUND TRUTH (the detected
    # loop constraint).
    ei = list(range(K - 1)) + [K - 1]
    ej = list(range(1, K)) + [0]
    eR, et, es = [], [], []
    for a, b in zip(ei[:-1], ej[:-1]):
        # odometry measurement from the (drifted) estimates
        Ri, ti = R_est[a], t_est[a]
        Rj, tj = R_est[b], t_est[b]
        Rji, tji, sji = lie.sim3_inverse(jnp.asarray(Rj), jnp.asarray(tj),
                                         jnp.asarray(1.0))
        Rm, tm, sm = lie.sim3_compose(jnp.asarray(Ri), jnp.asarray(ti),
                                      jnp.asarray(1.0), Rji, tji, sji)
        eR.append(np.asarray(Rm)); et.append(np.asarray(tm))
        es.append(float(sm))
    # loop edge from ground truth:
    Rji, tji, sji = lie.sim3_inverse(jnp.asarray(R_gt[0]),
                                     jnp.asarray(t_gt[0]), jnp.asarray(1.0))
    Rm, tm, sm = lie.sim3_compose(jnp.asarray(R_gt[K - 1]),
                                  jnp.asarray(t_gt[K - 1]), jnp.asarray(1.0),
                                  Rji, tji, sji)
    eR.append(np.asarray(Rm)); et.append(np.asarray(tm)); es.append(float(sm))

    prob = PoseGraphProblem(
        R=jnp.asarray(R_est), t=jnp.asarray(t_est),
        s=jnp.ones(K, jnp.float32),
        fixed=jnp.asarray([True] + [False] * (K - 1)),
        edge_i=jnp.asarray(ei, jnp.int32), edge_j=jnp.asarray(ej, jnp.int32),
        edge_R=jnp.asarray(np.stack(eR)), edge_t=jnp.asarray(np.stack(et)),
        edge_s=jnp.asarray(es, jnp.float32),
        edge_w=jnp.asarray([1.0] * (K - 1) + [5.0], jnp.float32),
    )
    return prob, R_gt, t_gt


class TestPoseGraph:
    def test_loop_correction(self):
        prob, R_gt, t_gt = ring_graph(K=12, drift=0.03)
        err0 = np.linalg.norm(np.asarray(prob.t) - t_gt, axis=1)
        out = jax.jit(lambda p: optimize_pose_graph(p, iters=25,
                                                    fix_scale=True))(prob)
        err1 = np.linalg.norm(np.asarray(out.t) - t_gt, axis=1)
        # Loop closes: end-of-chain error collapses.
        assert err1.max() < 0.5 * err0.max()
        assert err1.max() < 0.15
        # Scales pinned.
        np.testing.assert_allclose(np.asarray(out.s), 1.0, atol=1e-5)

    def test_zero_residual_graph_is_fixed_point(self):
        prob, _, _ = ring_graph(K=8, drift=0.0)
        out = optimize_pose_graph(prob, iters=5, fix_scale=True)
        np.testing.assert_allclose(np.asarray(out.t), np.asarray(prob.t),
                                   atol=1e-4)

    def test_landmark_correction(self):
        prob, R_gt, t_gt = ring_graph(K=10, drift=0.03)
        out = optimize_pose_graph(prob, iters=25, fix_scale=True)
        rng = np.random.RandomState(3)
        pw = rng.randn(40, 3).astype(np.float32)
        ref = rng.randint(0, 10, 40).astype(np.int32)
        pw2 = correct_landmarks(
            jnp.asarray(pw), jnp.asarray(ref),
            prob.R, prob.t, prob.s, out.R, out.t, out.s)
        # Landmarks move consistently with their ref KF corrections.
        assert np.isfinite(np.asarray(pw2)).all()
        moved = np.linalg.norm(np.asarray(pw2) - pw, axis=1)
        assert moved.max() > 1e-3  # something actually moved


class TestVocabulary:
    def _descs(self, n, seed=0):
        rng = np.random.RandomState(seed)
        return rng.randint(0, 2 ** 32, (n, 8), np.uint64).astype(np.uint32)

    def test_train_and_transform(self):
        desc = self._descs(2000)
        voc = train_vocabulary(desc, k=6, L=2, seed=1)
        assert voc.n_words == 36
        bow, words = transform(voc, jnp.asarray(desc[:100]),
                               jnp.ones(100, bool))
        assert float(jnp.sum(jnp.abs(bow))) > 0.99  # L1 normalized
        assert int(jnp.max(words)) < 36 and int(jnp.min(words)) >= 0

    def test_same_place_scores_high(self):
        """BoW separates places because the SAME landmarks (descriptors)
        recur when revisiting — each place activates a small distinct word
        subset. Model that: 40-descriptor pools per place."""
        desc = self._descs(3000, seed=2)
        voc = train_vocabulary(desc[:2000], k=8, L=2, seed=1)
        pool_a = desc[2000:2040]
        pool_b = desc[2040:2080]
        rng = np.random.RandomState(5)
        a = pool_a[rng.randint(0, 40, 200)]
        a2 = pool_a[rng.randint(0, 40, 200)].copy()
        for _ in range(3):  # matching noise on the revisit
            w = rng.randint(0, 8, len(a2))
            bit = rng.randint(0, 32, len(a2)).astype(np.uint32)
            a2[np.arange(len(a2)), w] ^= (np.uint32(1) << bit)
        b = pool_b[rng.randint(0, 40, 200)]
        val = jnp.ones(200, bool)
        bow_a, _ = transform(voc, jnp.asarray(a), val)
        bow_a2, _ = transform(voc, jnp.asarray(a2), val)
        bow_b, _ = transform(voc, jnp.asarray(b), val)
        s_same = float(score_l1(bow_a, bow_a2[None])[0])
        s_diff = float(score_l1(bow_a, bow_b[None])[0])
        assert s_same > s_diff + 0.15, (s_same, s_diff)

    def test_keyframe_db_candidates(self):
        desc = self._descs(4000, seed=3)
        voc = train_vocabulary(desc[:2000], k=8, L=2, seed=1)
        db = KeyFrameDatabase(voc.n_words, capacity=16)
        val = jnp.ones(200, bool)
        rng = np.random.RandomState(7)
        # 10 distinct places, each a 40-descriptor landmark pool.
        pools = [desc[2000 + 40 * k: 2040 + 40 * k] for k in range(10)]
        for k in range(10):
            d = pools[k][rng.randint(0, 40, 200)]
            bow, _ = transform(voc, jnp.asarray(d), val)
            db.add(k, np.asarray(bow))
        # Query: noisy revisit of place 2.
        d = pools[2][rng.randint(0, 40, 200)].copy()
        for _ in range(2):
            w = rng.randint(0, 8, len(d))
            bit = rng.randint(0, 32, len(d)).astype(np.uint32)
            d[np.arange(len(d)), w] ^= (np.uint32(1) << bit)
        bow_q, _ = transform(voc, jnp.asarray(d), val)
        cands = db.detect_loop_candidates(
            np.asarray(bow_q), query_kf=9,
            connected=np.asarray([8, 7]),
            covisible_of=lambda k: np.asarray([], int),
        )
        assert len(cands) and cands[0] == 2


class TestDbowTextInterop:
    def test_roundtrip_and_transform_equivalence(self, tmp_path):
        """save_dbow_text -> load_dbow_text reproduces the vocabulary
        exactly (DBoW2 TemplatedVocabulary text format,
        TemplatedVocabulary.h:1196/:1339) and transform() output is
        identical."""
        from vieo_slam_tpu.loop.vocabulary import (load_dbow_text,
                                                   save_dbow_text,
                                                   train_vocabulary,
                                                   transform)

        rng = np.random.RandomState(0)
        desc = rng.randint(0, 2 ** 32, (400, 8),
                           dtype=np.uint64).astype(np.uint32)
        voc = train_vocabulary(desc, k=4, L=3, seed=1)
        p = str(tmp_path / "voc.txt")
        save_dbow_text(voc, p)
        voc2 = load_dbow_text(p)
        assert voc2.k == voc.k and voc2.L == voc.L
        np.testing.assert_array_equal(voc2.node_desc, voc.node_desc)
        np.testing.assert_allclose(voc2.idf, voc.idf, rtol=1e-5)
        q = rng.randint(0, 2 ** 32, (32, 8),
                        dtype=np.uint64).astype(np.uint32)
        bow1, w1 = transform(voc, jnp.asarray(q), jnp.ones(32, bool))
        bow2, w2 = transform(voc2, jnp.asarray(q), jnp.ones(32, bool))
        np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))
        np.testing.assert_allclose(np.asarray(bow1), np.asarray(bow2),
                                   atol=1e-6)


class TestOptimizeSim3:
    """Reprojection-based Sim3 refinement (Optimizer::OptimizeSim3,
    src/Optimizer.cc:2689-2920)."""

    def _problem(self, s_true=1.0, n=128, n_out=20, seed=4):
        rng = np.random.RandomState(seed)
        cam = cm.make_pinhole(400.0, 400.0, 320.0, 240.0, 640, 480)
        R_true, t_true = lie.se3_exp(jnp.asarray(
            [0.05, -0.02, 0.08, 0.3, -0.2, 0.1], jnp.float32))
        R_true, t_true = np.asarray(R_true), np.asarray(t_true)
        p_k = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
                        rng.uniform(2.0, 8.0, n)], -1).astype(np.float32)
        p_c = (s_true * p_k @ R_true.T + t_true).astype(np.float32)
        uv_k = np.array(cm.project(cam, jnp.asarray(p_k)))
        uv_c = np.array(cm.project(cam, jnp.asarray(p_c)))
        uv_k += rng.randn(n, 2) * 0.3
        uv_c += rng.randn(n, 2) * 0.3
        # outliers: wrong associations
        uv_c[:n_out] += rng.randn(n_out, 2) * 60 + 20
        # seed estimate: perturbed truth (the RANSAC output role)
        dR, dt = lie.se3_exp(jnp.asarray(
            [0.02, 0.01, -0.015, 0.05, -0.04, 0.06], jnp.float32))
        R0 = np.asarray(dR) @ R_true
        t0 = np.asarray(dR) @ t_true * s_true + np.asarray(dt)
        return cam, (R_true, t_true), p_k, p_c, uv_k, uv_c, (R0, t0), n_out

    def test_refines_to_truth_fixed_scale(self):
        cam, (R_t, t_t), p_k, p_c, uv_k, uv_c, (R0, t0), n_out = \
            self._problem()
        n = len(p_k)
        ones = jnp.ones(n, jnp.float32)
        out = optimize_sim3(
            jnp.asarray(R0.astype(np.float32)),
            jnp.asarray(t0.astype(np.float32)), jnp.asarray(1.0),
            jnp.asarray(p_k), jnp.asarray(p_c), jnp.asarray(uv_k),
            jnp.asarray(uv_c), ones, ones, jnp.ones(n, bool), cam,
            fix_scale=True)
        assert float(out.s) == 1.0
        assert int(out.n_inliers) >= n - n_out - 8
        inl = np.asarray(out.inliers)
        assert inl[:n_out].mean() < 0.15          # outliers gated
        ang = np.degrees(np.linalg.norm(np.asarray(
            lie.so3_log(jnp.asarray(np.asarray(out.R) @ R_t.T)))))
        assert ang < 0.2, ang
        assert np.linalg.norm(np.asarray(out.t) - t_t) < 0.02

    def test_refines_scale(self):
        cam, (R_t, t_t), p_k, p_c, uv_k, uv_c, (R0, t0), n_out = \
            self._problem(s_true=1.25)
        n = len(p_k)
        ones = jnp.ones(n, jnp.float32)
        out = optimize_sim3(
            jnp.asarray(R0.astype(np.float32)),
            jnp.asarray(t0.astype(np.float32)), jnp.asarray(1.1),
            jnp.asarray(p_k), jnp.asarray(p_c), jnp.asarray(uv_k),
            jnp.asarray(uv_c), ones, ones, jnp.ones(n, bool), cam,
            fix_scale=False)
        np.testing.assert_allclose(float(out.s), 1.25, rtol=0.02)
        ang = np.degrees(np.linalg.norm(np.asarray(
            lie.so3_log(jnp.asarray(np.asarray(out.R) @ R_t.T)))))
        assert ang < 0.3, ang
