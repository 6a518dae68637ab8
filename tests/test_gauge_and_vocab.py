"""Unit tests for the NavState gauge-correction carry and the ORBvoc
text loader's padded-branch path (VERDICT r2 weak #6/#7)."""

import numpy as np

from vieo_slam_tpu.map.map_state import MapConfig, MapState


def _mk_map(n_kf=4):
    m = MapState(MapConfig(max_keyframes=16, max_landmarks=64, max_kp=8))
    rng = np.random.RandomState(0)
    for i in range(n_kf):
        th = 0.3 * i
        Rcw = np.asarray([[np.cos(th), -np.sin(th), 0],
                          [np.sin(th), np.cos(th), 0],
                          [0, 0, 1]], np.float32)
        N = 8
        m.add_keyframe(
            Rcw=Rcw, tcw=rng.randn(3).astype(np.float32),
            timestamp=0.1 * i, frame_id=i,
            uv=np.zeros((N, 2), np.float32), level=np.zeros(N, np.int32),
            desc=np.zeros((N, 8), np.uint32),
            ur=np.full(N, -1.0, np.float32),
            depth=np.full(N, -1.0, np.float32),
            kp_valid=np.zeros(N, bool), lm_idx=np.full(N, -1, np.int32))
        m.kf_vwb[i] = rng.randn(3).astype(np.float32)
        m.kf_Rwb[i] = Rcw.T           # body == camera
        m.kf_pwb[i] = rng.randn(3).astype(np.float32)
    return m


class TestGaugeCorrection:
    def test_velocity_rotates_with_pose(self):
        """CorrectLoop-style rewrite: rotating every camera pose by Rg
        about the world must rotate world-frame velocities by the SAME
        Rg (the reference updates NavStates alongside poses,
        LoopClosing.cc:535-627)."""
        m = _mk_map()
        kfs = m.keyframe_ids()
        ang = 0.5
        Rg = np.asarray([[np.cos(ang), -np.sin(ang), 0],
                         [np.sin(ang), np.cos(ang), 0],
                         [0, 0, 1]], np.float32)
        tg = np.asarray([1.0, -2.0, 0.5], np.float32)
        v_before = m.kf_vwb[kfs].copy()
        p_before = m.kf_pwb[kfs].copy()
        R_old = m.kf_Rcw[kfs].copy()
        t_old = m.kf_tcw[kfs].copy()
        # world gauge change: p' = Rg p + tg  =>  Tcw' = Tcw ∘ Tg^-1
        m.kf_Rcw[kfs] = np.einsum("kij,lj->kil", R_old, Rg)
        m.kf_tcw[kfs] = t_old - np.einsum(
            "kij,j->ki", m.kf_Rcw[kfs], tg)
        m.apply_gauge_correction(kfs, R_old, t_old)
        np.testing.assert_allclose(
            m.kf_vwb[kfs], v_before @ Rg.T, atol=1e-5)
        np.testing.assert_allclose(
            m.kf_pwb[kfs], p_before @ Rg.T + tg, atol=1e-4)

    def test_identity_rewrite_is_noop(self):
        m = _mk_map()
        kfs = m.keyframe_ids()
        v = m.kf_vwb[kfs].copy()
        R_old = m.kf_Rcw[kfs].copy()
        t_old = m.kf_tcw[kfs].copy()
        m.apply_gauge_correction(kfs, R_old, t_old)
        np.testing.assert_allclose(m.kf_vwb[kfs], v, atol=1e-7)


class TestCorrectionComposition:
    """A long background GBA can finish after a loop-closure correction
    within ONE frame gap: the tracker then receives two push_correction
    calls before its next _apply_pending_correction. The composed
    pending correction must equal applying the two events one frame
    apart (the bounded-by-composition claim in the async design)."""

    @staticmethod
    def _rand_pose(rng):
        import jax.numpy as jnp

        from vieo_slam_tpu.math.lie import se3_exp
        R, t = se3_exp(jnp.asarray(rng.randn(6) * 0.2, jnp.float32))
        return np.asarray(R), np.asarray(t)

    def _tracker(self):
        from vieo_slam_tpu.cameras import models as cm
        from vieo_slam_tpu.frontend.tracking import Tracker, TrackerConfig
        cam = cm.make_pinhole(400.0, 400.0, 320.0, 240.0, 640, 480)
        m = MapState(MapConfig(max_keyframes=8, max_landmarks=32,
                               max_kp=8))
        return Tracker(cam, 80.0, m, TrackerConfig())

    def test_double_rebase_composes(self):
        rng = np.random.RandomState(2)
        tr = self._tracker()
        R0, t0 = self._rand_pose(rng)
        # The same keyframe moves a -> b (loop correction), then b -> c
        # (GBA write-back) before the tracker sees either.
        Ra, ta = self._rand_pose(rng)
        Rb, tb = self._rand_pose(rng)
        Rc, tc = self._rand_pose(rng)

        tr.Rcw, tr.tcw = R0.copy(), t0.copy()
        tr.push_correction(Ra, ta, Rb, tb)
        tr._apply_pending_correction()
        tr.push_correction(Rb, tb, Rc, tc)
        tr._apply_pending_correction()
        R_seq, t_seq = tr.Rcw.copy(), tr.tcw.copy()

        tr.Rcw, tr.tcw = R0.copy(), t0.copy()
        tr.pending_correction = None
        tr.push_correction(Ra, ta, Rb, tb)
        tr.push_correction(Rb, tb, Rc, tc)
        tr._apply_pending_correction()
        np.testing.assert_allclose(tr.Rcw, R_seq, atol=1e-5)
        np.testing.assert_allclose(tr.tcw, t_seq, atol=1e-5)

    def test_rebase_preserves_relative_pose(self):
        """After the composed a->c rebase, the frame's pose relative to
        the corrected keyframe is what it was relative to the
        uncorrected one — the invariant the reference's bMapUpdated
        re-anchoring protects (Tracking.cc:983-990)."""
        rng = np.random.RandomState(5)
        tr = self._tracker()
        R0, t0 = self._rand_pose(rng)
        Ra, ta = self._rand_pose(rng)
        Rb, tb = self._rand_pose(rng)
        Rc, tc = self._rand_pose(rng)
        rel_R = R0 @ Ra.T
        rel_t = t0 - rel_R @ ta

        tr.Rcw, tr.tcw = R0.copy(), t0.copy()
        tr.push_correction(Ra, ta, Rb, tb)
        tr.push_correction(Rb, tb, Rc, tc)
        tr._apply_pending_correction()
        rel_R2 = tr.Rcw @ Rc.T
        rel_t2 = tr.tcw - rel_R2 @ tc
        np.testing.assert_allclose(rel_R2, rel_R, atol=1e-5)
        np.testing.assert_allclose(rel_t2, rel_t, atol=1e-5)


class TestVocabPaddedBranches:
    def test_randomized_incomplete_tree_roundtrip(self, tmp_path):
        """A large randomized DBoW2 text file with INCOMPLETE branches
        (internal nodes with fewer than k children, like the real
        ORBvoc) must load into the dense layout and transform
        descriptors without touching padded children."""
        import jax.numpy as jnp

        from vieo_slam_tpu.loop.vocabulary import load_dbow_text, transform

        rng = np.random.RandomState(5)
        k, L = 4, 3
        path = str(tmp_path / "voc.txt")
        lines = [f"{k} {L} 0 0"]
        next_id = 1
        # root children (level 1): only 3 of 4 present
        frontier = []
        for _ in range(3):
            d = rng.randint(0, 256, 32)
            lines.append("0 0 " + " ".join(map(str, d)) + " 0")
            frontier.append((next_id, 1))
            next_id += 1
        leaves = 0
        while frontier:
            pid, lv = frontier.pop(0)
            if lv == L:
                continue
            n_kids = rng.randint(2, k + 1)    # incomplete branches
            for _ in range(n_kids):
                d = rng.randint(0, 256, 32)
                is_leaf = int(lv + 1 == L)
                w = round(float(rng.rand() + 0.1), 4) if is_leaf else 0.0
                lines.append(f"{pid} {is_leaf} "
                             + " ".join(map(str, d)) + f" {w}")
                if is_leaf:
                    leaves += 1
                else:
                    frontier.append((next_id, lv + 1))
                next_id += 1
        with open(path, "w") as f:
            f.write("\n".join(lines) + "\n")

        voc = load_dbow_text(path)
        assert voc.k == k and voc.L == L
        # transform random descriptors: finite BoW, words land only on
        # real (weighted) leaves
        desc = rng.randint(0, 2 ** 32, (64, 8),
                           np.uint64).astype(np.uint32)
        bow, words = transform(voc, jnp.asarray(desc),
                               jnp.ones(64, bool))
        bow = np.asarray(bow)
        words = np.asarray(words)
        assert np.isfinite(bow).all()
        assert bow.sum() > 0
        # all assigned words carry nonzero idf (never a padded child)
        idf = np.asarray(voc.idf)
        assert (idf[words] > 0).all(), words[idf[words] <= 0][:10]


class TestVocabBinaryFormat:
    def _random_tree(self, rng, k, L):
        """(parents, is_leaf, desc[32 bytes], weight) rows of a random
        incomplete DBoW2 tree, file-id order (ids 1..n, root 0)."""
        rows = []
        next_id = 1
        frontier = []
        for _ in range(3):                      # incomplete root: 3 of k
            rows.append((0, 0, rng.randint(0, 256, 32), 0.0))
            frontier.append((next_id, 1))
            next_id += 1
        while frontier:
            pid, lv = frontier.pop(0)
            if lv == L:
                continue
            for _ in range(rng.randint(2, k + 1)):
                is_leaf = int(lv + 1 == L)
                w = round(float(rng.rand() + 0.1), 4) if is_leaf else 0.0
                rows.append((pid, is_leaf, rng.randint(0, 256, 32), w))
                if not is_leaf:
                    frontier.append((next_id, lv + 1))
                next_id += 1
        return rows

    def test_binary_matches_text_loader(self, tmp_path):
        """The same incomplete tree serialized as ORBvoc text and as
        ORBvoc.bin must load to identical dense vocabularies
        (TemplatedVocabulary.h:1275 record layout)."""
        import struct

        from vieo_slam_tpu.loop.vocabulary import (load_dbow_binary,
                                                   load_dbow_text)

        rng = np.random.RandomState(11)
        k, L = 4, 3
        rows = self._random_tree(rng, k, L)

        tpath = str(tmp_path / "voc.txt")
        with open(tpath, "w") as f:
            f.write(f"{k} {L} 0 0\n")
            for pid, leaf, d, w in rows:
                f.write(f"{pid} {leaf} " + " ".join(map(str, d))
                        + f" {w}\n")

        bpath = str(tmp_path / "voc.bin")
        with open(bpath, "wb") as f:
            f.write(struct.pack("<IIiiii", len(rows) + 1, 41, k, L, 0, 0))
            for pid, leaf, d, w in rows:
                f.write(struct.pack("<i", pid)
                        + bytes(d.tolist())
                        + struct.pack("<f", w)
                        + struct.pack("<?", bool(leaf)))

        vt = load_dbow_text(tpath)
        vb = load_dbow_binary(bpath)
        assert vb.k == vt.k and vb.L == vt.L
        np.testing.assert_array_equal(vb.node_desc, vt.node_desc)
        np.testing.assert_allclose(vb.idf, vt.idf, rtol=1e-6)

    def test_binary_roundtrip(self, tmp_path):
        """save_dbow_binary -> load_dbow_binary reproduces a trained
        vocabulary exactly (dense trees are complete, so no padding is
        involved and equality is bit-for-bit)."""
        from vieo_slam_tpu.loop.vocabulary import (load_dbow_binary,
                                                   save_dbow_binary,
                                                   train_vocabulary)

        rng = np.random.RandomState(3)
        desc = rng.randint(0, 2 ** 32, (400, 8), np.uint64) \
            .astype(np.uint32)
        voc = train_vocabulary(desc, k=3, L=3, seed=0, iters=3)
        p = str(tmp_path / "voc.bin")
        save_dbow_binary(voc, p)
        voc2 = load_dbow_binary(p)
        assert (voc2.k, voc2.L) == (voc.k, voc.L)
        np.testing.assert_array_equal(voc2.node_desc, voc.node_desc)
        np.testing.assert_allclose(voc2.idf, voc.idf, rtol=1e-6)
