"""ORB frontend tests: FAST detection on synthetic corners, descriptor
matching under shift/rotation, stereo row matching (SURVEY.md §4 test
pyramid: numerical unit tests per kernel)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from vieo_slam_tpu.ops import orb
from vieo_slam_tpu.ops import matching


def square_grid(h=240, w=320, sq=24, gap=12, lo=20.0, hi=220.0):
    """Isolated bright squares on dark background: corners are L-junctions
    (FAST-9 fires on L-corners; ideal checkerboard X-junctions it does not)."""
    img = np.full((h, w), lo, np.float32)
    for y0 in range(gap, h - sq, sq + gap):
        for x0 in range(gap, w - sq, sq + gap):
            img[y0:y0 + sq, x0:x0 + sq] = hi
    return img


def textured_image(h=240, w=320, seed=0):
    """Smooth random texture with strong blob corners (detectable, matchable)."""
    rng = np.random.RandomState(seed)
    img = rng.rand(h // 8, w // 8).astype(np.float32)
    img = np.asarray(jax.image.resize(jnp.asarray(img), (h, w), "bilinear"))
    img = img * 120.0 + 60.0
    # Sprinkle high-contrast dots.
    for _ in range(150):
        y, x = rng.randint(20, h - 20), rng.randint(20, w - 20)
        img[y - 2:y + 3, x - 2:x + 3] = 255.0 if rng.rand() > 0.5 else 5.0
    return img


CFG = orb.OrbConfig(n_features=300, n_levels=4, fast_threshold=20.0,
                    fast_min_threshold=7.0)


class TestFast:
    def test_detects_square_corners(self):
        img = jnp.asarray(square_grid())
        score = orb.nms3(orb.fast_score_map(img, 20.0))
        ys, xs = np.nonzero(np.asarray(score) > 0)
        # 8x6 squares x 4 corners each.
        assert len(ys) >= 100
        # Every detection sits on a square corner (within 2 px).
        period = 24 + 12
        off_y = (ys - 12) % period
        off_x = (xs - 12) % period
        near = np.minimum(off_y, np.abs(off_y - 23)) <= 2
        near &= np.minimum(off_x, np.abs(off_x - 23)) <= 2
        assert near.mean() > 0.95

    def test_flat_image_no_corners(self):
        img = jnp.full((120, 160), 128.0)
        score = orb.fast_score_map(img, 20.0)
        assert float(score.max()) == 0.0

    def test_nms_keeps_local_maxima_only(self):
        img = jnp.asarray(textured_image())
        raw = orb.fast_score_map(img, 20.0)
        nm = orb.nms3(raw)
        s = np.asarray(nm)
        ys, xs = np.nonzero(s[3:-3, 3:-3] > 0)
        r = np.asarray(raw)
        for y, x in list(zip(ys + 3, xs + 3))[:100]:
            assert r[y, x] >= r[y - 1:y + 2, x - 1:x + 2].max() - 1e-5


class TestExtract:
    def test_shapes_and_capacity(self):
        img = jnp.asarray(textured_image())
        feats = jax.jit(lambda im: orb.extract_orb(im, CFG))(img)
        N = CFG.n_features
        assert feats.uv.shape == (N, 2)
        assert feats.desc.shape == (N, orb.DESC_WORDS)
        assert feats.desc.dtype == jnp.uint32
        assert int(feats.n) > 100

    def test_keypoints_at_level0_coords(self):
        img = jnp.asarray(textured_image())
        feats = orb.extract_orb(img, CFG)
        uv = np.asarray(feats.uv)[np.asarray(feats.valid)]
        assert uv[:, 0].max() < 320 and uv[:, 1].max() < 240
        assert uv.min() >= 0

    def test_shift_matching(self):
        """Descriptors of a shifted image match back to the original with
        consistent displacement — the core frontend quality gate."""
        base = textured_image(seed=1)
        dx, dy = 7, 4
        shifted = np.roll(np.roll(base, dy, axis=0), dx, axis=1)
        f0 = orb.extract_orb(jnp.asarray(base), CFG)
        f1 = orb.extract_orb(jnp.asarray(shifted), CFG)
        idx, dist = matching.match_descriptors(
            f0.desc, f1.desc, f0.valid, f1.valid,
            max_dist=60, ratio=0.9, angle_a=f0.angle, angle_b=f1.angle)
        idx = np.asarray(idx)
        m = idx >= 0
        assert m.sum() > 30
        duv = np.asarray(f1.uv)[idx[m]] - np.asarray(f0.uv)[m]
        med = np.median(duv, axis=0)
        # Median displacement recovers the shift (level-0 keypoints).
        np.testing.assert_allclose(med, [dx, dy], atol=1.5)
        inliers = (np.abs(duv - [dx, dy]) < 2.0).all(axis=1)
        assert inliers.mean() > 0.7

    def test_rotation_consistency(self):
        """90-degree rotated image still matches >30% via rBRIEF rotation
        invariance."""
        base = textured_image(seed=2)
        rot = np.rot90(base).copy()
        f0 = orb.extract_orb(jnp.asarray(base), CFG)
        f1 = orb.extract_orb(jnp.asarray(rot), CFG)
        idx, _ = matching.match_descriptors(
            f0.desc, f1.desc, f0.valid, f1.valid, max_dist=64, ratio=0.95)
        idx = np.asarray(idx)
        m = idx >= 0
        # Verify matched pairs actually correspond: (x, y) -> (y, W-1-x).
        uv0 = np.asarray(f0.uv)[m]
        uv1 = np.asarray(f1.uv)[idx[m]]
        expect = np.stack([uv0[:, 1], base.shape[1] - 1 - uv0[:, 0]], -1)
        good = (np.abs(uv1 - expect) < 3.0).all(axis=1)
        assert m.sum() > 20 and good.mean() > 0.5


class TestMatching:
    def test_hamming_matrix(self):
        a = jnp.asarray([[0, 0, 0, 0, 0, 0, 0, 0],
                         [0xFFFFFFFF] * 8], jnp.uint32)
        d = matching.hamming_matrix(a, a)
        np.testing.assert_array_equal(np.asarray(d),
                                      [[0, 256], [256, 0]])

    def test_mutual_filter(self):
        # Two rows both match column 0; only the better (row 0) survives.
        best_idx = jnp.asarray([0, 0], jnp.int32)
        valid = jnp.asarray([True, True])
        keep = matching.mutual_filter(best_idx, 2, 4, valid)
        np.testing.assert_array_equal(np.asarray(keep), [True, False])

    def test_search_by_projection_window(self):
        desc = jnp.asarray(
            np.random.RandomState(7).randint(0, 2**32, (10, 8), np.uint64),
            jnp.uint32)
        kp_uv = jnp.asarray(np.random.RandomState(0).rand(10, 2) * 100,
                            jnp.float32)
        # Projections = keypoints + small noise; same descriptors.
        proj_uv = kp_uv + 1.5
        lvls = jnp.zeros((10,), jnp.int32)
        idx, dist = matching.search_by_projection(
            proj_uv, lvls, desc, jnp.ones(10, bool),
            kp_uv, lvls, desc, jnp.ones(10, bool),
            radius=4.0, level_scales=np.asarray([1.0]))
        np.testing.assert_array_equal(np.asarray(idx), np.arange(10))
        np.testing.assert_array_equal(np.asarray(dist), 0)

    def test_search_by_projection_radius_gate(self):
        desc = jnp.asarray(
            np.random.RandomState(8).randint(0, 2**32, (5, 8), np.uint64),
            jnp.uint32)
        kp_uv = jnp.asarray(np.arange(10).reshape(5, 2), jnp.float32)
        proj_uv = kp_uv + 100.0  # all out of radius
        lvls = jnp.zeros((5,), jnp.int32)
        idx, _ = matching.search_by_projection(
            proj_uv, lvls, desc, jnp.ones(5, bool),
            kp_uv, lvls, desc, jnp.ones(5, bool),
            radius=4.0, level_scales=np.asarray([1.0]))
        assert (np.asarray(idx) == -1).all()


class TestStereo:
    def test_recover_disparity(self):
        base = textured_image(seed=3)
        disp = 9
        right = np.roll(base, -disp, axis=1)  # right image shifted left
        fl = orb.extract_orb(jnp.asarray(base), CFG)
        fr = orb.extract_orb(jnp.asarray(right), CFG)
        u_r, idx_r = matching.search_stereo_rectified(
            fl.uv, fl.level, fl.desc, fl.valid,
            fr.uv, fr.level, fr.desc, fr.valid,
            min_disp=0.0, max_disp=60.0, max_dist=60,
            level_scales=np.asarray(CFG.level_scales))
        u_r = np.asarray(u_r)
        ok = u_r >= 0
        assert ok.sum() > 30
        d = np.asarray(fl.uv)[ok, 0] - u_r[ok]
        inliers = np.abs(d - disp) < 1.5
        assert inliers.mean() > 0.7


class TestMxuGatherEquivalence:
    """The TPU path replaces XLA gathers with one-hot MXU contractions in
    bf16 (4x the f32 MXU rate on v5e).  Because every one-hot row has
    exactly ONE nonzero there is no accumulation at all: the result is
    bit-identical to gathering the bf16-QUANTIZED image (integers up to
    256 exact; resize/blur fractions round at ~0.4%, below sensor
    noise)."""

    def test_gather_patches_is_quantized_gather(self):
        rng = np.random.RandomState(0)
        img = jnp.asarray(rng.rand(120, 160).astype(np.float32) * 255)
        img_q = img.astype(jnp.bfloat16).astype(jnp.float32)
        centers = jnp.asarray(np.stack(
            [rng.randint(0, 160, 50), rng.randint(0, 120, 50)], -1
        ).astype(np.int32))
        a = orb.gather_patches(img_q, centers, 15, mxu=False)
        b = orb.gather_patches(img, centers, 15, mxu=True)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_brief_descriptors_match_quantized_gather(self, monkeypatch):
        rng = np.random.RandomState(1)
        img = jnp.asarray(rng.rand(120, 160).astype(np.float32) * 255)
        centers = jnp.asarray(np.stack(
            [rng.randint(20, 140, 40), rng.randint(20, 100, 40)], -1
        ).astype(np.int32))
        angles = jnp.asarray(rng.rand(40).astype(np.float32) * 2 * np.pi)
        blur = orb.gaussian_blur7(img)
        blur_q = blur.astype(jnp.bfloat16).astype(jnp.float32)
        d1 = orb.brief_descriptors(blur_q, centers, angles)
        monkeypatch.setattr(orb, "_use_mxu_gather", lambda: True)
        d2 = orb.brief_descriptors(blur, centers, angles)
        np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))


class TestFusedTail:
    def test_fused_tail_matches_unfused(self):
        """extract_tail_fused (one 53x53 raw-patch gather, in-patch blur,
        in-patch BRIEF taps) vs the unfused two-gather + whole-image-blur
        path: angles exact; descriptor bits may flip only at FMA-
        contraction ULP ties of the Gaussian blur (<0.5% of bits), and
        only keypoints whose 53x53 window crosses the image edge see the
        clamp-then-blur vs blur-then-clamp difference."""
        rng = np.random.RandomState(4)
        img = jnp.asarray(rng.rand(120, 160).astype(np.float32) * 255)
        # interior keypoints only: 53x53 window fully inside
        centers = jnp.asarray(np.stack(
            [rng.randint(27, 160 - 27, 60),
             rng.randint(27, 120 - 27, 60)], -1).astype(np.int32))
        patches = orb.gather_patches(img, centers, orb.PATCH_RADIUS)
        ang0 = orb.ic_angle(patches)
        d0 = orb.brief_descriptors(orb.gaussian_blur7(img), centers, ang0)
        ang1, d1 = orb.extract_tail_fused(img, centers)
        np.testing.assert_allclose(np.asarray(ang0), np.asarray(ang1),
                                   atol=1e-6)
        diff_bits = np.unpackbits(
            (np.asarray(d0) ^ np.asarray(d1)).view(np.uint8)).sum()
        assert diff_bits <= 0.005 * d0.size * 32, diff_bits

    def test_fused_tail_border_keypoints_bounded_drift(self):
        """Keypoints at the detector border (cfg.border=19, inside the
        _TAIL_R=26 halo) take the clamp-then-blur path: the out-of-image
        Gaussian taps see edge-replicated pixels instead of blur-then-
        clamp. Angles stay exact (the 31x31 IC-angle window, radius 15,
        is fully inside at border 19); descriptors may drift only in
        the few taps whose 47x47 blurred window crosses the edge —
        gate the drift well under matching noise."""
        H, W = 120, 160
        rng = np.random.RandomState(7)
        img = jnp.asarray(rng.rand(H, W).astype(np.float32) * 255)
        b = 19                      # cfg.border default
        xs = np.concatenate([np.full(15, b), np.full(15, W - 1 - b),
                             rng.randint(b, W - b, 30)])
        ys = np.concatenate([rng.randint(b, H - b, 30),
                             np.full(15, b), np.full(15, H - 1 - b)])
        centers = jnp.asarray(np.stack([xs, ys], -1).astype(np.int32))
        patches = orb.gather_patches(img, centers, orb.PATCH_RADIUS)
        ang0 = orb.ic_angle(patches)
        d0 = orb.brief_descriptors(orb.gaussian_blur7(img), centers, ang0)
        ang1, d1 = orb.extract_tail_fused(img, centers)
        np.testing.assert_allclose(np.asarray(ang0), np.asarray(ang1),
                                   atol=1e-6)
        # Per-descriptor drift bound: a handful of edge-tap bit flips is
        # invisible to Hamming matching (thresholds 50-60 of 256); gate
        # at <=16 bits for border keypoints, aggregate <=2%.
        diff = np.unpackbits((np.asarray(d0) ^ np.asarray(d1))
                             .view(np.uint8).reshape(len(xs), -1), axis=1)
        per_kp = diff.sum(axis=1)
        assert per_kp.max() <= 16, per_kp.max()
        assert per_kp.sum() <= 0.02 * d0.size * 32, per_kp.sum()


class TestBatchExtract:
    def test_batch_matches_per_image(self):
        """extract_orb_batch (image-wide stages batched over the stereo
        pair) must be bit-identical to stacking two per-image
        extract_orb calls."""
        img_l = textured_image(seed=3)
        img_r = np.roll(img_l, -5, axis=1).copy()
        cfg = orb.OrbConfig(n_features=200, n_levels=4)
        f_l = orb.extract_orb(jnp.asarray(img_l), cfg)
        f_r = orb.extract_orb(jnp.asarray(img_r), cfg)
        fb = orb.extract_orb_batch(
            jnp.asarray(np.stack([img_l, img_r])), cfg)
        for name in ("uv", "level", "angle", "score", "desc", "valid"):
            want = np.stack([np.asarray(getattr(f_l, name)),
                             np.asarray(getattr(f_r, name))])
            np.testing.assert_array_equal(
                np.asarray(getattr(fb, name)), want, err_msg=name)
        assert int(f_l.n) > 50


class TestPallasFast:
    def test_fused_kernel_matches_xla(self):
        """pallas_fast.fast_nms_blend (interpret mode on CPU) must equal
        the XLA fast_score_maps + nms3 + blend composition bit-for-bit,
        including at non-tile-aligned shapes and image borders."""
        from vieo_slam_tpu.ops.pallas_fast import fast_nms_blend
        rng = np.random.RandomState(2)
        for (h, w) in ((120, 160), (67, 93)):
            img = rng.rand(h, w).astype(np.float32) * 220 + 10
            ys = rng.randint(2, h - 2, 120)
            xs = rng.randint(2, w - 2, 120)
            img[ys, xs] = 255.0
            th, tl = 20.0, 7.0
            s_hi, s_lo = orb.fast_score_maps(jnp.asarray(img), (th, tl))
            nh, nl = orb.nms3(s_hi), orb.nms3(s_lo)
            want = np.asarray(jnp.where(nh > 0, nh + 1e4, nl))
            got = np.asarray(fast_nms_blend(jnp.asarray(img), th, tl,
                                            interpret=True))
            np.testing.assert_array_equal(got, want, err_msg=str((h, w)))


class TestPallasGather:
    def test_gather_kernel_matches_xla(self):
        """pallas_gather.gather_patches_kernel (interpret mode on CPU)
        must equal the XLA gather_patches(mxu=False) path bit-for-bit,
        including clamped out-of-border centers and both tail radii."""
        from vieo_slam_tpu.ops.pallas_gather import gather_patches_kernel
        rng = np.random.RandomState(3)
        img = jnp.asarray(rng.rand(120, 160).astype(np.float32) * 255)
        centers = np.concatenate([
            np.stack([rng.randint(0, 160, 60),
                      rng.randint(0, 120, 60)], -1),
            [[0, 0], [159, 119], [3, 119], [159, 2]],
        ]).astype(np.int32)
        for r in (15, orb._TAIL_R):
            want = np.asarray(orb.gather_patches(
                img, jnp.asarray(centers), r, mxu=False))
            got = np.asarray(gather_patches_kernel(
                img, jnp.asarray(centers), r, interpret=True))
            np.testing.assert_array_equal(got, want, err_msg=str(r))

    def test_fused_tail_with_gather_kernel(self, monkeypatch):
        """extract_tail_fused routed through the Pallas gather must give
        identical angles and descriptors to the XLA-gather fused tail:
        the kernel is exact f32, so the only permitted difference is
        none."""
        from vieo_slam_tpu.ops import pallas_gather

        monkeypatch.setattr(orb, "_use_gather_kernel", lambda *_: True)
        monkeypatch.setattr(
            pallas_gather, "gather_patches_kernel",
            functools.partial(pallas_gather.gather_patches_kernel,
                              interpret=True))
        rng = np.random.RandomState(5)
        img = jnp.asarray(rng.rand(120, 160).astype(np.float32) * 255)
        centers = jnp.asarray(np.stack(
            [rng.randint(19, 160 - 19, 50),
             rng.randint(19, 120 - 19, 50)], -1).astype(np.int32))
        ang0, d0 = orb.extract_tail_fused(img, centers)
        monkeypatch.setattr(orb, "_use_gather_kernel", lambda *_: False)
        ang1, d1 = orb.extract_tail_fused(img, centers)
        np.testing.assert_array_equal(np.asarray(ang0), np.asarray(ang1))
        np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1))


class TestPallasTail:
    def test_tail_kernel_matches_fused_tail(self):
        """pallas_tail.tail_fused_multi_kernel (interpret mode) vs the
        XLA fused tail, multi-level atlas with border keypoints: angles
        within reduction-order tolerance (the kernel emits raw moments,
        the caller takes an exact atan2; the moment sums themselves
        reduce in a different order), descriptors near-identical (bits
        may flip only where the cos/sin-vs-atan2 ULP moves a rotated
        tap across a round() boundary)."""
        from vieo_slam_tpu.ops import pallas_tail
        rng = np.random.RandomState(4)
        imgs = [jnp.asarray(rng.rand(h, w).astype(np.float32) * 255)
                for h, w in ((120, 160), (100, 133), (83, 111))]
        uvs = []
        for im in imgs:
            H, W = im.shape
            uvs.append(jnp.asarray(np.concatenate([
                np.stack([rng.randint(19, W - 19, 30),
                          rng.randint(19, H - 19, 30)], -1),
                [[19, 19], [W - 20, H - 20]]]).astype(np.int32)))
        outs = pallas_tail.tail_fused_multi_kernel(imgs, uvs,
                                                   interpret=True)
        n_bits = tot = 0
        for im, uv, (ang1, d1) in zip(imgs, uvs, outs):
            ang0, d0 = orb.extract_tail_fused(im, uv)
            np.testing.assert_allclose(np.asarray(ang0), np.asarray(ang1),
                                       atol=2e-4)
            tot += np.unpackbits(np.ascontiguousarray(
                np.asarray(d0) ^ np.asarray(d1)).view(np.uint8)).sum()
            n_bits += d0.size * 32
        assert tot <= 0.001 * n_bits, (tot, n_bits)
