"""Camera model tests: project/unproject round trips, Jacobians vs autodiff,
DLT triangulation (equivalents of common/camera_models checks)."""

import jax
import jax.numpy as jnp
import numpy as np

from vieo_slam_tpu.cameras import models as cm
from vieo_slam_tpu.math import lie

jax.config.update("jax_enable_x64", True)

F64 = jnp.float64


def _cams():
    pin = cm.make_pinhole(458.6, 457.3, 367.2, 248.4, 752, 480, dtype=F64)
    rad = cm.make_radtan(458.6, 457.3, 367.2, 248.4,
                         [-0.283, 0.0739, 0.0002, 1.76e-5], 752, 480,
                         dtype=F64)
    kb8 = cm.make_kb8(190.97, 190.97, 254.93, 256.89,
                      [0.0034, 0.00077, -0.0025, 0.00069], 512, 512,
                      dtype=F64)
    return {"pinhole": pin, "radtan": rad, "kb8": kb8}


def _points(key, n=128):
    p = jax.random.normal(key, (n, 3), dtype=F64) * jnp.asarray([0.5, 0.4, 0.0])
    return p.at[:, 2].set(2.0 + jax.random.uniform(key, (n,), dtype=F64) * 4)


class TestProjection:
    def test_roundtrip_all_models(self):
        for name, cam in _cams().items():
            pc = _points(jax.random.PRNGKey(0))
            uv = cm.project(cam, pc)
            rays = cm.unproject(cam, uv)
            # Ray must align with the point direction.
            pn = pc / pc[:, 2:3]
            np.testing.assert_allclose(np.asarray(rays), np.asarray(pn),
                                       atol=1e-8, err_msg=name)

    def test_jacobian_matches_autodiff(self):
        for name, cam in _cams().items():
            pc = _points(jax.random.PRNGKey(1), 16)
            _, J = cm.project_jacobian(cam, pc)
            J_ad = jax.vmap(jax.jacfwd(lambda p: cm.project(cam, p)))(pc)
            np.testing.assert_allclose(np.asarray(J), np.asarray(J_ad),
                                       atol=1e-8, err_msg=name)

    def test_pinhole_center(self):
        cam = _cams()["pinhole"]
        uv = cm.project(cam, jnp.asarray([0.0, 0.0, 1.0]))
        np.testing.assert_allclose(np.asarray(uv), [367.2, 248.4], atol=1e-12)

    def test_in_image(self):
        cam = _cams()["pinhole"]
        uv = jnp.asarray([[10.0, 10.0], [-1.0, 5.0], [751.5, 100.0],
                          [700.0, 479.0]])
        np.testing.assert_array_equal(
            np.asarray(cm.in_image(cam, uv)), [True, False, True, True])


class TestTriangulation:
    def test_dlt_two_view(self):
        pw = jnp.asarray([0.3, -0.2, 4.0])
        # Two cameras: identity and translated 0.5 along x with small rotation.
        R0, t0 = jnp.eye(3, dtype=F64), jnp.zeros(3, dtype=F64)
        R1 = lie.so3_exp(jnp.asarray([0.0, 0.05, 0.0]))
        t1 = jnp.asarray([-0.5, 0.0, 0.02])
        rays = jnp.stack([
            pw / pw[2],
            (R1 @ pw + t1) / (R1 @ pw + t1)[2],
        ])
        Rcw = jnp.stack([R0, R1])
        tcw = jnp.stack([t0, t1])
        est = cm.triangulate_dlt(rays, Rcw, tcw)
        np.testing.assert_allclose(np.asarray(est), np.asarray(pw), atol=1e-9)

    def test_dlt_masked_views(self):
        pw = jnp.asarray([0.3, -0.2, 4.0])
        R0 = jnp.eye(3, dtype=F64)
        R1 = lie.so3_exp(jnp.asarray([0.0, 0.05, 0.0]))
        t0 = jnp.zeros(3, dtype=F64)
        t1 = jnp.asarray([-0.5, 0.0, 0.02])
        garbage_ray = jnp.asarray([5.0, 5.0, 1.0])
        rays = jnp.stack([pw / pw[2],
                          (R1 @ pw + t1) / (R1 @ pw + t1)[2],
                          garbage_ray])
        Rcw = jnp.stack([R0, R1, R0])
        tcw = jnp.stack([t0, t1, t0])
        mask = jnp.asarray([True, True, False])
        est = cm.triangulate_dlt(rays, Rcw, tcw, mask=mask)
        np.testing.assert_allclose(np.asarray(est), np.asarray(pw), atol=1e-8)

    def test_checks(self):
        pw = jnp.asarray([0.0, 0.0, 5.0])
        R = jnp.stack([jnp.eye(3, dtype=F64), jnp.eye(3, dtype=F64)])
        t = jnp.stack([jnp.zeros(3, dtype=F64), jnp.asarray([-1.0, 0.0, 0.0])])
        rays = jnp.stack([pw / pw[2], pw / pw[2]])
        depths, cos_par = cm.triangulation_checks(pw, R, t, rays)
        assert np.all(np.asarray(depths) > 0)
        assert np.asarray(cos_par) < 1.0  # nonzero parallax with baseline


class TestStereoRig:
    def test_rectified_disparity(self):
        left, right, bf = cm.stereo_rectified_cameras(
            435.2, 435.2, 367.4, 252.2, 0.11, 752, 480, dtype=F64)
        p = jnp.asarray([0.2, 0.1, 3.0])
        uvl = cm.project(left, p)
        p_r = right.Rcr @ p + right.tcr
        uvr = cm.project(right, p_r)
        disparity = np.asarray(uvl[0] - uvr[0])
        np.testing.assert_allclose(disparity, np.asarray(bf) / 3.0, atol=1e-9)
