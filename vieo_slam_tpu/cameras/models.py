"""Batched camera models: Pinhole, Radtan (radial-tangential), KB8 fisheye.

TPU-native equivalent of `common/camera_models/` in the reference
(camera_base.h GeometricCameraBase/CameraBase/GeometricCamera,
camera_pinhole.*, camera_radtan.*, camera_kb8.*): polymorphic
project/unproject with analytic Jacobians, per-camera extrinsics Tbc/Trc,
and multi-view triangulation.

Design: instead of virtual dispatch per point (reference), each model is a
set of pure functions over [..., 3] point batches; a `Camera` NamedTuple
carries intrinsics as arrays plus a static `kind` so a multi-camera rig is
a pytree of Cameras that can be closed over by jitted pipelines.  Jacobians
are analytic (matching camera_base.h:58+ signatures) — autodiff is avoided
on the hot path so XLA sees small fused einsums.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

PINHOLE = 0
RADTAN = 1
KB8 = 2


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Camera:
    """One camera of a rig.

    kind: python int (STATIC pytree metadata): PINHOLE / RADTAN / KB8 —
      distortion-model dispatch happens at trace time, so each model
      compiles to its own fused kernel (the reference uses virtual
      dispatch per point, camera_base.h).
    fx, fy, cx, cy: scalars.
    dist: [k] distortion coefficients (4 radtan: k1 k2 p1 p2; 4 kb8: k1..k4).
    Rcr, tcr: [3,3], [3] camera-from-rig extrinsic (reference Trc inverse;
       rig frame == the reference camera / body-aligned frame).
    width, height: python ints (static) image size.
    """

    fx: jax.Array
    fy: jax.Array
    cx: jax.Array
    cy: jax.Array
    dist: jax.Array
    Rcr: jax.Array
    tcr: jax.Array
    kind: int = dataclasses.field(metadata=dict(static=True))
    width: int = dataclasses.field(metadata=dict(static=True))
    height: int = dataclasses.field(metadata=dict(static=True))

    def _replace(self, **kw):
        return dataclasses.replace(self, **kw)


def make_pinhole(fx, fy, cx, cy, width, height, Rcr=None, tcr=None,
                 dtype=None):
    # Leaves are NUMPY on purpose: a Camera is typically closed over by
    # jitted pipelines, and closure-captured DEVICE arrays force a
    # device->host read at trace time — on the axon TPU relay that one
    # read permanently degrades the whole process's sync latency ~300x
    # (measured; see TODO.md). numpy constants embed host-side for free.
    dtype = np.float32 if dtype is None else dtype
    return Camera(
        fx=np.asarray(fx, dtype), fy=np.asarray(fy, dtype),
        cx=np.asarray(cx, dtype), cy=np.asarray(cy, dtype),
        dist=np.zeros((4,), dtype),
        Rcr=np.eye(3, dtype=dtype) if Rcr is None else np.asarray(Rcr, dtype),
        tcr=np.zeros((3,), dtype) if tcr is None else np.asarray(tcr, dtype),
        kind=PINHOLE, width=int(width), height=int(height),
    )


def make_radtan(fx, fy, cx, cy, dist, width, height, Rcr=None, tcr=None,
                dtype=None):
    dtype = np.float32 if dtype is None else dtype
    cam = make_pinhole(fx, fy, cx, cy, width, height, Rcr, tcr, dtype)
    return cam._replace(kind=RADTAN, dist=np.asarray(dist, dtype))


def make_kb8(fx, fy, cx, cy, dist, width, height, Rcr=None, tcr=None,
             dtype=None):
    dtype = np.float32 if dtype is None else dtype
    cam = make_pinhole(fx, fy, cx, cy, width, height, Rcr, tcr, dtype)
    return cam._replace(kind=KB8, dist=np.asarray(dist, dtype))


# ---------------------------------------------------------------------------
# Normalized-plane distortion maps d: (x, y) -> (xd, yd) and their Jacobians.
# ---------------------------------------------------------------------------


def _radtan_distort(cam: Camera, xy):
    k1, k2, p1, p2 = cam.dist[0], cam.dist[1], cam.dist[2], cam.dist[3]
    x, y = xy[..., 0], xy[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + k1 * r2 + k2 * r2 * r2
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def _kb8_distort(cam: Camera, xy):
    """Kannala-Brandt: theta-polynomial fisheye (camera_kb8.h)."""
    k = cam.dist
    x, y = xy[..., 0], xy[..., 1]
    r = jnp.sqrt(x * x + y * y)
    small = r < 1e-8
    safe_r = jnp.where(small, 1.0, r)
    theta = jnp.arctan(r)
    t2 = theta * theta
    theta_d = theta * (1.0 + t2 * (k[0] + t2 * (k[1] + t2 * (k[2] + t2 * k[3]))))
    scale = jnp.where(small, 1.0, theta_d / safe_r)
    return xy * scale[..., None]


def _distort(cam: Camera, xy):
    if cam.kind == PINHOLE:
        return xy
    if cam.kind == RADTAN:
        return _radtan_distort(cam, xy)
    return _kb8_distort(cam, xy)


def _undistort_iterative(cam: Camera, xyd, iters: int = 8):
    """Invert the distortion map by damped fixed-point/Newton iteration."""
    if cam.kind == PINHOLE:
        return xyd

    def body(_, xy):
        # Newton step on f(xy) = distort(xy) - xyd using the exact Jacobian.
        f, J = _distort_with_jac(cam, xy)
        r = f - xyd
        det = J[..., 0, 0] * J[..., 1, 1] - J[..., 0, 1] * J[..., 1, 0]
        det = jnp.where(jnp.abs(det) < 1e-12, 1.0, det)
        inv00 = J[..., 1, 1] / det
        inv01 = -J[..., 0, 1] / det
        inv10 = -J[..., 1, 0] / det
        inv11 = J[..., 0, 0] / det
        dx = inv00 * r[..., 0] + inv01 * r[..., 1]
        dy = inv10 * r[..., 0] + inv11 * r[..., 1]
        step = jnp.stack([dx, dy], axis=-1)
        # Trust region: far outside the calibrated FOV the distortion
        # polynomial is non-monotonic and Newton can diverge; bounded steps
        # keep every lane finite (invalid pixels are masked by callers).
        step = jnp.clip(step, -0.5, 0.5)
        return jnp.clip(xy - step, -8.0, 8.0)

    return jax.lax.fori_loop(0, iters, body, xyd)


def _distort_with_jac(cam: Camera, xy):
    f = _distort(cam, xy)
    # 2x2 Jacobian via forward-mode on the two inputs (cheap, fused by XLA).
    e0 = jnp.zeros_like(xy).at[..., 0].set(1.0)
    e1 = jnp.zeros_like(xy).at[..., 1].set(1.0)
    _, d0 = jax.jvp(lambda v: _distort(cam, v), (xy,), (e0,))
    _, d1 = jax.jvp(lambda v: _distort(cam, v), (xy,), (e1,))
    J = jnp.stack([d0, d1], axis=-1)  # [..., 2(out), 2(in)]
    return f, J


# ---------------------------------------------------------------------------
# Public project / unproject.
# ---------------------------------------------------------------------------


def project(cam: Camera, pc: jax.Array) -> jax.Array:
    """Camera-frame 3D points [..., 3] -> pixels [..., 2].

    Equivalent to GeometricCameraBase::Project (camera_base.h).
    Points behind the camera still produce finite output (guarded divide);
    callers gate on positive depth.
    """
    z = pc[..., 2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    xy = pc[..., 0:2] * inv_z[..., None]
    xyd = _distort(cam, xy)
    u = cam.fx * xyd[..., 0] + cam.cx
    v = cam.fy * xyd[..., 1] + cam.cy
    return jnp.stack([u, v], axis=-1)


def project_jacobian(cam: Camera, pc: jax.Array):
    """Returns (uv [..., 2], J [..., 2, 3] = d(uv)/d(pc)).

    Analytic chain through the normalized plane; equivalent of the
    reference's projectJac (camera_pinhole.cpp / camera_kb8.cpp).
    """
    z = pc[..., 2]
    safe_z = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    inv_z = 1.0 / safe_z
    xy = pc[..., 0:2] * inv_z[..., None]
    xyd, Jd = _distort_with_jac(cam, xy)
    u = cam.fx * xyd[..., 0] + cam.cx
    v = cam.fy * xyd[..., 1] + cam.cy
    uv = jnp.stack([u, v], axis=-1)

    # d(xy)/d(pc): [[1/z, 0, -x/z^2], [0, 1/z, -y/z^2]]
    x, y = pc[..., 0], pc[..., 1]
    zeros = jnp.zeros_like(z)
    Jnorm = jnp.stack(
        [
            jnp.stack([inv_z, zeros, -x * inv_z * inv_z], axis=-1),
            jnp.stack([zeros, inv_z, -y * inv_z * inv_z], axis=-1),
        ],
        axis=-2,
    )  # [..., 2, 3]
    K = jnp.stack([cam.fx, cam.fy], axis=-1)  # [2]
    J = K[..., :, None] * (Jd @ Jnorm)
    return uv, J


def unproject(cam: Camera, uv: jax.Array) -> jax.Array:
    """Pixels [..., 2] -> unit-depth rays [..., 3] in the camera frame."""
    xd = (uv[..., 0] - cam.cx) / cam.fx
    yd = (uv[..., 1] - cam.cy) / cam.fy
    xy = _undistort_iterative(cam, jnp.stack([xd, yd], axis=-1))
    return jnp.concatenate([xy, jnp.ones_like(xy[..., :1])], axis=-1)


def in_image(cam: Camera, uv: jax.Array, margin: float = 0.0) -> jax.Array:
    return (
        (uv[..., 0] >= margin)
        & (uv[..., 0] < cam.width - margin)
        & (uv[..., 1] >= margin)
        & (uv[..., 1] < cam.height - margin)
    )


# ---------------------------------------------------------------------------
# Two-view / multi-view triangulation (camera_base.h TriangulateMatches).
# ---------------------------------------------------------------------------


def triangulate_dlt(rays: jax.Array, R_cw: jax.Array, t_cw: jax.Array,
                    mask: jax.Array | None = None) -> jax.Array:
    """Multi-view DLT triangulation from unit-plane rays.

    Args:
      rays: [..., V, 3] rays in each view's camera frame (z = 1 scaling ok).
      R_cw, t_cw: [..., V, 3, 3], [..., V, 3] world->camera poses.
      mask: [..., V] optional view validity.

    Returns world point [..., 3] (least-squares of the 2V linear DLT rows).
    """
    # Rows: x * (P row3) - (P row1), y * (P row3) - (P row2); P = [R | t].
    x = rays[..., 0] / rays[..., 2]
    y = rays[..., 1] / rays[..., 2]
    r1, r2, r3 = R_cw[..., 0, :], R_cw[..., 1, :], R_cw[..., 2, :]
    t1, t2, t3 = t_cw[..., 0], t_cw[..., 1], t_cw[..., 2]
    rowA = x[..., None] * r3 - r1          # [..., V, 3]
    rowB = y[..., None] * r3 - r2
    cA = x * t3 - t1                        # [..., V]
    cB = y * t3 - t2
    A = jnp.concatenate([rowA, rowB], axis=-2)          # [..., 2V, 3]
    b = -jnp.concatenate([cA, cB], axis=-1)             # [..., 2V]
    if mask is not None:
        m = jnp.concatenate([mask, mask], axis=-1).astype(A.dtype)
        A = A * m[..., None]
        b = b * m
    AtA = jnp.swapaxes(A, -1, -2) @ A
    Atb = jnp.einsum("...vi,...v->...i", A, b)
    # Dtype-scaled ridge keeps masked/degenerate systems solvable without
    # visibly perturbing well-conditioned ones.
    tr = AtA[..., 0, 0] + AtA[..., 1, 1] + AtA[..., 2, 2]
    ridge = (100.0 * jnp.finfo(A.dtype).eps) * (tr[..., None, None] + 1e-30)
    AtA = AtA + ridge * jnp.eye(3, dtype=A.dtype)
    return jnp.linalg.solve(AtA, Atb[..., None])[..., 0]


def triangulation_checks(
    pw: jax.Array, cams_R_cw, cams_t_cw, rays, *,
    min_parallax_cos: float = 0.9998,
) :
    """Positive-depth + parallax checks used after TriangulateMatches
    (camera_base.h:171-199). Returns (depths [..., V], cos_parallax [...])."""
    pc = jnp.einsum("...vij,...j->...vi", cams_R_cw, pw) + cams_t_cw
    depths = pc[..., 2]
    # Parallax between first two views' rays to the point.
    centers = -jnp.einsum("...vji,...vj->...vi", cams_R_cw, cams_t_cw)
    d0 = pw[..., None, :] - centers
    d0n = d0 / jnp.linalg.norm(d0, axis=-1, keepdims=True).clip(1e-9)
    cos_par = jnp.sum(d0n[..., 0, :] * d0n[..., 1, :], axis=-1)
    return depths, cos_par


def stereo_rectified_cameras(fx, fy, cx, cy, baseline, width, height,
                             dtype=jnp.float32):
    """Build the classic rectified stereo pair (reference `Camera.bf` setup,
    Tracking.cc ParseCamParamFile): right camera displaced by -baseline in x.
    Returns (left, right, bf) with bf = fx * baseline."""
    left = make_pinhole(fx, fy, cx, cy, width, height, dtype=dtype)
    right = make_pinhole(
        fx, fy, cx, cy, width, height,
        Rcr=jnp.eye(3, dtype=dtype),
        tcr=jnp.asarray([-baseline, 0.0, 0.0], dtype),
        dtype=dtype,
    )
    return left, right, jnp.asarray(fx * baseline, dtype)
