"""Synthetic SLAM worlds: feature-level simulation for end-to-end tests.

The reference validates end-to-end only on EuRoC/TUM-VI datasets
(SURVEY.md §4); no dataset ships in this environment, so system tests run
on a simulated world instead: landmarks with stable synthetic descriptors,
parametric trajectories with exact ground truth, per-frame feature sets
with configurable pixel noise, descriptor bit flips, clutter detections
and dropout — exercising tracking/mapping/BA/loop-closing end to end with
measurable ATE.  IMU/encoder samples are generated from the analytic
trajectory derivatives for the VIO/VIEO paths.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..cameras import models as cm
from ..math import lie

import jax.numpy as jnp


@dataclasses.dataclass
class WorldConfig:
    n_landmarks: int = 3000
    extent: tuple = (20.0, 12.0, 6.0)   # x, y, z box size
    seed: int = 0
    # Dynamic-scene hardening: this fraction of landmarks oscillates
    # through the world (non-rigid outliers a SLAM stack must reject —
    # the reference faces these as moving objects on real sequences).
    dynamic_frac: float = 0.0
    dynamic_amp: float = 0.4            # metres of peak excursion
    dynamic_omega: float = 1.3          # rad/s


class SyntheticWorld:
    """Landmark field + descriptor bank."""

    def __init__(self, cfg: WorldConfig = WorldConfig()):
        self.cfg = cfg
        rng = np.random.RandomState(cfg.seed)
        e = np.asarray(cfg.extent)
        # Landmarks in a hollow box shell (walls) so every viewpoint sees
        # structure at varied depth.
        n = cfg.n_landmarks
        pts = rng.rand(n, 3) * e - e / 2
        face = rng.randint(0, 4, n)
        pts[face == 0, 0] = -e[0] / 2     # walls
        pts[face == 1, 0] = e[0] / 2
        pts[face == 2, 1] = -e[1] / 2
        pts[face == 3, 1] = e[1] / 2
        self.pw = pts.astype(np.float32)
        self.desc = rng.randint(0, 2 ** 32, (n, 8), np.uint64).astype(
            np.uint32)
        self.level = rng.randint(0, 3, n).astype(np.int32)
        # Persistent per-landmark saliency: real detectors fire on the same
        # corners every frame, so detection must be stable across frames
        # (a random subset per frame would cap the matchable overlap).
        self.saliency = rng.rand(n).astype(np.float32)
        self.rng = rng
        self._patches = None
        # dynamic landmark bookkeeping
        n_dyn = int(round(cfg.dynamic_frac * n))
        self.dynamic_ids = rng.choice(n, n_dyn, replace=False) \
            if n_dyn else np.zeros(0, np.int64)
        self._dyn_dir = rng.randn(n_dyn, 3).astype(np.float32)
        if n_dyn:
            self._dyn_dir /= np.linalg.norm(
                self._dyn_dir, axis=1, keepdims=True)
        self._dyn_phase = rng.rand(n_dyn).astype(np.float32) * 2 * np.pi

    def pw_at(self, t: float) -> np.ndarray:
        """Landmark positions at time t (dynamic subset oscillates)."""
        if not len(self.dynamic_ids):
            return self.pw
        pw = self.pw.copy()
        off = np.sin(self.cfg.dynamic_omega * t + self._dyn_phase)
        pw[self.dynamic_ids] += (self.cfg.dynamic_amp
                                 * off[:, None] * self._dyn_dir)
        return pw

    # ------------------------------------------------------------------

    def observe(
        self,
        Rcw: np.ndarray,
        tcw: np.ndarray,
        cam: cm.Camera,
        *,
        bf: float = 0.0,
        n_kp: int = 600,
        pixel_noise: float = 0.3,
        bit_flips: int = 4,
        clutter: int = 60,
        dropout: float = 0.05,
        min_depth: float = 0.3,
        max_depth: float = 25.0,
        rng: np.random.RandomState | None = None,
    ):
        """Render one frame's feature set.

        Returns dict(uv, level, angle, desc, ur, depth, valid, lm_id) with
        capacity n_kp; lm_id gives ground-truth correspondence (-1 clutter).
        """
        rng = rng or self.rng
        pc = self.pw @ Rcw.T + tcw
        z = pc[:, 2]
        uv = np.array(cm.project(cam, jnp.asarray(pc)))
        vis = (
            (z > min_depth) & (z < max_depth)
            & (uv[:, 0] >= 1) & (uv[:, 0] < cam.width - 1)
            & (uv[:, 1] >= 1) & (uv[:, 1] < cam.height - 1)
        )
        vis &= rng.rand(len(z)) > dropout
        ids = np.nonzero(vis)[0]
        # Stable selection: strongest saliency first.
        ids = ids[np.argsort(-self.saliency[ids], kind="stable")]
        n_real = min(len(ids), n_kp - clutter)
        ids = ids[:n_real]

        out_uv = np.zeros((n_kp, 2), np.float32)
        out_level = np.zeros(n_kp, np.int32)
        out_angle = np.zeros(n_kp, np.float32)
        out_desc = np.zeros((n_kp, 8), np.uint32)
        out_ur = np.full(n_kp, -1.0, np.float32)
        out_depth = np.full(n_kp, -1.0, np.float32)
        out_valid = np.zeros(n_kp, bool)
        out_lmid = np.full(n_kp, -1, np.int64)

        out_uv[:n_real] = uv[ids] + rng.randn(n_real, 2) * pixel_noise
        out_level[:n_real] = self.level[ids]
        desc = self.desc[ids].copy()
        # Flip a few random bits per descriptor (matching noise).
        for _ in range(bit_flips):
            word = rng.randint(0, 8, n_real)
            bit = rng.randint(0, 32, n_real).astype(np.uint32)
            desc[np.arange(n_real), word] ^= (np.uint32(1) << bit)
        out_desc[:n_real] = desc
        if bf > 0:
            # Geometrically consistent stereo: depth derives from the SAME
            # noisy disparity the matcher would measure, sigma_z =
            # z^2 * sigma_d / bf like real rectified stereo.
            disp_true = bf / z[ids]
            disp_meas = disp_true + rng.randn(n_real) * pixel_noise
            out_ur[:n_real] = out_uv[:n_real, 0] - disp_meas
            out_depth[:n_real] = bf / np.maximum(disp_meas, 1e-3)
        out_valid[:n_real] = True
        out_lmid[:n_real] = ids

        # Clutter: random detections with random descriptors.
        c0 = n_real
        c1 = min(n_kp, n_real + clutter)
        nc = c1 - c0
        if nc > 0:
            out_uv[c0:c1] = rng.rand(nc, 2) * [cam.width - 2, cam.height - 2]
            out_desc[c0:c1] = rng.randint(0, 2 ** 32, (nc, 8), np.uint64)
            out_valid[c0:c1] = True
        return dict(
            uv=out_uv, level=out_level, angle=out_angle, desc=out_desc,
            ur=out_ur, depth=out_depth, valid=out_valid, lm_id=out_lmid,
        )


# ---------------------------------------------------------------------------
# Trajectories
# ---------------------------------------------------------------------------


    # ------------------------------------------------------------------
    # pixel-level rendering (image-domain end-to-end tests)
    # ------------------------------------------------------------------

    def _landmark_patches(self, size: int = 12):
        """Per-landmark fixed texture stamp: a 2x-upsampled random block
        pattern (corner-rich, distinctive under BRIEF), constant across
        views so descriptors are stable frame to frame."""
        if self._patches is None:
            rng = np.random.RandomState(self.cfg.seed + 7777)
            n = self.cfg.n_landmarks
            coarse = rng.randint(30, 226, (n, size // 2, size // 2))
            self._patches = np.repeat(
                np.repeat(coarse, 2, axis=1), 2, axis=2).astype(np.float32)
        return self._patches

    def render_view(self, cam, Rcw, tcw, *, bg_level: float = 96.0,
                    min_depth: float = 0.2, t: float = 0.0,
                    noise_sigma: float = 0.0, gain: float = 1.0,
                    bias: float = 0.0, blur_sigma: float = 0.0,
                    rng=None, return_depth: bool = False,
                    depth_outlier_frac: float = 0.0):
        """Render a grayscale view of the landmark field through an
        arbitrary (possibly distorted) camera model.

        Each landmark stamps its fixed texture patch at its projected
        sub-pixel position (bilinear shift), over a flat background.
        This gives the REAL pipeline (pixels -> ORB -> stereo -> track)
        a world with stable, matchable corners and exact ground truth —
        the image-level e2e surface SURVEY §4 calls for.

        Hardening knobs (pressure-test the ORB/matching stack the way
        real imagery does):
          t:                  scene time (dynamic landmarks move)
          noise_sigma:        additive Gaussian photometric noise
          gain/bias:          per-frame brightness drift I' = gain*I+bias
          blur_sigma:         Gaussian defocus blur
          return_depth:       also return a per-pixel depth map (RGB-D),
                              with depth_outlier_frac of the landmark
                              stamps carrying a corrupted depth
        """
        H, W = cam.height, cam.width
        img = np.full((H, W), bg_level, np.float32)
        depth_map = np.zeros((H, W), np.float32) if return_depth else None
        pw = self.pw_at(t)
        pc = pw @ np.asarray(Rcw).T + np.asarray(tcw)
        uv = np.asarray(cm.project(cam, jnp.asarray(pc, jnp.float32)))
        patches = self._landmark_patches()
        P = patches.shape[1]
        h = P // 2
        vis = ((pc[:, 2] > min_depth)
               & (uv[:, 0] >= h + 1) & (uv[:, 0] < W - h - 2)
               & (uv[:, 1] >= h + 1) & (uv[:, 1] < H - h - 2))
        # draw far-to-near so close landmarks overwrite far ones
        order = np.argsort(-pc[vis, 2], kind="stable")
        idx = np.nonzero(vis)[0][order]
        if depth_map is not None and depth_outlier_frac > 0:
            r_out = rng if rng is not None else np.random
            outlier = r_out.rand(len(self.pw)) < depth_outlier_frac
            out_scale = 1.0 + (r_out.rand(len(self.pw)) - 0.3)
        for li in idx:
            u, v = uv[li]
            iu, iv = int(np.floor(u)), int(np.floor(v))
            fu, fv = u - iu, v - iv
            p = patches[li]
            # bilinear sub-pixel shift (pad by 1, shift by (fv, fu))
            pp = np.pad(p, 1, mode="edge")
            p00 = pp[0:P, 0:P]
            p01 = pp[0:P, 1:P + 1]
            p10 = pp[1:P + 1, 0:P]
            p11 = pp[1:P + 1, 1:P + 1]
            sh = ((1 - fv) * (1 - fu) * p11 + (1 - fv) * fu * p10
                  + fv * (1 - fu) * p01 + fv * fu * p00)
            img[iv - h + 1: iv + P - h + 1,
                iu - h + 1: iu + P - h + 1] = sh
            if depth_map is not None:
                z = pc[li, 2]
                if depth_outlier_frac > 0 and outlier[li]:
                    z = z * out_scale[li]
                depth_map[iv - h + 1: iv + P - h + 1,
                          iu - h + 1: iu + P - h + 1] = z
        # photometric hardening
        if blur_sigma > 0:
            k = np.exp(-0.5 * (np.arange(-3, 4) / blur_sigma) ** 2)
            k /= k.sum()
            img = np.apply_along_axis(
                lambda r: np.convolve(r, k, mode="same"), 1, img)
            img = np.apply_along_axis(
                lambda c: np.convolve(c, k, mode="same"), 0, img)
        img = gain * img + bias
        if noise_sigma > 0:
            r = rng if rng is not None else np.random
            img = img + r.randn(H, W).astype(np.float32) * noise_sigma
        img = np.clip(img, 0.0, 255.0).astype(np.float32)
        if return_depth:
            return img, depth_map
        return img

    def render_stereo(self, cam, Rcw, tcw, baseline: float, **kw):
        """Rectified stereo pair: right camera displaced +baseline along
        the left camera's x axis."""
        left = self.render_view(cam, Rcw, tcw, **kw)
        tcw_r = np.asarray(tcw) - np.asarray([baseline, 0.0, 0.0],
                                             np.float32)
        right = self.render_view(cam, Rcw, tcw_r, **kw)
        return left, right


def circle_trajectory(t: np.ndarray, radius=4.0, omega=0.3, z=0.0,
                      look_outward=False, z_amp=0.0, z_omega=1.1,
                      pitch_amp=0.0, pitch_omega=0.8):
    """Camera circles the origin looking inward (or outward, panorama-
    style — outward keeps wall structure close, the strong-stereo regime).

    z_amp/pitch_amp add vertical bobbing and nodding. A flat yaw-only
    circle leaves the accel-bias component along gravity UNOBSERVABLE
    (degenerate with |g|) — VIO tests need some excitation, exactly like
    real handheld/MAV datasets have.

    Returns (Rwc [T,3,3], twc [T,3]) world-from-camera, plus body rates
    (omega_body [T,3], acc_body [T,3], v_world [T,3]) for IMU synthesis
    with gravity NOT included (add g in the IMU model).
    """
    t = np.asarray(t, np.float64)
    ang = omega * t
    zt = z + z_amp * np.sin(z_omega * t)
    pos = np.stack([radius * np.cos(ang), radius * np.sin(ang), zt], -1)
    # camera z-axis points to origin, x-axis tangent, y-axis down-ish.
    fwd = -np.stack([pos[:, 0], pos[:, 1], np.zeros_like(ang)], -1)
    fwd /= np.linalg.norm(fwd, axis=-1, keepdims=True)
    if look_outward:
        fwd = -fwd
    if pitch_amp:
        # nod: tilt fwd up/down about the horizontal right axis
        th = pitch_amp * np.sin(pitch_omega * t)
        fwd = np.stack([fwd[:, 0] * np.cos(th), fwd[:, 1] * np.cos(th),
                        np.sin(th)], -1)
    up = np.tile([0.0, 0.0, -1.0], (len(t), 1))
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right, axis=-1, keepdims=True)
    down = np.cross(fwd, right)
    Rwc = np.stack([right, down, fwd], axis=-1)  # columns = cam axes
    v = np.stack([-radius * omega * np.sin(ang),
                  radius * omega * np.cos(ang),
                  z_amp * z_omega * np.cos(z_omega * t)], -1)
    a_w = np.stack([-radius * omega ** 2 * np.cos(ang),
                    -radius * omega ** 2 * np.sin(ang),
                    -z_amp * z_omega ** 2 * np.sin(z_omega * t)], -1)
    # body rates: R_wc(t) varies; omega_body from dR = R hat(w) — compute
    # numerically for generality.
    return Rwc.astype(np.float32), pos.astype(np.float32), \
        v.astype(np.float32), a_w.astype(np.float32)


def figure_eight_trajectory(t: np.ndarray, a=2.0, b=1.2, omega=0.35,
                            z=0.0, heading="tangent"):
    """Lemniscate p(t) = (a sin(wt), b sin(2wt), z) — each lap revisits
    every point with the SAME pose, the multi-loop place-recognition
    scenario (loop closures fire once per lap).

    heading="tangent": camera faces along travel — viewing direction
    sweeps the full 360° per lap, so covisibility to lap-1 breaks and
    revisits genuinely require place recognition.  Mind the yaw rate at
    the lobe ends: keep it trackable (a=3, b=1, ~180 frames/lap ≈ 4.8°
    per frame max; a=2, b=1.2 at 90/lap hits 14.6°/frame and breaks
    frame-to-frame tracking).  heading=(x, y, z) point: camera looks
    away from that fixed point — smooth but keeps one wall in view
    forever, so the map stays covisibility-connected and loop closure
    is never exercised.

    Returns (Rwc, twc, v_world, a_world)."""
    t = np.asarray(t, np.float64)
    w = omega
    pos = np.stack([a * np.sin(w * t), b * np.sin(2 * w * t),
                    np.full_like(t, z)], -1)
    v = np.stack([a * w * np.cos(w * t), 2 * b * w * np.cos(2 * w * t),
                  np.zeros_like(t)], -1)
    a_w = np.stack([-a * w ** 2 * np.sin(w * t),
                    -4 * b * w ** 2 * np.sin(2 * w * t),
                    np.zeros_like(t)], -1)
    if heading == "tangent":
        fwd = v.copy()
    else:
        fwd = pos - np.asarray(heading, np.float64)[None, :]
    fwd = fwd / np.maximum(np.linalg.norm(fwd, axis=-1, keepdims=True),
                           1e-9)
    up = np.tile([0.0, 0.0, -1.0], (len(t), 1))
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right, axis=-1, keepdims=True)
    down = np.cross(fwd, right)
    Rwc = np.stack([right, down, fwd], axis=-1)
    return (Rwc.astype(np.float32), pos.astype(np.float32),
            v.astype(np.float32), a_w.astype(np.float32))


def trajectory_to_tcw(Rwc, twc):
    Rcw = np.swapaxes(Rwc, -1, -2)
    tcw = -np.einsum("tij,tj->ti", Rcw, twc)
    return Rcw.astype(np.float32), tcw.astype(np.float32)


def body_rates_from_poses(Rwb, t):
    """Numeric angular velocity in body frame from a rotation sequence."""
    w = np.zeros((len(t), 3), np.float32)
    for i in range(1, len(t)):
        dR = Rwb[i - 1].T @ Rwb[i]
        dt = t[i] - t[i - 1]
        w[i] = np.asarray(lie.so3_log(jnp.asarray(dR))) / max(dt, 1e-9)
    w[0] = w[1]
    return w


def make_imu_samples(t_frames, Rwb, v_w, a_w, rate_hz=200.0,
                     gravity=(0.0, 0.0, -9.81), bg=None, ba=None,
                     noise_g=0.0, noise_a=0.0, seed=0):
    """Dense IMU stream between frame timestamps.

    gyro = R_wb^T dR/dt (body rates); acc = R_wb^T (a_w - g) + ba + noise.
    Values are linearly interpolated from per-frame analytic quantities.
    """
    rng = np.random.RandomState(seed)
    t0, t1 = t_frames[0], t_frames[-1]
    ts = np.arange(t0, t1, 1.0 / rate_hz)
    g = np.asarray(gravity)
    bg = np.zeros(3) if bg is None else np.asarray(bg)
    ba = np.zeros(3) if ba is None else np.asarray(ba)

    w_body_frames = body_rates_from_poses(Rwb, t_frames)

    def interp(vals):
        return np.stack(
            [np.interp(ts, t_frames, vals[:, i]) for i in range(3)], -1)

    w_b = interp(w_body_frames)
    a_world = interp(a_w)
    # Rotate world accel into body at the SLERP-interpolated attitude.
    # (A nearest-frame attitude is off by up to |w|*dt_frame — with
    # gravity at 9.81 that is a systematic ~0.1-0.2 m/s^2 accel error,
    # larger than typical trajectory accelerations; the synthetic IMU
    # must be consistent with the synthetic poses or backend BAs get a
    # fictitious steady force.)
    import jax.numpy as jnp

    from ..math import lie

    i1 = np.clip(np.searchsorted(t_frames, ts, side="right"), 1,
                 len(t_frames) - 1)
    i0 = i1 - 1
    denom = np.maximum(t_frames[i1] - t_frames[i0], 1e-9)
    frac = np.clip((ts - t_frames[i0]) / denom, 0.0, 1.0)
    R0, R1 = Rwb[i0], Rwb[i1]
    dphi = np.asarray(lie.so3_log(
        jnp.asarray(np.einsum("tji,tjk->tik", R0, R1))))
    dRot = np.asarray(lie.so3_exp(jnp.asarray(dphi * frac[:, None])))
    Rb = np.einsum("tij,tjk->tik", R0, dRot)
    a_b = np.einsum("tij,ti->tj", Rb, a_world - g)  # R^T (a - g)
    gyro = w_b + bg + rng.randn(*w_b.shape) * noise_g
    acc = a_b + ba + rng.randn(*a_b.shape) * noise_a
    return ts.astype(np.float64), gyro.astype(np.float32), \
        acc.astype(np.float32)


def make_encoder_samples(t_frames, Rwb, p_wb, Rbe, tbe, rate_hz=100.0,
                         half_track=0.28, noise_v=0.0, seed=0):
    """Differential-drive wheel-speed stream consistent with the
    trajectory (the VEO/VIEO input; System::TrackOdom ENCODER mode).

    The encoder frame E (x forward, y left, z up) rides rigidly on the
    body: T_we(t) = T_wb(t) T_be.  Per sample interval the exact SE(3)
    delta of E is projected to SE(2) (yaw + in-plane translation) and
    inverted through the preintegrator's midpoint model
    (math/preintegration.preintegrate_encoder):
        dtheta = w dt,  dp = v dt [cos(theta+w dt/2), sin(theta+w dt/2)]
    so that preintegrating the returned wheel speeds reproduces the true
    planar motion to machine precision on planar trajectories.

    Returns (ts [T], v_left [T], v_right [T]).
    """
    import jax.numpy as jnp

    from ..math import lie

    rng = np.random.RandomState(seed)
    t_frames = np.asarray(t_frames, np.float64)
    ts = np.arange(t_frames[0], t_frames[-1], 1.0 / rate_hz)
    # sample endpoints (one extra for the last interval)
    te = np.concatenate([ts, [min(ts[-1] + 1.0 / rate_hz, t_frames[-1])]])

    # slerp body attitude + lerp position at the endpoints
    i1 = np.clip(np.searchsorted(t_frames, te, side="right"), 1,
                 len(t_frames) - 1)
    i0 = i1 - 1
    denom = np.maximum(t_frames[i1] - t_frames[i0], 1e-9)
    frac = np.clip((te - t_frames[i0]) / denom, 0.0, 1.0)
    R0, R1 = Rwb[i0], Rwb[i1]
    dphi = np.asarray(lie.so3_log(
        jnp.asarray(np.einsum("tji,tjk->tik", R0, R1))))
    dRot = np.asarray(lie.so3_exp(jnp.asarray(dphi * frac[:, None])))
    Rb = np.einsum("tij,tjk->tik", R0, dRot)
    pb = p_wb[i0] + (p_wb[i1] - p_wb[i0]) * frac[:, None]

    Rbe = np.asarray(Rbe, np.float64)
    tbe = np.asarray(tbe, np.float64)
    R_we = Rb @ Rbe
    p_we = pb + np.einsum("tij,j->ti", Rb, tbe)

    # exact E-frame deltas per interval
    dR_e = np.einsum("tji,tjk->tik", R_we[:-1], R_we[1:])
    dp_e = np.einsum("tji,tj->ti", R_we[:-1], p_we[1:] - p_we[:-1])
    ang = np.asarray(lie.so3_log(jnp.asarray(dR_e)))
    dt = np.diff(te)
    dt = np.maximum(dt, 1e-9)
    w = ang[:, 2] / dt
    # invert the midpoint translation model (project onto the midpoint
    # heading; theta starts at 0 each interval)
    c = np.cos(0.5 * ang[:, 2])
    s = np.sin(0.5 * ang[:, 2])
    v = (dp_e[:, 0] * c + dp_e[:, 1] * s) / dt
    v_left = v - w * half_track + rng.randn(len(v)) * noise_v
    v_right = v + w * half_track + rng.randn(len(v)) * noise_v
    return ts.astype(np.float64), v_left.astype(np.float32), \
        v_right.astype(np.float32)
