"""Monocular pipeline: two-view initializer correctness + end-to-end mono
tracking on the synthetic world (scale-free ATE)."""

import jax
import jax.numpy as jnp
import numpy as np

from vieo_slam_tpu.cameras import models as cm
from vieo_slam_tpu.frontend.frame import make_frame_from_features
from vieo_slam_tpu.io.evaluate import ate
from vieo_slam_tpu.math import lie
from vieo_slam_tpu.sim.world import (
    SyntheticWorld, WorldConfig, circle_trajectory, trajectory_to_tcw,
)
from vieo_slam_tpu.solvers.initializer import monocular_init
from vieo_slam_tpu.system import System, SystemConfig

import pytest

pytestmark = pytest.mark.slow


class TestMonocularInit:
    def test_recovers_relative_pose(self):
        rng = np.random.RandomState(0)
        cam = cm.make_pinhole(400.0, 400.0, 320.0, 240.0, 640, 480)
        pw = rng.randn(300, 3).astype(np.float32) * [2, 1.5, 1] + [0, 0, 5]
        R21, t21 = lie.se3_exp(jnp.asarray(
            [0.05, -0.02, 0.08, 0.2, -0.1, 0.05], jnp.float32))
        t21 = t21 / jnp.linalg.norm(t21)
        uv1 = np.array(cm.project(cam, jnp.asarray(pw)))
        p2 = pw @ np.asarray(R21).T + np.asarray(t21)
        uv2 = np.array(cm.project(cam, jnp.asarray(p2)))
        uv1 += rng.randn(300, 2) * 0.3
        uv2 += rng.randn(300, 2) * 0.3
        # 20% mismatches
        uv2[:60] = rng.rand(60, 2) * [640, 480]
        res = monocular_init(
            jnp.asarray(uv1.astype(np.float32)),
            jnp.asarray(uv2.astype(np.float32)),
            jnp.ones(300, bool), cam, jax.random.PRNGKey(1))
        assert bool(res.ok)
        dR = np.asarray(res.R21) @ np.asarray(R21).T
        ang = np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))
        assert ang < 0.01
        # translation direction (sign-fixed up-to-scale)
        tdir = np.asarray(res.t21)
        cos = abs(float(tdir @ np.asarray(t21)))
        assert cos > 0.995
        g = np.asarray(res.good)
        assert g[:60].mean() < 0.2 and g[60:].mean() > 0.7

    def test_planar_scene_homography_path(self):
        """All landmarks on one plane: the essential model is degenerate
        (any E fitting the induced homography scores high), the H model
        must win the race and recover the motion
        (Initializer::ReconstructH, src/Initializer.cc)."""
        rng = np.random.RandomState(4)
        cam = cm.make_pinhole(400.0, 400.0, 320.0, 240.0, 640, 480)
        # plane z = 4 + 0.3x + 0.1y (tilted wall)
        xy = rng.randn(300, 2).astype(np.float32) * [2.0, 1.5]
        z = 4.0 + 0.3 * xy[:, 0] + 0.1 * xy[:, 1]
        pw = np.concatenate([xy, z[:, None]], -1).astype(np.float32)
        R21, t21 = lie.se3_exp(jnp.asarray(
            [0.04, -0.03, 0.06, 0.25, -0.12, 0.08], jnp.float32))
        t21 = t21 / jnp.linalg.norm(t21)
        uv1 = np.array(cm.project(cam, jnp.asarray(pw)))
        p2 = pw @ np.asarray(R21).T + np.asarray(t21)
        uv2 = np.array(cm.project(cam, jnp.asarray(p2)))
        uv1 += rng.randn(300, 2) * 0.3
        uv2 += rng.randn(300, 2) * 0.3
        uv2[:45] = rng.rand(45, 2) * [640, 480]   # 15% mismatches
        res = monocular_init(
            jnp.asarray(uv1.astype(np.float32)),
            jnp.asarray(uv2.astype(np.float32)),
            jnp.ones(300, bool), cam, jax.random.PRNGKey(3))
        assert bool(res.ok)
        dR = np.asarray(res.R21) @ np.asarray(R21).T
        ang = np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))
        assert ang < 0.02, ang
        cos = abs(float(np.asarray(res.t21) @ np.asarray(t21)))
        assert cos > 0.99, cos
        g = np.asarray(res.good)
        assert g[45:].mean() > 0.6

    def test_rejects_pure_rotation(self):
        rng = np.random.RandomState(1)
        cam = cm.make_pinhole(400.0, 400.0, 320.0, 240.0, 640, 480)
        pw = rng.randn(300, 3).astype(np.float32) * [2, 1.5, 1] + [0, 0, 5]
        R21 = np.asarray(lie.so3_exp(jnp.asarray([0.0, 0.1, 0.02])))
        uv1 = np.array(cm.project(cam, jnp.asarray(pw)))
        uv2 = np.array(cm.project(cam, jnp.asarray(pw @ R21.T)))
        res = monocular_init(
            jnp.asarray(uv1.astype(np.float32)),
            jnp.asarray(uv2.astype(np.float32)),
            jnp.ones(300, bool), cam, jax.random.PRNGKey(2))
        assert not bool(res.ok)  # no parallax -> rejected


class TestMonocularSystem:
    def test_end_to_end(self):
        cam = cm.make_pinhole(400.0, 400.0, 320.0, 240.0, 640, 480)
        world = SyntheticWorld(WorldConfig(n_landmarks=4000, seed=7,
                                           extent=(6.0, 4.5, 3.0)))
        n = 50
        ts = np.arange(n) * 0.1
        Rwc, twc, _, _ = circle_trajectory(ts, radius=1.0, omega=0.25,
                                           look_outward=True)
        Rcw, tcw = trajectory_to_tcw(Rwc, twc)
        sys_ = System(cam, bf=0.0, cfg=SystemConfig())
        rng = np.random.RandomState(41)
        states = []
        for i in range(n):
            obs = world.observe(Rcw[i], tcw[i], cam, bf=0.0, n_kp=500,
                                pixel_noise=0.25, bit_flips=4, clutter=40,
                                rng=rng, max_depth=10.0)
            frame = make_frame_from_features(
                obs["uv"], obs["level"], obs["angle"], obs["desc"],
                obs["valid"], timestamp=ts[i])
            states.append(sys_.track_frame(frame))
        ok = sum(s.name == "OK" for s in states)
        assert ok > 40, [s.name for s in states]
        traj = sys_.tracker.trajectory
        t_est = np.asarray([x[0] for x in traj])
        p_est = np.asarray([-(x[1].T @ x[2]) for x in traj])
        # Scale-free alignment (monocular).
        res = ate(t_est, p_est, ts, twc, with_scale=True)
        assert res["rmse"] < 0.12, res
