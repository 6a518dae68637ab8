"""Image-domain end-to-end test: pixels -> ORB -> stereo -> track -> map.

The production path (build_stereo_frame on rendered images) gated by ATE —
what SURVEY §7 flags as "ORB exactness vs ATE": a bad BRIEF pattern,
keypoint-selection regression, or stereo-matching bug fails this even if
the feature-level simulator tests pass.  Reference equivalent: the EuRoC
evaluation harness (Examples/RunEuRoC, SURVEY §4).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vieo_slam_tpu.cameras import models as cm
from vieo_slam_tpu.frontend.frame import build_stereo_frame
from vieo_slam_tpu.io.evaluate import ate
from vieo_slam_tpu.ops import orb
from vieo_slam_tpu.sim.world import (
    SyntheticWorld, WorldConfig, circle_trajectory, trajectory_to_tcw,
)
from vieo_slam_tpu.system import System, SystemConfig

pytestmark = pytest.mark.slow

BASELINE = 0.2


@pytest.fixture(scope="module")
def image_run():
    cam = cm.make_pinhole(400.0, 400.0, 320.0, 240.0, 640, 480)
    bf = 400.0 * BASELINE
    world = SyntheticWorld(WorldConfig(n_landmarks=1800, seed=3,
                                       extent=(6.0, 4.5, 3.0)))
    n_frames = 40
    ts = np.arange(n_frames) * 0.1
    Rwc, twc, _, _ = circle_trajectory(ts, radius=1.0, omega=0.25,
                                       look_outward=True)
    Rcw, tcw = trajectory_to_tcw(Rwc, twc)

    cfg = orb.OrbConfig(n_features=600, n_levels=4)
    build = jax.jit(lambda l, r, t: build_stereo_frame(
        l, r, cfg, bf=bf, min_depth=0.3, max_depth=15.0, timestamp=t))

    from vieo_slam_tpu.frontend.tracking import TrackerConfig
    sys_ = System(cam, bf, SystemConfig(
        tracker=TrackerConfig(use_predicted_scale=True)))
    states = []
    for i in range(n_frames):
        img_l, img_r = world.render_stereo(cam, Rcw[i], tcw[i], BASELINE)
        frame = build(jnp.asarray(img_l), jnp.asarray(img_r),
                      jnp.asarray(ts[i], jnp.float64))
        states.append(sys_.track_frame(frame))
    return sys_, states, ts, twc


class TestImageLevelE2E:
    def test_no_loss(self, image_run):
        sys_, states, ts, twc = image_run
        lost = sum(s.name == "LOST" for s in states)
        assert lost == 0, [s.name for s in states]

    def test_ate(self, image_run):
        sys_, states, ts, twc = image_run
        traj = sys_.tracker.trajectory
        t_est = np.asarray([x[0] for x in traj])
        p_est = np.asarray([-(x[1].T @ x[2]) for x in traj])
        res = ate(t_est, p_est, ts, twc)
        # cm-level gate (round-3: the pixel path measures ~3 mm on this
        # sequence; 0.02 m keeps slack for rendering/quantization
        # variance while still failing hard on any descriptor /
        # selection / stereo regression).
        assert res["rmse"] < 0.02, res

    def test_map_populated(self, image_run):
        sys_, *_ = image_run
        assert sys_.map.n_keyframes() >= 5
        assert sys_.map.n_landmarks() > 200


def test_orb_repeatability_on_rendered_views():
    """ORB keypoints must re-fire on the same world structure from a
    nearby viewpoint, and descriptors must match (ORBextractor.cc
    quality surface, reference src/ORBextractor.cc:518-1083)."""
    from vieo_slam_tpu.ops import matching

    cam = cm.make_pinhole(400.0, 400.0, 320.0, 240.0, 640, 480)
    world = SyntheticWorld(WorldConfig(n_landmarks=1500, seed=3,
                                       extent=(6.0, 4.5, 3.0)))
    ts = np.arange(2) * 0.2
    Rwc, twc, _, _ = circle_trajectory(ts, radius=1.0, omega=0.25,
                                       look_outward=True)
    Rcw, tcw = trajectory_to_tcw(Rwc, twc)
    img0 = world.render_view(cam, Rcw[0], tcw[0])
    img1 = world.render_view(cam, Rcw[1], tcw[1])
    cfg = orb.OrbConfig(n_features=500, n_levels=4)
    ext = jax.jit(lambda im: orb.extract_orb(im, cfg))
    f0 = ext(jnp.asarray(img0))
    f1 = ext(jnp.asarray(img1))
    n0 = int(np.asarray(f0.valid).sum())
    n1 = int(np.asarray(f1.valid).sum())
    assert n0 > 250 and n1 > 250, (n0, n1)

    idx, _ = matching.match_descriptors(f0.desc, f1.desc, f0.valid,
                                        f1.valid, max_dist=60)
    idx = np.asarray(idx)
    matched = idx >= 0
    assert matched.sum() > 0.3 * n0, (matched.sum(), n0)

    # Geometric consistency: matched pairs must agree with the true
    # inter-frame motion (projected flow), i.e. matches are not random.
    uv0 = np.asarray(f0.uv)[matched]
    uv1 = np.asarray(f1.uv)[np.clip(idx[matched], 0, None)]
    # unproject uv0 at its true depth using the world: approximate via
    # epipolar sanity — displacement must be small and consistent.
    flow = uv1 - uv0
    med = np.median(flow, axis=0)
    spread = np.median(np.abs(flow - med), axis=0)
    assert np.all(np.abs(med) < 40.0), med
    assert np.all(spread < 12.0), spread
