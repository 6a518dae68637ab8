"""Frame construction: the per-image measurement container.

Equivalent of src/Frame.cc / FrameBase.cpp (multi-cam ORB extraction
Frame.cc:259-277, ComputeStereoMatches :451, ComputeStereoFromRGBD :781,
grid binning FrameBase.h:221-233) — except a Frame here is a pytree of
fixed-capacity device arrays, its construction is one jitted program per
sensor mode, and there is no grid: matchers take the whole keypoint set
(ops/matching.py dense masked matrices replace GetFeaturesInArea).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..cameras import models as cm
from ..ops import matching, orb


class Frame(NamedTuple):
    """Measurement set of one (multi-camera) frame.

    uv:     [N, 2] keypoints (level-0 pixels, primary camera)
    level:  [N] octave
    angle:  [N]
    desc:   [N, 8] uint32
    ur:     [N] right-image u for stereo matches (<0 mono/unmatched)
    depth:  [N] metric depth (<0 unknown)
    valid:  [N]
    timestamp: scalar f64
    """

    uv: jax.Array
    level: jax.Array
    angle: jax.Array
    desc: jax.Array
    ur: jax.Array
    depth: jax.Array
    valid: jax.Array
    timestamp: jax.Array


def make_frame_from_features(uv, level, angle, desc, valid,
                             ur=None, depth=None, timestamp=0.0) -> Frame:
    """Assemble a Frame from pre-extracted features (simulation path and
    map-reuse deserialization)."""
    n = uv.shape[0]
    if ur is None:
        ur = jnp.full((n,), -1.0, jnp.float32)
    if depth is None:
        depth = jnp.full((n,), -1.0, jnp.float32)
    return Frame(
        uv=jnp.asarray(uv, jnp.float32),
        level=jnp.asarray(level, jnp.int32),
        angle=jnp.asarray(angle, jnp.float32),
        desc=jnp.asarray(desc, jnp.uint32),
        ur=jnp.asarray(ur, jnp.float32),
        depth=jnp.asarray(depth, jnp.float32),
        valid=jnp.asarray(valid, bool),
        timestamp=jnp.asarray(timestamp, jnp.float64),
    )


def build_stereo_frame(
    img_left: jax.Array,
    img_right: jax.Array,
    cfg: orb.OrbConfig,
    *,
    bf: float,
    min_depth: float = 0.1,
    max_depth: float = 40.0,
    timestamp=0.0,
) -> Frame:
    """Rectified-stereo frame: ORB on both images + row-search depth.

    One jitted program (caller jits); replaces the reference's two extraction
    threads + ComputeStereoMatches SAD refinement with batched extraction
    and Hamming row matching.
    """
    fl = orb.extract_orb(img_left, cfg)
    fr = orb.extract_orb(img_right, cfg)
    scales = jnp.asarray(cfg.level_scales, jnp.float32)
    u_r, _ = matching.search_stereo_rectified(
        fl.uv, fl.level, fl.desc, fl.valid,
        fr.uv, fr.level, fr.desc, fr.valid,
        min_disp=bf / max_depth, max_disp=bf / min_depth,
        level_scales=scales,
    )
    disp = fl.uv[:, 0] - u_r
    depth = jnp.where(u_r >= 0, bf / jnp.maximum(disp, 1e-6), -1.0)
    return Frame(
        uv=fl.uv, level=fl.level, angle=fl.angle, desc=fl.desc,
        ur=u_r, depth=depth, valid=fl.valid,
        timestamp=jnp.asarray(timestamp, jnp.float64),
    )


def build_rgbd_frame(
    img: jax.Array,
    depth_img: jax.Array,
    cfg: orb.OrbConfig,
    *,
    bf: float,
    depth_scale: float = 1.0,
    timestamp=0.0,
) -> Frame:
    """RGB-D frame (Frame::ComputeStereoFromRGBD): depth sampled at the
    keypoint, virtual right-u = u - bf/z."""
    f = orb.extract_orb(img, cfg)
    xi = jnp.clip(f.uv[:, 0].astype(jnp.int32), 0, depth_img.shape[1] - 1)
    yi = jnp.clip(f.uv[:, 1].astype(jnp.int32), 0, depth_img.shape[0] - 1)
    z = depth_img[yi, xi] * depth_scale
    has_d = z > 0
    ur = jnp.where(has_d, f.uv[:, 0] - bf / jnp.maximum(z, 1e-6), -1.0)
    return Frame(
        uv=f.uv, level=f.level, angle=f.angle, desc=f.desc,
        ur=ur, depth=jnp.where(has_d, z, -1.0), valid=f.valid,
        timestamp=jnp.asarray(timestamp, jnp.float64),
    )


def make_mono_frame(img: jax.Array, cfg: orb.OrbConfig, timestamp=0.0) -> Frame:
    f = orb.extract_orb(img, cfg)
    n = f.uv.shape[0]
    return Frame(
        uv=f.uv, level=f.level, angle=f.angle, desc=f.desc,
        ur=jnp.full((n,), -1.0, jnp.float32),
        depth=jnp.full((n,), -1.0, jnp.float32),
        valid=f.valid, timestamp=jnp.asarray(timestamp, jnp.float64),
    )
