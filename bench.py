"""Benchmark: stereo-SLAM frontend per-frame latency on the real TPU chip.

Measures the production per-frame pipeline — ORB extraction on both stereo
images (1200 features, 8 levels, 480x752), rectified stereo Hamming
matching, and the two-stage track kernel (local-map association +
motion-only robust BA, schedule (3,6,2,4)) — the same work the reference's
Tracking thread does per frame (SURVEY.md §3.1), against its published
35.x ms/frame (undistorted, 1200 features, i9-14900HX; BASELINE.md).

Structure note: the stages run as SEPARATE jits chained per frame — on
this backend one fused program schedules ~10x slower than its parts
(TODO.md); per-frame latency is blocked each iteration because the pose
chain serializes frames.

Prints ONE JSON line:
  {"metric": "frontend_ms_per_frame", "value": ..., "unit": "ms",
   "vs_baseline": <reference_ms / ours — speedup factor>}
"""

import json
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

from vieo_slam_tpu.cameras import models as cm  # noqa: E402
from vieo_slam_tpu.frontend.frame import Frame  # noqa: E402
from vieo_slam_tpu.frontend.tracking import _track_kernel  # noqa: E402
from vieo_slam_tpu.ops import matching, orb  # noqa: E402

BASELINE_MS = 35.0  # reference frontend ms/frame, undistorted 1200 feats

H, W = 480, 752
N_FEATURES = 1200
SLAB = 4096
N_WARMUP = 3
N_ITERS = 30
SCHEDULE = (3, 6, 2, 4)


def main():
    cfg = orb.OrbConfig(n_features=N_FEATURES, n_levels=8)
    cam = cm.make_pinhole(458.0, 458.0, 376.0, 240.0, W, H)
    bf = 458.0 * 0.11
    inv_sigma2 = jax.device_put(
        (1.0 / cfg.level_scales ** 2).astype(np.float32))
    scales = jax.device_put(cfg.level_scales.astype(np.float32))

    extract = jax.jit(lambda im: orb.extract_orb(im, cfg))

    @jax.jit
    def stereo_depth(fl, fr):
        u_r, _ = matching.search_stereo_rectified(
            fl.uv, fl.level, fl.desc, fl.valid,
            fr.uv, fr.level, fr.desc, fr.valid,
            min_disp=bf / 40.0, max_disp=bf / 0.1, level_scales=scales)
        disp = fl.uv[:, 0] - u_r
        depth = jnp.where(u_r >= 0, bf / jnp.maximum(disp, 1e-6), -1.0)
        return u_r, depth

    track = jax.jit(
        lambda fl, u_r, depth, lm_pw, lm_desc, lm_valid: _track_kernel(
            jnp.eye(3), jnp.zeros(3),
            lm_pw, lm_desc, jnp.zeros(SLAB, jnp.int32), lm_valid,
            Frame(uv=fl.uv, level=fl.level, angle=fl.angle, desc=fl.desc,
                  ur=u_r, depth=depth, valid=fl.valid,
                  timestamp=jnp.asarray(0.0)),
            inv_sigma2, scales,
            jnp.asarray(15.0, jnp.float32), jnp.asarray(6.0, jnp.float32),
            jnp.asarray(bf, jnp.float32), cam, schedule=SCHEDULE))

    def frame_step(img_l, img_r, lm_pw, lm_desc, lm_valid):
        fl = extract(img_l)
        fr = extract(img_r)
        u_r, depth = stereo_depth(fl, fr)
        return track(fl, u_r, depth, lm_pw, lm_desc, lm_valid)

    # Stage all inputs on device once (multi-second relay per transfer).
    rng = np.random.RandomState(0)
    B = 4
    base = rng.rand(B, H, W).astype(np.float32) * 200 + 20
    for b in range(B):
        ys = rng.randint(20, H - 20, 400)
        xs = rng.randint(20, W - 20, 400)
        base[b, ys, xs] = 255.0
    # Pre-split per-frame device arrays: an eager `imgs[i]` slice in the
    # timed loop would be a separate relay dispatch per iteration.
    imgs_l = [jax.device_put(base[b]) for b in range(B)]
    imgs_r = [jax.device_put(np.roll(base[b], -6, axis=1).copy())
              for b in range(B)]
    lm_pw = jax.device_put(
        (rng.randn(SLAB, 3) * [2, 1.5, 1] + [0, 0, 6]).astype(np.float32))
    lm_desc = jax.device_put(
        rng.randint(0, 2 ** 32, (SLAB, 8), np.uint64).astype(np.uint32))
    # NOTE: never run EAGER jax ops in this process (even one jnp.ones
    # outside jit flips the axon relay into a ~75 ms/execution slow mode,
    # measured; numpy + device_put keeps the 0.1 ms fast path).
    lm_valid = jax.device_put(np.ones(SLAB, bool))

    out = None
    for i in range(N_WARMUP):
        out = frame_step(imgs_l[i % B], imgs_r[i % B],
                         lm_pw, lm_desc, lm_valid)
    jax.block_until_ready(out)

    t0 = time.time()
    for i in range(N_ITERS):
        out = jax.block_until_ready(
            frame_step(imgs_l[i % B], imgs_r[i % B],
                       lm_pw, lm_desc, lm_valid))
    ms = (time.time() - t0) / N_ITERS * 1e3

    print(json.dumps({
        "metric": "frontend_ms_per_frame",
        "value": round(ms, 3),
        "unit": "ms",
        "vs_baseline": round(BASELINE_MS / ms, 2),
    }))


if __name__ == "__main__":
    main()
