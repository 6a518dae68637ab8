"""Intra-extraction stage profile on the real TPU: pyramid build, FAST
score+NMS (Pallas), keypoint selection, fused orientation+BRIEF tail —
chained-dependency timing per stage (bench.py methodology).

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/profile_extract.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from vieo_slam_tpu.ops import orb

H, W = 480, 752
N = int(os.environ.get("PROF_FRAMES", "100"))
FEATS = int(os.environ.get("PROF_FEATS", "375"))


def force_real_mode():
    y = jax.jit(lambda x: x + 1.0)(jax.device_put(np.ones(8, np.float32)))
    np.asarray(jax.block_until_ready(y))


def measure_rtt():
    g = jax.jit(lambda x: x * 2.0)
    x = jax.device_put(np.ones((8, 128), np.float32))
    jax.block_until_ready(g(x))
    t0 = time.time()
    for _ in range(10):
        jax.block_until_ready(g(x))
    return (time.time() - t0) / 10


def chain_time(fn, img, rtt, reps=3):
    dep0 = jnp.asarray(0.0, jnp.float32)

    @jax.jit
    def step(im, dep):
        out = fn(im + 1e-12 * dep)
        # consume EVERY output leaf: anything not feeding the returned
        # scalar is dead-code-eliminated by XLA and silently untimed
        acc = jnp.asarray(0.0, jnp.float32)
        for x in jax.tree.leaves(out):
            if hasattr(x, "dtype"):
                acc = acc + x.astype(jnp.float32).sum() * 1e-12
        return acc

    dep = step(img, dep0)
    jax.block_until_ready(dep)
    best = float("inf")
    for _ in range(reps):
        dep = dep0
        st = time.time()
        for _ in range(N):
            dep = step(img, dep)
        jax.block_until_ready(dep)
        best = min(best, (time.time() - st - rtt) / N * 1e3)
    return best


def main():
    force_real_mode()
    rtt = measure_rtt()
    # 375-feat rows use the reference's own fast config (4 lv @ 2.0,
    # EuRoC_VIO_dist_fast.yaml), matching bench.py's feat375 row
    cfg = orb.OrbConfig(n_features=FEATS, n_levels=8) if FEATS >= 800 \
        else orb.OrbConfig(n_features=FEATS, n_levels=4, scale_factor=2.0)
    rng = np.random.RandomState(0)
    base = rng.rand(H, W).astype(np.float32) * 200 + 20
    ys = rng.randint(20, H - 20, 400)
    xs = rng.randint(20, W - 20, 400)
    base[ys, xs] = 255.0
    img = jax.device_put(base)

    rows = {}
    rows["pyramid"] = chain_time(
        lambda im: orb.build_pyramid(im, cfg), img, rtt)

    def pyr_scores(im):
        pyr = orb.build_pyramid(im, cfg)
        return [orb._blended_score(p, cfg) for p in pyr]

    rows["pyr+score"] = chain_time(pyr_scores, img, rtt)

    def pyr_score_sel(im):
        pyr = orb.build_pyramid(im, cfg)
        outs = []
        for lv, p in enumerate(pyr):
            n_l = int(cfg.features_per_level[lv])
            if n_l == 0:
                continue
            s = orb._blended_score(p, cfg)
            outs.append(orb.select_keypoints(s, n_l, cfg))
        return outs

    rows["pyr+score+select"] = chain_time(pyr_score_sel, img, rtt)
    rows["full_extract"] = chain_time(
        lambda im: orb.extract_orb(im, cfg), img, rtt)
    print({"feats": FEATS, "rtt_ms": round(rtt * 1e3, 2),
           **{k: round(v, 3) for k, v in rows.items()}})


if __name__ == "__main__":
    main()
