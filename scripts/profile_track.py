"""Dissect the track-kernel latency: association vs pose-opt vs schedule.

Honest axon methodology (TODO.md): flip real mode, measure RTT, chain N
dependent executions, block once.
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from vieo_slam_tpu.cameras import models as cm
from vieo_slam_tpu.frontend.frame import Frame
from vieo_slam_tpu.frontend.tracking import _track_kernel
from vieo_slam_tpu.ops import matching
from vieo_slam_tpu.solvers.motion_ba import PoseObs, pose_optimization

SLAB = 4096
NKP = 1200
N = 50


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


def timeit(fn, chain, rtt, n=N):
    out = fn(chain)
    jax.block_until_ready(out)
    st = time.time()
    for _ in range(n):
        chain2 = fn(chain)
        chain = chain2
    jax.block_until_ready(chain)
    return (time.time() - st - rtt) / n * 1e3


def main():
    force_real_mode()
    rng = np.random.RandomState(0)
    cam = cm.make_pinhole(458.0, 458.0, 376.0, 240.0, 752, 480)
    bf = 458.0 * 0.11
    inv_sigma2 = (1.0 / (1.2 ** (2 * np.arange(8)))).astype(np.float32)
    scales = (1.2 ** np.arange(8)).astype(np.float32)

    lm_pw = jax.device_put(
        (rng.randn(SLAB, 3) * [2, 1.5, 1] + [0, 0, 6]).astype(np.float32))
    lm_desc = jax.device_put(
        rng.randint(0, 2 ** 32, (SLAB, 8), np.uint64).astype(np.uint32))
    lm_level = jax.device_put(np.zeros(SLAB, np.int32))
    lm_valid = jax.device_put(np.ones(SLAB, bool))
    frame = Frame(
        uv=jax.device_put(rng.rand(NKP, 2).astype(np.float32) * [752, 480]),
        level=jax.device_put(np.zeros(NKP, np.int32)),
        angle=jax.device_put(np.zeros(NKP, np.float32)),
        desc=jax.device_put(
            rng.randint(0, 2 ** 32, (NKP, 8), np.uint64).astype(np.uint32)),
        ur=jax.device_put(rng.rand(NKP).astype(np.float32) * 700),
        depth=jax.device_put(rng.rand(NKP).astype(np.float32) * 10),
        valid=jax.device_put(np.ones(NKP, bool)),
        timestamp=jnp.asarray(0.0))
    R0 = jax.device_put(np.eye(3, dtype=np.float32))
    t0v = jax.device_put(np.zeros(3, np.float32))
    rtt = measure_rtt()
    print(f"rtt_ms {rtt*1e3:.2f}")

    # full kernel at various schedules and modes
    for mode, sched in [("lm", (3, 6, 2, 4)), ("plm", (2, 2, 1, 2)),
                        ("plm", (2, 3, 1, 2)), ("gn", (2, 3, 1, 2))]:
        k = jax.jit(lambda R, t, s=sched, md=mode: _track_kernel(
            R, t, lm_pw, lm_desc, lm_level, lm_valid, frame,
            jnp.asarray(inv_sigma2), jnp.asarray(scales),
            jnp.asarray(15.0, jnp.float32), jnp.asarray(6.0, jnp.float32),
            jnp.asarray(bf, jnp.float32), cam, schedule=s, opt_mode=md))
        ms = timeit(lambda c: (lambda r: (r.Rcw, r.tcw))(k(*c)),
                    (R0, t0v), rtt)
        print(f"track[{mode}]{sched} {ms:.3f} ms", flush=True)

    # association only (one search_by_projection) at two slab sizes
    for slab in [SLAB, 2048]:
        pw_s, desc_s = lm_pw[:slab], lm_desc[:slab]
        lvl_s, val_s = lm_level[:slab], lm_valid[:slab]

        @jax.jit
        def assoc(R, t, pw_s=pw_s, desc_s=desc_s, lvl_s=lvl_s,
                  val_s=val_s):
            pc = jnp.einsum("ij,nj->ni", R, pw_s) + t
            uvp = cm.project(cam, pc)
            vis = val_s & (pc[:, 2] > 0.1) & cm.in_image(cam, uvp, 1.0)
            idx, dist = matching.search_by_projection(
                uvp, lvl_s, desc_s, vis,
                frame.uv, frame.level, frame.desc, frame.valid,
                radius=jnp.asarray(15.0, jnp.float32),
                level_scales=jnp.asarray(scales),
                max_dist=75, ratio=0.8, level_tolerance=8)
            # fold into a pose-like carry to chain
            d = jnp.sum(jnp.where(idx >= 0, dist, 0)).astype(jnp.float32)
            return R + 1e-20 * d, t

        ms = timeit(lambda c: assoc(*c), (R0, t0v), rtt)
        print(f"assoc_once[slab={slab}] {ms:.3f} ms", flush=True)

    # pose optimization only, various (rounds, iters), lm vs gn
    kp = jnp.arange(SLAB) % NKP
    obs = PoseObs(pw=lm_pw, uv=frame.uv[kp], ur=frame.ur[kp],
                  inv_sigma2=jnp.ones(SLAB, jnp.float32),
                  valid=jnp.ones(SLAB, bool))
    for mode, (r, i) in [("lm", (3, 6)), ("plm", (2, 2)), ("gn", (2, 3))]:
        po = jax.jit(lambda R, t, r=r, i=i, mode=mode: pose_optimization(
            R, t, obs, cam, jnp.asarray(bf, jnp.float32),
            rounds=r, iters_per_round=i, mode=mode))
        ms = timeit(lambda c: (lambda res: (res.Rcw, res.tcw))(po(*c)),
                    (R0, t0v), rtt)
        print(f"pose_opt[{mode}]({r}x{i}) {ms:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
