"""Validate ops/pallas_gather.gather_patches_kernel on the real TPU.

1. Exact equivalence vs gather_patches(mxu=False) (f32 oracle) at the
   bench level-0 shape, border-clamped centers included.
2. Honest chained timing: the dependency feeds through INSIDE one
   jitted step program (an eager op per iteration costs a relay sync
   round-trip and fabricates ~30 ms/iter — bench.py run_stages lore).

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 550 python -u \
     scripts/validate_pallas_gather.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

import vieo_slam_tpu  # noqa: F401  (matmul precision)
from vieo_slam_tpu.ops import orb
from vieo_slam_tpu.ops import pallas_gather

print("devices:", jax.devices(), flush=True)

rng = np.random.RandomState(0)
H0, W0 = 480, 752
img_np = (rng.rand(H0, W0).astype(np.float32) * 200 + 20)
img = jnp.asarray(img_np)
N = 256
centers_np = np.concatenate([
    np.stack([rng.randint(0, W0, N - 4), rng.randint(0, H0, N - 4)], -1),
    [[0, 0], [W0 - 1, H0 - 1], [2, H0 - 1], [W0 - 1, 1]],
]).astype(np.int32)
centers = jnp.asarray(centers_np)
R = orb._TAIL_R

# ---- equivalence ----
want = np.asarray(orb.gather_patches(img, centers, R, mxu=False))
got = np.asarray(pallas_gather.gather_patches_kernel(img, centers, R))
exact = np.array_equal(got, want)
print(f"equivalence (N={N}, d={2*R+1}): "
      f"{'EXACT' if exact else 'MISMATCH maxdiff %.3e' % np.abs(got-want).max()}",
      flush=True)
assert exact


def measure_rtt():
    x = jnp.zeros(())
    jax.block_until_ready(x + 1)
    t0 = time.perf_counter()
    for _ in range(5):
        jax.block_until_ready(jnp.zeros(()) + 1)
    return (time.perf_counter() - t0) / 5


def chain_time(step, args, iters=50):
    """step(dep, *args) -> f32 scalar dep; all chaining inside jit."""
    dep = jnp.asarray(0.0, jnp.float32)
    out = step(dep, *args)
    jax.block_until_ready(out)          # real mode + compile
    rtt = measure_rtt()
    best = float("inf")
    for _ in range(3):
        dep = jnp.asarray(0.0, jnp.float32)
        t0 = time.perf_counter()
        for _ in range(iters):
            dep = step(dep, *args)
        jax.block_until_ready(dep)
        best = min(best, (time.perf_counter() - t0 - rtt) / iters * 1e3)
    return best


@jax.jit
def step_onehot(dep, im, c):
    out = orb.gather_patches(im + dep * 1e-12, c, R, mxu=True)
    return jnp.min(out) * 0.0


@jax.jit
def step_kernel(dep, im, c):
    out = pallas_gather.gather_patches_kernel(im + dep * 1e-12, c, R)
    return jnp.min(out) * 0.0


t_onehot = chain_time(step_onehot, (img, centers))
t_kern = chain_time(step_kernel, (img, centers))
print(f"gather d=53 N={N}: one-hot {t_onehot:.3f} ms  "
      f"pallas {t_kern:.3f} ms  ({t_onehot/t_kern:.2f}x)", flush=True)


def tail_step(flag):
    orb._use_gather_kernel = (lambda *_, f=flag: f)

    @jax.jit
    def step(dep, im, c):
        ang, desc = orb.extract_tail_fused(im + dep * 1e-12, c)
        return jnp.min(ang) * 0.0 + jnp.min(desc).astype(jnp.float32) * 0.0
    return step


for mode, flag in (("one-hot", False), ("kernel", True)):
    t = chain_time(tail_step(flag), (img, centers))
    print(f"extract_tail_fused [{mode}]: {t:.3f} ms", flush=True)

# ---- whole-frame extraction A/B (1200 feats, 8 levels) ----
cfg = orb.OrbConfig(n_features=1200, n_levels=8)
for mode, flag in (("one-hot", False), ("kernel", True)):
    orb._use_gather_kernel = (lambda *_, f=flag: f)

    @jax.jit
    def ext_step(dep, im):
        f = orb.extract_orb(im + dep * 1e-12, cfg)
        return (jnp.min(f.score) * 0.0
                + jnp.min(f.desc).astype(jnp.float32) * 0.0)

    t = chain_time(ext_step, (img,), iters=30)
    print(f"extract_orb 1200/8lv [{mode}]: {t:.3f} ms", flush=True)
