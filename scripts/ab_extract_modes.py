"""A/B the extraction-stage backends on the real TPU.

Grid: {per-level select, batched select} x {one-hot gather, Pallas
gather kernel}, on the restructured extract_orb (cross-level fused tail
always on for TPU). Honest chained timing (deps inside jit; bench.py
methodology), best of 3 windows.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 570 python -u \
     scripts/ab_extract_modes.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

import vieo_slam_tpu  # noqa: F401
from vieo_slam_tpu.ops import orb

print("devices:", jax.devices(), flush=True)

# Flip the relay into real mode BEFORE any timing: clean-mode timings
# are fiction until the process reads device data once (r2 axon lore;
# the first grid row of the 2026-08-20 run measured 0.009 ms).
np.asarray(jax.block_until_ready(jax.jit(lambda x: x + 1.0)(
    jnp.ones(8, jnp.float32))))

rng = np.random.RandomState(0)
H0, W0 = 480, 752
base = (rng.rand(H0, W0).astype(np.float32) * 200 + 20)
ys = rng.randint(3, H0 - 3, 600)
xs = rng.randint(3, W0 - 3, 600)
base[ys, xs] = 255.0
img = jnp.asarray(base)


def measure_rtt():
    jax.block_until_ready(jnp.zeros(()) + 1)
    t0 = time.perf_counter()
    for _ in range(5):
        jax.block_until_ready(jnp.zeros(()) + 1)
    return (time.perf_counter() - t0) / 5


def chain_time(step, args, iters=40):
    dep = jnp.asarray(0.0, jnp.float32)
    jax.block_until_ready(step(dep, *args))
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


CONFIGS = [("1200/8lv", orb.OrbConfig(n_features=1200, n_levels=8)),
           ("375/4lv@2", orb.OrbConfig(n_features=375, n_levels=4,
                                       scale_factor=2.0))]

ref_desc = {}
for sel in ("per", "batched", "concat"):
    for gk in (False, True):
        orb._use_batched_select = (lambda f=(sel == "batched"): f)
        orb._use_concat_select = (lambda f=(sel == "concat"): f)
        orb._use_gather_kernel = (lambda *_, f=gk: f)
        for name, cfg in CONFIGS:
            @jax.jit
            def ext_step(dep, im, cfg=cfg):
                f = orb.extract_orb(im + dep * 1e-12, cfg)
                return (jnp.min(f.score) * 0.0
                        + jnp.min(f.desc).astype(jnp.float32) * 0.0)

            t = chain_time(ext_step, (img,))
            # valid-row equivalence across modes
            f = jax.jit(lambda im, cfg=cfg: orb.extract_orb(im, cfg))(img)
            v = np.asarray(f.valid)
            key = (np.asarray(f.uv)[v].tobytes(),
                   np.asarray(f.desc)[v].tobytes())
            tag = "same" if ref_desc.setdefault(name, key) == key else "DIFF"
            print(f"extract {name} sel={sel} "
                  f"gather_kernel={int(gk)}: {t:.3f} ms [{tag}]",
                  flush=True)
