"""Validate ops/pallas_fast.fast_nms_blend on the real TPU.

1. Bit-equivalence vs the XLA composition (fast_score_maps + nms3 +
   blend) at every pyramid-level shape of the 480x752 bench image.
2. Honest chained timing (flip real mode, chain N dependent execs,
   block once) for both paths, plus the full extract_orb A/B with
   FAST_KERNEL_MODE on/off.

Run: PYTHONPATH=/root/repo:$PYTHONPATH timeout 550 python -u scripts/validate_pallas_fast.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

import vieo_slam_tpu  # noqa: F401  (matmul precision)
from vieo_slam_tpu.ops import orb
from vieo_slam_tpu.ops import pallas_fast

print("devices:", jax.devices(), flush=True)

rng = np.random.RandomState(0)
H0, W0 = 480, 752
base = (rng.rand(H0, W0).astype(np.float32) * 200 + 20)
ys = rng.randint(3, H0 - 3, 600)
xs = rng.randint(3, W0 - 3, 600)
base[ys, xs] = 255.0

cfg = orb.OrbConfig(n_features=1200, n_levels=8)
th, tl = cfg.fast_threshold, cfg.fast_min_threshold


def xla_blend(im):
    s_hi, s_lo = orb.fast_score_maps(im, (th, tl))
    nh, nl = orb.nms3(s_hi), orb.nms3(s_lo)
    return jnp.where(nh > 0, nh + 1e4, nl)


xla_blend_j = jax.jit(xla_blend)

# ---- equivalence at every level shape ----
# On hardware the two paths differ by summation order (XLA refuses a
# fixed order across fusion choices): tolerate 1-ulp drift (measured
# max |diff| 9.8e-4 on ~1e3 scores) but demand identical support.
ok_all = True
for lv in range(cfg.n_levels):
    s = float(cfg.level_scales[lv])
    h, w = int(round(H0 / s)), int(round(W0 / s))
    im_np = base[:h, :w]
    im = jnp.asarray(im_np)
    want = np.asarray(xla_blend_j(im))
    got = np.asarray(pallas_fast.fast_nms_blend(im, th, tl))
    same = (np.allclose(got, want, rtol=1e-5, atol=1e-2)
            and np.array_equal(got > 0, want > 0))
    ok_all &= same
    print(f"level {lv} ({h}x{w}): {'OK' if same else 'MISMATCH'} "
          f"(nnz want {np.count_nonzero(want)}, got {np.count_nonzero(got)}, "
          f"maxdiff {np.abs(got - want).max():.2e})",
          flush=True)
assert ok_all, "Pallas kernel mismatch on TPU"

# ---- honest timing: two-point chain fit (slope cancels RTT/fixed
# overheads — subtracting a single measured "RTT" is unreliable when
# the relay jitters and the probe includes a megabyte map transfer) ----
def chain_time(fn, im, n1=40, n2=200):
    def run(n):
        t0 = time.perf_counter()
        y = im
        for _ in range(n):
            y = fn(y * 1.0)        # dependent chain
        jax.block_until_ready(y)
        return time.perf_counter() - t0
    y = fn(im)                     # compile
    np.asarray(y)                  # flip real mode
    run(4)                         # warm
    t1 = min(run(n1) for _ in range(2))
    t2 = min(run(n2) for _ in range(2))
    return (t2 - t1) / (n2 - n1) * 1e3


im0 = jnp.asarray(base)
t_xla = chain_time(xla_blend_j, im0)
t_pal = chain_time(lambda im: pallas_fast.fast_nms_blend(im, th, tl), im0)
print(f"blend 480x752: XLA {t_xla:.3f} ms, "
      f"Pallas {t_pal:.3f} ms ({t_xla / max(t_pal, 1e-9):.2f}x)", flush=True)

# ---- full extract A/B ----
def extract_time(mode, n1=20, n2=80):
    orb.FAST_KERNEL_MODE = mode
    f = jax.jit(lambda im: orb.extract_orb(im, cfg))

    def run(n):
        t0 = time.perf_counter()
        y = im0
        r = None
        for _ in range(n):
            y = y * 1.0
            r = f(y)
        jax.block_until_ready(r.desc)
        return time.perf_counter() - t0
    np.asarray(f(im0).desc)        # compile + flip
    run(3)
    t1 = min(run(n1) for _ in range(2))
    t2 = min(run(n2) for _ in range(2))
    return (t2 - t1) / (n2 - n1) * 1e3


t_off = extract_time("off")
t_on = extract_time("on")
print(f"extract_orb 1200f 8lvl: off {t_off:.3f} ms, on {t_on:.3f} ms "
      f"({t_off / max(t_on, 1e-9):.2f}x)", flush=True)

# selection equivalence of the full extractor: 1-ulp score drift can
# flip rare ties, so demand >=99% keypoint-set overlap instead of
# bitwise equality (interpret-mode CPU test keeps the bitwise check).
orb.FAST_KERNEL_MODE = "off"
a = jax.jit(lambda im: orb.extract_orb(im, cfg))(im0)
orb.FAST_KERNEL_MODE = "on"
b = jax.jit(lambda im: orb.extract_orb(im, cfg))(im0)
ka = {tuple(x) for x in np.asarray(a.uv)[np.asarray(a.valid)].tolist()}
kb = {tuple(x) for x in np.asarray(b.uv)[np.asarray(b.valid)].tolist()}
ov = len(ka & kb) / max(len(ka | kb), 1)
print(f"full extract keypoint-set overlap: {ov:.4f} "
      f"({len(ka)} vs {len(kb)} valid)", flush=True)
assert ov >= 0.99, "extractor selection diverged beyond tie noise"
