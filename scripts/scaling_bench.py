"""Distributed-BA scaling harness -> SCALING_r02.json.

Measures BA iterations/s of the landmark-sharded distributed Schur LM
(parallel/dist_ba) at 1/2/4/8 devices on the virtual CPU mesh (validates
the collective schedule; virtual devices share the host's physical cores,
so CPU 'scaling' numbers are schedule-overhead curves, not speedup), plus
the one real TPU chip's absolute iters/s and frontend frame rate.

Run ON TPU (no platform forcing):   python scripts/scaling_bench.py
Run CPU-mesh only:                  SCALE_CPU_ONLY=1 python scripts/scaling_bench.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CPU_ONLY = os.environ.get("SCALE_CPU_ONLY", "0") == "1"

import jax  # noqa: E402

if CPU_ONLY:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

import jax.numpy as jnp  # noqa: E402

from vieo_slam_tpu.cameras import models as cm  # noqa: E402
from vieo_slam_tpu.parallel.dist_ba import (distributed_ba,  # noqa: E402
                                            make_ba_mesh)
from vieo_slam_tpu.solvers.local_ba import BAProblem  # noqa: E402

K = int(os.environ.get("SCALE_K", "32"))
M = int(os.environ.get("SCALE_M", "65536"))
O = 8
ITERS = int(os.environ.get("SCALE_ITERS", "20"))


def make_problem(rng):
    """Synthetic global-BA problem: K poses on a circle, M landmarks."""
    ang = np.linspace(0, 2 * np.pi, K, endpoint=False)
    twc = np.stack([2 * np.cos(ang), 2 * np.sin(ang), np.zeros(K)], -1)
    fwd = -twc / np.linalg.norm(twc, axis=-1, keepdims=True)
    up = np.tile([0.0, 0.0, -1.0], (K, 1))
    right = np.cross(fwd, up)
    down = np.cross(fwd, right)
    Rwc = np.stack([right, down, fwd], -1)
    Rcw = np.swapaxes(Rwc, -1, -2)
    tcw = -np.einsum("kij,kj->ki", Rcw, twc)
    pw = (rng.rand(M, 3) - 0.5) * np.array([8, 8, 3])
    cam = cm.make_pinhole(400.0, 400.0, 320.0, 240.0, 640, 480)
    obs_kf = rng.randint(0, K, (M, O)).astype(np.int32)
    pc = np.einsum("moij,mj->moi", Rcw[obs_kf], pw) + tcw[obs_kf]
    z_ok = pc[..., 2] > 0.5
    uv = np.stack([400 * pc[..., 0] / np.clip(pc[..., 2], 0.5, None) + 320,
                   400 * pc[..., 1] / np.clip(pc[..., 2], 0.5, None) + 240],
                  -1).astype(np.float32)
    inb = ((uv[..., 0] > 0) & (uv[..., 0] < 640)
           & (uv[..., 1] > 0) & (uv[..., 1] < 480))
    valid = z_ok & inb
    uv = uv + rng.randn(M, O, 2).astype(np.float32) * 0.5
    # perturb poses/landmarks so the solve does real work
    tcw_n = tcw + rng.randn(K, 3) * 0.01
    pw_n = pw + rng.randn(M, 3) * 0.02
    fixed = np.zeros(K, bool)
    fixed[0] = True
    return BAProblem(
        Rcw=jnp.asarray(Rcw, jnp.float32), tcw=jnp.asarray(tcw_n, jnp.float32),
        fixed=jnp.asarray(fixed),
        pw=jnp.asarray(pw_n, jnp.float32),
        lm_valid=jnp.ones(M, bool),
        obs_kf=jnp.asarray(np.where(valid, obs_kf, -1)),
        obs_uv=jnp.asarray(uv),
        obs_ur=jnp.full((M, O), -1.0, jnp.float32),
        obs_inv_sigma2=jnp.ones((M, O), jnp.float32),
        obs_valid=jnp.asarray(valid),
    ), cam


def force_real_mode():
    y = jax.jit(lambda x: x + 1.0)(jax.device_put(np.ones(8, np.float32)))
    np.asarray(jax.block_until_ready(y))


def time_ba(prob, cam, n_dev):
    mesh = make_ba_mesh(jax.devices()[:n_dev])
    bf = jnp.asarray(80.0, jnp.float32)
    out = distributed_ba(prob, cam, bf, mesh, iters=ITERS)
    jax.block_until_ready(out)            # compile
    st = time.time()
    out = distributed_ba(prob, cam, bf, mesh, iters=ITERS)
    jax.block_until_ready(out)
    dt = time.time() - st
    return ITERS / dt


def main():
    if not CPU_ONLY:
        force_real_mode()
    rng = np.random.RandomState(0)
    prob, cam = make_problem(rng)
    result = {"problem": {"K": K, "M": M, "O": O, "iters": ITERS},
              "platform": jax.devices()[0].platform}
    devs = len(jax.devices())
    curve = {}
    for n in (1, 2, 4, 8):
        if n > devs:
            break
        curve[str(n)] = round(time_ba(prob, cam, n), 3)
        print(f"{n} dev: {curve[str(n)]} iters/s")
    key = "cpu_mesh_iters_per_s" if CPU_ONLY else "tpu_iters_per_s"
    result[key] = curve
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SCALING_r02.json")
    prev = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            prev = json.load(f)
    prev.update(result)
    with open(out_path, "w") as f:
        json.dump(prev, f, indent=1)
    print(json.dumps(prev))


if __name__ == "__main__":
    main()
