"""Distributed scaling harness -> SCALING_r04.json.

Three measurements (BASELINE north star: frames/s and BA iters/s at
1 chip / 1 host / N hosts, >=80% efficiency to 4 hosts; the reference has
no distribution at all, SURVEY.md §2.4):

1. BA iters/s of the landmark-sharded distributed Schur LM
   (parallel/dist_ba) at 1/2/4/8 devices.
2. A per-shard "ideal" reference: the SAME per-device problem size run on
   ONE device (M/n landmarks, no collective) — the ratio actual/ideal is
   the scaling efficiency, separating compute from collective+overhead.
3. frames/s of a data-parallel frontend (one camera stream per device:
   ORB extract + stereo depth + track, the dryrun's per-camera shard_map
   promoted to a measured benchmark) at 1/2/4/8 devices.

On the virtual CPU mesh the devices share physical cores, so the curves
measure schedule overhead (a lower bound on real-chip scaling); the TPU
run records absolute single-chip rows.

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
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

from vieo_slam_tpu.cameras import models as cm  # noqa: E402
from vieo_slam_tpu.frontend.frame import Frame  # noqa: E402
from vieo_slam_tpu.frontend.tracking import _track_kernel  # noqa: E402
from vieo_slam_tpu.ops import matching, orb  # noqa: E402
from vieo_slam_tpu.parallel.dist_ba import (distributed_ba,  # noqa: E402
                                            make_ba_mesh)
from vieo_slam_tpu.solvers.local_ba import BAProblem  # noqa: E402

K = int(os.environ.get("SCALE_K", "32"))
M = int(os.environ.get("SCALE_M", "65536"))
O = 8
ITERS = int(os.environ.get("SCALE_ITERS", "20"))
# frontend rows (CPU mesh uses a smaller config so the run stays minutes)
FH, FW = (480, 752) if not CPU_ONLY else (240, 376)
FEATS = 1200 if not CPU_ONLY else 300
SLAB = 4096 if not CPU_ONLY else 1024
N_ROUNDS = int(os.environ.get("SCALE_FRAME_ROUNDS", "20"))


def make_problem(rng, m=M, K=None, O=None):
    """Synthetic global-BA problem: K poses on a circle, m landmarks."""
    K = K if K is not None else globals()["K"]
    O = O if O is not None else globals()["O"]
    ang = np.linspace(0, 2 * np.pi, K, endpoint=False)
    twc = np.stack([2 * np.cos(ang), 2 * np.sin(ang), np.zeros(K)], -1)
    fwd = -twc / np.linalg.norm(twc, axis=-1, keepdims=True)
    up = np.tile([0.0, 0.0, -1.0], (K, 1))
    right = np.cross(fwd, up)
    down = np.cross(fwd, right)
    Rwc = np.stack([right, down, fwd], -1)
    Rcw = np.swapaxes(Rwc, -1, -2)
    tcw = -np.einsum("kij,kj->ki", Rcw, twc)
    pw = (rng.rand(m, 3) - 0.5) * np.array([8, 8, 3])
    cam = cm.make_pinhole(400.0, 400.0, 320.0, 240.0, 640, 480)
    obs_kf = rng.randint(0, K, (m, O)).astype(np.int32)
    pc = np.einsum("moij,mj->moi", Rcw[obs_kf], pw) + tcw[obs_kf]
    z_ok = pc[..., 2] > 0.5
    uv = np.stack([400 * pc[..., 0] / np.clip(pc[..., 2], 0.5, None) + 320,
                   400 * pc[..., 1] / np.clip(pc[..., 2], 0.5, None) + 240],
                  -1).astype(np.float32)
    inb = ((uv[..., 0] > 0) & (uv[..., 0] < 640)
           & (uv[..., 1] > 0) & (uv[..., 1] < 480))
    valid = z_ok & inb
    uv = uv + rng.randn(m, O, 2).astype(np.float32) * 0.5
    tcw_n = tcw + rng.randn(K, 3) * 0.01
    pw_n = pw + rng.randn(m, 3) * 0.02
    fixed = np.zeros(K, bool)
    fixed[0] = True
    return BAProblem(
        Rcw=jnp.asarray(Rcw, jnp.float32), tcw=jnp.asarray(tcw_n, jnp.float32),
        fixed=jnp.asarray(fixed),
        pw=jnp.asarray(pw_n, jnp.float32),
        lm_valid=jnp.ones(m, bool),
        obs_kf=jnp.asarray(np.where(valid, obs_kf, -1)),
        obs_uv=jnp.asarray(uv),
        obs_ur=jnp.full((m, O), -1.0, jnp.float32),
        obs_inv_sigma2=jnp.ones((m, O), jnp.float32),
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


def time_frames(n_dev) -> float:
    """frames/s of the data-parallel frontend: one camera stream per
    device (extract + stereo depth + track), poses chained between rounds
    so the device pipeline stays busy."""
    devices = jax.devices()[:n_dev]
    mesh = Mesh(np.asarray(devices), ("b",))
    cfg = orb.OrbConfig(n_features=FEATS, n_levels=8)
    cam = cm.make_pinhole(458.0, 458.0, FW / 2, FH / 2, FW, FH)
    bf = 458.0 * 0.11
    inv_sigma2 = (1.0 / cfg.level_scales ** 2).astype(np.float32)
    scales = cfg.level_scales.astype(np.float32)
    rng = np.random.RandomState(0)
    base = rng.rand(n_dev, 2, FH, FW).astype(np.float32) * 200 + 20
    for b in range(n_dev):
        ys = rng.randint(20, FH - 20, 300)
        xs = rng.randint(20, FW - 20, 300)
        base[b, :, ys, xs] = 255.0
    lm_pw = (rng.randn(SLAB, 3) * [2, 1.5, 1] + [0, 0, 6]).astype(np.float32)
    lm_desc = rng.randint(0, 2 ** 32, (SLAB, 8), np.uint64).astype(np.uint32)
    shard_b = NamedSharding(mesh, P("b"))
    repl = NamedSharding(mesh, P())
    imgs = jax.device_put(base, shard_b)
    lm_pw_d = jax.device_put(lm_pw, repl)
    lm_desc_d = jax.device_put(lm_desc, repl)
    lm_valid_d = jax.device_put(np.ones(SLAB, bool), repl)
    R0 = jax.device_put(np.tile(np.eye(3, dtype=np.float32), (n_dev, 1, 1)),
                        shard_b)
    t0 = jax.device_put(np.zeros((n_dev, 3), np.float32), shard_b)

    def one_stream(img_lr, R, t):
        fl = orb.extract_orb(img_lr[0], cfg)
        fr = orb.extract_orb(img_lr[1], cfg)
        u_r, _ = matching.search_stereo_rectified(
            fl.uv, fl.level, fl.desc, fl.valid,
            fr.uv, fr.level, fr.desc, fr.valid,
            min_disp=bf / 40.0, max_disp=bf / 0.1,
            level_scales=jnp.asarray(scales))
        disp = fl.uv[:, 0] - u_r
        depth = jnp.where(u_r >= 0, bf / jnp.maximum(disp, 1e-6), -1.0)
        res = _track_kernel(
            R, t, lm_pw_d, lm_desc_d, jnp.zeros(SLAB, jnp.int32),
            lm_valid_d,
            Frame(uv=fl.uv, level=fl.level, angle=fl.angle, desc=fl.desc,
                  ur=u_r, depth=depth, valid=fl.valid,
                  timestamp=jnp.asarray(0.0)),
            jnp.asarray(inv_sigma2), jnp.asarray(scales),
            jnp.asarray(15.0, jnp.float32), jnp.asarray(6.0, jnp.float32),
            jnp.asarray(bf, jnp.float32), cam)
        return res.Rcw, res.tcw

    step = jax.jit(jax.vmap(one_stream, in_axes=(0, 0, 0)),
                   in_shardings=(shard_b, shard_b, shard_b),
                   out_shardings=(shard_b, shard_b))
    R, t = step(imgs, R0, t0)
    jax.block_until_ready((R, t))         # compile + warm
    st = time.time()
    for _ in range(N_ROUNDS):
        R, t = step(imgs, R, t)
    jax.block_until_ready((R, t))
    dt = time.time() - st
    return n_dev * N_ROUNDS / dt


def main():
    if not CPU_ONLY:
        force_real_mode()
    rng = np.random.RandomState(0)
    prob, cam = make_problem(rng)
    devs = len(jax.devices())
    prefix = "cpu_mesh" if CPU_ONLY else "tpu"
    # platform recorded PER PREFIX: a shared "platform" key was clobbered
    # by whichever run merged last, mislabelling the other run's rows.
    result = {"problem": {"K": K, "M": M, "O": O, "iters": ITERS},
              f"{prefix}_platform": jax.devices()[0].platform}
    curve, ideal, eff, fcurve = {}, {}, {}, {}
    for n in (1, 2, 4, 8):
        if n > devs:
            break
        curve[str(n)] = round(time_ba(prob, cam, n), 3)
        print(f"BA {n} dev: {curve[str(n)]} iters/s", flush=True)
        # ideal = same per-shard work, one device, no collective
        p_small, _ = make_problem(np.random.RandomState(1), m=M // n)
        ideal[str(n)] = round(time_ba(p_small, cam, 1), 3)
        eff[str(n)] = round(curve[str(n)] / max(ideal[str(n)], 1e-9), 3)
        print(f"   ideal(M/{n} on 1 dev): {ideal[str(n)]} iters/s "
              f"-> efficiency {eff[str(n)]}", flush=True)
    result[f"{prefix}_ba_iters_per_s"] = curve
    result[f"{prefix}_ba_ideal_iters_per_s"] = ideal
    result[f"{prefix}_ba_efficiency"] = eff
    for n in (1, 2, 4, 8):
        if n > devs:
            break
        fcurve[str(n)] = round(time_frames(n), 3)
        print(f"frontend {n} stream(s): {fcurve[str(n)]} frames/s",
              flush=True)
    result[f"{prefix}_frontend_frames_per_s"] = {
        "feats": FEATS, "hw": [FH, FW], **fcurve}

    # Problem-size sweep: per-device work vs fixed psum/solve cost — the
    # speedup at max devices should IMPROVE with M (the K=32 camera
    # system reduce+solve is a constant ~per-iteration floor).
    if os.environ.get("SCALE_SWEEP", "0") == "1" and devs >= 2:
        n_hi = min(8, devs)
        sweep = {}
        for m in (16384, 65536, 262144):
            p, c = make_problem(np.random.RandomState(2), m=m)
            one = time_ba(p, c, 1)
            many = time_ba(p, c, n_hi)
            sweep[str(m)] = {
                "1": round(one, 3), str(n_hi): round(many, 3),
                "speedup": round(many / max(one, 1e-9), 2)}
            print(f"sweep M={m}: 1 dev {one:.3f} it/s, "
                  f"{n_hi} dev {many:.3f} it/s "
                  f"({many / one:.2f}x)", flush=True)
        result[f"{prefix}_ba_sweep_by_M"] = sweep
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), os.environ.get("SCALE_OUT", "SCALING_r04.json"))
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
