"""Validate + time the one-hot pose-graph assembly on the real TPU.

1. Equivalence: solve one K=48 Sim3 graph with the TPU one-hot assembly
   and with the scatter path (forced via a default_backend monkeypatch,
   executed on the host CPU devices of the same process); solutions
   must match to f32 tolerance.
2. Closure-at-scale latency: the K=512 / ~2k-edge solve (the
   _correct_loop map.lock hold) — scatter path measured 23.98 s/solve
   on v5e (gba_scale_bench r5); this records the one-hot+Cholesky time.

Run ON TPU: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/validate_pose_graph_tpu.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import vieo_slam_tpu  # noqa: F401  (matmul precision)
from vieo_slam_tpu.solvers import pose_graph as pg
from scripts.gba_scale_bench import (bench_pose_graph, force_real_mode,
                                     measure_rtt)


def small_problem(K=48, seed=0):
    rng = np.random.RandomState(seed)
    ang = np.linspace(0, 2 * np.pi, K)
    t = np.stack([np.cos(ang), np.sin(ang), 0 * ang], -1)
    t = (t + rng.randn(K, 3) * 0.03).astype(np.float32)
    R = np.tile(np.eye(3, dtype=np.float32), (K, 1, 1))
    ei = list(range(K - 1)) + [K - 1] + list(range(0, K - 2))
    ej = list(range(1, K)) + [0] + list(range(2, K))
    E = len(ei)
    eR = np.tile(np.eye(3, dtype=np.float32), (E, 1, 1))
    et = np.zeros((E, 3), np.float32)
    for n, (i, j) in enumerate(zip(ei, ej)):
        et[n] = t[j] - t[i] + rng.randn(3) * 0.01
    return pg.PoseGraphProblem(
        R=jnp.asarray(R), t=jnp.asarray(t), s=jnp.ones(K, jnp.float32),
        fixed=jnp.asarray(np.arange(K) == 0),
        edge_i=jnp.asarray(ei, jnp.int32), edge_j=jnp.asarray(ej, jnp.int32),
        edge_R=jnp.asarray(eR), edge_t=jnp.asarray(et),
        edge_s=jnp.ones(E, jnp.float32), edge_w=jnp.ones(E, jnp.float32))


def main():
    print("devices:", jax.devices(), flush=True)
    force_real_mode()
    rtt = measure_rtt()
    print(f"rtt {rtt*1e3:.1f} ms", flush=True)

    prob = small_problem()
    out_tpu = pg.optimize_pose_graph(prob, iters=10, fix_scale=True)
    t_tpu = np.asarray(out_tpu.t)
    R_tpu = np.asarray(out_tpu.R)

    # scatter path on the host CPU devices of this process
    cpu = jax.devices("cpu")[0]
    orig = jax.default_backend
    jax.default_backend = lambda: "cpu"
    try:
        with jax.default_device(cpu):
            out_cpu = pg.optimize_pose_graph(
                jax.device_put(prob, cpu), iters=10, fix_scale=True)
    finally:
        jax.default_backend = orig
    t_cpu = np.asarray(out_cpu.t)
    R_cpu = np.asarray(out_cpu.R)
    dt = np.abs(t_tpu - t_cpu).max()
    dR = np.abs(R_tpu - R_cpu).max()
    print(f"equivalence: max|dt|={dt:.2e} max|dR|={dR:.2e}", flush=True)
    assert dt < 1e-3 and dR < 1e-3, "one-hot vs scatter mismatch"

    ms, E = bench_pose_graph(512, rtt)
    print(f"pose_graph K=512 E={E} (on-chip A^T A + CG): {ms:.1f} ms "
          f"(scatter+LU path was 23984 ms)", flush=True)

    # host-offload route (what LoopCloser._correct_loop_locked uses on
    # a TPU backend): same problem, CPU devices of this process
    import scripts.gba_scale_bench as gsb

    orig_opg = pg.optimize_pose_graph

    def cpu_opg(prob2, **kw):
        kw["backend"] = "cpu"
        with jax.default_device(cpu):
            return orig_opg(jax.device_put(prob2, cpu), **kw)

    gsb.optimize_pose_graph = cpu_opg
    try:
        ms2, _ = gsb.bench_pose_graph(512, 0.0, n_rep=3)
    finally:
        gsb.optimize_pose_graph = orig_opg
    print(f"pose_graph K=512 host-offload: {ms2:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
