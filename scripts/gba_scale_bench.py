"""Global-BA at reference scale on the real chip -> GBA_SCALE json.

VERDICT r4 #6: the TPU BA rows only ever ran K=32/M=65k, and the
dist-BA one-hot pair fill's K^2-per-chunk crossover (PAIRFILL_K_MAX=96)
was set from CPU measurement.  This measures, on the real v5e:

1. distributed_ba iters/s at K in {64, 128, 256, 512}, M=100k, O=8 —
   the reference's final-GBA regime (Optimizer.cc:771-1345 runs its GBA
   over every KF/MP in the map) — with the pair fill FORCED to "onehot"
   vs "scatter" at each K: the crossover re-derived from TPU data.
2. A closure-at-scale latency row: the Sim3 pose-graph solve at K=512
   with chain+covisibility-density edges — the _correct_loop map.lock
   hold time (loop_closing.py holds the lock through the solve).

Honest axon methodology: flip real mode first, measure RTT, chain N
dependent solves, block once, report (total-RTT)/N.

Run ON TPU:  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/gba_scale_bench.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from vieo_slam_tpu.parallel import dist_ba
from vieo_slam_tpu.parallel.dist_ba import distributed_ba, make_ba_mesh
from vieo_slam_tpu.solvers.pose_graph import (
    PoseGraphProblem, optimize_pose_graph)
from scripts.scaling_bench import make_problem

M = int(os.environ.get("GBA_M", "100000"))
O = 8
ITERS = int(os.environ.get("GBA_ITERS", "10"))
KS = tuple(int(x) for x in os.environ.get(
    "GBA_KS", "64,128,256,512").split(","))


def force_real_mode():
    y = jax.jit(lambda x: x + 1.0)(jax.device_put(np.ones(8, np.float32)))
    np.asarray(jax.block_until_ready(y))


def measure_rtt():
    g = jax.jit(lambda x: x * 2.0)
    x = jax.device_put(np.ones((8, 128), np.float32))
    jax.block_until_ready(g(x))
    st = time.time()
    for _ in range(10):
        jax.block_until_ready(g(x))
    return (time.time() - st) / 10


def bench_ba(K, mode, mesh, rtt, n_rep=3):
    dist_ba.PAIRFILL_MODE = mode
    # the compiled-program cache does not key on the fill mode — drop it
    # so the forced mode actually retraces
    dist_ba._DBA_CACHE.clear()
    rng = np.random.RandomState(0)
    prob, cam = make_problem(rng, m=M, K=K, O=O)
    # warm (compile)
    out = distributed_ba(prob, cam, 400.0 * 0.2, mesh, iters=ITERS)
    jax.block_until_ready(out)
    st = time.time()
    for _ in range(n_rep):
        out = distributed_ba(prob, cam, 400.0 * 0.2, mesh, iters=ITERS)
    jax.block_until_ready(out)
    dt = (time.time() - st - rtt) / n_rep
    return ITERS / dt, float(np.abs(np.asarray(out[1])).mean())


def bench_pose_graph(K, rtt, n_rep=5):
    """Sim3 pose graph at closure scale: chain + 8-neighbour covis +
    1 loop edge (the _correct_loop solve shape at the skeleton cap)."""
    rng = np.random.RandomState(1)
    ang = np.linspace(0, 4 * np.pi, K)  # two laps
    t = np.stack([2 * np.cos(ang), 2 * np.sin(ang), 0 * ang], -1)
    R = np.tile(np.eye(3, dtype=np.float32), (K, 1, 1))
    t = (t + rng.randn(K, 3) * 0.05).astype(np.float32)
    ei, ej = [], []
    for i in range(K - 1):
        ei.append(i); ej.append(i + 1)
    for i in range(0, K, 1):
        for d in (5, 9, 13):        # covisibility-ish extra edges
            if i + d < K:
                ei.append(i); ej.append(i + d)
    ei.append(K - 1); ej.append(0)  # loop edge
    E = len(ei)
    eR = np.tile(np.eye(3, dtype=np.float32), (E, 1, 1))
    et = np.zeros((E, 3), np.float32)
    for n, (i, j) in enumerate(zip(ei, ej)):
        et[n] = t[j] - t[i]
    prob = PoseGraphProblem(
        R=jnp.asarray(R), t=jnp.asarray(t),
        s=jnp.ones(K, jnp.float32),
        fixed=jnp.asarray(np.arange(K) == 0),
        edge_i=jnp.asarray(ei, jnp.int32), edge_j=jnp.asarray(ej, jnp.int32),
        edge_R=jnp.asarray(eR), edge_t=jnp.asarray(et),
        edge_s=jnp.ones(E, jnp.float32), edge_w=jnp.ones(E, jnp.float32))
    out = optimize_pose_graph(prob, iters=20, fix_scale=True)
    jax.block_until_ready(out.t)
    st = time.time()
    for _ in range(n_rep):
        out = optimize_pose_graph(prob, iters=20, fix_scale=True)
    jax.block_until_ready(out.t)
    dt = (time.time() - st - rtt) / n_rep
    return dt * 1e3, E


def main():
    print(f"devices: {jax.devices()}", flush=True)
    force_real_mode()
    rtt = measure_rtt()
    print(f"rtt {rtt*1e3:.1f} ms", flush=True)
    mesh = make_ba_mesh(jax.devices()[:1])
    rows = {"M": M, "O": O, "iters": ITERS,
            "rtt_ms": round(rtt * 1e3, 2), "rows": []}
    for K in KS:
        row = {"K": K}
        for mode in ("onehot", "scatter"):
            try:
                ips, cost = bench_ba(K, mode, mesh, rtt)
                row[f"iters_per_s_{mode}"] = round(ips, 3)
                row[f"cost_{mode}"] = cost
            except Exception as e:          # noqa: BLE001
                row[f"iters_per_s_{mode}"] = None
                row[f"err_{mode}"] = repr(e)[:200]
            print(f"K={K} {mode}: {row.get(f'iters_per_s_{mode}')}",
                  flush=True)
        rows["rows"].append(row)
        jax.clear_caches()
    pg_ms, E = bench_pose_graph(512, rtt)
    rows["pose_graph_512"] = {"K": 512, "edges": E,
                              "solve_ms": round(pg_ms, 2),
                              "iters": 20}
    print(f"pose_graph K=512 E={E}: {pg_ms:.1f} ms", flush=True)
    # crossover recommendation
    xover = None
    for row in rows["rows"]:
        a, b = row.get("iters_per_s_onehot"), row.get("iters_per_s_scatter")
        if a and b and b > a:
            xover = row["K"]
            break
    rows["tpu_crossover_K"] = xover
    out = os.environ.get("GBA_OUT", "/tmp/gba_scale.json")
    with open(out, "w") as f:
        json.dump(rows, f, indent=1)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
