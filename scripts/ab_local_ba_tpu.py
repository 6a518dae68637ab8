"""TPU A/B: local_ba one-hot MXU reductions vs segment_sum scatter.

Measures the single-chip window-BA solve (solvers/local_ba.local_ba,
15 LM iterations) at window and mid sizes with ONEHOT_MODE forced each
way, plus the dist_ba per-iteration cost vs K to locate where the
K^2-scaling one-hot pair fill stops paying (backlog: K-threshold switch).

Run ON TPU: PYTHONPATH=. timeout 550 python -u scripts/ab_local_ba_tpu.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from scripts.scaling_bench import make_problem
from vieo_slam_tpu.solvers import local_ba as lba

REPS = 4


def force_real_mode():
    y = jax.jit(lambda x: x + 1.0)(jax.device_put(np.ones(8, np.float32)))
    np.asarray(jax.block_until_ready(y))


def measure_rtt():
    x = jax.device_put(np.ones(8, np.float32))
    f = jax.jit(lambda v: v * 2.0)
    np.asarray(jax.block_until_ready(f(x)))
    st = time.time()
    for _ in range(10):
        np.asarray(jax.block_until_ready(f(x)))
    return (time.time() - st) / 10


def time_local_ba(K, M, O, mode: str, rtt: float):
    """Seconds per 15-iteration local_ba solve, REPS-chained."""
    prob, cam = make_problem(np.random.RandomState(0), m=M, K=K, O=O)
    lba.ONEHOT_MODE = mode
    try:
        run = jax.jit(lambda p: lba.local_ba(p, cam, 80.0))
        out = run(prob)
        jax.block_until_ready(out)            # compile + warm
        best = float("inf")
        for _ in range(3):
            st = time.time()
            p = prob
            for _ in range(REPS):
                res = run(p)
                p = p._replace(Rcw=res.Rcw, tcw=res.tcw, pw=res.pw)
            jax.block_until_ready(res)
            best = min(best, (time.time() - st - rtt) / REPS)
        return best
    finally:
        lba.ONEHOT_MODE = "auto"


def main():
    force_real_mode()
    rtt = measure_rtt()
    print(f"rtt {rtt * 1e3:.1f} ms", flush=True)
    for K, M, O in ((16, 4096, 8), (48, 8192, 8), (128, 16384, 8)):
        row = {}
        for mode in ("off", "on"):
            row[mode] = time_local_ba(K, M, O, mode, rtt)
            print(f"local_ba K={K} M={M} O={O} onehot={mode}: "
                  f"{row[mode] * 1e3:.2f} ms/solve", flush=True)
        print(f"  -> speedup onehot {row['off'] / row['on']:.2f}x",
              flush=True)


if __name__ == "__main__":
    main()
