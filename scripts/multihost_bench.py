"""Multi-host distributed-BA harness -> MULTIHOST_r03.json.

The reference has no distribution at all; the BASELINE north star asks
for BA iters/s at 1 chip / 1 host / N hosts. Real multi-host TPU pods
are not reachable from this container, so this harness runs the genuine
multi-process JAX path (jax.distributed.initialize + a global mesh whose
devices span processes + gloo cross-process collectives) on CPU:

  run A: 1 process x 4 devices  — collectives stay in-process
  run B: 2 processes x 2 devices — the SAME 4-way landmark-sharded BA
         program, psum now crossing a process boundary (the DCN proxy)

Because the mesh shape, shard sizes, and program are identical, the
iters/s ratio B/A isolates the cross-host collective + multi-controller
dispatch cost — the quantity that decides the >=80%-to-4-hosts claim.
Numerical check: run B's replicated pose output must match run A's
bit-for-bit (same program, same reduction order).

Usage:  python scripts/multihost_bench.py            # coordinator
        (spawns its own --worker subprocesses; writes MULTIHOST_r03.json)
"""

import argparse
import json
import os
import socket
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

K = int(os.environ.get("MH_K", "32"))
M = int(os.environ.get("MH_M", "32768"))
ITERS = int(os.environ.get("MH_ITERS", "10"))
N_PROC = int(os.environ.get("MH_PROCS", "2"))
DEV_PER_PROC = int(os.environ.get("MH_DEV_PER_PROC", "2"))


def _configure_jax(n_local_devices: int):
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", n_local_devices)
    return jax


def _run_ba(jax, tag: str):
    """Build the shared problem, run distributed_ba over ALL global
    devices, return (iters_per_s, Rcw, tcw, final_cost_proxy)."""
    import jax.numpy as jnp
    import numpy as np

    from scripts.scaling_bench import make_problem
    from vieo_slam_tpu.parallel.dist_ba import distributed_ba, make_ba_mesh

    rng = np.random.RandomState(0)
    prob, cam = make_problem(rng, m=M)
    mesh = make_ba_mesh(jax.devices())
    bf = jnp.asarray(80.0, jnp.float32)
    out = distributed_ba(prob, cam, bf, mesh, iters=ITERS)
    jax.block_until_ready(out)            # compile + warm
    st = time.time()
    out = distributed_ba(prob, cam, bf, mesh, iters=ITERS)
    jax.block_until_ready(out)
    dt = time.time() - st
    Rcw, tcw, _pw = out
    # poses are replicated (out_specs P()) -> host-readable everywhere
    return ITERS / dt, np.asarray(Rcw), np.asarray(tcw)


def worker(args):
    jax = _configure_jax(DEV_PER_PROC)
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id)
    assert len(jax.devices()) == args.num_processes * DEV_PER_PROC
    iters_s, Rcw, tcw = _run_ba(jax, f"proc{args.process_id}")
    if args.process_id == 0:
        import numpy as np
        np.savez(args.out, iters_s=iters_s, Rcw=Rcw, tcw=tcw)
    jax.distributed.shutdown()


def coordinator():
    # ---- run A: single process, all devices local -------------------
    jax = _configure_jax(N_PROC * DEV_PER_PROC)
    import numpy as np
    iters_a, Rcw_a, tcw_a = _run_ba(jax, "local")
    print(f"1 process x {N_PROC * DEV_PER_PROC} devices: "
          f"{iters_a:.3f} iters/s", flush=True)

    # ---- run B: N processes, gloo collectives -----------------------
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    out_npz = os.path.join("/tmp", f"multihost_{os.getpid()}.npz")
    env = dict(os.environ, PYTHONPATH=REPO + ":"
               + os.environ.get("PYTHONPATH", ""))
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker",
             "--process-id", str(i), "--num-processes", str(N_PROC),
             "--coordinator", f"localhost:{port}", "--out", out_npz],
            env=env)
        for i in range(N_PROC)
    ]
    rcs = [p.wait(timeout=900) for p in procs]
    if any(rcs):
        raise SystemExit(f"worker failed: rcs={rcs}")
    got = np.load(out_npz)
    iters_b = float(got["iters_s"])
    print(f"{N_PROC} processes x {DEV_PER_PROC} devices: "
          f"{iters_b:.3f} iters/s", flush=True)

    pose_match = bool(
        np.allclose(got["Rcw"], Rcw_a, atol=1e-6)
        and np.allclose(got["tcw"], tcw_a, atol=1e-5))
    result = {
        "problem": {"K": K, "M": M, "iters": ITERS},
        "mesh": {"devices": N_PROC * DEV_PER_PROC,
                 "procs_single": 1, "procs_multi": N_PROC},
        "collectives": "gloo",
        "single_host_iters_per_s": round(iters_a, 3),
        "multi_host_iters_per_s": round(iters_b, 3),
        "cross_host_efficiency": round(iters_b / max(iters_a, 1e-9), 3),
        "pose_output_matches_single_host": pose_match,
        "note": "same 4-way landmark-sharded program; only the psum "
                "transport differs (in-process vs gloo across processes "
                "= the DCN proxy). CPU host has 4 shared cores.",
    }
    path = os.environ.get("MH_OUT",
                          os.path.join(REPO, "MULTIHOST_r03.json"))
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    os.unlink(out_npz)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--process-id", type=int, default=0)
    ap.add_argument("--num-processes", type=int, default=N_PROC)
    ap.add_argument("--coordinator", default="localhost:0")
    ap.add_argument("--out", default="/tmp/multihost.npz")
    args = ap.parse_args()
    if args.worker:
        worker(args)
    else:
        coordinator()


if __name__ == "__main__":
    main()
