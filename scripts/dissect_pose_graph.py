"""Per-stage dissection of the K=512 pose-graph GN iteration on TPU:
(a) per-edge residual+jacobians, (b) Hessian fill, (c) the linear
solve — each timed as its own chained jit to find the 730 ms/iter.

Run ON TPU: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/dissect_pose_graph.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import vieo_slam_tpu  # noqa: F401
from vieo_slam_tpu.math import lie
from vieo_slam_tpu.solvers.pose_graph import _edge_residual
from scripts.gba_scale_bench import force_real_mode, measure_rtt

K = 512
# chain + 3 covis nbrs + loop, as in gba_scale_bench
ei, ej = [], []
for i in range(K - 1):
    ei.append(i); ej.append(i + 1)
for i in range(K):
    for d in (5, 9, 13):
        if i + d < K:
            ei.append(i); ej.append(i + d)
ei.append(K - 1); ej.append(0)
E = len(ei)
rng = np.random.RandomState(0)
R = np.tile(np.eye(3, dtype=np.float32), (K, 1, 1))
t = rng.randn(K, 3).astype(np.float32)
s = np.ones(K, np.float32)
eR = np.tile(np.eye(3, dtype=np.float32), (E, 1, 1))
et = rng.randn(E, 3).astype(np.float32) * 0.01
es = np.ones(E, np.float32)
w = np.ones(E, np.float32)
ei = np.asarray(ei, np.int32)
ej = np.asarray(ej, np.int32)


def chain(fn, args, rtt, n=10):
    out = fn(jnp.asarray(0.0), *args)
    jax.block_until_ready(out)
    st = time.time()
    dep = jnp.asarray(0.0)
    for _ in range(n):
        dep = fn(dep, *args)
    jax.block_until_ready(dep)
    return (time.time() - st - rtt) / n * 1e3


@jax.jit
def stage_jac(dep, R, t, s, eRm, etm, esm):
    Rd = R + dep * 1e-12
    zero7 = jnp.zeros(7, jnp.float32)
    es_ = jnp.arange(E)
    eii = jnp.asarray(ei)
    ejj = jnp.asarray(ej)

    def resid(dx_i, dx_j, e):
        dR, dt, ds = lie.sim3_exp(dx_i)
        Ri, ti, si = lie.sim3_compose(dR, dt, ds, Rd[eii[e]], t[eii[e]],
                                      s[eii[e]])
        dR2, dt2, ds2 = lie.sim3_exp(dx_j)
        Rj, tj, sj = lie.sim3_compose(dR2, dt2, ds2, Rd[ejj[e]], t[ejj[e]],
                                      s[ejj[e]])
        return _edge_residual(Ri, ti, si, Rj, tj, sj,
                              eRm[e], etm[e], esm[e])

    r = jax.vmap(lambda e: resid(jnp.zeros(7), jnp.zeros(7), e))(es_)
    Ji = jax.vmap(lambda e: jax.jacfwd(
        lambda d: resid(d, zero7, e))(zero7))(es_)
    Jj = jax.vmap(lambda e: jax.jacfwd(
        lambda d: resid(zero7, d, e))(zero7))(es_)
    return r.sum() * 1e-12 + Ji.sum() * 1e-12 + Jj.sum() * 1e-12


@jax.jit
def stage_fill(dep, Ji, Jj, r):
    Jid = Ji + dep * 1e-12
    Hii = jnp.einsum("eri,e,erj->eij", Jid, jnp.asarray(w), Jid)
    Hjj = jnp.einsum("eri,e,erj->eij", Jj, jnp.asarray(w), Jj)
    Hij = jnp.einsum("eri,e,erj->eij", Jid, jnp.asarray(w), Jj)
    rows = jnp.concatenate([jnp.asarray(ei), jnp.asarray(ej),
                            jnp.asarray(ei), jnp.asarray(ej)])
    cols = jnp.concatenate([jnp.asarray(ei), jnp.asarray(ej),
                            jnp.asarray(ej), jnp.asarray(ei)])
    blocks = jnp.concatenate([Hii, Hjj, Hij, jnp.swapaxes(Hij, -1, -2)])
    CH = 256
    n4 = rows.shape[0]
    pad = -(-n4 // CH) * CH - n4
    rows_p = jnp.pad(rows, (0, pad))
    cols_p = jnp.pad(cols, (0, pad))
    blocks_p = jnp.pad(blocks, ((0, pad), (0, 0), (0, 0)))
    kiota = jnp.arange(K, dtype=jnp.int32)

    def fill_chunk(acc, args):
        r_c, c_c, b_c = args
        oh_r = (r_c[:, None] == kiota[None, :]).astype(jnp.float32)
        oh_c = (c_c[:, None] == kiota[None, :]).astype(jnp.float32)
        t_c = (oh_c[:, :, None] * b_c.reshape(CH, 1, 49)).reshape(
            CH, K * 49)
        return acc + (oh_r.T @ t_c), None

    H_flat, _ = jax.lax.scan(
        fill_chunk, jnp.zeros((K, K * 49), jnp.float32),
        (rows_p.reshape(-1, CH), cols_p.reshape(-1, CH),
         blocks_p.reshape(-1, CH, 7, 7)))
    return H_flat.sum() * 1e-12


@jax.jit
def stage_cg(dep, Hd, bd):
    Hdd = Hd + dep * 1e-12
    Hb = Hdd.reshape(K, 7, K, 7)
    idxk = jnp.arange(K)
    diag = Hb[idxk, :, idxk, :]
    Minv = jnp.linalg.inv(diag + 1e-8 * jnp.eye(7))

    def precond(v):
        return jnp.einsum("kij,kj->ki", Minv,
                          v.reshape(K, 7)).reshape(-1)

    def cg_body(carry, _):
        x, rr, p, rz = carry
        Ap = Hdd @ p
        alpha = rz / jnp.maximum(p @ Ap, 1e-30)
        x = x + alpha * p
        rr = rr - alpha * Ap
        z = precond(rr)
        rz_new = rr @ z
        beta = rz_new / jnp.maximum(rz, 1e-30)
        p = z + beta * p
        return (x, rr, p, rz_new), None

    z0 = precond(bd)
    (x, _, _, _), _ = jax.lax.scan(cg_body, (bd * 0, bd, z0, bd @ z0),
                                   None, length=128)
    return x.sum() * 1e-12


def main():
    print("devices:", jax.devices(), flush=True)
    force_real_mode()
    rtt = measure_rtt()
    print(f"rtt {rtt*1e3:.1f} ms", flush=True)
    args = (jnp.asarray(R), jnp.asarray(t), jnp.asarray(s),
            jnp.asarray(eR), jnp.asarray(et), jnp.asarray(es))
    t_jac = chain(stage_jac, args, rtt)
    print(f"jacobians: {t_jac:.1f} ms", flush=True)
    Ji = jnp.asarray(rng.randn(E, 7, 7), jnp.float32)
    Jj = jnp.asarray(rng.randn(E, 7, 7), jnp.float32)
    rr = jnp.asarray(rng.randn(E, 7), jnp.float32)
    t_fill = chain(stage_fill, (Ji, Jj, rr), rtt)
    print(f"fill: {t_fill:.1f} ms", flush=True)
    A = rng.randn(7 * K, 7 * K).astype(np.float32)
    Hd = jnp.asarray(A @ A.T + 10.0 * np.eye(7 * K, dtype=np.float32))
    bd = jnp.asarray(rng.randn(7 * K), jnp.float32)
    t_cg = chain(stage_cg, (Hd, bd), rtt)
    print(f"cg128: {t_cg:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
