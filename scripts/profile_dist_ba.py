"""Dissect the distributed-BA iteration cost on the real chip.

Times each component of the landmark-sharded Schur step separately:
residual/jacobian terms + by-KF one-hot reductions, the 3x3 V inverse,
the pair fill, the reduced-system solve, and the robust-cost eval.
Honest axon methodology (flip real mode, chain, subtract RTT).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from vieo_slam_tpu.solvers.lm import huber_weight
from vieo_slam_tpu.solvers.local_ba import _obs_terms, _total_cost
from scripts.scaling_bench import make_problem

K = 32
M = 65536
O = 8
N = 10


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


def timeit(fn, arg, rtt, n=N):
    out = fn(arg)
    jax.block_until_ready(out)
    st = time.time()
    x = arg
    for _ in range(n):
        x = fn(x)
    jax.block_until_ready(x)
    return (time.time() - st - rtt) / n * 1e3


def inv3x3(V):
    """Closed-form 3x3 batched inverse (adjugate/det)."""
    a, b, c = V[..., 0, 0], V[..., 0, 1], V[..., 0, 2]
    d, e, f = V[..., 1, 0], V[..., 1, 1], V[..., 1, 2]
    g, h, i = V[..., 2, 0], V[..., 2, 1], V[..., 2, 2]
    A = e * i - f * h
    B = c * h - b * i
    C = b * f - c * e
    D = f * g - d * i
    E = a * i - c * g
    F = c * d - a * f
    G = d * h - e * g
    H = b * g - a * h
    I = a * e - b * d
    det = a * A + b * D + c * G
    inv = jnp.stack([
        jnp.stack([A, B, C], -1),
        jnp.stack([D, E, F], -1),
        jnp.stack([G, H, I], -1)], -2)
    return inv / det[..., None, None]


def main():
    force_real_mode()
    rtt = measure_rtt()
    print(f"rtt_ms {rtt*1e3:.2f}", flush=True)
    rng = np.random.RandomState(0)
    prob, cam = make_problem(rng)
    bf = jnp.asarray(80.0, jnp.float32)
    active = prob.obs_valid

    @jax.jit
    def terms(pw):
        r, Jp, Jl, chi2, delta2, depth_ok = _obs_terms(
            prob.Rcw, prob.tcw, pw, prob, cam, bf)
        return pw + 1e-20 * jnp.sum(r)

    @jax.jit
    def full_jac_reduce(pw):
        r, Jp, Jl, chi2, delta2, depth_ok = _obs_terms(
            prob.Rcw, prob.tcw, pw, prob, cam, bf)
        use = active & depth_ok & (prob.obs_kf >= 0)
        w = huber_weight(chi2, delta2) * prob.obs_inv_sigma2 * use
        kf_i = jnp.clip(prob.obs_kf, 0)
        A = (kf_i[..., None] == jnp.arange(K, dtype=kf_i.dtype)
             ).astype(r.dtype)
        Hpp = jnp.einsum("mok,moij->kij", A,
                         jnp.einsum("mori,mo,morj->moij", Jp, w, Jp))
        return pw + 1e-20 * jnp.sum(Hpp)

    @jax.jit
    def vinv_lu(pw):
        r, Jp, Jl, chi2, delta2, depth_ok = _obs_terms(
            prob.Rcw, prob.tcw, pw, prob, cam, bf)
        w = huber_weight(chi2, delta2) * prob.obs_inv_sigma2 * active
        V = jnp.einsum("mori,mo,morj->mij", Jl, w, Jl) \
            + 1e-3 * jnp.eye(3)
        Vi = jnp.linalg.inv(V)
        return pw + 1e-20 * jnp.sum(Vi)

    @jax.jit
    def vinv_closed(pw):
        r, Jp, Jl, chi2, delta2, depth_ok = _obs_terms(
            prob.Rcw, prob.tcw, pw, prob, cam, bf)
        w = huber_weight(chi2, delta2) * prob.obs_inv_sigma2 * active
        V = jnp.einsum("mori,mo,morj->mij", Jl, w, Jl) \
            + 1e-3 * jnp.eye(3)
        Vi = inv3x3(V)
        return pw + 1e-20 * jnp.sum(Vi)

    @jax.jit
    def pair_fill(pw):
        r, Jp, Jl, chi2, delta2, depth_ok = _obs_terms(
            prob.Rcw, prob.tcw, pw, prob, cam, bf)
        w = huber_weight(chi2, delta2) * prob.obs_inv_sigma2 * active
        kf_i = jnp.clip(prob.obs_kf, 0)
        A = (kf_i[..., None] == jnp.arange(K, dtype=kf_i.dtype)
             ).astype(r.dtype)
        Wc = jnp.einsum("mori,mo,morj->moij", Jp, w, Jl)
        V = jnp.einsum("mori,mo,morj->mij", Jl, w, Jl) + 1e-3 * jnp.eye(3)
        Y = Wc @ inv3x3(V)[:, None]
        n_ch, chunk = M // 8192, 8192
        Yr = Y.reshape(n_ch, chunk, O, 6, 3)
        Wr = Wc.reshape(n_ch, chunk, O, 6, 3)
        Ar = A.reshape(n_ch, chunk, O, K)

        def s_chunk(S_acc, args):
            Yc, Wcc, Ac = args
            B = jnp.einsum("mok,moic->mkic", Ac, Yc)
            C = jnp.einsum("mok,mojc->mkjc", Ac, Wcc)
            return S_acc + jnp.einsum("mkic,mljc->klij", B, C), None

        S, _ = jax.lax.scan(s_chunk, jnp.zeros((K, K, 6, 6)), (Yr, Wr, Ar))
        return pw + 1e-20 * jnp.sum(S)

    @jax.jit
    def solve192(x):
        Hd = x @ x.T + 192.0 * jnp.eye(192)
        dx = jnp.linalg.solve(Hd, x[:, 0])
        return x + 1e-20 * jnp.sum(dx)

    @jax.jit
    def cho192(x):
        Hd = x @ x.T + 192.0 * jnp.eye(192)
        L = jnp.linalg.cholesky(Hd)
        dx = jax.scipy.linalg.cho_solve((L, True), x[:, 0])
        return x + 1e-20 * jnp.sum(dx)

    @jax.jit
    def cost_eval(pw):
        c = _total_cost(prob.Rcw, prob.tcw, pw, prob, cam, bf, active)
        return pw + 1e-20 * c

    pw = prob.pw
    print(f"terms            {timeit(terms, pw, rtt):8.2f} ms", flush=True)
    print(f"jac+Hpp reduce   {timeit(full_jac_reduce, pw, rtt):8.2f} ms",
          flush=True)
    print(f"V inv (LU)       {timeit(vinv_lu, pw, rtt):8.2f} ms", flush=True)
    print(f"V inv (closed)   {timeit(vinv_closed, pw, rtt):8.2f} ms",
          flush=True)
    print(f"pair fill        {timeit(pair_fill, pw, rtt):8.2f} ms",
          flush=True)
    x192 = jax.device_put(np.random.RandomState(1).randn(192, 192)
                          .astype(np.float32))
    print(f"solve 192 (LU)   {timeit(solve192, x192, rtt):8.2f} ms",
          flush=True)
    print(f"solve 192 (chol) {timeit(cho192, x192, rtt):8.2f} ms",
          flush=True)
    print(f"cost eval        {timeit(cost_eval, pw, rtt):8.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
