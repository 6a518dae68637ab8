"""Sim3/SE3 pose-graph optimization (essential graph).

TPU-native equivalent of Optimizer::OptimizeEssentialGraph
(src/Optimizer.cc:2309-2688): all keyframes as Sim(3) vertices (7 DoF
monocular / scale pinned for stereo-RGBD), constrained by loop edges,
spanning-tree edges, covisibility edges and previous loop edges; after the
solve, landmarks are corrected via their reference keyframe's relative
transform.

Design: edges live in fixed-capacity index arrays; per-edge 7D residuals
r = log_sim3(S_meas^-1 * S_i * S_j^-1) get autodiff Jacobians wrt both
endpoint tangents, assembled into a dense [7K, 7K] system by segment_sum
(a few hundred KFs = a <=3.5k dense Cholesky — MXU territory, replacing
g2o's sparse solver), iterated with fixed-count damped GN inside one jit.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..math import lie


class PoseGraphProblem(NamedTuple):
    """Vertices: Scw (world->kf) as (R [K,3,3], t [K,3], s [K]).

    edge_i/j: [E] int32 vertex ids (-1 pads).
    edge_R/t/s: measured relative transform S_ij = S_i * S_j^-1 at edge
      creation time (so residual is zero for an unperturbed graph).
    edge_w: [E] edge weights (loop edges typically heavier).
    fixed: [K] bool (the loop keyframe / first KF).
    """

    R: jax.Array
    t: jax.Array
    s: jax.Array
    fixed: jax.Array
    edge_i: jax.Array
    edge_j: jax.Array
    edge_R: jax.Array
    edge_t: jax.Array
    edge_s: jax.Array
    edge_w: jax.Array


def make_edge_measurements(R, t, s, edge_i, edge_j):
    """S_ij = S_i * S_j^-1 for each edge from current vertex values."""
    Ri, ti, si = R[edge_i], t[edge_i], s[edge_i]
    Rj, tj, sj = R[edge_j], t[edge_j], s[edge_j]
    Rj_inv, tj_inv, sj_inv = lie.sim3_inverse(Rj, tj, sj)
    return lie.sim3_compose(Ri, ti, si, Rj_inv, tj_inv, sj_inv)


def _edge_residual(Ri, ti, si, Rj, tj, sj, Rm, tm, sm):
    """7D residual log( S_m^-1 * S_i * S_j^-1 )."""
    Rji, tji, sji = lie.sim3_inverse(Rj, tj, sj)
    Ra, ta, sa = lie.sim3_compose(Ri, ti, si, Rji, tji, sji)
    Rmi, tmi, smi = lie.sim3_inverse(Rm, tm, sm)
    Re, te, se = lie.sim3_compose(Rmi, tmi, smi, Ra, ta, sa)
    return lie.sim3_log(Re, te, se)


def optimize_pose_graph(
    prob: PoseGraphProblem,
    *,
    iters: int = 20,
    fix_scale: bool = False,
    lam: float = 1e-6,
) -> PoseGraphProblem:
    """Damped GN on the Sim3 graph; one jit-compilable program.

    fix_scale: stereo/RGB-D mode (scale dof pinned to 0 update).
    """
    K = prob.R.shape[0]
    E = prob.edge_i.shape[0]
    dtype = prob.t.dtype
    free = ~prob.fixed
    evalid = (prob.edge_i >= 0) & (prob.edge_j >= 0)
    ei = jnp.clip(prob.edge_i, 0)
    ej = jnp.clip(prob.edge_j, 0)
    w = jnp.where(evalid, prob.edge_w, 0.0)

    def retract(R, t, s, dx):
        """Left-multiplicative sim3 update: S <- Exp(dx) * S."""
        dR, dt, ds = lie.sim3_exp(dx)
        return lie.sim3_compose(dR, dt, ds, R, t, s)

    def step(carry, _):
        R, t, s = carry

        def resid(dx_i, dx_j, e):
            Ri, ti, si = retract(R[ei[e]], t[ei[e]], s[ei[e]], dx_i)
            Rj, tj, sj = retract(R[ej[e]], t[ej[e]], s[ej[e]], dx_j)
            return _edge_residual(
                Ri, ti, si, Rj, tj, sj,
                prob.edge_R[e], prob.edge_t[e], prob.edge_s[e])

        zero7 = jnp.zeros(7, dtype)
        es = jnp.arange(E)
        r = jax.vmap(lambda e: resid(zero7, zero7, e))(es)       # [E, 7]
        Ji = jax.vmap(lambda e: jax.jacfwd(
            lambda d: resid(d, zero7, e))(zero7))(es)            # [E, 7, 7]
        Jj = jax.vmap(lambda e: jax.jacfwd(
            lambda d: resid(zero7, d, e))(zero7))(es)

        if fix_scale:
            Ji = Ji.at[:, :, 6].set(0.0)
            Jj = Jj.at[:, :, 6].set(0.0)

        # Assemble dense H [7K, 7K], b [7K].
        Hii = jnp.einsum("eri,e,erj->eij", Ji, w, Ji)
        Hjj = jnp.einsum("eri,e,erj->eij", Jj, w, Jj)
        Hij = jnp.einsum("eri,e,erj->eij", Ji, w, Jj)
        bi = -jnp.einsum("eri,e,er->ei", Ji, w, r)
        bj = -jnp.einsum("eri,e,er->ei", Jj, w, r)

        rows = jnp.concatenate([ei, ej, ei, ej])
        cols = jnp.concatenate([ei, ej, ej, ei])
        blocks = jnp.concatenate(
            [Hii, Hjj, Hij, jnp.swapaxes(Hij, -1, -2)])
        if jax.default_backend() == "tpu":
            # One-hot MXU assembly: [E]-indexed scatter-adds into the
            # [K,K,7,7] Hessian serialize on TPU (measured: the K=512
            # closure solve took 24 s/solve with the scatter path —
            # scripts/gba_scale_bench.py r5); chunked one-hot
            # contractions put the same fill on the MXU (exact under
            # the package's highest matmul precision; 0/1 weights).
            CH = 256
            n4 = rows.shape[0]
            pad = -(-n4 // CH) * CH - n4
            rows_p = jnp.pad(rows, (0, pad), constant_values=0)
            cols_p = jnp.pad(cols, (0, pad), constant_values=0)
            blocks_p = jnp.pad(blocks, ((0, pad), (0, 0), (0, 0)))
            kiota = jnp.arange(K, dtype=jnp.int32)

            def fill_chunk(acc, args):
                r_c, c_c, b_c = args
                oh_r = (r_c[:, None] == kiota[None, :]).astype(dtype)
                oh_c = (c_c[:, None] == kiota[None, :]).astype(dtype)
                t_c = (oh_c[:, :, None]
                       * b_c.reshape(CH, 1, 49)).reshape(CH, K * 49)
                return acc + (oh_r.T @ t_c), None

            H_flat, _ = jax.lax.scan(
                fill_chunk, jnp.zeros((K, K * 49), dtype),
                (rows_p.reshape(-1, CH), cols_p.reshape(-1, CH),
                 blocks_p.reshape(-1, CH, 7, 7)))
            H = H_flat.reshape(K, K, 7, 7)
            oh_bi = (ei[:, None] == kiota[None, :]).astype(dtype)
            oh_bj = (ej[:, None] == kiota[None, :]).astype(dtype)
            b = oh_bi.T @ bi + oh_bj.T @ bj
        else:
            H = jnp.zeros((K, K, 7, 7), dtype)
            H = H.at[rows, cols].add(blocks)
            b = jnp.zeros((K, 7), dtype).at[ei].add(bi).at[ej].add(bj)

        Hd = H.transpose(0, 2, 1, 3).reshape(7 * K, 7 * K)
        fm = jnp.repeat(free, 7).astype(dtype)
        if fix_scale:
            smask = jnp.tile(
                jnp.asarray([1, 1, 1, 1, 1, 1, 0], dtype), K)
            fm = fm * smask
        Hd = Hd * fm[:, None] * fm[None, :] + jnp.diag(1.0 - fm)
        Hd = Hd + lam * jnp.eye(7 * K, dtype=dtype)
        bd = b.reshape(-1) * fm
        # damped GN normal equations are SPD: Cholesky beats the
        # pivoted LU jnp.linalg.solve lowers to on TPU
        L = jax.scipy.linalg.cholesky(Hd, lower=True)
        dx = jax.scipy.linalg.cho_solve((L, True), bd).reshape(K, 7)
        dx = dx * fm.reshape(K, 7)

        R_n, t_n, s_n = retract(R, t, s, dx)
        return (R_n.astype(R.dtype), t_n.astype(t.dtype),
                s_n.astype(s.dtype)), None

    (R, t, s), _ = jax.lax.scan(
        step, (prob.R, prob.t, prob.s), None, length=iters)
    return prob._replace(R=R, t=t, s=s)


def correct_landmarks(pw, lm_ref_kf, R_old, t_old, s_old, R_new, t_new,
                      s_new):
    """Move landmarks with their reference keyframes
    (OptimizeEssentialGraph's MP correction, Optimizer.cc:2622-2688):
    p' = S_new(ref)^-1 * S_old(ref) * p."""
    k = jnp.clip(lm_ref_kf, 0)
    Ro, to, so = R_old[k], t_old[k], s_old[k]
    Rn, tn, sn = R_new[k], t_new[k], s_new[k]
    p_cam = lie.sim3_apply(Ro, to, so, pw)
    Rni, tni, sni = lie.sim3_inverse(Rn, tn, sn)
    return lie.sim3_apply(Rni, tni, sni, p_cam)
