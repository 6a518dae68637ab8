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
    backend: str | None = None,
) -> PoseGraphProblem:
    """Damped GN on the Sim3 graph; one jit-compilable program.

    fix_scale: stereo/RGB-D mode (scale dof pinned to 0 update).
    backend: execution target the assembly/solve strategy is picked
      for ("tpu" -> one-hot A^T A fill + block-Jacobi CG, "cpu" ->
      scatter fill + LAPACK Cholesky); default = jax.default_backend().
      The loop closer passes "cpu" with a host default_device to
      OFF-LOAD this rare, small, autodiff-heavy solve from the chip
      (see LoopCloser._correct_loop_locked).
    """
    exec_backend = backend or jax.default_backend()
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

        # Endpoint values gathered ONCE as [E, ...] arrays, then a
        # single 14-wide jacfwd over elementwise-batched math: the
        # per-edge closure with R[ei[e]] indexing inside vmap(jacfwd)
        # re-lowered the gathers per primitive and cost 847 ms of the
        # 1.5 s/iteration at K=512 (scripts/dissect_pose_graph.py).
        Rie, tie, sie = R[ei], t[ei], s[ei]
        Rje, tje, sje = R[ej], t[ej], s[ej]

        def resid_vals(dx, Ri, ti, si, Rj, tj, sj, Rm, tm, sm):
            dRi, dti, dsi = lie.sim3_exp(dx[:7])
            Ria, tia, sia = lie.sim3_compose(dRi, dti, dsi, Ri, ti, si)
            dRj, dtj, dsj = lie.sim3_exp(dx[7:])
            Rja, tja, sja = lie.sim3_compose(dRj, dtj, dsj, Rj, tj, sj)
            return _edge_residual(Ria, tia, sia, Rja, tja, sja,
                                  Rm, tm, sm)

        zero14 = jnp.zeros(14, dtype)
        r = jax.vmap(lambda *a: resid_vals(zero14, *a))(
            Rie, tie, sie, Rje, tje, sje,
            prob.edge_R, prob.edge_t, prob.edge_s)               # [E, 7]
        J = jax.vmap(lambda *a: jax.jacfwd(
            lambda d: resid_vals(d, *a))(zero14))(
            Rie, tie, sie, Rje, tje, sje,
            prob.edge_R, prob.edge_t, prob.edge_s)               # [E,7,14]
        Ji, Jj = J[..., :7], J[..., 7:]

        if fix_scale:
            Ji = Ji.at[:, :, 6].set(0.0)
            Jj = Jj.at[:, :, 6].set(0.0)

        # Assemble dense H [7K, 7K], b [7K].
        if exec_backend == "tpu":
            # H = A^T A with A the weighted block-sparse [7E, 7K] edge
            # jacobian, expanded through one-hot vertex indicators: ONE
            # MXU matmul replaces the [E]-indexed scatter-adds, which
            # serialize on TPU (the scatter-path K=512 closure solve
            # measured 24 s; the first chunked-one-hot fill still cost
            # 432 ms/iter — scripts/dissect_pose_graph.py).  Exact
            # under the package's highest matmul precision.
            kiota = jnp.arange(K, dtype=jnp.int32)
            sqw = jnp.sqrt(w)
            ohi = (ei[:, None] == kiota[None, :]).astype(dtype)   # [E,K]
            ohj = (ej[:, None] == kiota[None, :]).astype(dtype)
            A4 = (ohi[:, None, :, None] * Ji[:, :, None, :]
                  + ohj[:, None, :, None] * Jj[:, :, None, :])
            A4 = A4 * sqw[:, None, None, None]
            A = A4.reshape(E * 7, K * 7)
            Hd = A.T @ A
            b = -(A.T @ (r * sqw[:, None]).reshape(-1)).reshape(K, 7)
        else:
            Hii = jnp.einsum("eri,e,erj->eij", Ji, w, Ji)
            Hjj = jnp.einsum("eri,e,erj->eij", Jj, w, Jj)
            Hij = jnp.einsum("eri,e,erj->eij", Ji, w, Jj)
            bi = -jnp.einsum("eri,e,er->ei", Ji, w, r)
            bj = -jnp.einsum("eri,e,er->ei", Jj, w, r)
            rows = jnp.concatenate([ei, ej, ei, ej])
            cols = jnp.concatenate([ei, ej, ej, ei])
            blocks = jnp.concatenate(
                [Hii, Hjj, Hij, jnp.swapaxes(Hij, -1, -2)])
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
        if exec_backend == "tpu":
            # Block-Jacobi-preconditioned CG: TPU factorizations of a
            # [7K, 7K] system are panel-sequential and latency-bound
            # (K=512 closure solve: 20.9 s/solve with Cholesky, 24 s
            # with LU — gba_scale/validate_pose_graph r5), while a CG
            # iteration is one dense matvec that rides the MXU.  The
            # damped system is SPD; 7x7 block-Jacobi handles the
            # vertex-scale disparity.
            Hb = Hd.reshape(K, 7, K, 7)
            idxk = jnp.arange(K)
            diag = Hb[idxk, :, idxk, :]                     # [K, 7, 7]
            Minv = jnp.linalg.inv(
                diag + 1e-8 * jnp.eye(7, dtype=dtype))      # [K, 7, 7]

            def precond(v):
                return jnp.einsum(
                    "kij,kj->ki", Minv, v.reshape(K, 7)).reshape(-1)

            def cg_body(carry, _):
                x, rr, p, rz = carry
                Ap = Hd @ p
                alpha = rz / jnp.maximum(p @ Ap, 1e-30)
                x = x + alpha * p
                rr = rr - alpha * Ap
                z = precond(rr)
                rz_new = rr @ z
                beta = rz_new / jnp.maximum(rz, 1e-30)
                p = z + beta * p
                return (x, rr, p, rz_new), None

            x0 = jnp.zeros_like(bd)
            r0 = bd
            z0 = precond(r0)
            (dx_flat, _, _, _), _ = jax.lax.scan(
                cg_body, (x0, r0, z0, r0 @ z0), None, length=128)
            dx = dx_flat.reshape(K, 7)
        else:
            # CPU: direct SPD solve (LAPACK Cholesky is fast here)
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
