"""Multi-chip distributed bundle adjustment over a jax.sharding Mesh.

The scale-out story the reference lacks entirely (SURVEY.md §2.4: its
parallelism stops at 4 pthreads + per-camera extraction threads).  Here BA
follows the scaling-book recipe for the landmark-dominated workload:

  - The LANDMARK dimension [M] — observations, V blocks, coupling W — is
    sharded across devices ("lm" mesh axis): each chip reduces its own
    landmarks into a partial Schur camera system.
  - The reduced camera system S [6K, 6K] is small (K window poses), so it
    is psum-ed over ICI and solved redundantly on every chip — cheaper
    than sharding a tiny dense solve.
  - Landmark back-substitution is embarrassingly parallel on the shard.

One BA iteration therefore costs one psum of [6K x 6K + 6K] per step —
a few hundred KB over ICI — while the O(M·O^2) Schur fill scales linearly
with devices.

`distributed_ba_step` is written with shard_map so the collective schedule
is explicit; it matches `solvers.local_ba._ba_iteration` numerically (same
math, different reduction placement).
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..cameras import models as cm
from ..math import lie
from ..solvers.lm import huber_weight
from ..solvers.local_ba import BAProblem, _obs_terms, inv3x3


# Schur-fill strategy: the one-hot pair fill's FLOPs scale with K^2, so
# past SOME pose count the segment_sum scatter should win.  Where that
# point is depends on the backend: on TPU the scatter serializes its
# per-row updates while the K^2 one-hot FLOPs ride the MXU — measured
# on the real v5e at M=100k/O=8 (scripts/gba_scale_bench.py, r5):
#   K=64: onehot 6.12 iters/s vs scatter 1.52;  K=128: 6.08 vs 1.56;
#   K=256: 4.85 vs 1.19;  K=512: 2.64 vs 0.88.
# The one-hot fill wins by 3-4x at EVERY K up to the 512-KF pose-graph
# cap — the prior PAIRFILL_K_MAX=96 came from a CPU A/B and routed the
# whole GBA regime onto the serialized scatter.  On CPU the scatter
# wins past ~96 poses (the r4 measurement).  "auto" now picks by
# backend; "onehot"/"scatter" force a path (tests/A-B scripts).
PAIRFILL_MODE = "auto"
PAIRFILL_K_MAX = 96            # CPU crossover (TPU: onehot through 512)


def _use_onehot(K: int) -> bool:
    if PAIRFILL_MODE == "auto":
        if jax.default_backend() == "tpu":
            return True
        return K <= PAIRFILL_K_MAX
    return PAIRFILL_MODE == "onehot"


def make_ba_mesh(devices=None, axis: str = "lm") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    import numpy as np
    return Mesh(np.asarray(devices), (axis,))


def shard_problem(prob: BAProblem, mesh: Mesh, axis: str = "lm"):
    """Place the landmark-major arrays of a BAProblem on the mesh: [M, ...]
    tensors sharded along the landmark dim, pose tensors replicated."""
    lm_sharded = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    return BAProblem(
        Rcw=jax.device_put(prob.Rcw, repl),
        tcw=jax.device_put(prob.tcw, repl),
        fixed=jax.device_put(prob.fixed, repl),
        pw=jax.device_put(prob.pw, lm_sharded),
        lm_valid=jax.device_put(prob.lm_valid, lm_sharded),
        obs_kf=jax.device_put(prob.obs_kf, lm_sharded),
        obs_uv=jax.device_put(prob.obs_uv, lm_sharded),
        obs_ur=jax.device_put(prob.obs_ur, lm_sharded),
        obs_inv_sigma2=jax.device_put(prob.obs_inv_sigma2, lm_sharded),
        obs_valid=jax.device_put(prob.obs_valid, lm_sharded),
    )


def _partial_schur(Rcw, tcw, pw, prob: BAProblem, cam, bf, active, lam,
                   axis: str):
    """Per-shard Schur assembly + psum; returns (dx [K,6], V_inv, bl, Wc)
    with dx identical on all shards and the landmark terms local."""
    K = Rcw.shape[0]
    r, Jp, Jl, chi2, delta2, depth_ok = _obs_terms(
        Rcw, tcw, pw, prob, cam, bf)
    use = active & prob.obs_valid & depth_ok & (prob.obs_kf >= 0)
    w = huber_weight(chi2, delta2) * prob.obs_inv_sigma2 * use
    free = ~prob.fixed
    obs_free = free[jnp.clip(prob.obs_kf, 0)] & use
    wp = jnp.where(obs_free, w, 0.0)

    # By-keyframe reductions as one-hot MXU contractions: TPU scatter
    # (segment_sum) lowers to serialized updates — the round-3 TPU row
    # measured 0.6 iters/s scatter-bound on a 65k-landmark shard; the
    # one-hot formulation puts the same reduction on the MXU (the
    # ops/orb.py gather lesson). Past PAIRFILL_K_MAX poses the K^2 FLOP
    # growth loses to the scatter (see module note).
    onehot = _use_onehot(K)
    kf_i = jnp.clip(prob.obs_kf, 0)
    kf_flat = kf_i.reshape(-1)
    A = (kf_i[..., None] == jnp.arange(K, dtype=kf_i.dtype)
         ).astype(r.dtype) if onehot else None             # [M, O, K]
    Hpp_d = jnp.einsum("mori,mo,morj->moij", Jp, wp, Jp)
    bp_o = -jnp.einsum("mori,mo,mor->moi", Jp, wp, r)
    if onehot:
        Hpp = jnp.einsum("mok,moij->kij", A, Hpp_d)
        bp = jnp.einsum("mok,moi->ki", A, bp_o)
    else:
        Hpp = jax.ops.segment_sum(
            Hpp_d.reshape(-1, 6, 6), kf_flat, num_segments=K)
        bp = jax.ops.segment_sum(
            bp_o.reshape(-1, 6), kf_flat, num_segments=K)

    V = jnp.einsum("mori,mo,morj->mij", Jl, w, Jl)
    bl = -jnp.einsum("mori,mo,mor->mi", Jl, w, r)
    lam_V = lam * jnp.maximum(jnp.diagonal(V, axis1=-2, axis2=-1), 1e-10)
    V_d = V + jax.vmap(jnp.diag)(lam_V)
    has_obs = jnp.sum(w, axis=-1) > 0
    V_d = jnp.where(has_obs[:, None, None], V_d,
                    jnp.broadcast_to(jnp.eye(3, dtype=V.dtype), V_d.shape))
    V_inv = inv3x3(V_d)   # closed form: batched LU serializes on TPU

    Wc = jnp.einsum("mori,mo,morj->moij", Jp, wp, Jl)
    Y = Wc @ V_inv[:, None]
    # Schur pair block S[k,k'] = Σ_m (Σ_o A Y)(Σ_p A W)ᵀ — factored
    # through per-landmark per-pose accumulators B, C so the fill is two
    # dense einsums instead of an O²-pair scatter, chunked over
    # landmarks to bound the [chunk, K, 6, 3] temporaries (the unchunked
    # [M,O,O,6,6] pair tensor OOMed the 16 GB v5e at M=65k).
    Ms, O = kf_i.shape
    # chunk sized so the [chunk, K, 6, 3] accumulators stay ~<=64 MB
    # even at global-BA K (the pair fill's FLOPs scale with K^2 — for
    # K > PAIRFILL_K_MAX the scatter branch below takes over)
    chunk = int(min(8192, max(256, (1 << 26) // (72 * max(K, 1)))))
    chunk = min(chunk, Ms)
    n_ch = -(-Ms // chunk)
    padM = n_ch * chunk - Ms

    def _chunked(x):
        pads = ((0, padM),) + ((0, 0),) * (x.ndim - 1)
        return jnp.pad(x, pads).reshape(n_ch, chunk, *x.shape[1:])

    Yb = jnp.einsum("moij,mj->moi", Y, bl)             # [M, O, 6]
    # the scan carry is shard-local (varying over the mesh axis)
    S0 = jax.lax.pvary(jnp.zeros((K, K, 6, 6), Y.dtype), (axis,))
    if onehot:
        def s_chunk(S_acc, args):
            Yc, Wcc, Ac = args
            B = jnp.einsum("mok,moic->mkic", Ac, Yc)   # [chunk, K, 6, 3]
            C = jnp.einsum("mok,mojc->mkjc", Ac, Wcc)
            return S_acc + jnp.einsum("mkic,mljc->klij", B, C), None

        S, _ = jax.lax.scan(
            s_chunk, S0, (_chunked(Y), _chunked(Wc), _chunked(A)))
        rhs = bp - jnp.einsum("mok,moi->ki", A, Yb)
    else:
        pair_idx = (kf_i[:, :, None] * K + kf_i[:, None, :])   # [M, O, O]

        def s_chunk(S_acc, args):
            Yc, Wcc, pc = args
            Sp = jnp.einsum("moik,mpjk->mopij", Yc, Wcc)
            return S_acc + jax.ops.segment_sum(
                Sp.reshape(-1, 6, 6), pc.reshape(-1),
                num_segments=K * K).reshape(K, K, 6, 6), None

        S, _ = jax.lax.scan(
            s_chunk, S0, (_chunked(Y), _chunked(Wc), _chunked(pair_idx)))
        rhs = bp - jax.ops.segment_sum(
            Yb.reshape(-1, 6), kf_flat, num_segments=K)

    # --- the one collective: reduce the camera system over ICI ---
    Hpp = jax.lax.psum(Hpp, axis)
    S = jax.lax.psum(S, axis)
    rhs = jax.lax.psum(rhs, axis)

    lam_H = lam * jnp.maximum(jnp.diagonal(Hpp, axis1=-2, axis2=-1), 1e-10)
    Hpp_d6 = Hpp + jax.vmap(jnp.diag)(lam_H)
    S_full = -S.transpose(0, 2, 1, 3).reshape(K * 6, K * 6)
    ii = jnp.arange(K)
    S_full = S_full.reshape(K, 6, K, 6).at[ii, :, ii, :].add(
        Hpp_d6).reshape(K * 6, K * 6)
    fm = jnp.repeat(free, 6).astype(S_full.dtype)
    S_masked = S_full * fm[:, None] * fm[None, :] + jnp.diag(1.0 - fm)
    rhs_masked = rhs.reshape(-1) * fm
    dx = jnp.linalg.solve(S_masked, rhs_masked).reshape(K, 6)
    dx = jnp.where(free[:, None], dx, 0.0)
    # Per-observation pose step for landmark back-substitution: one-hot
    # contraction where A exists, plain gather otherwise.
    dx_o = jnp.einsum("mok,ki->moi", A, dx) if onehot else dx[kf_i]
    return dx, dx_o, V_inv, bl, Wc, has_obs


def distributed_ba_step(prob: BAProblem, cam: cm.Camera, bf,
                        active, lam, mesh: Mesh, axis: str = "lm"):
    """One damped distributed Schur step (landmark-sharded).

    Returns (Rcw', tcw', pw') with poses replicated and pw sharded.
    """

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(
            BAProblem(
                Rcw=P(), tcw=P(), fixed=P(),
                pw=P(axis), lm_valid=P(axis), obs_kf=P(axis),
                obs_uv=P(axis), obs_ur=P(axis),
                obs_inv_sigma2=P(axis), obs_valid=P(axis),
            ),
            P(axis), P(),
        ),
        out_specs=(P(), P(), P(axis)),
    )
    def step(p: BAProblem, active_l, lam_l):
        dx, dx_o, V_inv, bl, Wc, has_obs = _partial_schur(
            p.Rcw, p.tcw, p.pw, p, cam, bf, active_l, lam_l, axis)
        Wt_dx = jnp.einsum("moij,moi->mj", Wc, dx_o)
        dl = jnp.einsum("mij,mj->mi", V_inv, bl - Wt_dx)
        dl = jnp.where((has_obs & p.lm_valid)[:, None], dl, 0.0)
        dRs, dts = lie.se3_exp(dx)
        Rcw_n = (dRs @ p.Rcw).astype(p.Rcw.dtype)
        tcw_n = (jnp.einsum("kij,kj->ki", dRs, p.tcw) + dts).astype(
            p.tcw.dtype)
        pw_n = (p.pw + dl).astype(p.pw.dtype)
        return Rcw_n, tcw_n, pw_n

    return step(prob, active, jnp.asarray(lam, prob.tcw.dtype))


def _shard_cost(p: BAProblem, cam, bf, active, axis: str):
    """Replicated total robust cost: per-shard partial + one psum."""
    from ..solvers.local_ba import _total_cost

    c = _total_cost(p.Rcw, p.tcw, p.pw, p, cam, bf, active)
    return jax.lax.psum(c, axis)


# Compiled-program cache for distributed_ba: the jitted shard_map closure
# is rebuilt per call, and a fresh function object means jax RETRACES AND
# RECOMPILES every invocation — the round-3 TPU scaling row was measuring
# ~30 s of compilation per "timed" solve, not execution.  Keyed on
# everything that affects the traced program.
_DBA_CACHE: dict = {}


def _dba_key(prob, cam, mesh, iters, axis, init_lambda):
    import numpy as _np
    return (
        tuple(d.id for d in mesh.devices.flat), axis, int(iters),
        float(init_lambda), PAIRFILL_MODE, PAIRFILL_K_MAX,
        tuple((tuple(a.shape), str(a.dtype)) for a in prob),
        tuple(_np.asarray(leaf).tobytes()
              for leaf in jax.tree.leaves(cam)),
    )


def distributed_ba(prob: BAProblem, cam: cm.Camera, bf, mesh: Mesh,
                   *, iters: int = 10, axis: str = "lm",
                   init_lambda: float = 1e-4):
    """Distributed Levenberg-Marquardt BA with true accept/reject.

    Each iteration: one psum for the reduced camera system (inside
    distributed_ba_step) + one psum of the scalar robust cost for the
    replicated accept/reject decision — the same LM semantics as the
    single-device solvers.local_ba, scaled over the landmark shard.
    """
    prob = shard_problem(prob, mesh, axis)
    active = prob.obs_valid
    key = _dba_key(prob, cam, mesh, iters, axis, init_lambda)
    run = _DBA_CACHE.get(key)
    if run is None:
        run = _build_dba(cam, bf, mesh, iters, axis, init_lambda,
                         prob.tcw.dtype)
        _DBA_CACHE[key] = run
    return run(prob, active)


def _build_dba(cam, bf, mesh, iters, axis, init_lambda, dtype):
    in_specs = BAProblem(
        Rcw=P(), tcw=P(), fixed=P(),
        pw=P(axis), lm_valid=P(axis), obs_kf=P(axis),
        obs_uv=P(axis), obs_ur=P(axis),
        obs_inv_sigma2=P(axis), obs_valid=P(axis),
    )

    @jax.jit
    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(in_specs, P(axis)),
        out_specs=(P(), P(), P(axis)),
    )
    def run(p0: BAProblem, active_l):
        # carry only the mutable state — carrying the whole problem
        # pytree made every iteration where-copy the (constant)
        # observation arrays
        def body(carry, _):
            Rcw, tcw, pw, lam, cost = carry
            p = p0._replace(Rcw=Rcw, tcw=tcw, pw=pw)
            dx, dx_o, V_inv, bl, Wc, has_obs = _partial_schur(
                Rcw, tcw, pw, p, cam, bf, active_l, lam, axis)
            Wt_dx = jnp.einsum("moij,moi->mj", Wc, dx_o)
            dl = jnp.einsum("mij,mj->mi", V_inv, bl - Wt_dx)
            dl = jnp.where((has_obs & p.lm_valid)[:, None], dl, 0.0)
            dRs, dts = lie.se3_exp(dx)
            Rcw_n = (dRs @ Rcw).astype(Rcw.dtype)
            tcw_n = (jnp.einsum("kij,kj->ki", dRs, tcw) + dts).astype(
                tcw.dtype)
            pw_n = (pw + dl).astype(pw.dtype)
            cand = p0._replace(Rcw=Rcw_n, tcw=tcw_n, pw=pw_n)
            new_cost = _shard_cost(cand, cam, bf, active_l, axis).astype(
                dtype)
            accept = (new_cost < cost) & jnp.isfinite(new_cost)
            Rcw = jnp.where(accept, Rcw_n, Rcw)
            tcw = jnp.where(accept, tcw_n, tcw)
            pw = jnp.where(accept, pw_n, pw)
            lam = jnp.where(accept, lam * 0.5, lam * 4.0).astype(dtype)
            cost = jnp.where(accept, new_cost, cost)
            return (Rcw, tcw, pw, lam, cost), None

        cost0 = _shard_cost(p0, cam, bf, active_l, axis).astype(dtype)
        (Rcw, tcw, pw, _, cost), _ = jax.lax.scan(
            body,
            (p0.Rcw, p0.tcw, p0.pw, jnp.asarray(init_lambda, dtype),
             cost0),
            None, length=iters)
        return Rcw, tcw, pw

    return run
