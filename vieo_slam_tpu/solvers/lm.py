"""Dense Levenberg-Marquardt core for small manifold problems.

The TPU replacement for g2o's OptimizationAlgorithmLevenberg (vendored at
optimizer/g2o/g2o/core/optimization_algorithm_levenberg.cpp in the
reference): fixed-iteration, jit-compilable, with Marquardt-Nielsen damping
adaptation. Where g2o builds a sparse graph per call, callers here provide a
`system_fn` that computes the dense normal equations (H, b, cost) for the
current estimate — for SLAM solves H is either a small dense matrix
(motion-only BA: 6/9/15 dims) or the Schur-reduced camera system.

Conventions: residual r, perturbation dx minimizes ||r + J dx||^2, so
b = -J^T W r (gradient descent direction is +b) and the step solves
(H + lambda diag(H)) dx = b, with x <- retract(x, dx).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class LMState(NamedTuple):
    x: object          # pytree estimate
    lam: jax.Array     # damping
    nu: jax.Array      # rejection growth factor
    cost: jax.Array    # current cost
    accepted: jax.Array  # bool: last step accepted


def lm_solve(
    system_fn: Callable,
    cost_fn: Callable,
    retract_fn: Callable,
    x0,
    *,
    iters: int,
    init_lambda_factor: float = 1e-5,
    min_diag: float = 1e-10,
):
    """Run `iters` LM steps.

    Args:
      system_fn: x -> (H [D, D], b [D], cost scalar). H must be symmetric
        PSD (robust weights folded in).
      cost_fn: x -> cost scalar (same robust cost as system_fn's).
      retract_fn: (x, dx [D]) -> x'.
      x0: initial estimate (pytree).
      iters: static LM iteration count (g2o-style `optimize(n)`).
      init_lambda_factor: lambda0 = factor * max(diag H) (g2o's tau).

    Returns (x_final, final_cost, final_H) — H evaluated at the final
    estimate is reused by callers for marginal-covariance extraction
    (reference Optimizer.h:126-206 FillCovInv).
    """
    H0, b0, c0 = system_fn(x0)
    dt = H0.dtype
    lam0 = (init_lambda_factor * jnp.maximum(
        jnp.max(jnp.diagonal(H0)), min_diag
    )).astype(dt)

    def step(state: LMState, _):
        H, b, cost = system_fn(state.x)
        D = H.shape[0]
        # Additive identity damping, g2o-style: lambda0 = tau * max(H_ii),
        # A = H + lambda I. (Mixing lambda0 = tau*max(diag) with
        # MULTIPLICATIVE diag damping overdamps by orders of magnitude.)
        A = H + state.lam * jnp.eye(D, dtype=H.dtype)
        dx = jnp.linalg.solve(A, b)
        x_new = retract_fn(state.x, dx)
        # dtype-stable under jax_enable_x64: the scan carry must not promote.
        x_new = jax.tree.map(lambda a, ref: a.astype(ref.dtype),
                             x_new, state.x)
        new_cost = cost_fn(x_new).astype(dt)
        cost = cost.astype(dt)
        # Gain ratio: actual / predicted reduction.
        pred = 0.5 * jnp.dot(dx, state.lam * dx + b)
        gain = ((cost - new_cost) / jnp.maximum(pred, 1e-30)).astype(dt)
        accept = (new_cost < cost) & jnp.isfinite(new_cost)

        lam_acc = state.lam * jnp.maximum(
            jnp.asarray(1.0 / 3.0, dt),
            1.0 - (2.0 * gain - 1.0) ** 3
        )
        lam_rej = state.lam * state.nu
        new_state = LMState(
            x=jax.tree.map(
                lambda a, b_: jnp.where(accept, a, b_), x_new, state.x
            ),
            lam=jnp.where(accept, lam_acc, lam_rej).astype(dt),
            nu=jnp.where(accept, jnp.asarray(2.0, dt),
                         state.nu * 2.0).astype(dt),
            cost=jnp.where(accept, new_cost, cost),
            accepted=accept,
        )
        return new_state, None

    init = LMState(
        x=x0, lam=lam0, nu=jnp.asarray(2.0, dt), cost=c0.astype(dt),
        accepted=jnp.asarray(True),
    )
    final, _ = jax.lax.scan(step, init, None, length=iters)
    H_f, _, _ = system_fn(final.x)
    return final.x, final.cost, H_f


def lm_solve_parallel(
    system_fn: Callable,
    cost_fn: Callable,
    retract_fn: Callable,
    x0,
    *,
    iters: int,
    n_lambda: int = 4,
    init_lambda_factor: float = 1e-5,
    min_diag: float = 1e-10,
):
    """LM with BATCHED damping candidates per iteration (TPU latency mode).

    Classic LM pays a serial accept/reject round-trip per step: a rejected
    step burns a whole system+cost evaluation just to learn lambda was too
    small.  On TPU the cost of evaluating K candidate steps is nearly the
    cost of one (the [N]-residual cost evaluation vmaps across candidates
    on the VPU; the K DxD solves are tiny), so each iteration solves for
    K lambdas spread over 3 decades, evaluates all K costs in parallel,
    and jumps to the best candidate — the serial chain is `iters`
    system evaluations total with no wasted rejections.  Same contract as
    lm_solve.
    """
    H0, b0, c0 = system_fn(x0)
    dt = H0.dtype
    lam0 = (init_lambda_factor * jnp.maximum(
        jnp.max(jnp.diagonal(H0)), min_diag)).astype(dt)
    # spread: lam * [0.1, 1, 10, 100, ...] — one decade per candidate
    spread = (10.0 ** jnp.arange(-1, n_lambda - 1)).astype(dt)

    def step(state, _):
        x, lam, cost = state
        H, b, _ = system_fn(x)
        D = H.shape[0]
        lams = lam * spread                                   # [K]
        A = H[None] + lams[:, None, None] * jnp.eye(D, dtype=dt)
        dxs = jnp.linalg.solve(
            A, jnp.broadcast_to(b, (n_lambda, D))[..., None])[..., 0]
        xs = jax.vmap(lambda dx: retract_fn(x, dx))(dxs)
        costs = jax.vmap(cost_fn)(xs).astype(dt)
        best = jnp.argmin(costs)
        improved = (costs[best] < cost) & jnp.isfinite(costs[best])
        x_new = jax.tree.map(
            lambda cand, old: jnp.where(
                improved, cand[best].astype(old.dtype), old), xs, x)
        # recentre lambda on the winner; widen on failure
        lam_new = jnp.where(improved,
                            jnp.maximum(lams[best] / 3.0, 1e-12),
                            lam * (10.0 ** (n_lambda - 1))).astype(dt)
        cost_new = jnp.where(improved, costs[best], cost)
        return (x_new, lam_new, cost_new), None

    (x, _, cost), _ = jax.lax.scan(
        step, (x0, lam0, c0.astype(dt)), None, length=iters)
    H_f, _, _ = system_fn(x)
    return x, cost, H_f


def huber_weight(chi2: jax.Array, delta2: jax.Array | float) -> jax.Array:
    """Huber IRLS weight as a function of the squared Mahalanobis residual.

    Matches g2o RobustKernelHuber: w = 1 for chi2 <= delta^2 else delta/|r|.
    """
    safe = jnp.maximum(chi2, 1e-30)
    return jnp.where(chi2 <= delta2, 1.0, jnp.sqrt(delta2 / safe))


def huber_cost(chi2: jax.Array, delta2: jax.Array | float) -> jax.Array:
    """rho(chi2): chi2 inside the basin, 2 delta |r| - delta^2 outside."""
    r = jnp.sqrt(jnp.maximum(chi2, 1e-30))
    delta = jnp.sqrt(delta2)
    return jnp.where(chi2 <= delta2, chi2, 2.0 * delta * r - delta2)
