"""Can the init-GBA recover a badly-wrong accel bias (the live failure
mode: init ba off by ~1.0) on a clean synthetic problem?  Sweep
iterations and initial bias error."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))
from test_vio_local_ba import make_problem, _perturb  # noqa: E402

from vieo_slam_tpu.solvers.vio_local_ba import vio_ba  # noqa: E402

BA_TRUE = np.array([0.05, 0.03, -0.04])
BG_TRUE = np.array([0.01, -0.02, 0.015])

for ba_off in (0.3, 1.0):
    for iters in ((6, 10), (15, 25)):
        prob, truth, cam, cfg = make_problem(
            seed=1, K=12, bg_true=BG_TRUE, ba_true=BA_TRUE, kf_dt=0.35)
        # start from wrong biases (as the live init hands over) + pose noise
        rng = np.random.RandomState(2)
        pert = _perturb(prob, rng, dp=0.03, dth=0.01, dv=0.15)
        K = pert.ns.p.shape[0]
        ba0 = BA_TRUE + np.array([0.2, 0.9, -0.3]) * ba_off / 1.0
        ns = pert.ns._replace(
            bg=jnp.broadcast_to(jnp.asarray(BG_TRUE + 0.005,
                                            jnp.float32), (K, 3)),
            ba=jnp.broadcast_to(jnp.asarray(ba0, jnp.float32), (K, 3)))
        pert = pert._replace(
            ns=ns,
            fixed_vb=jnp.zeros(K, bool),
            prior_info6=jnp.asarray(
                np.concatenate([np.full(3, 1e4), np.full(3, 1e2)]),
                jnp.float32))
        res = vio_ba(pert, cam, cfg, stage_iters=iters, opt_gdir=True)
        ba_post = np.asarray(res.ns.ba + res.ns.dba)
        bg_post = np.asarray(res.ns.bg + res.ns.dbg)
        ba_err = np.linalg.norm(ba_post - BA_TRUE, axis=1).mean()
        bg_err = np.linalg.norm(bg_post - BG_TRUE, axis=1).mean()
        p_err = np.abs(np.asarray(res.ns.p) - truth["p"]).max()
        print(f"ba_off={ba_off} iters={iters}: ba_err={ba_err:.4f} "
              f"bg_err={bg_err:.4f} p_err={p_err:.4f} "
              f"cost={float(res.cost):.1f}")
