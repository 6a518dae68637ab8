"""Offline dissection of the captured live VIO local-BA problem."""

import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from vieo_slam_tpu.cameras import models as cm
from vieo_slam_tpu.map.map_state import MapConfig, MapState
from vieo_slam_tpu.native import OdomRing
from vieo_slam_tpu.solvers import imu_factors
from vieo_slam_tpu.solvers.vio_local_ba import vio_ba
from vieo_slam_tpu.vio.backend import VioBackend, VioBackendConfig

BG = np.array([0.01, -0.02, 0.015], np.float32)
BA = np.array([0.05, 0.03, -0.04], np.float32)

with open("/tmp/live_problem.pkl", "rb") as f:
    S = pickle.load(f)
imu = np.load("/tmp/live_imu.npz")

m = MapState(MapConfig())
for key in ("kf_Rcw", "kf_tcw", "kf_vwb", "kf_bg", "kf_ba", "kf_timestamp",
            "kf_valid", "kf_prev", "kf_lm_idx", "kf_uv", "kf_ur",
            "kf_level", "kf_kp_valid", "lm_pw", "lm_valid"):
    arr = S[key]
    tgt = getattr(m, key)
    tgt[:arr.shape[0]] = arr

cam = cm.make_pinhole(400.0, 400.0, 320.0, 240.0, 640, 480)
bf = 400.0 * 0.2
ring = OdomRing(1 << 16)
t_imu, gyro, acc = imu["t"], imu["gyro"], imu["acc"]
for i in range(len(t_imu)):
    ring.push(t_imu[i], np.concatenate([gyro[i], acc[i]]).astype(np.float32))

be = VioBackend(m, cam, bf, ring, np.eye(3, dtype=np.float32),
                np.zeros(3, np.float32),
                cfg=VioBackendConfig())
be.gravity = S["gravity"]

k = int(S["k"])
window = [k]
cur = k
while len(window) < be.cfg.window_size + 1:
    p = int(m.kf_prev[cur])
    if p < 0:
        break
    window.append(p)
    cur = p
window = np.asarray(window[::-1], int)
print("window:", window)
print("kf times:", np.round(m.kf_timestamp[window], 2))

# ---- velocities vs truth (SLAM world = cam0 frame!) ----------------------
ts, vw = S["ts"], S["vw"]
R0cw = S["Rcw"][0]


def v_true_slam(t):
    v = np.stack([np.interp(t, ts, vw[:, j]) for j in range(3)])
    return R0cw @ v


for kk in window:
    t = m.kf_timestamp[kk]
    vt = v_true_slam(t)
    print(f"kf{kk}: v_est {np.round(m.kf_vwb[kk],3)} v_true "
          f"{np.round(vt,3)} err {np.linalg.norm(m.kf_vwb[kk]-vt):.3f}"
          f"  bg {np.round(m.kf_bg[kk],3)}"
          f"  ba {np.round(m.kf_ba[kk],3)}")

# gravity check
g_true_w = S["Rcw"][0] @ np.array([0.0, 0.0, -9.81])
print("gravity est:", np.round(S["gravity"], 4), " true:",
      np.round(g_true_w, 4))

# ---- raw chain residuals at current state --------------------------------
lm_ids = m.landmarks_in_keyframes(window)
lm_ids = lm_ids[m.lm_valid[lm_ids]]
obs_any = np.isin(m.kf_lm_idx, lm_ids) & (m.kf_lm_idx >= 0)
ringk = np.nonzero(obs_any.any(axis=1) & m.kf_valid)[0]
ringk = np.setdiff1d(ringk, window)[: be.cfg.fixed_covis]
prob, kf_order, lm_ids2 = be._build(window, ringk, lm_ids)

ns = prob.ns
pre = prob.imu_pre
C = len(window) - 1
ns_i = jax.tree.map(lambda a: a[prob.chain_i], ns)
ns_j = jax.tree.map(lambda a: a[prob.chain_j], ns)
r = jax.vmap(lambda a, b, p: imu_factors.imu_residual_prv(
    a, b, p, jnp.asarray(S["gravity"])))(ns_i, ns_j, pre)
r = np.asarray(r)
for c in range(C):
    print(f"chain {window[c]}->{window[c+1]}: |eP|={np.linalg.norm(r[c,:3]):.4f} "
          f"|eR|={np.linalg.norm(r[c,3:6]):.4f} |eV|={np.linalg.norm(r[c,6:9]):.4f} "
          f"dt={float(pre.dt[c]):.3f} valid={bool(np.asarray(prob.chain_valid)[c])}")

# ---- run the solve, look at what moves -----------------------------------
fixed_pr = np.asarray(prob.fixed_pr).copy()
fixed_vb = np.asarray(prob.fixed_vb).copy()
fixed_pr[0] = True
fixed_vb[0] = True
cw = np.asarray(prob.chain_weight).copy()
cw[fixed_vb[np.asarray(prob.chain_i)]] = 1e-2
prob2 = prob._replace(fixed_pr=jnp.asarray(fixed_pr),
                      fixed_vb=jnp.asarray(fixed_vb),
                      chain_weight=jnp.asarray(cw))
res = vio_ba(prob2, cam, be._solve_cfg(), stage_iters=(4, 6))
nsr = jax.tree.map(np.asarray, res.ns)
print("\npost-solve:")
for i, kk in enumerate(window):
    t = m.kf_timestamp[kk]
    vt = v_true_slam(t)
    ba_post = nsr.ba[i] + nsr.dba[i]
    bg_post = nsr.bg[i] + nsr.dbg[i]
    print(f"kf{kk}: v_err {np.linalg.norm(nsr.v[i]-vt):.3f} "
          f"bg_err {np.linalg.norm(bg_post-BG):.4f} "
          f"ba_err {np.linalg.norm(ba_post-BA):.4f} ba {np.round(ba_post,3)}")
print("cost:", float(res.cost))

# ---- chain residuals at TRUE states (live ring data path) ----------------
print("\nchains at ground truth states:")
from vieo_slam_tpu.math.navstate import NavState
Rcw_t, tcw_t = S["Rcw"], S["tcw"]
for c in range(C):
    a, b = window[c], window[c + 1]
    ta, tb = m.kf_timestamp[a], m.kf_timestamp[b]
    ia = int(round(ta / 0.1))
    ib = int(round(tb / 0.1))
    # true pose of frame i in SLAM world (cam0): Rws_cw = Rcw_t[i] @ R0cw^T
    z3 = jnp.zeros(3, jnp.float32)

    def ns_true(ii, tt):
        Rcw_s = Rcw_t[ii] @ R0cw.T
        # p in slam world: position of cam in slam frame
        p_s = R0cw @ (-Rcw_t[ii].T @ tcw_t[ii] - (-Rcw_t[0].T @ tcw_t[0]))
        return NavState(R=jnp.asarray(Rcw_s.T @ np.eye(3)), # Rwb = Rcw_s^T
                        p=jnp.asarray(p_s.astype(np.float32)),
                        v=jnp.asarray(v_true_slam(tt).astype(np.float32)),
                        bg=jnp.asarray(BG), ba=jnp.asarray(BA),
                        dbg=z3, dba=z3)
    pre_c = jax.tree.map(lambda x: x[c], prob.imu_pre)
    # re-preintegrate at TRUE bias
    from vieo_slam_tpu.math.preintegration import preintegrate_imu
    vals, d, mk, n = ring.window(float(ta), float(tb), 256)
    pre_t = preintegrate_imu(jnp.asarray(vals[:, :3]), jnp.asarray(vals[:, 3:]),
                             jnp.asarray(d), jnp.asarray(BG), jnp.asarray(BA),
                             1.7e-4, 2e-3, mask=jnp.asarray(mk))
    rt = np.asarray(imu_factors.imu_residual_prv(
        ns_true(ia, ta), ns_true(ib, tb), pre_t, jnp.asarray(S["gravity"])))
    print(f"chain {a}->{b}: |eP|={np.linalg.norm(rt[:3]):.5f} "
          f"|eR|={np.linalg.norm(rt[3:6]):.5f} |eV|={np.linalg.norm(rt[6:9]):.5f}")
