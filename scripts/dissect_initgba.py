"""Offline dissection of the live init-GBA: why does it leave ba ~1.0
wrong when the same solver recovers ba on clean synthetic data?"""

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
from vieo_slam_tpu.vio.backend import VioBackend, VioBackendConfig

BG = np.array([0.01, -0.02, 0.015], np.float32)
BA = np.array([0.05, 0.03, -0.04], np.float32)

with open("/tmp/live_initgba.pkl", "rb") as f:
    S = pickle.load(f)
imu = np.load("/tmp/live_imu.npz")


def fresh_map():
    m = MapState(MapConfig())
    for key in ("kf_Rcw", "kf_tcw", "kf_vwb", "kf_bg", "kf_ba",
                "kf_timestamp", "kf_valid", "kf_prev", "kf_lm_idx",
                "kf_uv", "kf_ur", "kf_level", "kf_kp_valid", "lm_pw",
                "lm_valid"):
        getattr(m, key)[:S[key].shape[0]] = S[key]
    return m


cam = cm.make_pinhole(400.0, 400.0, 320.0, 240.0, 640, 480)
bf = 400.0 * 0.2
ring = OdomRing(1 << 16)
t_imu, gyro, acc = imu["t"], imu["gyro"], imu["acc"]
for i in range(len(t_imu)):
    ring.push(t_imu[i], np.concatenate([gyro[i], acc[i]]).astype(np.float32))

ts, vw, Rcw_t = S["ts"], S["vw"], S["Rcw"]
R0cw = Rcw_t[0]
g_true = R0cw @ np.array([0, 0, -9.81])


def v_true_slam(t):
    v = np.stack([np.interp(t, ts, vw[:, j]) for j in range(3)])
    return R0cw @ v


def report(m, tag):
    kfs = m.keyframe_ids()
    ba_e = np.linalg.norm(m.kf_ba[kfs] - BA, axis=1).mean()
    bg_e = np.linalg.norm(m.kf_bg[kfs] - BG, axis=1).mean()
    v_e = np.mean([np.linalg.norm(m.kf_vwb[k] - v_true_slam(
        m.kf_timestamp[k])) for k in kfs])
    print(f"{tag}: K={len(kfs)} bg_err={bg_e:.4f} ba_err={ba_e:.4f} "
          f"v_err={v_e:.4f}")


def run_variant(tag, *, iters, zero_bias=False, gdir=True):
    m = fresh_map()
    if zero_bias:
        kfs = m.keyframe_ids()
        m.kf_bg[kfs] = S["bg"]      # keep gyro bias (reliable)
        m.kf_ba[kfs] = 0.0
    be = VioBackend(m, cam, bf, ring, np.eye(3, dtype=np.float32),
                    np.zeros(3, np.float32),
                    cfg=VioBackendConfig(gba_stage_iters=iters))
    be.gravity = S["gravity"].copy()
    report(m, f"{tag} pre ")
    ok = be.run_global_ba(opt_scale=False, opt_gdir=gdir, init_prior=True)
    gerr = np.degrees(np.arccos(np.clip(
        be.gravity @ g_true / (np.linalg.norm(be.gravity) * 9.81), -1, 1)))
    report(m, f"{tag} post (ok={ok}, g_err={gerr:.2f}d)")


def run_staged(tag, *, iters1=(15, 15), iters2=(15, 15)):
    """Stage 1: biases pinned hard (huge prior, start from bg-GN/ba=0),
    solve v + poses + gravity dir.  Stage 2: release biases."""
    m = fresh_map()
    kfs = m.keyframe_ids()
    m.kf_bg[kfs] = S["bg"]
    m.kf_ba[kfs] = 0.0
    be = VioBackend(m, cam, bf, ring, np.eye(3, dtype=np.float32),
                    np.zeros(3, np.float32),
                    cfg=VioBackendConfig(gba_stage_iters=iters1,
                                         sigma_bg_rw=1e-6,
                                         sigma_ba_rw=1e-6))
    be.gravity = S["gravity"].copy()
    be.run_global_ba(opt_scale=False, opt_gdir=True, init_prior=True)
    report(m, f"{tag} s1  ")
    be2 = VioBackend(m, cam, bf, ring, np.eye(3, dtype=np.float32),
                     np.zeros(3, np.float32),
                     cfg=VioBackendConfig(gba_stage_iters=iters2))
    be2.gravity = be.gravity.copy()
    ok = be2.run_global_ba(opt_scale=False, opt_gdir=True, init_prior=True)
    gerr = np.degrees(np.arccos(np.clip(
        be2.gravity @ g_true / (np.linalg.norm(be2.gravity) * 9.81), -1, 1)))
    report(m, f"{tag} s2 (ok={ok}, g_err={gerr:.2f}d)")


def run_from_truth(tag, iters=(15, 25)):
    """Start from ground-truth poses/velocities/biases (landmarks as
    stored): does the GBA STAY at truth (=> local-min problem) or walk
    away (=> the data itself prefers the wrong point)?"""
    m = fresh_map()
    kfs = m.keyframe_ids()
    tcw_t = S["tcw"]
    for k in kfs:
        i = int(round(m.kf_timestamp[k] / 0.1))
        Rcw_s = Rcw_t[i] @ R0cw.T              # slam-world pose (cam0 ref)
        twc0 = -Rcw_t[0].T @ tcw_t[0]
        p_s = R0cw @ ((-Rcw_t[i].T @ tcw_t[i]) - twc0)
        m.kf_Rcw[k] = Rcw_s.astype(np.float32)
        m.kf_tcw[k] = (-Rcw_s @ p_s).astype(np.float32)
        m.kf_Rwb[k] = Rcw_s.T.astype(np.float32)
        m.kf_pwb[k] = p_s.astype(np.float32)
        m.kf_vwb[k] = v_true_slam(m.kf_timestamp[k]).astype(np.float32)
        m.kf_bg[k] = BG
        m.kf_ba[k] = BA
    be = VioBackend(m, cam, bf, ring, np.eye(3, dtype=np.float32),
                    np.zeros(3, np.float32),
                    cfg=VioBackendConfig(gba_stage_iters=iters))
    be.gravity = g_true.astype(np.float32)
    report(m, f"{tag} pre ")
    ok = be.run_global_ba(opt_scale=False, opt_gdir=True, init_prior=True)
    gerr = np.degrees(np.arccos(np.clip(
        be.gravity @ g_true / (np.linalg.norm(be.gravity) * 9.81), -1, 1)))
    report(m, f"{tag} post (ok={ok}, g_err={gerr:.2f}d)")


def run_tworound(tag, iters=(10, 15)):
    """Round 1 GBA (lands in the valley), then reset biases to zero on
    the refined poses/velocities and GBA again: does the second round
    reach the good basin?"""
    m = fresh_map()
    be = VioBackend(m, cam, bf, ring, np.eye(3, dtype=np.float32),
                    np.zeros(3, np.float32),
                    cfg=VioBackendConfig(gba_stage_iters=iters))
    be.gravity = S["gravity"].copy()
    be.run_global_ba(opt_scale=False, opt_gdir=True, init_prior=True)
    report(m, f"{tag} r1  ")
    kfs = m.keyframe_ids()
    m.kf_ba[kfs] = 0.0
    be.run_global_ba(opt_scale=False, opt_gdir=True, init_prior=True)
    report(m, f"{tag} r2  ")
    m.kf_ba[kfs] = 0.0
    be.run_global_ba(opt_scale=False, opt_gdir=True, init_prior=True)
    gerr = np.degrees(np.arccos(np.clip(
        be.gravity @ g_true / (np.linalg.norm(be.gravity) * 9.81), -1, 1)))
    report(m, f"{tag} r3 (g_err={gerr:.2f}d)")


report(fresh_map(), "input     ")
run_from_truth("fromtruth ")
run_tworound("tworound  ")
run_variant("asis      ", iters=(6, 10))
run_variant("long      ", iters=(20, 30))
run_variant("zerobias  ", iters=(20, 30), zero_bias=True)
run_variant("nogdir    ", iters=(20, 30), gdir=False)
run_staged("staged    ")
