"""Diagnose why loop closure does / doesn't fire in the image-level
multi-lap scenario (evaluate_ntimes stereo_loop): per-KF candidate
counts, consistency streaks, Sim3 inlier counts.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/debug_loop_scenario.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from vieo_slam_tpu.backend.loop_closing import (  # noqa: E402
    LoopCloser, LoopClosingConfig)
from vieo_slam_tpu.cameras import models as cm  # noqa: E402
from vieo_slam_tpu.frontend.frame import (  # noqa: E402
    build_mono_frame, build_stereo_frame)
from vieo_slam_tpu.frontend.tracking import TrackerConfig  # noqa: E402
from vieo_slam_tpu.io.evaluate import ate  # noqa: E402
from vieo_slam_tpu.ops import orb  # noqa: E402
from vieo_slam_tpu.sim.world import (  # noqa: E402
    SyntheticWorld, WorldConfig, circle_trajectory,
    figure_eight_trajectory, trajectory_to_tcw)
from vieo_slam_tpu.system import System, SystemConfig  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples"))
from evaluate_ntimes import (  # noqa: E402
    _gain_bias, DYNAMIC_FRAC, LOOP_FRAMES_PER_LAP, LOOP_RADIUS,
    NOISE_SIGMA)

N_FRAMES = int(os.environ.get("DBG_FRAMES", "360"))
SEED = int(os.environ.get("DBG_SEED", "11"))


class InstrumentedLoopCloser(LoopCloser):
    def process_keyframe(self, k):
        m = self.map
        if not self._ensure_vocabulary():
            print(f"KF {k}: no vocabulary yet")
            return False
        if self.db is None:
            from vieo_slam_tpu.loop.keyframe_db import KeyFrameDatabase
            self.db = KeyFrameDatabase(self.voc.n_words,
                                       capacity=m.cfg.max_keyframes)
        nk = min(len(self.db.present), len(m.kf_valid))
        stale = np.nonzero(self.db.present[:nk] & ~m.kf_valid[:nk])[0]
        for kf in stale:
            self.db.erase(int(kf))
            self.kf_bow.pop(int(kf), None)
        bow = self._bow_of(k)
        closed = False
        if k - self.last_loop_kf >= self.cfg.min_kf_gap:
            neigh, _ = m.covisible_keyframes(k, min_shared=5)
            connected = np.concatenate([[k], neigh]).astype(int)
            recent = np.asarray(
                [kf for kf in m.keyframe_ids()
                 if k - kf < self.cfg.min_kf_gap], int)
            excl = np.unique(np.concatenate([connected, recent]))
            cands = self.db.detect_loop_candidates(
                bow, k, excl,
                lambda c: m.covisible_keyframes(int(c), min_shared=5)[0])
            raw = cands.copy()
            cands = self._consistency_filter(cands)
            t_k = float(m.kf_timestamp[k])
            if len(raw) or len(cands):
                print(f"KF {k} t={t_k:.1f}: raw_cands={list(raw)} "
                      f"streakpass={list(cands)} "
                      f"pending={dict(self._pending)}")
            for c in cands:
                pairs = self._matched_landmark_pairs(k, int(c))
                np_pairs = 0 if pairs is None else len(pairs[0])
                print(f"  try_close {k}->{int(c)}: lm_pairs={np_pairs}")
                if self._try_close(k, int(c)):
                    print(f"  CLOSED {k}->{int(c)}")
                    closed = True
                    break
        self.db.add(k, bow)
        return closed


def main():
    BASELINE = 0.2
    fx = 400.0
    cam = cm.make_pinhole(fx, fx, 320.0, 240.0, 640, 480)
    bf = fx * BASELINE
    ext = float(os.environ.get("DBG_EXTENT", "12"))
    world = SyntheticWorld(WorldConfig(
        n_landmarks=4000, seed=4, extent=(ext, ext * 0.75, 3.0),
        dynamic_frac=DYNAMIC_FRAC))
    ts = np.arange(N_FRAMES) * 0.1
    fpl = int(os.environ.get("DBG_FPL", str(LOOP_FRAMES_PER_LAP)))
    omega = 2 * np.pi / (fpl * 0.1)
    if os.environ.get("DBG_TRAJ", "circle") == "circle":
        Rwc, twc, v_w, a_w = circle_trajectory(
            ts, radius=LOOP_RADIUS, omega=omega, look_outward=True)
    else:
        Rwc, twc, v_w, a_w = figure_eight_trajectory(
            ts, a=3.0, b=1.0, omega=omega)
    Rcw, tcw = trajectory_to_tcw(Rwc, twc)
    mono = os.environ.get("DBG_MODE", "stereo") == "mono"
    ocfg = orb.OrbConfig(
        n_features=int(os.environ.get("DBG_FEATS",
                                      "1000" if mono else "600")),
        n_levels=4)
    rng = np.random.RandomState(SEED)
    ups = os.environ.get("DBG_PRED_SCALE", "1") == "1"
    sys_ = System(cam, bf, SystemConfig(
        tracker=TrackerConfig(use_predicted_scale=ups)))
    sys_.loop_closer = InstrumentedLoopCloser(
        cam, bf, sys_.map,
        LoopClosingConfig(min_kf_gap=30, fix_scale=not mono))
    if mono:
        build = jax.jit(lambda im, t: build_mono_frame(
            im, ocfg, timestamp=t))
    else:
        build = jax.jit(lambda l, r, t: build_stereo_frame(
            l, r, ocfg, bf=bf, min_depth=0.3, max_depth=15.0, timestamp=t))
    for i in range(N_FRAMES):
        t = float(ts[i])
        g, b = _gain_bias(t)
        hard = dict(t=t, noise_sigma=NOISE_SIGMA, gain=g, bias=b, rng=rng)
        if mono:
            img = world.render_view(cam, Rcw[i], tcw[i], **hard)
            frame = build(jnp.asarray(img), jnp.asarray(t, jnp.float32))
        else:
            img_l, img_r = world.render_stereo(
                cam, Rcw[i], tcw[i], BASELINE, **hard)
            frame = build(jnp.asarray(img_l), jnp.asarray(img_r),
                          jnp.asarray(t, jnp.float32))
        st = sys_.track_frame(frame)
        tr = sys_.tracker
        n_inl = int(tr.last_result.n_inliers) \
            if tr.last_result is not None else -1
        if os.environ.get("DBG_STATES", "0") == "1":
            res = tr.last_result
            nfr = int(np.asarray(res.in_frustum).sum()) \
                if res is not None else -1
            nmatch = int((np.asarray(res.lm_match) >= 0).sum()) \
                if res is not None else -1
            nslab = int((tr.last_lm_ids >= 0).sum()) \
                if tr.last_lm_ids is not None else -1
            nkp = int(np.asarray(frame.valid).sum())
            from vieo_slam_tpu.utils.metrics import metrics as mtr
            ncre = mtr.counters.get("landmarks_created", 0)
            nval = int(sys_.map.lm_valid.sum())
            print(f"f{i} t={t:.1f} {st.name} inl={n_inl} "
                  f"frustum={nfr} match={nmatch} slab={nslab} "
                  f"kp={nkp} kf={tr.last_new_kf} "
                  f"created={ncre} lm_valid={nval}", flush=True)
        if i % 60 == 59:
            m = sys_.map
            kfs = m.keyframe_ids()
            p = np.stack([-(m.kf_Rcw[k].T @ m.kf_tcw[k]) for k in kfs])
            r = ate(m.kf_timestamp[kfs], p, ts, twc, with_scale=mono)
            print(f"frame {i}: KFs={len(kfs)} "
                  f"lms={m.n_landmarks()} rmse={r['rmse']:.4f} "
                  f"loops={sys_.loop_closer.n_loops_closed}", flush=True)
    m = sys_.map
    kfs = m.keyframe_ids()
    p = np.stack([-(m.kf_Rcw[k].T @ m.kf_tcw[k]) for k in kfs])
    print("final:", ate(m.kf_timestamp[kfs], p, ts, twc, with_scale=mono),
          "loops:", sys_.loop_closer.n_loops_closed)


if __name__ == "__main__":
    main()
