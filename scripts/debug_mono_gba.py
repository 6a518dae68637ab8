"""Why does the final GBA degrade MONO maps? (r4 observation: mono_loop
rmse_noFullBA 0.0055 -> rmse_fullBA 0.0076.)

Feature-level mono multi-lap run (fast), then A/B over final-GBA
configurations: staged (10,15) with chi2-classification carry (the
production path), single-stage (25,), and staged without carrying the
classification between chunks.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/debug_mono_gba.py
"""

import copy
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

from vieo_slam_tpu.backend.loop_closing import (  # noqa: E402
    LoopCloser, LoopClosingConfig)
from vieo_slam_tpu.cameras import models as cm  # noqa: E402
from vieo_slam_tpu.frontend.frame import make_frame_from_features  # noqa: E402
from vieo_slam_tpu.io.evaluate import ate  # noqa: E402
from vieo_slam_tpu.sim.world import (  # noqa: E402
    SyntheticWorld, WorldConfig, circle_trajectory, trajectory_to_tcw)
from vieo_slam_tpu.system import System, SystemConfig  # noqa: E402

N = int(os.environ.get("DBG_FRAMES", "300"))


def build_mono_map():
    cam = cm.make_pinhole(400.0, 400.0, 320.0, 240.0, 640, 480)
    world = SyntheticWorld(WorldConfig(n_landmarks=5000, seed=4,
                                       extent=(8.0, 6.0, 3.0)))
    ts = np.arange(N) * 0.1
    omega = 2 * np.pi / 18.0
    Rwc, twc, _, _ = circle_trajectory(ts, radius=1.5, omega=omega,
                                       look_outward=True)
    Rcw, tcw = trajectory_to_tcw(Rwc, twc)
    sys_ = System(cam, 0.0, SystemConfig())
    sys_.loop_closer = LoopCloser(
        cam, 0.0, sys_.map,
        LoopClosingConfig(min_kf_gap=30, fix_scale=False))
    rng = np.random.RandomState(11)
    for i in range(N):
        obs = world.observe(Rcw[i], tcw[i], cam, bf=0.0, n_kp=600,
                            pixel_noise=0.3, bit_flips=4, clutter=50,
                            rng=rng, max_depth=12.0)
        frame = make_frame_from_features(
            obs["uv"], obs["level"], obs["angle"], obs["desc"],
            obs["valid"], timestamp=ts[i])
        sys_.track_frame(frame)
    return sys_, ts, twc


def kf_ate(m, ts, twc):
    kfs = m.keyframe_ids()
    p = np.stack([-(m.kf_Rcw[k].T @ m.kf_tcw[k]) for k in kfs])
    return ate(m.kf_timestamp[kfs], p, ts, twc, with_scale=True)


def snapshot(m):
    return (m.kf_Rcw.copy(), m.kf_tcw.copy(), m.lm_pw.copy())


def restore(m, snap):
    m.kf_Rcw[:], m.kf_tcw[:], m.lm_pw[:] = snap


def main():
    sys_, ts, twc = build_mono_map()
    m = sys_.map
    print("loops:", sys_.loop_closer.n_loops_closed,
          "KFs:", m.n_keyframes())
    base = kf_ate(m, ts, twc)
    print(f"before GBA: rmse={base['rmse']:.4f} scale={base['scale']:.3f}")
    snap = snapshot(m)
    for label, stages in [("staged(10,15)", (10, 15)),
                          ("single(25)", (25,)),
                          ("staged(5,5)", (5, 5)),
                          ("long(40)", (40,))]:
        restore(m, snap)
        sys_.mapper.run_global_ba(stage_iters=stages)
        r = kf_ate(m, ts, twc)
        print(f"after GBA {label}: rmse={r['rmse']:.4f} "
              f"scale={r['scale']:.3f}", flush=True)
    restore(m, snap)


if __name__ == "__main__":
    main()
